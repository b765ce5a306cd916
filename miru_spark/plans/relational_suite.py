"""Tier-B relational operator suite (SURVEY.md section 2, B1-B26).

One driver-checked query per relational operator family the engine itself
uses somewhere in the index pipeline, over the TPC-H-ish driver tables, each
with an exactly-matching DuckDB oracle.

Floating-point protocol for aggregates (summation order differs between
engines): round each row's money expression to 4 digits — money inputs have <=2
decimals, so products of two of them have <=4 and the round is exact identity
recovery, never a half-case — sum as DECIMAL(18,4) (exact,
order-independent), cast the total back to double
(exactly representable — totals << 2^53). Both sides compute bit-identical
results. Plain double sums are never compared directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def money_sum(col):
    """Order-independent exact sum of a money expression (see module doc)."""
    return F.sum(F.round(col, 4).cast("decimal(18,4)")).cast("double")


MONEY_SUM_SQL = "CAST(SUM(CAST(ROUND({expr}, 4) AS DECIMAL(18,4))) AS DOUBLE)"


# --------------------------------------------------------------------------
# B1 projection / column ops
def q_b01_projection(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 3).alias(
                "revenue"
            ),
        )
        .filter(F.col("l_orderkey") < 100)
    )


SQL_B01 = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 3) AS revenue
FROM lineitem WHERE l_orderkey < 100
"""


# B2 filter / predicates
def q_b02_filter(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount").between(0.02, 0.09))
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "R")
    ).agg(F.count("*").alias("n"), money_sum(F.col("l_extendedprice")).alias("total"))


SQL_B02 = f"""
SELECT COUNT(*) AS n, {MONEY_SUM_SQL.format(expr="l_extendedprice")} AS total
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 24
  AND l_returnflag IN ('A', 'R')
"""


# B3 inner equi-join
def q_b03_inner_join(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total"),
        )
        .orderBy("c_mktsegment")
    )


SQL_B03 = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       {MONEY_SUM_SQL.format(expr="o_totalprice")} AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# B4 broadcast join
def q_b04_broadcast_join(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum("l_quantity").cast("double").alias("qty"))
        .orderBy("p_brand")
    )


SQL_B04 = """
SELECT p_brand, CAST(SUM(l_quantity) AS DOUBLE) AS qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


# B5 left outer join
def q_b05_outer_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_orders")
    )


SQL_B05 = """
SELECT n_orders, COUNT(*) AS n_customers FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY n_orders ORDER BY n_orders
"""


# B6 left semi / left anti join
def q_b06_semi_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("n")
    ).select(F.lit("with_orders").alias("kind"), "n")
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count("*").alias("n")
    ).select(F.lit("without_orders").alias("kind"), "n")
    return with_orders.unionByName(without)


SQL_B06 = """
SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# B7 theta / non-equi join condition
def q_b07_theta_join(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .orderBy("p_brand")
    )


SQL_B07 = """
SELECT p_brand, COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand ORDER BY p_brand
"""


# B8 hash aggregate (TPC-H Q1 shape)
def q_b08_hash_agg(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_B08 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       {MONEY_SUM_SQL.format(expr="l_extendedprice")} AS sum_base_price,
       {MONEY_SUM_SQL.format(expr="l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


# B9 distinct / count distinct
def q_b09_distinct(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    ).orderBy("l_returnflag")


SQL_B09 = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# B10 approx count distinct (non-deterministic vs oracle -> rows-only)
def q_b10_approx_distinct(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


# B11 rollup
def q_b11_rollup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("__ALL__")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("__ALL__")).alias("l_linestatus"),
            "n",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_B11 = """
SELECT COALESCE(l_returnflag, '__ALL__') AS l_returnflag,
       COALESCE(l_linestatus, '__ALL__') AS l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


# B12 window ranking
def q_b12_window_rank(spark, sf):
    from pyspark.sql.window import Window

    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "rk", "o_orderkey")
        .orderBy("o_custkey", "rk")
        .limit(500)
    )


SQL_B12 = """
SELECT o_custkey, rk, o_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 2 ORDER BY o_custkey, rk LIMIT 500
"""


# B13 window analytic (lag + frame)
def q_b13_window_lag(spark, sf):
    from pyspark.sql.window import Window

    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("prev_price", F.lag("o_totalprice").over(w))
        .withColumn(
            "run_cnt",
            F.count("*").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("prev_price").isNotNull() & (F.col("o_custkey") < 200))
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("prev_price", 3).alias("prev_price"),
            "run_cnt",
        )
        .orderBy("o_custkey", "o_orderkey")
    )


SQL_B13 = """
SELECT o_custkey, o_orderkey, ROUND(prev_price, 3) AS prev_price, run_cnt FROM (
  SELECT o_custkey, o_orderkey,
         LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_price,
         COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt
  FROM orders
) WHERE prev_price IS NOT NULL AND o_custkey < 200
ORDER BY o_custkey, o_orderkey
"""


# B14 sort / limit top-k
def q_b14_topk(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 3).alias("o_totalprice"))
        .limit(25)
    )


SQL_B14 = """
SELECT o_orderkey, ROUND(o_totalprice, 3) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


# B15 union / intersect / except
def q_b15_set_ops(spark, sf):
    li = _t(spark, sf, "lineitem")
    hi = li.filter(F.col("l_quantity") >= 45).select("l_suppkey")
    lo = li.filter(F.col("l_quantity") <= 5).select("l_suppkey")
    both = hi.intersect(lo).select(F.lit("both").alias("kind"), "l_suppkey")
    only_hi = hi.distinct().exceptAll(lo.distinct()).select(
        F.lit("only_hi").alias("kind"), "l_suppkey"
    )
    return both.unionByName(only_hi).orderBy("kind", "l_suppkey")


SQL_B15 = """
SELECT 'both' AS kind, l_suppkey FROM
  (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 45
   INTERSECT
   SELECT l_suppkey FROM lineitem WHERE l_quantity <= 5)
UNION ALL
SELECT 'only_hi' AS kind, l_suppkey FROM
  (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_quantity >= 45
   EXCEPT
   SELECT DISTINCT l_suppkey FROM lineitem WHERE l_quantity <= 5)
ORDER BY kind, l_suppkey
"""


# B16 explode / unnest (the tokenize surface)
def q_b16_explode(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
    )


SQL_B16 = """
SELECT term, COUNT(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
) WHERE term <> '' GROUP BY term ORDER BY n DESC, term ASC
"""


# B17 string functions
def q_b17_strings(spark, sf):
    c = _t(spark, sf, "customer")
    return (
        c.filter(F.col("c_name").like("%1%"))
        .select(
            "c_custkey",
            F.upper(F.col("c_mktsegment")).alias("seg_upper"),
            F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
            F.length(F.col("c_name")).alias("name_len"),
            F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        )
        .orderBy("c_custkey")
        .limit(300)
    )


SQL_B17 = """
SELECT c_custkey, UPPER(c_mktsegment) AS seg_upper,
       SUBSTRING(c_name, 1, 8) AS name_prefix,
       LENGTH(c_name) AS name_len,
       CONCAT_WS('|', c_mktsegment, c_name) AS joined
FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey LIMIT 300
"""


# B18 hash functions (sha2 <-> DuckDB sha256; xxhash64 is rows-only elsewhere)
def q_b18_sha(spark, sf):
    c = _t(spark, sf, "customer")
    return (
        c.select("c_custkey", F.sha2(F.col("c_name"), 256).alias("h"))
        .orderBy("c_custkey")
        .limit(100)
    )


SQL_B18 = """
SELECT c_custkey, sha256(c_name) AS h FROM customer ORDER BY c_custkey LIMIT 100
"""


# B19 math functions (the BM25 formula surface)
def q_b19_math(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.select(
            "p_partkey",
            F.round(F.log(F.lit(1.0) + F.col("p_retailprice")), 6).alias("log_price"),
            F.round(F.pow(F.col("p_size").cast("double"), 1.5), 6).alias("size_pow"),
            F.round(
                F.col("p_retailprice") / (F.col("p_size") + F.lit(0.5)), 6
            ).alias("ratio"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


SQL_B19 = """
SELECT p_partkey, ROUND(LN(1.0 + p_retailprice), 6) AS log_price,
       ROUND(POW(CAST(p_size AS DOUBLE), 1.5), 6) AS size_pow,
       ROUND(p_retailprice / (p_size + 0.5), 6) AS ratio
FROM part ORDER BY p_partkey LIMIT 500
"""


# B20 date/time functions (events corpus)
def q_b20_dates(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), money_sum(F.col("value")).alias("total_value"))
        .orderBy("day", "event_type")
    )


SQL_B20 = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n, {MONEY_SUM_SQL.format(expr="value")} AS total_value
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""


# B21 array functions
def q_b21_arrays(spark, sf):
    d = _t(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.array_contains(toks, "dup").alias("has_dup"),
            F.size(F.array_distinct(toks)).alias("n_unique"),
        )
        .orderBy("doc_id")
        .limit(400)
    )


SQL_B21 = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       list_contains(list_filter(string_split(text, ' '), t -> t <> ''), 'dup') AS has_dup,
       len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS n_unique
FROM documents ORDER BY doc_id LIMIT 400
"""


# B22 json functions (events.props)
def q_b22_json(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
        )
        .filter(F.col("k").isNotNull() & (F.col("k") % 10 == 0))
        .orderBy("event_id")
        .limit(500)
    )


SQL_B22 = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
  AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0
ORDER BY event_id LIMIT 500
"""


# B23 scalar pandas UDF (Arrow-vectorized tokenize alt path)
def q_b23_pandas_udf(spark, sf):
    from miru_spark.functions.tokenize import tokenize_whitespace_udf

    d = _t(spark, sf, "documents")
    return (
        d.select("doc_id", F.size(tokenize_whitespace_udf(F.col("text"))).alias("n_tokens"))
        .orderBy("doc_id")
        .limit(400)
    )


SQL_B23 = """
SELECT doc_id, len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
FROM documents ORDER BY doc_id LIMIT 400
"""


# B24 grouped-map applyInPandas
def q_b24_apply_in_pandas(spark, sf):
    import pandas as pd

    d = _t(spark, sf, "documents")

    def per_lang(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_chars": [int(pdf["n_chars"].sum())],
                "max_chars": [int(pdf["n_chars"].max())],
            }
        )

    schema = T.StructType(
        [
            T.StructField("lang", T.StringType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("total_chars", T.LongType()),
            T.StructField("max_chars", T.LongType()),
        ]
    )
    return d.groupBy("lang").applyInPandas(per_lang, schema).orderBy("lang")


SQL_B24 = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# B25 mapInArrow
def q_b25_map_in_arrow(spark, sf):
    import pyarrow as pa

    d = _t(spark, sf, "documents")

    def stats(batches):
        for b in batches:
            tbl = b.to_pandas()
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": tbl["doc_id"],
                    "text_len": tbl["text"].str.len().astype("int64"),
                }
            )

    return (
        d.select("doc_id", "text")
        .mapInArrow(stats, "doc_id long, text_len long")
        .orderBy("doc_id")
        .limit(400)
    )


SQL_B25 = """
SELECT doc_id, LENGTH(text) AS text_len FROM documents ORDER BY doc_id LIMIT 400
"""


# B26 grouped-agg pandas UDAF
def q_b26_grouped_agg_udaf(spark, sf):
    import numpy as np

    def _wavg(v, w):
        # B27's integer-cents discipline makes the UDAF hash-stable:
        # prices go to int64 cents and quantities to int64 BEFORE the sum,
        # so accumulation order (pandas partition order, numpy pairwise
        # summation) cannot wobble the last float digit; the single final
        # division of exact integers is bit-identical on both engines.
        cents = np.floor(v.to_numpy() * 100.0 + 0.5).astype("int64")
        qty = np.floor(w.to_numpy() + 0.5).astype("int64")
        return float(
            round(int((cents * qty).sum()) / (100.0 * int(qty.sum())), 6)
        )

    # annotation-free callable: `from __future__ import annotations`
    # stringifies hints, which pandas_udf's signature inference can't resolve
    weighted_avg = F.pandas_udf(_wavg, "double", F.PandasUDFType.GROUPED_AGG)

    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            weighted_avg(
                F.col("l_extendedprice"), F.col("l_quantity")
            ).alias("wavg_price")
        )
        .orderBy("l_returnflag")
    )


SQL_B26 = """
SELECT l_returnflag,
       ROUND(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                 * CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
             / (100.0 * SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))), 6)
           AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# B27 co-grouped applyInPandas (the cogroup half of SURVEY B24)
def q_b27_cogroup(spark, sf):
    import pandas as pd

    # bound the key range: cogrouped applyInPandas pays a Python/Arrow
    # round-trip PER KEY GROUP (~3 ms each), so 15k tiny groups would spend
    # ~45 s exercising overhead, not semantics; 400 keys keeps the entry
    # representative (and still overfills the LIMIT) at ~1 s
    orders = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderkey") < 400)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") < 400)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )

    import numpy as np

    def per_order(o: pd.DataFrame, l: pd.DataFrame) -> pd.DataFrame:
        # cogroup surfaces key groups present on EITHER side; inner
        # semantics (both sides non-empty) keeps the oracle a plain join.
        # Per-line values go to integer cents BEFORE summing (identical
        # double arithmetic on both engines, and integer sums are
        # order-independent) so the oracle hash-matches exactly.
        if o.empty or l.empty:
            return pd.DataFrame(
                columns=["o_orderkey", "o_totalprice", "net_cents", "n_lines"]
            )
        per_line = (l["l_extendedprice"] * (1.0 - l["l_discount"])).to_numpy()
        net_c = int(np.floor(per_line * 100.0 + 0.5).astype("int64").sum())
        return pd.DataFrame(
            {
                "o_orderkey": [int(o["o_orderkey"].iloc[0])],
                "o_totalprice": [round(float(o["o_totalprice"].iloc[0]), 6)],
                "net_cents": [net_c],
                "n_lines": [len(l)],
            }
        )

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("net_cents", T.LongType()),
            T.StructField("n_lines", T.LongType()),
        ]
    )
    return (
        orders.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(per_order, schema)
        .orderBy("o_orderkey")
        .limit(200)
    )


SQL_B27 = """
SELECT o_orderkey,
       ROUND(o_totalprice, 6) AS o_totalprice,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                     AS BIGINT)) AS BIGINT) AS net_cents,
       COUNT(*) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey < 400
GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey LIMIT 200
"""


from miru_spark.plans.geo import (  # noqa: E402  (geo family, round 5)
    SQL_GEO_BBOX,
    SQL_GEO_BOUNDS,
    SQL_GEO_CENTROID,
    SQL_GEO_DISTANCE,
    SQL_GEO_GEOHASH,
    SQL_GEO_POLYGON,
    SQL_GEO_RINGS,
    SQL_GEO_TILES,
    q_geo_bbox,
    q_geo_bounds,
    q_geo_centroid,
    q_geo_distance,
    q_geo_geohash,
    q_geo_polygon,
    q_geo_rings,
    q_geo_tiles,
)
from miru_spark.plans.events_aggs import (  # noqa: E402  (round 5b)
    SQL_AUTO_HISTOGRAM,
    SQL_DATE_HISTOGRAM,
    SQL_DATE_RANGE,
    SQL_DIVERSIFIED,
    SQL_TOP_METRICS,
    SQL_WEIGHTED_AVG,
    q_auto_histogram,
    q_date_histogram,
    q_date_range,
    q_diversified,
    q_top_metrics,
    q_weighted_avg,
)

QUERIES = {
    "rel_b01_projection": (q_b01_projection, SQL_B01),
    "rel_b02_filter": (q_b02_filter, SQL_B02),
    "rel_b03_inner_join": (q_b03_inner_join, SQL_B03),
    "rel_b04_broadcast_join": (q_b04_broadcast_join, SQL_B04),
    "rel_b05_outer_join": (q_b05_outer_join, SQL_B05),
    "rel_b06_semi_anti": (q_b06_semi_anti, SQL_B06),
    "rel_b07_theta_join": (q_b07_theta_join, SQL_B07),
    "rel_b08_hash_agg": (q_b08_hash_agg, SQL_B08),
    "rel_b09_distinct": (q_b09_distinct, SQL_B09),
    "rel_b10_approx_distinct": (q_b10_approx_distinct, None),
    "rel_b11_rollup": (q_b11_rollup, SQL_B11),
    "rel_b12_window_rank": (q_b12_window_rank, SQL_B12),
    "rel_b13_window_lag": (q_b13_window_lag, SQL_B13),
    "rel_b14_topk": (q_b14_topk, SQL_B14),
    "rel_b15_set_ops": (q_b15_set_ops, SQL_B15),
    "rel_b16_explode": (q_b16_explode, SQL_B16),
    "rel_b17_strings": (q_b17_strings, SQL_B17),
    "rel_b18_sha": (q_b18_sha, SQL_B18),
    "rel_b19_math": (q_b19_math, SQL_B19),
    "rel_b20_dates": (q_b20_dates, SQL_B20),
    "rel_b21_arrays": (q_b21_arrays, SQL_B21),
    "rel_b22_json": (q_b22_json, SQL_B22),
    "rel_b23_pandas_udf": (q_b23_pandas_udf, SQL_B23),
    "rel_b24_apply_in_pandas": (q_b24_apply_in_pandas, SQL_B24),
    "rel_b25_map_in_arrow": (q_b25_map_in_arrow, SQL_B25),
    "rel_b26_grouped_agg_udaf": (q_b26_grouped_agg_udaf, SQL_B26),
    "rel_b27_cogroup": (q_b27_cogroup, SQL_B27),
    # geo family (round 5, plans/geo.py): deterministic derived geo_point,
    # ES geo_distance / geo_bounding_box / distance rings / geotile_grid
    "geo_distance": (q_geo_distance, SQL_GEO_DISTANCE),
    "geo_bbox": (q_geo_bbox, SQL_GEO_BBOX),
    "geo_rings": (q_geo_rings, SQL_GEO_RINGS),
    "geo_tiles": (q_geo_tiles, SQL_GEO_TILES),
    # round-5b geo additions: centroid (exact fixed-point integer sums),
    # bounds, geohash_grid (generated bit-interleave + base32), polygon
    # (ray casting)
    "geo_centroid": (q_geo_centroid, SQL_GEO_CENTROID),
    "geo_bounds": (q_geo_bounds, SQL_GEO_BOUNDS),
    "geo_geohash": (q_geo_geohash, SQL_GEO_GEOHASH),
    "geo_polygon": (q_geo_polygon, SQL_GEO_POLYGON),
    # round-5b ES time-series / sampling aggs over events
    # (plans/events_aggs.py): date_histogram, date_range,
    # auto_date_histogram, diversified_sampler, top_metrics
    "ev_date_histogram": (q_date_histogram, SQL_DATE_HISTOGRAM),
    "ev_date_range": (q_date_range, SQL_DATE_RANGE),
    "ev_auto_histogram": (q_auto_histogram, SQL_AUTO_HISTOGRAM),
    "ev_diversified": (q_diversified, SQL_DIVERSIFIED),
    "ev_top_metrics": (q_top_metrics, SQL_TOP_METRICS),
    # ES weighted_avg: value weighted by a per-row weight field
    "ev_weighted_avg": (q_weighted_avg, SQL_WEIGHTED_AVG),
}

# per-query output columns (for the tagged-union composite oracle branches)
COLUMNS = {
    "rel_b01_projection": ("l_orderkey", "l_linenumber", "revenue"),
    "rel_b02_filter": ("n", "total"),
    "rel_b03_inner_join": ("c_mktsegment", "n_orders", "total"),
    "rel_b04_broadcast_join": ("p_brand", "qty"),
    "rel_b05_outer_join": ("n_orders", "n_customers"),
    "rel_b06_semi_anti": ("kind", "n"),
    "rel_b07_theta_join": ("p_brand", "n"),
    "rel_b08_hash_agg": (
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "avg_qty", "count_order",
    ),
    "rel_b09_distinct": ("l_returnflag", "n_parts", "n_supps"),
    "rel_b11_rollup": ("l_returnflag", "l_linestatus", "n"),
    "rel_b12_window_rank": ("o_custkey", "rk", "o_orderkey"),
    "rel_b13_window_lag": ("o_custkey", "o_orderkey", "prev_price", "run_cnt"),
    "rel_b14_topk": ("o_orderkey", "o_totalprice"),
    "rel_b15_set_ops": ("kind", "l_suppkey"),
    "rel_b16_explode": ("term", "n"),
    "rel_b17_strings": ("c_custkey", "seg_upper", "name_prefix", "name_len", "joined"),
    "rel_b18_sha": ("c_custkey", "h"),
    "rel_b19_math": ("p_partkey", "log_price", "size_pow", "ratio"),
    "rel_b20_dates": ("day", "event_type", "n", "total_value"),
    "rel_b21_arrays": ("doc_id", "n_tokens", "has_dup", "n_unique"),
    "rel_b22_json": ("event_id", "k"),
    "rel_b23_pandas_udf": ("doc_id", "n_tokens"),
    "rel_b24_apply_in_pandas": ("lang", "n_docs", "total_chars", "max_chars"),
    "rel_b25_map_in_arrow": ("doc_id", "text_len"),
    "rel_b27_cogroup": ("o_orderkey", "o_totalprice", "net_cents", "n_lines"),
    "geo_distance": ("event_id", "dist_m"),
    "geo_bbox": ("event_type", "n", "sum_value"),
    "geo_rings": ("ring", "n"),
    "geo_tiles": ("tile_x", "tile_y", "n"),
    "geo_centroid": ("event_type", "n", "c_lat", "c_lon"),
    "geo_bounds": ("event_type", "n", "min_lat", "max_lat", "min_lon", "max_lon"),
    "geo_geohash": ("gh", "n"),
    "geo_polygon": ("event_type", "n", "sum_value"),
    "ev_date_histogram": ("bucket_ts", "n", "sum_value"),
    "ev_date_range": ("range_key", "n", "sum_value"),
    "ev_auto_histogram": ("unit", "bucket_ts", "n"),
    "ev_diversified": ("event_type", "n", "sum_value"),
    "ev_top_metrics": ("event_type", "top_ts", "top_value"),
    "ev_weighted_avg": ("event_type", "n", "sum_w", "w_avg"),
}

# operator-family composites: 27 individual cases -> 11 driver entries
# (the driver records at most 50 entries; tags = the old entry names)
GROUPS = {
    "rel_scan_filter": ("rel_b01_projection", "rel_b02_filter"),
    "rel_joins": (
        "rel_b03_inner_join", "rel_b04_broadcast_join", "rel_b05_outer_join",
        "rel_b06_semi_anti", "rel_b07_theta_join",
    ),
    "rel_agg_rollup": ("rel_b08_hash_agg", "rel_b09_distinct", "rel_b11_rollup"),
    "rel_window": ("rel_b12_window_rank", "rel_b13_window_lag", "rel_b14_topk"),
    "rel_set_explode": ("rel_b15_set_ops", "rel_b16_explode"),
    "rel_scalar_funcs": (
        "rel_b17_strings", "rel_b18_sha", "rel_b19_math", "rel_b20_dates",
        # round 5: the ES geo family rides the scalar-math composite (pure
        # codegen trig + hash aggs over a deterministic derived geo_point)
        "geo_distance", "geo_bbox", "geo_rings", "geo_tiles",
        "geo_centroid", "geo_bounds", "geo_geohash", "geo_polygon",
        "ev_date_histogram", "ev_date_range", "ev_auto_histogram",
        "ev_diversified", "ev_top_metrics", "ev_weighted_avg",
    ),
    "rel_nested": ("rel_b21_arrays", "rel_b22_json"),
    "rel_pandas_arrow": ("rel_b23_pandas_udf", "rel_b25_map_in_arrow"),
    "rel_apply_cogroup": ("rel_b24_apply_in_pandas", "rel_b27_cogroup"),
}


def register_all(register) -> None:
    from miru_spark.plans.composite import register_composite

    for group, names in GROUPS.items():
        register_composite(register, group, [
            (n, QUERIES[n][0], QUERIES[n][1], COLUMNS[n]) for n in names
        ])
    # rows-only by design (approximate sketch): standalone
    register("rel_b10_approx_distinct", q_b10_approx_distinct, None)
    # value-oracled since r4: integer-cents accumulation (B27's discipline)
    # removed the float-order nondeterminism that kept this rows-only
    register("rel_b26_grouped_agg_udaf", q_b26_grouped_agg_udaf, SQL_B26)
