"""A64 — percolation (ES percolate query / Lucene MemoryIndex alerting):
REVERSE search. Queries are registered as data; each incoming document is
matched against every registered query — the saved-search / alerting
primitive ("tell me when a doc matching my query arrives").

Spark-first shape, with the candidate pruning ES itself uses at alerting
scale: conjunctive queries are INDEXED BY THEIR RAREST TERM (df measured
against the incoming batch's vocabulary-restricted term table — the
percolation analogue of reading df from the term dictionary). A doc can
only match a conjunctive query if it contains that anchor term, so
doc -> candidate-query pairs are generated off the anchor join alone and
only candidates pay the full verification join — with rare anchors the
candidate set is a sliver of the all-terms join the naive plan pays.
Disjunctive queries match on ANY term, so their term join IS the match
set (no verification needed, just a distinct); NOT clauses anti-join.
All shuffles are map-side combined; the query table is tiny next to the
corpus, so AQE broadcasts it and the document side never reshuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.functions.tokenize import tokens_col


def percolate(
    corpus: DataFrame,
    queries: DataFrame,
    tokenizer: str = "whitespace",
    text_col: str = "content",
) -> DataFrame:
    """(doc_id, query_id) for every (document, registered query) match.

    ``queries`` schema: (query_id long, terms array<string>,
    mode string in {conjunctive, disjunctive}, exclude array<string>
    nullable). A doc matches a query iff it contains every/any query term
    (by mode) and none of the excluded terms.
    """
    from pyspark.sql import Window

    q = queries.select(
        "query_id",
        "mode",
        # DISTINCT term count: a registered query with a duplicated term
        # must still be satisfiable (n_matched counts distinct terms, so a
        # raw size() would make such a conjunctive query match nothing —
        # ES's percolator deduplicates terms the same way)
        F.size(F.array_distinct("terms")).alias("n_terms"),
        F.explode(F.array_distinct("terms")).alias("term"),
    )
    # restrict the exploded corpus to the QUERY vocabulary before the
    # distinct: the expensive distinct then dedups only matching
    # (doc, term) pairs instead of the whole token stream. On the 31-term
    # synthetic corpus with all-hot query terms this trims ~20% (the
    # matches themselves dominate); on a Zipfian corpus where registered
    # queries touch a sliver of the vocabulary it removes almost the whole
    # token stream. Broadcast semi-join, no shuffle added.
    vocab = q.select("term").distinct()
    if "exclude" in queries.columns:
        vocab = vocab.unionByName(
            queries.select(F.explode_outer("exclude").alias("term"))
            .filter(F.col("term").isNotNull())
        ).distinct()
    doc_terms = (
        corpus.select(
            "doc_id", F.explode(tokens_col(text_col, tokenizer)).alias("term")
        )
        .join(F.broadcast(vocab), "term", "left_semi")
        .distinct()
    )

    # --- disjunctive: ANY term hit IS a match — the term join needs no
    # verification, just a (doc, query) distinct.
    qd = q.filter(F.col("mode") == "disjunctive")
    matched_dis = (
        doc_terms.join(qd, "term").select("doc_id", "query_id").distinct()
    )

    # --- conjunctive: anchor-term candidate pruning (the ES refinement).
    # Each query is indexed by its RAREST term — df measured against the
    # batch's own vocabulary-restricted term table (one tiny map-side-
    # combined agg; the percolation analogue of a dictionary df lookup).
    # Terms absent from the batch get df 0 and win the anchor pick, so a
    # conjunctive query naming an absent term generates zero candidates
    # and pays nothing — the common alerting case. Only candidate pairs
    # (docs containing the anchor) pay the full-verification join.
    qc = q.filter(F.col("mode") == "conjunctive")
    term_df = doc_terms.groupBy("term").agg(F.count("*").alias("__df"))
    aw = Window.partitionBy("query_id").orderBy(
        F.asc("__df"), F.asc("term")
    )
    anchors = (
        qc.join(F.broadcast(term_df), "term", "left")
        .withColumn("__df", F.coalesce(F.col("__df"), F.lit(0)))
        .withColumn("__rn", F.row_number().over(aw))
        .filter(F.col("__rn") == 1)
        .select("query_id", "term")
    )
    cands = doc_terms.join(anchors, "term").select("doc_id", "query_id")
    matched_con = (
        cands.join(qc.select("query_id", "n_terms", "term"), "query_id")
        .join(doc_terms, ["doc_id", "term"])
        .groupBy("doc_id", "query_id", "n_terms")
        .agg(F.count_distinct("term").alias("n_matched"))
        .filter(F.col("n_matched") == F.col("n_terms"))
        .select("doc_id", "query_id")
    )

    matched = matched_dis.unionByName(matched_con)
    if "exclude" in queries.columns:
        xq = queries.select(
            "query_id", F.explode_outer("exclude").alias("term")
        ).filter(F.col("term").isNotNull())
        hits_excl = doc_terms.join(xq, "term").select("doc_id", "query_id")
        matched = matched.join(hits_excl, ["doc_id", "query_id"], "left_anti")
    return matched


def percolate_oracle_sql(
    query_rows: list[tuple[int, list[str], str, list[str]]],
) -> str:
    """DuckDB twin over the documents view: the same distinct-term join +
    per-(doc, query) match-count filter + NOT anti-join, with the
    registered queries inlined as VALUES rows."""
    qvals = []
    xvals = []
    for qid, terms, mode, exclude in query_rows:
        uterms = list(dict.fromkeys(terms))  # ES-style term dedup (engine twin)
        for t in uterms:
            qvals.append(f"({int(qid)}, '{t}', '{mode}', {len(uterms)})")
        for t in exclude or []:
            xvals.append(f"({int(qid)}, '{t}')")
    x_cte = (
        f",\nxq(query_id, term) AS (VALUES {','.join(xvals)}),\n"
        "xhit AS (SELECT DISTINCT doc_id, query_id FROM dt JOIN xq USING(term))"
        if xvals
        else ""
    )
    x_where = (
        "AND NOT EXISTS (SELECT 1 FROM xhit "
        "WHERE xhit.doc_id = m.doc_id AND xhit.query_id = m.query_id)"
        if xvals
        else ""
    )
    return f"""
WITH dt AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS term
            FROM documents),
q(query_id, term, mode, n_terms) AS (VALUES {','.join(qvals)}){x_cte},
m AS (
  SELECT doc_id, query_id, mode, n_terms,
         count(DISTINCT term) AS n_matched
  FROM dt JOIN q USING(term)
  GROUP BY 1, 2, 3, 4)
SELECT doc_id, query_id FROM m
WHERE ((mode = 'conjunctive' AND n_matched = n_terms)
       OR (mode = 'disjunctive' AND n_matched >= 1))
{x_where}
""".strip()
