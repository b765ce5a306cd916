"""Deduplication operators for large-scale training-data pipelines.

Four tiers, all Spark-first (SURVEY.md's training-data mandate):

* exact      — hash-groupBy on content sha256; one shuffle of (hash, doc_id).
* ngram      — exact token-3-gram Jaccard via a shingle self-join;
               quadratic in co-shingled docs, the small-scale ground truth.
* minhash    — MinHash + LSH banding: per-doc signatures computed in a
               SHUFFLE-FREE ``mapInPandas`` pass (JVM xxhash64 shingle-hash
               arrays in, ``np.minimum.reduceat`` minima out — parallelism
               equals input partitions, memory bounded per slice), band
               buckets, candidate pairs, exact-Jaccard verification of
               candidates only. The 100TB-scale path: no quadratic stage
               ever materializes; bucket sizes bound the pair blow-up.
* simhash    — 64-bit SimHash fingerprints (same shuffle-free mapInPandas
               shape), banded into ``max_hamming + 1`` disjoint bit chunks
               (pigeonhole-sound for any radius), verified by
               ``bit_count(xor)`` hamming distance — JVM-side popcount.

The *_pairs operators emit every qualifying pair — O(m^2) per duplicate
cluster of size m, fine at verification scale, wrong at 100TB where web/code
boilerplate forms million-doc clusters. The *_clusters operators are the
scale path: star edges to each bucket's min doc_id (O(m) per bucket),
verification on those edges only, then connected components by min-label
propagation -> (doc_id, cluster_rep). ``max_bucket_size`` additionally lets
the pairs operators skip degenerate buckets.

Shingle definition shared by all tiers: token 3-grams joined by one space,
docs with <3 tokens excluded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MINHASH_PERMS = 64
MINHASH_BANDS = 16  # x 4 rows/band
_MERSENNE = (1 << 61) - 1

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # 16 bits each


def tokens(col):
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def shingles_col(toks):
    """array of token-3-gram strings (0-based Spark array indexing)."""
    idx = F.sequence(F.lit(0), F.size(toks) - 3)
    return F.when(
        F.size(toks) >= 3,
        F.transform(
            idx, lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2])
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles_col(tokens(F.col(text_col)))).alias("shingle"),
        )
        .distinct()
    )


# ------------------------------------------------------------------ exact --

def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical docs: (keep_doc_id, n_dups, doc_ids)."""
    h = F.sha2(F.col(text_col), 256)
    return (
        docs.select(h.alias("h"), F.col("doc_id"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the smallest doc_id per identical content."""
    from pyspark.sql.window import Window

    h = F.sha2(F.col(text_col), 256)
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        docs.withColumn("h", h)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("h", "rk")
    )


# ------------------------------------------------------------ exact jaccard --

def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, round_digits: int = 6
) -> DataFrame:
    """All doc pairs with token-3-gram Jaccard >= threshold (exact).

    Shingle self-join — the ground-truth twin for MinHash. Quadratic in
    docs-per-shingle; at scale use ``minhash_lsh_pairs`` (this operator's
    own verify stage reuses the same Jaccard definition).
    """
    sh = doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", F.round(jac, round_digits).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_oracle_sql(threshold: float = 0.5, round_digits: int = 6) -> str:
    return f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
              FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                      for i in range(1, len(ts) - 1)]) AS shingle
       FROM toks WHERE len(ts) >= 3),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), {round_digits}) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), {round_digits}) >= {threshold}
ORDER BY doc_a, doc_b
""".strip()


# ---------------------------------------------------------------- minhash --

def _perm_coeffs(n_perms: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perms, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perms, dtype=np.int64).astype(np.uint64)
    return a, b


def _ragged(pdf_col) -> tuple[np.ndarray, np.ndarray]:
    """pandas Series of list<long> -> (flat uint64 array, per-row lengths)."""
    vals = pdf_col.to_numpy()
    lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=len(vals))
    flat = (
        np.concatenate(vals).astype(np.int64).astype(np.uint64)
        if lens.sum()
        else np.empty(0, dtype=np.uint64)
    )
    return flat, lens


def _bounded_slices(lens: np.ndarray, max_items: int):
    """(row_start, row_end) ranges whose total flat items stay <= max_items
    (>=1 row each) — bounds per-step numpy temporaries regardless of Arrow
    batch size."""
    n = lens.size
    s = 0
    while s < n:
        e = s + 1
        tot = int(lens[s])
        while e < n and tot + lens[e] <= max_items:
            tot += int(lens[e])
            e += 1
        yield s, e
        s = e


_SLICE_ITEMS = 1 << 18  # ~256k hashes per vectorized step


def minhash_signatures(
    docs: DataFrame, n_perms: int = MINHASH_PERMS, seed: int = 42
) -> DataFrame:
    """(doc_id, sig: array<long>[n_perms]) — per-doc MinHash signatures.

    Signatures are PER-DOC values, so no grouping/shuffle is needed at all:
    shingle hashes are computed JVM-side as an array column (xxhash64 inside
    ``transform`` — no explode), and one ``mapInPandas`` pass takes vectorized
    ``np.minimum.reduceat`` minima per permutation over each Arrow batch.
    Parallelism == input partitions; memory == one bounded slice.  (Round 1
    grouped by pmod(doc_id, 64) — a hard 64-task ceiling whose per-group
    pandas frames grew with the corpus.)

    Min over a doc's shingle hashes ignores duplicates by construction, so
    hashing the raw (non-distinct) shingle array is equivalent to the
    distinct-shingle definition.
    """
    a_co, b_co = _perm_coeffs(n_perms, seed)
    hashed = docs.select(
        F.col("doc_id"),
        F.transform(
            shingles_col(tokens(F.col("text"))), lambda s: F.xxhash64(s)
        ).alias("hs"),
    ).filter(F.size("hs") > 0)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def sigs(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            flat, lens = _ragged(pdf["hs"])
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(lens)))
            for s, e in _bounded_slices(lens, _SLICE_ITEMS):
                h = flat[offsets[s] : offsets[e]]
                starts = (offsets[s:e] - offsets[s]).astype(np.int64)
                rows = np.empty((e - s, a_co.size), dtype=np.int64)
                for j in range(a_co.size):
                    hv = (a_co[j] * h + b_co[j]) % np.uint64(_MERSENNE)
                    rows[:, j] = np.minimum.reduceat(hv, starts).astype(np.int64)
                yield pd.DataFrame({"doc_id": doc_ids[s:e], "sig": list(rows)})

    return hashed.mapInPandas(sigs, out_schema)


def _minhash_bands(
    docs: DataFrame, n_perms: int, n_bands: int, seed: int
) -> DataFrame:
    """(doc_id, band_idx, bucket) — xxhash64 of each signature band slice."""
    rows_per_band = n_perms // n_bands
    sig = minhash_signatures(docs, n_perms, seed)
    return sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda band: F.xxhash64(
                    band, F.slice(F.col("sig"), band * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band_idx", "bucket"),
    )


def _cap_buckets(bands: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Drop (band_idx, bucket) groups larger than the cap BEFORE the pair
    self-join: one boilerplate cluster of m near-identical docs would emit
    O(m^2) candidate pairs per band otherwise. Capped docs are still
    recalled through their other (smaller) band buckets; truly mega-bucket
    content is boilerplate you want a cluster representative for anyway
    (use the *_clusters operators, whose per-bucket cost is O(m))."""
    if max_bucket_size is None:
        return bands
    from pyspark.sql.window import Window

    w = Window.partitionBy("band_idx", "bucket")
    return (
        bands.withColumn("_bn", F.count("*").over(w))
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_perms: int = MINHASH_PERMS,
    n_bands: int = MINHASH_BANDS,
    seed: int = 42,
    round_digits: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    Stages: signatures -> band buckets (xxhash64 of band slice, JVM-side) ->
    same-bucket candidate pairs (distinct) -> exact Jaccard on candidates
    ONLY (shingle-set join restricted by a semi-join). Output identical to
    ``ngram_jaccard_pairs`` restricted to LSH-recalled pairs.

    Pair output is inherently O(m^2) per duplicate cluster of size m; set
    ``max_bucket_size`` to skip degenerate buckets, or use
    :func:`minhash_dedup_clusters` for O(m) doc->representative output.
    """
    bands = _cap_buckets(
        _minhash_bands(docs, n_perms, n_bands, seed), max_bucket_size
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return (
        _verify_jaccard(docs, cand, round_digits)
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def _verify_jaccard(docs: DataFrame, cand: DataFrame, round_digits: int) -> DataFrame:
    """Exact token-3-gram Jaccard for the given (doc_a, doc_b) candidate
    pairs only: shingle join restricted by a semi-join on the candidate doc
    set. Plain semi-join, no broadcast hint — on dup-heavy corpora the
    candidate set is unbounded, and AQE broadcasts it when small."""
    sh = doc_shingles(docs)
    cand_docs = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select("doc_b")
    ).distinct()
    sh = sh.join(cand_docs, "doc_id", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        cand.join(a, F.col("a.doc_id") == F.col("doc_a"))
        .join(
            b,
            (F.col("b.doc_id") == F.col("doc_b"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .select("doc_a", "doc_b", F.round(jac, round_digits).alias("jaccard"))
    )


# ------------------------------------------------- cluster representatives --

def min_label_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components of an undirected (a, b) edge set by iterative
    min-label propagation: every node's label converges to the smallest
    doc_id in its component. Returns (doc_id, cluster_rep).

    Each round is one distributed join + aggregate (no driver-side
    adjacency); rounds needed = graph diameter. LSH candidate graphs are
    near-star-shaped (every bucket contributes doc->bucket-min edges), so
    the diameter is tiny — a handful of rounds even when bands chain
    clusters together. ``localCheckpoint`` truncates the growing lineage;
    the loop stops early at the first round with zero label changes.
    """
    und = edges.select(F.col("a"), F.col("b")).union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    und = und.persist()
    labels = (
        und.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nb_min = (
            und.join(labels, und.b == labels.doc_id)
            .groupBy("a")
            .agg(F.min("label").alias("nb_min"))
        )
        new = (
            labels.join(nb_min, labels.doc_id == nb_min.a, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nb_min", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # never silently return partial labels: a component whose diameter
        # exceeds max_iter would split one duplicate cluster into several
        # with no sign anything failed
        und.unpersist()
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    und.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster_rep"))


def minhash_dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    n_perms: int = MINHASH_PERMS,
    n_bands: int = MINHASH_BANDS,
    seed: int = 42,
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, cluster_rep) for near-duplicate docs — the 100TB-scale
    output shape. A duplicate cluster of m docs costs O(m), never O(m^2):

    1. band buckets as in :func:`minhash_lsh_pairs`;
    2. STAR edges only — every doc links to its bucket's min doc_id
       (m-1 edges per bucket, not m(m-1)/2 pairs);
    3. exact-Jaccard verification of the star edges only (O(edges));
    4. connected components by min-label propagation over verified edges.

    Verification is doc<->bucket-representative, not all-pairs: a doc whose
    similarity to the representative falls below threshold drops out even
    if a pairwise chain exists — the conservative, bounded-cost tradeoff
    (the pairs operator remains the exact-recall twin at small scale).
    Output rows: one per doc that belongs to a verified cluster, including
    the representative itself (cluster_rep == min doc_id of the cluster).
    """
    from pyspark.sql.window import Window

    bands = _minhash_bands(docs, n_perms, n_bands, seed)
    w = Window.partitionBy("band_idx", "bucket")
    star = (
        bands.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    verified = _verify_jaccard(docs, star, round_digits).filter(
        F.col("jaccard") >= threshold
    )
    edges = verified.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    return min_label_components(edges).orderBy("doc_id")


def simhash_dedup_clusters(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_id, cluster_rep) via SimHash chunk buckets: star edges to the
    chunk-bucket min doc_id, verified by hamming distance on the full
    fingerprint, then min-label components — O(m) per duplicate cluster."""
    from pyspark.sql.window import Window

    fp = simhash_fingerprints(docs)
    chunks = _simhash_chunks(fp, max_hamming)
    w = Window.partitionBy("chunk_idx", "chunk")
    star = (
        chunks.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    f_a = fp.select(F.col("doc_id").alias("doc_a"), F.col("fingerprint").alias("fp_a"))
    f_b = fp.select(F.col("doc_id").alias("doc_b"), F.col("fingerprint").alias("fp_b"))
    verified = (
        star.join(f_a, "doc_a")
        .join(f_b, "doc_b")
        .filter(F.expr("bit_count(fp_a ^ fp_b)") <= max_hamming)
    )
    edges = verified.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    return min_label_components(edges).orderBy("doc_id")


# ---------------------------------------------------------------- simhash --

def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint:long) — 64-bit SimHash over tf-weighted xxhash64
    token hashes.

    Per-doc values again, so the tf groupBy of round 1 is unnecessary:
    summing each OCCURRENCE's +/-1 bit contribution equals summing each
    distinct term's contribution weighted by its tf (integer sums in float64
    are exact far beyond any doc length). Token hashes come from the JVM as
    an array column; one shuffle-free ``mapInPandas`` computes bit sums with
    ``np.add.reduceat`` over bounded slices.
    """
    hashed = docs.select(
        F.col("doc_id"),
        F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t)).alias("hs"),
    ).filter(F.size("hs") > 0)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("fingerprint", T.LongType()),
        ]
    )

    bit_idx = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << bit_idx

    def fp(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            flat, lens = _ragged(pdf["hs"])
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(lens)))
            for s, e in _bounded_slices(lens, _SLICE_ITEMS // 8):
                h = flat[offsets[s] : offsets[e]]
                starts = (offsets[s:e] - offsets[s]).astype(np.int64)
                bits = ((h[:, None] >> bit_idx) & np.uint64(1)).astype(np.float64)
                sums = np.add.reduceat(bits * 2.0 - 1.0, starts, axis=0)
                fps = (sums > 0).astype(np.uint64)
                vals = (fps * weights).sum(axis=1, dtype=np.uint64).astype(np.int64)
                yield pd.DataFrame({"doc_id": doc_ids[s:e], "fingerprint": vals})

    return hashed.mapInPandas(fp, out_schema)


def simhash_chunk_spec(max_hamming: int) -> list[tuple[int, int]]:
    """Disjoint (bit_offset, width) chunks covering all 64 fingerprint bits.

    PIGEONHOLE SOUNDNESS: two fingerprints within ``max_hamming`` bit flips
    must share at least one chunk verbatim, which requires
    ``n_chunks >= max_hamming + 1`` — the fixed 4x16-bit geometry of round 2
    was only sound for max_hamming <= 3 and silently missed pairs above it.
    Chunk count is now derived from the query (never below the default 4);
    widths differ by at most one bit (wider chunks first)."""
    n_chunks = max(SIMHASH_CHUNKS, max_hamming + 1)
    if n_chunks > SIMHASH_BITS:
        raise ValueError(f"max_hamming={max_hamming} needs more chunks than bits")
    base, rem = divmod(SIMHASH_BITS, n_chunks)
    spec, off = [], 0
    for c in range(n_chunks):
        w = base + (1 if c < rem else 0)
        spec.append((off, w))
        off += w
    return spec


def _simhash_chunks(fp: DataFrame, max_hamming: int) -> DataFrame:
    """(doc_id, fingerprint, chunk_idx, chunk) under the pigeonhole-sound
    geometry for ``max_hamming``."""
    spec = simhash_chunk_spec(max_hamming)
    exprs = ", ".join(
        f"shiftright(fingerprint, {off}) & {(1 << w) - 1}" for off, w in spec
    )
    return fp.select(
        "doc_id",
        "fingerprint",
        F.posexplode(F.expr(f"array({exprs})")).alias("chunk_idx", "chunk"),
    )


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, max_bucket_size: int | None = None
) -> DataFrame:
    """Candidate pairs sharing any fingerprint chunk (chunk count derived
    from ``max_hamming`` — see :func:`simhash_chunk_spec`), verified with
    JVM-side ``bit_count(a ^ b) <= max_hamming``.

    Pair output is O(m^2) per duplicate cluster; ``max_bucket_size`` skips
    degenerate buckets (recall falls back to the other chunks), and
    :func:`simhash_dedup_clusters` is the O(m) doc->representative path.
    """
    fp = simhash_fingerprints(docs)
    chunks = _simhash_chunks(fp, max_hamming)
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("chunk_idx", "chunk")
        chunks = (
            chunks.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    x, y = chunks.alias("x"), chunks.alias("y")
    return (
        x.join(
            y,
            (F.col("x.chunk_idx") == F.col("y.chunk_idx"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.expr("bit_count(x.fingerprint ^ y.fingerprint)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


def simhash_jaccard_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """SimHash banding as the CANDIDATE GENERATOR, exact token-3-gram
    Jaccard as the VERIFIER — the production near-dup shape (CCNet/Gopher
    verify recalled candidates exactly) and the SimHash twin of
    :func:`minhash_lsh_pairs`'s contract: output = exact-Jaccard pairs
    >= threshold restricted to SimHash-recalled candidates, so whenever
    the hamming radius gives full recall the exact-pairs SQL
    (:func:`ngram_jaccard_oracle_sql`) is a value oracle. The hamming-only
    variant (:func:`simhash_near_pairs`) remains for pure fingerprint
    semantics."""
    cand = simhash_near_pairs(docs, max_hamming).select("doc_a", "doc_b")
    return (
        _verify_jaccard(docs, cand, round_digits)
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def simhash_jaccard_clusters(
    docs: DataFrame,
    max_hamming: int = 3,
    threshold: float = 0.5,
    round_digits: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_id, cluster_rep): min-label components over the exact-verified
    SimHash candidate pairs (:func:`simhash_jaccard_pairs`'s edge set).

    Star edges (the O(m)-per-cluster trick of :func:`minhash_dedup_clusters`
    / :func:`simhash_dedup_clusters`) are NOT sound here: a radius-10 chunk
    bucket freely mixes unrelated docs, so a doc whose bucket-min rep fails
    the exact-Jaccard verify would drop out even though a verified chain
    exists. Cost is O(recalled candidate pairs) — bounded by the banding
    geometry and ``max_bucket_size``; at extreme duplication the
    hamming-star variant (:func:`simhash_dedup_clusters`) is the O(m)
    scale path."""
    cand = simhash_near_pairs(docs, max_hamming, max_bucket_size).select(
        "doc_a", "doc_b"
    )
    verified = _verify_jaccard(docs, cand, round_digits).filter(
        F.col("jaccard") >= threshold
    )
    edges = verified.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    return min_label_components(edges).orderBy("doc_id")


def minhash_jaccard_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    n_perms: int = MINHASH_PERMS,
    n_bands: int = MINHASH_BANDS,
    seed: int = 42,
    round_digits: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_id, cluster_rep): min-label components over the exact-verified
    MinHash candidate pairs (:func:`minhash_lsh_pairs`' full edge set) —
    the MinHash twin of :func:`simhash_jaccard_clusters`.

    This is the variant whose components EQUAL the exact all-pairs
    components whenever banding recall is full (candidate pairs == exact
    pairs => identical edge sets), which is what makes the recursive-CTE
    components SQL a sound value oracle. The star-edge variant
    (:func:`minhash_dedup_clusters`) is the O(m)-per-cluster scale path
    but verifies doc<->bucket-min only, so a chain whose star edge fails
    verification can split a component the exact oracle joins — it stays
    pytest-covered, never SQL-oracled."""
    pairs = minhash_lsh_pairs(
        docs, threshold, n_perms, n_bands, seed, round_digits, max_bucket_size
    )
    edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    return min_label_components(edges).orderBy("doc_id")


def components_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`min_label_components` over the pair set a
    pairs oracle produces: a recursive reachability CTE (undirected edges,
    UNION-dedup termination), one row per clustered doc with
    cluster_rep = min doc_id of its component."""
    base = pairs_sql.strip()
    if base.upper().rsplit("ORDER BY", 1)[-1] != base.upper():
        base = base.rsplit("ORDER BY", 1)[0]
    return f"""
WITH RECURSIVE pairs AS ({base}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(node, peer) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a
)
SELECT node AS doc_id, LEAST(node, MIN(peer)) AS cluster_rep
FROM reach GROUP BY node ORDER BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# exact duplicate-span removal (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better": remove exact k-token spans that occur
# verbatim elsewhere in the corpus — the suffix-array ExactSubstr dedup,
# reformulated as distributed shingle aggregation)


def _span_frame(docs: DataFrame, k: int, text_col: str) -> DataFrame:
    """(doc_id, pos, span): every k-token window of every doc. Built from
    JVM higher-order functions (transform/sequence/slice) — no Python."""
    toks = tokens(F.col(text_col))
    spans = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return (
        docs.filter(F.size(toks) >= k)
        .select("doc_id", F.posexplode(spans).alias("pos", "span"))
    )


def duplicate_span_coverage(
    docs: DataFrame, k: int = 5, min_docs: int = 2, text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos) token positions covered by any k-token span whose
    exact sequence occurs in >= min_docs DISTINCT docs.

    Plan: shingle frame -> hash agg count(DISTINCT doc_id) per span
    (map-side combined; the span string is the shuffle key, so hot
    boilerplate spans combine before the exchange) -> semi-join the
    qualifying spans back onto the shingle frame -> explode each start
    into its k covered positions -> distinct. Two shuffles total at any
    corpus size; nothing quadratic. The shingle frame feeds BOTH sides of
    the semi-join, so it persists (memory-and-disk, LRU-evicted) — without
    it Spark recomputes the dominant posexplode twice per action."""
    spans = _span_frame(docs, k, text_col).persist()
    dup = (
        spans.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("span")
    )
    starts = spans.join(dup, "span", "left_semi")
    return (
        starts.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
    )


def duplicate_span_stats(
    docs: DataFrame, k: int = 5, min_docs: int = 2, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_removed) per doc — the ExactSubstr dedup
    bookkeeping row (how much of each doc is corpus-duplicated text)."""
    toks = tokens(F.col(text_col))
    counts = docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    removed = (
        duplicate_span_coverage(docs, k, min_docs, text_col)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_removed"))
    )
    return (
        counts.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias(
                "n_removed"
            ),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame, k: int = 5, min_docs: int = 2, text_col: str = "text"
) -> DataFrame:
    """(doc_id, text_clean): each doc with every covered token dropped and
    the survivors rejoined in order — the actual cleaning pass. Token
    order restores via array_sort over (pos, token) structs (no window)."""
    toks = tokens(F.col(text_col))
    exploded = docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    cov = duplicate_span_coverage(docs, k, min_docs, text_col)
    kept = exploded.join(cov, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_clean")
    )
    # docs whose every token was covered (or shorter than k with no spans)
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("text_clean", F.lit("")).alias("text_clean")
        )
    )


def duplicate_span_stats_oracle_sql(k: int = 5, min_docs: int = 2) -> str:
    """DuckDB twin of duplicate_span_stats (1-based list arithmetic)."""
    return f"""
WITH arr AS (SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') a
             FROM documents),
tc AS (SELECT doc_id, CAST(len(a) AS BIGINT) n_tokens FROM arr),
spans AS (SELECT doc_id, pos, array_to_string(a[pos:pos+{k - 1}], ' ') AS span
          FROM (SELECT doc_id, a,
                       unnest(generate_series(1, len(a) - {k} + 1)) AS pos
                FROM arr WHERE len(a) >= {k})),
dup AS (SELECT span FROM spans GROUP BY span
        HAVING count(DISTINCT doc_id) >= {min_docs}),
starts AS (SELECT doc_id, pos FROM spans JOIN dup USING(span)),
covered AS (SELECT DISTINCT doc_id, pos + o AS cp
            FROM (SELECT doc_id, pos,
                         unnest(generate_series(0, {k - 1})) AS o
                  FROM starts)),
rem AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_removed
        FROM covered GROUP BY 1)
SELECT doc_id, n_tokens, COALESCE(n_removed, 0) AS n_removed
FROM tc LEFT JOIN rem USING(doc_id)
""".strip()
