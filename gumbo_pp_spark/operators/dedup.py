"""Deduplication operators for web-scale corpora.

Beyond the reference's per-document scope: these are the corpus-level
operations a 10^12-page extraction pipeline needs before/after the
parse stage.  All are pure DataFrame compositions (JVM-side, whole-
stage-codegen friendly; no Python UDFs) and use md5 as the shared hash
so a DuckDB oracle can recompute results bit-for-bit.

Scale notes (100 TB design):
* exact dedup — hash-groupBy; map-side partial agg; the key is a short
  digest so shuffle rows are tiny.
* n-gram Jaccard — explode+self-join is quadratic in candidates; it is
  the *verification* stage, fed by a blocking stage (MinHash bands).
* MinHash+LSH — band buckets turn all-pairs into per-bucket joins; the
  band key is the shuffle key, so skewed buckets (boilerplate-heavy
  shingles) are the thing to watch — cap bucket size upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# word 3-gram shingles of a text column (Spark SQL expression; the
# DuckDB oracle mirrors it with list_transform/array slicing)
SHINGLE_EXPR = (
    "array_distinct(transform(sequence(1, size(split(text, ' ')) - 2), "
    "j -> concat_ws(' ', slice(split(text, ' '), j, 3))))"
)


def exact_dedup(df: DataFrame, key_expr: str = "substr(text, 1, 30)") -> DataFrame:
    """Exact duplicate groups by a canonical key; keeps min(doc_id).

    Returns (dup_key, keep_id, n_dups) for every group.  Map-side
    combine makes this one cheap shuffle of (key → partial agg).
    """
    return (
        df.groupBy(F.expr(key_expr).alias("dup_key"))
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        )
    )


def shingles(df: DataFrame) -> DataFrame:
    """(doc_id, shingle) exploded distinct word-3-grams; docs with <3
    words contribute nothing (guard matches the oracle)."""
    return (
        df.where(F.expr("size(split(text, ' ')) >= 3"))
        .select("doc_id", F.explode(F.expr(SHINGLE_EXPR)).alias("sh"))
    )


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.5, min_shared: int = 5) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    Candidate pairs = docs sharing ≥ ``min_shared`` shingles (the
    blocking prefilter keeps the self-join from going quadratic);
    jaccard = shared / (|A| + |B| - shared) ≥ threshold.
    Returns (a, b, jaccard_e4) with a < b, jaccard scaled to int so the
    oracle compare is exact.
    """
    sh = shingles(df)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("a_id").cast("bigint").alias("a"),
            F.col("b_id").cast("bigint").alias("b"),
            F.round(F.col("jaccard") * 10000).cast("bigint").alias("jaccard_e4"),
        )
    )


N_MINHASHES = 8
N_BANDS = 4  # 2 rows per band


def minhash_signatures(df: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh7) — k-th minhash = lexicographic min of
    md5('<k>|' || shingle).  md5-on-string is identical in Spark and
    DuckDB, which makes the whole LSH pipeline oracle-checkable."""
    sh = shingles(df)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}|"), F.col("sh")))).alias(f"mh{k}")
        for k in range(N_MINHASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, min_equal: int = 4) -> DataFrame:
    """MinHash banding: candidates share at least one band (2
    consecutive minhashes equal); survivors need ≥ ``min_equal`` of the
    8 minhashes equal (estimated Jaccard ≥ min_equal/8).
    Returns (a, b, n_eq).
    """
    sig = minhash_signatures(df).cache()
    bands = None
    for bd in range(N_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(bd).alias("band"),
            F.concat(F.col(f"mh{2 * bd}"), F.col(f"mh{2 * bd + 1}")).alias("bkey"),
        )
        bands = part if bands is None else bands.unionAll(part)
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    eq = sum(
        (F.col(f"sa.mh{k}") == F.col(f"sb.mh{k}")).cast("int") for k in range(N_MINHASHES)
    )
    return (
        cand.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select(
            F.col("a_id").cast("bigint").alias("a"),
            F.col("b_id").cast("bigint").alias("b"),
            eq.cast("bigint").alias("n_eq"),
        )
        .where(F.col("n_eq") >= min_equal)
    )


def _simhash_bit_sql(j: int) -> str:
    """SQL for bit j of a 16-bit simhash vote, shared Spark/DuckDB
    dialect: hex-digit of md5 → int via instr, then floor-div/mod."""
    hexpos = 1 + j // 4
    p = 2 ** (3 - j % 4)
    v = f"(instr('0123456789abcdef', substr(md5(w), {hexpos}, 1)) - 1)"
    return f"(CAST(floor({v} / {p}) AS BIGINT) % 2)"


def simhash16_sql(text_col: str = "text") -> str:
    """Spark-SQL expression computing a 16-bit simhash of the word
    multiset of ``text_col`` (bit = majority vote of md5 bits)."""
    bits = []
    for j in range(16):
        bit = _simhash_bit_sql(j)
        vote = f"aggregate(split({text_col}, ' '), 0L, (acc, w) -> acc + 2 * {bit} - 1)"
        bits.append(f"(CASE WHEN {vote} > 0 THEN {2 ** j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash bigint).  Near-dup pairs at scale: group by
    rotated bit-bands of the fingerprint, verify survivors with
    ``bit_count(a ^ b) <= r`` (xor+popcount are JVM intrinsics)."""
    return df.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr(simhash16_sql(text_col)).cast("bigint").alias("simhash"),
    )


def simhash_pairs(df: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Spark-side near-dup join on simhash (not oracle-gated: DuckDB
    lacks a shared xor operator spelling).  Bands the 16-bit space on
    the high byte so equal-prefix candidates co-locate in one shuffle.
    """
    s = simhash(df)
    a = s.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"),
                 (F.col("simhash") / 256).cast("int").alias("band"))
    b = s.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"),
                 (F.col("simhash") / 256).cast("int").alias("band"))
    return (
        a.join(b, ["band"])
        .where(F.col("a") < F.col("b"))
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
