"""Partitioning plans for skew and byte-balance (SURVEY.md §4: the
custom logic Catalyst does not provide for a map-only UDF stage).

At 10^12 pages the parse stage's cost per row is proportional to
``length(html)`` and hosts are Zipf-distributed, so naive
hash-by-host partitioning leaves stragglers.  Two explicit plans:

* **host-skew salting** — detect heavy-hitter keys with a cheap
  aggregate, split each across ``ceil(share·n)`` salted sub-keys;
* **size-balanced bins** — greedy first-fit-decreasing packing of
  per-key byte totals into bins of ``target_bytes``, applied as a
  broadcast-joined bin id used as the repartition key.

Both compute a small driver-side plan (heavy keys / bin map are tiny
relative to the corpus) and apply it with one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOST_EXPR = "parse_url(url, 'HOST')"


def salt_skewed_keys(
    df: DataFrame,
    key_expr: str = HOST_EXPR,
    n_partitions: int = 64,
    skew_factor: float = 2.0,
) -> DataFrame:
    """Add ``part_key``/``salt`` columns and repartition so no key's
    rows exceed ~``skew_factor``× the mean partition load.

    Heavy-hitter sketch: one map-side-combined count per key (the key
    cardinality — hosts — is orders of magnitude below row count, so
    this aggregate is cheap and exact).  Heavy keys are split into
    ``ceil(count / target)`` salts via a deterministic row hash.
    """
    keyed = df.withColumn("part_key", F.expr(key_expr))
    counts = keyed.groupBy("part_key").count()
    total = df.count()
    mean = max(1.0, total / n_partitions)
    threshold = skew_factor * mean
    # fanout targets the MEAN partition load so each salted sub-key is
    # an average-sized unit even after hash collisions
    heavy = {
        r["part_key"]: int(-(-r["count"] // mean))  # ceil
        for r in counts.where(F.col("count") > threshold).collect()
    }
    if not heavy:
        salted = keyed.withColumn("salt", F.lit(0))
    else:
        fanout = F.create_map(
            *[F.lit(x) for kv in heavy.items() for x in kv]
        )
        salted = keyed.withColumn(
            "salt",
            F.when(
                fanout[F.col("part_key")].isNotNull(),
                F.pmod(F.xxhash64("url"), fanout[F.col("part_key")]),
            ).otherwise(F.lit(0)).cast("int"),
        )
    return salted.repartition(n_partitions, "part_key", "salt")


def size_balanced_bins(
    df: DataFrame,
    key_expr: str = HOST_EXPR,
    bytes_expr: str = "length(html)",
    target_bytes: int = 64 << 20,
) -> DataFrame:
    """Repartition so each partition carries ≈``target_bytes`` of html.

    Pass 1 aggregates bytes per key (small); the driver packs keys into
    bins greedily (first-fit decreasing); keys bigger than a bin are
    split by row-hash across ``ceil(bytes/target)`` sub-bins.  Pass 2
    applies the broadcast bin map as the shuffle key.  Arrow batches
    inside the parse UDF then see bounded byte budgets regardless of
    document-size heavy tails.
    """
    keyed = df.withColumn("part_key", F.expr(key_expr)).withColumn(
        "doc_bytes", F.expr(bytes_expr).cast("bigint")
    )
    totals = (
        keyed.groupBy("part_key").agg(F.sum("doc_bytes").alias("b")).collect()
    )
    open_bins: list[list[int]] = []  # [bin_id, remaining_capacity]
    assign: dict[str, tuple[int, int]] = {}  # key -> (first_bin, n_subbins)
    next_bin = 0
    for r in sorted(totals, key=lambda r: -r["b"]):
        b, k = int(r["b"]), r["part_key"]
        if b >= target_bytes:
            # oversized key: split across ceil(b/target) dedicated bins
            n_sub = -(-b // target_bytes)
            assign[k] = (next_bin, n_sub)
            next_bin += n_sub
            continue
        for ob in open_bins:
            if ob[1] >= b:
                ob[1] -= b
                assign[k] = (ob[0], 1)
                break
        else:
            open_bins.append([next_bin, target_bytes - b])
            assign[k] = (next_bin, 1)
            next_bin += 1
    first = F.create_map(*[F.lit(x) for k, (f0, _) in assign.items() for x in (k, f0)])
    nsub = F.create_map(*[F.lit(x) for k, (_, ns) in assign.items() for x in (k, ns)])
    binned = keyed.withColumn(
        "size_bin",
        (
            first[F.col("part_key")]
            + F.pmod(F.xxhash64("url"), nsub[F.col("part_key")])
        ).cast("int"),
    )
    return binned.repartition(max(next_bin, 1), "size_bin")
