"""Physical-layout & skew operators — the 100 TB toolbox (SURVEY.md §4).

The reference never meets these problems (≤50 rows); at cluster scale they
decide whether a plan finishes:

- ``write_bucketed``        — hash-bucket (and optionally sort) a table at
  WRITE time. Equi-joins / aggregations on the bucket key then read
  co-located buckets and skip the shuffle entirely — the biggest single
  lever for repeated fact⋈fact joins (pay one shuffle at ingest, none per
  query).
- ``salted_count_distinct`` — exact COUNT(DISTINCT x) without a hot
  reducer: dedup within (key, hash(x) % salt) buckets, then sum partial
  distinct counts per key. Each distinct value lands in exactly one bucket,
  so the sum is exact.
- ``salted_join``           — skewed equi-join: spread each hot left key
  over ``salt`` sub-keys and replicate the right side ``salt``×. AQE's
  skew-join split handles moderate skew automatically; explicit salting is
  for the pathological single-key case (one user = 10% of events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "write_bucketed",
    "write_range_clustered",
    "write_zordered",
    "zorder_key",
    "salted_count_distinct",
    "salted_join",
    "skew_report",
    "epoch_shuffle",
    "range_boundaries",
    "curriculum_order",
    "compaction_plan",
]


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) interleave of ``cols`` as one long column.

    Each input column is first normalized by the caller to an integer in
    [0, 2^bits) — ``write_zordered`` uses equal-width ``width_bucket``
    against global min/max —
    then the bit-interleave is pure codegen arithmetic: for bit position
    b, column j contributes bit b of its value at output position
    b·n_cols + j. ``bits`` × n_cols must stay ≤ 63."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"zorder_key: {bits} bits x {n} cols exceeds int64")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c) if isinstance(c, str) else c
        v = v.cast("long")
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + j)
            )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
    bits: int = 10,
) -> None:
    """Multi-dimensional clustering: order the table by the Z-order
    (Morton) curve over ``cluster_cols`` so parquet min/max stats prune
    files for filters on ANY subset of the dimensions — the Delta/Iceberg
    OPTIMIZE ZORDER shape, built from open Spark primitives.

    ``write_range_clustered`` is optimal for one column but leaves the
    second unclustered (a filter on it reads every file); the Z-curve
    interleaves normalized bits of all dimensions, giving each file a
    small hyper-rectangle of the value space instead of a thin full-width
    stripe. Normalization is equal-width bucketing against one global
    min/max aggregate (a 1-row collect — NOT a global rank window, which
    would funnel 100 TB through one task); the key is then pure codegen
    bit-arithmetic (zorder_key) and one range-partitioned write. Heavily
    skewed dims would want quantile boundaries instead (approxQuantile →
    broadcast width table) — equal-width keeps the write one pass and is
    the Delta default shape. At 100 TB: a point/box query on d clustered
    dims touches ~(selectivity^(1/d))·files per dim rather than all of
    them; keep d ≤ 3-4 — the curse of dimensionality erodes the boxes
    beyond that."""
    buckets = 1 << bits
    stats = df.agg(
        *[
            agg
            for c in cluster_cols
            for agg in (
                F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
            )
        ]
    ).collect()[0]
    ranked = df
    rank_cols = []
    for c in cluster_cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        rc = f"_zr_{c}"
        if mn is None or mx is None or mx <= mn:
            ranked = ranked.withColumn(rc, F.lit(0).cast("long"))
        else:
            # width_bucket → 1..buckets for in-range values; clamp NULLs
            # low so they cluster together at the curve origin.
            ranked = ranked.withColumn(
                rc,
                F.coalesce(
                    F.width_bucket(
                        F.col(c).cast("double"),
                        F.lit(mn),
                        F.lit(mx),
                        F.lit(buckets - 1),
                    )
                    - 1,
                    F.lit(0),
                ).cast("long"),
            )
        rank_cols.append(rc)
    z = zorder_key(rank_cols, bits)
    (
        ranked.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *rank_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols`` (sorted within
    buckets when ``sort_cols`` is given, enabling shuffle-free AND
    sort-free sort-merge joins). ``path`` makes it an external table.

    Size ``n_buckets`` so one bucket ≈ one task's memory at target scale
    (e.g. 100 TB / 256 MB ≈ 400k → thousands of buckets, not 32)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
) -> None:
    """Range-cluster a table on ``cluster_cols`` at write time:
    ``repartitionByRange`` gives each output file a DISJOINT value range,
    and ``sortWithinPartitions`` orders rows inside each file. Parquet
    stores per-row-group min/max for every column, so a later filtered
    scan on the cluster columns skips whole files/row-groups — the
    open-source lever for time-series reads (cluster events by ts: a
    one-day query over 100 TB touches ~1/365th of the files). The range
    boundaries come from a sampled sketch of the data — one extra sampling
    pass, no full sort."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_salts: int = 32,
) -> DataFrame:
    """Exact per-group count-distinct in two balanced hash aggregations.

    Plain ``countDistinct`` shuffles every (group, value) pair to the
    group's single reducer — a hot group melts it. Salting by
    ``hash(value) % n_salts`` splits each group's dedup across ``n_salts``
    reducers; each distinct value maps to exactly one salt bucket, so
    summing the per-bucket distinct counts is exact, not an estimate."""
    out_col = f"n_distinct_{distinct_col}"
    partial = (
        df.select(*group_cols, distinct_col)
        .withColumn("_salt", F.pmod(F.xxhash64(distinct_col), F.lit(n_salts)))
        .groupBy(*group_cols, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to a pathologically hot ``key``.

    Left rows scatter across ``n_salts`` sub-keys (derived from the input
    partition, so co-partitioned rows of a hot key spread apart); the right
    side replicates ``n_salts``× via a sequence-explode. Join runs on
    (key, salt) — the hot key's rows now occupy ``n_salts`` reducers.
    Right replication cost: |right| × n_salts rows, so use this when the
    right side is the smaller relation (dimension against a skewed fact).

    Only inner/left/semi/anti are salting-safe: with right/full outer, an
    unmatched right row has been replicated across all n_salts sub-keys and
    would emit n_salts null-padded output rows instead of one."""
    safe = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
            "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join(how={how!r}) would duplicate unmatched right rows "
            f"n_salts times; supported: inner/left/semi/anti"
        )
    salted_left = left.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(salted_right, [key, "_salt"], how).drop("_salt")


def skew_report(df: DataFrame, key_cols: list[str], top_k: int = 5) -> DataFrame:
    """Join/agg-key skew diagnostic — the numbers that decide between a
    plain shuffle, AQE skew splitting, and explicit salting
    (`salted_join` / `salted_count_distinct`): per-key-count distribution
    (max, median, p99), the skew factor max/avg, and an integer
    recommended salt count ceil(max/avg) computed in EXACT integer
    arithmetic (ceil-div: (max·n_keys + n_rows − 1) div n_rows — no
    float boundary). One row out; ``top_keys`` carries the top-k heavy
    keys as 'key:count' strings.

    Cost: one grouped count over the key (the exchange you were about to
    take anyway, here taken once on a diagnostic run) + a count-sized
    aggregate. Run it on a sample for a quick read — counts scale, the
    RATIOS this reports are what matter."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    key_str = F.concat_ws("/", *[F.col(c).cast("string") for c in key_cols])
    topk = (
        counts.orderBy(F.col("cnt").desc(), *key_cols)
        .limit(int(top_k))
        .select(F.concat(key_str, F.lit(":"), F.col("cnt")).alias("kc"))
        .agg(F.array_join(F.collect_list("kc"), ", ").alias("top_keys"))
    )
    stats = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.expr("percentile(cnt, 0.5)").alias("p50_key_rows"),
        F.expr("percentile(cnt, 0.99)").alias("p99_key_rows"),
    )
    return stats.crossJoin(F.broadcast(topk)).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.round("p50_key_rows", 2).alias("p50_key_rows"),
        F.round("p99_key_rows", 2).alias("p99_key_rows"),
        F.round(
            F.col("max_key_rows") * F.col("n_keys") / F.col("n_rows"), 4
        ).alias("skew_factor"),
        # `div` = true integer division (no double round-trip: a double
        # quotient cast back to long can truncate 2.9999999... to 2
        # where exact ceil-div says 3)
        F.expr(
            "(max_key_rows * n_keys + n_rows - 1) div n_rows"
        ).alias("recommended_salts"),
        "top_keys",
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    batch_size: int = 64,
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic corpus shuffle + training-batch assignment: the order
    a trainer reads the corpus in epoch ``seed``. Every row gets a
    ``global_pos`` (its position in the md5(seed:id) order — a new seed
    string per epoch yields a fresh, reproducible permutation) and the
    ``batch_id`` = global_pos / batch_size it lands in. Re-running with
    the same seed reproduces the epoch exactly — the property that makes
    training-data order auditable and resumable.

    Scale shape — the naive formulation is a single global
    ``row_number() OVER (ORDER BY key)``, which Spark executes as ONE
    partition holding the whole corpus (the classic global-sort-rank
    trap). This implementation is the distributed two-phase rank:

    1. bucket each row by the first 2 hex chars of its shuffle key
       (lexicographic hex order == numeric order, so bucket order is
       consistent with key order);
    2. count rows per bucket — a 1-in-``n_buckets`` aggregate — and
       running-sum those counts into bucket offsets (the ONLY
       unpartitioned window runs over that ``n_buckets``-row relation,
       never over data);
    3. rank WITHIN each bucket (a partitioned window) and add the
       broadcast bucket offset: ``global_pos = offset + rank - 1``.

    One data shuffle (the per-bucket rank exchange) for an exact global
    permutation. To materialize the epoch physically, write with
    ``repartitionByRange(global_pos)`` so readers stream batches in
    order without any sort."""
    from pyspark.sql import Window as W

    key = F.md5(
        F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))
    )
    # 2 hex chars → 256 buckets; fewer via RANGE division (floor(prefix *
    # n_buckets / 256)), never modulo: bucket order must stay consistent
    # with shuffle_key order or global_pos stops being the md5-order rank
    # (pmod puts prefix 0x0a in bucket 0 behind 0x01 in bucket 1).
    if not 1 <= int(n_buckets) <= 256:
        raise ValueError(f"n_buckets must be in [1, 256], got {n_buckets}")
    prefix = F.conv(F.substring("shuffle_key", 1, 2), 16, 10).cast("int")
    b = df.select(F.col(id_col), key.alias("shuffle_key")).withColumn(
        "_bucket",
        ((prefix * F.lit(int(n_buckets))) / F.lit(256)).cast("int"),
    )
    counts = b.groupBy("_bucket").agg(F.count("*").alias("_cnt"))
    off_w = (
        W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_bucket",
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_offset"),
    )
    rank_w = W.partitionBy("_bucket").orderBy("shuffle_key", id_col)
    return (
        b.withColumn("_r", F.row_number().over(rank_w))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("global_pos", F.col("_offset") + F.col("_r") - 1)
        .withColumn(
            "batch_id", F.floor(F.col("global_pos") / int(batch_size))
        )
        .select(id_col, "shuffle_key", "global_pos", "batch_id")
    )


def range_boundaries(
    df: DataFrame, col: str, n_buckets: int = 8
) -> DataFrame:
    """Equi-depth range-boundary planner: the exact quantile boundaries
    that split ``col`` into ``n_buckets`` near-equal buckets, with the
    realized per-bucket counts proving the balance. This is the number
    a clustered write actually needs — ``repartitionByRange`` samples
    to estimate these; pinning them exactly fixes file sizes and feeds
    range-pruning metadata.

    Scale honesty: Spark's EXACT ``percentile`` buffers the column's
    values in the final aggregate — fine to ~10^8 rows of one double
    column (the calibration/audit tier this query is), NOT a 100 TB
    scan. At that scale swap in ``approx_percentile`` (mergeable
    sketch, same call shape) or the q41 sketch tier for the boundaries
    and keep this exact path as the small-sample auditor that
    validates the sketch's error.

    Exactness: Spark's exact ``percentile`` and DuckDB's
    ``quantile_cont`` compute the same interpolated values (the q114
    parity), so bucket assignment (count of boundaries strictly below
    the value) replays bit-for-bit in the oracle. One aggregate for the
    boundaries (broadcast back as a 1-row array), one grouped count —
    the table never sorts."""
    n = int(n_buckets)
    fracs = ", ".join(str(k / n) for k in range(1, n))
    b = df.agg(F.expr(f"percentile({col}, array({fracs}))").alias("_bs"))
    d = df.select(F.col(col).alias("_v")).crossJoin(F.broadcast(b))
    bucket = F.size(F.filter("_bs", lambda x: F.col("_v") > x))
    counts = (
        d.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"))
    )
    return counts.crossJoin(F.broadcast(b)).select(
        "bucket",
        "n_rows",
        F.when(
            F.col("bucket") >= 1,
            F.round(F.element_at("_bs", F.col("bucket")), 4),
        ).alias("lo"),
        F.when(
            F.col("bucket") <= n - 2,
            F.round(F.element_at("_bs", F.col("bucket") + 1), 4),
        ).alias("hi"),
    )


def curriculum_order(
    df: DataFrame,
    tier_col: str,
    id_col: str = "doc_id",
    seed: str = "cur0",
    batch_size: int = 64,
) -> DataFrame:
    """Curriculum training order: TIER-major (easy tiers first),
    deterministically SHUFFLED within each tier — the read order a
    curriculum run wants, with the same reproducibility/auditability
    contract as ``epoch_shuffle``. Implementation is the same
    distributed two-phase rank with a composite bucket
    (tier · 256 + hash-prefix): per-bucket partitioned rank + a
    broadcast offset relation whose only unpartitioned window runs over
    ≤ tiers × 256 rows. Global order equals (tier asc, md5(seed:id)
    asc) — provable against the naive window (the q116 oracle
    discipline) — and batches are contiguous cuts of it, so early
    batches are all easy-tier."""
    from pyspark.sql import Window as W

    key = F.md5(
        F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))
    )
    b = df.select(
        F.col(id_col), F.col(tier_col).alias("tier"), key.alias("shuffle_key")
    ).withColumn(
        "_bucket",
        F.col("tier").cast("long") * 256
        + F.conv(F.substring("shuffle_key", 1, 2), 16, 10).cast("long"),
    )
    counts = b.groupBy("_bucket").agg(F.count("*").alias("_cnt"))
    off_w = W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "_bucket",
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_offset"),
    )
    rank_w = W.partitionBy("_bucket").orderBy("shuffle_key", id_col)
    return (
        b.withColumn("_r", F.row_number().over(rank_w))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("global_pos", F.col("_offset") + F.col("_r") - 1)
        .withColumn(
            "batch_id", F.floor(F.col("global_pos") / int(batch_size))
        )
        .select(id_col, "tier", "shuffle_key", "global_pos", "batch_id")
    )


def compaction_plan(
    df: DataFrame, ts_col: str = "ts", target_rows: int = 1000
) -> DataFrame:
    """Small-files compaction planner: assign consecutive DAILY
    micro-batches to compaction groups by fixed-quota cumulative
    splitting — group_id = floor(exclusive_prefix_rows / target_rows)
    — the deterministic, order-stable assignment a maintenance job
    uses to rewrite a drip-fed table into ~target-sized files
    (the OPTIMIZE/compact primitive of lakehouse table formats).

    Quota splitting (vs greedy first-fit) is deliberately chosen: it
    is a pure function of the prefix sums, so two engines (and two
    reruns over the same snapshot) produce the identical plan with no
    sequential scan. ``oversized`` flags any group whose TOTAL row
    count exceeds the budget — which happens when a single day larger
    than the budget lands in it, and also when several sub-budget
    days quota-split into the same group — rather than splitting it:
    day boundaries are the atomic unit (a compactor never splits an
    input partition mid-day), so an over-budget group is surfaced for
    the operator instead of silently split.

    Shape at 100 TB: the corpus collapses to the daily relation in
    one map-side-combined aggregation; the prefix-sum window runs on
    that bounded (≤ |days|) relation only.
    """
    from pyspark.sql import Window as W

    daily = (
        df.select(F.to_date(ts_col).alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    assigned = daily.withColumn(
        "group_id",
        F.floor(
            F.coalesce(F.sum("n").over(w), F.lit(0)) / int(target_rows)
        ).cast("long"),
    )
    return (
        assigned.groupBy("group_id")
        .agg(
            F.min("d").alias("d_from"),
            F.max("d").alias("d_to"),
            F.count("*").alias("n_days"),
            F.sum("n").cast("long").alias("n_rows"),
        )
        .withColumn("oversized", F.col("n_rows") > int(target_rows))
        .orderBy("group_id")
    )
