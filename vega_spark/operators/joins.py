"""Joins & cogroup (SURVEY.md §2.4).

Reference parity:
- join(other, n)    reference src/rdd/pair_rdd.rs:104-121 — inner
  equi-join implemented as cogroup + per-key cross product; the only
  physical strategy is a shuffled hash cogroup. Here Catalyst picks
  broadcast-hash / sort-merge / shuffled-hash per side sizes, and the
  full join-type matrix (left/right/full/semi/anti) is a capability
  superset the reference lacks.
- cogroup(...)      reference src/rdd/pair_rdd.rs:123-155,
  src/rdd/co_grouped_rdd.rs:66-250 — N-ary group across datasets with
  shuffle elision for co-partitioned inputs (:102-126). Spark elides
  the exchange the same way via HashPartitioning propagation.
- cartesian(other)  reference src/rdd/rdd.rs:352-362, cartesian_rdd.rs:31-139
- zip(other)        reference src/rdd/rdd.rs:818-829, zip_rdd.rs:32-150 —
  positional pairing; no DataFrame equivalent, emulated with
  row_number over an explicit ordering (the only well-defined
  ordering at scale; partition-order zip is nondeterministic after
  any shuffle, so the explicit-key form is strictly safer).

Scale notes: ``join`` broadcasts the small side automatically below
spark.sql.autoBroadcastJoinThreshold and via AQE at runtime; pass
``broadcast_right=True`` to force it for dimension tables. Skewed
join keys are split by AQE (skewJoin enabled in session defaults).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column,
         how: str = "inner", broadcast_right: bool = False) -> DataFrame:
    """Equi-join (reference: inner only; all Spark join types exposed).
    Duplicate keys multiply (per-key cross product) exactly as the
    reference's cogroup+flatten does."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def cogroup(left: DataFrame, right: DataFrame,
            left_key: str, right_key: str,
            left_value: str, right_value: str,
            key_name: str = "key",
            sort_values: bool = True) -> DataFrame:
    """``cogroup``: for every key present in either input, the list of
    left values and the list of right values (empty array when the
    side lacks the key — the reference emits empty Vecs likewise).

    Physical shape: two partial aggregations (collect_list per side)
    then a full-outer shuffle join on the key. When both inputs are
    already hash-partitioned on the key the exchanges are elided —
    the same co-partitioning optimization as the reference's narrow
    cogroup dependency."""
    lg = left.groupBy(F.col(left_key).alias(key_name)).agg(
        F.collect_list(left_value).alias("left_values"))
    rg = right.groupBy(F.col(right_key).alias(key_name)).agg(
        F.collect_list(right_value).alias("right_values"))
    out = lg.join(rg, on=key_name, how="full_outer").select(
        key_name,
        F.coalesce("left_values", F.array()).alias("left_values"),
        F.coalesce("right_values", F.array()).alias("right_values"),
    )
    if sort_values:
        out = out.select(
            key_name,
            F.sort_array("left_values").alias("left_values"),
            F.sort_array("right_values").alias("right_values"),
        )
    return out


def cartesian(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cross product. The reference materializes the right side per
    task (cartesian_rdd.rs:107-139); Spark's BroadcastNestedLoopJoin
    does the same with a broadcast, or falls back to
    CartesianProduct. Keep one side small."""
    return left.crossJoin(right)


def zip_by_order(left: DataFrame, right: DataFrame,
                 left_order: Sequence[str], right_order: Sequence[str]) -> DataFrame:
    """``zip``: positional pairing of two equal-length datasets under
    explicit total orderings (reference zips partition iterators —
    that ordering is only reproducible with an explicit sort key).

    Implementation: scalable zip_with_index on each side (see below —
    range-partitioned, no global single-task window), inner join on
    the index. The index join shuffles on a uniform BIGINT, so there
    is no skew; at 100 TB prefer a shared key over positional
    semantics when one exists."""
    # r9 opt (guide §2.6): each side's zip_with_index runs a blocking
    # per-partition count job; the two sides share no lineage, so the
    # two jobs overlap from a driver thread pool — the scheduler
    # back-fills one side's stage tail with the other side's tasks.
    from vega_spark.session import run_overlapped
    li, ri = run_overlapped(
        lambda: zip_with_index(left, left_order, "__idx"),
        lambda: zip_with_index(right, right_order, "__idx"))
    # disambiguate colliding column names with suffixes, like rdd.zip's tuple
    rcols = [F.col(c).alias(c if c not in left.columns else c + "_right")
             for c in right.columns]
    return li.join(ri.select("__idx", *rcols), on="__idx", how="inner").drop("__idx")


def _range_sorted_local_index(df: DataFrame,
                              order: Sequence[str]) -> DataFrame:
    """The pre-materialization pipeline of ``zip_with_index``: range
    partition + in-partition sort + local 0-based position. Split out
    so the plan contract (range partitioning, no Window) stays
    assertable — the checkpoint in ``zip_with_index`` truncates the
    final plan to an ExistingRDD scan, hiding this subtree."""
    sort_cols = [F.col(c) if isinstance(c, str) else c for c in order]
    return (df.repartitionByRange(*sort_cols)
            .sortWithinPartitions(*sort_cols)
            .select("*", F.spark_partition_id().alias("__pid"),
                    F.monotonically_increasing_id()
                    .bitwiseAND(F.lit((1 << 33) - 1)).alias("__lidx")))


def zip_with_index(df: DataFrame, order: Sequence[str],
                   index_name: str = "index") -> DataFrame:
    """zipWithIndex under an explicit ordering (0-based) — the
    scalable plan, mirroring how the reference's ZippedPartitionsRdd /
    RDD.zip_with_index family works per-partition (zip_rdd.rs:32-150):

    1. range-partition + sort within partitions on the ordering
       (partition p's keys all precede partition p+1's);
    2. local 0-based position per partition via
       ``monotonically_increasing_id`` arithmetic (its low 33 bits
       are the within-partition record counter) — a narrow projection
       in the sort stage, NO window;
    3. a per-partition COUNT job (returns one row per partition — the
       same O(num_partitions) driver exchange as rdd.zipWithIndex),
       whose cumulative offsets broadcast-join back;
    4. index = offset[pid] + local position.

    No ``Window.orderBy`` without partitioning anywhere, so no
    all-rows-through-one-task stage: the old plan was correct but
    single-reducer; this one keeps every stage at full parallelism
    and survives a 100x scale-up. The sorted frame is materialized
    once (localCheckpoint) and feeds both the count job and the final
    job; ties in the ordering get an arbitrary but valid index within
    their tie group.
    """
    # r9 opt: materialize the sorted+indexed frame ONCE — the count
    # job below and the final job then read the same materialization
    # instead of each recomputing the range-partition + sort (this
    # also pins tie order: both jobs now see the identical (__pid,
    # __lidx) assignment by construction rather than by deterministic
    # replay). Spark's own rdd.zipWithIndex recomputes; persisting is
    # the DataFrame-era trade (storage is MEMORY_AND_DISK, so at
    # scale the sorted run spills rather than pinning heap). The
    # checkpoint is LAZY: the per-partition count job below is the
    # first action, so it materializes the checkpoint itself — one
    # job instead of a checkpoint job plus a cached-read count job.
    s = _range_sorted_local_index(df, order).localCheckpoint(eager=False)
    counts = s.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    sizes = {r["__pid"]: r["__n"] for r in counts}
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = df.sparkSession.createDataFrame(offsets or [(0, 0)],
                                          "__pid int, __off long")
    return (s.join(F.broadcast(off), "__pid")
            .withColumn(index_name,
                        (F.col("__off") + F.col("__lidx")).cast("long"))
            .drop("__pid", "__lidx", "__off"))


def asof_join(left: DataFrame, right: DataFrame,
              key_cols: Sequence[str], ts_col: str,
              value_cols: Sequence[str], how: str = "inner",
              direction: str = "backward",
              tolerance: int | None = None) -> DataFrame:
    """As-of join: each left row picks the nearest right row per key —
    ``direction='backward'`` the latest with ``right.ts <= left.ts``,
    ``'forward'`` the earliest with ``right.ts >= left.ts``. A
    temporal operator the reference lacks entirely (only equi-joins,
    SURVEY §2.4). ``tolerance`` (same units as ``ts_col``) bounds the
    match distance — a stale quote/state older than the tolerance is
    treated as no match (pandas merge_asof semantics).

    Physical strategy (the scalable one): tag both sides, union, and
    run one ``last/first(..., ignorenulls)`` window per value column
    over (key, ts) order. That is a single hash shuffle on the key
    plus one per-partition sort — no range-explosion cross join, no
    per-key state on the driver, and skewed keys are still split by
    AQE. A naive ``left.ts >= right.ts`` theta-join is O(|L|·|R|) per
    key and would not survive 100x data.

    Equal timestamps on both sides match in either direction.
    ``how='inner'`` drops unmatched left rows (DuckDB ASOF JOIN
    semantics); ``'left'`` keeps them with nulls.

    The matched right row is carried as ONE struct (all value columns
    + its timestamp) filled by a single last/first(ignorenulls) — an
    atomic carry. Filling each value column independently would let a
    column that is NULL in the nearest right row be back-filled from
    a farther row, silently mixing rows (and leaking values past
    ``tolerance``, since only the nearest row's timestamp was
    checked).
    """
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.window import Window

    key_cols = list(key_cols)
    value_cols = list(value_cols)
    rschema = {f.name: f.dataType for f in right.schema.fields}
    row_type = StructType(
        [StructField(c, rschema[c]) for c in value_cols]
        + [StructField("__rts", rschema[ts_col])])
    l = (left.withColumn("__side", F.lit(1))
         .withColumn("__rrow", F.lit(None).cast(row_type)))
    r = right.select(
        *key_cols, ts_col,
        F.struct(*[F.col(c) for c in value_cols],
                 F.col(ts_col).alias("__rts")).alias("__rrow"))
    for c in left.columns:
        if c not in key_cols and c != ts_col:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.withColumn("__side", F.lit(0))
    u = l.unionByName(r)
    if direction == "backward":
        # right (side 0) sorts before left at equal ts → visible in
        # the preceding-inclusive frame
        w = (Window.partitionBy(*key_cols)
             .orderBy(F.col(ts_col), F.col("__side"))
             .rowsBetween(Window.unboundedPreceding, 0))
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    elif direction == "forward":
        # left sorts before right at equal ts → right visible in the
        # following-inclusive frame
        w = (Window.partitionBy(*key_cols)
             .orderBy(F.col(ts_col), F.col("__side").desc())
             .rowsBetween(0, Window.unboundedFollowing))
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError(f"direction must be backward/forward: {direction}")
    out = (u.withColumn("__rrow", fill("__rrow"))
           .filter(F.col("__side") == 1).drop("__side"))
    matched = F.col("__rrow").isNotNull()
    if tolerance is not None:
        dist = (F.col(ts_col) - F.col("__rrow.__rts")
                if direction == "backward"
                else F.col("__rrow.__rts") - F.col(ts_col))
        matched = matched & (dist <= tolerance)
    for c in value_cols:
        out = out.withColumn(c, F.when(matched, F.col("__rrow")[c]))
    if how == "inner":
        out = out.filter(matched)
    return out.drop("__rrow")


def range_join_bucketed(left: DataFrame, right: DataFrame,
                        key_cols: Sequence[str],
                        left_ts: str, right_ts: str,
                        max_diff: int,
                        strict_after: bool = True) -> DataFrame:
    """Range (interval) join: pairs where ``0 < right.ts - left.ts <=
    max_diff`` per key (``strict_after=False`` makes the lower bound
    inclusive). ``ts`` columns are integers (our events use BIGINT
    nanoseconds, so a 5-minute radius is ``300 * 10**9``).

    Physical strategy: coarse time-bucketing turns the inequality into
    an equi-join. Each left row joins buckets {b, b+1} (bucket width =
    max_diff, so a match can span at most one boundary), then the
    exact predicate filters. This bounds the per-key cross product to
    two buckets instead of the whole key group — the difference
    between O(rows x bucket_width) and O(rows x key_cardinality) at
    100 TB. Catalyst alone would plan the raw inequality as a
    cross/theta join.
    """
    key_cols = list(key_cols)
    # integral `div`, NOT float division: BIGINT nanosecond epochs
    # (~1.7e18) exceed double precision (2^53) and would mis-bucket
    lbkt = F.expr(f"`{left_ts}` div {max_diff}")
    lb = left.withColumn("__bkt", F.explode(F.array(lbkt, lbkt + 1)))
    rb = right.withColumn("__bkt", F.expr(f"`{right_ts}` div {max_diff}"))
    diff = F.col(right_ts) - F.col(left_ts)
    lower = diff > 0 if strict_after else diff >= 0
    return (lb.join(rb, on=key_cols + ["__bkt"], how="inner")
            .filter(lower & (diff <= max_diff))
            .drop("__bkt"))


def cogroup_apply(left: DataFrame, right: DataFrame,
                  left_keys, right_keys, fn, schema) -> DataFrame:
    """Arbitrary-logic cogroup: Spark's ``groupby().cogroup()
    .applyInPandas`` — for every key in either input, ``fn(left_pdf,
    right_pdf) -> pdf`` runs on the two groups as pandas frames.

    This is the faithful generalization of the reference's cogroup +
    downcast-and-compute pattern (src/rdd/co_grouped_rdd.rs:206-249,
    src/rdd/pair_rdd.rs:123-155): both sides of a key materialized
    together for black-box logic. Physical shape: one hash exchange
    per side on the key (co-partitioned inputs elide theirs), groups
    stream to Python as Arrow batches — no driver hop, no
    collect_list blowup in the JVM; a group must fit in one worker's
    memory, which is the same contract the reference's Vec-per-key
    cogroup imposes."""
    lk = [left_keys] if isinstance(left_keys, str) else list(left_keys)
    rk = [right_keys] if isinstance(right_keys, str) else list(right_keys)
    return (left.groupby(*lk)
            .cogroup(right.groupby(*rk))
            .applyInPandas(fn, schema))


def cogroup_n(inputs: Sequence[tuple[DataFrame, str, str]],
              key_name: str = "key",
              sort_values: bool = True) -> DataFrame:
    """N-ary ``cogroup`` — the reference's CoGroupedRdd takes any
    number of inputs (co_grouped_rdd.rs:66-250; the binary `cogroup`
    above is the common case). For every key present in ANY input,
    one row with a values array per input (empty arrays where a side
    lacks the key).

    Physical shape: one partial collect_list aggregation per input,
    then chained full-outer joins on the key — Spark coalesces the
    USING key across sides, and inputs already partitioned on the key
    elide their exchanges exactly like the reference's narrow cogroup
    dependency."""
    grouped = []
    for i, (df, key, value) in enumerate(inputs):
        grouped.append(
            df.groupBy(F.col(key).alias(key_name))
            .agg(F.collect_list(value).alias(f"values_{i}")))
    out = grouped[0]
    for g in grouped[1:]:
        out = out.join(g, on=key_name, how="full_outer")
    cols = [key_name]
    for i in range(len(inputs)):
        v = F.coalesce(f"values_{i}", F.array())
        if sort_values:
            v = F.sort_array(v)
        cols.append(v.alias(f"values_{i}"))
    return out.select(*cols)
