"""Scale-shape building blocks: distributed forms of inherently-ordered
operations (global cumulative sums) that a naive formulation would funnel
through a single task.

The pattern here is the zipWithIndex decomposition (SURVEY.md §4.3):
  1. repartitionByRange on the global sort key → partition p holds a
     contiguous key range and partitions are ordered by p (pin() — below —
     pins the partitioning so both passes see identical boundaries);
  2. per-partition running sum via a window PARTITIONED by
     spark_partition_id() — parallel, no global exchange;
  3. one bounded driver job collects the per-partition totals (#partitions
     rows, never corpus rows) and prefix-sums them;
  4. broadcast-join the per-partition starting offsets back.
At 100 TB set RELIABLE_PIN_CONF=true + sc.setCheckpointDir(...) and step 1
pins to a reliable checkpoint dir instead; steps 2-4 are unchanged. test_plans.py gates that no Exchange SinglePartition
appears in consumers' plans.
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Runtime conf gating reliable (HDFS/S3-backed) checkpointing for the
#: lineage pins below. localCheckpoint is executor-local: fast, but a lost
#: executor kills the job — fine single-node, a real failure mode on a 1000-
#: executor cluster. Set this conf to "true" AND sc.setCheckpointDir(<dir>)
#: to switch every pin() to a reliable checkpoint (VERDICT r4-r6 standing
#: migration note, now a one-conf switch instead of a code change).
RELIABLE_PIN_CONF = "spark.ksql_spark.reliablePin"

#: Testing seam (tests/test_plans.py): when True, pin() is the identity.
#: A localCheckpoint rewrites everything upstream to a LogicalRDD, so plan
#: inspectors (the unpartitioned-window gate, the allowlist bound prover)
#: are BLIND to operators above a pin (ADVICE r10). Disabling pins exposes
#: the full logical plan for structural inspection. Never set in production
#: paths — pins are load-bearing for iterative lineage truncation.
_PINS_DISABLED = False


@_contextmanager
def pins_disabled():
    """Context manager: make every pin() a no-op so structural plan sweeps
    can inspect the PRE-pin plan (windows, joins, exchanges upstream of a
    lineage pin). Not thread-safe; test-only."""
    global _PINS_DISABLED
    _PINS_DISABLED = True
    try:
        yield
    finally:
        _PINS_DISABLED = False


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize df and truncate lineage: reliable `checkpoint()` when
    RELIABLE_PIN_CONF is true and a checkpoint dir is set, else
    `localCheckpoint()`. All `ranged_*` primitives and the graph iteration
    loops pin through this one seam."""
    if _PINS_DISABLED:
        return df
    spark = df.sparkSession
    if spark.conf.get(RELIABLE_PIN_CONF, "false").lower() == "true":
        sc = spark.sparkContext
        if sc._jsc.sc().getCheckpointDir().isDefined():
            return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def is_pinned(df: DataFrame) -> bool:
    """True when df is already a materialized checkpoint (its logical plan is
    the LogicalRDD that checkpoint()/localCheckpoint() returns). Iterative
    consumers use this to avoid double-pinning an input the caller already
    materialized (ADVICE r8: coship_adj(checkpoint=True) call sites paid a
    second localCheckpoint inside connected_components/bfs)."""
    try:
        name = df._jdf.queryExecution().logical().getClass().getSimpleName()
    except Exception:  # pragma: no cover — py4j introspection only
        return False
    return name == "LogicalRDD"


def pin_invariant(df: DataFrame) -> DataFrame:
    """Pin a loop-invariant input LAZILY (first consuming job materializes
    it) and only if it is not already pinned: merely constructing the
    consumer's DataFrame (plan-only tests, .explain) must not trigger a
    Spark job (ADVICE r8)."""
    return df if is_pinned(df) else pin(df, eager=False)


def fan_parts(spark) -> int:
    """Partition count for EXPLOSION-prone joins: self-joins (wedge
    enumeration, incidence pairing) whose output is orders of magnitude
    larger than their input. AQE sizes post-shuffle partitions from the
    map-side BYTES, so a kilobyte-scale edge/incidence table coalesces to
    ONE partition and the multi-hundred-million-row join output is generated
    (and partially aggregated) by a single task — measured r14: the sf0.1
    wedge stage of graph_two_hop_reach ran 1-way for ~25 s of its 37.7 s.
    An explicit repartition(fan_parts(spark), key) on both join inputs pins
    the stage width to the session's parallelism — scale-adaptive (cores
    locally, executor slots on a cluster), never a tuned constant — and
    replaces the ENSURE_REQUIREMENTS exchange the join would insert anyway,
    so no extra shuffle is paid."""
    return max(int(spark.sparkContext.defaultParallelism), 1)


def ranged_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cumsum",
    n_parts: int | None = None,
) -> DataFrame:
    """Add `out_col` = INCLUSIVE global running sum of `value_col` over the
    total order given by `order_cols` (names or Column sort exprs; the order
    must be total — include a unique tiebreak key, or rows that compare equal
    get an arbitrary but stable relative order within their range partition).

    Returns df's columns + out_col. Internal columns are dropped.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(4, spark.sparkContext.defaultParallelism // 4)
    parts = pin(
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Stitch BOTH the prior sum and the prior non-null COUNT: SQL's running
    # SUM is NULL only while the whole prefix is NULL, so a partition whose
    # local prefix is all-NULL must produce the prior-partition offset (not
    # NULL+offset=NULL), and the globally-first rows before any value must
    # stay NULL (not 0). Caught by the NULL-heavy property test.
    per_part = parts.groupBy("_pid").agg(
        F.coalesce(F.sum(value_col), F.lit(0)).alias("t"),
        F.count(value_col).alias("c"),
    )
    totals = {r["_pid"]: (r["t"], r["c"]) for r in per_part.collect()}
    # The offsets column carries SUM's own output type (decimal in → widened
    # decimal out, float in → double, integral in → long) so a DecimalType
    # value column round-trips as Python Decimal instead of being truncated
    # into a LONG that createDataFrame's verifier rejects.
    sum_type = per_part.schema["t"].dataType.simpleString()
    # running must be a Python value of the offsets column's type:
    # createDataFrame's verifier rejects int 0 for a DOUBLE/DECIMAL field.
    if sum_type in ("float", "double"):
        zero = 0.0
    elif sum_type.startswith("decimal"):
        import decimal

        zero = decimal.Decimal(0)
    else:
        zero = 0
    running, pcnt, offset_rows = zero, 0, []
    for pid in sorted(totals):  # range partitions are globally ordered by pid
        offset_rows.append((pid, running, pcnt))
        t, c = totals[pid]
        running += t
        pcnt += c
    offsets = spark.createDataFrame(
        offset_rows, f"_pid int, _start {sum_type}, _pcnt long"
    )
    local_sum = F.sum(value_col).over(w_local)
    local_cnt = F.count(value_col).over(w_local)
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.when(
                local_cnt + F.col("_pcnt") > 0,
                F.coalesce(local_sum, F.lit(0)) + F.col("_start"),
            ),
        )
        .drop("_pid", "_start", "_pcnt")
    )


def ranged_cummax_excl(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cummax_excl",
    n_parts: int | None = None,
) -> DataFrame:
    """Add `out_col` = EXCLUSIVE global running max of `value_col` over the
    total order given by `order_cols`: the max over all STRICTLY PRECEDING
    rows (NULL for the globally first row). Same zipWithIndex decomposition
    as ranged_cumsum — max is associative, so the per-partition offset is
    the prefix max of partition totals instead of the prefix sum; the
    exclusive frame is local (rowsBetween(unboundedPreceding, -1)) and the
    offset is itself exclusive at the partition level.

    The skyline/dominance family builds on this: "is any earlier point
    higher?" without an Exchange SinglePartition window.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(4, spark.sparkContext.defaultParallelism // 4)
    parts = pin(
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_excl = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = {
        r["_pid"]: r["t"]
        for r in parts.groupBy("_pid")
        .agg(F.max(value_col).alias("t"))
        .collect()
    }
    best, offset_rows = None, []
    for pid in sorted(totals):  # range partitions are globally ordered by pid
        offset_rows.append((pid, best))
        t = totals[pid]
        if t is not None and (best is None or t > best):
            best = t
    # offsets carry the value column's own type (a hardcoded LONG would make
    # createDataFrame reject float maxima and truncate decimal ones).
    vtype = df.schema[value_col].dataType.simpleString()
    offsets = spark.createDataFrame(offset_rows, f"_pid int, _prior {vtype}")
    local = F.max(value_col).over(w_excl)
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.when(
                F.col("_prior").isNull(), local
            ).when(local.isNull(), F.col("_prior")).otherwise(
                F.greatest(local, F.col("_prior"))
            ),
        )
        .drop("_pid", "_prior")
    )


def ranged_lag(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "lag",
    n_parts: int | None = None,
) -> DataFrame:
    """Add `out_col` = LAG(value_col) over the GLOBAL total order given by
    `order_cols` (column NAMES; must be a total order) — without an
    Exchange SinglePartition window. Same decomposition as ranged_cumsum:
    range-partition on the order, lag locally, and stitch partition
    boundaries by handing each partition the LAST value of its nearest
    non-empty predecessor (one #partitions-row driver pass, the documented
    scalable pattern). The globally first row gets NULL.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(4, spark.sparkContext.defaultParallelism // 4)
    parts = pin(
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    # True last-BY-ORDER value per partition, NULLs included: max_by over a
    # struct-wrapped value (a struct is never NULL, so a NULL value at the
    # max order position is carried, not skipped — LAG() semantics require
    # propagating it to the next partition's first row).
    lasts = {
        r["_pid"]: r["t"]["v"]
        for r in parts.groupBy("_pid")
        .agg(
            F.max_by(
                F.struct(F.col(value_col).alias("v")),
                F.struct(*[F.col(c) for c in order_cols]),
            ).alias("t")
        )
        .collect()
    }
    prev, offset_rows = None, []
    for pid in sorted(lasts):  # range partitions are globally ordered
        offset_rows.append((pid, prev))
        prev = lasts[pid]  # unconditional: a NULL last value IS the next lag
    field = df.schema[value_col].dataType.simpleString()
    offsets = spark.createDataFrame(
        offset_rows, f"_pid int, _prev {field}"
    )
    # Boundary substitution is gated on ROW POSITION (partition-first row),
    # never on value nullness: a non-first row whose predecessor holds NULL
    # must get NULL, exactly like global LAG().
    first_row = F.row_number().over(w_local) == 1
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.when(first_row, F.col("_prev")).otherwise(
                F.lag(value_col).over(w_local)
            ),
        )
        .drop("_pid", "_prev")
    )
