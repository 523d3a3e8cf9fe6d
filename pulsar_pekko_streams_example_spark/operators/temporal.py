"""Temporal operators Spark lacks as built-ins: as-of join, range join,
gap-based sessionization.

The reference's per-key ordered semantics (part5/OrderedStreamGenerator.scala:137-161
— all messages of one key processed in arrival order) make "what was the last
thing this key did before t?" the natural query shape; these operators answer
it declaratively.

Scale designs:

- **as-of join** — NOT a per-row subquery and NOT an inequality join (which
  Spark plans as broadcast-nested-loop).  Union both sides, single shuffle on
  the key, one ordered window pass carrying the right side's last value
  forward (``last(..., ignorenulls=True)``).  Cost = one shuffle + one sort,
  identical to a regular sort-merge join; works at any skew AQE can split.
- **range join** — bucket both sides to fixed time buckets, equi-join on
  (key, bucket) with the left side exploded to the buckets its interval
  covers, then re-filter exactly.  Turns an inequality join into an
  equi-join whose fan-out is bounded by interval/bucket ratio (here 2).
- **sessionization** — lag() gap flags + running sum over (key, ts): two
  window passes over one partitioning, no join at all.  The streaming twin is
  ``session_window()`` in Structured Streaming; this is the batch/backfill
  form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_S = 1800
RANGE_WINDOW_S = 600


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For every ``left`` row: the most recent ``right`` row of the same key
    with ``right.ts <= left.ts`` (inclusive).  Returns all ``left`` columns
    plus ``asof_<col>`` and ``asof_ts``.

    Implementation: tag + union + one window with ignore-nulls ``last`` —
    the scalable as-of pattern (one shuffle on the key, no join explosion).
    At equal timestamps the right side sorts first, so it is visible to the
    left row (ASOF JOIN's ``>=`` semantics).
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        key, ts, *[F.col(c).alias(f"asof_{c}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "asof_ts",
        F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True).over(w),
    )
    for c in value_cols:
        carried = carried.withColumn(
            f"asof_{c}",
            F.last(
                F.when(F.col("_side") == 0, F.col(f"asof_{c}")), ignorenulls=True
            ).over(w),
        )
    return carried.filter(F.col("_side") == 1).select(
        *lcols, "asof_ts", *[f"asof_{c}" for c in value_cols]
    )


def range_count_following(
    left: DataFrame,
    events: DataFrame,
    key: str,
    ts: str,
    window_s: int = RANGE_WINDOW_S,
) -> DataFrame:
    """For each ``left`` row: count of ``events`` rows of the same key with
    ``left.ts < events.ts <= left.ts + window_s``.  Output: left's ``event_id``,
    key, ``following_events`` (0 when none).

    Bucketed equi-join: an interval of length ``window_s`` starting anywhere
    overlaps exactly 2 buckets of size ``window_s``, so the left explodes
    ×2 and joins on (key, bucket) — never an inequality-only join (which
    Spark would plan as a nested loop).
    """
    def bucket(c: str):
        return F.expr(f"unix_micros({c}) div {1_000_000 * window_s}")

    # the KEY must be part of the equi-join, not a post-join filter: joining
    # on the time bucket alone fans every left row out against ALL keys'
    # events in that bucket — at corpus scale a bucket holds millions of
    # keys' events and the join output is bucket-width², while (key, bucket)
    # bounds fan-out at interval/bucket ≈ 2 rows per event as designed.
    # (NULL keys drop under SQL equality either way — semantics unchanged.)
    l = left.select(
        F.col("event_id").alias("_lid"),
        F.col(key).alias("_k"),
        F.col(ts).alias("_lts"),
        F.explode(F.array(bucket(ts), bucket(ts) + F.lit(1))).alias("_bucket"),
    )
    e = events.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ets"),
        bucket(ts).alias("_bucket"),
    )
    diff_us = F.unix_micros(F.col("_ets")) - F.unix_micros(F.col("_lts"))
    matched = (
        l.join(e, ["_k", "_bucket"], "inner")
        .filter((diff_us > 0) & (diff_us <= window_s * 1_000_000))
        .groupBy("_lid")
        .agg(F.count(F.lit(1)).alias("following_events"))
    )
    return (
        left.select(F.col("event_id"), F.col(key))
        .join(matched.withColumnRenamed("_lid", "event_id"), ["event_id"], "left")
        .withColumn("following_events", F.coalesce("following_events", F.lit(0)))
    )


def sessionize(
    events: DataFrame, key: str, ts: str, gap_s: int = SESSION_GAP_S
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_s``.  Returns the input plus
    a dense ``session_id`` (per key, 1-based)."""
    order = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col("event_id").asc())
    gap = (
        F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(order))
    ) / F.lit(1_000_000.0)
    flagged = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_s), F.lit(1)).otherwise(F.lit(0)),
    )
    running = Window.partitionBy(key).orderBy(
        F.col(ts).asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_id", F.sum("_new_session").over(running).cast("long")
    ).drop("_new_session")
