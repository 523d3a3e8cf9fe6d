"""Isolated A/B: partition-scoped sink fold vs the old whole-sink rewrite.

Round-11 ask: ``compact_sink`` used to read and rewrite the ENTIRE sink to
fold ``_batch_id <= cutoff`` partitions — O(sink) maintenance for
O(archived) work.  The fold is now partition-scoped (partition-pruned read
of only the old directories, staging + manifest landing, live partitions
byte-untouched), so its cost must track the ARCHIVED rows and stay flat as
the live sink grows.

This script builds two sinks with the SAME small archived slice (old
micro-batch partitions) and live bulks 1× and 4× apart, then times:

- ``old``: the pre-round-11 shape — full-sink read, conditional
  ``_batch_id`` remap, ``repartition("_batch_id")``, whole-directory swap
  (inlined here; the code was replaced at HEAD);
- ``new``: ``RetryRouter.compact_sink`` at HEAD.

Expected reading: ``old`` scales with the live bulk (≈4× wall between the
two sinks), ``new`` is flat (and small) across both.

Run from the repo root:  python tools/bench_compact_sink.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import SparkSession, functions as F

from pulsar_pekko_streams_example_spark.streaming.retry import RetryRouter

OLD_PARTS = 8          # archived micro-batch partitions (the fold's work)
OLD_ROWS_PER = 5_000   # rows per archived partition: 40k archived total
LIVE_PARTS = 16        # live partitions (must never be read or rewritten)


def build_sink(spark, base: str, live_rows_per: int) -> RetryRouter:
    router = RetryRouter(
        sink_path=os.path.join(base, "sink"),
        retry_path=os.path.join(base, "retry"),
        dlq_path=os.path.join(base, "dlq"),
    )
    for b in range(1, OLD_PARTS + 1):
        df = spark.range(OLD_ROWS_PER).select(
            F.concat(F.lit(f"m-{b}-"), F.col("id")).alias("message_id"),
            F.lit(1).cast("long").alias("attempt"),
            F.lit(True).alias("ok"),
            F.sha2(F.concat(F.lit(b), F.col("id")), 256).alias("payload"),
        )
        router.route_batch(df, batch_id=b)
    for b in range(OLD_PARTS + 1, OLD_PARTS + 1 + LIVE_PARTS):
        df = spark.range(live_rows_per).select(
            F.concat(F.lit(f"m-{b}-"), F.col("id")).alias("message_id"),
            F.lit(1).cast("long").alias("attempt"),
            F.lit(True).alias("ok"),
            F.sha2(F.concat(F.lit(b), F.col("id")), 256).alias("payload"),
        )
        router.route_batch(df, batch_id=b)
    return router


def old_whole_sink_fold(spark, sink_path: str, up_to: int, archive: int = -1):
    """The pre-round-11 implementation, inlined: full read + full rewrite."""
    sink = spark.read.parquet(sink_path)
    bid = F.col("_batch_id")
    old = bid <= F.lit(up_to)
    n = sink.filter(old & (bid != archive)).count()
    folded = sink.withColumn(
        "_batch_id", F.when(old, F.lit(archive)).otherwise(bid)
    ).repartition("_batch_id")
    tmp = sink_path + ".ab-old.new"
    shutil.rmtree(tmp, ignore_errors=True)
    folded.write.mode("overwrite").partitionBy("_batch_id").parquet(tmp)
    dead = sink_path + ".ab-old.old"
    os.rename(sink_path, dead)
    os.rename(tmp, sink_path)
    shutil.rmtree(dead)
    return n


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(label, variant, live_rows_per):
        base = tempfile.mkdtemp(prefix=f"abfold-{label}-{variant}-")
        try:
            router = build_sink(spark, base, live_rows_per)
            t0 = time.monotonic()
            if variant == "old":
                n = old_whole_sink_fold(spark, router.sink_path, OLD_PARTS)
            else:
                n = router.compact_sink(
                    spark, up_to_batch_id=OLD_PARTS, force=True
                )["archived"]
            wall = time.monotonic() - t0
            assert n == OLD_PARTS * OLD_ROWS_PER, n
            return wall
        finally:
            shutil.rmtree(base, ignore_errors=True)

    # one throwaway fold per variant first: parquet/codegen/JVM warmup must
    # not be billed to whichever cell happens to run first
    for variant in ("old", "new"):
        run_once("warmup", variant, 10_000)

    results = {}
    for label, live_rows_per in (("live_1x", 50_000), ("live_4x", 200_000)):
        results[label] = {}
        for variant in ("old", "new"):
            walls = [run_once(label, variant, live_rows_per) for _ in range(2)]
            results[label][variant] = [round(w, 3) for w in walls]

    results["archived_rows"] = OLD_PARTS * OLD_ROWS_PER
    results["live_rows"] = {
        "live_1x": LIVE_PARTS * 50_000,
        "live_4x": LIVE_PARTS * 200_000,
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
