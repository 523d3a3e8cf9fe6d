"""Extension — the full delivery-lifecycle runbook: retry loop to
convergence, ledger compaction, DLQ requeue.

The reference's delivery loop is broker-managed (nack → redelivery after
10 s, ``part2/PekkoStreamGenerator.scala:77-87`` +
``util/PulsarClientWrapper.scala:171``); its operational lifecycle —
reprocessing dead letters after a bug fix, bounding ledger growth — lives in
broker tooling.  With delivery-state-as-data both become DataFrame moves,
and this example walks the whole arc a production operator runs:

1. a backlog streams through a flaky processor; failures land in the retry
   table with a redelivery delay, successes in the sink;
   — and a maintenance crash mid-ledger-swap is healed mechanically
   (``recover_swaps()``: the directory layout alone says whether to
   complete or discard the interrupted rename pair);
2. a driver loop re-ingests due retries until the frontier drains —
   messages that keep failing exhaust their budget into the DLQ;
3. ``compact()`` shrinks the append-only ledger to its live frontier
   (scan cost tracks messages awaiting redelivery, not every failure ever);
4. the "bug" is fixed; ``requeue_dlq()`` revives the dead messages with a
   fresh attempt budget and one more cycle delivers them;
5. conservation holds end to end: every seeded message is in the sink
   exactly once, both ledgers are empty — read through ``status()``, which
   is also polled NON-BLOCKING while a maintenance window holds the ledger
   lease (the holder is surfaced instead of stalling the dashboard);
6. sink small-files maintenance with the replay-safety cutoff derived from
   the streaming checkpoint's ``commits/`` dir — refused while a replay
   could duplicate; the LIVE fold is partition-scoped (partitions above
   the cutoff byte-untouched, cost O(archived)); only decommission uses
   the explicit force override to fold everything, row-exact.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from examples._common import main, seed_messages
from pulsar_pekko_streams_example_spark.sources.streams import envelope_file_stream
from pulsar_pekko_streams_example_spark.streaming import RetryRouter, apply_processor

N_MESSAGES = 200
AS_OF = "2100-01-01 00:00:00"  # evaluate redelivery delays as already elapsed


def run(spark: SparkSession, base: str) -> dict:
    src = os.path.join(base, "backlog")
    seed_messages(spark, N_MESSAGES).coalesce(2).write.parquet(src)
    router = RetryRouter(
        sink_path=os.path.join(base, "sink"),
        retry_path=os.path.join(base, "retry"),
        dlq_path=os.path.join(base, "dlq"),
        redelivery_delay_s=10,
        max_attempts=3,
    )

    # the "bug": event_id % 20 == 0 fails EVERY attempt until fixed below;
    # event_id % 10 == 0 (and not % 20) fails only its first attempt
    broken = {"bug": True}

    def flaky(pdf):
        always = (pdf["event_id"] % 20 == 0) & broken["bug"]
        first_only = (pdf["event_id"] % 10 == 0) & (pdf["attempt"] == 1)
        return ~(always | first_only)

    # 1. stream the backlog through processor + router
    q = (
        router.attach(
            apply_processor(envelope_file_stream(spark, src), flaky),
            os.path.join(base, "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # 1b. a maintenance op dies mid-swap — the worst window: between the
    # swap's two renames the retry ledger directory is GONE, and a naive
    # frontier read says "no work" (silent no-delivery, not an error).
    # Manufacture exactly that layout (a completed ``.new`` next to the
    # ``.old``-renamed root — the state the crash-injection tests produce
    # through the real swap) and run the runbook step: recovery completes
    # the swap from the layout alone.  Every mutator also heals at lease
    # acquisition, so the drain loop below would have recovered on its own;
    # ``recover_swaps()`` is the explicit form that returns the report.
    frontier_before = {
        r.message_id for r in router.due_retries(spark, as_of=AS_OF).collect()
    }
    ledger = spark.read.parquet(router.retry_path)
    half_new = router.retry_path + ".compact.new"
    ledger.write.mode("overwrite").partitionBy("_batch_id").parquet(half_new)
    os.rename(router.retry_path, router.retry_path + ".compact.old")
    assert not os.path.exists(router.retry_path)  # the silent-loss window
    report = router.recover_swaps()
    assert report["completed"] == [router.retry_path]
    healed = {r.message_id for r in router.due_retries(spark, as_of=AS_OF).collect()}
    assert healed == frontier_before

    # 2. drive the redelivery loop until the frontier drains
    cycle = {"n": 1_000_000}

    def drain_frontier():
        while True:
            due = router.due_retries(spark, as_of=AS_OF)
            batch = due.drop("available_at", "_batch_id", "ok", "error")
            if not batch.limit(1).count():
                return
            cycle["n"] += 1
            router.route_batch(apply_processor(batch, flaky), cycle["n"])

    drain_frontier()

    n_dlq = spark.read.parquet(router.dlq_path).count()
    assert n_dlq == N_MESSAGES // 20  # the always-failing ids exhausted

    # 3. bound the ledger: only the live frontier survives (here: nothing —
    # every non-dead message already delivered); the audit trail is kept
    # mechanically rather than by a hand-run directory copy
    audit = os.path.join(base, "retry-audit")
    stats = router.compact(spark, archive_to=audit)
    assert stats["kept"] == 0 and stats["dropped"] > 0
    assert spark.read.parquet(audit).count() == stats["dropped"] + stats["kept"]

    # 4. fix the bug, revive the dead letters, drain the redelivery loop
    # again (revived messages restart at attempt 1, so they walk the full
    # fresh lifecycle — including the benign first-attempt failure)
    broken["bug"] = False
    revived = router.requeue_dlq(spark, batch_id=-1)
    assert revived == n_dlq
    drain_frontier()

    # 5. conservation: every message delivered exactly once, ledgers empty
    # — read through the runbook's one-call snapshot
    sink = spark.read.parquet(router.sink_path)
    delivered = sink.count()
    assert delivered == N_MESSAGES
    assert sink.select("message_id").distinct().count() == N_MESSAGES
    stat = router.status(spark, as_of=AS_OF, count_sink=True)
    assert stat["sink_rows"] == N_MESSAGES
    assert stat["frontier"] == 0 and stat["dlq"] == 0
    assert stat["swap_debris_found"] == []
    assert not os.path.exists(router.dlq_path)

    # 5b. the snapshot is NON-BLOCKING: polled while a maintenance op holds
    # the ledger lease (simulated by taking the flock the way a mutator
    # does), status() returns promptly with the holder surfaced instead of
    # stalling the dashboard behind the window
    import fcntl

    fd = os.open(router._lease_path(), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        os.ftruncate(fd, 0)
        os.write(fd, b"pid=0 op=compact_sink t=0  # simulated live window")
        busy = router.status(spark, as_of=AS_OF)
        assert "op=compact_sink" in busy["maintenance_in_progress"]
        assert busy["retry_rows"] is None  # honestly absent mid-window
        assert busy["debris_heal_errors"] is None  # no heal ran either
    finally:
        os.close(fd)

    # 6. sink small-files maintenance, with the replay-safety bound DERIVED
    # rather than trusted: while the stream is still resumable, the
    # checkpoint's commits/ dir caps the cutoff — archiving the newest
    # committed batch is refused, because a replay would write that
    # partition afresh next to the archived copy and duplicate rows.  Only
    # when the deployment is retired for good does force=True fold every
    # micro-batch partition into the single archive partition — row-exact.
    ckpt = os.path.join(base, "ckpt")
    newest = RetryRouter.committed_batch_ids(ckpt)[-1]
    try:
        router.compact_sink(spark, up_to_batch_id=newest, checkpoint=ckpt)
        raise AssertionError("cutoff at the newest committed batch must be refused")
    except ValueError:
        pass

    # 6a. LIVE maintenance is partition-scoped: fold the replay-safe prefix
    # while the deployment keeps running — partitions above the cutoff are
    # byte-untouched (same files, sizes, mtimes), so the op costs
    # O(archived), never a full-sink rewrite
    def live_fingerprint():
        out = {}
        for name in os.listdir(router.sink_path):
            if not name.startswith("_batch_id="):
                continue
            if int(name.split("=", 1)[1]) > newest - 1:
                d = os.path.join(router.sink_path, name)
                for f in sorted(os.listdir(d)):
                    st_ = os.stat(os.path.join(d, f))
                    out[(name, f)] = (st_.st_size, st_.st_mtime_ns)
        return out

    untouched_before = live_fingerprint()
    router.compact_sink(spark, up_to_batch_id=newest - 1, checkpoint=ckpt)
    assert live_fingerprint() == untouched_before
    assert spark.read.parquet(router.sink_path).count() == N_MESSAGES

    # 6b. only at decommission does force=True fold EVERYTHING (including
    # the drain-cycle partitions above the checkpoint bound) — row-exact
    sink_stats = router.compact_sink(spark, up_to_batch_id=cycle["n"], force=True)
    assert spark.read.parquet(router.sink_path).count() == N_MESSAGES
    assert sink_stats["partitions_after"] == 1

    return {
        "delivered": delivered,
        "dead_lettered_then_revived": revived,
        "ledger_rows_compacted": stats["dropped"],
        "sink_partitions_folded": sink_stats["partitions_before"],
    }


if __name__ == "__main__":
    main(run)
