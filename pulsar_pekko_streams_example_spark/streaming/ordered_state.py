"""K2 — per-key ordered serial processing (the Key_Shared contract).

Reference: ZIO ``groupByKey(msg.getKey, buffer=1){ mapZIOPar(1) }`` — at most
one in-flight message per key, per-key arrival order preserved
(``part5/OrderedStreamGenerator.scala:137-161``; Key_Shared subscription
``:190-196``).

Spark-first: ``applyInPandasWithState`` over ``groupBy(key)``.  Within a
micro-batch Spark hands each key's rows to exactly one state function call —
that *is* per-key serialization; we sort the group by ``seq`` and carry
``last_seq``/``processed`` in GroupState so order and continuity hold across
micro-batches (checkpointed state = the consumer's per-key cursor).

Redelivered messages (attempt > 1) re-enter their key's queue: rows with
seq ≤ last_seq are processed again (at-least-once) but flagged, so downstream
can distinguish first-pass order from redelivery — the exact semantics the
reference gets from broker redelivery on a Key_Shared subscription.

Hostile-input contract (round-8 streaming sweep):

- NULL ``seq`` (a message that claims no position): processed serially like
  any other row — it consumes a ``processing_index`` — but emitted with
  ``seq`` NULL, ``is_redelivery`` False, ``in_order`` False, and it never
  advances the key's cursor.  (Arrow hands a null-bearing long column to
  pandas as float64 + NaN; without the explicit guard ``int(NaN)`` raises
  and KILLS the whole streaming query — one poisoned message must not take
  down the consumer.)  Positionless rows sort after positioned ones within
  a batch (pandas ``na_position='last'``).
- NULL ``key``: forms its own serial group (Spark groups NULL keys
  together), so ordering among the keyless messages is still serial —
  mirroring a broker routing empty-keyed messages to one consumer.
- NULL ``attempt`` sorts last among same-seq duplicates and is otherwise
  inert (only ``seq`` drives the cursor).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("message_id", StringType()),
        StructField("seq", LongType()),
        StructField("processing_index", LongType()),  # per-key total order of processing
        StructField("is_redelivery", BooleanType()),
        StructField("in_order", BooleanType()),
    ]
)

STATE_SCHEMA = "last_seq LONG, processed LONG"


def _process_key(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_seq, processed = state.get
    else:
        last_seq, processed = -1, 0

    rows = pd.concat(list(pdfs), ignore_index=True)
    # serial, ordered pass over this key's backlog — mapZIOPar(1) analog
    rows = rows.sort_values(["seq", "attempt"], kind="mergesort").reset_index(drop=True)

    out = {
        "key": [],
        "message_id": [],
        "seq": [],
        "processing_index": [],
        "is_redelivery": [],
        "in_order": [],
    }
    for r in rows.itertuples(index=False):
        positionless = pd.isna(r.seq)
        redelivery = (not positionless) and r.seq <= last_seq
        out["key"].append(key[0])
        out["message_id"].append(r.message_id)
        out["seq"].append(None if positionless else int(r.seq))
        out["processing_index"].append(processed)
        out["is_redelivery"].append(bool(redelivery))
        out["in_order"].append(
            (not positionless)
            and bool(redelivery or r.seq == last_seq + 1 or last_seq == -1)
        )
        if not positionless and not redelivery:
            last_seq = int(r.seq)
        processed += 1

    state.update((last_seq, processed))
    yield pd.DataFrame(out)


def ordered_per_key(
    stream_df: DataFrame,
    idle_timeout_ms: int | None = None,
    ts_col: str = "publish_time",
) -> DataFrame:
    """Apply the per-key ordered stateful processor.

    ``stream_df`` must carry (key, message_id, seq, attempt).  Each key's
    state is its consumer cursor; the shuffle on key is the Key_Shared
    routing — at 1000 executors every key still lands on exactly one task
    per micro-batch.

    State sizing at 100 TB (``idle_timeout_ms``): each cursor is 16 bytes
    but the DEFAULT NoTimeout keeps one forever per key ever seen — on an
    unbounded key space (session ids, request ids) the state store grows
    without bound and eventually dominates checkpoint/recovery time.  Pass
    ``idle_timeout_ms`` to expire a key's cursor once the WATERMARK passes
    its last event time plus the TTL (the broker analog: an idle Key_Shared
    consumer's ownership lapses).  Event-time expiry is deliberate:

    - it is DETERMINISTIC under replay — a 100 TB backfill reprocessed from
      a checkpoint expires exactly the same cursors at exactly the same
      points, where a processing-time TTL would expire different keys on
      every run;
    - Spark runs extra no-data micro-batches unconditionally under
      ProcessingTimeTimeout (FlatMapGroupsWithStateExec.shouldRunAnotherBatch
      is constant-true there), so Trigger.AvailableNow backfills would
      NEVER terminate — event-time timeouts only re-batch while the
      watermark still advances.

    Requires a watermarked input — compose with the library front door,
    ``ordered_per_key(watermarked(stream, delay), idle_timeout_ms=...)``;
    the engine rejects the query otherwise.  Trade-off, documented and
    pinned by test: a message arriving AFTER its key's cursor expired
    starts a fresh cursor — a late redelivery is then read as a first
    delivery (in_order, not flagged), exactly as a rejoining consumer
    cannot recognize pre-lapse redeliveries.  Keep the default for bounded
    key spaces where exact redelivery flagging matters more than state
    size.
    """
    if idle_timeout_ms is None:
        fn, conf = _process_key, GroupStateTimeout.NoTimeout
    else:
        if ts_col not in stream_df.columns:
            # fail at PLAN time: a missing event-time column inside the
            # state function would kill the whole streaming query at runtime
            raise ValueError(
                f"idle_timeout_ms requires event-time column {ts_col!r} "
                f"(watermarked upstream); stream has {stream_df.columns}"
            )

        def fn(key, pdfs, state):
            if state.hasTimedOut:
                state.remove()  # idle cursor lapses; emit nothing
                return
            batches = list(pdfs)
            yield from _process_key(key, iter(batches), state)
            # expire when the watermark passes this key's newest event time
            # + TTL; the engine requires the timestamp to sit strictly past
            # the current watermark (fallback when event times are NULL)
            ts = pd.concat([b[ts_col] for b in batches]).max()
            wm = state.getCurrentWatermarkMs()
            newest = wm if pd.isna(ts) else int(pd.Timestamp(ts).value // 1_000_000)
            state.setTimeoutTimestamp(max(newest + idle_timeout_ms, wm + 1))

        conf = GroupStateTimeout.EventTimeTimeout
    return (
        stream_df.groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas variant — same contract, modern API
# ---------------------------------------------------------------------------
try:  # Spark 4.x only: the StatefulProcessor API.  The class and its
    # semantics are defined (and unit-tested against _process_key) whenever
    # the API imports; the LIVE streaming path additionally needs
    # google.protobuf — pyspark's state-server client imports
    # pyspark.sql.streaming.proto.StateMessage_pb2 on every state call
    # (stateful_processor_api_client.py), and the generated module needs the
    # real protobuf runtime, not stubs.  That runtime is absent in this
    # container and installs are disallowed, so HAVE_TWS (below) gates the
    # end-to-end query separately from the API availability.
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class OrderedKeyProcessor(StatefulProcessor):
        """K2 on the transformWithState API: ValueState carries the per-key
        cursor (last_seq, processed); semantics identical to _process_key.
        Requires the RocksDB state store provider (bundled)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cursor = handle.getValueState("cursor", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            import pandas as pd

            if self._cursor.exists():
                last_seq, processed = self._cursor.get()
            else:
                last_seq, processed = -1, 0
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                ["seq", "attempt"], kind="mergesort"
            )
            out = []
            for r in pdf.itertuples(index=False):
                positionless = pd.isna(r.seq)
                redelivery = (not positionless) and r.seq <= last_seq
                out.append(
                    (
                        key[0],
                        r.message_id,
                        None if positionless else int(r.seq),
                        processed,
                        bool(redelivery),
                        (not positionless)
                        and bool(
                            redelivery or r.seq == last_seq + 1 or last_seq == -1
                        ),
                    )
                )
                if not positionless and not redelivery:
                    last_seq = int(r.seq)
                processed += 1
            self._cursor.update((last_seq, processed))
            yield pd.DataFrame(
                out,
                columns=[
                    "key", "message_id", "seq", "processing_index",
                    "is_redelivery", "in_order",
                ],
            )

        def close(self) -> None:
            pass

    def ordered_per_key_tws(stream_df: DataFrame) -> DataFrame:
        """ordered_per_key on the Spark 4 transformWithState API (RocksDB
        state store).  Same output contract as ordered_per_key.  No idle-TTL
        variant yet: the TWS analog is a registered timer + ttlConfig on the
        ValueState, unimplementable here until the state-server protobuf
        runtime exists in the environment (HAVE_TWS gate below)."""
        return (
            stream_df.groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=OrderedKeyProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="none",
            )
        )

    HAVE_TWS_API = True
except ImportError:  # pragma: no cover - older Spark
    # Only a genuinely missing API (Spark < 4) may downgrade the flag: a
    # collateral ImportError (e.g. a protobuf-related failure inside some
    # pyspark build) must surface, not silently skip the processor-logic
    # unit tests this flag gates (round-4 advice).
    import pyspark.sql.streaming as _ss

    if hasattr(_ss, "StatefulProcessor"):
        raise
    HAVE_TWS_API = False

try:  # live transformWithState additionally needs the protobuf runtime
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAVE_TWS = HAVE_TWS_API
except ImportError:
    HAVE_TWS = False
