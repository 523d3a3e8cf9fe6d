"""Extension example — materializing a well-mixed training order, proven by
the engine's own audit.

Not a reference scenario; this closes the ordering arc end to end THROUGH
STORAGE, the way a real pipeline ships it:

    a deliberately source-SORTED corpus (worst-case clumping)
    → order_mixing_audit flags it (clump_milli >> 1000 on every source)
    → training_order_generate emits the stride-interleave order
    → repartitionByRange(ord_key) + sortWithinPartitions writes a TOTAL
      order to parquet with NO single-node sort (the 100 TB write shape)
    → the re-read corpus, renumbered by its stored order, passes the audit

The invariant this proves is the one that matters operationally: the order
is not just well-mixed as a DataFrame — it SURVIVES the writer, the file
layout, and the re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from examples._common import main, subdir
from pulsar_pekko_streams_example_spark.plans.data_queries import (
    _order_mixing_audit,
    _training_order_generate,
)

N_BIG, N_MID, N_SMALL = 1200, 600, 200


def run(spark, workdir: str) -> dict:
    # worst-case corpus: every source a contiguous doc_id run
    rows = (
        [(i, f"doc {i}", "en", "web", 10) for i in range(N_BIG)]
        + [(N_BIG + i, f"doc {N_BIG + i}", "en", "books", 10) for i in range(N_MID)]
        + [
            (N_BIG + N_MID + i, f"doc {N_BIG + N_MID + i}", "en", "code", 10)
            for i in range(N_SMALL)
        ]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    before = {r.source: r.clump_milli for r in _order_mixing_audit(docs).collect()}
    assert all(v > 1400 for v in before.values()), before

    # generate + write: range partitioning gives a total order across files
    # without ever sorting on one node — files sort by range bucket, rows
    # sort within each file
    ordered = _training_order_generate(docs).join(
        docs.select("doc_id", "source", "text", "lang", "n_chars"),
        ["doc_id", "source"],
    )
    out = subdir(workdir, "mixed_corpus")
    (
        ordered.repartitionByRange(8, "ord_key", "source", "doc_id")
        .sortWithinPartitions("ord_key", "source", "doc_id")
        .write.mode("overwrite")
        .parquet(out)
    )

    # re-read IN STORED ORDER: files are range buckets, so (file, row
    # position) reproduces the global order; renumber and re-audit
    import glob

    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(parts) > 1, "the write must actually fan out over range buckets"
    stored = []
    for p in parts:
        stored.extend(
            spark.read.parquet(p)
            .sort("ord_key", "source", "doc_id")
            .select("source")
            .collect()
        )
    # file ranges must not interleave: global sorted order == concat order
    keys = []
    for p in parts:
        keys.append(
            [
                (r.ord_key, r.source, r.doc_id)
                for r in spark.read.parquet(p)
                .sort("ord_key", "source", "doc_id")
                .select("ord_key", "source", "doc_id")
                .collect()
            ]
        )
    flat = [k for ks in keys for k in ks]
    assert flat == sorted(flat), "range partitioning must yield a total order"

    redocs = spark.createDataFrame(
        [(i, "t", "en", r.source, 1) for i, r in enumerate(stored)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    after = {r.source: r.clump_milli for r in _order_mixing_audit(redocs).collect()}
    assert all(v <= 1100 for v in after.values()), after
    assert len(stored) == len(rows), "the writer must preserve every doc"

    return {
        "docs": len(rows),
        "files": len(parts),
        "clump_before": before,
        "clump_after": after,
    }


if __name__ == "__main__":
    main(run)
