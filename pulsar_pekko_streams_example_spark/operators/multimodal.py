"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed with a
deterministic fake (or a real decoder when available via import-try); the
Spark-side plumbing — schema, Arrow batch shape, partitioning, UDF signature —
is real and tested.  At 100 TB the rules encoded here:

- binary payloads never shuffle: decode/feature-extract runs mapInPandas over
  the scan partitioning, emitting only small typed columns;
- per-batch vectorization: one Python call per Arrow batch, not per blob;
- metadata (dims, duration, codec) travels as ordinary columns so Catalyst
  can filter/prune on it *before* any Python runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

try:  # real decoder if the environment has one
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = "media_id long, kind string, content binary, meta string"

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, n_bytes long, "
    "histogram array<double>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_index int, frame_bytes binary"


def _fake_dims(buf: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image header parse."""
    w = 16 + (buf[0] if buf else 0) % 240
    h = 16 + (buf[1] if len(buf) > 1 else 0) % 240
    return w, h, 3


def decode_image_features(media: DataFrame, hist_bins: int = 8) -> DataFrame:
    """Decode + feature-extract: dims from the header (stubbed deterministic
    parse), normalized byte histogram as the feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                buf = bytes(r.content or b"")
                w, h, c = _fake_dims(buf)
                arr = np.frombuffer(buf, dtype=np.uint8)
                hist = (
                    np.bincount(arr // (256 // hist_bins), minlength=hist_bins).astype(float)
                    / max(1, len(arr))
                )
                rows.append((r.media_id, w, h, c, len(buf), hist.tolist()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels", "n_bytes", "histogram"],
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Video frame-sampling stub: slice the byte stream at fixed strides —
    the real implementation would seek keyframes; the Spark shape (one blob →
    few small rows, exploded inside the Arrow batch) is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                buf = bytes(r.content or b"")
                for i in range(min(max_frames, max(1, len(buf) // every_n_bytes))):
                    rows.append((r.media_id, i, buf[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame_bytes"])

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def audio_features_schema(passthrough: tuple[str, ...] = ()) -> str:
    cols = "".join(f", {c} string" for c in passthrough)
    return f"media_id long{cols}, n_samples long, duration_s double, silent long, clipped long"


def decode_audio_features(
    media: DataFrame, sample_rate: int = 8000, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Audio decode + feature extraction.

    No audio codec ships in this container, so the DECODE step is a
    deterministic stand-in — the byte stream is read as unsigned 8-bit PCM
    centred at 128 (a real build would call the codec exactly here; the
    plumbing is identical to decode_image_features).  Everything Spark-side
    is real: Arrow-batched ``mapInPandas`` over the scan partitioning, blobs
    never shuffle, only small typed feature columns leave Python, and any
    ``passthrough`` metadata columns ride along so downstream grouping needs
    no join back to the media table.

    Features: sample count, duration at ``sample_rate``, near-silence samples
    (|amplitude| < 16) and clipped samples (|amplitude| >= 96).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(r.content or b""), dtype=np.uint8).astype(np.int16) - 128
                n = len(buf)
                rows.append(
                    (r.media_id,)
                    + tuple(getattr(r, c) for c in passthrough)
                    + (
                        n,
                        n / float(sample_rate),
                        int((np.abs(buf) < 16).sum()),
                        int((np.abs(buf) >= 96).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", *passthrough, "n_samples", "duration_s", "silent", "clipped"],
            )

    return media.mapInPandas(run, audio_features_schema(passthrough))


RESIZED_SCHEMA = (
    "media_id long, width int, height int, out_w int, out_h int, resized binary"
)


def resize_images(media: DataFrame, box: int = 64) -> DataFrame:
    """Thumbnail-resize stub: aspect-preserving integer fit into a
    ``box``×``box`` bounding box.

    A real build would decode, interpolate, and re-encode exactly here; the
    stub keeps the dimension arithmetic (pure integers, so the oracle can
    replicate it) and emits a deterministic byte prefix of out_w*out_h*3 as
    the "resized" payload.  Spark shape is the production one: Arrow-batched
    mapInPandas over the scan partitioning, blobs stay in their partition,
    downstream aggregations read only the typed dim columns.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                buf = bytes(r.content or b"")
                w, h, c = _fake_dims(buf)
                if w <= box and h <= box:
                    ow, oh = w, h
                elif w >= h:
                    ow, oh = box, max(1, h * box // w)
                else:
                    ow, oh = max(1, w * box // h), box
                rows.append((r.media_id, w, h, ow, oh, buf[: ow * oh * c]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "out_w", "out_h", "resized"],
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


# --- Perceptual-hash image near-dup (VERDICT r15 task 3) ---------------------

DHASH_GRID = 8  # 8x8 gradient bits from an 8x9 sampled grayscale grid
DHASH_SCHEMA = "media_id long, b0 long, b1 long, b2 long, b3 long"


def _dhash_bands_of(buf: bytes) -> tuple[int, int, int, int]:
    """64-bit dHash of a blob as four 16-bit band values.

    The decode step is the deterministic stub (no codecs in this
    container): the '8x9 grayscale resize' samples the raw byte stream at
    72 evenly-spaced offsets (cell k reads byte k*n//72) — a real decoder
    would substitute actual luma here and NOTHING downstream changes.  The
    hash itself is the classic dHash gradient: bit (r, c) = 1 iff
    cell(r, c) < cell(r, c+1), row-major, packed little-endian into four
    16-bit bands so the banded Hamming join needs no 64-bit sign games."""
    n = len(buf)
    g = [buf[(k * n) // 72] if n else 0 for k in range(72)]
    bands = [0, 0, 0, 0]
    for r in range(DHASH_GRID):
        for c in range(DHASH_GRID):
            if g[r * 9 + c] < g[r * 9 + c + 1]:
                bit = r * DHASH_GRID + c
                bands[bit // 16] |= 1 << (bit % 16)
    return tuple(bands)


def dhash_bands(media: DataFrame) -> DataFrame:
    """(media_id, b0..b3): Arrow-batched dHash over binary blobs.  Blobs
    never leave their scan partition — only 4 small ints per image move."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [
                (r.media_id, *_dhash_bands_of(bytes(r.content or b"")))
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(rows, columns=["media_id", "b0", "b1", "b2", "b3"])

    return media.mapInPandas(run, DHASH_SCHEMA)


def image_near_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(media_a, media_b, hamming): perceptual near-duplicate image pairs —
    banded Hamming LSH over the 64-bit dHash, EXACT for max_hamming <= 3 by
    pigeonhole (3 flipped bits dirty at most 3 of the 4 16-bit bands, so
    every qualifying pair collides on at least one clean band).  Candidates
    come from a band-value equi-join (the SimHash machinery's shape); the
    all-pairs product never happens."""
    assert max_hamming < 4, "4-band exactness requires max_hamming <= 3"
    from pyspark.sql import functions as F

    sigs = dhash_bands(media)
    bands = sigs.select(
        "media_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.expr(
                "array("
                + ", ".join(f"struct({b}L AS band, b{b} AS val)" for b in range(4))
                + ")"
            )
        ).alias("bv"),
    ).select(
        "media_id", "b0", "b1", "b2", "b3",
        F.col("bv.band").alias("band"), F.col("bv.val").alias("val"),
    )
    u, v = bands.alias("u"), bands.alias("v")
    cand = (
        u.join(
            v,
            (F.col("u.band") == F.col("v.band"))
            & (F.col("u.val") == F.col("v.val"))
            & (F.col("u.media_id") < F.col("v.media_id")),
        )
        .select(
            F.col("u.media_id").alias("media_a"),
            F.col("v.media_id").alias("media_b"),
            *[F.col(f"u.b{b}").alias(f"ub{b}") for b in range(4)],
            *[F.col(f"v.b{b}").alias(f"vb{b}") for b in range(4)],
        )
        .distinct()
    )
    ham = " + ".join(f"bit_count(ub{b} ^ vb{b})" for b in range(4))
    return (
        cand.withColumn("hamming", F.expr(f"CAST({ham} AS LONG)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming")
    )
