"""Multimodal (image/audio/video) column plumbing.

Media travels as an opaque ``binary`` column plus a typed metadata struct —
the schema/partitioning/batching layer is real Spark; the codec step is a
deterministic STUB (this container has no image/audio libraries). Swap
``_decode_stub`` for a PIL/ffmpeg call and nothing else changes: the
mapInPandas batch shape, Arrow transfer, and output schema stay identical.

Scale design:
- decode/feature-extract runs per-partition via ``mapInPandas`` (Arrow
  batches, one Python worker per core — the only sane way to run codecs
  under Spark).
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory for
  large blobs; re-partition by size before heavy decode so stragglers don't
  serialize a stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "feat array<float>, decode_ok boolean"
)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake feature vector (8-dim) derived from the payload
    hash. REAL IMPLEMENTATION GOES HERE: PIL decode + resize + embed for
    images, ffmpeg frame-sample for video, etc. Raise NotImplementedError
    for kinds you don't support."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unsupported media kind: {kind}")
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_media_features(df: DataFrame) -> DataFrame:
    """Per-partition media feature extraction over Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            kinds = pdf["kind"]
            feats, oks, hashes, sizes = [], [], [], []
            for payload, kind in zip(payloads, kinds):
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                hashes.append(hashlib.sha256(raw).hexdigest())
                try:
                    feats.append(_decode_stub(raw, kind))
                    oks.append(True)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "n_bytes": sizes,
                    "sha256": hashes,
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_dedup_exact(df: DataFrame) -> DataFrame:
    """Exact media dedup by payload hash: one survivor per sha256 (min id).
    The hash runs JVM-side (F.sha2 on the binary column) — no Python."""
    with_h = df.withColumn("__h", F.sha2(F.coalesce(F.col("payload"), F.lit(b"")), 256))
    best = with_h.groupBy("__h").agg(F.min("media_id").alias("__keep"))
    return (
        with_h.join(best, "__h")
        .filter(F.col("media_id") == F.col("__keep"))
        .drop("__h", "__keep")
    )


RESIZE_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "resize_ok boolean"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_ms long, frame_hash string"
)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: a real implementation decodes with
    PIL/libvips, resizes, re-encodes. The stub derives a pseudo-thumbnail —
    ``width*height`` bytes streamed from the payload hash — so output size
    scales with the requested dims and tests can assert on it."""
    h = hashlib.sha256(payload or b"")
    out, block = b"", h.digest()
    need = max(0, width * height)
    while len(out) < need:
        block = hashlib.sha256(block).digest()
        out += block
    return out[:need]


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Thumbnail pass for image rows: mapInPandas over Arrow batches, binary
    in -> binary out. Non-image rows pass through untouched with
    ``resize_ok=false`` (filter upstream to skip them entirely — that
    predicate prunes at the scan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds = pdf["payload"], pdf["kind"]
            out_payload, out_ok = [], []
            for payload, kind in zip(payloads, kinds):
                raw = bytes(payload) if payload is not None else b""
                if kind == "image":
                    out_payload.append(_resize_stub(raw, width, height))
                    out_ok.append(True)
                else:
                    out_payload.append(raw)
                    out_ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "payload": out_payload,
                    "width": width,
                    "height": height,
                    "resize_ok": out_ok,
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows — the UDTF-shaped multimodal op: one
    input row fans out to N frame rows. A real implementation seeks with
    ffmpeg; the stub emits one deterministic frame hash per sample point
    (sha256 chain over the payload), duration taken from ``meta.duration_ms``
    (NULL duration -> single frame at t=0). Fan-out happens inside
    mapInPandas, so the expansion is partition-local — no shuffle until
    someone aggregates the frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, hashes = [], [], [], []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                raw = bytes(payload) if payload is not None else b""
                duration = None
                if meta is not None:
                    duration = meta.get("duration_ms") if isinstance(meta, dict) else meta["duration_ms"]
                n = 1 if not duration else min(max_frames, max(1, int(duration) // every_ms + 1))
                block = hashlib.sha256(raw).digest()
                for i in range(n):
                    block = hashlib.sha256(block).digest()
                    ids.append(media_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    hashes.append(block.hex())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
