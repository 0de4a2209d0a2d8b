"""Multimodal (image/audio/video) column plumbing.

Media travels as an opaque ``binary`` column plus a typed metadata struct —
the schema/partitioning/batching layer is real Spark. The codec layer has
TWO tiers:

- REAL pure-Python codecs for all three kinds: uncompressed 24-bit BMP
  (BI_RGB — header parse, bottom-up row order, 4-byte row padding,
  nearest-neighbor resample, re-encode), PCM-16 WAV (RIFF chunk walk,
  little-endian signed samples), and uncompressed-RGB AVI (RIFF lists
  around DIB frames — real frame decode, frame sampling, per-frame
  stats). Actual pixel/sample bytes flow through decode /
  feature-extract / resize / frame-sample, byte-exactly pinned in tests
  and verified by the driver gate against closed-form oracles
  (media_bmp_decode_stats / media_wav_decode_stats /
  media_avi_frame_stats);
- a deterministic STUB for every format that genuinely needs external
  libraries (JPEG/PNG/MP3/MP4 — this container has none). Swap
  ``_decode_stub`` for a PIL/ffmpeg call and nothing else changes: the
  mapInPandas batch shape, Arrow transfer, and output schema stay
  identical.

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


# ---------------------------------------------------------------------
# REAL codec: uncompressed 24-bit BMP (BI_RGB). Pure Python over the
# public format layout (BITMAPFILEHEADER 14 bytes + BITMAPINFOHEADER 40
# bytes + bottom-up BGR rows padded to 4-byte multiples) — no external
# libraries, deterministic, and exercised with actual pixel data.
# ---------------------------------------------------------------------

_BMP_HEADER_SIZE = 14 + 40


def _encode_dib_body(width: int, height: int, rows: list) -> bytes:
    """The shared DIB pixel array: TOP-down (b, g, r) rows written
    bottom-up with 4-byte stride padding — the layout inside both a BMP
    file and an uncompressed-RGB AVI '00db' frame chunk."""
    if width <= 0 or height <= 0 or len(rows) != height:
        raise ValueError("rows must be a height x width pixel grid")
    pad = (-(width * 3)) % 4
    return b"".join(
        bytes(c for px in row for c in px) + b"\x00" * pad
        for row in reversed(rows)
    )


def _decode_dib_body(body: bytes, width: int, height: int) -> list:
    """Inverse of :func:`_encode_dib_body`: bottom-up padded BGR bytes
    back to TOP-down rows of (b, g, r) triples."""
    stride = width * 3 + ((-(width * 3)) % 4)
    if len(body) < stride * height:
        raise ValueError("truncated DIB pixel array")
    rows = []
    for y in range(height):  # stored bottom-up; emit top-down
        base = (height - 1 - y) * stride
        rows.append(
            [
                (
                    body[base + 3 * x],
                    body[base + 3 * x + 1],
                    body[base + 3 * x + 2],
                )
                for x in range(width)
            ]
        )
    return rows


def encode_bmp24(width: int, height: int, rows: list) -> bytes:
    """Encode ``rows`` — ``height`` rows (TOP-down) of ``width``
    (b, g, r) byte triples — as an uncompressed 24-bit BMP. Rows are
    written bottom-up with 4-byte padding, per the format."""
    body = _encode_dib_body(width, height, rows)
    size = _BMP_HEADER_SIZE + len(body)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + _BMP_HEADER_SIZE.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")   # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")   # BI_RGB (uncompressed)
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16                # resolution + palette fields
    )
    return header + body


def decode_bmp24(payload: bytes) -> tuple[int, int, list]:
    """Decode an uncompressed 24-bit BMP into (width, height, rows of
    (b, g, r) triples in TOP-down order). Raises ValueError on anything
    that isn't a positive-height 24bpp BI_RGB bitmap."""
    if len(payload) < _BMP_HEADER_SIZE or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB supported")
    if width <= 0 or height <= 0:
        raise ValueError("only positive bottom-up dimensions supported")
    if offset < _BMP_HEADER_SIZE or offset > len(payload):
        # an offset pointing INTO the header passes the length check but
        # reads header bytes as pixels — wrong stats, no error (ADVICE r6)
        raise ValueError("pixel-array offset inside header or past payload")
    return width, height, _decode_dib_body(payload[offset:], width, height)


def resize_bmp24_nearest(
    payload: bytes, out_w: int, out_h: int
) -> bytes:
    """REAL nearest-neighbor resize for BMP payloads: decode, resample
    with src = (dst * src_dim) // dst_dim (floor — the mirrored-in-SQL
    index math), re-encode."""
    w, h, rows = decode_bmp24(payload)
    out = [
        [rows[(y * h) // out_h][(x * w) // out_w] for x in range(out_w)]
        for y in range(out_h)
    ]
    return encode_bmp24(out_w, out_h, out)


# ---------------------------------------------------------------------
# REAL codec #2: WAV / PCM-16 (RIFF). Pure Python over the public
# container layout — "RIFF"+size+"WAVE", then chunks; "fmt " carries
# (audio_format=1, channels, sample_rate, byte_rate, block_align,
# bits=16), "data" carries little-endian signed 16-bit samples.
# Unknown chunks are skipped per the spec (word-aligned).
# ---------------------------------------------------------------------


def encode_wav16(
    sample_rate: int, channels: int, samples: list[int]
) -> bytes:
    """Encode interleaved signed 16-bit samples as a PCM WAV file."""
    if channels <= 0 or sample_rate <= 0 or len(samples) % channels:
        raise ValueError("bad channel/sample layout")
    body = b"".join(
        int(s).to_bytes(2, "little", signed=True) for s in samples
    )
    block_align = channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(body).to_bytes(4, "little") + body
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_wav16(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM-16 WAV into (sample_rate, channels, interleaved
    samples). Walks the chunk list (skipping unknown chunks with word
    alignment); raises ValueError on non-RIFF/WAVE or non-PCM-16."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if pos + 8 + size > len(payload):
            # a declared size past the end would silently slice short
            # and yield plausible-but-wrong stats (ADVICE r6): truncated
            # clips must be rejected like other malformed payloads
            raise ValueError("truncated chunk: declared size past payload")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if int.from_bytes(body[0:2], "little") != 1:
                raise ValueError("only PCM supported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None or bits != 16 or not channels:
        raise ValueError("missing fmt/data or not 16-bit PCM")
    if len(data) % 2:
        raise ValueError("odd data chunk for 16-bit samples")
    samples = [
        int.from_bytes(data[i:i + 2], "little", signed=True)
        for i in range(0, len(data), 2)
    ]
    return rate, channels, samples


# ---------------------------------------------------------------------
# REAL codec #3: uncompressed-RGB AVI (RIFF 'AVI '). Both halves were
# already in this file — the RIFF chunk walk (WAV, above) and the DIB
# row codec (BMP, above) — an AVI is RIFF plumbing around DIB frames:
#   RIFF 'AVI '
#     LIST 'hdrl'  avih (main header: frame period, counts, dims)
#                  LIST 'strl'  strh ('vids'/'DIB ') + strf (BITMAPINFO)
#     LIST 'movi'  '00db' <DIB frame> per frame (bottom-up BGR, padded)
# Pure Python, deterministic, real pixel bytes end to end.
# ---------------------------------------------------------------------

_AVI_FPS_SCALE = 1_000_000  # avih stores the frame period in microseconds


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + len(body).to_bytes(4, "little") + body + (
        b"\x00" if len(body) % 2 else b""
    )


def encode_avi_rgb(
    width: int, height: int, frames: list, fps: int = 10
) -> bytes:
    """Encode ``frames`` — each a TOP-down grid of (b, g, r) triples —
    as an uncompressed 24-bit RGB AVI ('DIB ' stream, BI_RGB frames)."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    bodies = [_encode_dib_body(width, height, rows) for rows in frames]
    frame_size = len(bodies[0])
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in (
            _AVI_FPS_SCALE // fps,  # dwMicroSecPerFrame
            frame_size * fps,       # dwMaxBytesPerSec
            0,                      # dwPaddingGranularity
            0,                      # dwFlags
            len(frames),            # dwTotalFrames
            0,                      # dwInitialFrames
            1,                      # dwStreams
            frame_size,             # dwSuggestedBufferSize
            width,
            height,
            0, 0, 0, 0,             # dwReserved[4]
        )
    )
    strh = (
        b"vids"
        + b"DIB "
        + b"".join(
            v.to_bytes(4, "little")
            for v in (
                0,            # dwFlags
                0,            # wPriority + wLanguage
                0,            # dwInitialFrames
                1,            # dwScale
                fps,          # dwRate (rate/scale = fps)
                0,            # dwStart
                len(frames),  # dwLength
                frame_size,   # dwSuggestedBufferSize
                0xFFFFFFFF,   # dwQuality (-1 = default)
                0,            # dwSampleSize
            )
        )
        + (0).to_bytes(4, "little")           # rcFrame left/top
        + width.to_bytes(2, "little")         # rcFrame right
        + height.to_bytes(2, "little")        # rcFrame bottom
    )
    strf = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")           # planes
        + (24).to_bytes(2, "little")          # bpp
        + (0).to_bytes(4, "little")           # BI_RGB
        + frame_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    strl = _chunk(
        b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
    )
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    movi = _chunk(
        b"LIST", b"movi" + b"".join(_chunk(b"00db", b) for b in bodies)
    )
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def _walk_chunks(payload: bytes, pos: int, end: int):
    """Yield (cid, body) over a RIFF chunk run, enforcing declared
    sizes against the payload end (truncation is LOUD, per the WAV
    contract) and word alignment."""
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if pos + 8 + size > end:
            raise ValueError("truncated chunk: declared size past payload")
        yield cid, payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size % 2)


def decode_avi_rgb(payload: bytes) -> tuple[int, int, int, list]:
    """Decode an uncompressed-RGB AVI into (width, height, fps, frames)
    with each frame a TOP-down grid of (b, g, r) triples. Walks the
    RIFF lists (hdrl for dimensions/count/rate, movi for '00db'/'00dc'
    frame chunks); raises ValueError on non-AVI payloads, non-24bpp
    BI_RGB streams, truncated chunks, or a frame count that contradicts
    the header."""
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not an AVI payload")
    width = height = n_frames = fps = None
    strf_ok = False
    frames = []
    for cid, body in _walk_chunks(payload, 12, len(payload)):
        if cid != b"LIST" or len(body) < 4:
            continue
        ltype = body[:4]
        if ltype == b"hdrl":
            for sid, sbody in _walk_chunks(body, 4, len(body)):
                if sid == b"avih":
                    if len(sbody) < 40:
                        raise ValueError("short avih header")
                    usec = int.from_bytes(sbody[0:4], "little")
                    fps = _AVI_FPS_SCALE // usec if usec else 0
                    n_frames = int.from_bytes(sbody[16:20], "little")
                    width = int.from_bytes(sbody[32:36], "little")
                    height = int.from_bytes(sbody[36:40], "little")
                elif sid == b"LIST" and sbody[:4] == b"strl":
                    for tid, tbody in _walk_chunks(sbody, 4, len(sbody)):
                        if tid == b"strf":
                            bpp = int.from_bytes(tbody[14:16], "little")
                            comp = int.from_bytes(tbody[16:20], "little")
                            if bpp != 24 or comp != 0:
                                raise ValueError(
                                    "only uncompressed 24-bit RGB streams"
                                    " supported"
                                )
                            strf_ok = True
        elif ltype == b"movi":
            if width is None:
                raise ValueError("movi list before hdrl")
            if not strf_ok:
                # without a validated strf the frame format is a guess:
                # a 32bpp or compressed stream would pass the DIB length
                # check and decode to plausible-but-wrong pixels — the
                # silent-wrong-stats class this codec family rejects
                raise ValueError("missing strf stream format before movi")
            for sid, sbody in _walk_chunks(body, 4, len(body)):
                if sid in (b"00db", b"00dc"):
                    frames.append(_decode_dib_body(sbody, width, height))
    if width is None or not width or not height or n_frames is None:
        raise ValueError("missing or empty avih header")
    if len(frames) != n_frames:
        raise ValueError(
            f"frame count mismatch: header {n_frames}, movi {len(frames)}"
        )
    return width, height, fps, frames


AVI_FRAME_STATS_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_ms long, width int, "
    "height int, sum_b long, sum_g long, sum_r long"
)


def extract_avi_frame_stats(df: DataFrame) -> DataFrame:
    """REAL video decode, UDTF-shaped: each AVI payload fans out to one
    row PER DECODED FRAME with exact integer channel sums — the
    quantities a closed-form pixel oracle recomputes with no decoder,
    so the whole container walk + frame decode sits under the driver
    gate. Fan-out happens inside mapInPandas (partition-local, no
    shuffle until someone aggregates the frames); rows that fail to
    decode are dropped (quarantine upstream when they matter)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "frame_ts_ms", "width",
                "height", "sum_b", "sum_g", "sum_r",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, fps, frames = decode_avi_rgb(raw)
                except ValueError:
                    continue
                for i, rows in enumerate(frames):
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(
                        i * 1000 // fps if fps else 0
                    )
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sum_b"].append(
                        sum(px[0] for r in rows for px in r)
                    )
                    out["sum_g"].append(
                        sum(px[1] for r in rows for px in r)
                    )
                    out["sum_r"].append(
                        sum(px[2] for r in rows for px in r)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_ts_ms": pd.Series(
                        out["frame_ts_ms"], dtype="int64"
                    ),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "sum_b": pd.Series(out["sum_b"], dtype="int64"),
                    "sum_g": pd.Series(out["sum_g"], dtype="int64"),
                    "sum_r": pd.Series(out["sum_r"], dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=AVI_FRAME_STATS_SCHEMA)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Feature dispatch: image payloads that ARE bitmaps take the real
    BMP path — (width, height, mean b/g/r scaled to [0,1], fill) from
    decoded pixels. Everything else gets the deterministic fake 8-dim
    hash vector. REAL IMPLEMENTATIONS for other formats go here the
    same way (PIL decode + embed, ffmpeg frame-sample, ...); raise
    NotImplementedError for kinds you don't support."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unsupported media kind: {kind}")
    # a magic-number match that fails to decode falls through to the
    # opaque-payload stub (corrupt blobs must not kill the batch; route
    # them to quarantine upstream when they matter)
    if kind == "image" and payload[:2] == b"BM":
        try:
            w, h, rows = decode_bmp24(payload)
        except ValueError:
            pass
        else:
            n = w * h
            sb = sum(px[0] for row in rows for px in row)
            sg = sum(px[1] for row in rows for px in row)
            sr = sum(px[2] for row in rows for px in row)
            return [
                float(w),
                float(h),
                sb / (255.0 * n),
                sg / (255.0 * n),
                sr / (255.0 * n),
                float(n),
                0.0,
                1.0,  # real-decode marker
            ]
    if kind == "audio" and payload[:4] == b"RIFF":
        try:
            rate, channels, samples = decode_wav16(payload)
        except ValueError:
            pass
        else:
            n = max(1, len(samples))
            return [
                float(channels),
                float(rate),
                float(len(samples)),
                sum(abs(s) for s in samples) / (32768.0 * n),
                max((abs(s) for s in samples), default=0) / 32768.0,
                float(len(samples) // channels * 1000 // rate),  # ms
                0.0,
                1.0,  # real-decode marker
            ]
    if kind == "video" and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        try:
            w, h, fps, frames = decode_avi_rgb(payload)
        except ValueError:
            pass
        else:
            n = w * h * len(frames)
            sb = sum(px[0] for fr in frames for row in fr for px in row)
            return [
                float(w),
                float(h),
                float(len(frames)),
                float(fps),
                sb / (255.0 * n),  # mean blue across all frames
                float(len(frames) * 1000 // fps) if fps else 0.0,  # ms
                0.0,
                1.0,  # real-decode marker
            ]
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


BMP_STATS_SCHEMA = (
    "media_id long, width int, height int, n_px long, "
    "sum_b long, sum_g long, sum_r long"
)


def extract_bmp_stats(df: DataFrame) -> DataFrame:
    """REAL-codec feature extraction: decode every BMP payload and emit
    exact integer pixel statistics (dimensions, per-channel sums) —
    the quantities a closed-form pixel oracle can recompute without a
    decoder, making the codec itself driver-gate-verifiable. Arrow
    batches via mapInPandas; rows that fail to decode are dropped
    (route them to a quarantine sink upstream if they matter)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ns, sbs, sgs, srs = [], [], [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, rows = decode_bmp24(raw)
                except ValueError:
                    continue
                ids.append(media_id)
                ws.append(w)
                hs.append(h)
                ns.append(w * h)
                sbs.append(sum(px[0] for r in rows for px in r))
                sgs.append(sum(px[1] for r in rows for px in r))
                srs.append(sum(px[2] for r in rows for px in r))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_px": pd.Series(ns, dtype="int64"),
                    "sum_b": pd.Series(sbs, dtype="int64"),
                    "sum_g": pd.Series(sgs, dtype="int64"),
                    "sum_r": pd.Series(srs, dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=BMP_STATS_SCHEMA)


WAV_STATS_SCHEMA = (
    "media_id long, sample_rate int, channels int, n_samples long, "
    "sum_amp long, sum_abs long, sum_sq long, peak int"
)


def extract_wav_stats(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction: decode every PCM-16 WAV payload
    and emit exact integer sample statistics (count, amplitude sum,
    |amplitude| sum, energy sum, peak) — all recomputable by a
    closed-form sample oracle, so the decoder itself sits under the
    driver gate. sum_sq stays in int64 for any clip under ~8.6e9
    samples at full scale. Arrow batches via mapInPandas; rows that
    fail to decode are dropped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "channels", "n_samples",
                "sum_amp", "sum_abs", "sum_sq", "peak",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    rate, channels, samples = decode_wav16(raw)
                except ValueError:
                    continue
                out["media_id"].append(media_id)
                out["sample_rate"].append(rate)
                out["channels"].append(channels)
                out["n_samples"].append(len(samples))
                out["sum_amp"].append(sum(samples))
                out["sum_abs"].append(sum(abs(s) for s in samples))
                out["sum_sq"].append(sum(s * s for s in samples))
                out["peak"].append(
                    max((abs(s) for s in samples), default=0)
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "sample_rate": pd.Series(
                        out["sample_rate"], dtype="int32"
                    ),
                    "channels": pd.Series(out["channels"], dtype="int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "sum_amp": pd.Series(out["sum_amp"], dtype="int64"),
                    "sum_abs": pd.Series(out["sum_abs"], dtype="int64"),
                    "sum_sq": pd.Series(out["sum_sq"], dtype="int64"),
                    "peak": pd.Series(out["peak"], dtype="int32"),
                }
            )

    return df.mapInPandas(run, schema=WAV_STATS_SCHEMA)


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
                    try:
                        # REAL path: decode + nearest-neighbor + re-encode
                        out_payload.append(
                            resize_bmp24_nearest(raw, width, height)
                        )
                    except ValueError:
                        # non-BMP (or corrupt) image payload: stub path
                        out_payload.append(
                            _resize_stub(raw, width, height)
                        )
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
    input row fans out to N frame rows. REAL path: an uncompressed-RGB
    AVI payload is actually decoded (decode_avi_rgb) and the sample
    points are real frames — frame_hash is the sha256 of the frame's
    decoded pixel bytes, timestamps from the container's own frame
    rate. Other containers (anything needing ffmpeg) keep the stub: one
    deterministic hash per sample point (sha256 chain over the
    payload), duration from ``meta.duration_ms`` (NULL duration ->
    single frame at t=0). Fan-out happens inside mapInPandas, so the
    expansion is partition-local — no shuffle until someone aggregates
    the frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, hashes = [], [], [], []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                raw = bytes(payload) if payload is not None else b""
                if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    try:
                        w, h, fps, frames = decode_avi_rgb(raw)
                    except ValueError:
                        frames = None
                    if frames is not None:
                        # REAL frames: sample every ``every_ms`` from
                        # the stream's own timeline, hash actual pixels
                        step = max(
                            1, (every_ms * fps) // 1000
                        ) if fps else 1
                        picked = list(range(0, len(frames), step))[
                            :max_frames
                        ]
                        for out_i, fi in enumerate(picked):
                            fb = bytes(
                                c
                                for row in frames[fi]
                                for px in row
                                for c in px
                            )
                            ids.append(media_id)
                            idxs.append(out_i)
                            tss.append(fi * 1000 // fps if fps else 0)
                            hashes.append(
                                hashlib.sha256(fb).hexdigest()
                            )
                        continue
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


DHASH_SCHEMA = "media_id long, h_hi long, h_lo long"


def extract_bmp_dhash(
    df: DataFrame, grid_w: int = 8, grid_h: int = 8
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL BMP payloads: the
    standard near-duplicate-image fingerprint — decode, nearest-
    neighbor resample to a (grid_w+1) x grid_h grid (the shared
    (dst*src_dim)//dst_dim index math), integer grayscale
    (b+g+r) div 3, one bit per cell = gray[x] > gray[x+1]. Visually
    identical images (recompression, minor edits) agree on most bits;
    hamming distance ranks candidate pairs.

    The 64-bit hash is emitted as two NON-NEGATIVE 32-bit halves
    (bit p of the row-major grid: p < 32 -> h_hi, else h_lo) so every
    downstream band/XOR/popcount runs on positive int64s — no
    arithmetic-shift or sign-bit semantics to cross engines. Arrow
    batches via mapInPandas; undecodable rows are dropped (quarantine
    upstream if they matter)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, rows = decode_bmp24(raw)
                except ValueError:
                    continue
                hi = lo = 0
                for y in range(grid_h):
                    sy = (y * h) // grid_h
                    grays = []
                    for x in range(grid_w + 1):
                        sx = (x * w) // (grid_w + 1)
                        b, g, r = rows[sy][sx]
                        grays.append((b + g + r) // 3)
                    for x in range(grid_w):
                        if grays[x] > grays[x + 1]:
                            p = y * grid_w + x
                            if p < 32:
                                hi |= 1 << p
                            else:
                                lo |= 1 << (p - 32)
                ids.append(media_id)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "h_hi": pd.Series(his, dtype="int64"),
                    "h_lo": pd.Series(los, dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=DHASH_SCHEMA)
