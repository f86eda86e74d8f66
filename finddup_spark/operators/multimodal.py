"""Multimodal binary-column operators (training-pipeline family).

Images / audio / video are opaque ``binary`` columns with typed metadata.
``decode_media`` is a REAL decoder for two formats that need no codec
library in this container: the uncompressed Netpbm P6 (PPM) format (pure
numpy header+pixel parse) and COMPRESSED 8-bit RGB PNG (stdlib ``zlib``
inflate + numpy scanline unfiltering, all five PNG filter types — the
public PNG spec's critical-chunk path). Other compressed kinds (jpeg,
palette/interlaced png) dispatch to PIL when importable and degrade to
NULL-stats lineage rows otherwise. :func:`fake_decode_stats` remains the
codec-free plumbing driver (byte stats over arbitrary blobs), and
:func:`synthesize_ppm_media` / :func:`synthesize_png_media` generate
deterministic corpora whose stats a SQL oracle recomputes in closed form
(the PNG corpus round-trips through a real deflate compress/inflate).

Schema:
    media(doc_id long, kind string, payload binary, meta map<string,string>)
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = "doc_id long, kind string, payload binary, meta map<string,string>"

_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("header_hash", LongType()),
    ]
)


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _parse_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a binary PPM (P6) blob with pure numpy — no codec library.

    Format (public Netpbm spec): ASCII magic ``P6``, then width, height
    and maxval as whitespace-separated decimal tokens, then exactly ONE
    whitespace byte, then width*height*3 raw RGB bytes. Comments are not
    supported (the synthetic corpus never writes them)."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {payload[:2]!r})")
    idx, vals = 2, []
    while len(vals) < 3:
        while payload[idx : idx + 1].isspace():
            idx += 1
        start = idx
        while idx < len(payload) and not payload[idx : idx + 1].isspace():
            idx += 1
        vals.append(int(payload[start:idx]))
    idx += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    if maxval != 255:
        # maxval > 255 means 2-byte samples (valid P6, different layout);
        # decoding them as single bytes would yield plausible-but-wrong
        # stats — route to the unreadable path instead
        raise ValueError(f"unsupported PPM maxval {maxval} (only 255)")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
    return w, h, maxval, data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _encode_png(w: int, h: int, rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal 8-bit RGB non-interlaced PNG encoder — stdlib zlib only.

    Writes one IDAT with the SAME ``filter_type`` byte on every scanline
    (0 = None for the synthetic corpus; tests pass 1-4 to exercise each
    decoder unfilter path). ``rgb`` is the flat w*h*3 uint8 pixel array.
    """
    rows = np.asarray(rgb, dtype=np.uint8).reshape(h, w * 3).astype(np.int64)
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        cur = rows[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 2:  # Up
            enc = (cur - prev) & 0xFF
        else:  # Sub / Average / Paeth need the reconstructed left pixel
            enc = np.empty(w * 3, dtype=np.int64)
            for x in range(w * 3):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if filter_type == 1:  # Sub
                    enc[x] = (cur[x] - a) & 0xFF
                elif filter_type == 3:  # Average
                    enc[x] = (cur[x] - (a + b) // 2) & 0xFF
                elif filter_type == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (cur[x] - pr) & 0xFF
                else:
                    raise ValueError(f"bad filter {filter_type}")
        raw.append(filter_type)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )


def _parse_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an 8-bit RGB (color type 2) non-interlaced PNG with stdlib
    zlib + numpy — no codec library (public PNG spec, RFC 2083): chunk
    walk with CRC verification, one inflate, then per-scanline
    unfiltering of all five filter types (None/Sub/Up/Average/Paeth).
    Unsupported depths/color types/interlace raise ValueError and
    surface as NULL-stats lineage rows (the reference's unreadable-file
    handling, ``finddup.py:144-149``). Returns (w, h, flat RGB bytes).
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError(f"not a PNG (magic {payload[:8]!r})")
    idx, idat, w, h = 8, bytearray(), None, None
    while idx + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[idx : idx + 4])
        ctype = payload[idx + 4 : idx + 8]
        data = payload[idx + 8 : idx + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[idx + 8 + ln : idx + 12 + ln])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2 or comp or filt or interlace:
                # e.g. palette/alpha/16-bit/interlaced → PIL-or-NULL path
                raise ValueError(
                    f"unsupported PNG (depth {depth}, color {color}, "
                    f"interlace {interlace})"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        idx += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    bpp = 3
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(arr[y, 0])
        cur = arr[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if f == 0:
            rec = cur
        elif f == 2:  # Up — vectorized (with Sub=1 below, the common pair)
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:  # Sub
                    val = cur[x] + a
                elif f == 3:  # Average
                    val = cur[x] + (a + b) // 2
                else:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    val = cur[x] + pr
                rec[x] = val & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    return w, h, out.reshape(-1)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL media decode → per-image stats (doc_id, kind, width, height,
    n_pixels, mean_pixel).

    ``kind='ppm'`` rows are decoded with the pure-numpy Netpbm P6 parser
    (:func:`_parse_ppm`); ``kind='png'`` rows with the stdlib-zlib +
    numpy PNG decoder (:func:`_parse_png`) — one uncompressed and one
    genuinely COMPRESSED public format, both real in this container with
    no codec library. Other kinds (jpeg/...; pngs outside the RGB8
    non-interlaced profile) dispatch to PIL when importable and fail
    loudly per row otherwise (a decode error surfaces as a NULL-stats
    row, the lineage-row analog of the reference's unreadable-file
    handling, ``finddup.py:144-149``). Plumbing: binary column → Arrow
    batch → numpy → struct rows, identical for every codec."""
    pil = _try_import_pil()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "kind", "width", "height", "n_pixels", "mean_pixel")}
            for did, kind, payload in zip(
                pdf["doc_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                w = h = npx = None
                mean = None
                try:
                    if payload is None:
                        # a NULL payload is an unreadable input, not a task
                        # failure: resize_media deliberately emits
                        # NULL-payload lineage rows, so decode∘resize must
                        # pass them through as NULL-stats rows
                        raise ValueError("NULL payload")
                    if kind == "ppm":
                        w, h, _maxval, data = _parse_ppm(bytes(payload))
                        npx = w * h
                        mean = round(float(data.mean()) if len(data) else 0.0, 6)
                    elif kind == "png":
                        try:
                            w, h, data = _parse_png(bytes(payload))
                        except ValueError:
                            # outside the RGB8 non-interlaced profile →
                            # PIL when importable, else NULL-stats row
                            if pil is None:
                                raise
                            w = h = data = None
                        if data is not None:
                            npx = w * h
                            mean = round(
                                float(data.mean()) if len(data) else 0.0, 6
                            )
                        else:
                            import io

                            img = pil.open(io.BytesIO(bytes(payload)))
                            arr = np.asarray(img, dtype=np.uint8)
                            w, h = img.size
                            npx = w * h
                            mean = round(float(arr.mean()), 6)
                    elif pil is not None:
                        import io

                        img = pil.open(io.BytesIO(bytes(payload)))
                        arr = np.asarray(img, dtype=np.uint8)
                        w, h = img.size
                        npx = w * h
                        mean = round(float(arr.mean()), 6)
                    # else: no codec for this kind → NULL-stats row
                except (ValueError, OSError, zlib.error, struct.error):
                    # zlib.error: IDAT stream truncated at a chunk boundary
                    # (every present chunk's CRC can still pass);
                    # struct.error: payload ends inside a chunk header/CRC
                    # or a short IHDR — all are corrupt-INPUT conditions
                    # that must become NULL-stats rows, not task failures
                    w = h = npx = mean = None  # unreadable → NULL-stats row
                rows["doc_id"].append(did)
                rows["kind"].append(kind)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(npx)
                rows["mean_pixel"].append(mean)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "kind", "payload").mapInPandas(fn, _DECODE_SCHEMA)


def synthesize_ppm_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic synthetic PPM corpus: per doc_id, a P6 blob with
    width = 4 + id%5, height = 3 + id%4, maxval 255 and pixel byte
    i = (id*7 + i*31) % 256 — a closed form a SQL oracle can recompute
    without touching the binary. Output matches MEDIA_SCHEMA."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf[id_col].values:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                nb = w * h * 3
                data = ((did * 7 + np.arange(nb, dtype=np.int64) * 31) % 256).astype(
                    np.uint8
                )
                payloads.append(b"P6\n%d %d\n255\n" % (w, h) + data.tobytes())
                ids_.append(did)
            yield pd.DataFrame({"doc_id": pd.Series(ids_, dtype="int64"),
                                "kind": "ppm",
                                "payload": payloads})

    return ids.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        fn, out_schema
    ).select(
        "doc_id", "kind", "payload",
        F.create_map(F.lit("codec"), F.lit("ppm")).alias("meta"),
    )


def synthesize_png_media(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic synthetic PNG corpus: the SAME closed-form pixels as
    :func:`synthesize_ppm_media` (width = 4 + id%5, height = 3 + id%4,
    pixel byte i = (id*7 + i*31) % 256) but DEFLATE-compressed through
    the stdlib-zlib PNG encoder — so decode genuinely round-trips a
    compressed codec while the SQL oracle still recomputes the stats in
    closed form without touching the binary. Output matches
    MEDIA_SCHEMA."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf[id_col].values:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                nb = w * h * 3
                data = ((did * 7 + np.arange(nb, dtype=np.int64) * 31) % 256).astype(
                    np.uint8
                )
                payloads.append(_encode_png(w, h, data))
                ids_.append(did)
            yield pd.DataFrame({"doc_id": pd.Series(ids_, dtype="int64"),
                                "kind": "png",
                                "payload": payloads})

    return ids.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        fn, out_schema
    ).select(
        "doc_id", "kind", "payload",
        F.create_map(F.lit("codec"), F.lit("png")).alias("meta"),
    )


def fake_decode_stats(media: DataFrame) -> DataFrame:
    """Deterministic stand-in decoder: per payload, byte stats + a hash of
    the first 16 header bytes. Exercises the exact plumbing a real codec
    uses (binary column in → Arrow batch → numpy → struct out)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..hashing import fnv1a64

        for pdf in batches:
            n_bytes, means, hh = [], [], []
            for payload in pdf["payload"].values:
                if payload is None:
                    n_bytes.append(0); means.append(0.0); hh.append(0)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_bytes.append(len(arr))
                means.append(float(arr.mean()) if len(arr) else 0.0)
                hh.append(np.uint64(fnv1a64(bytes(payload[:16]))).view(np.int64).item())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "mean_byte": pd.Series(means, dtype="float64"),
                    "header_hash": pd.Series(hh, dtype="int64"),
                }
            )

    return media.select("doc_id", "kind", "payload").mapInPandas(fn, _STATS_SCHEMA)


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor image resize over decodable payloads — the
    training-pipeline image-normalization step, composing with
    :func:`decode_media` (decode → transform → re-encode, same Arrow
    batch plumbing). ``kind='ppm'``/``'png'`` payloads decode with the
    stdlib codecs, are resampled to (out_w, out_h) and re-encoded as
    PPM P6; the mapping is pure integer arithmetic —
    ``src_col = (tx * src_w) // out_w``, ``src_row = (ty * src_h) //
    out_h`` — so a SQL oracle can recompute the resized pixels of a
    closed-form corpus exactly. Undecodable payloads emit a NULL-payload
    lineage row (kind preserved) instead of vanishing."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for did, kind, payload in zip(
                pdf["doc_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                blob = None
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    if kind == "ppm":
                        w, h, _maxval, data = _parse_ppm(bytes(payload))
                    elif kind == "png":
                        w, h, data = _parse_png(bytes(payload))
                    else:
                        raise ValueError(f"no stdlib codec for kind {kind!r}")
                    img = data.reshape(h, w, 3)
                    rows_idx = (np.arange(out_h, dtype=np.int64) * h) // out_h
                    cols_idx = (np.arange(out_w, dtype=np.int64) * w) // out_w
                    rz = np.ascontiguousarray(img[rows_idx][:, cols_idx])
                    blob = b"P6\n%d %d\n255\n" % (out_w, out_h) + rz.tobytes()
                except (ValueError, OSError, zlib.error, struct.error):
                    blob = None  # corrupt input → NULL-payload lineage row
                ids.append(did)
                kinds.append("ppm" if blob is not None else kind)
                payloads.append(blob)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "kind": kinds,
                    "payload": payloads,
                }
            )

    return media.select("doc_id", "kind", "payload").mapInPandas(
        fn, out_schema
    ).select(
        "doc_id", "kind", "payload",
        F.create_map(
            F.lit("resized"), F.concat_ws("x", F.lit(out_w), F.lit(out_h))
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """'Video' frame sampling plumbing: slice each payload into n evenly
    spaced fixed-width windows → (doc_id, frame_id, frame binary). The
    real version seeks keyframes via the codec; partitioning and output
    shape are identical."""
    ddl = "doc_id long, frame_id long, frame binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, frames = [], [], []
            for did, payload in zip(pdf["doc_id"].values, pdf["payload"].values):
                if payload is None or len(payload) == 0:
                    continue
                step = max(1, (len(payload) - frame_bytes) // max(1, n_frames - 1))
                for i in range(n_frames):
                    start = min(i * step, max(0, len(payload) - frame_bytes))
                    ids.append(did); fids.append(i)
                    frames.append(bytes(payload[start : start + frame_bytes]))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_id": pd.Series(fids, dtype="int64"),
                                "frame": frames if frames else pd.Series([], dtype=object)})

    return media.select("doc_id", "payload").mapInPandas(fn, ddl)


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("duration_ms", DoubleType()),
        StructField("mean_abs_amp", DoubleType()),
    ]
)


def _encode_wav(sample_rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE PCM16 encoder — pure ``struct`` + numpy, no
    codec library (public RIFF/WAVE spec). ``samples`` is a flat int16
    array (interleaved when channels > 1)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE PCM16 blob with pure ``struct`` + numpy — the
    chunk walk of the public RIFF spec (fmt + data, other chunks skipped,
    odd-size chunks padded to even offsets). Returns
    (sample_rate, channels, int16 sample array). Non-PCM encodings,
    non-16-bit depths and malformed containers raise ValueError (or
    struct.error on truncation) and surface as NULL-stats lineage rows."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE blob (magic {payload[:4]!r})")
    idx = 12
    sample_rate = channels = None
    data: bytes | None = None
    while idx + 8 <= len(payload):
        cid = payload[idx : idx + 4]
        (ln,) = struct.unpack("<I", payload[idx + 4 : idx + 8])
        chunk = payload[idx + 8 : idx + 8 + ln]
        if len(chunk) != ln:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError(f"short fmt chunk ({ln} bytes)")
            audio_fmt, channels, sample_rate, _brate, _balign, bits = (
                struct.unpack("<HHIIHH", chunk[:16])
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format {audio_fmt}, {bits}-bit) — "
                    "only PCM16"
                )
        elif cid == b"data":
            data = chunk
        idx += 8 + ln + (ln % 2)  # RIFF pads odd chunks to even offsets
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return sample_rate, channels, np.frombuffer(data, dtype="<i2")


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode → per-clip stats (doc_id, kind, n_samples,
    sample_rate, channels, duration_ms, mean_abs_amp) — the third
    modality next to PPM and PNG, again a genuinely parsed public format
    (RIFF/WAVE PCM16) with no codec library. ``n_samples`` counts frames
    (samples per channel); ``mean_abs_amp`` is the mean absolute int16
    amplitude over all interleaved samples. Unreadable payloads (bad
    magic, truncated chunks, non-PCM) emit NULL-stats lineage rows —
    the reference's unreadable-file handling (``finddup.py:144-149``)
    applied to audio. Same Arrow-batch plumbing as :func:`decode_media`."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "kind", "n_samples", "sample_rate", "channels",
                "duration_ms", "mean_abs_amp",
            )}
            for did, kind, payload in zip(
                pdf["doc_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                ns = rate = ch = dur = amp = None
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    if kind != "wav":
                        raise ValueError(f"no stdlib audio codec for {kind!r}")
                    rate, ch, samples = _parse_wav(bytes(payload))
                    ns = len(samples) // ch
                    dur = round(ns * 1000.0 / rate, 6)
                    amp = round(
                        float(np.abs(samples.astype(np.int64)).mean())
                        if len(samples) else 0.0,
                        6,
                    )
                except (ValueError, OSError, struct.error):
                    ns = rate = ch = dur = amp = None
                rows["doc_id"].append(did)
                rows["kind"].append(kind)
                rows["n_samples"].append(ns)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["duration_ms"].append(dur)
                rows["mean_abs_amp"].append(amp)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "kind", "payload").mapInPandas(fn, _AUDIO_SCHEMA)


def synthesize_wav_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic WAV corpus: per doc_id, a mono PCM16 clip
    with sample_rate = 8000 * (1 + id%3), n_samples = 40 + id%17 and
    sample i = ((id*13 + i*37) % 65536) - 32768 — a closed form a SQL
    oracle recomputes without touching the binary, while decode
    genuinely walks the RIFF container. Output matches MEDIA_SCHEMA."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf[id_col].values:
                did = int(did)
                rate = 8000 * (1 + did % 3)
                n = 40 + did % 17
                samples = (
                    ((did * 13 + np.arange(n, dtype=np.int64) * 37) % 65536)
                    - 32768
                ).astype(np.int16)
                payloads.append(_encode_wav(rate, samples))
                ids_.append(did)
            yield pd.DataFrame({"doc_id": pd.Series(ids_, dtype="int64"),
                                "kind": "wav",
                                "payload": payloads})

    return ids.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        fn, out_schema
    ).select(
        "doc_id", "kind", "payload",
        F.create_map(F.lit("codec"), F.lit("wav")).alias("meta"),
    )


def media_from_pages(pages: DataFrame) -> DataFrame:
    """Adapter: treat page html as an opaque media payload (how a crawl
    pipeline feeds image/audio bytes through the same table shape)."""
    return pages.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("html").alias("kind"),
        F.col("html").alias("payload"),
        F.create_map(F.lit("url"), F.col("url")).alias("meta"),
    )
