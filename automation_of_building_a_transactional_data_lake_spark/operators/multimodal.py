"""Multimodal (image/audio/video) column plumbing.

Not in the reference's surface — added for large-scale training-data
pipelines. Media travel as opaque ``binary`` columns beside typed
metadata; per-item work (decode, resize, frame-sample, feature
extraction) runs in Arrow-batched ``mapInPandas`` so Python touches
data once per batch, never per row.

Two decode tiers exist:

- **Real, dependency-free header decoders** (``decoder="bmp"`` /
  ``"wav"`` / ``"jpeg"`` / ``"png"`` / ``"auto"`` in ``decode_media``):
  pure-python parsers for the BMP DIB header (width/height/bit depth),
  the RIFF/WAVE chunk list (channels/sample rate/bit depth/duration),
  the JPEG SOF frame header (marker-segment walk), and the PNG IHDR
  chunk — genuine metadata decode with no codec libraries, gated by
  golden-bytes tests.
- **Stubbed sample decoders**: full pixel/audio-sample decode needs
  codec libraries absent from this environment, so ``decoder="pil"`` /
  ``"ffmpeg"`` raise ``NotImplementedError`` with a clear message;
  ``decoder="fake"`` produces deterministic pseudo-decodes (byte-level
  stats standing in for pixel stats) so the Spark-side contract —
  schemas, batch iteration, partitioning, column pruning — stays
  executable and testable everywhere.

Scale notes:
- ``mapInPandas`` with ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds executor memory per batch — binary payloads never accumulate.
- The media schema keeps metadata columns OUTSIDE the binary blob so
  filters/projections prune at the parquet scan without touching bytes.
- Feature extraction emits fixed-width columns (schema declared up
  front) — downstream joins/aggregations stay fully columnar.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

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

# Canonical media-item schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_std", DoubleType(), True),
        StructField("payload_hash", LongType(), True),
    ]
)

Decoder = Literal["fake", "bmp", "wav", "jpeg", "png", "auto", "pil", "ffmpeg"]

# decode_media output: detected container metadata per item. Image
# fields null for audio and vice versa; ALL parse fields null when the
# payload is not the expected format (schema-stable, never throws on
# bad bytes — a 100 TB crawl always contains garbage).
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("bits_per_sample", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)


def parse_bmp_header(payload: bytes | None) -> dict | None:
    """Real, dependency-free BMP decode of the metadata tier: the
    14-byte BITMAPFILEHEADER ('BM' magic) followed by a
    BITMAPINFOHEADER (or the ancient BITMAPCOREHEADER). Returns
    width/height/bits_per_sample, or None when the payload is not a
    parseable BMP. A negative height means top-down row order — the
    pixel height is its magnitude."""
    import struct

    if payload is None or len(payload) < 26 or payload[:2] != b"BM":
        return None
    dib = struct.unpack_from("<I", payload, 14)[0]
    if dib >= 40 and len(payload) >= 14 + 40:  # BITMAPINFOHEADER and successors
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
    elif dib == 12 and len(payload) >= 14 + 12:  # BITMAPCOREHEADER
        w, h = struct.unpack_from("<HH", payload, 18)
        bpp = struct.unpack_from("<H", payload, 24)[0]
    else:
        return None
    if w <= 0 or h == 0:
        return None
    return {"format": "bmp", "width": int(w), "height": abs(int(h)), "bits_per_sample": int(bpp)}


def parse_wav_header(payload: bytes | None) -> dict | None:
    """Real, dependency-free RIFF/WAVE decode of the metadata tier:
    walks the word-aligned chunk list for ``fmt `` (channels, sample
    rate, bit depth) and ``data`` (payload size → duration). Returns
    None when the payload is not a parseable WAV."""
    import struct

    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    off, fmt, data_size = 12, None, None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        size = struct.unpack_from("<I", payload, off + 4)[0]
        if cid == b"fmt " and size >= 16 and off + 8 + 16 <= len(payload):
            _tag, ch, rate = struct.unpack_from("<HHI", payload, off + 8)
            bits = struct.unpack_from("<H", payload, off + 8 + 14)[0]
            fmt = (ch, rate, bits)
        elif cid == b"data":
            data_size = size
        off += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None:
        return None
    ch, rate, bits = fmt
    out = {
        "format": "wav",
        "n_channels": int(ch),
        "sample_rate": int(rate),
        "bits_per_sample": int(bits),
    }
    if data_size is not None and rate and ch and bits:
        out["duration_ms"] = int(data_size * 8000 // (rate * ch * bits))
    return out


def parse_jpeg_header(payload: bytes | None) -> dict | None:
    """Real, dependency-free JPEG decode of the metadata tier: walk the
    marker segments from SOI to the first SOF0-SOF15 frame header
    (skipping the non-frame markers that share the 0xC0 block: DHT C4,
    JPG C8, DAC CC) and read precision / height / width / component
    count. No entropy-coded data is touched — the per-item cost is the
    header walk, same tier as BMP/WAV. Returns None for non-JPEG or
    truncated payloads (schema-stable over a dirty crawl)."""
    import struct

    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    off = 2
    n = len(payload)
    while off + 4 <= n:
        if payload[off] != 0xFF:
            return None  # lost marker sync: not a well-formed JPEG
        marker = payload[off + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            off += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            off += 2  # standalone markers carry no length
            continue
        if off + 4 > n:
            return None
        seg_len = struct.unpack_from(">H", payload, off + 2)[0]
        if seg_len < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if off + 2 + 8 > n:
                return None
            bits, h, w, comps = struct.unpack_from(">BHHB", payload, off + 4)
            if w == 0 or h == 0:
                return None
            return {
                "format": "jpeg",
                "width": int(w),
                "height": int(h),
                "n_channels": int(comps),
                "bits_per_sample": int(bits),
            }
        if marker == 0xDA:  # start of scan: entropy data, no SOF found
            return None
        off += 2 + seg_len
    return None


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# IHDR color type → channel count (greyscale, rgb, palette, grey+alpha,
# rgba), per the PNG spec's IHDR table.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_png_header(payload: bytes | None) -> dict | None:
    """Real, dependency-free PNG decode of the metadata tier: the IHDR
    chunk (mandatory first chunk after the 8-byte signature) carries
    width / height / bit depth / color type. Returns None for non-PNG
    or truncated payloads."""
    import struct

    if payload is None or len(payload) < 8 + 25 or payload[:8] != _PNG_MAGIC:
        return None
    length, ctype = struct.unpack_from(">I4s", payload, 8)
    if ctype != b"IHDR" or length != 13:
        return None
    w, h, depth, color = struct.unpack_from(">IIBB", payload, 16)
    if w == 0 or h == 0 or color not in _PNG_CHANNELS:
        return None
    return {
        "format": "png",
        "width": int(w),
        "height": int(h),
        "n_channels": _PNG_CHANNELS[color],
        "bits_per_sample": int(depth),
    }


def decode_png_pixels(payload: bytes | None):
    """REAL dependency-free PNG PIXEL decode (the spec's critical
    chunks; zlib is stdlib): signature → chunk walk with CRC-32
    verification (a silently corrupt pixel array poisons every feature
    downstream) → concatenated-IDAT inflate → per-scanline unfilter
    (all five filter types) → (height, width, channels) uint8 numpy
    array. Covers 8-bit-depth, non-interlaced grey / RGB / grey+alpha /
    RGBA — the overwhelming majority of crawled PNGs. Palette, 16-bit,
    and Adam7 return None (their METADATA still decodes via
    parse_png_header); so does any malformed payload — schema-stable
    over a dirty crawl, never an error.

    Filter math: Up and None are pure vector ops; Sub is a per-channel
    cumulative sum (vectorized); Average/Paeth walk pixels within the
    scanline (each needs the just-reconstructed left neighbor) with
    all channels advanced per step — O(pixels) total either way, and
    this module's own encoder emits filter 0, keeping the synthetic
    path fully vectorized."""
    import struct
    import zlib

    import numpy as np

    hdr = parse_png_header(payload)
    if hdr is None or hdr["bits_per_sample"] != 8:
        return None
    w, h, ch = hdr["width"], hdr["height"], hdr["n_channels"]
    color, interlace = payload[25], payload[28]
    if color == 3 or interlace != 0:
        return None
    idat = bytearray()
    off, n = 8, len(payload)
    saw_end = False
    while off + 8 <= n:
        length, ctype = struct.unpack_from(">I4s", payload, off)
        data_end = off + 8 + length
        if data_end + 4 > n:
            return None
        (crc,) = struct.unpack_from(">I", payload, data_end)
        if zlib.crc32(payload[off + 4 : data_end]) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IDAT":
            idat += payload[off + 8 : data_end]
        elif ctype == b"IEND":
            saw_end = True
            break
        off = data_end + 4
    if not saw_end or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        return None
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    if (ftypes > 4).any():
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        line = arr[y, 1:].astype(np.int64)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: per-channel cumulative sum, vectorized
            cur = line.copy()
            for c in range(ch):
                cur[c::ch] = np.cumsum(cur[c::ch]) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            left = np.zeros(ch, dtype=np.int64)
            for x in range(0, stride, ch):
                cur[x : x + ch] = (
                    cur[x : x + ch] + ((left + prev[x : x + ch]) >> 1)
                ) & 0xFF
                left = cur[x : x + ch]
        else:  # Paeth
            cur = line.copy()
            left = np.zeros(ch, dtype=np.int64)
            upleft = np.zeros(ch, dtype=np.int64)
            for x in range(0, stride, ch):
                up = prev[x : x + ch]
                p = left + up - upleft
                pa, pb, pc = (
                    np.abs(p - left), np.abs(p - up), np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                cur[x : x + ch] = (cur[x : x + ch] + pred) & 0xFF
                left = cur[x : x + ch]
                upleft = up
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(pixels) -> bytes:
    """REAL PNG encoder (the inverse of ``decode_png_pixels``): a
    (height, width, channels) or (height, width) uint8 array becomes a
    spec-conformant non-interlaced 8-bit PNG — filter-0 scanlines,
    one zlib IDAT, CRC'd chunks. decode(encode(x)) == x is a test
    invariant, the same bit-for-bit gating discipline as the DV and
    avro writers."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"pixels must be (h, w[, 1|2|3|4]), got {arr.shape}")
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
    scan[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_png_bytes(width: int, height: int, n_channels: int = 3) -> bytes:
    """A genuine, viewer-openable PNG with a deterministic gradient
    pattern — the compressed-format payload generator beside
    ``make_bmp_bytes``/``make_wav_bytes``."""
    import numpy as np

    y = np.arange(height, dtype=np.uint64)[:, None, None]
    x = np.arange(width, dtype=np.uint64)[None, :, None]
    c = np.arange(n_channels, dtype=np.uint64)[None, None, :]
    px = ((x * 7 + y * 13 + c * 29) % 256).astype(np.uint8)
    return encode_png(px)


def _parse_fake(payload: bytes | None) -> dict | None:
    """Deterministic pseudo-decode twin: stable fields derived from the
    byte length alone, so tests of the dataflow never depend on codecs."""
    if payload is None:
        return None
    n = len(payload)
    return {"format": "fake", "width": n % 64 + 1, "height": n // 64 % 64 + 1}


def _parse_auto(payload: bytes | None) -> dict | None:
    return (
        parse_bmp_header(payload)
        or parse_wav_header(payload)
        or parse_png_header(payload)
        or parse_jpeg_header(payload)
    )


def pillow_available() -> bool:
    """True when the optional pillow dependency is importable (it is
    not installed in the build sandbox; deployments that need real
    JPEG/PNG/WebP decode install it and the ``pil`` decoder activates
    without code changes)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def parse_pil_header(payload: bytes | None) -> dict | None:
    """Optional-dependency image decode via pillow: format, pixel
    dimensions and channel count for every format pillow can identify
    (JPEG/PNG/WebP/GIF/...). ``Image.open`` on a BytesIO only parses
    headers — no pixel data is decoded — so the per-item cost matches
    the dependency-free BMP/WAV tier. Returns None for unparseable
    payloads (schema-stable over a dirty crawl)."""
    if payload is None:
        return None
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return {
                "format": (im.format or "unknown").lower(),
                "width": int(im.size[0]),
                "height": int(im.size[1]),
                "n_channels": len(im.getbands()),
            }
    except Exception:  # noqa: BLE001 — any undecodable payload is null fields
        return None


_DECODERS = {
    "fake": _parse_fake,
    "bmp": parse_bmp_header,
    "wav": parse_wav_header,
    "jpeg": parse_jpeg_header,
    "png": parse_png_header,
    "auto": _parse_auto,
}
if pillow_available():
    _DECODERS["pil"] = parse_pil_header


def decode_media(
    media: DataFrame,
    decoder: Decoder = "auto",
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Metadata decode of the binary payload via Arrow-batched
    ``mapInPandas``: BMP dimensions, WAV sample rate/channels/duration
    (``"auto"`` sniffs both), or the deterministic ``"fake"`` twin.
    Unparseable payloads yield null parse fields, never an error —
    schema-stable over a dirty crawl. Header parsing is inherently
    per-item; payloads still cross to Python once per Arrow batch, and
    only (id, payload) is shipped (column-pruned at the scan)."""
    if decoder not in _DECODERS:
        hint = (
            "install pillow to enable decoder='pil'"
            if decoder == "pil"
            else "media codec libraries not present in this environment"
        )
        raise NotImplementedError(
            f"decoder={decoder!r} unavailable ({hint}); available: "
            f"{sorted(_DECODERS)}"
        )
    parse = _DECODERS[decoder]
    pruned = media.select(id_col, payload_col)
    fields = [f.name for f in DECODED_SCHEMA.fields]

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                d = parse(raw) or {}
                d["media_id"] = mid
                d["n_bytes"] = len(raw) if raw is not None else 0
                rows.append({k: d.get(k) for k in fields})
            yield pd.DataFrame(rows, columns=fields)

    return pruned.mapInPandas(_batches, schema=DECODED_SCHEMA)


def media_frame(spark, rows) -> DataFrame:
    """Build a media DataFrame with the canonical schema."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_bmp_bytes(width: int, height: int, bits_per_pixel: int = 24) -> bytes:
    """A genuine, viewer-openable BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + zeroed 4-byte-aligned pixel rows) — the
    deterministic payload generator for exercising the decode plumbing
    and load-testing media pipelines without codec libraries."""
    import struct

    row = (width * (bits_per_pixel // 8) + 3) // 4 * 4
    pixels = row * height
    return (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + pixels, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bits_per_pixel, 0, pixels,
            2835, 2835, 0, 0,
        )
        + bytes(pixels)
    )


def make_wav_bytes(
    n_channels: int, sample_rate: int, bits_per_sample: int = 16, data_size: int = 0
) -> bytes:
    """A genuine RIFF/WAVE file (fmt + zeroed data chunk) — the audio
    twin of ``make_bmp_bytes``."""
    import struct

    byte_rate = sample_rate * n_channels * bits_per_sample // 8
    block = n_channels * bits_per_sample // 8
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, block,
            bits_per_sample,
        )
        + b"data"
        + struct.pack("<I", data_size)
        + bytes(data_size)
    )


def synthesize_media(
    df: DataFrame,
    kind_col: str = "kind",
    width_col: str = "width",
    height_col: str = "height",
    channels_col: str = "n_channels",
    rate_col: str = "sample_rate",
    data_size_col: str = "data_size",
    out_col: str = "payload",
) -> DataFrame:
    """Attach a deterministic binary media payload per row: ``kind``
    'bmp' rows get a real BMP of (width, height); anything else gets a
    real WAV of (n_channels, sample_rate, data_size bytes of silence).
    Arrow-batched ``pandas_udf`` — payload bytes are built executor-side
    per batch, never on the driver — so a synthetic media corpus of any
    size is one narrow projection away from any id-bearing table."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _synth(kind, w, h, ch, rate, ds):  # type: ignore[no-untyped-def]
        import pandas as pd

        out = []
        for k, wi, hi, c, r, d in zip(kind, w, h, ch, rate, ds):
            if k == "bmp":
                out.append(make_bmp_bytes(int(wi), int(hi)))
            else:
                out.append(make_wav_bytes(int(c), int(r), 16, int(d)))
        return pd.Series(out)

    return df.withColumn(
        out_col,
        _synth(
            F.col(kind_col), F.col(width_col), F.col(height_col),
            F.col(channels_col), F.col(rate_col), F.col(data_size_col),
        ),
    )


def extract_features(
    media: DataFrame,
    decoder: Decoder = "fake",
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-item feature extraction over the binary payload via
    Arrow-batched ``mapInPandas``. With ``decoder='fake'`` the
    "decode" is a deterministic byte-level summary (length, mean, std,
    xxhash-style rolling hash) — the stand-in keeps the whole dataflow
    executable; real decoders plug in behind the same signature."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} requires media codec libraries not present "
            "in this environment; use decoder='fake' for the deterministic "
            "stub, or decode_media(decoder='bmp'/'wav'/'auto') for real "
            "header-metadata decode"
        )

    pruned = media.select(id_col, payload_col)

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "n_bytes": [], "byte_mean": [], "byte_std": [],
                   "payload_hash": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(mid)
                if payload is None:
                    out["n_bytes"].append(0)
                    out["byte_mean"].append(0.0)
                    out["byte_std"].append(0.0)
                    out["payload_hash"].append(0)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                out["n_bytes"].append(int(arr.size))
                out["byte_mean"].append(float(arr.mean()) if arr.size else 0.0)
                out["byte_std"].append(float(arr.std()) if arr.size else 0.0)
                # Deterministic rolling hash (polynomial, mod 2^61-1).
                h = 0
                for b in arr[:4096].tolist():  # cap: hash the head
                    h = (h * 131 + b) % 2305843009213693951
                out["payload_hash"].append(h)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def _resize_bmp24(payload: bytes, width: int, height: int) -> bytes | None:
    """REAL nearest-neighbor resize of a 24-bit BMP — BMP pixel arrays
    are uncompressed, so this needs numpy only. Returns the new BMP
    bytes, or None when the payload is not a resizable 24-bit BMP
    (schema-stable over a dirty crawl, like the header decoders)."""
    import struct

    import numpy as np

    hdr = parse_bmp_header(payload)
    if hdr is None or hdr["bits_per_sample"] != 24:
        return None
    w, h = hdr["width"], hdr["height"]
    data_off = struct.unpack_from("<I", payload, 10)[0]
    raw_h = struct.unpack_from("<i", payload, 22)[0]
    topdown = raw_h < 0
    row = (w * 3 + 3) // 4 * 4
    if len(payload) < data_off + row * h:
        return None
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row * h, offset=data_off
    ).reshape(h, row)[:, : w * 3].reshape(h, w, 3)
    if not topdown:
        px = px[::-1]  # bottom-up storage -> top-down logical order
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    out = px[yi][:, xi]  # nearest-neighbor
    if not topdown:
        out = out[::-1]
    new_row = (width * 3 + 3) // 4 * 4
    padded = np.zeros((height, new_row), dtype=np.uint8)
    padded[:, : width * 3] = out.reshape(height, width * 3)
    pixels = padded.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII",
            40, width, -height if topdown else height, 1, 24, 0,
            len(pixels), 2835, 2835, 0, 0,
        )
    )
    return header + pixels


def _resize_png(payload: bytes, width: int, height: int) -> bytes | None:
    """REAL nearest-neighbor resize of a decodable PNG: pixel decode →
    index-sliced resample → re-encode. None when undecodable."""
    import numpy as np

    px = decode_png_pixels(payload)
    if px is None:
        return None
    h, w = px.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_png(px[yi][:, xi])


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    decoder: str = "auto",
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize image payloads via Arrow-batched ``mapInPandas`` — REAL
    dependency-free nearest-neighbor paths: ``"bmp"`` (uncompressed
    pixel array, numpy slicing), ``"png"`` (full decode → resample →
    re-encode, zlib from the stdlib), ``"auto"`` (sniff both).
    Unresizable payloads yield a null output payload, never an error.
    JPEG/video resize needs the codec backends and raises loudly
    (same contract as ``extract_features``)."""
    if decoder not in ("bmp", "png", "auto"):
        raise NotImplementedError(
            f"decoder={decoder!r}: resizing this format needs the "
            "pillow/ffmpeg backends, not present in this environment "
            "(decoder='bmp'/'png'/'auto' are the real dependency-free "
            "paths)"
        )
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    pruned = media.select(id_col, payload_col)

    def _one(raw: bytes):
        if decoder in ("bmp", "auto"):
            out = _resize_bmp24(raw, width, height)
            if out is not None or decoder == "bmp":
                return out
        return _resize_png(raw, width, height)

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                out = _one(raw) if raw else None
                rows.append(
                    {
                        "media_id": mid,
                        "payload": out,
                        "width": width if out else None,
                        "height": height if out else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return pruned.mapInPandas(_batches, schema=RESIZED_SCHEMA)


PIXEL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("pixel_mean", DoubleType(), True),
        StructField("pixel_std", DoubleType(), True),
        StructField("luma_mean", DoubleType(), True),
    ]
)


def extract_pixel_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL pixel-tier feature extraction (no codec libraries): PNG
    payloads fully decode (``decode_png_pixels``), 24-bit BMPs read
    their uncompressed pixel array — per-image mean/std over samples
    and a Rec.601 luma mean (the training-data quality signals:
    near-black/near-white/flat images filter on these). Undecodable
    payloads yield null feature columns, never an error. This is the
    production tier ``extract_features(decoder='fake')`` stubbed —
    byte-level stats remain available there for formats without a
    dependency-free decoder (JPEG pixel decode still needs pillow)."""
    import struct

    pruned = media.select(id_col, payload_col)
    fields = [f.name for f in PIXEL_FEATURE_SCHEMA.fields]

    def _decode(raw: bytes):
        import numpy as np

        px = decode_png_pixels(raw)
        if px is not None:
            return "png", px
        hdr = parse_bmp_header(raw)
        if hdr is not None and hdr["bits_per_sample"] == 24:
            w, h = hdr["width"], hdr["height"]
            data_off = struct.unpack_from("<I", raw, 10)[0]
            row = (w * 3 + 3) // 4 * 4
            if len(raw) >= data_off + row * h:
                px = np.frombuffer(
                    raw, dtype=np.uint8, count=row * h, offset=data_off
                ).reshape(h, row)[:, : w * 3].reshape(h, w, 3)
                return "bmp", px[::-1]
        return None, None

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                fmt, px = _decode(raw) if raw else (None, None)
                if px is None:
                    rows.append({**dict.fromkeys(fields), "media_id": mid})
                    continue
                f = px.astype(np.float64)
                if px.shape[2] >= 3:
                    luma = (
                        0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
                        + 0.114 * f[:, :, 2]
                    )
                else:
                    luma = f[:, :, 0]
                rows.append(
                    {
                        "media_id": mid,
                        "format": fmt,
                        "width": int(px.shape[1]),
                        "height": int(px.shape[0]),
                        "n_channels": int(px.shape[2]),
                        "pixel_mean": float(f.mean()),
                        "pixel_std": float(f.std()),
                        "luma_mean": float(luma.mean()),
                    }
                )
            yield pd.DataFrame(rows, columns=fields)

    return pruned.mapInPandas(_batches, schema=PIXEL_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (0, every_ms, 2*every_ms, ... < duration_ms).
    The timestamps come from a JVM-side ``sequence``/``explode`` — only
    the (stubbed) frame decode would need Python."""
    vids = media.filter(F.col("kind") == "video").filter(F.col("duration_ms").isNotNull())
    ts = F.sequence(F.lit(0).cast("long"), F.col("duration_ms") - 1, F.lit(every_ms).cast("long"))
    return vids.select(id_col, F.explode(ts).alias("frame_ts_ms"))
