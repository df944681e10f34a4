"""Apache Puffin file format (read + a DV-writing subset) — the
Iceberg v3 container for deletion vectors.

Implemented from the PUBLIC specs only: the Puffin file format spec
(iceberg.apache.org/puffin-spec) and the Iceberg v3 table spec's
"Position Delete Files / Deletion Vectors" section. Reference parity
note: the reference pipeline (aws-samples/automation-of-building-a-
transactional-data-lake, src/iceberg/iceberg-cdc-load.py:127-150)
produces row-level deletes via MERGE INTO on format-version 2; v3
writers emit the same logical deletes as Puffin deletion vectors, so
reading them is the forward-compatibility half of the same capability.

File structure::

    Magic Blob_1 ... Blob_n Footer
    Footer = Magic FooterPayload FooterPayloadSize Flags Magic

- ``Magic`` = 0x50 0x46 0x41 0x31 (``PFA1``).
- ``FooterPayload``: UTF-8 JSON FileMetadata ``{"blobs": [...],
  "properties": {...}}``, optionally lz4-frame-compressed (flag).
  This engine writes it uncompressed and REFUSES a compressed payload
  loudly (lz4 is outside the dependency budget — never a silent
  misread).
- ``FooterPayloadSize``: int32 LE byte length of FooterPayload.
- ``Flags``: 4 bytes; byte 0 bit 0 = footer payload compressed.

``deletion-vector-v1`` blob layout (Iceberg v3 spec)::

    [len:   int32 BE — byte length of magic + vector]
    [magic: D1 D3 3D D3]
    [vector: 64-bit RoaringBitmap, "portable" serialization]
    [crc32 of magic + vector: uint32 BE]

The vector's portable serialization is bit-identical to Delta Lake's
deletion-vector bitmap (the v3 spec chose it for exactly that
cross-format compatibility), so the codec is shared with the Delta DV
path in ``interop`` (``_roaring64_positions`` / ``_roaring64_serialize``
— both gated by decode(encode(x)) == x tests).
"""

from __future__ import annotations

import json
import struct
import zlib

PUFFIN_MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x3d\xd3"
DV_BLOB_TYPE = "deletion-vector-v1"
_FLAG_FOOTER_COMPRESSED = 0x01  # byte 0, bit 0


def _dv_blob_bytes(positions: list[int]) -> bytes:
    """One serialized deletion-vector-v1 blob for the given row
    positions (sorted/deduplicated by the roaring serializer)."""
    from .interop import _roaring64_serialize

    vector = _roaring64_serialize(positions)
    body = DV_MAGIC + vector
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def decode_dv_blob(blob: bytes) -> list[int]:
    """Deleted row positions of one deletion-vector-v1 blob, every
    framing check loud (a DV misread silently resurrects or kills
    rows): length prefix consistent with the blob size, magic exact,
    CRC-32 over magic+vector exact."""
    from .interop import _roaring64_positions

    if len(blob) < 12:
        raise ValueError(f"deletion vector blob of {len(blob)} bytes is too short")
    (body_len,) = struct.unpack_from(">i", blob, 0)
    if body_len < 4 or 4 + body_len + 4 > len(blob):
        raise ValueError(
            f"deletion vector length prefix {body_len} inconsistent with "
            f"blob size {len(blob)}"
        )
    body = blob[4 : 4 + body_len]
    if body[:4] != DV_MAGIC:
        raise ValueError(
            f"bad deletion vector magic {body[:4].hex()} "
            f"(expected {DV_MAGIC.hex()})"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    actual = zlib.crc32(body) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError(
            f"deletion vector CRC mismatch: stored {crc:#x}, computed {actual:#x}"
        )
    return _roaring64_positions(body[4:])


def read_dv_blob(path: str, offset: int, length: int) -> list[int]:
    """Deleted positions of the DV blob at ``[offset, offset+length)``
    of a Puffin file — the direct access an Iceberg v3 manifest entry's
    ``content_offset`` / ``content_size_in_bytes`` grant, no footer
    read needed. The file head magic is still verified."""
    with open(path, "rb") as f:
        if f.read(4) != PUFFIN_MAGIC:
            raise ValueError(f"{path} is not a Puffin file (bad head magic)")
        f.seek(offset)
        blob = f.read(length)
    if len(blob) != length:
        raise ValueError(
            f"Puffin blob at {offset}+{length} runs past EOF of {path}"
        )
    return decode_dv_blob(blob)


def read_footer(path: str) -> dict:
    """The Puffin FileMetadata JSON (``{"blobs": [...], "properties":
    ...}``). Compressed footer payloads refuse loudly."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head != PUFFIN_MAGIC:
            raise ValueError(f"{path} is not a Puffin file (bad head magic)")
        f.seek(0, 2)
        size = f.tell()
        if size < 20:
            raise ValueError(f"{path} is too short to hold a Puffin footer")
        f.seek(size - 12)
        tail = f.read(12)
        payload_size, flags = struct.unpack("<iI", tail[:8])
        if tail[8:] != PUFFIN_MAGIC:
            raise ValueError(f"{path} footer trailing magic is corrupt")
        if flags & _FLAG_FOOTER_COMPRESSED:
            raise NotImplementedError(
                f"{path} has an lz4-compressed Puffin footer payload — "
                "not supported (uncompressed footers only)"
            )
        if payload_size < 0 or size - 12 - payload_size - 4 < 4:
            raise ValueError(
                f"{path} footer payload size {payload_size} is inconsistent"
            )
        f.seek(size - 12 - payload_size)
        payload = f.read(payload_size)
        f.seek(size - 12 - payload_size - 4)
        if f.read(4) != PUFFIN_MAGIC:
            raise ValueError(f"{path} footer leading magic is corrupt")
    return json.loads(payload.decode("utf-8"))


def write_puffin_dvs(
    path: str,
    dvs: dict[str, list[int]],
    snapshot_id: int,
    sequence_number: int,
    created_by: str = "automation_of_building_a_transactional_data_lake_spark",
) -> dict[str, tuple[int, int, int]]:
    """Write one Puffin file holding a deletion-vector-v1 blob per
    referenced data file and return ``{referenced data file:
    (content_offset, content_size_in_bytes, cardinality)}`` — exactly
    the fields the v3 manifest entry records. Blobs land in sorted
    referenced-path order; the footer carries the spec's blob
    metadata (``referenced-data-file`` and ``cardinality`` properties)
    so foreign Puffin readers can discover the DVs without the
    manifest."""
    blobs_meta = []
    out: dict[str, tuple[int, int, int]] = {}
    buf = bytearray(PUFFIN_MAGIC)
    for ref in sorted(dvs):
        positions = sorted(set(dvs[ref]))
        blob = _dv_blob_bytes(positions)
        off = len(buf)
        buf += blob
        out[ref] = (off, len(blob), len(positions))
        blobs_meta.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": off,
                "length": len(blob),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(len(positions)),
                },
            }
        )
    payload = json.dumps(
        {"blobs": blobs_meta, "properties": {"created-by": created_by}},
        separators=(",", ":"),
    ).encode("utf-8")
    buf += PUFFIN_MAGIC
    buf += payload
    buf += struct.pack("<iI", len(payload), 0)
    buf += PUFFIN_MAGIC
    with open(path, "wb") as f:
        f.write(bytes(buf))
    return out
