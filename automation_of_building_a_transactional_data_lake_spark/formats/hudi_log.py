"""Apache Hudi log-file (HoodieLogFormat) codec — dependency-free.

Merge-on-read Hudi tables append row changes to LOG FILES beside each
file group's parquet base file; reading a MoR snapshot means decoding
those logs and merging them onto the base. The reference's own tables
are copy-on-write (``src/hudi/hudi-initial-load.py:71``), but a real
deployment's first MoR table was the one remaining loud raise in this
repo's three-format read surface — this module closes it for the block
kinds a jar-less reader can decode FAITHFULLY, and keeps the raise for
the rest (a wrong log decode silently resurrects or kills rows).

Byte layout per block, following the published storage spec
(hudi.apache.org/tech-specs, "Log File Format") — Java
``DataOutputStream`` framing, so every integer is BIG-endian:

    6   magic ``#HUDI#``
    8   block length (excluding the magic and this field)
    4   log-format version (1)
    4   block type ordinal
    .   header map: int count, then per entry
        (int type-ordinal, int byte-length, utf-8 bytes)
    8   content length
    .   content
    .   footer map (same encoding as the header)
    8   total block length INCLUDING magic (for tail-seeking readers)

Block types (ordinals): 0 command, 1 delete, 2 corrupt, 3 avro data,
4 hfile data, 5 parquet data, 6 cdc data. Supported here:

- AVRO data blocks (the MoR upsert delta): content is format version
  3 (int), record count (int), then per record int length + one raw
  Avro binary datum of the block's writer schema (the ``SCHEMA``
  header).
- COMMAND blocks (rollback): a later block whose
  ``TARGET_INSTANT_TIME`` names an instant neutralizes every earlier
  block written at that instant.
- DELETE blocks version >= 2 (r16 — the most common foreign-MoR shape
  previously refused: any MoR table that ever deleted a row): content
  is the block version (int), a payload length (int), then ONE Avro
  binary datum of ``HoodieDeleteRecordList`` (HoodieDeleteBlock's own
  serialization since 0.12) — an array of (recordKey, partitionPath,
  orderingVal) records. The keys anti-join the slice during merge.
  The kryo-era VERSION 1 payload (serialized ``HoodieKey[]``) stays a
  loud raise — kryo cannot be decoded faithfully jar-less. A non-null
  ``orderingVal`` whose union branch is outside the primitive set
  also raises rather than guessing.

- PARQUET data blocks (r16 — `hoodie.logfile.data.block.format=parquet`
  writers): the content IS a self-contained parquet file
  (HoodieParquetDataBlock streams its records through a parquet
  writer into the block body) — verified structurally by the PAR1
  magic at both ends, decoded with pyarrow, merged exactly like avro
  data records. Content that does not frame a parquet file raises.

HFile / CDC blocks raise ``NotImplementedError`` LOUDLY: their
payloads are engine-serialized shapes this codec cannot verify
byte-faithfully, and guessing is worse than refusing — compact those
tables with their native engine first.

The writer mirrors the same layout bit-for-bit; it exists for fixture
building and for the reader's round-trip gate (a golden hand-packed
block in the tests pins the layout independently of the writer).
"""

from __future__ import annotations

import io
import os
import re
import struct
from dataclasses import dataclass, field

from .avro_lite import decode_datum, encode_datum

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

# HoodieLogBlockType ordinals.
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3
HFILE_DATA_BLOCK = 4
PARQUET_DATA_BLOCK = 5
CDC_DATA_BLOCK = 6

_BLOCK_NAMES = {
    COMMAND_BLOCK: "command",
    DELETE_BLOCK: "delete",
    CORRUPT_BLOCK: "corrupt",
    AVRO_DATA_BLOCK: "avro-data",
    HFILE_DATA_BLOCK: "hfile-data",
    PARQUET_DATA_BLOCK: "parquet-data",
    CDC_DATA_BLOCK: "cdc-data",
}

# HeaderMetadataType ordinals.
INSTANT_TIME = 0
TARGET_INSTANT_TIME = 1
SCHEMA = 2
COMMAND_BLOCK_TYPE = 3

_AVRO_DATA_FORMAT_VERSION = 3


@dataclass
class LogBlock:
    """One decoded log block: raw content plus its header/footer maps
    (keys are HeaderMetadataType ordinals, values utf-8 strings)."""

    block_type: int
    header: dict[int, str] = field(default_factory=dict)
    footer: dict[int, str] = field(default_factory=dict)
    content: bytes = b""

    @property
    def instant_time(self) -> str | None:
        return self.header.get(INSTANT_TIME)

    @property
    def target_instant_time(self) -> str | None:
        return self.header.get(TARGET_INSTANT_TIME)


def _encode_meta_map(meta: dict[int, str]) -> bytes:
    out = io.BytesIO()
    out.write(struct.pack(">i", len(meta)))
    for k, v in meta.items():
        raw = v.encode("utf-8")
        out.write(struct.pack(">i", int(k)))
        out.write(struct.pack(">i", len(raw)))
        out.write(raw)
    return out.getvalue()


def _decode_meta_map(buf: io.BytesIO) -> dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out: dict[int, str] = {}
    for _ in range(n):
        k, ln = struct.unpack(">ii", buf.read(8))
        out[k] = buf.read(ln).decode("utf-8")
    return out


def write_log_file(path: str, blocks: list[LogBlock]) -> None:
    """Append-write a Hudi log file with the exact HoodieLogFormat
    framing (see module docstring). Overwrites ``path``."""
    out = io.BytesIO()
    for b in blocks:
        header = _encode_meta_map(b.header)
        footer = _encode_meta_map(b.footer)
        # Block length excludes the magic and the length field itself:
        # version + type + header + content-length + content + footer
        # + the trailing total-length long.
        block_len = 4 + 4 + len(header) + 8 + len(b.content) + len(footer) + 8
        total_len = len(MAGIC) + 8 + block_len
        out.write(MAGIC)
        out.write(struct.pack(">q", block_len))
        out.write(struct.pack(">i", LOG_FORMAT_VERSION))
        out.write(struct.pack(">i", b.block_type))
        out.write(header)
        out.write(struct.pack(">q", len(b.content)))
        out.write(b.content)
        out.write(footer)
        out.write(struct.pack(">q", total_len))
    with open(path, "wb") as f:
        f.write(out.getvalue())


def read_log_file(path: str) -> list[LogBlock]:
    """Decode every block of one Hudi log file. Truncated or
    mis-framed bytes raise — a silently skipped block is a silently
    wrong snapshot (Hudi's own reader marks such ranges corrupt and
    relies on rollback; a jar-less reader must not guess)."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    blocks: list[LogBlock] = []
    while buf.tell() < len(raw):
        start = buf.tell()
        magic = buf.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(
                f"{path}: bad log-block magic {magic!r} at offset {start}"
            )
        (block_len,) = struct.unpack(">q", buf.read(8))
        end = buf.tell() + block_len
        if end > len(raw):
            raise ValueError(
                f"{path}: truncated log block at offset {start} "
                f"(declares {block_len} bytes, {len(raw) - buf.tell()} left)"
            )
        (version,) = struct.unpack(">i", buf.read(4))
        if version != LOG_FORMAT_VERSION:
            raise NotImplementedError(
                f"{path}: Hudi log-format version {version} is not "
                f"supported (version {LOG_FORMAT_VERSION} only)"
            )
        (btype,) = struct.unpack(">i", buf.read(4))
        header = _decode_meta_map(buf)
        (content_len,) = struct.unpack(">q", buf.read(8))
        content = buf.read(content_len)
        if len(content) != content_len:
            raise ValueError(f"{path}: truncated block content at {start}")
        footer = _decode_meta_map(buf)
        (total_len,) = struct.unpack(">q", buf.read(8))
        if buf.tell() != end:
            raise ValueError(
                f"{path}: log block at {start} framed {block_len} bytes "
                f"but parsing consumed {buf.tell() - start - 14}"
            )
        if total_len != end - start:
            raise ValueError(
                f"{path}: trailing total-length {total_len} != actual "
                f"{end - start} for block at {start}"
            )
        blocks.append(LogBlock(btype, header, footer, content))
    return blocks


def encode_avro_data_block(records: list[dict], schema: dict) -> bytes:
    """Serialize records as an AVRO data block's content (format
    version 3: int version, int count, then per record int length +
    raw Avro datum)."""
    out = io.BytesIO()
    out.write(struct.pack(">i", _AVRO_DATA_FORMAT_VERSION))
    out.write(struct.pack(">i", len(records)))
    for rec in records:
        datum = encode_datum(schema, rec)
        out.write(struct.pack(">i", len(datum)))
        out.write(datum)
    return out.getvalue()


def decode_avro_data_block(block: LogBlock) -> tuple[dict, list[dict]]:
    """(writer schema, records) of one AVRO data block; the schema
    rides in the block's SCHEMA header."""
    import json

    if block.block_type != AVRO_DATA_BLOCK:
        raise ValueError(
            f"not an avro data block: {_BLOCK_NAMES.get(block.block_type)}"
        )
    sch_json = block.header.get(SCHEMA)
    if not sch_json:
        raise ValueError("avro data block carries no SCHEMA header")
    schema = json.loads(sch_json)
    buf = io.BytesIO(block.content)
    (fmt,) = struct.unpack(">i", buf.read(4))
    if fmt != _AVRO_DATA_FORMAT_VERSION:
        raise NotImplementedError(
            f"Hudi avro-data-block format version {fmt} is not supported "
            f"(version {_AVRO_DATA_FORMAT_VERSION} only)"
        )
    (count,) = struct.unpack(">i", buf.read(4))
    records = []
    for _ in range(count):
        (ln,) = struct.unpack(">i", buf.read(4))
        datum = buf.read(ln)
        if len(datum) != ln:
            raise ValueError("truncated record inside avro data block")
        records.append(decode_datum(schema, datum))
    if buf.read(1):
        raise ValueError("trailing bytes inside avro data block")
    return schema, records


# HoodieDeleteRecordList.avsc (hudi-common/src/main/avro): the Avro
# shape HoodieDeleteBlock serializes since 0.12 (block version 2+).
# orderingVal's union is pinned to the Avro primitives; a foreign
# block using a wrapper-record branch decodes to a branch index past
# this list and raises loudly in decode_delete_block (never a silent
# misread: Avro unions prefix the branch INDEX, so an out-of-range
# index is structurally detectable).
_DELETE_RECORD_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecord",
    "fields": [
        {"name": "recordKey", "type": ["null", "string"], "default": None},
        {"name": "partitionPath", "type": ["null", "string"], "default": None},
        {
            "name": "orderingVal",
            "type": [
                "null", "string", "int", "long",
                "float", "double", "bytes", "boolean",
            ],
            "default": None,
        },
    ],
}
_DELETE_RECORD_LIST_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "fields": [
        {
            "name": "deleteRecordList",
            "type": {"type": "array", "items": _DELETE_RECORD_SCHEMA},
        }
    ],
}

_DELETE_BLOCK_VERSION = 2


def encode_delete_block(
    records: list[dict], version: int = _DELETE_BLOCK_VERSION
) -> bytes:
    """Serialize delete records as a DELETE block's content (version
    int, payload length int, one HoodieDeleteRecordList Avro datum).
    Records are dicts with recordKey / partitionPath / orderingVal
    (orderingVal None unless a primitive)."""
    payload = encode_datum(
        _DELETE_RECORD_LIST_SCHEMA,
        {
            "deleteRecordList": [
                {
                    "recordKey": r.get("recordKey"),
                    "partitionPath": r.get("partitionPath"),
                    "orderingVal": r.get("orderingVal"),
                }
                for r in records
            ]
        },
    )
    out = io.BytesIO()
    out.write(struct.pack(">i", version))
    out.write(struct.pack(">i", len(payload)))
    out.write(payload)
    return out.getvalue()


def decode_delete_block(block: LogBlock) -> list[dict]:
    """Delete records of one DELETE block (r16): keys to retire from
    the slice, applied in block order like data-block records — the
    same commit-time-ordering simplification the data path documents
    (a foreign EVENT_TIME_ORDERING merge with out-of-order
    orderingVals is out of scope for every block kind here, not just
    deletes). Kryo-era version 1 and non-primitive orderingVal
    branches raise loudly."""
    if block.block_type != DELETE_BLOCK:
        raise ValueError(
            f"not a delete block: {_BLOCK_NAMES.get(block.block_type)}"
        )
    buf = io.BytesIO(block.content)
    ver_raw = buf.read(4)
    if len(ver_raw) != 4:
        raise ValueError("truncated delete block (no version)")
    (version,) = struct.unpack(">i", ver_raw)
    if version < 2:
        raise NotImplementedError(
            f"Hudi delete-block version {version} serializes kryo "
            "HoodieKey[] — not decodable without the format jars; "
            "compact the table with its native engine first"
        )
    ln_raw = buf.read(4)
    if len(ln_raw) != 4:
        raise ValueError("truncated delete block (no payload length)")
    (length,) = struct.unpack(">i", ln_raw)
    payload = buf.read(length)
    if len(payload) != length:
        raise ValueError("truncated delete block payload")
    try:
        datum = decode_datum(_DELETE_RECORD_LIST_SCHEMA, payload)
    except Exception as exc:  # noqa: BLE001 — loud, actionable refusal
        raise NotImplementedError(
            f"Hudi delete-block (version {version}) payload does not "
            "decode as HoodieDeleteRecordList with primitive "
            f"orderingVal ({exc}) — a wrapper-typed orderingVal or a "
            "newer layout; compact the table with its native engine"
        ) from exc
    recs = datum.get("deleteRecordList") or []
    for r in recs:
        if r.get("recordKey") is None:
            raise ValueError("delete record carries no recordKey")
    return recs


def decode_parquet_data_block(block: LogBlock) -> list[dict]:
    """Records of one PARQUET data block (r16): the block content is a
    complete parquet file — require the PAR1 magic at BOTH ends (the
    structural check that this writer really used the parquet block
    format) and decode with pyarrow to python-native values
    (timestamps/decimals keep their parquet types; no avro conversion
    applies). Anything else raises loudly."""
    if block.block_type != PARQUET_DATA_BLOCK:
        raise ValueError(
            f"not a parquet data block: {_BLOCK_NAMES.get(block.block_type)}"
        )
    c = block.content
    if len(c) < 8 or c[:4] != b"PAR1" or c[-4:] != b"PAR1":
        raise NotImplementedError(
            "Hudi parquet-data-block content does not frame a parquet "
            "file (no PAR1 magic) — an unknown layout; compact the table "
            "with its native engine first"
        )
    import pyarrow.parquet as _pq

    return _pq.read_table(io.BytesIO(c)).to_pylist()


def visible_data_blocks(
    log_paths: list[str], completed_instants: set[str]
) -> list[LogBlock]:
    """The ORDERED, rollback-applied, committed AVRO data AND DELETE
    blocks of one file slice's log files (callers pass the slice's
    logs sorted by log version):

    - blocks whose INSTANT_TIME is not a completed instant are
      invisible (an in-flight or failed delta commit — exactly how
      Hudi keeps log appends atomic);
    - a committed COMMAND (rollback) block neutralizes every EARLIER
      block whose instant equals its TARGET_INSTANT_TIME;
    - DELETE and PARQUET-data blocks pass through in order (r16) —
      the consumer decodes them via ``decode_delete_block`` /
      ``decode_parquet_data_block``;
    - unsupported block kinds (hfile / cdc) raise loudly UNLESS a
      later rollback already neutralized them.
    """
    seen: list[LogBlock] = []
    for path in log_paths:
        for b in read_log_file(path):
            inst = b.instant_time
            if inst is None:
                raise ValueError(f"{path}: log block carries no INSTANT_TIME")
            if b.block_type == COMMAND_BLOCK:
                if inst not in completed_instants:
                    continue
                target = b.target_instant_time
                if not target:
                    raise ValueError(
                        f"{path}: command block carries no TARGET_INSTANT_TIME"
                    )
                seen = [x for x in seen if x.instant_time != target]
                continue
            if b.block_type == CORRUPT_BLOCK:
                continue  # already quarantined by a writer
            seen.append(b)
    out: list[LogBlock] = []
    for b in [x for x in seen if x.instant_time in completed_instants]:
        if b.block_type not in (
            AVRO_DATA_BLOCK, DELETE_BLOCK, PARQUET_DATA_BLOCK
        ):
            raise NotImplementedError(
                f"Hudi {_BLOCK_NAMES.get(b.block_type, b.block_type)} log "
                "blocks are not supported by the pure-Python reader (its "
                "payload is engine-serialized and cannot be decoded "
                "faithfully without the format jars) — compact the table "
                "with its native engine first"
            )
        out.append(b)
    return out


# File-slice log naming: `.<fileId>_<baseInstant>.log.<version>_<writeToken>`
# (hidden files beside the base parquet).
LOG_FILE_RE = re.compile(
    r"^\.(?P<fid>.+)_(?P<base>\d+)\.log\.(?P<ver>\d+)(?:_(?P<tok>.+))?$"
)


def slice_log_files(
    dir_path: str, fid: str, base_instant: str
) -> list[str]:
    """This file slice's log files in apply order (log version, then
    write token): logs attach to the slice whose BASE instant they
    name."""
    out = []
    if not os.path.isdir(dir_path):
        return out
    for fname in os.listdir(dir_path):
        m = LOG_FILE_RE.match(fname)
        if not m:
            continue
        if m.group("fid") != fid or m.group("base") != base_instant:
            continue
        out.append((int(m.group("ver")), m.group("tok") or "", fname))
    return [os.path.join(dir_path, f) for _v, _t, f in sorted(out)]
