"""Z-order (Morton) clustering math, shared by the managed table's
``OPTIMIZE ZORDER`` (`parquet_cow.ParquetCowTable`) and the foreign-path
rewrites (`interop.zorder_delta`/`zorder_iceberg`) — one implementation
of the quantize-and-interleave expression, no engine drift.

Reference analogue: Delta's ``OPTIMIZE ... ZORDER BY`` and Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``
maintenance — the multi-dimensional clustering that makes min/max file
skipping work on more than one column at once."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_numeric(df: DataFrame, c: str, ident: str):
    """Order-preserving DOUBLE view of a z-order column. Temporal
    types map to epoch numerics (date → days since 1970-01-01,
    timestamp → epoch seconds) so the canonical 100-TB layout —
    ``ZORDER BY (event_date, user_id)`` — quantizes like any numeric
    pair; unsupported types fail with a clear error instead of a
    ``float()`` TypeError at bounds-collect time."""
    dtype = dict(df.dtypes).get(c)
    if dtype is None:
        raise ValueError(f"{ident}: zorder column {c!r} not in table schema")
    if dtype == "date":
        return F.datediff(F.col(c), F.to_date(F.lit("1970-01-01"))).cast("double")
    if dtype.startswith("timestamp"):
        return F.col(c).cast("double")
    if dtype == "boolean":
        return F.col(c).cast("int").cast("double")
    if dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or (
        dtype.startswith("decimal")
    ):
        return F.col(c).cast("double")
    raise TypeError(
        f"{ident}: cannot zorder by {c!r} of type {dtype}; "
        "supported: numeric, boolean, date, timestamp"
    )


def zorder_value(df: DataFrame, cols: list[str], ident: str, bits: int = 10):
    """Z-value (Morton code) expression: each column min-max normalizes
    to a ``bits``-bit integer (bounds from one tiny driver-side agg —
    the sampling pass Delta's OPTIMIZE ZORDER also pays), then the bit
    planes interleave. Rows close in z are close in EVERY clustered
    dimension, so range-partitioning by z gives each output file a
    tight min/max box on all columns at once — what makes multi-column
    stats skipping work. Plain shift/or arithmetic: whole-stage
    codegen, no HOFs. Null values (and all-null/empty columns)
    quantize to bucket 0, so they cluster together instead of
    scattering a null z across files."""
    nums = {c: zorder_numeric(df, c, ident) for c in cols}
    bounds = df.agg(
        *[F.min(nums[c]).alias(f"__mn_{c}") for c in cols],
        *[F.max(nums[c]).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    scale = (1 << bits) - 1
    quantized = []
    for c in cols:
        mn_v, mx_v = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
        if mn_v is None or mx_v is None:  # empty table / all-null column
            quantized.append(F.lit(0).cast("long"))
            continue
        mn = float(mn_v)
        span = float(mx_v) - mn
        q = (((nums[c] - F.lit(mn)) / F.lit(span or 1.0)) * F.lit(float(scale))).cast(
            "long"
        )
        quantized.append(
            F.coalesce(F.greatest(F.lit(0), F.least(F.lit(scale), q)), F.lit(0))
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z
