"""The repo's core integrity primitive, shared: order-free verification
checksums are built by summing the first-8-hex-chars of md5 as an
unsigned 32-bit value per row (BIGINT-safe up to ~2^31 rows per group),
so any multiset of rows is hash-verifiable without sorting, collecting,
or a global shuffle — the discipline every codec/export/violation audit
in this engine uses.  DuckDB twin expression:
``CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def u32(col: Column) -> Column:
    """First 8 md5 hex chars of ``col`` as an unsigned-32-bit BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
