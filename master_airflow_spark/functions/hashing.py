"""Engine-portable deterministic hashing.

``xxhash64``/``hash`` are Spark-private algorithms, so any operator
whose *output values* are judged (fingerprints, minhashes) can't use
them against a DuckDB oracle. The portable alternative: md5 of the
value, keep 15 hex chars (60 bits — fits int64 with sign headroom),
parse as an integer. Both engines parse identically:
Spark ``conv(substr(md5(x),1,15),16,10)`` == DuckDB
``('0x' || substr(md5(x),1,15))::BIGINT``.

md5 is ~3× slower than xxhash64 per call but stays JVM-side inside
whole-stage codegen — still scan-speed at 100 TB. Operators whose
outputs are only *compared internally* (LSH banding, shuffle salting)
keep xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(col: Column | str) -> Column:
    """Deterministic 60-bit non-negative hash, identical in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_portable_hash60(expr: str) -> str:
    """DuckDB fragment equal to ``portable_hash60`` bit-for-bit."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
