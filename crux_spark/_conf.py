"""Small config/size helpers shared by the scale-adaptive operators.

Spark size configs ("128m", "64MB", "1g", plain bytes) need a real
parser: ``int(raw.rstrip('b'))`` silently fails on any unit-suffixed
value (r15 advice — the failure disabled the skip-repartition
optimization under human-readable configs). ``input_size_bytes`` sizes
a path through the Hadoop FileSystem API so it works on any Hadoop-
supported store (HDFS, S3A, local), not just the driver's local disk.
"""

from __future__ import annotations

import re

_SIZE_RE = re.compile(r"\s*(\d+)\s*([kmgtp]?)b?\s*", re.IGNORECASE)
_SHIFTS = {"": 0, "k": 10, "m": 20, "g": 30, "t": 40, "p": 50}


def parse_byte_size(raw, default: int) -> int:
    """Spark-style size string -> bytes; ``default`` on any mismatch."""
    if raw is None:
        return default
    m = _SIZE_RE.fullmatch(str(raw))
    if not m:
        return default
    return int(m.group(1)) << _SHIFTS[m.group(2).lower()]


def input_size_bytes(spark, path: str) -> int:
    """Total bytes under ``path`` via the JVM Hadoop FileSystem (cluster-
    safe: resolves the path's own scheme — file://, hdfs://, s3a://...).
    Falls back to a local os.walk, then 0 (callers floor their sizing at
    the source split count, so 0 only loses the bytes-proportional term).
    """
    try:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        fs = jpath.getFileSystem(conf)
        return int(fs.getContentSummary(jpath).getLength())
    except Exception:
        pass
    try:
        import os

        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs_ in os.walk(path)
            for f in fs_
        )
    except OSError:
        return 0
