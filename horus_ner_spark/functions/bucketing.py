"""Term-bucket hashing — identical on the JVM and in Python.

The postings and term_stats tables are partitioned by
``pbucket = pmod(crc32(utf8(term)), N)`` (the Spark-native analog of the
reference's B-tree term index, reference: horus0.1.5.db.sql:128-139).
CRC32 is used instead of xxhash64 deliberately: the low-latency serving
path (index/serve.py) must compute the same bucket DRIVER-side with no JVM,
and ``zlib.crc32`` is bit-identical to Spark's ``crc32`` expression
(parity asserted in tests/test_serve.py over a randomized vocabulary).
Distribution quality of CRC32 over short term strings is ample for a
32-way directory split.
"""

from __future__ import annotations

import zlib


def term_bucket(term: str, n_buckets: int) -> int:
    """Python-side ``pmod(crc32(encode(term,'UTF-8')), n_buckets)``."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(term_col: str, n_buckets: int):
    """Spark-side column expression for the same bucket id (long)."""
    from pyspark.sql import functions as F

    return F.pmod(
        F.crc32(F.encode(F.col(term_col), "UTF-8")).cast("long"),
        F.lit(n_buckets),
    )
