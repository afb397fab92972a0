"""Vectorized UDF surface (SURVEY §2.J).

Rule (BASELINE.json:15): all row transforms are Arrow/pandas-vectorized —
row-at-a-time ``spark.udf.register``/``F.udf`` Python UDFs are banned from
the engine (enforced by tests/test_no_rowwise_udf.py). These are the only
Python-side compute kernels; everything else is JVM expression code.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.LongType())
def text_checksum_agg(texts: pd.Series) -> int:
    """Grouped-agg pandas UDF (D9): order-independent 63-bit checksum of a
    group's texts — sum of md5-prefix ints mod 2^63. Arrow-batched; the
    per-group python cost is one hashlib loop over strings."""
    total = 0
    for t in texts:
        if t is not None:
            total += int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
    return total % (1 << 63)


@pandas_udf(T.StringType())
def normalize_text(texts: pd.Series) -> pd.Series:
    """Scalar pandas UDF: canonicalize text for equality hashing (NFC-ish:
    strip + whitespace collapse via vectorized pandas str ops)."""
    return texts.str.strip().str.replace(r"\s+", " ", regex=True)


def assert_vectorized_only(module_paths: list[str]) -> list[str]:
    """Grep-style guard used by tests: returns offending lines that register
    row-wise Python UDFs inside the engine source."""
    bad: list[str] = []
    for p in module_paths:
        if p.replace("\\", "/").endswith("maestro_spark/udf.py"):
            continue  # this file names the banned patterns in its own docstring
        with open(p) as fh:
            for i, line in enumerate(fh, 1):
                s = line.split("#", 1)[0]
                if "udf.register" in s or "F.udf(" in s or "functions.udf(" in s:
                    bad.append(f"{p}:{i}: {line.strip()}")
    return bad


__all__ = ["text_checksum_agg", "normalize_text", "assert_vectorized_only", "F"]
