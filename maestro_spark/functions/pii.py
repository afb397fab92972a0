"""PII redaction for training-data pipelines (SURVEY §2.L).

Masks the high-frequency machine-recognizable PII families — email
addresses, North-American phone numbers, SSN-shaped ids, IPv4 addresses,
16-digit card-shaped numbers — with typed placeholder tokens, as a chain
of ``regexp_replace`` expressions.

Scale posture: pure JVM-side expression code — the whole chain runs inside
the parquet scan stage under whole-stage codegen, zero shuffle and zero
Python, so at 100 TB redaction is exactly as cheap as reading the text
column. Patterns stay in the regex subset Java's engine and RE2 share
(no lookaround, no backreferences) so the DuckDB oracle replays them
byte-for-byte (DuckDB needs the 'g' flag to match Spark's replace-all).

Pattern-order invariant: card (4-4-4-4) before phone (3-3-4) before
SSN (3-2-4) — longer digit shapes first, so a card number is never
half-eaten by the phone pattern. A redaction placeholder contains no
digits, so later patterns cannot re-match inside an earlier replacement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) — order matters; see module docstring
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CARD>"),
    (r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(text: Column) -> Column:
    """Replace every occurrence of each PII family with its placeholder."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_oracle_exprs(col_sql: str) -> str:
    """The identical chain as DuckDB SQL (regexp_replace with the 'g'
    flag — DuckDB replaces only the first match by default, Spark all)."""
    expr = col_sql
    for pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr
