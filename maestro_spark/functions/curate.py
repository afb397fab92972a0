"""End-to-end training-data curation: the composition a 100 TB document
pipeline actually runs, built entirely from the engine's own operators.

    quality gate  →  exact dedup  →  near-dup clustering  →  canonical keep

Every stage is JVM-side expression code or a keyed shuffle the optimizer
already handles; the near-dup stage is the document-frequency-capped
Jaccard verifier (structurally bounded — see dedup_text.jaccard_pairs) and
the cluster stage is min-label connected components (O(log diameter)
rounds). At real scale the Jaccard verifier's candidate set would come
from minhash_lsh_pairs first; the exact form keeps the whole pipeline
DuckDB-oracle-able, which is how the driver checks it end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maestro_spark.functions.dedup_text import (
    canonical_docs,
    dedup_exact,
    jaccard_pairs,
)
from maestro_spark.functions.text import token_count


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    threshold_num: int = 1,
    threshold_den: int = 5,
    n: int = 5,
    max_chars: int = 120,
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """Curated documents: drop low-quality rows (token count below
    ``min_tokens``), collapse exact duplicates to the min-id row, cluster
    near-duplicates (n-gram Jaccard ≥ num/den), and keep one canonical
    representative per cluster. Returns the surviving rows of ``df`` with
    their ``group_id`` (= own id for singleton groups)."""
    quality = df.filter(token_count(F.col(text_col)) >= min_tokens)
    uniq = dedup_exact(quality, text_col=text_col, id_col=id_col)
    pairs = jaccard_pairs(
        uniq,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        text_col=text_col,
        id_col=id_col,
        n=n,
        max_chars=max_chars,
        max_doc_freq=max_doc_freq,
    )
    return canonical_docs(uniq, pairs.select("id_a", "id_b"), id_col=id_col).filter(
        F.col("is_canonical")
    )
