"""Typed ingest stage — the maestro `load` analogue (SURVEY §2.A4/B3/B4/B5).

Schema-enforced decode with an invalid-row side channel: rows that fail the
declared schema land in a corrupt-record column instead of poisoning the
table (PERMISSIVE mode), and rows that fail semantic validation are routed to
an error channel (ops.validate_split).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maestro_spark.ops import validate_split


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt",
    **options,
) -> DataFrame:
    """CSV scan with a declared schema; malformed rows fill ``corrupt_col``."""
    full = T.StructType([*schema.fields, T.StructField(corrupt_col, T.StringType(), True)])
    return spark.read.csv(
        path,
        schema=full,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col,
        header=True,
        **options,
    )


def csv_ingest_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-check demo (rows-only): materialize a deterministic CSV from the
    events table (with two planted corrupt rows), ingest it typed, and return
    per-channel counts + a value checksum."""
    import duckdb

    tmp = f"/tmp/maestro_csv_demo_{os.path.basename(sf_dir.rstrip('/'))}"
    csv_path = f"{tmp}/events.csv"
    if not os.path.exists(csv_path):
        os.makedirs(tmp, exist_ok=True)
        con = duckdb.connect()
        pdf = con.execute(
            f"""SELECT event_id, user_id, event_type, value
                FROM read_parquet('{sf_dir}/events.parquet')
                ORDER BY event_id LIMIT 2000"""
        ).df()
        with open(csv_path, "w") as fh:
            fh.write("event_id,user_id,event_type,value\n")
            for r in pdf.itertuples(index=False):
                fh.write(f"{r.event_id},{r.user_id},{r.event_type},{r.value}\n")
            fh.write("oops,not_a_number,click,abc\n")  # planted corrupt rows
            fh.write("123,456,purchase,not_a_double\n")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    raw = read_csv_typed(spark, csv_path, schema)
    good, bad = validate_split(raw, F.col("_corrupt").isNull() & F.col("event_id").isNotNull())
    return good.agg(
        F.count(F.lit(1)).alias("n_good"),
        F.sum("event_id").alias("id_checksum"),
    ).crossJoin(bad.agg(F.count(F.lit(1)).alias("n_bad")))
