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


CSV_DEMO_PATH = "/tmp/maestro_csv_demo/events.csv"


def csv_ingest_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-check demo: materialize a deterministic synthetic CSV (seeded
    arithmetic rows + two planted corrupt rows — independent of sf_dir, so a
    static DuckDB oracle can read the very same file), ingest it typed, and
    return per-channel counts + a value checksum."""
    csv_path = CSV_DEMO_PATH
    if not os.path.exists(csv_path):
        os.makedirs(os.path.dirname(csv_path), exist_ok=True)
        kinds = ["click", "view", "purchase", "signup"]
        with open(csv_path + ".tmp", "w") as fh:
            fh.write("event_id,user_id,event_type,value\n")
            for i in range(2000):
                fh.write(f"{i},{(i * 7) % 500},{kinds[i % 4]},{i * 0.5:.2f}\n")
            fh.write("oops,not_a_number,click,abc\n")  # planted corrupt rows
            fh.write("123,456,purchase,not_a_double\n")
        os.replace(csv_path + ".tmp", csv_path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    raw = read_csv_typed(spark, csv_path, schema)
    # the predicate references EVERY typed column: Spark's CSV parser only
    # parses referenced columns (csv.parser.columnPruning), so a row whose
    # only malformed field is an unreferenced column would silently pass the
    # corrupt check — naming all columns forces the full parse the corrupt
    # channel is defined over
    good, bad = validate_split(
        raw,
        F.col("_corrupt").isNull()
        & F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull(),
    )
    return good.agg(
        F.count(F.lit(1)).alias("n_good"),
        F.sum("event_id").alias("id_checksum"),
    ).crossJoin(bad.agg(F.count(F.lit(1)).alias("n_bad")))


def read_json_typed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt",
    **options,
) -> DataFrame:
    """JSON-lines scan with a declared schema; malformed rows (invalid JSON
    or unconvertible field values) fill ``corrupt_col``."""
    full = T.StructType([*schema.fields, T.StructField(corrupt_col, T.StringType(), True)])
    return spark.read.json(
        path,
        schema=full,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col,
        **options,
    )


JSON_DEMO_PATH = "/tmp/maestro_json_demo/events.jsonl"


def json_ingest_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-check demo, JSON twin of csv_ingest_demo: deterministic
    synthetic JSONL (sf-independent) with two planted corrupt rows — one
    syntactically invalid line, one type-invalid field — ingested typed,
    returning per-channel counts + a checksum the oracle can restate."""
    path = JSON_DEMO_PATH
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        kinds = ["click", "view", "purchase", "signup"]
        with open(path + ".tmp", "w") as fh:
            for i in range(2000):
                fh.write(
                    '{"event_id": %d, "user_id": %d, "event_type": "%s", "value": %.2f}\n'
                    % (i, (i * 7) % 500, kinds[i % 4], i * 0.5)
                )
            fh.write('{"event_id": 7, "user_id": 7, BROKEN\n')  # invalid JSON
            fh.write('{"event_id": 123, "user_id": 456, "event_type": "purchase", "value": "not_a_double"}\n')
        os.replace(path + ".tmp", path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    raw = read_json_typed(spark, path, schema)
    good, bad = validate_split(
        raw,
        F.col("_corrupt").isNull()
        & F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull(),
    )
    return good.agg(
        F.count(F.lit(1)).alias("n_good"),
        F.sum("event_id").alias("id_checksum"),
    ).crossJoin(bad.agg(F.count(F.lit(1)).alias("n_bad")))
