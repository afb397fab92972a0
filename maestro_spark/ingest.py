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


def copy_into(
    table,
    src: str,
    fileformat: str,
    query_id: str = "copy",
    **options,
) -> dict:
    """Idempotent bulk file load (Databricks ``COPY INTO`` parity, CDC-
    adapted): load every data file under ``src`` (a directory or glob) into
    the lake table EXACTLY ONCE per file, as upserts at a fresh LSN.

    File-level exactly-once with ZERO new state: each file loads as its own
    merge epoch whose key is derived from the file's name+size fingerprint,
    and the loaded set is recovered from the snapshot chain's own committed
    epoch keys — the same authoritative index every other writer uses, so a
    crash anywhere (including between commit and ledger record) can never
    double-load or lose a file. Re-running after new files arrive loads
    only the new files.

    ``fileformat``: ``csv`` / ``json`` / ``parquet``. CSV/JSON decode typed
    against the table's payload schema with the PERMISSIVE corrupt-record
    channel; corrupt rows dead-letter to the table's quarantine dir
    (``_reason='corrupt_record'``, same layout/repair flow as the merge
    DLQ) instead of poisoning the table. Parquet reads schema-projected
    (missing columns null, extra columns ignored).

    Scale: per-file epochs mean per-file commits — the right unit for the
    bulk-load pattern (files are large and few relative to rows); the
    delta tiers they create fold on the normal compaction cadence.
    Returns ``{files_loaded, files_skipped, rows_loaded,
    rows_quarantined, lsn}``.
    """
    import glob as _glob
    import hashlib

    from maestro_spark.dml import max_live_lsn
    from maestro_spark.merge import merge_batch

    fmt = fileformat.lower()
    if fmt not in ("csv", "json", "parquet"):
        raise ValueError(f"COPY INTO fileformat {fileformat!r} — accepted: "
                         "csv, json, parquet")
    if os.path.isfile(src):
        pattern = src
    elif any(ch in src for ch in "*?["):
        pattern = src
    else:
        pattern = os.path.join(src, "*")
    files = sorted(p for p in _glob.glob(pattern) if os.path.isfile(p))
    if not files:
        raise ValueError(f"COPY INTO found no files at {src!r}")
    spark = table.spark
    payload = table.snapshot().payload_schema()
    committed = table.committed_epoch_keys()
    out = {"files_loaded": 0, "files_skipped": 0, "rows_loaded": 0,
           "rows_quarantined": 0, "lsn": None}
    for path in files:
        tag = f"{os.path.basename(path)}:{os.path.getsize(path)}"
        fid = int.from_bytes(
            hashlib.md5(tag.encode()).digest()[:6], "big"
        )  # 48-bit epoch id; the key below is what must be unique
        if f"{query_id}:{fid}" in committed:
            out["files_skipped"] += 1
            continue
        if fmt == "parquet":
            df = spark.read.schema(payload).parquet(path)
            valid, corrupt = df, None
        else:
            if fmt == "csv":
                # CSV is POSITIONAL: reading a column-subset file against
                # the full table schema would mark every row corrupt
                # (header length != schema size). Type the file by its OWN
                # header, validated against the table; absent columns fill
                # as nulls through the merge's normal schema conform.
                import csv as _csv

                with open(path, newline="") as fh:
                    header = next(_csv.reader(
                        [fh.readline()], delimiter=options.get("sep", ",")
                    ))
                by_name = {f.name: f for f in payload.fields}
                unknown = [h for h in header if h not in by_name]
                if unknown:
                    raise ValueError(
                        f"COPY INTO file {os.path.basename(path)!r} has "
                        f"column(s) {unknown} not in the table schema — "
                        "ALTER TABLE … ADD COLUMN first, or fix the header"
                    )
                file_schema = T.StructType([by_name[h] for h in header])
                df = read_csv_typed(spark, path, file_schema, **options)
            else:
                # JSON is name-based: absent fields are null, not corrupt
                df = read_json_typed(spark, path, payload, **options)
            # checkpoint: Spark refuses corrupt-column-only queries on raw
            # CSV/JSON scans (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the
            # split below reads the parse twice anyway
            df = df.localCheckpoint(eager=True)
            valid = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
            corrupt = df.filter(F.col("_corrupt").isNotNull())
        if corrupt is not None:
            qdir = os.path.join(table.root, "_quarantine", query_id,
                                f"epoch={fid}")
            n_bad = corrupt.count()
            if n_bad:
                # same layout + overwrite-per-epoch contract as the merge
                # DLQ, so read_quarantine/repair work unchanged
                (corrupt.withColumn("_reason", F.lit("corrupt_record"))
                 .write.mode("overwrite").parquet(qdir))
                out["rows_quarantined"] += n_bad
        lsn = max_live_lsn(table) + 1
        events = valid.withColumn("op", F.lit("upsert")).withColumn(
            "op_lsn", F.lit(lsn).cast("long")
        )
        snap = merge_batch(
            table, events, query_id=query_id, epoch_id=fid,
            offsets={"file": tag},
        )
        if snap is None:  # raced another loader to this very file
            out["files_skipped"] += 1
            continue
        out["files_loaded"] += 1
        out["rows_loaded"] += snap.stats.get("rows_in") or 0
        out["lsn"] = lsn
    return out
