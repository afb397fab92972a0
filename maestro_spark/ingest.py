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

from maestro_spark import schema as S
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
    per_file: bool = True,
    evolve: bool = False,
    **options,
) -> dict:
    """Idempotent bulk file load (Databricks ``COPY INTO`` parity, CDC-
    adapted): load every data file under ``src`` (a directory, glob, or
    single file) into the lake table EXACTLY ONCE per file, as upserts at
    a fresh LSN. Re-running after new files arrive loads only the new
    files.

    Two commit granularities, interoperable on the same table:

    - ``per_file=True`` (default): each file is its own merge epoch whose
      key is the file's name+size fingerprint. Per-file commits are the
      right unit when files are large and few.
    - ``per_file=False`` (batched): ALL pending files load as ONE merge
      epoch (one exchange, one commit) keyed by the pending-set hash —
      the 10k-small-files shape, where per-file commits would serialize
      the load behind 10k snapshot publishes.

    The loaded set is derived IDENTICALLY in both modes, so they fully
    interoperate on one table (a file loaded batched is skipped per-file
    and vice versa): every COPY commit persists its file tags in the
    snapshot's own stats (``copy_files``, riding the commit — authoritative
    through the crash window between commit and ledger record, even when
    the next run's pending set differs) and in the ledger's offsets (the
    durable long-horizon record that survives snapshot expiry); per-file
    epoch keys are additionally consulted for pre-upgrade tables. A commit
    that crashed before its ledger record is recognized and the ledger
    entry is backfilled, so the crash window costs nothing.

    ``fileformat``: ``csv`` / ``json`` / ``parquet`` / ``orc``. CSV types
    each file by its OWN header validated against the table
    (column-subset files fill absent columns through the merge's schema
    conform; unknown header columns refuse); JSON decodes name-based;
    parquet and ORC read schema-projected against their file footers. Corrupt rows dead-letter to the table's quarantine
    dir (``_reason='corrupt_record'``, same layout/repair flow as the
    merge DLQ) instead of poisoning the table.

    ``evolve=True`` (SQL: ``WITH (evolve = 1)``) turns unknown incoming
    columns into SCHEMA EVOLUTION instead of a refusal (Databricks
    ``mergeSchema`` parity): the new columns ride the batch into
    ``merge_batch``'s existing add-only/safe-widen schema merge, so the
    table evolves in the same commit that loads the rows — and the
    dropped/renamed-name protections apply unchanged (a re-sent retired
    name gets a fresh physical alias via ``schema.assign_physical``, never
    stale bytes). Types for the new columns: CSV/JSON pay one extra
    inference pass over that file only (files without new columns read
    exactly as before); parquet uses the file's own footer types. A new
    column whose name collides with the engine's internal/event columns
    (``op``, ``op_lsn``, ``_lsn``, ``_deleted``, ``_corrupt*``) refuses in
    every mode — those names can never be payload.

    Returns ``{files_loaded, files_skipped, rows_loaded,
    rows_quarantined, lsn}``.
    """
    import glob as _glob
    import hashlib

    from maestro_spark.dml import max_live_lsn
    from maestro_spark.ledger import Ledger
    from maestro_spark.merge import merge_batch

    fmt = fileformat.lower()
    if fmt not in ("csv", "json", "parquet", "orc"):
        raise ValueError(f"COPY INTO fileformat {fileformat!r} — accepted: "
                         "csv, json, parquet, orc")
    if os.path.isfile(src) or any(ch in src for ch in "*?["):
        pattern = src
    else:
        pattern = os.path.join(src, "*")
    files = sorted(p for p in _glob.glob(pattern) if os.path.isfile(p))
    if not files:
        raise ValueError(f"COPY INTO found no files at {src!r}")
    # fingerprint root: tags are <path relative to here>:<size>. For the
    # flat-directory case the relative path IS the basename (the original
    # tag format — existing loaded sets keep matching); for recursive
    # globs it keeps two same-named same-sized files in different
    # subdirectories from colliding into one tag (a collision would
    # silently skip the second file forever)
    if os.path.isfile(src):
        tag_root = os.path.dirname(src)
    elif any(ch in src for ch in "*?["):
        import re as _re

        tag_root = os.path.dirname(_re.split(r"[*?\[]", src)[0])
    else:
        tag_root = src
    spark = table.spark
    payload = table.snapshot().payload_schema()
    committed = table.committed_epoch_keys()

    def _fid(text: str) -> int:
        # 48-bit epoch id; the (query_id, id) KEY is what must be unique
        return int.from_bytes(hashlib.md5(text.encode()).digest()[:6], "big")

    # names that can never become payload columns via evolution: the merge
    # event columns, the internal fields, and the corrupt-record channels
    _reserved = {"op", S.LSN_COL, S.DELETED_COL, "op_lsn",
                 "_corrupt", "_corrupt_record"}

    def _check_new(path: str, new_names: list[str]) -> None:
        bad = [n for n in new_names if n in _reserved or n.startswith("_")]
        if bad:
            raise ValueError(
                f"COPY INTO file {os.path.basename(path)!r} carries "
                f"column(s) {bad} that collide with the engine's "
                "internal/event names — these can never be payload"
            )

    def _sig_and_schema(path: str):
        """``(signature, read_schema)`` for one file. Files with EQUAL
        signatures are type-compatible and share one multi-path scan —
        the batched mode's 10k-small-files shape reads them all in a
        handful of Spark jobs instead of one scan + checkpoint per file.
        The signature is driver-side metadata only (CSV header line,
        parquet footer / JSON inference only under ``evolve``)."""
        if fmt in ("parquet", "orc"):
            # both are footer-schema'd columnar formats: read
            # schema-projected against the table, evolve from the footer
            read_schema = payload
            sig: tuple = ()
            if evolve:
                known = {f.name for f in payload.fields}
                footer = getattr(spark.read, fmt)(path).schema
                extra = [f for f in footer.fields if f.name not in known]
                if extra:
                    _check_new(path, [f.name for f in extra])
                    # file's own footer types; absent payload cols read null
                    read_schema = T.StructType([*payload.fields, *extra])
                    sig = tuple((f.name, f.dataType.simpleString())
                                for f in extra)
            return (fmt, sig), read_schema
        if fmt == "csv":
            # CSV is POSITIONAL: reading a column-subset file against the
            # full table schema would mark every row corrupt (header
            # length != schema size). Type the file by its OWN header.
            import csv as _csv

            with open(path, newline="") as fh:
                header = next(_csv.reader(
                    [fh.readline()], delimiter=options.get("sep", ",")
                ))
            by_name = {f.name: f for f in payload.fields}
            unknown = [h for h in header if h not in by_name]
            if unknown and not evolve:
                raise ValueError(
                    f"COPY INTO file {os.path.basename(path)!r} has "
                    f"column(s) {unknown} not in the table schema — "
                    "ALTER TABLE … ADD COLUMN first, fix the header, or "
                    "opt into schema evolution with WITH (evolve = 1)"
                )
            if unknown:
                _check_new(path, unknown)
                # one inference pass over THIS file types the new columns;
                # merge_schemas then gates the evolution (add-only/widen)
                inferred = {
                    f.name: f.dataType
                    for f in spark.read.csv(
                        path, header=True, inferSchema=True, **options
                    ).schema.fields
                }
                by_name = {
                    **by_name,
                    **{h: T.StructField(h, inferred.get(h, T.StringType()),
                                        True) for h in unknown},
                }
            file_schema = T.StructType([by_name[h] for h in header])
            return ("csv", tuple((f.name, f.dataType.simpleString())
                                 for f in file_schema.fields)), file_schema
        # JSON is name-based: absent fields are null, not corrupt
        read_schema = payload
        sig = ()
        if evolve:
            known = {f.name for f in payload.fields}
            extra = [f for f in spark.read.json(path, **options)
                     .schema.fields if f.name not in known
                     and f.name != "_corrupt_record"]
            if extra:
                _check_new(path, [f.name for f in extra])
                read_schema = T.StructType([*payload.fields, *extra])
                sig = tuple((f.name, f.dataType.simpleString())
                            for f in extra)
        return ("json", sig), read_schema

    def _read_group(paths: list[str], read_schema: T.StructType):
        """(valid, corrupt|None) for a signature group, typed against the
        table — ONE scan over all the group's files."""
        if fmt in ("parquet", "orc"):
            reader = spark.read.schema(read_schema)
            return getattr(reader, fmt)(*paths), None
        if fmt == "csv":
            df = read_csv_typed(spark, paths, read_schema, **options)
        else:
            df = read_json_typed(spark, paths, read_schema, **options)
        # checkpoint: Spark refuses corrupt-column-only queries on raw
        # CSV/JSON scans (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the
        # split below reads the parse twice anyway
        df = df.localCheckpoint(eager=True)
        return (
            df.filter(F.col("_corrupt").isNull()).drop("_corrupt"),
            df.filter(F.col("_corrupt").isNotNull()),
        )

    def _read_one(path: str):
        """(valid, corrupt|None) for one file (per-file commit mode)."""
        _, read_schema = _sig_and_schema(path)
        return _read_group([path], read_schema)

    def _quarantine(corrupt, epoch_id: int) -> int:
        n_bad = corrupt.count() if corrupt is not None else 0
        if n_bad:
            # same layout + overwrite-per-epoch contract as the merge DLQ,
            # so read_quarantine/repair work unchanged
            qdir = os.path.join(table.root, "_quarantine", query_id,
                                f"epoch={epoch_id}")
            (corrupt.withColumn("_reason", F.lit("corrupt_record"))
             .write.mode("overwrite").parquet(qdir))
        return n_bad

    out = {"files_loaded": 0, "files_skipped": 0, "rows_loaded": 0,
           "rows_quarantined": 0, "lsn": None}
    tags = {p: f"{os.path.relpath(p, tag_root)}:{os.path.getsize(p)}"
            for p in files}

    # The loaded set, derived the same way in BOTH modes (mode interop +
    # crash safety): file tags persisted in snapshot stats by every COPY
    # commit (authoritative through the commit-vs-ledger crash window,
    # O(retained snapshots) driver JSON — the same cost class as the
    # epoch-key index every writer consults), unioned with the ledger's
    # recorded tags (durable past snapshot expiry).
    ledger = Ledger(table.root, query_id)
    ledger_tags: set[str] = set()
    for e in ledger.entries():
        offs = e.get("offsets") or {}
        ledger_tags.update(offs.get("files") or [])
        if offs.get("file"):
            ledger_tags.add(offs["file"])
    loaded: set[str] = set(ledger_tags)
    pref = f"{query_id}:"
    for sid in table.snapshot_ids():
        s = table.snapshot(sid)
        if not (s.epoch_key and s.epoch_key.startswith(pref)):
            continue
        ctags = s.stats.get("copy_files") or []
        if ctags and not set(ctags) <= ledger_tags:
            # a crash between commit and ledger record lost this load's
            # entry: backfill it so the durable record survives snapshot
            # expiry (re-recording an epoch id is idempotent)
            ledger.record(int(s.epoch_key.rsplit(":", 1)[1]),
                          s.snapshot_id, offsets={"files": sorted(ctags)})
            ledger_tags.update(ctags)
        loaded.update(ctags)

    if not per_file:
        pending = [
            p for p in files
            if tags[p] not in loaded
            and f"{query_id}:{_fid(tags[p])}" not in committed
        ]
        out["files_skipped"] = len(files) - len(pending)
        if not pending:
            return out
        batch_tags = sorted(tags[p] for p in pending)
        bid = _fid("+".join(batch_tags))
        # group type-compatible files into shared scans: N same-header CSVs
        # become ONE read + ONE checkpoint, not N
        groups: dict[tuple, list[str]] = {}
        schemas: dict[tuple, T.StructType] = {}
        for p in pending:
            sig, sch = _sig_and_schema(p)
            groups.setdefault(sig, []).append(p)
            schemas[sig] = sch
        parts = [_read_group(ps, schemas[sig]) for sig, ps in groups.items()]
        valid = parts[0][0]
        for v, _ in parts[1:]:
            valid = valid.unionByName(v, allowMissingColumns=True)
        corrupts = [c for _, c in parts if c is not None]
        if corrupts:
            allc = corrupts[0]
            for c in corrupts[1:]:
                allc = allc.unionByName(c, allowMissingColumns=True)
            out["rows_quarantined"] = _quarantine(allc, bid)
        lsn = max_live_lsn(table) + 1
        events = valid.withColumn("op", F.lit("upsert")).withColumn(
            "op_lsn", F.lit(lsn).cast("long")
        )
        snap = merge_batch(table, events, query_id=query_id, epoch_id=bid,
                           offsets={"files": batch_tags},
                           extra_stats={"copy_files": batch_tags})
        if snap is None:
            # a racing loader committed this very pending set mid-run; its
            # copy_files stats make the next run's derivation (which also
            # backfills any lost ledger entry) skip these files
            out["files_skipped"] += len(pending)
            return out
        out["files_loaded"] = len(pending)
        out["rows_loaded"] = snap.stats.get("rows_in") or 0
        out["lsn"] = lsn
        return out

    for path in files:
        tag = tags[path]
        fid = _fid(tag)
        if tag in loaded or f"{query_id}:{fid}" in committed:
            out["files_skipped"] += 1
            continue
        valid, corrupt = _read_one(path)
        out["rows_quarantined"] += _quarantine(corrupt, fid)
        lsn = max_live_lsn(table) + 1
        events = valid.withColumn("op", F.lit("upsert")).withColumn(
            "op_lsn", F.lit(lsn).cast("long")
        )
        snap = merge_batch(
            table, events, query_id=query_id, epoch_id=fid,
            offsets={"file": tag}, extra_stats={"copy_files": [tag]},
        )
        if snap is None:  # raced another loader to this very file
            out["files_skipped"] += 1
            continue
        out["files_loaded"] += 1
        out["rows_loaded"] += snap.stats.get("rows_in") or 0
        out["lsn"] = lsn
    return out
