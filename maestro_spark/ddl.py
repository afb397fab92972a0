"""ALTER TABLE surface: add / rename / drop payload columns (M41).

Design note — why rename/drop REWRITE instead of metadata-only: Iceberg
does metadata-only renames/drops via field-ids baked into every data
file; this engine's files are plain name-addressed parquet (SURVEY §1.3's
forced deviation), so a mapping-only rename would leave every scan path
(JVM reads, the mor_scan Arrow DataSource, zone maps, the change feed,
foreign engines reading exports) needing per-file name translation, and a
metadata-only drop would leave stale physical data that silently corrupts
a later re-add of the same name at a different type. The engine chooses
correctness: ``add_column`` is a metadata-only commit (absent columns read
as typed nulls everywhere — the same mechanism as schema evolution), while
``rename_column`` / ``drop_column`` run one compaction-shaped copy-on-write
rewrite (single exchange, tombstones and ``_lsn`` preserved, zone maps +
blooms re-harvested for the new layout) and publish the new schema with
the rewrite. At 10^10 events that is one maintenance job — the same cost
class as a rebucket, and strictly cheaper than the corruption class it
prevents.

Interplay (tested):
- tombstones survive a rewrite, so late re-deliveries of deleted keys
  stay dead across a rename;
- epoch idempotence keys are carried by the snapshot chain + ledger, so
  re-replaying an already-applied log after an ALTER is still a no-op;
- the change feed skips the content-preserving rewrite itself, but a
  ``changes()`` range SPANNING a rename refuses (pre-rename files cannot
  be read under the post-rename schema) — consumers re-sync, the same
  contract as rollback. Drops and adds feed through fine.
- a post-rename event batch still carrying the OLD upstream name simply
  schema-evolves it back as a fresh column — that is the CDC-correct
  reading of "the upstream renamed a field" (the binlog says nothing;
  only ALTER states intent).
"""

from __future__ import annotations

import time

from pyspark.sql import types as T

from maestro_spark import schema as S
from maestro_spark.lake import LakeTable, Snapshot, bucket_expr


_PROTECTED = set(S.KEY_COLS) | {S.LSN_COL, S.DELETED_COL}


def _payload_names(snap) -> set[str]:
    return {f.name for f in snap.payload_schema().fields}


def add_column(table: LakeTable, name: str, dtype: T.DataType | str) -> Snapshot:
    """Metadata-only ADD COLUMN: publishes the evolved schema; every
    existing row reads the column as a typed null (exactly like a column
    arriving via event-batch schema evolution)."""
    if isinstance(dtype, str):
        dtype = T._parse_datatype_string(dtype)
    snap = table.snapshot()
    if name in {f.name for f in snap.schema.fields}:
        raise ValueError(f"column {name!r} already exists")
    payload = T.StructType(
        [*snap.payload_schema().fields, T.StructField(name, dtype, True)]
    )
    new_schema = T.StructType([*payload.fields, *S.INTERNAL_FIELDS])
    return table.commit(
        {},
        epoch_key=None,
        schema=new_schema,
        stats={"maintenance": "alter", "alter": {"add": [name, dtype.simpleString()]}},
        base=snap.snapshot_id,
    )


def _rewrite(table: LakeTable, transform, new_schema: T.StructType, alter: dict) -> Snapshot:
    """One compaction-shaped COW rewrite publishing ``new_schema``:
    read_resolved (tombstones + ``_lsn`` ride along) → transform →
    write_bucket_files (zone maps/blooms re-harvested) → commit with the
    planning snapshot as base (racing deltas conflict, not vanish)."""
    t0 = time.time()
    snap = table.snapshot()
    df = transform(table.read_resolved())
    df = df.withColumn("pk_bucket", bucket_expr("conv_id", snap.n_buckets))
    new_files = table.write_bucket_files(df.repartition("pk_bucket"))
    for b in snap.files:
        new_files.setdefault(b, [])
    return table.commit(
        new_files,
        epoch_key=None,
        schema=new_schema,
        stats={
            "maintenance": "alter",
            "alter": alter,
            "alter_s": round(time.time() - t0, 3),
        },
        base=snap.snapshot_id,
        replace_schema=True,
    )


def rename_column(table: LakeTable, old: str, new: str) -> Snapshot:
    """RENAME COLUMN via one COW rewrite (see module docstring for why).
    Content is bit-identical modulo the name; keys/internals protected."""
    snap = table.snapshot()
    if old in _PROTECTED:
        raise ValueError(f"cannot rename key/internal column {old!r}")
    if old not in _payload_names(snap):
        raise ValueError(f"no payload column {old!r}")
    if new in {f.name for f in snap.schema.fields}:
        raise ValueError(f"column {new!r} already exists")
    payload = T.StructType(
        [
            T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
            for f in snap.payload_schema().fields
        ]
    )
    new_schema = T.StructType([*payload.fields, *S.INTERNAL_FIELDS])
    return _rewrite(
        table,
        lambda df: df.withColumnRenamed(old, new),
        new_schema,
        {"rename": [old, new]},
    )


def drop_column(table: LakeTable, name: str) -> Snapshot:
    """DROP COLUMN via one COW rewrite: the physical data is GONE after
    the commit (and erased from disk once pre-drop snapshots expire and
    vacuum runs — the RTBF-grade guarantee a metadata-only drop cannot
    give), so re-adding the name later at any type is always safe."""
    snap = table.snapshot()
    if name in _PROTECTED:
        raise ValueError(f"cannot drop key/internal column {name!r}")
    if name not in _payload_names(snap):
        raise ValueError(f"no payload column {name!r}")
    payload = T.StructType(
        [f for f in snap.payload_schema().fields if f.name != name]
    )
    new_schema = T.StructType([*payload.fields, *S.INTERNAL_FIELDS])
    return _rewrite(
        table, lambda df: df.drop(name), new_schema, {"drop": [name]}
    )


def widen_column(table: LakeTable, name: str, new_type: T.DataType | str) -> Snapshot:
    """Metadata-only WIDEN COLUMN (int→long, long→double, float→double,
    date→timestamp — the engine's safe-widening set): publishes the wider
    schema; existing narrow files read through Spark's parquet upcast, the
    same mechanism event-driven widening already relies on. Anything not a
    safe widening raises (via schema.merge_schemas)."""
    if isinstance(new_type, str):
        new_type = T._parse_datatype_string(new_type)
    snap = table.snapshot()
    if name in _PROTECTED:
        raise ValueError(f"cannot widen key/internal column {name!r}")
    if name not in _payload_names(snap):
        raise ValueError(f"no payload column {name!r}")
    proposed = T.StructType(
        [
            T.StructField(name, new_type, True)
            if f.name == name
            else f
            for f in snap.payload_schema().fields
        ]
    )
    widened = S.merge_schemas(
        snap.schema, T.StructType([*proposed.fields, *S.INTERNAL_FIELDS])
    )
    got = {f.name: f.dataType for f in widened.fields}[name]
    if got != new_type:
        raise TypeError(
            f"{name!r} would stay {got.simpleString()} — widen must move the "
            "type (already wider, or not a safe widening)"
        )
    return table.commit(
        {},
        epoch_key=None,
        schema=widened,
        stats={
            "maintenance": "alter",
            "alter": {"widen": [name, new_type.simpleString()]},
        },
        base=snap.snapshot_id,
    )
