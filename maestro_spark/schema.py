"""Declared schemas — the engine's "well-typed" contract (SURVEY.md §1).

Every schema is an explicit StructType, never inferred (the PySpark-idiomatic
substitute for the reference's compile-time-typed pipeline stages). Column
types follow the authoritative input hint (BASELINE.json:15):
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp``.

Schema evolution (SURVEY §2.K6) is add-only + safe widening; helpers here
compute the merged schema and project a DataFrame onto it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- transcript payload (the lake table's user-visible columns) -------------
TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampNTZType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

# --- change event = op metadata + payload (FIXTURES.md A1) -------------------
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op_lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # insert | update | delete
        *TRANSCRIPT_FIELDS,
    ]
)

# evolution columns (FIXTURES.md A3): added tool/metadata columns
TOOL_CALLS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType(), True),
            T.StructField("args", T.StringType(), True),
        ]
    )
)
METADATA_TYPE = T.MapType(T.StringType(), T.StringType())

CHANGE_EVENT_SCHEMA_V2 = T.StructType(
    [*CHANGE_EVENT_SCHEMA.fields,
     T.StructField("tool_calls", TOOL_CALLS_TYPE, True),
     T.StructField("metadata", METADATA_TYPE, True)]
)

# internal lake columns (never user-visible; filtered by snapshot reads)
LSN_COL = "_lsn"          # max LSN applied to this key — cross-epoch ordering
DELETED_COL = "_deleted"  # tombstone: deletes are remembered, not erased
INTERNAL_FIELDS = [
    T.StructField(LSN_COL, T.LongType(), False),
    T.StructField(DELETED_COL, T.BooleanType(), False),
]

KEY_COLS = ["conv_id", "turn_idx"]
OP_COLS = ["op_lsn", "op"]

# safe widenings for schema evolution (from -> allowed to)
_WIDENINGS: dict[str, set[str]] = {
    "integer": {"long", "double", "decimal"},
    "long": {"double", "decimal"},
    "float": {"double"},
    "date": {"timestamp", "timestamp_ntz"},
}


def payload_cols(schema: T.StructType) -> list[str]:
    """User-payload column names of an event/table schema (no op/internal)."""
    skip = set(OP_COLS) | {LSN_COL, DELETED_COL}
    return [f.name for f in schema.fields if f.name not in skip]


# --- logical -> physical column names (metadata-only RENAME/DROP, M41) -------
# The engine's files are plain name-addressed parquet (no Iceberg field-ids),
# so a metadata-only rename records the column's stable ON-DISK name in the
# StructField's metadata under this key. Every scan reads files under the
# PHYSICAL schema and surfaces the snapshot's LOGICAL names; the single write
# chokepoint (LakeTable.write_bucket_files) renames logical -> physical, so
# all files of a table — pre- and post-rename — carry identical physical
# names and any snapshot's schema is self-sufficient for reading any era's
# files. A field without the key is physical under its own name.
PHYSICAL_KEY = "physical"


def physical_name(f: T.StructField) -> str:
    """The on-disk parquet column name of a field (== logical name unless a
    metadata-only rename recorded a mapping)."""
    md = f.metadata or {}
    return md.get(PHYSICAL_KEY, f.name)


def physical_schema(schema: T.StructType) -> T.StructType:
    """The schema as it appears inside data files (physical names)."""
    return T.StructType(
        [T.StructField(physical_name(f), f.dataType, f.nullable) for f in schema.fields]
    )


def column_map(schema: T.StructType) -> dict[str, str]:
    """logical -> physical, only where they differ (empty for most tables)."""
    return {
        f.name: physical_name(f)
        for f in schema.fields
        if physical_name(f) != f.name
    }


def physical_names(schema: T.StructType) -> set[str]:
    return {physical_name(f) for f in schema.fields}


def assign_physical(
    schema: T.StructType, parent: T.StructType, dropped: list[str]
) -> T.StructType:
    """Give every NEW field (not in ``parent`` by logical name) whose name
    collides with an occupied or retired physical name a fresh physical
    alias (``<name>__p<k>``) — so e.g. an upstream that re-sends a column
    under its pre-rename name, or a re-add after a masked DROP, evolves in a
    genuinely fresh column instead of decoding another column's stale bytes
    out of old files."""
    parent_names = {f.name for f in parent.fields}
    reserved = physical_names(parent) | set(dropped)
    used = set(reserved) | physical_names(schema)
    out = []
    for f in schema.fields:
        if (
            f.name not in parent_names
            and physical_name(f) == f.name
            and f.name in reserved
        ):
            k = 1
            while f"{f.name}__p{k}" in used:
                k += 1
            p = f"{f.name}__p{k}"
            used.add(p)
            out.append(
                T.StructField(
                    f.name, f.dataType, f.nullable,
                    {**(f.metadata or {}), PHYSICAL_KEY: p},
                )
            )
        else:
            out.append(f)
    return T.StructType(out)


def merge_schemas(table: T.StructType, batch: T.StructType) -> T.StructType:
    """Add-only + safe-widening schema union (SURVEY §2.K6, G1).

    New columns from ``batch`` are appended (nullable). A type change is only
    accepted if it is a safe widening; anything else raises — the engine never
    silently corrupts a column.
    """
    by_name = {f.name: f for f in table.fields}
    out = list(table.fields)
    for f in batch.fields:
        cur = by_name.get(f.name)
        if cur is None:
            # keep the incoming field's metadata: a freshly assigned
            # logical->physical alias (assign_physical) must survive here
            out.append(T.StructField(f.name, f.dataType, True, f.metadata))
        elif cur.dataType != f.dataType:
            frm, to = cur.dataType.typeName(), f.dataType.typeName()
            if to in _WIDENINGS.get(frm, set()):
                # widen in place, PRESERVING the field's metadata (the
                # logical->physical mapping must survive schema evolution)
                out[out.index(cur)] = T.StructField(
                    f.name, f.dataType, True, cur.metadata
                )
            elif frm in _WIDENINGS.get(to, set()):
                pass  # batch is narrower; table type already covers it
            else:
                raise TypeError(
                    f"incompatible schema evolution for column {f.name!r}: "
                    f"{cur.dataType.simpleString()} -> {f.dataType.simpleString()}"
                )
    return T.StructType(out)


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: missing columns become typed nulls,
    present columns are cast (safe widening only — callers validate via
    :func:`merge_schemas` first). Column order follows ``schema``.
    """
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            c = F.col(f.name)
            if have[f.name].dataType != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def conform_arrow_table(t, arrow_schema):
    """Arrow-level twin of :func:`conform`: project a pyarrow Table onto a
    target Arrow schema — missing columns null-filled, compatible types
    cast, column order fixed. Used by executor-side readers (the streaming
    source and the MOR scan) where rows exist as Arrow batches, not Spark
    rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = []
    for f in arrow_schema:
        if f.name in t.column_names:
            col = t[f.name]
            if col.type != f.type:
                col = pc.cast(col, f.type)
        else:
            col = pa.nulls(len(t), type=f.type)
        cols.append(col)
    return pa.table(cols, schema=arrow_schema)
