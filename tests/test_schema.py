"""Schema-merge properties (SURVEY §2.K6) — pure Python, Hypothesis-driven."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from maestro_spark.schema import TRANSCRIPT_SCHEMA, merge_schemas

_TYPES = [
    T.StringType(), T.IntegerType(), T.LongType(), T.DoubleType(),
    T.BooleanType(), T.TimestampNTZType(),
]


def _schema(names_types: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in names_types])


names = st.text(alphabet="abcdef_", min_size=1, max_size=6)
fields = st.lists(
    st.tuples(names, st.sampled_from(_TYPES)), min_size=0, max_size=6,
    unique_by=lambda nt: nt[0],
)


@settings(max_examples=200, deadline=None)
@given(fields, fields)
def test_merge_is_superset_and_idempotent(a, b):
    sa, sb = _schema(a), _schema(b)
    try:
        m = merge_schemas(sa, sb)
    except TypeError:
        return  # incompatible pair — rejection is the contract
    # every table column survives with same-or-wider type; every batch column present
    names_m = {f.name for f in m.fields}
    assert {f.name for f in sa.fields} <= names_m
    assert {f.name for f in sb.fields} <= names_m
    # idempotent: merging again changes nothing
    assert merge_schemas(m, sb) == m
    assert merge_schemas(m, sa) == m


def test_merge_preserves_column_order_table_first():
    evolved = T.StructType(
        [*TRANSCRIPT_SCHEMA.fields, T.StructField("extra", T.StringType(), True)]
    )
    m = merge_schemas(TRANSCRIPT_SCHEMA, evolved)
    assert [f.name for f in m.fields][: len(TRANSCRIPT_SCHEMA.fields)] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    assert m.fields[-1].name == "extra"


def test_merge_rejects_narrowing():
    a = _schema([("x", T.LongType())])
    b = _schema([("x", T.StringType())])
    with pytest.raises(TypeError):
        merge_schemas(a, b)


def test_merge_accepts_widening_and_keeps_wide():
    a = _schema([("x", T.IntegerType())])
    b = _schema([("x", T.LongType())])
    assert merge_schemas(a, b)["x"].dataType == T.LongType()
    # narrower batch against wider table: table type wins
    assert merge_schemas(b, a)["x"].dataType == T.LongType()
