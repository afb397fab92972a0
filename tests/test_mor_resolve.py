"""Property tests for the bucket-local MOR resolution (mor_scan.resolve_group):
any partitioning of any event set into delta files must resolve to the same
winners a trivial pandas oracle computes. Pure pyarrow/pandas — no Spark
session needed, so hundreds of examples run in seconds."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from maestro_spark.mor_scan import resolve_group
from maestro_spark.schema import INTERNAL_FIELDS, TRANSCRIPT_SCHEMA

import pyspark.sql.types as T

FULL = T.StructType([*TRANSCRIPT_SCHEMA.fields, *INTERNAL_FIELDS])

# an event: (conv 0-3, turn 0-3, lsn 1-40, deleted?)
events = st.lists(
    st.tuples(
        st.integers(0, 3), st.integers(0, 3), st.integers(1, 40), st.booleans()
    ),
    min_size=1,
    max_size=40,
)
# cut points that split the (deduped-per-file) sequence into files
cuts = st.lists(st.integers(0, 39), max_size=3)


def _rows(chunk):
    return pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _, _, _ in chunk],
            "turn_idx": pd.array([t for _, t, _, _ in chunk], dtype="int32"),
            "role": "user",
            "text": [None if d else f"v{l}" for _, _, l, d in chunk],
            "tool": None,
            "ts": pd.Timestamp("2025-01-01"),
            "_lsn": pd.array([l for _, _, l, _ in chunk], dtype="int64"),
            "_deleted": [d for _, _, _, d in chunk],
        }
    )


@settings(max_examples=150, deadline=None)
@given(evs=events, cut_points=cuts)
def test_resolve_group_matches_pandas_oracle(evs, cut_points):
    import tempfile

    d = tempfile.mkdtemp(prefix="mor_prop_")
    # split arrival sequence into files; dedup WITHIN each file by key
    # keeping max lsn (engine invariant: every written file is key-unique)
    bounds = sorted({0, len(evs), *[c % (len(evs) + 1) for c in cut_points]})
    files = []
    for i in range(len(bounds) - 1):
        chunk = evs[bounds[i]: bounds[i + 1]]
        if not chunk:
            continue
        best = {}
        for c, t, l, dl in chunk:
            k = (c, t)
            if k not in best or l >= best[k][2]:
                best[k] = (c, t, l, dl)
        pdf = _rows(list(best.values()))
        path = os.path.join(str(d), f"f{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        files.append(path)
    if not files:
        shutil.rmtree(d, ignore_errors=True)
        return

    batches = list(resolve_group(files, FULL))
    got = (
        pa.Table.from_batches(batches, schema=batches[0].schema)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        if batches
        else pd.DataFrame()
    )

    # oracle: global max-lsn winner per key over the same file contents
    # (file order breaks lsn ties — later file wins)
    oracle = {}
    for fi, path in enumerate(files):
        pdf = pq.read_table(path).to_pandas()
        for r in pdf.to_dict("records"):  # itertuples mangles _-prefixed names
            k = (r["conv_id"], r["turn_idx"])
            if k not in oracle or (r["_lsn"], fi) >= (oracle[k][0], oracle[k][1]):
                oracle[k] = (r["_lsn"], fi, r["text"], r["_deleted"])
    exp = (
        pd.DataFrame(
            [
                {"conv_id": c, "turn_idx": t, "_lsn": l, "text": tx, "_deleted": dl}
                for (c, t), (l, fi, tx, dl) in oracle.items()
            ]
        )
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["conv_id"].values == exp["conv_id"].values).all()
    assert (got["turn_idx"].values == exp["turn_idx"].values).all()
    assert (got["_lsn"].values == exp["_lsn"].values).all()
    assert (got["_deleted"].values == exp["_deleted"].values).all()
    assert got["text"].fillna("∅").tolist() == exp["text"].fillna("∅").tolist()
    shutil.rmtree(d, ignore_errors=True)
