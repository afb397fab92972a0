"""Deterministic seeded CDC change-event generator (SURVEY §2.A8, FIXTURES.md A1).

Produces the binlog/WAL-style event log the engine ingests: insert/update/delete
events over multi-turn transcript rows, with

- zipf-skewed hot conversations (exercises salting / AQE skew handling),
- out-of-order arrival within a bounded LSN window,
- exact duplicate re-deliveries,
- optional schema-evolution tail (added ``tool_calls``/``metadata`` columns).

Everything is vectorized numpy (no per-row Python) and fully determined by
``seed`` — replay-equality tests depend on that. The log is written as ordered
parquet segment files ``segment-%05d.parquet`` in *arrival order*; the same
directory doubles as the streaming source's tailed log (maestro_spark.source).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")


@dataclass(frozen=True)
class GenConfig:
    seed: int = 42
    n_convs: int = 200
    min_turns: int = 2
    max_turns: int = 30
    zipf_s: float = 1.2           # hot-conversation skew exponent
    update_frac: float = 0.25     # updates per base insert
    delete_frac: float = 0.05     # deletes per base insert
    out_of_order_frac: float = 0.10
    out_of_order_window: int = 1000  # arrival displacement window (positions)
    duplicate_frac: float = 0.05  # exact re-deliveries
    evolution_at: float | None = None  # fraction of arrival after which v2 cols appear
    segment_rows: int = 100_000   # rows per log segment file
    roles: tuple[str, ...] = ("user", "assistant", "system", "tool")
    tools: tuple[str, ...] = ("search", "python", "browser", "none")


@dataclass
class EventLog:
    """In-memory columnar event log in arrival order."""
    cols: dict[str, np.ndarray]
    evolved: bool = False
    extra: dict[str, list] = field(default_factory=dict)  # tool_calls/metadata (object)

    def __len__(self) -> int:
        return len(self.cols["op_lsn"])


def generate(cfg: GenConfig = GenConfig()) -> EventLog:
    rng = np.random.default_rng(cfg.seed)

    # --- base inserts: one per (conv, turn) ---------------------------------
    turns = rng.integers(cfg.min_turns, cfg.max_turns + 1, cfg.n_convs)
    conv_of_insert = np.repeat(np.arange(cfg.n_convs), turns)
    turn_of_insert = np.concatenate([np.arange(t) for t in turns]).astype(np.int64)
    n_base = conv_of_insert.size

    # zipf weights over convs — hot conversations get most updates/deletes
    w = 1.0 / np.power(np.arange(1, cfg.n_convs + 1, dtype=np.float64), cfg.zipf_s)
    w /= w.sum()

    def sample_keys(n: int) -> tuple[np.ndarray, np.ndarray]:
        c = rng.choice(cfg.n_convs, size=n, p=w)
        t = np.floor(rng.random(n) * turns[c]).astype(np.int64)
        return c, t

    n_upd = int(cfg.update_frac * n_base)
    n_del = int(cfg.delete_frac * n_base)
    upd_c, upd_t = sample_keys(n_upd)
    del_c, del_t = sample_keys(n_del)

    conv = np.concatenate([conv_of_insert, upd_c, del_c])
    turn = np.concatenate([turn_of_insert, upd_t, del_t])
    op = np.concatenate(
        [np.zeros(n_base, np.int8), np.ones(n_upd, np.int8), np.full(n_del, 2, np.int8)]
    )
    n = conv.size

    # --- logical (LSN) order: inserts early, updates middle, deletes late ----
    prio = np.empty(n, np.float64)
    prio[:n_base] = rng.random(n_base) * 0.55
    prio[n_base : n_base + n_upd] = 0.25 + rng.random(n_upd) * 0.60
    prio[n_base + n_upd :] = 0.50 + rng.random(n_del) * 0.50
    lsn_order = np.argsort(prio, kind="stable")
    rank = np.empty(n, np.int64)
    rank[lsn_order] = np.arange(n)
    op_lsn = rank * 3 + 1  # non-dense LSNs, like a real WAL

    # --- arrival order: mostly LSN order, bounded displacement + duplicates --
    pos = rank.astype(np.float64)
    displaced = rng.random(n) < cfg.out_of_order_frac
    pos[displaced] += rng.integers(
        -cfg.out_of_order_window, cfg.out_of_order_window + 1, displaced.sum()
    )
    n_dup = int(cfg.duplicate_frac * n)
    dup_src = rng.choice(n, size=n_dup, replace=False)
    all_idx = np.concatenate([np.arange(n), dup_src])
    all_pos = np.concatenate(
        [pos, pos[dup_src] + rng.integers(1, cfg.out_of_order_window + 1, n_dup)]
    )
    arrival = all_idx[np.argsort(all_pos, kind="stable")]  # event index per arrival slot

    # --- materialize columns in arrival order --------------------------------
    g = lambda a: a[arrival]  # noqa: E731
    a_conv, a_turn, a_op, a_lsn = g(conv), g(turn), g(op), g(op_lsn)
    n_out = a_conv.size

    conv_id = np.char.add("conv_", np.char.zfill(a_conv.astype("U6"), 6))
    role = np.array(cfg.roles)[a_turn % len(cfg.roles)]
    rev = np.char.add(
        np.char.add(
            np.char.add("conv ", a_conv.astype("U10")), np.char.add(" turn ", a_turn.astype("U10"))
        ),
        np.char.add(" rev ", a_lsn.astype("U12")),
    )
    is_del = a_op == 2
    text = rev.astype(object)
    text[is_del] = None
    tool_pool = np.array(cfg.tools)
    tool = tool_pool[(a_conv + a_turn) % len(tool_pool)].astype(object)
    tool[tool == "none"] = None
    tool[is_del] = None
    role_o = role.astype(object)
    role_o[is_del] = None
    ts = _BASE_TS + (a_lsn * np.int64(250_000)).astype("timedelta64[us]")

    log = EventLog(
        cols={
            "op_lsn": a_lsn.astype(np.int64),
            "op": np.array(["insert", "update", "delete"], object)[a_op],
            "conv_id": conv_id.astype(object),
            "turn_idx": a_turn.astype(np.int32),
            "role": role_o,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )

    # --- schema-evolution tail (FIXTURES.md A3) ------------------------------
    if cfg.evolution_at is not None:
        # evolution is a property of the EVENT (its LSN), not its arrival
        # slot — a duplicate re-delivery must carry a byte-identical payload
        # (one LSN = one payload, the WAL invariant; resolution tie-breaks
        # between same-LSN copies are only sound under it)
        lsn_cut = float(np.quantile(op_lsn, cfg.evolution_at))
        tool_calls: list = [None] * n_out
        metadata: list = [None] * n_out
        for i in range(n_out):
            if is_del[i] or a_lsn[i] < lsn_cut:
                continue
            metadata[i] = [("model", f"m{int(a_conv[i]) % 3}"), ("lsn", str(int(a_lsn[i])))]
            if log.cols["tool"][i] is not None:
                tool_calls[i] = [
                    {"name": log.cols["tool"][i], "args": json.dumps({"q": int(a_turn[i])})}
                ]
        log.evolved = True
        log.extra = {"tool_calls": tool_calls, "metadata": metadata}
    return log


_BASE_ARROW = [
    ("op_lsn", pa.int64()),
    ("op", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
]
_TOOL_CALLS_ARROW = pa.list_(
    pa.struct([("name", pa.string()), ("args", pa.string())])
)
_METADATA_ARROW = pa.map_(pa.string(), pa.string())


def to_arrow(log: EventLog, lo: int = 0, hi: int | None = None) -> pa.Table:
    hi = len(log) if hi is None else hi
    fields, arrays = [], []
    for name, typ in _BASE_ARROW:
        fields.append(pa.field(name, typ))
        arrays.append(pa.array(log.cols[name][lo:hi], type=typ))
    if log.evolved:
        fields.append(pa.field("tool_calls", _TOOL_CALLS_ARROW))
        arrays.append(pa.array(log.extra["tool_calls"][lo:hi], type=_TOOL_CALLS_ARROW))
        fields.append(pa.field("metadata", _METADATA_ARROW))
        arrays.append(pa.array(log.extra["metadata"][lo:hi], type=_METADATA_ARROW))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def write_log(log: EventLog, out_dir: str, segment_rows: int | None = None) -> list[str]:
    """Write the event log as ordered parquet segments (the tailed WAL dir)."""
    os.makedirs(out_dir, exist_ok=True)
    seg = segment_rows or 100_000
    paths = []
    for i, lo in enumerate(range(0, len(log), seg)):
        p = os.path.join(out_dir, f"segment-{i:05d}.parquet")
        # bounded row groups keep big segments splittable: scan parallelism
        # = row groups, not files (a 2M-row single-group file reads serially)
        pq.write_table(
            to_arrow(log, lo, min(lo + seg, len(log))), p, row_group_size=131_072
        )
        paths.append(p)
    return paths


def expected_final_state(log: EventLog) -> "pandas.DataFrame":  # noqa: F821
    """Trivially-correct single-process oracle (SURVEY §5.3).

    Applies events in LSN order: per (conv_id, turn_idx) the max-LSN event
    wins; a winning delete removes the row. Returns the final transcript table
    sorted by (conv_id, turn_idx) — the replay-equality reference.
    """
    import pandas as pd

    df = pd.DataFrame({k: v for k, v in log.cols.items()})
    for k, v in log.extra.items():
        df[k] = v
    df = df.sort_values("op_lsn", kind="stable").drop_duplicates(
        ["conv_id", "turn_idx"], keep="last"
    )
    df = df[df["op"] != "delete"].drop(columns=["op", "op_lsn"])
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


# ---------------------------------------------------------------- distributed
def write_log_distributed(
    spark,
    cfg: GenConfig,
    out_dir: str,
    n_shards: int = 32,
) -> int:
    """Generate + write the event log in parallel on the executors (A8 at
    scale): the driver-side :func:`generate` tops out around ~50k events/s,
    which cannot feed a cluster-sized benchmark. Sharding keys makes the
    parallel form exact, not approximate:

    - conversations are range-partitioned across shards (disjoint conv ids),
      so every CDC key lives entirely inside one shard and max-LSN dominance
      never crosses shards;
    - shard LSNs are interleaved (``lsn*n_shards + shard``) — globally
      unique, order-preserving within a shard;
    - each shard runs :func:`generate` with ``seed + shard`` → the output is
      a pure function of (cfg, n_shards), independent of scheduling.

    Segments are written directly by the executors as
    ``segment-{slice:05d}-{shard:03d}.parquet``; lexicographic order
    interleaves all shards within each slice, so ``replay(...,
    segments_per_epoch=n_shards)`` forms epochs that span every shard —
    the same arrival mix a real multi-partition binlog tail would deliver.
    Returns the total event count.
    """
    import pandas as pd

    convs_per_shard = [cfg.n_convs // n_shards] * n_shards
    for i in range(cfg.n_convs % n_shards):
        convs_per_shard[i] += 1
    base_of_shard = np.cumsum([0] + convs_per_shard[:-1]).tolist()
    os.makedirs(out_dir, exist_ok=True)

    plan = pd.DataFrame(
        {"shard": range(n_shards), "n_convs": convs_per_shard, "conv_base": base_of_shard}
    )

    def gen_shard(pdfs):
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                shard = int(row.shard)
                sub = GenConfig(
                    seed=cfg.seed + shard,
                    n_convs=int(row.n_convs),
                    min_turns=cfg.min_turns,
                    max_turns=cfg.max_turns,
                    zipf_s=cfg.zipf_s,
                    update_frac=cfg.update_frac,
                    delete_frac=cfg.delete_frac,
                    out_of_order_frac=cfg.out_of_order_frac,
                    out_of_order_window=cfg.out_of_order_window,
                    duplicate_frac=cfg.duplicate_frac,
                    evolution_at=cfg.evolution_at,
                    segment_rows=cfg.segment_rows,
                )
                log = generate(sub)
                # re-key into this shard's disjoint id/LSN ranges
                base = int(row.conv_base)
                parts = np.char.partition(log.cols["conv_id"].astype("U20"), "_")
                conv_num = parts[:, 2].astype(np.int64) + base
                log.cols["conv_id"] = np.char.add(
                    "conv_", np.char.zfill(conv_num.astype("U9"), 9)
                ).astype(object)
                log.cols["op_lsn"] = log.cols["op_lsn"] * n_shards + shard
                seg = cfg.segment_rows
                rows = 0
                import uuid as _uuid

                attempt = _uuid.uuid4().hex[:8]  # unique per task attempt:
                # a speculative/zombie duplicate attempt for the same shard
                # must never interleave writes into one tmp file
                for i, lo in enumerate(range(0, len(log), seg)):
                    p = os.path.join(out_dir, f"segment-{i:05d}-{shard:03d}.parquet")
                    tmp = p + f".tmp-{shard}-{attempt}"
                    pq.write_table(
                        to_arrow(log, lo, min(lo + seg, len(log))),
                        tmp,
                        row_group_size=131_072,
                    )
                    os.rename(tmp, p)  # atomic: a torn or concurrent task
                    # attempt never leaves a half-written segment visible
                    # (both attempts write identical bytes — seeded gen)
                    rows += min(lo + seg, len(log)) - lo
                yield pd.DataFrame({"shard": [shard], "rows": [rows]})

    out = (
        spark.createDataFrame(plan)
        .repartition(n_shards, "shard")
        .mapInPandas(gen_shard, "shard int, rows long")
        .toPandas()
    )
    return int(out["rows"].sum())


def expected_final_state_from_dir(log_dir: str) -> "pandas.DataFrame":  # noqa: F821
    """Pandas oracle over an on-disk segment directory (the distributed-gen
    counterpart of :func:`expected_final_state`). Small-scale test use only."""
    import pandas as pd

    segs = sorted(
        os.path.join(log_dir, f)
        for f in os.listdir(log_dir)
        if f.startswith("segment-") and f.endswith(".parquet")
    )
    df = pd.concat([pq.read_table(p).to_pandas() for p in segs], ignore_index=True)
    df = df.sort_values("op_lsn", kind="stable").drop_duplicates(
        ["conv_id", "turn_idx"], keep="last"
    )
    df = df[df["op"] != "delete"].drop(columns=["op", "op_lsn"])
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
