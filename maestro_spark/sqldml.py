"""SQL write statements over lake tables (r4 verdict ask #3).

The engine's read-side SQL front door (``LakeTable.sql`` / ``register_
catalog``) serves SELECTs through the session; this module gives the WRITE
verbs the same ergonomics by parsing a RESTRICTED grammar of ``INSERT
INTO`` / ``UPDATE`` / ``DELETE FROM`` / ``MERGE INTO`` statement text and
compiling it onto the engine's fenced DML builders (maestro_spark.dml) —
so a SQL statement gets the full native-write contract for free: fenced
statement LSN, exactly-once commit, CommitConflict re-plan, change-feed
visibility, IVM maintenance, constraint gating, and schema evolution.

Restricted grammar (anything outside it raises a clear ValueError — the
engine REFUSES rather than mis-executes):

    INSERT INTO <t> (c1, ...) VALUES (v1, ...) [, (…) …]
    INSERT INTO <t> [(c1, ...)] SELECT …
    UPDATE <t> SET c1 = e1 [, …] [WHERE p]
    DELETE FROM <t> [WHERE p]
    TRUNCATE TABLE <t>   (fenced delete-all: tombstones, not erasure)
    MERGE INTO <t> [[AS] t] USING (<src name> | (SELECT …)) [[AS] s]
      ON <key equality on (conv_id, turn_idx)>
      WHEN MATCHED [AND c] THEN UPDATE SET … | DELETE
      WHEN NOT MATCHED [BY TARGET] [AND c] THEN INSERT * | INSERT (…) VALUES (…)
      WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … | DELETE
    ALTER TABLE … (see execute_ddl — metadata-only DDL builders)
    CREATE MATERIALIZED VIEW <view> AS SELECT … FROM <t>
      [[LEFT] JOIN '<dim path>' USING (cols)] [WHERE …] GROUP BY …
    REFRESH MATERIALIZED VIEW <view> / DROP MATERIALIZED VIEW [IF EXISTS] <view>
    OPTIMIZE <t> [ZORDER BY (cols…)] / VACUUM <t> [DRY RUN]
    SEARCH <idx> FOR '<query>'[, '<v2>'…] [MODE …] [LIMIT k]
      (modes term|and|phrase|bm25|bm25_and; a quoted value LIST probes a
      composite value index, one value per indexed column)
    COPY INTO <t> FROM '<dir-or-glob>' FILEFORMAT = <csv|json|parquet|orc> [WITH (…)]
      (idempotent per-file bulk load — ingest.copy_into)
    RESTORE TABLE <t> TO VERSION AS OF <id|'tag'> / TO TIMESTAMP AS OF <'iso'|epoch>
      (forward-only rollback — lake.rollback)
    CREATE TABLE [IF NOT EXISTS] <name> (col type, …) [WITH (n_buckets = K)]
    CREATE TABLE <name> [WITH (…)] AS SELECT … / DROP TABLE [IF EXISTS] <name>
      (table provisioning — the warehouse front door, lake.warehouse_sql)
    SELECTs additionally accept inline time travel on a view name:
      <name> [FOR] VERSION AS OF <id|'tag'> / [FOR] TIMESTAMP AS OF <'iso'|epoch>
      (extract_time_travel; resolved by the table's own snapshot chain)

Design choices:
- expressions are NEVER re-implemented: every value/assignment/predicate
  substring is handed to Spark (``F.expr`` / ``spark.sql``) so the SQL
  dialect inside expressions is exactly Spark's;
- the statement's target name must match the registered view name — a
  statement aimed at a different table refuses instead of silently writing
  this one;
- MERGE aliases are pinned to ``t`` (target) and ``s`` (source), Delta's
  documentation convention, and the ON clause must be the table key
  equality (the builder's identity rule; see dml.MergeInto) — anything
  else refuses with the reason.

Scale: the module is pure statement-compilation — the plans that run are
IDENTICAL to the native builders' (one fenced merge epoch; MERGE is one
join + one exchange, plan-gated in tests/test_plan_quality.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maestro_spark import schema as S
from maestro_spark.dml import MergeInto, delete_where, update_where, upsert
from maestro_spark.lake import LakeTable, Snapshot

_VERB_RE = re.compile(r"^\s*(insert|update|delete|merge|truncate)\b", re.I)


def is_dml(sql: str) -> bool:
    """True when the statement text starts with a write verb."""
    return bool(_VERB_RE.match(sql or ""))


# Inline time travel (Delta `t VERSION AS OF 3` / `t TIMESTAMP AS OF '…'`,
# Iceberg `t FOR VERSION AS OF 3`, SQL:2011 `t FOR SYSTEM_TIME AS OF …`).
# The clause attaches to a table reference, so the pattern anchors on an
# identifier. Matching runs over a LITERAL-MASKED copy of the statement so
# 'VERSION AS OF 9' inside a quoted value can never match (values are
# spliced back from the original text by span).
_TT_RE = re.compile(
    r"(?P<ident>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"(?:FOR\s+)?(?P<kind>SYSTEM_VERSION|SYSTEM_TIME|VERSION|TIMESTAMP)"
    r"\s+AS\s+OF\s+"
    r"(?P<val>'[^']*'|\"[^\"]*\"|\d+(?:\.\d+)?)",
    re.I,
)


def _mask_literal_bodies(s: str) -> str:
    """Same-length copy with the INTERIOR of quoted literals blanked
    (quotes kept; '' doubling and backslash escapes honored — Spark's
    default dialect interprets both) — regex spans stay valid on the
    original text."""
    out = list(s)
    i = 0
    while i < len(s):
        q = s[i]
        if q in ("'", '"'):
            j = i + 1
            while j < len(s):
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == q:
                    if q == "'" and j + 1 < len(s) and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, len(s))):
                out[k] = "\x00"
            i = j + 1
        else:
            i += 1
    return "".join(out)


def extract_time_travel(sql: str, name: str) -> tuple[str, list[tuple[str, str]]]:
    """Find and STRIP inline time-travel clauses on view ``name``.

    Returns ``(stripped_sql, pins)`` where each pin is ``(kind, raw_value)``
    with kind normalized to ``VERSION`` (snapshot id or tag literal) or
    ``TIMESTAMP`` (ISO literal or epoch-seconds number). A clause attached
    to any OTHER identifier refuses — this front door serves exactly one
    registered view, and silently ignoring a pin on a joined name would
    read the wrong snapshot. Resolution (tag → id, ts → id, conflicting
    pins) happens in :meth:`LakeTable.sql`, which owns the snapshot chain."""
    stripped, by_ident = extract_time_travel_any(sql)
    pins: list[tuple[str, str]] = []
    for ident, ident_pins in by_ident.items():
        if ident.lower() != name.lower():
            raise ValueError(
                f"time-travel clause on {ident!r}, but this front door "
                f"serves only view {name!r} — register the other table's "
                "view pinned (create_view(snapshot_id=…)) instead"
            )
        pins.extend(ident_pins)
    return stripped, pins


def extract_time_travel_any(sql: str) -> tuple[str, dict[str, list[tuple[str, str]]]]:
    """Multi-table variant of :func:`extract_time_travel` (the warehouse
    front door, where several registered tables may each carry a pin):
    strips every inline clause and returns ``(stripped_sql,
    {identifier: [(kind, raw_value), …]})`` — the caller validates the
    identifiers against its catalog and resolves each table's pins."""
    by_ident: dict[str, list[tuple[str, str]]] = {}
    out: list[str] = []
    last = 0
    for m in _TT_RE.finditer(_mask_literal_bodies(sql)):
        ident = sql[m.start("ident") : m.end("ident")]
        kind = m.group("kind").upper()
        kind = {"SYSTEM_VERSION": "VERSION", "SYSTEM_TIME": "TIMESTAMP"}.get(
            kind, kind
        )
        by_ident.setdefault(ident, []).append(
            (kind, sql[m.start("val") : m.end("val")])
        )
        out.append(sql[last : m.end("ident")])  # keep the table reference
        last = m.end()
    out.append(sql[last:])
    return "".join(out), by_ident


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0, outside quoted strings (single
    or double — both are string literals in Spark's default dialect)."""
    masked = _mask_literal_bodies(s)
    parts, buf, depth = [], [], 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(s[i])
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _scan_group(s: str, start: int) -> int:
    """Index just past the ``)`` matching the ``(`` at ``s[start]``
    (literal-aware: parens inside quoted strings don't count)."""
    masked = _mask_literal_bodies(s)
    depth = 0
    for i in range(start, len(masked)):
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError(f"unbalanced parentheses in {s[start:start + 60]!r}")


def _top_kw(s: str, kw_pattern: str) -> re.Match | None:
    """First match of ``kw_pattern`` at paren depth 0 outside string
    literals — how clause keywords (WHERE, WHEN MATCHED, …) are located
    without being fooled by the same word inside a literal or a
    parenthesized subexpression. Spans are valid on the original text."""
    masked = _mask_literal_bodies(s)
    depth, depths = 0, []
    for ch in masked:
        if ch == "(":
            depth += 1
        depths.append(depth)
        if ch == ")":
            depth -= 1
    for m in re.finditer(kw_pattern, masked, re.I):
        if depths[m.start()] == 0:
            return m
    return None


def _parse_assignments(text: str) -> dict[str, str]:
    """``c1 = e1, c2 = e2`` -> {c1: e1, ...} (exprs stay Spark SQL text)."""
    out: dict[str, str] = {}
    for part in _split_top(text):
        m = re.match(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$", part, re.S)
        if not m:
            raise ValueError(f"cannot parse assignment {part!r} (want col = expr)")
        col = m.group(1)
        if col in out:
            raise ValueError(f"column {col!r} assigned twice")
        out[col] = m.group(2).strip()
    if not out:
        raise ValueError("SET clause has no assignments")
    return out


def _require_target(stmt_name: str, name: str) -> None:
    if stmt_name.lower() != name.lower():
        raise ValueError(
            f"statement targets {stmt_name!r} but this table is registered "
            f"as {name!r} — refusing to write a different table"
        )


def _strip_ident(tok: str) -> str:
    return tok.strip().strip("`\"")


# --------------------------------------------------------------------- verbs
def _exec_insert(table: LakeTable, sql: str, name: str, query_id: str):
    m = re.match(
        r"^\s*insert\s+into\s+([A-Za-z_][\w.]*)\s*"
        r"(\(([^)]*)\))?\s*(values\b|select\b|with\b)(.*)$",
        sql, re.I | re.S,
    )
    if not m:
        raise ValueError(
            "unsupported INSERT (want: INSERT INTO <t> [(cols)] VALUES "
            "(...)[, ...] | INSERT INTO <t> [(cols)] [WITH …] SELECT ...)"
        )
    _require_target(_strip_ident(m.group(1)), name)
    cols = [_strip_ident(c) for c in _split_top(m.group(3))] if m.group(3) else None
    kw, rest = m.group(4).lower(), m.group(5).strip()
    spark = table.spark
    if kw.startswith("values"):
        if not cols:
            cols = [f.name for f in table.snapshot().payload_schema().fields]
        # Spark parses every literal/expression: VALUES text passes verbatim
        df = spark.sql(
            f"SELECT * FROM VALUES {rest} AS v({', '.join(cols)})"
        )
    else:
        df = spark.sql(sql[m.start(4):])
        if cols:
            if len(cols) != len(df.columns):
                raise ValueError(
                    f"INSERT column list has {len(cols)} names but the "
                    f"SELECT produces {len(df.columns)} columns"
                )
            df = df.toDF(*cols)
    missing = [k for k in S.KEY_COLS if k not in df.columns]
    if missing:
        raise ValueError(f"INSERT must provide key columns {missing}")
    return upsert(table, df, query_id=query_id)


def _exec_update(table: LakeTable, sql: str, name: str, query_id: str):
    m = re.match(
        r"^\s*update\s+([A-Za-z_][\w.]*)\s+set\s+(.*?)\s*;?\s*$",
        sql, re.I | re.S,
    )
    if not m:
        raise ValueError("unsupported UPDATE (want: UPDATE <t> SET c = e[, ...] [WHERE p])")
    _require_target(_strip_ident(m.group(1)), name)
    # the WHERE boundary is found outside literals/parens, so a SET value
    # like 'deleted where stale' can never truncate the assignment list
    body = m.group(2)
    wm = _top_kw(body, r"\bwhere\b")
    set_text, where_text = (
        (body[: wm.start()], body[wm.end():].strip()) if wm else (body, None)
    )
    assigns = {c: F.expr(e) for c, e in _parse_assignments(set_text).items()}
    bad = set(assigns) & set(S.KEY_COLS)
    if bad:
        raise ValueError(f"cannot UPDATE key columns {sorted(bad)}")
    pred = F.expr(where_text) if where_text else F.lit(True)
    return update_where(table, pred, assigns, query_id=query_id)


def _exec_delete(table: LakeTable, sql: str, name: str, query_id: str):
    m = re.match(
        r"^\s*delete\s+from\s+([A-Za-z_][\w.]*)\s*(?:where\s+(.*))?\s*;?\s*$",
        sql, re.I | re.S,
    )
    if not m:
        raise ValueError("unsupported DELETE (want: DELETE FROM <t> [WHERE p])")
    _require_target(_strip_ident(m.group(1)), name)
    pred = F.expr(m.group(2)) if m.group(2) else F.lit(True)
    return delete_where(table, pred, query_id=query_id)


def _exec_truncate(table: LakeTable, sql: str, name: str, query_id: str):
    """``TRUNCATE TABLE <t>`` (Delta parity) = a fenced delete-all: every
    live row tombstones in ONE exactly-once epoch. CDC semantics hold —
    the rows are remembered, not erased (the change feed emits the
    deletes; history/time travel still serve them; RTBF erasure remains
    ``purge``'s job)."""
    m = re.match(r"^\s*truncate\s+table\s+([A-Za-z_][\w.]*)\s*;?\s*$", sql, re.I)
    if not m:
        raise ValueError("unsupported TRUNCATE (want: TRUNCATE TABLE <t>)")
    _require_target(_strip_ident(m.group(1)), name)
    return delete_where(table, F.lit(True), query_id=query_id)


def _validate_merge_on(on_text: str) -> None:
    """The ON clause must be exactly the key equality (any order, either
    side first): the builder defines row identity by the table key and
    cannot honor an arbitrary join condition (see dml.MergeInto)."""
    seen: set[str] = set()
    for part in re.split(r"\band\b", on_text, flags=re.I):
        m = re.match(
            r"^\s*([st])\s*\.\s*([A-Za-z_]\w*)\s*=\s*([st])\s*\.\s*([A-Za-z_]\w*)\s*$",
            part.strip(),
        )
        if not m:
            raise ValueError(
                f"MERGE ON must be key equality over aliases s/t; cannot "
                f"accept {part.strip()!r}"
            )
        a_side, a_col, b_side, b_col = m.groups()
        if {a_side, b_side} != {"s", "t"} or a_col != b_col or a_col not in S.KEY_COLS:
            raise ValueError(
                f"MERGE ON must equate the table key {S.KEY_COLS} between "
                f"s and t; cannot accept {part.strip()!r}"
            )
        seen.add(a_col)
    if seen != set(S.KEY_COLS):
        raise ValueError(
            f"MERGE ON must cover the full table key {S.KEY_COLS}; got {sorted(seen)}"
        )


def _exec_merge(table: LakeTable, sql: str, name: str, query_id: str):
    m = re.match(
        r"^\s*merge\s+into\s+([A-Za-z_][\w.]*)\s*(?:as\s+)?(?:t\b)?\s*using\s+",
        sql, re.I,
    )
    if not m:
        raise ValueError(
            "unsupported MERGE (want: MERGE INTO <t> [AS t] USING <src>|(SELECT …) "
            "[AS s] ON <key equality> WHEN … THEN …)"
        )
    _require_target(_strip_ident(m.group(1)), name)
    # the USING source: a parenthesized SELECT is delimited by a proper
    # paren scan (arbitrary nesting — a depth-limited regex refused
    # sources like upper(trim(x)) inside the subquery)
    pos = m.end()
    if sql[pos : pos + 1] == "(":
        end = _scan_group(sql, pos)
        src_text = sql[pos:end]
    else:
        sm = re.match(r"[A-Za-z_][\w.]*", sql[pos:])
        if not sm:
            raise ValueError("MERGE USING wants a view name or (SELECT …)")
        src_text = sm.group(0)
        end = pos + sm.end()
    am = re.match(r"\s*(?:as\s+)?(?:s\b)?\s*on\s+", sql[end:], re.I)
    if not am:
        raise ValueError(
            "MERGE wants ON after the USING source (source alias, if "
            "given, must be s)"
        )
    rest = sql[end + am.end():]
    # clause keywords are located outside literals and parens, so a SET
    # value like 'when matched then x' or a CASE WHEN expression can
    # never be mistaken for a clause boundary
    _WHEN = r"\bwhen\s+(?:not\s+)?matched\b"
    wm = _top_kw(rest, _WHEN)
    if not wm:
        raise ValueError("MERGE wants at least one WHEN clause")
    on_text, when_text = rest[: wm.start()].strip(), rest[wm.start():]
    _validate_merge_on(on_text)  # grammar first: refuse before any IO
    spark = table.spark
    if src_text.startswith("("):
        source = spark.sql(src_text[1:-1])
    else:
        source = spark.table(_strip_ident(src_text))

    builder = MergeInto(table, source)
    clause_re = re.compile(
        r"when\s+(not\s+matched\s+by\s+source|not\s+matched(?:\s+by\s+target)?|matched)"
        r"\s*(?:and\s+(.*?))?\s*then\s+"
        r"(update\s+set\s+.*?|delete|insert\s*\*|insert\s*\([^)]*\)\s*values\s*\(.*?\))"
        rf"\s*(?={_WHEN}|$)",
        re.I | re.S,
    )
    consumed = 0
    # match over the masked copy (same length), slice text from the
    # original by span: literals can't confuse the clause grammar
    for cm in clause_re.finditer(_mask_literal_bodies(when_text)):
        if when_text[consumed : cm.start()].strip():
            raise ValueError(
                f"cannot parse MERGE clause text "
                f"{when_text[consumed:cm.start()].strip()!r}"
            )
        consumed = cm.end()
        cat = re.sub(r"\s+", " ", cm.group(1).lower())
        cond = (
            when_text[cm.start(2) : cm.end(2)] if cm.group(2) is not None else None
        )
        action = when_text[cm.start(3) : cm.end(3)].strip()
        upd = re.match(r"^update\s+set\s+(.*)$", action, re.I | re.S)
        if cat == "matched":
            if action.lower() == "delete":
                builder.when_matched_delete(condition=cond)
            elif upd:
                builder.when_matched_update(
                    set=_parse_assignments(upd.group(1)), condition=cond
                )
            else:
                raise ValueError("WHEN MATCHED supports UPDATE SET … or DELETE")
        elif cat == "not matched by source":
            if action.lower() == "delete":
                builder.when_not_matched_by_source_delete(condition=cond)
            elif upd:
                builder.when_not_matched_by_source_update(
                    set=_parse_assignments(upd.group(1)), condition=cond
                )
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports UPDATE SET … or DELETE"
                )
        else:  # not matched [by target]
            if re.fullmatch(r"insert\s*\*", action, re.I):
                builder.when_not_matched_insert(condition=cond)
            elif action.lower().startswith("insert"):
                im = re.match(
                    r"insert\s*\(([^)]*)\)\s*values\s*\((.*)\)\s*$", action,
                    re.I | re.S,
                )
                if not im:
                    raise ValueError(
                        "WHEN NOT MATCHED supports INSERT * or INSERT (cols) VALUES (exprs)"
                    )
                cols = [_strip_ident(c) for c in _split_top(im.group(1))]
                exprs = _split_top(im.group(2))
                if len(cols) != len(exprs):
                    raise ValueError(
                        f"INSERT lists {len(cols)} columns but {len(exprs)} values"
                    )
                builder.when_not_matched_insert(
                    values=dict(zip(cols, exprs)), condition=cond
                )
            else:
                raise ValueError(
                    "WHEN NOT MATCHED supports INSERT * or INSERT (cols) VALUES (exprs)"
                )
    if when_text[consumed:].strip():
        raise ValueError(
            f"cannot parse MERGE clause text {when_text[consumed:].strip()!r}"
        )
    return builder.execute(query_id=query_id)


def execute_dml(
    table: LakeTable, sql: str, name: str = "t", query_id: str = "sqldml"
) -> Snapshot | None:
    """Parse one DML statement and run it through the fenced native
    builders. Returns the committed Snapshot (None when the statement was
    a no-op — empty batch or idempotent re-delivery)."""
    # a trailing semicolon is always outside any literal (a literal's
    # closing quote would follow it), so stripping here is safe for every
    # verb — INSERT's VALUES tail passes to Spark verbatim and would
    # otherwise choke on it
    sql = sql.rstrip()
    while sql.endswith(";"):
        sql = sql[:-1].rstrip()
    verb = _VERB_RE.match(sql)
    if not verb:
        raise ValueError("not a DML statement (INSERT/UPDATE/DELETE/MERGE)")
    fn = {
        "insert": _exec_insert,
        "update": _exec_update,
        "delete": _exec_delete,
        "merge": _exec_merge,
        "truncate": _exec_truncate,
    }[verb.group(1).lower()]
    return fn(table, sql, name, query_id)


# ------------------------------------------------------ transaction scripts
_SCRIPT_RE = re.compile(r"^\s*begin\b", re.I)


def is_script(sql: str) -> bool:
    """True when the text is a ``BEGIN … COMMIT/ROLLBACK`` script."""
    return bool(_SCRIPT_RE.match(sql or ""))


def parse_script(sql: str) -> tuple[list[str], str]:
    """Split ``BEGIN[ TRANSACTION|WORK]; <stmt>; …; COMMIT|ROLLBACK`` into
    its inner statements and terminator (literal-aware top-level ``;``
    split, so a semicolon inside a quoted value never breaks a statement).
    Inner statements must be DML verbs (INSERT / UPDATE / DELETE / MERGE /
    TRUNCATE) or ALTER TABLE (transactional DDL: metadata-only commits
    ride the branch and adopt republishes them with replace-schema
    semantics); anything else — maintenance, SELECT, a nested BEGIN —
    refuses up front, before any statement runs."""
    stmts = _split_top(sql, ";")
    if not stmts or not re.fullmatch(
        r"begin(\s+(transaction|work))?", stmts[0], re.I
    ):
        raise ValueError(
            "transaction script must start with BEGIN [TRANSACTION|WORK]"
        )
    term = re.fullmatch(
        r"(commit|rollback)(\s+(transaction|work))?", stmts[-1], re.I
    )
    if not term:
        raise ValueError(
            "transaction script must end with COMMIT or ROLLBACK "
            "(statement-at-a-time autocommit needs no BEGIN)"
        )
    inner = stmts[1:-1]
    for s_ in inner:
        if re.fullmatch(r"(begin|commit|rollback)\b.*", s_, re.I | re.S):
            raise ValueError(
                f"misplaced transaction keyword mid-script: {s_[:40]!r}"
            )
        if not (is_dml(s_) or is_ddl(s_)):
            raise ValueError(
                "only DML (INSERT/UPDATE/DELETE/MERGE/TRUNCATE) and ALTER "
                f"TABLE statements run inside BEGIN … COMMIT; got {s_[:60]!r}"
            )
    return inner, term.group(1).lower()


def execute_script(
    table: LakeTable, sql: str, name: str = "t", query_id: str = "sqltxn"
) -> int:
    """Run a multi-statement DML transaction ATOMICALLY: the statements
    apply to a zero-copy branch (:meth:`LakeTable.transaction`) in order —
    each seeing the previous statements' effects through the re-registered
    view — and publish as one all-or-nothing adopt on COMMIT. A failing
    statement (or a concurrent-writer conflict at publish) discards the
    branch: readers never observe a partial script. ``ROLLBACK`` as the
    terminator validates the script and discards it — identical visible
    effect to never running it, at zero cost.

    Returns the number of statements applied (0 for ROLLBACK / empty).
    Time-travel pins are not supported inside a script — pin reads outside
    the transaction instead."""
    stmts, term = parse_script(sql)
    if term == "rollback" or not stmts:
        return 0
    with table.transaction() as txn:
        for i, s_ in enumerate(stmts):
            # each statement reads the BRANCH state as of the previous one
            txn.create_view(name)
            if is_ddl(s_):
                execute_ddl(txn, s_, name=name)
            else:
                execute_dml(txn, s_, name=name, query_id=f"{query_id}.{i}")
    return len(stmts)


# ---------------------------------------------------------------------- DDL
_DDL_RE = re.compile(r"^\s*alter\s+table\b", re.I)


def is_ddl(sql: str) -> bool:
    """True when the statement text starts with ALTER TABLE."""
    return bool(_DDL_RE.match(sql or ""))


def execute_ddl(table: LakeTable, sql: str, name: str = "t") -> Snapshot:
    """Parse one ALTER TABLE statement and run it through the engine's
    metadata-only DDL builders (maestro_spark.ddl) — the SQL twin of
    :func:`execute_dml`, with the same refusal discipline (anything
    outside the grammar raises rather than mis-executes). Accepted forms::

        ALTER TABLE <t> ADD COLUMN <col> <type>
        ALTER TABLE <t> RENAME COLUMN <old> TO <new>
        ALTER TABLE <t> DROP COLUMN <col> [ERASE]
        ALTER TABLE <t> ALTER COLUMN <col> TYPE <type>     (widen only)

    ``<type>`` strings go to Spark's DDL parser verbatim (so the dialect
    is exactly Spark's); ``DROP COLUMN … ERASE`` opts into the immediate
    RTBF rewrite instead of the default masked drop (physical excision on
    the compaction cadence)."""
    m = re.match(r"^\s*alter\s+table\s+([A-Za-z_][\w.]*)\s+(.*?)\s*;?\s*$",
                 sql, re.I | re.S)
    if not m:
        raise ValueError("cannot parse ALTER TABLE statement")
    _require_target(_strip_ident(m.group(1)), name)
    from maestro_spark import ddl

    rest = m.group(2)
    if am := re.match(r"^add\s+column\s+([A-Za-z_]\w*)\s+(\S.*)$", rest, re.I | re.S):
        return ddl.add_column(table, _strip_ident(am.group(1)), am.group(2).strip())
    if rm := re.match(r"^rename\s+column\s+([A-Za-z_]\w*)\s+to\s+([A-Za-z_]\w*)$",
                      rest, re.I):
        return ddl.rename_column(table, _strip_ident(rm.group(1)),
                                 _strip_ident(rm.group(2)))
    if dm := re.match(r"^drop\s+column\s+([A-Za-z_]\w*)(\s+erase)?$", rest, re.I):
        return ddl.drop_column(table, _strip_ident(dm.group(1)),
                               erase=bool(dm.group(2)))
    if wm := re.match(r"^alter\s+column\s+([A-Za-z_]\w*)\s+type\s+(\S.*)$",
                      rest, re.I | re.S):
        return ddl.widen_column(table, _strip_ident(wm.group(1)), wm.group(2).strip())
    raise ValueError(
        f"unsupported ALTER TABLE form {rest!r} — accepted: ADD COLUMN, "
        "RENAME COLUMN … TO …, DROP COLUMN [ERASE], ALTER COLUMN … TYPE …"
    )


# ------------------------------------------------------ materialized views
_MV_RE = re.compile(r"^\s*(create|refresh|drop)\s+materialized\s+view\b", re.I)
_MV_TARGET = r"('[^']+'|\"[^\"]+\"|[A-Za-z_]\w*)"


def is_mv(sql: str) -> bool:
    """True when the statement is CREATE/REFRESH/DROP MATERIALIZED VIEW."""
    return bool(_MV_RE.match(sql or ""))


def _mv_root(target: str, table: LakeTable) -> str:
    """Quoted target = literal view path; bare identifier = a sibling
    directory of the base root (``<base.root>__mv_<ident>``) so views
    travel with their table without the caller inventing paths."""
    t = target.strip()
    if t[0] in "'\"":
        return t[1:-1]
    return f"{table.root.rstrip('/')}__mv_{t}"


def _derive_scan_columns(exprs: list[str], table: LakeTable) -> list[str]:
    """Heuristic scan-pruning set for a view declaration: identifiers
    appearing OUTSIDE string literals in the aggregate expressions,
    intersected with the base payload schema (same literal-stripping rule
    the constraint gate uses — see merge.py). Wrong is safe: a miss makes
    the declaration probe fail loudly and the caller retries unpruned."""
    payload = {f.name for f in table.snapshot().payload_schema().fields}
    no_lits = re.sub(r"'(?:[^']|'')*'", "''", " ".join(exprs))
    words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", no_lits))
    return sorted(words & payload)


def execute_mv(table: LakeTable, sql: str, name: str = "t"):
    """Compile one materialized-view statement onto the engine's
    incremental-view machinery (maestro_spark.ivm) and refresh it to the
    base table's current snapshot. Accepted forms::

        CREATE MATERIALIZED VIEW <view> AS
          SELECT <key cols…, agg_expr AS alias, …> FROM <t>
          [[LEFT] JOIN '<dim path>' USING (join cols)]
          [WHERE <pre-aggregation filter>] GROUP BY <key cols>
        REFRESH MATERIALIZED VIEW <view>
        DROP MATERIALIZED VIEW [IF EXISTS] <view>

    The JOIN clause declares dimension enrichment (see
    ``ivm.MaterializedView``): the dim is another lake table named by a
    QUOTED path (a dim is a table, not view-relative derived data), the
    join is an equi-join on the USING columns against the dim's live
    rows, and plain/INNER vs LEFT follows standard SQL. Dim-change
    staleness is cursor-tracked by the view machinery itself.

    ``<view>`` is a quoted path (``'/data/conv_stats'``) or a bare name
    (view lives beside the base root — see :func:`_mv_root`). The select
    list must echo exactly the GROUP BY columns plus ALIASED aggregate
    expressions (expression text goes to Spark's parser verbatim and is
    PERSISTED in the view root, so REFRESH needs only the view path).
    CREATE of an already-declared identical view just reopens it (so the
    statement is idempotent); a differing declaration refuses. CREATE and
    REFRESH return the refreshed :class:`maestro_spark.ivm.MaterializedView`.
    DROP verifies the target IS a declared view of THIS table (refuses on
    an undeclared directory or another table's view — never an arbitrary
    rmtree) and returns the removed root path; with IF EXISTS a missing
    view is a no-op returning None.
    Scale: refresh work is delta-proportional (changed-conv bucket pruning,
    crossover rule) — the statement never implies a full recompute unless
    the view's own machinery chooses one."""
    import os

    from maestro_spark import ivm

    rm = re.match(
        rf"^\s*refresh\s+materialized\s+view\s+{_MV_TARGET}\s*;?\s*$", sql, re.I
    )
    if rm:
        mv = ivm.load(table.spark, _mv_root(rm.group(1), table), base=table)
        mv.refresh()
        return mv

    dm = re.match(
        rf"^\s*drop\s+materialized\s+view\s+(if\s+exists\s+)?{_MV_TARGET}"
        r"\s*;?\s*$",
        sql, re.I,
    )
    if dm:
        root = _mv_root(dm.group(2), table)
        if not os.path.exists(os.path.join(root, ivm._MV_FILE)):
            if dm.group(1):
                return None
            raise ValueError(
                f"{root!r} holds no declared materialized view — refusing "
                "to remove (DROP only deletes ivm.declare'd roots; use "
                "IF EXISTS to no-op)"
            )
        # refuses another table's view; also drops the registry marker
        return ivm.undeclare(table.spark, root, base=table)

    # match over the literal-masked copy (same length) and slice each
    # group from the original by span: a WHERE value like 'a group by b'
    # or a dim path containing ``join`` can never confuse the grammar
    cm = re.match(
        rf"^\s*create\s+materialized\s+view\s+{_MV_TARGET}\s+as\s+"
        r"select\s+(.*?)\s+from\s+([A-Za-z_][\w.]*)"
        r"(?:\s+(left\s+|inner\s+)?join\s+('[^']+'|\"[^\"]+\")"
        r"\s+using\s*\(([^)]*)\))?"
        r"(?:\s+where\s+(.*?))?\s+group\s+by\s+(.*?)\s*;?\s*$",
        _mask_literal_bodies(sql), re.I | re.S,
    )
    if not cm:
        raise ValueError(
            "unsupported materialized-view statement (want: CREATE "
            "MATERIALIZED VIEW <view> AS SELECT … FROM <t> "
            "[[LEFT] JOIN '<dim path>' USING (cols)] [WHERE …] "
            "GROUP BY …, or REFRESH MATERIALIZED VIEW <view>)"
        )
    def g(i: int) -> str | None:
        return sql[cm.start(i) : cm.end(i)] if cm.group(i) is not None else None

    _require_target(_strip_ident(g(3)), name)
    # dim enrichment: SQL-standard USING join onto another lake table
    # (quoted path — a dim is a TABLE, not view-relative derived data);
    # plain/INNER JOIN = inner, LEFT JOIN = left, per standard SQL
    dim_root = g(5)[1:-1] if cm.group(5) else None
    dim_on = ([_strip_ident(c) for c in _split_top(g(6))]
              if cm.group(5) else None)
    dim_how = ("left" if (g(4) or "").strip().lower() == "left"
               else "inner") if dim_root else "left"
    where = g(7).strip() if cm.group(7) else None
    keys = [_strip_ident(k) for k in _split_top(g(8))]
    bad_keys = [k for k in keys if not re.fullmatch(r"[A-Za-z_]\w*", k)]
    if bad_keys:
        raise ValueError(
            f"GROUP BY must list bare base columns; cannot accept {bad_keys}"
        )
    echoed, agg_exprs = [], []
    for item in _split_top(g(2)):
        if re.fullmatch(r"[A-Za-z_]\w*", _strip_ident(item)):
            echoed.append(_strip_ident(item))
            continue
        am = re.match(r"^(.*\S)\s+as\s+([A-Za-z_]\w*)\s*$", item, re.I | re.S)
        if not am:
            raise ValueError(
                f"aggregate select item {item!r} needs an alias "
                "(… AS name) — view column names must be explicit"
            )
        agg_exprs.append(f"{am.group(1)} AS {am.group(2)}")
    if sorted(echoed) != sorted(keys):
        raise ValueError(
            f"select list must echo exactly the GROUP BY columns "
            f"{sorted(keys)}; got bare columns {sorted(echoed)}"
        )
    if not agg_exprs:
        raise ValueError("view needs at least one aggregate select item")
    root = _mv_root(g(1), table)

    def _declare(columns):
        mv = ivm.declare(
            table.spark, table, root, key_cols=keys, agg_exprs=agg_exprs,
            columns=columns, where=where,
            dim_root=dim_root, dim_on=dim_on, dim_how=dim_how,
        )
        mv.refresh()
        return mv

    try:
        return _declare(
            _derive_scan_columns(agg_exprs + ([where] if where else []), table)
            or None
        )
    except Exception as e:  # noqa: BLE001 — unresolved-column ⇒ pruning miss
        # declare() probes the plan BEFORE persisting the declaration, so a
        # pruning miss leaves no _mv.json behind and the unpruned retry is
        # a clean first declaration
        if "UNRESOLVED_COLUMN" not in str(e):
            raise
        return _declare(None)


# ------------------------------------------------------------- maintenance
_MAINT_RE = re.compile(r"^\s*(optimize|vacuum)\b", re.I)


def is_maintenance(sql: str) -> bool:
    """True when the statement is OPTIMIZE / VACUUM."""
    return bool(_MAINT_RE.match(sql or ""))


def execute_maintenance(table: LakeTable, sql: str, name: str = "t") -> dict:
    """Route a maintenance statement onto the engine's own idempotent
    primitives (Delta SQL parity). Accepted forms::

        OPTIMIZE <t> [ZORDER BY (c1, c2, …)]
        VACUUM <t> [DRY RUN]

    ``OPTIMIZE`` runs the one-call maintenance driver (fold delta tiers —
    or a z-order clustered rewrite when ZORDER BY is given — backfill key
    blooms, expire old snapshots, vacuum orphans; every step idempotent,
    crash-safe by re-run). ``VACUUM`` removes orphan data files + stale
    staging dirs + grace-protected unreferenced manifests; ``DRY RUN``
    deletes nothing and reports the orphan count. Returns a JSON-able
    summary dict (the statement's result row)."""
    from maestro_spark.lake import optimize as _optimize

    vm = re.match(
        r"^\s*vacuum\s+([A-Za-z_][\w.]*)(\s+dry\s+run)?\s*;?\s*$", sql, re.I
    )
    if vm:
        _require_target(_strip_ident(vm.group(1)), name)
        if vm.group(2):
            return {"op": "vacuum", "dry_run": True,
                    "orphan_files": table.vacuum(dry_run=True)}
        return {"op": "vacuum", "removed_files": table.vacuum()}

    om = re.match(
        r"^\s*optimize\s+([A-Za-z_][\w.]*)"
        r"(?:\s+zorder\s+by\s+\(?\s*([^);]+?)\s*\)?)?\s*;?\s*$",
        sql, re.I,
    )
    if not om:
        raise ValueError(
            "unsupported maintenance statement (want: OPTIMIZE <t> "
            "[ZORDER BY (cols…)], or VACUUM <t> [DRY RUN])"
        )
    _require_target(_strip_ident(om.group(1)), name)
    if om.group(2):
        cols = [_strip_ident(c) for c in _split_top(om.group(2))]
        bad = [c for c in cols if not re.fullmatch(r"[A-Za-z_]\w*", c)]
        if bad:
            raise ValueError(f"ZORDER BY wants bare column names; got {bad}")
        summary = _optimize(table, cluster_by=cols, zorder=True)
    else:
        summary = _optimize(table)
    return {"op": "optimize", **summary}


# ----------------------------------------------------------------- indexes
_IDX_RE = re.compile(r"^\s*(create|refresh|drop)\s+index\b", re.I)


def is_index(sql: str) -> bool:
    """True when the statement is CREATE/REFRESH/DROP INDEX."""
    return bool(_IDX_RE.match(sql or ""))


def _idx_root(target: str, table: LakeTable) -> str:
    """Quoted target = literal index path; bare identifier = a sibling
    directory of the base root (``<base.root>__idx_<ident>``)."""
    t = target.strip()
    if t[0] in "'\"":
        return t[1:-1]
    return f"{table.root.rstrip('/')}__idx_{t}"


def _parse_with_params(text: str) -> dict:
    """``k1 = 4, text_col = 'text'`` → typed dict (int / float / 'string'
    literals only — these feed a constructor, not an expression)."""
    out: dict[str, object] = {}
    for part in _split_top(text):
        m = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+?)\s*$", part, re.S)
        if not m:
            raise ValueError(f"cannot parse WITH item {part!r} (want k = v)")
        key, raw = m.group(1), m.group(2)
        if re.fullmatch(r"-?\d+", raw):
            out[key] = int(raw)
        elif re.fullmatch(r"-?\d+\.\d+", raw):
            out[key] = float(raw)
        elif len(raw) >= 2 and raw[0] == "'" and raw[-1] == "'":
            out[key] = raw[1:-1].replace("''", "'")
        else:
            raise ValueError(
                f"WITH value {raw!r} for {key!r} must be an int, a float, "
                "or a 'quoted string'"
            )
    return out


def execute_index(table: LakeTable, sql: str, name: str = "t"):
    """Compile one index statement onto the feed-maintained index family
    (maestro_spark.index_maint) and refresh it to the base table's current
    snapshot. Accepted forms::

        CREATE INDEX <idx> ON <t> USING <text|value|simhash|lsh|ivf> (<column>)
          [WITH (param = value, …)]
        REFRESH INDEX <idx>
        DROP INDEX [IF EXISTS] <idx>

    ``<idx>`` is a quoted path or a bare name (index lives beside the base
    root — see :func:`_idx_root`). The indexed column binds to the kind's
    column parameter (``text_col`` / ``vec_col``); WITH parameters go to
    the class constructor after signature validation (a typo refuses with
    the accepted names). The declaration persists in the index root
    (``index_maint.declare_index``), so REFRESH needs only the path, the
    index registers with the base table (``optimize`` folds it before
    expiry), and an identical re-CREATE reopens while a divergent one
    refuses. CREATE and REFRESH return the maintained index object
    (``search*``/``probe`` per kind); DROP returns the removed root, or
    None for an IF EXISTS no-op."""
    import os

    from maestro_spark import index_maint as IM

    rm = re.match(
        rf"^\s*refresh\s+index\s+{_MV_TARGET}\s*;?\s*$", sql, re.I
    )
    if rm:
        idx = IM.load_index(table.spark, _idx_root(rm.group(1), table), base=table)
        idx.refresh()
        return idx

    dm = re.match(
        rf"^\s*drop\s+index\s+(if\s+exists\s+)?{_MV_TARGET}\s*;?\s*$", sql, re.I
    )
    if dm:
        root = _idx_root(dm.group(2), table)
        if not os.path.exists(IM._decl_path(root)):
            if dm.group(1):
                return None
            raise ValueError(
                f"{root!r} holds no declared index — refusing to remove "
                "(DROP only deletes declare_index'd roots; use IF EXISTS "
                "to no-op)"
            )
        return IM.undeclare_index(table.spark, root, base=table)

    cm = re.match(
        rf"^\s*create\s+index\s+{_MV_TARGET}\s+on\s+([A-Za-z_][\w.]*)\s+"
        r"using\s+([A-Za-z_]\w*)\s*\(([^)]*)\)"
        r"(?:\s+with\s*\(\s*(.*?)\s*\))?\s*;?\s*$",
        sql, re.I | re.S,
    )
    if not cm:
        raise ValueError(
            "unsupported index statement (want: CREATE INDEX <idx> ON <t> "
            "USING <text|value|simhash|lsh|ivf> (<column>[, …]) "
            "[WITH (k = v, …)], REFRESH INDEX <idx>, or DROP INDEX "
            "[IF EXISTS] <idx>)"
        )
    _require_target(_strip_ident(cm.group(2)), name)
    kind = cm.group(3).lower()
    if kind not in IM.INDEX_KINDS:
        raise ValueError(
            f"unknown index kind {kind!r} — accepted: {sorted(IM.INDEX_KINDS)}"
        )
    cols = [_strip_ident(c) for c in _split_top(cm.group(4))]
    bad = [c for c in cols if not re.fullmatch(r"[A-Za-z_]\w*", c)]
    if not cols or bad:
        raise ValueError(
            f"CREATE INDEX wants bare column name(s); got {bad or cols}"
        )
    if len(cols) > 1 and kind != "value":
        raise ValueError(
            f"{kind} index takes exactly one column; only the value kind "
            "accepts a composite column list"
        )
    params = _parse_with_params(cm.group(5)) if cm.group(5) else {}
    col_param = IM.INDEX_COLUMN_PARAM[kind]
    if col_param in params:
        raise ValueError(
            f"the indexed column is the (…) argument — do not also pass "
            f"{col_param!r} in WITH"
        )
    params[col_param] = cols if len(cols) > 1 else cols[0]
    idx = IM.declare_index(
        table.spark, table, _idx_root(cm.group(1), table), kind, **params
    )
    idx.refresh()
    return idx


# ------------------------------------------------------------------ SEARCH
_SEARCH_RE = re.compile(r"^\s*search\b", re.I)


def is_search(sql: str) -> bool:
    """True when the statement is SEARCH (maintained-text-index probe)."""
    return bool(_SEARCH_RE.match(sql or ""))


def execute_search(table: LakeTable, sql: str, name: str = "t") -> DataFrame:
    """Route a retrieval statement onto a maintained inverted text index
    (the SQL twin of the ``search`` CLI). Accepted form::

        SEARCH <idx> FOR '<query>'[, '<v2>'…]
          [MODE term|and|phrase|bm25|bm25_and] [LIMIT k]

    ``<idx>`` is a quoted path or a bare name (sibling of the base root —
    same resolution as CREATE INDEX). Modes map to the index's probe
    family: ``term`` (single token), ``and`` (tf-ranked all-tokens),
    ``phrase`` (position-adjacent), ``bm25`` (idf-weighted OR — the
    default) and ``bm25_and``. Every probe is the index's own
    partition-pruned scan — the base table is never touched."""
    m = re.match(
        rf"^\s*search\s+{_MV_TARGET}\s+for\s+"
        r"('(?:[^']|'')*'(?:\s*,\s*'(?:[^']|'')*')*)"
        r"(?:\s+mode\s+([A-Za-z_]\w*))?"
        r"(?:\s+limit\s+(\d+))?\s*;?\s*$",
        sql, re.I | re.S,
    )
    if not m:
        raise ValueError(
            "unsupported SEARCH (want: SEARCH <idx> FOR '<query>'[, '<v2>'…] "
            "[MODE term|and|phrase|bm25|bm25_and] [LIMIT k])"
        )
    from maestro_spark import index_maint as IM

    idx = IM.load_index(table.spark, _idx_root(m.group(1), table), base=table)
    if not hasattr(idx, "search_bm25"):
        raise ValueError(
            f"SEARCH wants a text index; {type(idx).__name__} is not one"
        )
    vals = [v[1:-1].replace("''", "'") for v in _split_top(m.group(2))]
    value_cols = getattr(idx, "value_cols", None)
    if len(vals) > 1 or (value_cols and len(value_cols) > 1):
        # a quoted tuple probes a COMPOSITE value index (one value per
        # indexed column, arity-checked by lookup itself); any other index
        # kind takes exactly one query string
        if not value_cols:
            raise ValueError(
                "SEARCH with a value list probes a composite value index; "
                f"{type(idx).__name__} takes one '<query>'"
            )
        if m.group(3) and m.group(3).lower() != "term":
            raise ValueError("a composite value probe is MODE term only")
        out = idx.lookup(vals)
        return out.limit(int(m.group(4))) if m.group(4) else out
    text = vals[0]
    # default mode is the index kind's own (bm25 for text, term for value)
    mode = (m.group(3) or getattr(idx, "DEFAULT_SEARCH_MODE", "bm25")).lower()
    k = int(m.group(4)) if m.group(4) else None
    if mode == "term":
        return idx.search(text, k=k)
    if mode == "and":
        return idx.search_all(text, k=k)
    if mode == "phrase":
        return idx.search_phrase(text, k=k)
    if mode in ("bm25", "bm25_and"):
        return idx.search_bm25(text, k=k,
                               mode="and" if mode == "bm25_and" else "or")
    raise ValueError(
        f"unknown SEARCH mode {mode!r} — accepted: term, and, phrase, "
        "bm25, bm25_and"
    )


# ------------------------------------------------------- table provisioning
_TABLE_DDL_RE = re.compile(r"^\s*(create|drop)\s+table\b", re.I)


def is_table_ddl(sql: str) -> bool:
    """True when the statement is CREATE TABLE / CTAS / DROP TABLE."""
    return bool(_TABLE_DDL_RE.match(sql or ""))


def parse_table_ddl(sql: str) -> dict:
    """Parse one table-provisioning statement (the warehouse front door's
    grammar — see :func:`maestro_spark.lake.warehouse_sql`) into a plain
    spec dict. Accepted forms::

        CREATE TABLE [IF NOT EXISTS] <name> (col type, …) [WITH (n_buckets = K)]
        CREATE TABLE [IF NOT EXISTS] <name> [WITH (…)] AS SELECT …
        DROP TABLE [IF EXISTS] <name>

    Column definitions go to Spark's DDL schema parser verbatim
    (``StructType.fromDDL``), so the type dialect is exactly Spark's.
    Anything outside the grammar refuses with the reason."""
    s = sql.strip().rstrip(";").strip()
    dm = re.match(r"^drop\s+table\s+(if\s+exists\s+)?([A-Za-z_]\w*)$", s, re.I)
    if dm:
        return {"op": "drop", "if_exists": bool(dm.group(1)),
                "name": dm.group(2)}
    cm = re.match(
        r"^create\s+table\s+(if\s+not\s+exists\s+)?([A-Za-z_]\w*)\s*(.*)$",
        s, re.I | re.S,
    )
    if not cm:
        raise ValueError(
            "unsupported table statement (want: CREATE TABLE [IF NOT "
            "EXISTS] <name> (col type, …) [WITH (…)], CREATE TABLE … AS "
            "SELECT …, or DROP TABLE [IF EXISTS] <name>)"
        )
    if_not_exists, name, rest = bool(cm.group(1)), cm.group(2), cm.group(3).strip()
    columns = None
    if rest.startswith("("):
        depth, close = 0, -1
        for i, ch in enumerate(rest):  # cols can nest parens: decimal(18,2)
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0:
                close = i
                break
        if close < 0:
            raise ValueError("unbalanced parentheses in column list")
        columns, rest = rest[1:close].strip(), rest[close + 1 :].strip()
    params: dict[str, object] = {}
    if wm := re.match(r"^with\s*\((.*?)\)\s*(.*)$", rest, re.I | re.S):
        params, rest = _parse_with_params(wm.group(1)), wm.group(2).strip()
    select = None
    if am := re.match(r"^as\s+(select\b.*)$", rest, re.I | re.S):
        select, rest = am.group(1), ""
    if rest:
        raise ValueError(f"cannot parse CREATE TABLE tail {rest!r}")
    if (columns is None) == (select is None):
        raise ValueError(
            "CREATE TABLE takes a column list OR AS SELECT …, exactly one"
        )
    return {"op": "create", "if_not_exists": if_not_exists, "name": name,
            "columns": columns, "params": params, "select": select}


_SHOW_DERIVED_RE = re.compile(
    r"^\s*show\s+(materialized\s+views|indexes)(?:\s+on\s+([A-Za-z_]\w*))?"
    r"\s*;?\s*$",
    re.I,
)


def show_derived_target(sql: str) -> tuple[str, str | None] | None:
    """``SHOW MATERIALIZED VIEWS [ON <t>]`` / ``SHOW INDEXES [ON <t>]`` →
    ``("views"|"indexes", table_or_None)``; None for anything else. Routed
    onto the persisted-declaration registries (ivm.list_declared /
    index_maint.list_declared) — metadata only, no Spark jobs."""
    if m := _SHOW_DERIVED_RE.match(sql or ""):
        kind = "views" if m.group(1).lower().startswith("materialized") else "indexes"
        return kind, (_strip_ident(m.group(2)) if m.group(2) else None)
    return None


_SHOW_CREATE_RE = re.compile(
    r"^\s*show\s+create\s+table\s+([A-Za-z_]\w*)\s*;?\s*$", re.I
)


def show_create_target(sql: str) -> str | None:
    """``SHOW CREATE TABLE <t>`` → the table name; None otherwise."""
    if m := _SHOW_CREATE_RE.match(sql or ""):
        return _strip_ident(m.group(1))
    return None


# ------------------------------------------------- metadata-table DESCRIBE
_META_RE = re.compile(
    r"^\s*describe\s+(history|files)\s+([A-Za-z_]\w*)\s*;?\s*$", re.I
)


def describe_meta(sql: str) -> tuple[str, str] | None:
    """``DESCRIBE HISTORY <t>`` / ``DESCRIBE FILES <t>`` (Delta/Iceberg
    metadata-table parity) → ``(kind, table)``; None for anything else.
    Routed onto :meth:`LakeTable.meta_snapshots` / ``meta_files`` — pure
    snapshot-chain metadata, no data IO."""
    if m := _META_RE.match(sql or ""):
        return m.group(1).lower(), _strip_ident(m.group(2))
    return None


_TARGET_RES = [
    re.compile(p, re.I)
    for p in (
        r"^\s*insert\s+into\s+([A-Za-z_]\w*)\b",
        r"^\s*update\s+([A-Za-z_]\w*)\b",
        r"^\s*delete\s+from\s+([A-Za-z_]\w*)\b",
        r"^\s*merge\s+into\s+([A-Za-z_]\w*)\b",
        r"^\s*truncate\s+table\s+([A-Za-z_]\w*)\b",
        r"^\s*alter\s+table\s+([A-Za-z_]\w*)\b",
        r"^\s*optimize\s+([A-Za-z_]\w*)\b",
        r"^\s*vacuum\s+([A-Za-z_]\w*)\b",
        r"^\s*copy\s+into\s+([A-Za-z_]\w*)\b",
        r"^\s*restore\s+table\s+([A-Za-z_]\w*)\b",
    )
]


def statement_target(sql: str) -> str | None:
    """The table name a single-table routed statement operates on (DML,
    ALTER, OPTIMIZE/VACUUM) — how the warehouse front door picks which
    ``LakeTable.sql`` to delegate to. None for SELECTs and for statement
    kinds whose target is a view/index path rather than a table."""
    for rx in _TARGET_RES:
        if m := rx.match(sql or ""):
            return _strip_ident(m.group(1))
    return None


# ------------------------------------------------------------- COPY INTO
_COPY_RE = re.compile(r"^\s*copy\s+into\b", re.I)


def is_copy(sql: str) -> bool:
    """True when the statement is COPY INTO."""
    return bool(_COPY_RE.match(sql or ""))


def execute_copy(table: LakeTable, sql: str, name: str = "t") -> dict:
    """Compile one ``COPY INTO`` statement onto :func:`ingest.copy_into`
    (idempotent per-file bulk load). Accepted form::

        COPY INTO <t> FROM '<dir-or-glob>'
          FILEFORMAT = <csv|json|parquet|orc|debezium>
          [WITH (option = value, …)]

    ``per_file = 0`` in WITH selects the batched commit mode (all pending
    files as ONE merge epoch — the many-small-files shape); ``evolve = 1``
    turns unknown incoming columns into schema evolution instead of a
    refusal (merge-side add-only/safe-widen gate — see
    :func:`ingest.copy_into`); every other option passes through to the
    typed reader (e.g. ``sep = '|'`` for CSV); anything outside the
    grammar refuses with the reason."""
    m = re.match(
        r"^\s*copy\s+into\s+([A-Za-z_][\w.]*)\s+from\s+'([^']+)'\s+"
        r"fileformat\s*=\s*([A-Za-z]+)"
        r"(?:\s+with\s*\((.*?)\))?\s*;?\s*$",
        sql, re.I | re.S,
    )
    if not m:
        raise ValueError(
            "unsupported COPY statement (want: COPY INTO <t> FROM '<path>' "
            "FILEFORMAT = <csv|json|parquet|orc|debezium> "
            "[WITH (option = value, …)])"
        )
    _require_target(_strip_ident(m.group(1)), name)
    from maestro_spark.ingest import copy_into

    options = _parse_with_params(m.group(4)) if m.group(4) else {}
    per_file = bool(options.pop("per_file", 1))
    evolve = bool(options.pop("evolve", 0))
    return copy_into(table, m.group(2), m.group(3), per_file=per_file,
                     evolve=evolve, **options)


# ---------------------------------------------------------- RESTORE TABLE
_RESTORE_RE = re.compile(r"^\s*restore\s+table\b", re.I)


def is_restore(sql: str) -> bool:
    """True when the statement is RESTORE TABLE."""
    return bool(_RESTORE_RE.match(sql or ""))


def execute_restore(table: LakeTable, sql: str, name: str = "t") -> Snapshot:
    """Compile one ``RESTORE TABLE`` statement (Delta parity) onto
    :meth:`LakeTable.rollback`. Accepted form::

        RESTORE TABLE <t> TO VERSION AS OF <id | 'tag'>
        RESTORE TABLE <t> TO TIMESTAMP AS OF <'iso' | epoch-seconds>

    Forward-only history, same as the native call: the restore publishes a
    NEW snapshot re-stating the target's content; the bad epochs stay
    visible for audit and the change feed refuses ranges spanning the
    boundary (consumers re-sync)."""
    m = re.match(
        r"^\s*restore\s+table\s+([A-Za-z_][\w.]*)\s+to\s+"
        r"(version|timestamp)\s+as\s+of\s+"
        r"('[^']*'|\"[^\"]*\"|\d+(?:\.\d+)?)\s*;?\s*$",
        sql, re.I,
    )
    if not m:
        raise ValueError(
            "unsupported RESTORE statement (want: RESTORE TABLE <t> TO "
            "VERSION AS OF <id|'tag'> or TO TIMESTAMP AS OF <'iso'|epoch>)"
        )
    _require_target(_strip_ident(m.group(1)), name)
    kind = m.group(2).upper()
    sid = table._resolve_tt_pins([(kind, m.group(3))])
    return table.rollback(sid)
