"""SQL ``MERGE INTO`` surface over :class:`LakehouseTable`.

The reference's Delta path issues MERGE as a literal SQL string
(/root/reference/README.md:1213-1224):

    MERGE INTO delta_merge_test t USING cdc_data_deduped s
    ON t.pk_id = s.pk_id
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

``execute_merge`` accepts that statement shape verbatim and runs it
against the engine's own table machinery — the missing piece between
"call ``table.upsert(df)`` from Python" and "paste the notebook's SQL".

Grammar (the reference's surface plus Delta's conditional/delete
clauses; anything else raises):

    MERGE INTO <target> [AS] [<alias>]
    USING <source temp view> [AS] [<alias>]
    ON <equality conjunction over the target's resolution columns>
    { WHEN MATCHED [AND <cond>] THEN
        { UPDATE SET * | UPDATE SET <col> = <expr>[, ...] | DELETE } }*
    { WHEN NOT MATCHED [AND <cond>] THEN
        { INSERT * | INSERT (<col>, ...) VALUES (<expr>, ...) } }*
    { WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
        { DELETE | UPDATE SET <col> = <expr>[, ...] } }*

Execution model (Delta semantics, Spark-first physical plan):
each source row is routed to the FIRST clause whose condition it
satisfies — one inner join against the target snapshot tags rows
``matched``/``unmatched``, clause conditions become one chained
``when/otherwise`` expression (pure JVM codegen, no Python row work) —
then the tagged frame fans into at most two commits: ``delete(keys)``
for DELETE rows and ``upsert(rows)`` for UPDATE ∪ INSERT rows, both of
which reuse the partition/key-range/bloom-pruned write paths. Multiple
source rows per key must be pre-reduced (C5 latest-change-per-key,
README.md:1215-1221) exactly as Delta requires; the engine's
precombine catches stragglers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

_HEAD_RE = re.compile(
    r"^\s*MERGE\s+(?P<sev>WITH\s+SCHEMA\s+EVOLUTION\s+)?"
    r"INTO\s+(?P<target>\w+)(?:\s+AS)?(?:\s+(?P<talias>\w+))?"
    r"\s+USING\s+(?P<source>\w+)(?:\s+AS)?(?:\s+(?P<salias>\w+))?"
    r"\s+ON\s+(?P<on>.+?)"
    r"(?=\s+WHEN\s+)",
    re.IGNORECASE | re.DOTALL,
)
_CLAUSE_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+(?:\*|.+?)|INSERT\s+\*"
    r"|INSERT\s*\(.+?\)\s*VALUES\s*\(.+?\)|DELETE)"
    # the action terminator must anchor to a REAL clause boundary —
    # a bare `\s+WHEN\s+` lookahead truncated CASE WHEN expressions
    # inside SET assignments (r13 ADVICE)
    r"(?=\s+WHEN\s+(?:NOT\s+)?MATCHED\b|\s*;?\s*$)",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_COLS_RE = re.compile(
    r"^\s*INSERT\s*\((?P<cols>.+?)\)\s*VALUES\s*\((?P<vals>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass(frozen=True)
class MergeClause:
    matched: bool
    condition: str | None  # SQL expr over t./s. columns, None = always
    action: str  # update | insert | delete
    #: Delta's third clause group: WHEN NOT MATCHED BY SOURCE operates
    #: on TARGET rows whose key is absent from the source — DELETE
    #: (sync deletion) or UPDATE SET col = expr, ... over TARGET
    #: columns (the "mark stale rows" full-sync idiom, r12). ``UPDATE
    #: SET *`` stays invalid on this branch: no source row exists to
    #: star-expand from.
    by_source: bool = False
    #: explicit column bindings, as ``[(target_col, sql_expr)]`` —
    #: None for star/delete actions. Three shapes carry them (r13):
    #: by-source UPDATE SET (exprs over TARGET cols, alias stripped),
    #: matched UPDATE SET (exprs may reference BOTH aliases — they
    #: run over the routed-source × target join), and explicit-column
    #: INSERT (cols) VALUES (exprs over SOURCE cols).
    assignments: tuple[tuple[str, str], ...] | None = None


@dataclass(frozen=True)
class MergeSpec:
    target: str
    target_alias: str
    source: str
    source_alias: str
    on: str
    clauses: tuple[MergeClause, ...]
    #: MERGE WITH SCHEMA EVOLUTION INTO ... (Delta's explicit opt-in):
    #: star clauses ADD new source columns to the target instead of
    #: dropping them; existing rows read the new column as null
    schema_evolution: bool = False


def parse_merge(sql: str) -> MergeSpec:
    head = _HEAD_RE.search(sql)
    if not head:
        raise ValueError(f"unparseable MERGE statement: {sql[:120]!r}")
    talias = head.group("talias") or head.group("target")
    clauses = []
    for m in _CLAUSE_RE.finditer(sql):
        raw_action = m.group("action")
        action = re.sub(r"\s+", " ", raw_action.upper())
        matched = m.group("not") is None
        by_source = m.group("bysrc") is not None
        assignments = None
        ins = _INSERT_COLS_RE.match(raw_action)
        if by_source:
            if matched:
                raise ValueError("WHEN MATCHED BY SOURCE is not valid")
            if action.startswith("UPDATE SET"):
                if action == "UPDATE SET *":
                    raise ValueError(
                        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET * "
                        "is not valid (no source row to expand from); "
                        "use explicit SET col = expr assignments"
                    )
                # r12: explicit assignments over TARGET columns —
                # Delta's "mark stale rows" full-sync idiom. The
                # target alias is noise once the expressions run over
                # the target snapshot directly — strip it OUTSIDE
                # string literals only (r13: a naive re.sub rewrote
                # `'tgt.stale'` to `'stale'`).
                sets = re.sub(
                    r"^\s*UPDATE\s+SET\s+", "", raw_action,
                    flags=re.IGNORECASE,
                )
                assignments = tuple(
                    (col, _strip_alias_unquoted(expr, talias))
                    for col, expr in _split_set_list(sets, talias)
                )
            elif action != "DELETE":
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports DELETE or "
                    "UPDATE SET col = expr (INSERT has no source row)"
                )
        elif action == "DELETE" and not matched:
            raise ValueError("WHEN NOT MATCHED THEN DELETE is not valid")
        elif action.startswith("UPDATE SET") and action != "UPDATE SET *":
            # r13: matched-clause explicit assignments (Delta's most
            # common real-world MERGE shape). Expressions may reference
            # BOTH aliases — they evaluate over the routed-source ×
            # target join — so only the LHS alias is normalized away.
            if not matched:
                raise ValueError(
                    "WHEN NOT MATCHED THEN UPDATE is not valid"
                )
            sets = re.sub(
                r"^\s*UPDATE\s+SET\s+", "", raw_action,
                flags=re.IGNORECASE,
            )
            assignments = tuple(_split_set_list(sets, talias))
        elif ins:
            # r13: INSERT (cols) VALUES (exprs) — explicit column
            # binding; unlisted target columns insert as NULL
            if matched:
                raise ValueError("WHEN MATCHED THEN INSERT is not valid")
            cols = [c.strip() for c in _split_top_level(ins.group("cols"))]
            vals = [v.strip() for v in _split_top_level(ins.group("vals"))]
            if len(cols) != len(vals):
                raise ValueError(
                    f"INSERT column/value count mismatch: "
                    f"{len(cols)} columns, {len(vals)} values"
                )
            bad = [c for c in cols if not re.fullmatch(r"\w+", c)]
            if bad:
                raise ValueError(
                    f"INSERT column list must be unqualified target "
                    f"columns, got {bad}"
                )
            assignments = tuple(zip(cols, vals))
            action = "INSERT"
        if action == "INSERT *" and matched:
            raise ValueError("WHEN MATCHED THEN INSERT is not valid")
        if action == "UPDATE SET *" and not matched and not by_source:
            raise ValueError("WHEN NOT MATCHED THEN UPDATE is not valid")
        clauses.append(
            MergeClause(
                matched=matched,
                condition=(m.group("cond") or "").strip() or None,
                action=action.split(" ")[0].lower(),
                by_source=by_source,
                assignments=assignments,
            )
        )
    if not clauses:
        raise ValueError("MERGE needs at least one WHEN clause")
    # without AS-aliases the table names themselves qualify columns
    return MergeSpec(
        target=head.group("target"),
        target_alias=head.group("talias") or head.group("target"),
        source=head.group("source"),
        source_alias=head.group("salias") or head.group("source"),
        on=head.group("on").strip(),
        clauses=tuple(clauses),
        schema_evolution=head.group("sev") is not None,
    )


def _on_source_keys(spec: MergeSpec, table: LakehouseTable) -> dict[str, str]:
    """Validate the ON condition is an equality conjunction covering the
    table's resolution columns and return target-col -> source-col. The
    restriction is Hudi/Delta reality: a keyed upsert resolves on the
    record key; arbitrary ON thetas would silently change semantics."""
    t, s = spec.target_alias, spec.source_alias
    pairs: dict[str, str] = {}
    for part in re.split(r"\s+AND\s+", spec.on, flags=re.IGNORECASE):
        m = re.match(
            rf"^\s*(?:({t}|{s})\.)?(\w+)\s*=\s*(?:({t}|{s})\.)?(\w+)\s*$",
            part,
        )
        if not m:
            raise ValueError(f"ON must be an equality conjunction: {part!r}")
        a_side, a_col, b_side, b_col = m.groups()
        if a_side == s or b_side == t:  # normalize to target = source
            a_col, b_col = b_col, a_col
        pairs[a_col] = b_col
    # the statement speaks LOGICAL names; resolution cols are physical
    mapping = table._commit(None).column_mapping
    missing = [
        mapping.get(k, k)
        for k in table._resolution_cols()
        if mapping.get(k, k) not in pairs
    ]
    if missing:
        raise ValueError(
            f"ON must cover the table's key columns; missing {missing}"
        )
    return pairs


def _key_join_expr(spec: MergeSpec, key_map: dict[str, str]):
    """Target-alias × source-alias key equality (null-safe, Delta's
    ON semantics) over the validated ON mapping."""
    on_cols = [
        F.col(f"{spec.target_alias}.{tc}").eqNullSafe(
            F.col(f"{spec.source_alias}.{sc}")
        )
        for tc, sc in key_map.items()
    ]
    on_expr = on_cols[0]
    for e in on_cols[1:]:
        on_expr = on_expr & e
    return on_expr


def execute_merge(
    spark: SparkSession,
    sql: str,
    tables: dict[str, LakehouseTable],
) -> dict:
    """Parse and run a MERGE statement. The target resolves through
    ``tables``; the source is a Spark temp view (or catalog table).
    Returns per-action row counts plus the commits made."""
    spec = parse_merge(sql)
    if spec.target not in tables:
        raise KeyError(f"unknown MERGE target table: {spec.target}")
    table = tables[spec.target]
    key_map = _on_source_keys(spec, table)

    src = spark.table(spec.source).alias(spec.source_alias)
    # snapshot of target KEYS only — routing needs existence, not
    # payload, so the probe scan is column-pruned to the key columns.
    # No broadcast hint: the small CDC batch side shuffles cheaply and
    # the key scan's shuffle is the unavoidable index-probe cost (the
    # metadata key-range/bloom pruning inside upsert/delete still
    # bounds the WRITE side to candidate files).
    tgt_keys = (
        table.read()
        .select(*key_map.keys())
        .distinct()
        .withColumn("__m", F.lit(True))
        .alias(spec.target_alias)
    )
    routed = src.join(tgt_keys, _key_join_expr(spec, key_map), "left_outer").select(
        f"{spec.source_alias}.*",
        F.coalesce(
            F.col(f"{spec.target_alias}.__m"), F.lit(False)
        ).alias("__matched"),
    )

    src_clauses = [c for c in spec.clauses if not c.by_source]
    bysrc_clauses = [c for c in spec.clauses if c.by_source]

    # first-satisfied-clause routing, exactly Delta's clause order.
    # Labels carry the clause INDEX (r13) so assignment-bearing
    # clauses resolve their own rows at write time.
    action = F.lit(None).cast("string")
    assigned = F.lit(False)
    for i, c in enumerate(src_clauses):
        hit = F.col("__matched") if c.matched else ~F.col("__matched")
        if c.condition is not None:
            cond = _strip_alias_unquoted(
                c.condition, spec.source_alias
            )  # source cols are top-level after the select above
            hit = hit & F.expr(cond)
        action = F.when(
            ~assigned & hit, F.lit(f"{c.action}:{i}")
        ).otherwise(action)
        assigned = assigned | hit
    routed = routed.withColumn("__action", action)

    label_counts = {
        r["__action"]: r["n"]
        for r in routed.groupBy("__action")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    counts = {"update": 0, "insert": 0, "delete": 0,
              None: label_counts.get(None, 0)}
    for lbl, n in label_counts.items():
        if lbl is not None:
            counts[lbl.split(":")[0]] += n
    # Delta's third clause group: TARGET rows whose key is absent from
    # the source (one left-anti probe of the key-pruned target scan),
    # first-satisfied-clause routed like the source group — DELETE
    # (sync deletion) or UPDATE SET col = expr ("mark stale", r12)
    deleted_by_source = 0
    updated_by_source = 0
    bysrc_keys = None
    bysrc_updates = None
    if bysrc_clauses:
        tcols = list(key_map.keys())
        src_keys = src.select(
            *[
                F.col(f"{spec.source_alias}.{sc}").alias(tc)
                for tc, sc in key_map.items()
            ]
        ).distinct()
        missing = table.read().join(src_keys, tcols, "left_anti")
        b_action = F.lit(None).cast("string")
        b_assigned = F.lit(False)
        for i, c in enumerate(bysrc_clauses):
            hit = F.lit(True)
            if c.condition is not None:
                hit = F.expr(
                    _strip_alias_unquoted(c.condition, spec.target_alias)
                )
            b_action = F.when(
                ~b_assigned & hit, F.lit(f"{c.action}:{i}")
            ).otherwise(b_action)
            b_assigned = b_assigned | hit
        missing = missing.withColumn("__baction", b_action)
        b_counts = {
            r["__baction"]: r["n"]
            for r in missing.groupBy("__baction")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        del_labels = [
            f"delete:{i}"
            for i, c in enumerate(bysrc_clauses)
            if c.action == "delete"
        ]
        deleted_by_source = sum(b_counts.get(x, 0) for x in del_labels)
        if deleted_by_source:
            bysrc_keys = (
                missing.filter(F.col("__baction").isin(del_labels))
                .select(*tcols)
                .distinct()
            )
        for i, c in enumerate(bysrc_clauses):
            if c.action != "update" or not b_counts.get(f"update:{i}"):
                continue
            updated_by_source += b_counts[f"update:{i}"]
            rows = missing.filter(F.col("__baction") == f"update:{i}")
            for col, expr in c.assignments or ():
                rows = rows.withColumn(col, F.expr(expr))
            bysrc_updates = (
                rows
                if bysrc_updates is None
                else bysrc_updates.unionByName(rows)
            )

    commits = []
    deletes = routed.filter(
        F.col("__action").startswith("delete")
    ).select(*[F.col(s).alias(t) for t, s in key_map.items()])
    if counts.get("delete") or deleted_by_source:
        all_deletes = deletes
        if bysrc_keys is not None:
            # one delete commit for both clause groups
            all_deletes = deletes.unionByName(bysrc_keys)
        commits.append(table.delete(all_deletes).version)
    # UPDATE SET * / INSERT * write the TARGET's data columns (the
    # source may carry extras, e.g. CDC envelope fields) — Delta's
    # star-clause resolves against the target schema the same way
    data_cols = [
        c
        for c in table.read().columns
        if not c.startswith("_hoodie_") and c != "__pp"
    ]
    if spec.schema_evolution:
        # WITH SCHEMA EVOLUTION: star clauses carry the source's NEW
        # columns into the target (additive evolution inside upsert);
        # without it extras drop, Delta's default. Engine-internal
        # columns a source view may carry (_hoodie_* meta, partition /
        # bucket tokens) are never data — same exclusions as data_cols
        known = set(data_cols) | {"__matched", "__action"}
        data_cols = data_cols + [
            c
            for c in routed.columns
            if c not in known
            and not c.startswith("_hoodie_")
            and not re.match(r"__pp\d*$|__bk$", c)
        ]
    star_labels = [
        f"{c.action}:{i}"
        for i, c in enumerate(src_clauses)
        if c.action in ("update", "insert") and c.assignments is None
    ]
    # star clauses require the source to carry every target data
    # column; assignment clauses don't — build the write batch lazily
    # so a no-star merge never projects absent columns
    writes = (
        routed.filter(F.col("__action").isin(star_labels))
        .select(*data_cols)
        if star_labels
        else None
    )
    tgt_types = {f.name: f.dataType for f in table.read().schema.fields}
    for i, c in enumerate(src_clauses):
        if c.assignments is None or not label_counts.get(f"{c.action}:{i}"):
            continue
        rows = routed.filter(F.col("__action") == f"{c.action}:{i}")
        if c.action == "update":
            # matched UPDATE SET col = expr: expressions may reference
            # BOTH aliases, so join the routed source rows back to the
            # full target snapshot (the routing probe was keys-only);
            # unassigned target columns carry through unchanged
            tgt_full = table.read().alias(spec.target_alias)
            rows = rows.alias(spec.source_alias).join(
                tgt_full,
                _key_join_expr(spec, key_map),
                "inner",
            )
            amap = dict(c.assignments)
            unknown = [col for col in amap if col not in tgt_types]
            if unknown:
                raise ValueError(
                    f"UPDATE SET names unknown target columns {unknown}"
                )
            frame = rows.select(*[
                F.expr(amap[col]).cast(tgt_types[col]).alias(col)
                if col in amap
                else F.col(f"{spec.target_alias}.{col}").alias(col)
                for col in data_cols
                if col in tgt_types
            ])
        else:  # explicit-column INSERT: unlisted columns become NULL
            amap = {
                col: _strip_alias_unquoted(expr, spec.source_alias)
                for col, expr in c.assignments
            }
            unknown = [col for col in amap if col not in tgt_types]
            if unknown:
                raise ValueError(
                    f"INSERT names unknown target columns {unknown}"
                )
            frame = rows.select(*[
                F.expr(amap[col]).cast(tgt_types[col]).alias(col)
                if col in amap
                else F.lit(None).cast(tgt_types[col]).alias(col)
                for col in data_cols
                if col in tgt_types
            ])
        writes = (
            frame
            if writes is None
            else writes.unionByName(frame, allowMissingColumns=True)
        )
    if bysrc_updates is not None:
        # by-source updated TARGET rows re-enter the same upsert batch
        # (one write commit for all three clause groups' row changes)
        b = bysrc_updates.select(
            *[c for c in data_cols if c in bysrc_updates.columns]
        )
        writes = (
            b
            if writes is None
            else writes.unionByName(b, allowMissingColumns=True)
        )
    if counts.get("update") or counts.get("insert") or updated_by_source:
        commits.append(table.upsert(writes).version)
    return {
        "updated": counts.get("update", 0),
        "inserted": counts.get("insert", 0),
        "deleted": counts.get("delete", 0),
        "deleted_by_source": deleted_by_source,
        "updated_by_source": updated_by_source,
        "skipped": counts.get(None, 0),
        "commits": commits,
    }


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<target>\w+)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<target>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(text: str) -> list[str]:
    """Split on top-level commas: commas inside parens (function
    calls) or single-quoted SQL string literals don't split, and
    quoted parens don't perturb the depth counter. Doubled quotes
    (SQL escape: ``''``) stay inside the literal naturally — the
    second quote just re-enters quoted state for the escaped
    character."""
    parts, depth, buf, in_str = [], 0, [], False
    for ch in text:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        if ch == "," and depth == 0 and not in_str:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _strip_alias_unquoted(text: str, alias: str) -> str:
    """Remove ``alias.`` prefixes OUTSIDE single-quoted SQL string
    literals (r13: a bare re.sub rewrote ``'tgt.stale'`` to
    ``'stale'``). Splitting on quotes puts literals at odd indices;
    doubled-quote escapes only add empty odd segments."""
    pat = re.compile(rf"\b{re.escape(alias)}\.")
    return "'".join(
        seg if i % 2 else pat.sub("", seg)
        for i, seg in enumerate(text.split("'"))
    )


def _split_set_list(
    sets: str, lhs_alias: str | None = None
) -> list[tuple[str, str]]:
    """Parse a SET list into ``(col, expr)`` pairs via the top-level
    comma splitter. The LHS may carry the target alias
    (``t.col = …``) — accepted only when it names ``lhs_alias``."""
    out = []
    for part in _split_top_level(sets):
        m = re.match(
            r"^\s*(?:(\w+)\.)?(\w+)\s*=\s*(.+?)\s*$", part, re.DOTALL
        )
        if not m:
            raise ValueError(f"bad SET assignment: {part!r}")
        qual, col, expr = m.groups()
        if qual is not None and qual != lhs_alias:
            raise ValueError(
                f"SET target column {qual}.{col} does not name the "
                f"target alias {lhs_alias!r}"
            )
        out.append((col, expr))
    return out


def execute_update(
    spark: SparkSession, sql: str, tables: dict[str, LakehouseTable]
) -> dict:
    """``UPDATE <table> SET col = expr[, ...] [WHERE pred]`` — the
    reference scenario's source-side statement (README.md:185) as a
    direct lakehouse DML. The WHERE predicate pushes into the snapshot
    scan; only matched rows re-enter ``upsert``, whose partition/
    key-range/bloom/record-index probes bound the rewrite to the files
    those keys live in — an UPDATE touching 0.1% of keys rewrites
    ~0.1% of file groups, never the table."""
    m = _UPDATE_RE.match(sql)
    if not m:
        raise ValueError(f"unparseable UPDATE: {sql!r}")
    if m.group("target") not in tables:
        raise KeyError(f"unknown UPDATE target: {m.group('target')}")
    table = tables[m.group("target")]
    rows = table.read()
    if m.group("where"):
        rows = rows.filter(F.expr(m.group("where")))
    set_cols = set()
    for col, expr in _split_set_list(m.group("sets")):
        rows = rows.withColumn(col, F.expr(expr))
        set_cols.add(col)
    # The snapshot rows carry STORED generated-column values; when a SET
    # changes an input of a generated expression, feeding the stale
    # stored value back would fail _apply_generated's provided-value
    # validation. Drop untouched generated columns so upsert recomputes
    # them from the updated inputs (an explicit SET of a generated
    # column stays, so its validation still applies).
    recompute = set(table.generated_columns) - set_cols
    data_cols = [
        c
        for c in rows.columns
        if not c.startswith("_hoodie_") and c != "__pp" and c not in recompute
    ]
    # localCheckpoint: materialize the matched+transformed rows once —
    # counting and then upserting the raw lineage would scan the
    # snapshot twice
    rows = rows.select(*data_cols).localCheckpoint()
    n = rows.count()
    if n == 0:
        return {"updated": 0, "commits": []}
    commit = table.upsert(rows)
    return {"updated": n, "commits": [commit.version]}


def execute_delete(
    spark: SparkSession, sql: str, tables: dict[str, LakehouseTable]
) -> dict:
    """``DELETE FROM <table> [WHERE pred]`` (README.md:186): matched
    keys route into ``table.delete`` — copy-on-write rewrite of only
    the holding files, or an O(deleted rows) deletion-vector append on
    ``deletion_vectors`` tables."""
    m = _DELETE_RE.match(sql)
    if not m:
        raise ValueError(f"unparseable DELETE: {sql!r}")
    if m.group("target") not in tables:
        raise KeyError(f"unknown DELETE target: {m.group('target')}")
    table = tables[m.group("target")]
    rows = table.read()
    if m.group("where"):
        rows = rows.filter(F.expr(m.group("where")))
    mapping = table._commit(None).column_mapping
    # resolution columns, not just key columns: non-global partitioned
    # tables resolve deletes on (key, partition), and delete() needs
    # the partition value to prune candidate files
    logical_keys = [
        mapping.get(k, k) for k in table._resolution_cols()
    ]
    # localCheckpoint: materialize once — the count and the delete's
    # probe would otherwise each recompute the filtered snapshot scan
    keys = rows.select(*logical_keys).distinct().localCheckpoint()
    n = keys.count()
    if n == 0:
        return {"deleted": 0, "commits": []}
    commit = table.delete(keys)
    return {"deleted": n, "commits": [commit.version]}


# --------------------------------------------------------------------- #
# Delta utility DDL as SQL strings (r6): the statements the reference's
# Delta half would issue from a notebook (README.md:1230-1240 names
# VACUUM/OPTIMIZE; the rest are the standard Delta utility surface)
# resolved against the same name -> LakehouseTable registry MERGE uses.
# --------------------------------------------------------------------- #

_DDL_RES: list[tuple[str, re.Pattern]] = [
    ("vacuum", re.compile(
        r"^\s*VACUUM\s+(?P<t>\w+)"
        r"(?:\s+RETAIN\s+(?P<n>\d+)\s+(?P<unit>VERSIONS?|HOURS?))?"
        r"(?:\s+(?P<dry>DRY\s+RUN))?\s*$",
        re.IGNORECASE)),
    ("optimize", re.compile(
        r"^\s*OPTIMIZE\s+(?P<t>\w+)"
        r"(?:\s+WHERE\s+(?P<wc>\w+)\s*=\s*"
        r"(?:'(?P<wvq>[^']*)'|(?P<wv>[^'\s]+)))?"
        r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<z>[\w\s,]+?)\s*\))?\s*$",
        re.IGNORECASE)),
    ("restore", re.compile(
        r"^\s*RESTORE\s+TABLE\s+(?P<t>\w+)\s+TO\s+VERSION\s+AS\s+OF"
        r"\s+(?P<v>\d+)\s*$",
        re.IGNORECASE)),
    ("history", re.compile(
        r"^\s*DESCRIBE\s+HISTORY\s+(?P<t>\w+)\s*$", re.IGNORECASE)),
    ("detail", re.compile(
        r"^\s*DESCRIBE\s+DETAIL\s+(?P<t>\w+)\s*$", re.IGNORECASE)),
    ("add_constraint", re.compile(
        r"^\s*ALTER\s+TABLE\s+(?P<t>\w+)\s+ADD\s+CONSTRAINT\s+"
        r"(?P<name>\w+)\s+CHECK\s*\(\s*(?P<pred>.+?)\s*\)\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("drop_constraint", re.compile(
        r"^\s*ALTER\s+TABLE\s+(?P<t>\w+)\s+DROP\s+CONSTRAINT\s+"
        r"(?P<name>\w+)\s*$",
        re.IGNORECASE)),
    ("rename_column", re.compile(
        r"^\s*ALTER\s+TABLE\s+(?P<t>\w+)\s+RENAME\s+COLUMN\s+"
        r"(?P<a>\w+)\s+TO\s+(?P<b>\w+)\s*$",
        re.IGNORECASE)),
    ("drop_column", re.compile(
        r"^\s*ALTER\s+TABLE\s+(?P<t>\w+)\s+DROP\s+COLUMN\s+(?P<a>\w+)\s*$",
        re.IGNORECASE)),
    ("clone", re.compile(
        r"^\s*CREATE\s+TABLE\s+(?:delta\s*\.\s*)?`(?P<dest>[^`]+)`"
        r"\s+SHALLOW\s+CLONE\s+(?P<t>\w+)\s*$",
        re.IGNORECASE)),
    # Iceberg partition-spec evolution (Iceberg SQL's REPLACE PARTITION
    # FIELD collapsed to the single-identity-field shape this engine
    # supports); DROP PARTITION FIELD un-partitions going forward.
    ("evolve_partition", re.compile(
        r"^\s*ALTER\s+TABLE\s+(?P<t>\w+)\s+REPLACE\s+PARTITION\s+FIELD"
        r"\s+WITH\s+(?P<col>\w+)\s*$",
        re.IGNORECASE)),
    ("drop_partition_field", re.compile(
        r"^\s*ALTER\s+TABLE\s+(?P<t>\w+)\s+DROP\s+PARTITION\s+FIELD\s*$",
        re.IGNORECASE)),
    ("fsck", re.compile(
        r"^\s*FSCK\s+REPAIR\s+TABLE\s+(?P<t>\w+)"
        r"(?:\s+(?P<dry>DRY\s+RUN))?\s*$",
        re.IGNORECASE)),
    # Delta's REORG TABLE t APPLY (PURGE): DV-density-targeted rewrite
    ("reorg_purge", re.compile(
        r"^\s*REORG\s+TABLE\s+(?P<t>\w+)\s+APPLY\s*\(\s*PURGE\s*\)\s*$",
        re.IGNORECASE)),
]


_QUERY_RES: list[tuple[str, re.Pattern]] = [
    ("version_as_of", re.compile(
        r"^\s*SELECT\s+\*\s+FROM\s+(?P<t>\w+)\s+VERSION\s+AS\s+OF"
        r"\s+(?P<v>\d+)\s*$",
        re.IGNORECASE)),
    ("timestamp_as_of", re.compile(
        r"^\s*SELECT\s+\*\s+FROM\s+(?P<t>\w+)\s+TIMESTAMP\s+AS\s+OF"
        r"\s+'(?P<ts>[^']+)'\s*$",
        re.IGNORECASE)),
    ("table_changes", re.compile(
        r"^\s*SELECT\s+\*\s+FROM\s+table_changes\s*\(\s*'(?P<t>\w+)'\s*,"
        r"\s*(?P<v1>\d+)\s*(?:,\s*(?P<v2>\d+)\s*)?\)\s*$",
        re.IGNORECASE)),
]


def execute_query(
    spark: SparkSession,
    sql: str,
    tables: dict[str, "LakehouseTable"],
) -> "DataFrame":
    """The literal Delta read-SQL forms, resolved against the same
    registry MERGE/DDL use:

    * ``SELECT * FROM t VERSION AS OF n`` (time travel by version)
    * ``SELECT * FROM t TIMESTAMP AS OF 'instant'`` (by instant —
      the newest version committed at or before it)
    * ``SELECT * FROM table_changes('t', v1[, v2])`` (the CDF TVF)

    Only the ``SELECT *`` shape is parsed here — the return value is a
    DataFrame, so projections/filters/joins compose in Spark (or
    register it as a temp view and continue in full Spark SQL); a SQL
    string dialect would just shadow Catalyst. Unknown statements raise
    ValueError, never a silent no-op."""
    for kind, rx in _QUERY_RES:
        m = rx.match(sql)
        if not m:
            continue
        name = m.group("t")
        if name not in tables:
            raise KeyError(f"unknown table in query: {name}")
        t = tables[name]
        if kind == "version_as_of":
            return t.read(version=int(m.group("v")))
        if kind == "timestamp_as_of":
            return t.read(version=t.version_as_of(m.group("ts")))
        v2 = m.group("v2")
        return t.read_changes(
            int(m.group("v1")), int(v2) if v2 is not None else None
        )
    raise ValueError(f"unsupported query SQL: {sql!r}")


def execute_ddl(
    spark: SparkSession,
    sql: str,
    tables: dict[str, LakehouseTable],
) -> dict:
    """Run one Delta-style utility statement against the registry:

    * ``VACUUM t [RETAIN n VERSIONS] [DRY RUN]``
    * ``OPTIMIZE t [WHERE part = v] [ZORDER BY (c1, c2)]``
    * ``RESTORE TABLE t TO VERSION AS OF n``
    * ``DESCRIBE HISTORY t``
    * ``FSCK REPAIR TABLE t [DRY RUN]``
    * ``REORG TABLE t APPLY (PURGE)``
    * ``DESCRIBE DETAIL t``
    * ``ALTER TABLE t ADD CONSTRAINT name CHECK (pred)`` / ``DROP
      CONSTRAINT name`` / ``RENAME COLUMN a TO b`` / ``DROP COLUMN a``
    * ``CREATE TABLE delta.`/dest/path` SHALLOW CLONE t``
    * ``ALTER TABLE t REPLACE PARTITION FIELD WITH col`` / ``DROP
      PARTITION FIELD`` (Iceberg partition-spec evolution)

    Returns ``{"statement", ...result fields}``; unknown statements
    raise ValueError (never silently no-op)."""
    for kind, rx in _DDL_RES:
        m = rx.match(sql)
        if not m:
            continue
        name = m.group("t")
        if name not in tables:
            raise KeyError(f"unknown table in DDL: {name}")
        t = tables[name]
        if kind == "vacuum":
            unit = (m.group("unit") or "VERSIONS").upper()
            hours = unit.startswith("HOUR")
            out = t.vacuum(
                retain_versions=1 if hours else int(m.group("n") or 1),
                retain_hours=float(m.group("n")) if hours else None,
                dry_run=bool(m.group("dry")),
            )
            return {"statement": "vacuum", **out}
        if kind == "optimize":
            z = m.group("z")
            # quoted capture wins: WHERE region = 'US East' carries the
            # space the bare-token alternative can't
            wc = m.group("wc")
            wv = m.group("wvq") if m.group("wvq") is not None else m.group("wv")
            if wc is not None and wc != t.partition_by:
                raise ValueError(
                    f"OPTIMIZE ... WHERE supports only the partition "
                    f"column {t.partition_by!r}, got {wc!r}"
                )
            commit = t.optimize(
                zorder_by=[c.strip() for c in z.split(",")] if z else None,
                where_partition=wv,
            )
            return {"statement": "optimize", "version": commit.version}
        if kind == "detail":
            return {"statement": "detail", **t.detail()}
        if kind == "fsck":
            out = t.fsck(dry_run=bool(m.group("dry")))
            return {"statement": "fsck", **out}
        if kind == "reorg_purge":
            commit = t.reorg_purge()
            return {
                "statement": "reorg_purge",
                "version": commit.version if commit else None,
                "purged_files": (
                    commit.stats["purged_files"] if commit else 0
                ),
            }
        if kind == "restore":
            commit = t.restore(int(m.group("v")))
            return {"statement": "restore", "version": commit.version}
        if kind == "history":
            return {
                "statement": "history",
                "history": [
                    {
                        "version": c.version,
                        "operation": c.action,
                        "timestamp": c.commit_time,
                    }
                    for c in reversed(t.history())
                ],
            }
        if kind == "add_constraint":
            t.add_constraint(m.group("name"), m.group("pred"))
            return {"statement": "add_constraint", "name": m.group("name")}
        if kind == "drop_constraint":
            t.drop_constraint(m.group("name"))
            return {"statement": "drop_constraint", "name": m.group("name")}
        if kind == "rename_column":
            c = t.rename_column(m.group("a"), m.group("b"))
            return {"statement": "rename_column", "version": c.version}
        if kind == "drop_column":
            c = t.drop_column(m.group("a"))
            return {"statement": "drop_column", "version": c.version}
        if kind == "clone":
            clone = LakehouseTable.clone(spark, t.path, m.group("dest"))
            return {"statement": "clone", "path": clone.path}
        if kind == "evolve_partition":
            t.evolve_partitioning(m.group("col"))
            return {
                "statement": "evolve_partition",
                "partition_by": m.group("col"),
            }
        if kind == "drop_partition_field":
            t.evolve_partitioning(None)
            return {"statement": "evolve_partition", "partition_by": None}
    raise ValueError(f"unsupported DDL statement: {sql!r}")
