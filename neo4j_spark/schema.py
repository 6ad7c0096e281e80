"""Schema & admin commands (SURVEY §2.10: SchemaLogicalPlan /
ShowCommandLogicalPlan, executed by the reference's SchemaCommandRuntime /
CommunityAdministrationCommandRuntime).

In a batch engine indexes are planner metadata, not physical structures —
Catalyst's parquet pushdown already serves every seek (SURVEY §2.1) — so:

- ``CREATE [RANGE|TEXT|POINT|VECTOR|LOOKUP] INDEX`` records catalog
  metadata (a stats hint, per SURVEY §2.10);
- ``CREATE FULLTEXT INDEX`` additionally MATERIALIZES the inverted-index
  parquet table (procedures/registry.py) — the one index kind with a
  physical payoff here;
- ``CREATE CONSTRAINT ... IS UNIQUE / IS NOT NULL`` runs a validation job
  over the snapshot and refuses to create the constraint on violation
  (constraints become batch validation, per SURVEY §2.10);
- ``SHOW INDEXES / CONSTRAINTS / PROCEDURES / FUNCTIONS / DATABASES``
  render the catalogs.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

_HEAD_RE = re.compile(
    r"^\s*(CREATE|DROP|SHOW|TERMINATE)\s+"
    r"(?:(RANGE|TEXT|POINT|FULLTEXT|VECTOR|LOOKUP)\s+)?"
    r"(INDEX|INDEXES|CONSTRAINT|CONSTRAINTS|PROCEDURES?|FUNCTIONS?|"
    r"DATABASES?|TRANSACTIONS?|SETTINGS?)\b",
    re.I)

_LOOKUP_IDX_RE = re.compile(
    r"^\s*CREATE\s+LOOKUP\s+INDEX\s+(?:(`[^`]+`|\w+)\s+)?"
    r"(?:IF\s+NOT\s+EXISTS\s+)?"
    r"FOR\s*(\(\s*\w*\s*\)|\(\s*\)\s*-\s*\[\s*\w*\s*\]\s*-\s*\(\s*\))\s*"
    r"ON\s+(?:EACH\s+)?(labels|type)\s*\(\s*\w*\s*\)\s*$",
    re.I | re.S)

_NODE_IDX_RE = re.compile(
    r"^\s*CREATE\s+(?:(\w+)\s+)?INDEX\s+(?:(`[^`]+`|\w+)\s+)?"
    r"(?:IF\s+NOT\s+EXISTS\s+)?"
    r"FOR\s*\(\s*(\w*)\s*:\s*([\w|]+)\s*\)\s*"
    r"ON\s*(?:EACH\s*)?[\[(]([^\])]+)[\])]\s*$",
    re.I | re.S)

_REL_IDX_RE = re.compile(
    r"^\s*CREATE\s+(?:(\w+)\s+)?INDEX\s+(?:(`[^`]+`|\w+)\s+)?"
    r"(?:IF\s+NOT\s+EXISTS\s+)?"
    r"FOR\s*\(\s*\)\s*-\s*\[\s*(\w*)\s*:\s*([\w|]+)\s*\]\s*-\s*\(\s*\)\s*"
    r"ON\s*(?:EACH\s*)?[\[(]([^\])]+)[\])]\s*$",
    re.I | re.S)

_CON_RE = re.compile(
    r"^\s*CREATE\s+CONSTRAINT\s+(?:(`[^`]+`|\w+)\s+)?"
    r"(?:IF\s+NOT\s+EXISTS\s+)?"
    r"FOR\s*\(\s*(\w+)\s*:\s*(\w+)\s*\)\s*"
    r"REQUIRE\s+(.+?)\s+IS\s+(UNIQUE|NOT\s+NULL|NODE\s+KEY|KEY|::\s*.+?)\s*$",
    re.I | re.S)

_DROP_RE = re.compile(
    r"^\s*DROP\s+(INDEX|CONSTRAINT)\s+(`[^`]+`|\w+)"
    r"(?:\s+IF\s+EXISTS)?\s*$", re.I)

_SHOW_RE = re.compile(
    r"^\s*SHOW\s+(?:(ALL|RANGE|TEXT|POINT|FULLTEXT|VECTOR|LOOKUP|UNIQUE|"
    r"UNIQUENESS|NODE|RELATIONSHIP|PROPERTY|EXISTENCE|BUILT\s+IN|USER[\s-]"
    r"DEFINED)\s+)*"
    r"(INDEXES|CONSTRAINTS|PROCEDURES|FUNCTIONS|DATABASES)\b.*$",
    re.I | re.S)


def is_schema_command(body: str) -> bool:
    return bool(_HEAD_RE.match(body))


class SchemaError(ValueError):
    pass


def _props(text: str) -> list:
    return [p.strip().split(".", 1)[-1].strip("` ")
            for p in text.split(",") if p.strip()]


def _registries(graph):
    if not hasattr(graph, "schema_indexes"):
        graph.schema_indexes = {}
    if not hasattr(graph, "schema_constraints"):
        graph.schema_constraints = {}
    return graph.schema_indexes, graph.schema_constraints


def run_schema_command(spark: SparkSession, graph,
                       body: str) -> Optional[DataFrame]:
    indexes, constraints = _registries(graph)

    m = _LOOKUP_IDX_RE.match(body)
    if m:
        # token lookup index (BuiltInProcedures token indexes): scans over
        # per-label/per-type parquet shards ARE the lookup index — catalog
        # entry only
        name, target, fn = m.groups()
        entity = "NODE" if fn.lower() == "labels" else "RELATIONSHIP"
        name = (name or f"index_{len(indexes)}").strip("`")
        indexes[name] = {"name": name, "type": "LOOKUP",
                         "entityType": entity, "labelsOrTypes": [],
                         "properties": []}
        return spark.createDataFrame(
            [(name, "LOOKUP", entity, [], [])],
            "name string, type string, entityType string, "
            "labelsOrTypes array<string>, properties array<string>")

    if re.match(r"^\s*TERMINATE\s+TRANSACTIONS?\b", body, re.I):
        # TerminateTransactionsClause: a batch snapshot has no other
        # transactions to kill — report not-found per requested id
        ids = re.findall(r"'([^']*)'|\"([^\"]*)\"", body)
        rows = [(a or b, "Transaction not found.")
                for a, b in ids] or [("", "Transaction not found.")]
        return spark.createDataFrame(
            rows, "transactionId string, message string")
    if re.match(r"^\s*SHOW\s+TRANSACTIONS?\b", body, re.I):
        # ShowTransactionsCommand: a batch snapshot has exactly the
        # current statement in flight
        return spark.createDataFrame(
            [("neo4j-transaction-0", "SHOW TRANSACTIONS", "running")],
            "transactionId string, currentQuery string, status string")
    if re.match(r"^\s*SHOW\s+SETTINGS?\b", body, re.I):
        from .procedures.registry import run_procedure
        return run_procedure(spark, graph, "dbms.listconfig", [])

    m = _NODE_IDX_RE.match(body) or _REL_IDX_RE.match(body)
    if m:
        kind, name, _var, labels, props_txt = m.groups()
        entity = "RELATIONSHIP" if _REL_IDX_RE.match(body) else "NODE"
        kind = (kind or "RANGE").upper()
        props = _props(props_txt)
        name = (name or f"index_{len(indexes)}").strip("`")
        if kind == "FULLTEXT" and entity == "NODE":
            from .procedures.registry import run_procedure
            run_procedure(spark, graph, "db.index.fulltext.createnodeindex",
                          [name, labels.split("|"), props])
        indexes[name] = {"name": name, "type": kind, "entityType": entity,
                         "labelsOrTypes": labels.split("|"),
                         "properties": props}
        return spark.createDataFrame(
            [(name, kind, entity, labels.split("|"), props)],
            "name string, type string, entityType string, "
            "labelsOrTypes array<string>, properties array<string>")

    m = _CON_RE.match(body)
    if m:
        name, var, label, req_txt, con_kind = m.groups()
        con_kind = re.sub(r"\s+", " ", con_kind.upper())
        props = _props(req_txt.strip("() "))
        name = (name or f"constraint_{len(constraints)}").strip("`")
        frame = graph.node_frames.get(label)
        if frame is not None and all(p in frame.columns for p in props):
            if con_kind in ("UNIQUE", "NODE KEY", "KEY"):
                # validation job: refuse on duplicate non-null keys
                dup = (frame.dropna(subset=props).groupBy(*props)
                       .agg(F.count(F.lit(1)).alias("c"))
                       .filter(F.col("c") > 1).limit(1).count())
                if dup:
                    raise SchemaError(
                        f"cannot create {con_kind} constraint on "
                        f":{label}({', '.join(props)}): existing duplicates")
            if con_kind in ("NOT NULL", "NODE KEY", "KEY"):
                nulls = frame.filter(
                    " OR ".join(f"`{p}` IS NULL" for p in props)
                ).limit(1).count()
                if nulls:
                    raise SchemaError(
                        f"cannot create {con_kind} constraint on "
                        f":{label}({', '.join(props)}): null values exist")
        constraints[name] = {
            "name": name, "type": con_kind, "entityType": "NODE",
            "labelsOrTypes": [label], "properties": props}
        return spark.createDataFrame(
            [(name, con_kind, "NODE", [label], props)],
            "name string, type string, entityType string, "
            "labelsOrTypes array<string>, properties array<string>")

    m = _DROP_RE.match(body)
    if m:
        what, name = m.group(1).upper(), m.group(2).strip("`")
        target = indexes if what == "INDEX" else constraints
        existed = target.pop(name, None)
        return spark.createDataFrame(
            [(name, what, existed is not None)],
            "name string, kind string, dropped boolean")

    m = _SHOW_RE.match(body)
    if m:
        what = m.group(2).upper()
        schema = ("name string, type string, entityType string, "
                  "labelsOrTypes array<string>, properties array<string>")
        if what == "INDEXES":
            rows = [(v["name"], v["type"], v["entityType"],
                     v["labelsOrTypes"], v["properties"])
                    for v in indexes.values()]
            return spark.createDataFrame(rows, schema)
        if what == "CONSTRAINTS":
            rows = [(v["name"], v["type"], v["entityType"],
                     v["labelsOrTypes"], v["properties"])
                    for v in constraints.values()]
            return spark.createDataFrame(rows, schema)
        if what == "PROCEDURES":
            from .procedures.registry import PROCEDURES
            return spark.createDataFrame(
                sorted((n,) for n in PROCEDURES), "name string")
        if what == "FUNCTIONS":
            from .functions.registry import BUILTIN_FUNCTIONS, USER_FUNCTIONS
            names = sorted(set(BUILTIN_FUNCTIONS) | set(USER_FUNCTIONS))
            return spark.createDataFrame([(n,) for n in names], "name string")
        if what == "DATABASES":
            return spark.createDataFrame(
                [("neo4j", "online", True)],
                "name string, currentStatus string, home boolean")
    raise SchemaError(f"unsupported schema command: {body.strip()[:80]}")
