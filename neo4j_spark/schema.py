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
    r"^\s*(CREATE|DROP|SHOW|TERMINATE|ALTER)\s+"
    r"(?:OR\s+REPLACE\s+)?"
    r"(?:(RANGE|TEXT|POINT|FULLTEXT|VECTOR|LOOKUP|CURRENT)\s+)?"
    r"(INDEX|INDEXES|CONSTRAINT|CONSTRAINTS|PROCEDURES?|FUNCTIONS?|"
    r"DATABASES?|TRANSACTIONS?|SETTINGS?|USERS?)\b",
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


_CREATE_USER_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?USER\s+(`[^`]+`|\w+)\s*"
    r"(IF\s+NOT\s+EXISTS\s+)?"
    r"SET\s+(?:PLAINTEXT\s+|ENCRYPTED\s+)?PASSWORD\s+'([^']*)'"
    r"(?:\s+CHANGE\s+(NOT\s+)?REQUIRED)?\s*$", re.I | re.S)

_DROP_USER_RE = re.compile(
    r"^\s*DROP\s+USER\s+(`[^`]+`|\w+)(\s+IF\s+EXISTS)?\s*$", re.I)

_ALTER_USER_RE = re.compile(
    r"^\s*ALTER\s+USER\s+(`[^`]+`|\w+)(\s+IF\s+EXISTS)?\s+"
    r"SET\s+(?:PLAINTEXT\s+|ENCRYPTED\s+)?PASSWORD\s+"
    r"(?:'([^']*)')?\s*(?:CHANGE\s+(NOT\s+)?REQUIRED)?\s*$", re.I | re.S)

_ALTER_CURRENT_RE = re.compile(
    r"^\s*ALTER\s+CURRENT\s+USER\s+SET\s+PASSWORD\s+"
    r"FROM\s+'([^']*)'\s+TO\s+'([^']*)'\s*$", re.I | re.S)

_SHOW_USERS_RE = re.compile(
    r"^\s*SHOW\s+USERS?\s*(?:WITH\s+AUTH)?\s*$", re.I)

_SHOW_CURRENT_USER_RE = re.compile(
    r"^\s*SHOW\s+CURRENT\s+USER\s*$", re.I)


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


def _users(graph) -> dict:
    """User catalog (community scope: no roles/suspension/home db —
    CommunityAdministrationCommandRuntime.scala).  Ships with the
    default ``neo4j`` user, password-change-required, like a fresh
    reference install.  Passwords are stored salted-and-hashed."""
    if not hasattr(graph, "schema_users"):
        graph.schema_users = {
            "neo4j": {"pwd": _pwd_hash("neo4j"), "change_required": True}}
        graph._current_user = "neo4j"
    return graph.schema_users


def _pwd_hash(pw: str) -> str:
    import hashlib

    return hashlib.sha256(("neo4j_spark$" + pw).encode()).hexdigest()


def _user_command(spark: SparkSession, graph,
                  body: str) -> Optional[DataFrame]:
    users = _users(graph)
    ok = spark.createDataFrame([(True,)], "ok boolean")

    m = _CREATE_USER_RE.match(body)
    if m:
        replace, name, if_not_exists, pw, change_not = m.groups()
        name = name.strip("`")
        if name in users and not (replace or if_not_exists):
            raise SchemaError(
                f"Failed to create the specified user '{name}': User "
                "already exists.")
        if name in users and if_not_exists:
            return ok
        if len(pw) < 8 and name not in users:
            # reference minimum_password_length default is 8
            raise SchemaError(
                "A password must be at least 8 characters.")
        users[name] = {"pwd": _pwd_hash(pw),
                       "change_required": change_not is None}
        return ok
    m = _DROP_USER_RE.match(body)
    if m:
        name, if_exists = m.group(1).strip("`"), m.group(2)
        if name == getattr(graph, "_current_user", "neo4j"):
            raise SchemaError(
                f"Failed to delete the specified user '{name}': Deleting "
                "yourself is not allowed.")
        if name not in users:
            if if_exists:
                return ok
            raise SchemaError(
                f"Failed to delete the specified user '{name}': User does "
                "not exist.")
        del users[name]
        return ok
    m = _ALTER_CURRENT_RE.match(body)
    if m:
        old, new = m.groups()
        me = users[getattr(graph, "_current_user", "neo4j")]
        if me["pwd"] != _pwd_hash(old):
            raise SchemaError(
                "User failed to alter their own password: Invalid "
                "principal or credentials.")
        if old == new:
            raise SchemaError(
                "User failed to alter their own password: Old password "
                "and new password cannot be the same.")
        me["pwd"] = _pwd_hash(new)
        me["change_required"] = False  # SetOwnPasswordExecutionPlanner:71
        return ok
    m = _ALTER_USER_RE.match(body)
    if m:
        name, if_exists, pw, change_not = m.groups()
        name = name.strip("`")
        if name not in users:
            if if_exists:
                return ok
            raise SchemaError(
                f"Failed to alter the specified user '{name}': User does "
                "not exist.")
        if pw is not None:
            users[name]["pwd"] = _pwd_hash(pw)
            users[name]["change_required"] = True
        if change_not is not None:
            users[name]["change_required"] = False
        elif pw is None and "CHANGE" in body.upper():
            users[name]["change_required"] = True
        return ok
    schema = ("user string, roles array<string>, "
              "passwordChangeRequired boolean, suspended boolean, "
              "home string")
    if _SHOW_CURRENT_USER_RE.match(body):
        me = getattr(graph, "_current_user", "neo4j")
        return spark.createDataFrame(
            [(me, None, users[me]["change_required"], None, None)], schema)
    if _SHOW_USERS_RE.match(body):
        rows = [(n, None, u["change_required"], None, None)
                for n, u in sorted(users.items())]
        return spark.createDataFrame(rows, schema)
    return None


def run_schema_command(spark: SparkSession, graph,
                       body: str) -> Optional[DataFrame]:
    indexes, constraints = _registries(graph)

    user_df = _user_command(spark, graph, body)
    if user_df is not None:
        return user_df

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
