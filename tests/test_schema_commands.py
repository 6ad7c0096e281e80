"""Schema & admin commands (SURVEY §2.10: SchemaLogicalPlan /
ShowCommandLogicalPlan parity): CREATE/DROP/SHOW INDEX + CONSTRAINT with
validation-job semantics, SHOW PROCEDURES/FUNCTIONS/DATABASES."""

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from neo4j_spark.api import cypher
from neo4j_spark.schema import SchemaError


def test_create_show_drop_index(spark, tpch_graph):
    g = tpch_graph.copy()
    r = cypher(spark, "CREATE INDEX i1 FOR (n:Customer) ON (n.acctbal)",
               g).collect()
    assert r[0]["type"] == "RANGE" and r[0]["properties"] == ["acctbal"]
    cypher(spark, "CREATE INDEX r1 FOR ()-[r:CONTAINS]-() ON (r.quantity)",
           g).collect()
    shown = cypher(spark, "SHOW INDEXES", g).collect()
    assert {x["name"] for x in shown} == {"i1", "r1"}
    assert {x["entityType"] for x in shown} == {"NODE", "RELATIONSHIP"}
    cypher(spark, "DROP INDEX i1", g).collect()
    assert {x["name"] for x in cypher(spark, "SHOW INDEXES", g).collect()} \
        == {"r1"}


def test_fulltext_index_ddl_builds_inverted_index(spark, tpch_graph):
    g = tpch_graph.copy()
    cypher(spark, "CREATE FULLTEXT INDEX ftddl FOR (n:Part) "
           "ON EACH [n.name]", g).collect()
    n = cypher(spark, "CALL db.index.fulltext.queryNodes('ftddl', 'widget') "
               "YIELD node, score RETURN count(*) AS n", g).collect()
    assert n[0]["n"] > 0
    assert "ftddl" in g.fulltext_indexes


def test_unique_constraint_validates(spark, tpch_graph):
    g = tpch_graph.copy()
    ok = cypher(spark, "CREATE CONSTRAINT uq FOR (n:Customer) "
                "REQUIRE n.custkey IS UNIQUE", g).collect()
    assert ok[0]["type"] == "UNIQUE"
    with pytest.raises(SchemaError):
        cypher(spark, "CREATE CONSTRAINT bad FOR (n:Customer) "
               "REQUIRE n.mktsegment IS UNIQUE", g).collect()
    shown = cypher(spark, "SHOW CONSTRAINTS", g).collect()
    assert {x["name"] for x in shown} == {"uq"}  # rejected one not recorded


def test_show_catalogs(spark, tpch_graph):
    procs = {r["name"] for r in
             cypher(spark, "SHOW PROCEDURES", tpch_graph).collect()}
    assert "db.labels" in procs and "algo.pagerank" in procs
    fns = {r["name"] for r in
           cypher(spark, "SHOW FUNCTIONS", tpch_graph).collect()}
    assert {"abs", "collect", "toInteger", "valueType"} <= fns
    dbs = cypher(spark, "SHOW DATABASES", tpch_graph).collect()
    assert dbs[0]["currentStatus"] == "online"


class TestSchemaIntrospectionProcs:
    """db.schema.nodeTypeProperties / relTypeProperties, db.info, db.ping
    (BuiltInProcedures.java)."""

    def test_node_type_properties(self, spark, tpch_graph):
        df = cypher(spark,
                    "CALL db.schema.nodeTypeProperties() "
                    "YIELD nodeType, propertyName "
                    "WHERE nodeType = ':`Region`' "
                    "RETURN propertyName ORDER BY propertyName", tpch_graph)
        assert [r.propertyName for r in df.collect()] == ["name", "regionkey"]

    def test_rel_type_properties(self, spark, tpch_graph):
        df = cypher(spark,
                    "CALL db.schema.relTypeProperties() "
                    "YIELD relType, propertyName "
                    "WHERE relType = ':`CONTAINS`' "
                    "RETURN count(*) > 3 AS ok", tpch_graph)
        assert df.collect()[0].ok

    def test_ping_info(self, spark, tpch_graph):
        assert cypher(spark, "CALL db.ping() YIELD success RETURN success",
                      tpch_graph).collect()[0].success
        assert cypher(spark, "CALL db.info() YIELD name RETURN name",
                      tpch_graph).collect()[0].name == "neo4j"
        assert cypher(spark, "CALL dbms.info() YIELD name RETURN name",
                      tpch_graph).collect()[0].name == "DBMS"


class TestLookupIndexAndShowTx:
    def test_create_lookup_index(self, spark, tpch_graph):
        g = tpch_graph.copy()
        df = cypher(spark,
                    "CREATE LOOKUP INDEX node_lookup IF NOT EXISTS "
                    "FOR (n) ON EACH labels(n)", g)
        row = df.collect()[0]
        assert row.type == "LOOKUP" and row.entityType == "NODE"
        shown = cypher(spark, "SHOW INDEXES", g).collect()
        assert any(r.name == "node_lookup" for r in shown)

    def test_show_transactions(self, spark, tpch_graph):
        rows_ = cypher(spark, "SHOW TRANSACTIONS", tpch_graph).collect()
        assert len(rows_) == 1 and rows_[0].status == "running"

    def test_show_settings(self, spark, tpch_graph):
        rows_ = cypher(spark, "SHOW SETTINGS", tpch_graph).collect()
        assert len(rows_) > 0


class TestFinishInsertTerminate:
    def test_finish_returns_no_rows(self, spark, tpch_graph):
        assert cypher(spark, "MATCH (r:Region) FINISH",
                      tpch_graph).collect() == []

    def test_create_finish_applies_effects(self, spark, tpch_graph):
        g = tpch_graph.copy()
        assert cypher(spark, "CREATE (:FIN {v: 1}) FINISH", g).collect() == []
        assert cypher(spark, "MATCH (f:FIN) RETURN count(*) AS c",
                      g).collect()[0].c == 1

    def test_insert_is_create(self, spark, tpch_graph):
        g = tpch_graph.copy()
        eff = cypher(spark, "INSERT (:INS {v: 1})-[:IL]->(:INS {v: 2})", g)
        assert eff.collect()[0]["nodes_created"] == 2
        assert cypher(spark, "MATCH (:INS)-[:IL]->(:INS) "
                      "RETURN count(*) AS c", g).collect()[0].c == 1

    def test_terminate_transactions(self, spark, tpch_graph):
        rows_ = cypher(spark, "TERMINATE TRANSACTIONS 'tx-9'",
                       tpch_graph).collect()
        assert rows_[0].transactionId == "tx-9"
        assert "not found" in rows_[0].message.lower()


def test_use_clause_accepted(spark, tpch_graph):
    from neo4j_spark.api import cypher

    out = cypher(spark, "USE neo4j MATCH (r:Region) RETURN count(*) AS c",
                 tpch_graph)
    assert out.collect()[0]["c"] == 5
    out = cypher(spark,
                 "USE GRAPH db.shard MATCH (r:Region) RETURN count(*) AS c",
                 tpch_graph)
    assert out.collect()[0]["c"] == 5


class TestLuceneQuerySyntax:
    """Round-3: the common Lucene operator subset in fulltext queries
    (FulltextProcedures.java:120 hands the string to Lucene's parser)."""

    def _n(self, spark, g, q):
        from neo4j_spark.api import cypher

        return cypher(
            spark, f"CALL db.index.fulltext.queryNodes('name', '{q}') "
            "YIELD node, score RETURN count(*) AS n", g).collect()[0]["n"]

    def test_phrase_requires_adjacency_in_order(self, spark, tpch_graph):
        fwd = self._n(spark, tpch_graph, '\\"red widget\\"')
        rev = self._n(spark, tpch_graph, '\\"widget red\\"')
        both = self._n(spark, tpch_graph, 'red AND widget')
        assert fwd == both > 0  # part names are 'adjective noun'
        assert rev == 0

    def test_boolean_operators(self, spark, tpch_graph):
        w = self._n(spark, tpch_graph, 'widget')
        r_and_w = self._n(spark, tpch_graph, 'red AND widget')
        w_not_r = self._n(spark, tpch_graph, 'widget NOT red')
        w_or_b = self._n(spark, tpch_graph, 'widget OR bolt')
        b = self._n(spark, tpch_graph, 'bolt')
        assert r_and_w + w_not_r == w
        assert w_or_b == w + b  # disjoint nouns
        assert self._n(spark, tpch_graph, '+widget -red') == w_not_r

    def test_parens_and_field_prefix(self, spark, tpch_graph):
        g1 = self._n(spark, tpch_graph, '(red OR blue) AND widget')
        r = self._n(spark, tpch_graph, 'red AND widget')
        b = self._n(spark, tpch_graph, 'blue AND widget')
        assert g1 == r + b
        assert self._n(spark, tpch_graph, 'name:widget') \
            == self._n(spark, tpch_graph, 'widget')

    def test_fuzzy_and_unsupported_raise(self, spark, tpch_graph):
        import pytest

        from neo4j_spark.procedures.registry import (ProcedureError,
                                                     _lucene_parse)

        # 'widgee'~2 is within edit distance 2 of 'widget'
        assert self._n(spark, tpch_graph, 'widgee~2') \
            >= self._n(spark, tpch_graph, 'widget')
        # wildcards and ranges parse since round 5 (constant-score)
        assert _lucene_parse("wid*", "name") == ("wild", "wid*", 1.0)
        assert _lucene_parse("[a TO b}", "name") \
            == ("range", "a", "b", True, False, 1.0)
        with pytest.raises(ProcedureError, match="field"):
            _lucene_parse("other:widget", "name")
        # sloppy phrases parse since round 6 (slop before boost)
        assert _lucene_parse('"a b"~2', "name") \
            == ("phrase", ["a", "b"], 2, 1.0)
        assert _lucene_parse('"a b"~2^3', "name") \
            == ("phrase", ["a", "b"], 2, 3.0)
        with pytest.raises(ProcedureError, match="unsupported"):
            _lucene_parse("a[b", "name")


class TestFulltextAnalyzers:
    """Configurable analyzers (FulltextProcedures createNodeIndex config
    {analyzer}, listAvailableAnalyzers)."""

    import pytest as _pytest

    @_pytest.fixture(scope="class")
    def doc_graph(self, spark):
        from neo4j_spark.graph import PropertyGraph

        rows = [
            (1, ["Doc"], "The quick tables run"),
            (2, ["Doc"], "a table for the report"),
            (3, ["Doc"], "Reports and stories"),
            (4, ["Doc"], "CamelCase Words-Here"),
        ]
        return PropertyGraph(
            {"Doc": spark.createDataFrame(
                rows, "id long, labels array<string>, text string")}, {})

    def _ids(self, spark, g, index, q):
        from neo4j_spark.api import cypher

        return sorted(r["node"] for r in cypher(
            spark, f"CALL db.index.fulltext.queryNodes('{index}', '{q}') "
            "YIELD node RETURN node", g).collect())

    def _mk(self, spark, g, name, analyzer):
        from neo4j_spark.api import cypher

        cypher(spark, "CALL db.index.fulltext.createNodeIndex("
               f"'{name}', ['Doc'], ['text'], {{analyzer: '{analyzer}'}}) "
               "YIELD name RETURN name", g).collect()

    def test_standard_drops_stop_words(self, spark, doc_graph):
        g = doc_graph.copy()
        self._mk(spark, g, "f1", "standard")
        assert self._ids(spark, g, "f1", "the") == []
        assert self._ids(spark, g, "f1", "the table") == [2]

    def test_english_stems_plurals_both_sides(self, spark, doc_graph):
        g = doc_graph.copy()
        self._mk(spark, g, "f2", "english")
        # query 'table' matches doc 1 ('tables') and doc 2 ('table');
        # 'report' matches docs 2 and 3; 'story' matches 'stories'
        assert self._ids(spark, g, "f2", "table") == [1, 2]
        assert self._ids(spark, g, "f2", "reports") == [2, 3]
        assert self._ids(spark, g, "f2", "story") == [3]

    def test_whitespace_preserves_case(self, spark, doc_graph):
        g = doc_graph.copy()
        self._mk(spark, g, "f3", "whitespace")
        assert self._ids(spark, g, "f3", "CamelCase") == [4]
        assert self._ids(spark, g, "f3", "camelcase") == []
        assert self._ids(spark, g, "f3", "Words-Here") == [4]

    def test_keyword_whole_value(self, spark, doc_graph):
        g = doc_graph.copy()
        self._mk(spark, g, "f4", "keyword")
        assert self._ids(spark, g, "f4", "Reports and stories") == [3]
        assert self._ids(spark, g, "f4", "Reports") == []

    def test_lucene_syntax_respects_analyzer(self, spark, doc_graph):
        g = doc_graph.copy()
        self._mk(spark, g, "f5", "english")
        assert self._ids(spark, g, "f5", "tables AND run") == [1]
        # stop word clause drops out instead of matching nothing
        assert self._ids(spark, g, "f5", "the AND table") == [1, 2]

    def test_list_available_analyzers(self, spark, doc_graph):
        from neo4j_spark.api import cypher

        rows = cypher(spark, "CALL db.index.fulltext."
                      "listAvailableAnalyzers() YIELD analyzer "
                      "RETURN analyzer ORDER BY analyzer",
                      doc_graph).collect()
        names = [r["analyzer"] for r in rows]
        assert "english" in names and "standard" in names \
            and "whitespace" in names

    def test_unknown_analyzer_raises(self, spark, doc_graph):
        import pytest

        from neo4j_spark.procedures.registry import ProcedureError

        with pytest.raises(ProcedureError, match="unknown analyzer"):
            self._mk(spark, doc_graph.copy(), "f6", "bogus")


class TestTokenAndAdminProcs:
    """db.createLabel/createProperty/createRelationshipType, tx metadata,
    db.clearQueryCaches, dbms.listCapabilities, db.create.set*VectorProperty
    (BuiltInProcedures.java / TransactionProcedures / CapabilitiesService)."""

    def test_create_tokens_visible_in_catalog(self, spark, tpch_graph):
        g = tpch_graph.copy()
        cypher(spark, "CALL db.createLabel('Brand')", g).collect()
        cypher(spark, "CALL db.createRelationshipType('OWNS')", g).collect()
        cypher(spark, "CALL db.createProperty('warranty')", g).collect()
        labels = [r.label for r in cypher(
            spark, "CALL db.labels() YIELD label RETURN label", g).collect()]
        assert "Brand" in labels
        types = [r.relationshipType for r in cypher(
            spark, "CALL db.relationshipTypes() YIELD relationshipType "
            "RETURN relationshipType", g).collect()]
        assert "OWNS" in types
        keys = [r.propertyKey for r in cypher(
            spark, "CALL db.propertyKeys() YIELD propertyKey "
            "RETURN propertyKey", g).collect()]
        assert "warranty" in keys
        # snapshot isolation: tokens do not leak into the source graph
        assert "Brand" not in tpch_graph.labels()

    def test_tx_metadata_roundtrip(self, spark, tpch_graph):
        g = tpch_graph.copy()
        cypher(spark, "CALL tx.setMetaData({app: 'etl', run: 7})",
               g).collect()
        row = cypher(spark,
                     "CALL tx.getMetaData() YIELD metadata RETURN metadata",
                     g).collect()[0]
        assert row.metadata == {"app": "etl", "run": "7"}

    def test_clear_query_caches_and_noops(self, spark, tpch_graph):
        g = tpch_graph.copy()
        cypher(spark, "MATCH (n:Region) RETURN count(n) AS c", g).collect()
        row = cypher(spark, "CALL db.clearQueryCaches() YIELD value "
                     "RETURN value", g).collect()[0]
        assert "cleared" in row.value
        for q in ("CALL db.prepareForReplanning()",
                  "CALL db.index.fulltext.awaitEventuallyConsistentIndexRefresh()"):
            assert cypher(spark, q, g).count() == 0

    def test_list_capabilities(self, spark, tpch_graph):
        rows = cypher(spark, "CALL dbms.listCapabilities() "
                      "YIELD name, description RETURN name ORDER BY name",
                      tpch_graph).collect()
        assert len(rows) >= 4

    def test_create_set_vector_property_aliases(self, spark, tpch_graph):
        g = tpch_graph.copy()
        nid = cypher(spark, "MATCH (r:Region) RETURN id(r) AS i "
                     "ORDER BY i LIMIT 1", g).collect()[0].i
        cypher(spark,
               f"CALL db.create.setNodeVectorProperty({nid}, 'vec', "
               "[1.0, 2.0])", g).collect()
        got = cypher(spark, f"MATCH (r:Region) WHERE id(r) = {nid} "
                     "RETURN r.vec AS v", g).collect()[0].v
        assert got == [1.0, 2.0]

    def test_set_relationship_vector_property(self, spark, tpch_graph):
        g = tpch_graph.copy()
        rid = cypher(spark, "MATCH ()-[r:IN_REGION]->() RETURN id(r) AS i "
                     "ORDER BY i LIMIT 1", g).collect()[0].i
        cypher(spark,
               f"CALL db.create.setRelationshipVectorProperty({rid}, "
               "'vec', [0.5, 0.5])", g).collect()
        got = cypher(spark, f"MATCH ()-[r:IN_REGION]->() WHERE id(r) = {rid} "
                     "RETURN r.vec AS v", g).collect()[0].v
        assert got == [0.5, 0.5]


class TestUserAdministration:
    """Community user administration
    (CommunityAdministrationCommandRuntime.scala): CREATE/DROP/SHOW USER,
    ALTER USER, ALTER CURRENT USER SET PASSWORD, SHOW CURRENT USER.  No
    roles / suspension / home database — those columns render null, as
    community does."""

    def _g(self, tpch_graph):
        return tpch_graph.copy()

    def test_default_user_and_show(self, spark, tpch_graph):
        g = self._g(tpch_graph)
        got = cypher(spark, "SHOW USERS", g).collect()
        assert [(r["user"], r["roles"], r["passwordChangeRequired"],
                 r["suspended"], r["home"]) for r in got] == [
            ("neo4j", None, True, None, None)]

    def test_create_show_drop_roundtrip(self, spark, tpch_graph):
        g = self._g(tpch_graph)
        cypher(spark, "CREATE USER alice SET PASSWORD 'sekrit-123'",
               g).collect()
        cypher(spark, "CREATE USER bob SET PASSWORD 'hunter2-00' "
               "CHANGE NOT REQUIRED", g).collect()
        got = {r["user"]: r["passwordChangeRequired"]
               for r in cypher(spark, "SHOW USERS", g).collect()}
        assert got == {"neo4j": True, "alice": True, "bob": False}
        cypher(spark, "DROP USER alice", g).collect()
        got = {r["user"] for r in cypher(spark, "SHOW USERS", g).collect()}
        assert got == {"neo4j", "bob"}

    def test_create_existing_raises_unless_guarded(self, spark,
                                                   tpch_graph):
        g = self._g(tpch_graph)
        cypher(spark, "CREATE USER carol SET PASSWORD 'abcd1234'",
               g).collect()
        with pytest.raises(SchemaError, match="already exists"):
            cypher(spark, "CREATE USER carol SET PASSWORD 'abcd1234'",
                   g).collect()
        cypher(spark, "CREATE USER carol IF NOT EXISTS "
               "SET PASSWORD 'xyzt5678'", g).collect()
        cypher(spark, "CREATE OR REPLACE USER carol "
               "SET PASSWORD 'xyzt5678'", g).collect()

    def test_short_password_rejected(self, spark, tpch_graph):
        g = self._g(tpch_graph)
        with pytest.raises(SchemaError, match="8 characters"):
            cypher(spark, "CREATE USER dave SET PASSWORD 'short'",
                   g).collect()

    def test_drop_missing_raises_unless_if_exists(self, spark, tpch_graph):
        g = self._g(tpch_graph)
        with pytest.raises(SchemaError, match="does not exist"):
            cypher(spark, "DROP USER ghost", g).collect()
        cypher(spark, "DROP USER ghost IF EXISTS", g).collect()

    def test_drop_self_forbidden(self, spark, tpch_graph):
        g = self._g(tpch_graph)
        with pytest.raises(SchemaError, match="yourself"):
            cypher(spark, "DROP USER neo4j", g).collect()

    def test_alter_user_password_and_mode(self, spark, tpch_graph):
        g = self._g(tpch_graph)
        cypher(spark, "CREATE USER erin SET PASSWORD 'firstpw-1' "
               "CHANGE NOT REQUIRED", g).collect()
        cypher(spark, "ALTER USER erin SET PASSWORD 'secondpw-2'",
               g).collect()
        got = {r["user"]: r["passwordChangeRequired"]
               for r in cypher(spark, "SHOW USERS", g).collect()}
        assert got["erin"] is True
        cypher(spark, "ALTER USER erin SET PASSWORD CHANGE NOT REQUIRED",
               g).collect()
        got = {r["user"]: r["passwordChangeRequired"]
               for r in cypher(spark, "SHOW USERS", g).collect()}
        assert got["erin"] is False
        with pytest.raises(SchemaError, match="does not exist"):
            cypher(spark, "ALTER USER ghost SET PASSWORD 'whatever-9'",
                   g).collect()
        cypher(spark, "ALTER USER ghost IF EXISTS "
               "SET PASSWORD 'whatever-9'", g).collect()

    def test_alter_current_user_password(self, spark, tpch_graph):
        g = self._g(tpch_graph)
        cypher(spark, "ALTER CURRENT USER SET PASSWORD "
               "FROM 'neo4j' TO 'brand-new-1'", g).collect()
        # SetOwnPasswordExecutionPlanner:71 — clears change-required
        got = cypher(spark, "SHOW CURRENT USER", g).collect()
        assert [(r["user"], r["passwordChangeRequired"])
                for r in got] == [("neo4j", False)]
        with pytest.raises(SchemaError, match="Invalid principal"):
            cypher(spark, "ALTER CURRENT USER SET PASSWORD "
                   "FROM 'wrong' TO 'other-pass-2'", g).collect()
        with pytest.raises(SchemaError, match="cannot be the same"):
            cypher(spark, "ALTER CURRENT USER SET PASSWORD "
                   "FROM 'brand-new-1' TO 'brand-new-1'", g).collect()

    def test_show_user_defined_functions_still_works(self, spark,
                                                     tpch_graph):
        g = self._g(tpch_graph)
        got = cypher(spark, "SHOW USER DEFINED FUNCTIONS", g).collect()
        assert isinstance(got, list)
