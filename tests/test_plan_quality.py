"""Physical-plan quality gates (SURVEY §4): these assert the *plan shape*,
not just results — predicate pushdown reaching the parquet scan, column
pruning, broadcast joins for small dimensions, and TakeOrderedAndProject
for top-k.  A plan that regresses here would still be correct at sf0.01
but would not survive a 100x scale-up, which is the design target."""

import pytest

from neo4j_spark.api import cypher


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_label_scan_prunes_to_single_shard(spark, tpch_graph):
    """NodeByLabelScan must read ONE parquet dataset, not a filtered union
    of all six (graph.py shard pruning)."""
    df = cypher(spark, "MATCH (c:Customer) RETURN c.name AS name", tpch_graph)
    plan = plan_of(df)
    assert plan.count("Scan parquet") == 1
    assert "customer.parquet" in plan


def test_predicate_pushdown_reaches_scan(spark, tpch_graph):
    """WHERE c.acctbal >= 1000 must appear in PushedFilters of the scan."""
    df = cypher(spark,
                "MATCH (c:Customer) WHERE c.acctbal >= 1000 "
                "RETURN count(*) AS n", tpch_graph)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(c_acctbal,1000" in plan.replace(" ", "")


def test_column_pruning_reaches_scan(spark, tpch_graph):
    """A 2-column projection must not read all customer columns."""
    df = cypher(spark,
                "MATCH (c:Customer) RETURN c.custkey AS k", tpch_graph)
    plan = plan_of(df)
    # ReadSchema should mention custkey but not mktsegment
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and "c_mktsegment" not in read[0]


def test_expand_join_broadcasts_small_dimension(spark, tpch_graph):
    """nation->region expand: the 5-row region side must broadcast."""
    df = cypher(spark,
                "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
                "RETURN r.name AS region, count(*) AS n", tpch_graph)
    assert "BroadcastHashJoin" in plan_of(df)


def test_topk_plans_take_ordered(spark, tpch_graph):
    """ORDER BY ... LIMIT k must fuse into TakeOrderedAndProject (Top,
    LP:3913), not a global Sort followed by CollectLimit."""
    df = cypher(spark,
                "MATCH (c:Customer) RETURN c.custkey AS k, c.acctbal AS b "
                "ORDER BY b DESC LIMIT 10", tpch_graph)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_scan_elision_for_anonymous_endpoints(spark, tpch_graph):
    """MATCH ()-[l:CONTAINS]->() must be ONE scan (the rel table), not
    three — anonymous unconstrained endpoints are elided (translate.py).
    (count(l.quantity) keeps the query off the count-store fast path,
    which would plan zero scans.)"""
    df = cypher(spark,
                "MATCH ()-[l:CONTAINS]->() RETURN count(l.quantity) AS n",
                tpch_graph)
    assert plan_of(df).count("Scan parquet") == 1


def test_count_store_serves_rel_count_without_scan(spark, tpch_graph):
    """MATCH ()-[l:CONTAINS]->() RETURN count(*) is answered from the
    count store (LP:3466) — zero scans in the final plan."""
    df = cypher(spark,
                "MATCH ()-[l:CONTAINS]->() RETURN count(*) AS n", tpch_graph)
    assert plan_of(df).count("Scan parquet") == 0


def test_semi_join_for_exists_predicate(spark, tpch_graph):
    """EXISTS {} pattern predicate must become a semi/left join + flag, not
    a correlated per-row subquery (SemiApply decorrelation, SURVEY §2.5)."""
    df = cypher(spark,
                "MATCH (c:Customer) WHERE EXISTS { (c)-[:PLACED]->(:Order) } "
                "RETURN count(*) AS n", tpch_graph)
    plan = optimized_of(df)
    assert "Join" in plan  # decorrelated to a join


def test_count_store_shape_single_agg(spark, tpch_graph):
    """MATCH (n:Label) RETURN count(*) compiles to scan+agg with no joins
    (countStorePlanner analog: Parquet footer counts do the work)."""
    df = cypher(spark, "MATCH (c:Customer) RETURN count(*) AS n", tpch_graph)
    plan = optimized_of(df)
    assert "Join" not in plan


def test_shape_only_path_skips_node_resolution(spark, tpch_graph):
    """length(p)/size(nodes(p)) never trigger the explode+join node
    resolution (_path_rich_use) — a path whose contents nobody reads must
    not shuffle node frames (pruningVarExpander usage test, SURVEY §4.1)."""
    df = cypher(spark,
                "MATCH p = (n:Nation)-[:IN_REGION]->(r:Region) "
                "RETURN size(nodes(p)) AS nn, length(p) AS l, count(*) AS c",
                tpch_graph)
    plan = plan_of(df)
    assert "Generate posexplode" not in plan


def test_rich_path_use_resolves_nodes_once(spark, tpch_graph):
    """[x IN nodes(p) | x.prop] resolves node structs with exactly one
    posexplode+join pass."""
    df = cypher(spark,
                "MATCH p = (n:Nation)-[:IN_REGION]->(r:Region) "
                "RETURN [x IN nodes(p) | x.name] AS names LIMIT 3",
                tpch_graph)
    plan = plan_of(df)
    assert plan.count("Generate posexplode") == 1
    assert [tuple(r) for r in df.collect()][0][0] is not None


def test_headline_queries_stay_jvm_side(spark):
    """No row-at-a-time Python UDF (BatchEvalPython) in any headline plan;
    Arrow-batched pandas UDFs (ArrowEvalPython) are allowed only in the
    kNN path.  Python in a hot path is the 10-100x cliff at scale."""
    import __spark_entry__ as em

    qs = em.queries()
    sf = "/root/testdata/sf0.001"
    headline = ["aggregation_q1", "multi_hop_chain", "expand_into_triangle",
                "agg_count_distinct", "optional_expand", "count_subquery",
                "top_k", "dedup_exact", "dedup_minhash_lsh", "text_quality",
                "text_scrub_pii", "embedding_quantize"]
    for k in headline:
        plan = plan_of(qs[k](spark, sf))
        assert "BatchEvalPython" not in plan, f"{k} fell off codegen"
        if k != "knn_join":
            assert "ArrowEvalPython" not in plan, f"{k} uses pandas UDF"


def test_scrub_pushes_column_pruning(spark):
    import __spark_entry__ as em

    df = em.queries()["text_scrub_pii"](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "ReadSchema" in plan and "text" in plan
    # lang/source columns must NOT be read for this 2-column projection
    assert "n_chars" not in plan.split("ReadSchema")[1][:200]


def test_translate_has_no_driver_collect():
    """The query translator must never materialize subquery results on the
    driver — uncorrelated COLLECT{}/pattern comprehensions aggregate to a
    1-row frame and broadcast-crossJoin instead.  The single allowed
    .collect() is the capped correlated-procedure-argument enumeration."""
    import inspect

    from neo4j_spark.cypher import translate as t

    lines = inspect.getsource(t).splitlines()
    hits = [i for i, ln in enumerate(lines) if ".collect()" in ln]
    assert len(hits) == 1, [lines[i] for i in hits]
    ctx = "\n".join(lines[hits[0] - 2:hits[0] + 1])
    assert "dropDuplicates().limit(cap + 1)" in ctx, ctx


class TestSharedBaseFusion:
    """CONTAINS and SUPPLIED_BY are row images of one lineitem table
    (FIXTURES.md): with neo4j_spark.scan.fuseSharedBases=true a
    statement touching both persists the shared base so every shard is
    served from ONE FileScan; by default each shard keeps its own
    pruned, filter-pushed scan (measured faster when Catalyst prunes
    the rel-id window away — see PropertyGraph.note_rel_scan)."""

    Q = ("MATCH (s:Supplier)<-[sb:SUPPLIED_BY]-(o:Order)"
         "-[l:CONTAINS]->(:Part) WHERE sb.linenumber = l.linenumber "
         "RETURN s.suppkey AS sk, sum(l.quantity) AS q ORDER BY q DESC "
         "LIMIT 5")

    def test_default_keeps_pruned_direct_scans(self, spark, tpch_graph):
        df = cypher(spark, self.Q, tpch_graph)
        rows_default = [tuple(r) for r in df.collect()]
        plan = plan_of(df)
        assert "InMemoryTableScan" not in plan
        # the rel-id disambiguation window must prune away when ids are
        # unused — it would force a full lineitem shuffle per scan
        assert "Window" not in plan
        assert rows_default  # non-empty at sf0.001+

    def test_fusion_conf_serves_shards_from_cache(self, spark, tpch_graph):
        spark.conf.set("neo4j_spark.scan.fuseSharedBases", "true")
        try:
            df = cypher(spark, self.Q, tpch_graph)
            rows_fused = [tuple(r) for r in df.collect()]
            assert "InMemoryTableScan" in plan_of(df)
            assert "lineitem" in tpch_graph._persisted_bases
            # same answer either way
            df2 = cypher(spark, self.Q, tpch_graph)
            assert rows_fused == [tuple(r) for r in df2.collect()]
        finally:
            spark.conf.unset("neo4j_spark.scan.fuseSharedBases")
            base, _ = tpch_graph.rel_shared_bases["lineitem"]
            base.unpersist()
            tpch_graph._persisted_bases.discard("lineitem")

    def test_single_shard_statement_never_persists(self, spark,
                                                   tpch_graph):
        spark.conf.set("neo4j_spark.scan.fuseSharedBases", "true")
        try:
            df = cypher(spark,
                        "MATCH (o:Order)-[l:CONTAINS]->(:Part) "
                        "RETURN sum(l.quantity) AS q", tpch_graph)
            df.collect()
            assert "lineitem" not in tpch_graph._persisted_bases
            assert "InMemoryTableScan" not in plan_of(df)
        finally:
            spark.conf.unset("neo4j_spark.scan.fuseSharedBases")
