"""Round-8 optimization pins: plan shapes and semantics for rel-shard
endpoint pruning, the single-pass document_stats, the hash-proxy distinct
count, the QPP-unroll schema pruning, and the unpersisted minhash
pipeline.  Each test guards an optimization that would silently regress
(the plan would stay correct but re-grow the pruned scans/shuffles)."""

import pytest
from pyspark.sql import functions as F

from neo4j_spark.api import cypher


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestRelShardPruning:
    def test_bound_endpoint_label_prunes_union_shard(self, spark,
                                                     tpch_graph):
        """(n:Nation)<-[:FROM_NATION]-(s:Supplier): the FROM_NATION scan
        must read only the supplier shard — no customer.parquet."""
        df = cypher(spark,
                    "MATCH (n:Nation)<-[:FROM_NATION]-(s:Supplier) "
                    "RETURN count(*) AS n", tpch_graph)
        plan = plan_of(df)
        assert "customer.parquet" not in plan
        assert "supplier.parquet" in plan

    def test_undirected_scan_prunes_per_orientation(self, spark,
                                                    tpch_graph):
        """(n:Nation)-[:FROM_NATION]-(x): no FROM_NATION edge STARTS at a
        Nation, so the forward orientation prunes to nothing and each
        shard is scanned once (reverse orientation only)."""
        df = cypher(spark,
                    "MATCH (n:Nation)-[:FROM_NATION]-(x) "
                    "RETURN count(*) AS n", tpch_graph)
        plan = plan_of(df)
        assert plan.count("customer.parquet") == 1
        assert plan.count("supplier.parquet") == 1

    def test_pruned_results_match_unpruned(self, spark, tpch_graph):
        n = cypher(spark,
                   "MATCH (:Customer)-[:FROM_NATION]->(n:Nation) "
                   "RETURN count(*) AS n", tpch_graph).collect()[0][0]
        # label via WHERE on the full scan (no pattern label => no prune)
        m = cypher(spark,
                   "MATCH (c)-[:FROM_NATION]->(n:Nation) "
                   "WHERE c:Customer RETURN count(*) AS n",
                   tpch_graph).collect()[0][0]
        assert n == m

    def test_mutated_labels_disable_pruning(self, spark, tpch_graph):
        """After a label mutation the shard guarantee is void: pruning
        must fall back to the full union (correctness over speed)."""
        g = tpch_graph.copy()
        g.note_extra_label("Supplier")
        df = cypher(spark,
                    "MATCH (n:Nation)<-[:FROM_NATION]-(s:Supplier) "
                    "RETURN count(*) AS n", g)
        assert "customer.parquet" in plan_of(df)

    def test_copy_after_write_keeps_pruning_disabled(self, spark,
                                                     tpch_graph):
        """copy() must carry the ORIGINAL shard-union identities: a copy
        taken after a write replaced the frame must not re-bless the
        replaced frame and prune against stale shards."""
        g = tpch_graph.copy()
        base = g.rel_frames["FROM_NATION"]
        g.rel_frames["FROM_NATION"] = base.filter(F.lit(True))
        g2 = g.copy()
        assert not g2._shard_pruning_ok("FROM_NATION")

    def test_write_replacing_rel_frame_disables_pruning(self, spark,
                                                        tpch_graph):
        """A write that replaces the FROM_NATION frame breaks the shard
        identity; scans must use the replaced frame unpruned."""
        g = tpch_graph.copy()
        base = g.rel_frames["FROM_NATION"]
        g.rel_frames["FROM_NATION"] = base.filter(F.lit(True))
        assert not g._shard_pruning_ok("FROM_NATION")
        df = g.rels_for_types(["FROM_NATION"], src_labels=["Supplier"])
        # unpruned: still the full union row count
        assert df.count() == base.count()


class TestQppUnrollPruning:
    def test_unit_scans_prune_by_reach(self, spark, tpch_graph):
        """((x)-[:FROM_NATION|IN_REGION]->(y)){2,2} from a Customer: copy
        1 can only be FROM_NATION (customer shard), copy 2 only
        IN_REGION — the supplier shard and per-copy dead types are
        never scanned."""
        df = cypher(spark,
                    "MATCH (c:Customer) ((x)-[:FROM_NATION|IN_REGION]->(y))"
                    "{2,2} (r:Region) RETURN count(*) AS n", tpch_graph)
        plan = plan_of(df)
        assert "supplier.parquet" not in plan
        n = df.collect()[0][0]
        assert n == cypher(
            spark,
            "MATCH (c:Customer)-[:FROM_NATION]->(:Nation)"
            "-[:IN_REGION]->(r:Region) RETURN count(*) AS n",
            tpch_graph).collect()[0][0]


class TestSinglePassDocumentStats:
    def test_one_scan_no_join(self, spark, docs):
        from neo4j_spark.ml.text import document_stats

        out = document_stats(docs).select("doc_id", "n_tokens", "quality")
        plan = plan_of(out)
        assert plan.count("Scan parquet") <= 1
        assert "Join" not in plan
        # unused payload column pruned out of the aggregate entirely
        read = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read

    def test_payload_never_crosses_the_exchange(self, spark, docs):
        """The bench path selects only derived scalars, so Catalyst must
        prune every payload-carrying first() aggregate: a future change
        that defeats that pruning would silently re-shuffle the corpus
        (text) through the stats exchange."""
        from neo4j_spark.ml.text import document_stats

        out = document_stats(docs).select(
            "doc_id", "n_tokens", "quality", "lang_pred")
        plan = plan_of(out)
        # no first(text) buffer in any aggregate (partial or final): the
        # only string crossing the exchange is the exploded token column
        import re
        assert not re.search(r"first\(text#\d+", plan)
        # and the raw text column is consumed by the Generate, never
        # carried alongside the exploded tokens into the aggregate
        gen_out = re.search(r"Generate explode\([^\n]*\[(_t#\d+)\]", plan)
        assert gen_out, plan
        above_gen = plan[:plan.index("Generate explode")]
        assert not re.search(r"HashAggregate[^\n]*text#\d+", above_gen)

    def test_values_unchanged(self, spark, docs):
        from neo4j_spark.ml.text import document_stats

        rows = (document_stats(docs.limit(30))
                .select("doc_id", "n_tokens", "n_chars_computed",
                        "punct_ratio", "stopword_ratio", "mean_word_len",
                        "quality", "lang_pred", "fingerprint")
                .orderBy("doc_id").collect())
        assert len(rows) == 30
        for r in rows:
            assert r.n_tokens >= 0 and 0 <= r.quality <= 1
            # fingerprint must equal the direct per-row expression
        direct = (docs.limit(30).select(
            "doc_id",
            F.xxhash64(F.concat_ws("", F.split(
                F.lower("text"), r"[^\p{L}\p{N}']+"))).alias("fp"))
            .orderBy("doc_id").collect())
        assert [r.fingerprint for r in rows] == [r.fp for r in direct]


class TestHashProxyDistinctCount:
    def test_matches_exact_distinct(self, spark, docs):
        from neo4j_spark.ml.dedup import distinct_count_by

        got = {(r[0], r[1]) for r in
               distinct_count_by(docs, ["lang"], "text",
                                 alias="n").collect()}
        want = {(r[0], r[1]) for r in
                docs.groupBy("lang")
                .agg(F.count_distinct("text").alias("n")).collect()}
        assert got == want

    def test_null_values_excluded(self, spark):
        from neo4j_spark.ml.dedup import distinct_count_by

        df = spark.createDataFrame(
            [("a", "x"), ("a", None), ("a", "x"), ("b", None)],
            "g string, v string")
        rows = {(r[0], r[1]) for r in
                distinct_count_by(df, ["g"], "v").collect()}
        assert rows == {("a", 1), ("b", 0)}

    def test_no_payload_in_exchange(self, spark, docs):
        from neo4j_spark.ml.dedup import distinct_count_by

        plan = plan_of(distinct_count_by(docs, ["lang"], "text"))
        # the exchange carries the 128-bit proxy (struct of two seeded
        # xxhash64 halves), not the text column; the partial distinct
        # stays a codegen'd HashAggregate (map-side combine below the
        # exchange)
        import re
        assert re.search(r"xxhash64\(text#\d+, 42", plan)  # seed 42 half
        assert re.search(r"xxhash64\(text#\d+, 43", plan)  # seed 43 half
        assert "SortAggregate" not in plan
        # every exchange is narrow: (lang, proxy) / (lang, count) — two
        # columns, never the payload as its own attribute
        for m in re.finditer(r"\(\d+\) Exchange\n(Input \[\d+\]): \[(.*)\]",
                             plan):
            assert m.group(1) == "Input [2]", plan
            # a raw payload attribute would appear as a bare `text#N`
            # list element; inside the proxy it is always wrapped in
            # xxhash64(...)/isnotnull(...)
            assert not any(re.fullmatch(r"text#\d+", part.strip())
                           for part in m.group(2).split(", ")
                           if "(" not in part), plan


class TestPreaggOptionalCount:
    """OPTIONAL MATCH (a)-[r:T]->(b) + aggregating count(b)/count(r):
    the rel scan is pre-aggregated per source and left-joined instead of
    outer-joining the whole relationship rowstream (guide §2.3)."""

    def test_plan_preaggregates_before_join(self, spark, tpch_graph):
        df = cypher(spark,
                    "MATCH (c:Customer) OPTIONAL MATCH "
                    "(c)-[:PLACED]->(o:Order) "
                    "RETURN c.custkey AS ck, count(o) AS n", tpch_graph)
        plan = plan_of(df)
        # one orders scan (the rel side), no Order node-frame join, and
        # column pruning reaches it (only the FK column is read)
        assert plan.count("orders.parquet") == 1
        assert "struct<o_custkey:bigint>" in plan
        # the rel side is aggregated BELOW the outer join (per-source
        # partial_count collapses the scan before its exchange)
        join_pos = plan.index("LeftOuter")
        assert "partial_count" in plan[join_pos:], \
            "per-source count aggregate must sit under the left join"

    def test_results_match_unrewritten(self, spark, tpch_graph):
        from neo4j_spark.cypher import translate as TR

        q = ("MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
             "RETURN c.custkey AS ck, count(o) AS n")
        on = sorted(map(tuple, cypher(spark, q, tpch_graph).collect()))
        orig = TR.Translator._preagg_optional_count
        try:
            TR.Translator._preagg_optional_count = \
                lambda self, df, m, nxt: None
            off = sorted(map(tuple, cypher(spark, q, tpch_graph).collect()))
        finally:
            TR.Translator._preagg_optional_count = orig
        assert on == off

    def test_global_count_zero_rows(self, spark, tpch_graph):
        # empty source: global count over the rewrite must still be 0
        rows = cypher(spark,
                      "MATCH (c:Customer) WHERE c.custkey < 0 "
                      "OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
                      "RETURN count(o) AS n", tpch_graph).collect()
        assert [tuple(r) for r in rows] == [(0,)]

    def test_bails_on_where_and_multiplicity(self, spark, tpch_graph):
        from neo4j_spark.cypher import translate as TR

        hits = []
        orig = TR.Translator._preagg_optional_count

        def spy(self, df, m, nxt):
            r = orig(self, df, m, nxt)
            hits.append(r is not None)
            return r

        TR.Translator._preagg_optional_count = spy
        try:
            # optional WHERE must keep the outer-join lowering
            cypher(spark,
                   "MATCH (c:Customer) OPTIONAL MATCH "
                   "(c)-[:PLACED]->(o:Order) WHERE o.totalprice > 0 "
                   "RETURN c.custkey AS ck, count(o) AS n", tpch_graph)
            # count(*) observes join multiplicity
            cypher(spark,
                   "MATCH (c:Customer) OPTIONAL MATCH "
                   "(c)-[:PLACED]->(o:Order) "
                   "RETURN c.custkey AS ck, count(*) AS n", tpch_graph)
            # a second aggregate over an optional var's property
            cypher(spark,
                   "MATCH (c:Customer) OPTIONAL MATCH "
                   "(c)-[:PLACED]->(o:Order) "
                   "RETURN c.custkey AS ck, count(o) AS n, "
                   "min(o.totalprice) AS m", tpch_graph)
        finally:
            TR.Translator._preagg_optional_count = orig
        assert hits == [False, False, False]


class TestPreaggTrailingCount:
    """Inner-chain sibling: MATCH ...-[l:CONTAINS]->(p) + count(*)
    pre-aggregates the trailing (lineitem-scale) rel scan per source
    before the join instead of multiplying the chain rowstream."""

    def test_plan_preaggregates_trailing_hop(self, spark, tpch_graph):
        df = cypher(spark,
                    "MATCH (c:Customer)-[:PLACED]->(o:Order)"
                    "-[l:CONTAINS]->(p:Part) "
                    "WHERE c.mktsegment = 'AUTOMOBILE' "
                    "RETURN count(*) AS n", tpch_graph)
        plan = plan_of(df)
        # the Part node frame is gone and lineitem is read once, one
        # column, aggregated below the join
        assert "part.parquet" not in plan
        assert plan.count("lineitem.parquet") == 1
        assert "struct<l_orderkey:bigint>" in plan
        join_pos = plan.index("Inner")
        assert "partial_count" in plan[join_pos:]

    def test_results_match_unrewritten(self, spark, tpch_graph):
        from neo4j_spark.cypher import translate as TR

        q = ("MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p) "
             "RETURN c.custkey AS ck, count(*) AS n ORDER BY ck")
        on = sorted(map(tuple, cypher(spark, q, tpch_graph).collect()))
        orig = TR.Translator._preagg_trailing_count
        try:
            TR.Translator._preagg_trailing_count = \
                lambda self, df, m, nxt: None
            off = sorted(map(tuple, cypher(spark, q, tpch_graph).collect()))
        finally:
            TR.Translator._preagg_trailing_count = orig
        assert on == off

    def test_bails_on_multiplicity_and_uniqueness(self, spark, tpch_graph):
        from neo4j_spark.cypher import translate as TR

        hits = []
        orig = TR.Translator._preagg_trailing_count

        def spy(self, df, m, nxt):
            r = orig(self, df, m, nxt)
            hits.append(r is not None)
            return r

        TR.Translator._preagg_trailing_count = spy
        try:
            # WHERE touching the trailing node
            cypher(spark,
                   "MATCH (c:Customer)-[:PLACED]->(o:Order)"
                   "-[:CONTAINS]->(p:Part) WHERE p.retailprice > 0 "
                   "RETURN count(*) AS n", tpch_graph)
            # another aggregate observes the multiplicity
            cypher(spark,
                   "MATCH (c:Customer)-[:PLACED]->(o:Order)"
                   "-[:CONTAINS]->(p) "
                   "RETURN count(*) AS n, sum(o.totalprice) AS s",
                   tpch_graph)
            # untyped trailing rel: uniqueness vs PLACED is real
            cypher(spark,
                   "MATCH (c:Customer)-[:PLACED]->(o:Order)-[]->(p) "
                   "RETURN count(*) AS n", tpch_graph)
        finally:
            TR.Translator._preagg_trailing_count = orig
        assert hits == [False, False, False]


class TestPreaggPatternSub:
    """EXISTS{}/COUNT{} pattern subqueries anchored at one bound bare
    node: the rel scan is aggregated/deduplicated per edge end FIRST and
    the small (id[, count]) frame left-joined back, instead of running
    the pattern match from a broadcast of every distinct outer id
    (guide §2.3/§2.4)."""

    def test_count_plan_preaggregates_scan(self, spark, tpch_graph):
        df = cypher(spark,
                    "MATCH (c:Customer) RETURN c.custkey AS ck, "
                    "COUNT { (c)-[:PLACED]->() } AS n", tpch_graph)
        plan = plan_of(df)
        # one single-column orders scan, ONE customer scan (the generic
        # lowering scans customer twice: outer + distinct build side)
        assert plan.count("orders.parquet") == 1
        assert plan.count("customer.parquet") == 1
        assert "struct<o_custkey:bigint>" in plan
        # per-source partial count sits below the left join
        join_pos = plan.index("LeftOuter")
        assert "partial_count" in plan[join_pos:]

    def test_exists_plan_dedups_scan(self, spark, tpch_graph):
        df = cypher(spark,
                    "MATCH (c:Customer) "
                    "WHERE EXISTS { (c)-[:PLACED]->(:Order) } "
                    "RETURN count(*) AS n", tpch_graph)
        plan = plan_of(df)
        assert plan.count("orders.parquet") == 1
        assert plan.count("customer.parquet") == 1

    def test_results_match_unrewritten(self, spark, tpch_graph):
        from neo4j_spark.cypher import translate as TR

        queries = [
            "MATCH (c:Customer) RETURN c.custkey AS ck, "
            "COUNT { (c)-[:PLACED]->() } AS n",
            "MATCH (o:Order) RETURN o.orderkey AS ok, "
            "COUNT { ()-[:PLACED]->(o) } AS n",
            "MATCH (n:Nation) RETURN n.name AS nm, "
            "COUNT { (n)-[:FROM_NATION]-() } AS n",
            "MATCH (c:Customer) WHERE EXISTS { (c)-[:PLACED]->() } "
            "RETURN count(*) AS n",
            "MATCH (c:Customer) WHERE NOT (c)-[:PLACED]->(:Order) "
            "RETURN count(*) AS n",
        ]
        orig = TR.Translator._preagg_pattern_sub
        for q in queries:
            on = sorted(map(tuple, cypher(spark, q, tpch_graph).collect()))
            try:
                TR.Translator._preagg_pattern_sub = \
                    lambda self, cur_df, parts, where: None
                off = sorted(map(tuple,
                                 cypher(spark, q, tpch_graph).collect()))
            finally:
                TR.Translator._preagg_pattern_sub = orig
            assert on == off, q

    def test_null_anchor_counts_zero(self, spark, tpch_graph):
        # a null binding matches no pattern: COUNT 0, EXISTS false
        rows = cypher(spark,
                      "MATCH (c:Customer) OPTIONAL MATCH "
                      "(c)-[:NOPE]->(q) WITH q LIMIT 5 "
                      "RETURN COUNT { (q)-[:PLACED]->() } AS n, "
                      "EXISTS { (q)-[:PLACED]->() } AS e",
                      tpch_graph).collect()
        assert all(tuple(r) == (0, False) for r in rows)

    def test_bails_on_unsupported_shapes(self, spark, tpch_graph):
        from neo4j_spark.cypher import translate as TR

        hits = []
        orig = TR.Translator._preagg_pattern_sub

        def spy(self, cur_df, parts, where):
            r = orig(self, cur_df, parts, where)
            hits.append(r is not None)
            return r

        TR.Translator._preagg_pattern_sub = spy
        try:
            # inner WHERE correlates beyond the anchor id
            cypher(spark,
                   "MATCH (c:Customer) RETURN COUNT { "
                   "(c)-[:PLACED]->(o) WHERE o.orderkey > 0 } AS n",
                   tpch_graph)
            # two-hop pattern
            cypher(spark,
                   "MATCH (c:Customer) RETURN COUNT { "
                   "(c)-[:PLACED]->()-[:CONTAINS]->() } AS n", tpch_graph)
            # label on the anchor is a re-check the scan cannot see
            cypher(spark,
                   "MATCH (c:Customer) RETURN COUNT { "
                   "(c:Customer)-[:PLACED]->() } AS n", tpch_graph)
            # fresh label not implied by the rel's endpoint declaration
            # (PLACED src is declared Customer; Supplier never matches)
            cypher(spark,
                   "MATCH (o:Order) RETURN COUNT { "
                   "(o)<-[:PLACED]-(s:Supplier) } AS n", tpch_graph)
            # sharded endpoint WITHOUT a pinning label: the union scan
            # could carry either alternative, so no guarantee (the
            # pinned-label case fires as of r9 — see
            # test_r9_optimizations.TestPatternSubRelPropWhere)
            cypher(spark,
                   "MATCH (n:Nation) RETURN COUNT { "
                   "(n)<-[:FROM_NATION]-(c:Customer:Supplier) } AS n",
                   tpch_graph)
        finally:
            TR.Translator._preagg_pattern_sub = orig
        assert hits == [False, False, False, False, False]


class TestKeyPropElision:
    """Key-property elision: when an endpoint's label is pinned by the
    rel type declaration and the var is used ONLY as ``var.keyprop``,
    the node-frame join is replaced by deriving the key from the
    edge-end id (PropertyGraph.node_key_props: id = offset + key)."""

    def test_both_endpoints_elide_to_one_scan(self, spark, tpch_graph):
        df = cypher(spark,
                    "MATCH (o:Order)-[:SUPPLIED_BY]->(s:Supplier) "
                    "RETURN s.suppkey AS suppkey, "
                    "count(DISTINCT o.orderkey) AS n", tpch_graph)
        plan = plan_of(df)
        # the whole query is ONE lineitem scan: no orders/supplier frame
        assert "orders.parquet" not in plan
        assert "supplier.parquet" not in plan
        assert plan.count("lineitem.parquet") == 1
        assert "Join" not in plan

    def test_results_match_unrewritten(self, spark, tpch_graph):
        from neo4j_spark.cypher import translate as TR

        queries = [
            "MATCH (o:Order)-[:SUPPLIED_BY]->(s:Supplier) "
            "RETURN s.suppkey AS suppkey, count(DISTINCT o.orderkey) AS n",
            "MATCH (c:Customer)-[:PLACED]->(o:Order) "
            "WHERE o.orderkey % 7 = 0 RETURN count(*) AS n",
            "MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part)"
            " RETURN c.custkey AS ck, count(o.orderkey) AS n",
        ]
        orig = TR.Translator._var_key_prop_only
        for q in queries:
            on = sorted(map(tuple, cypher(spark, q, tpch_graph).collect()))
            try:
                TR.Translator._var_key_prop_only = lambda self, n, p: False
                off = sorted(map(tuple,
                                 cypher(spark, q, tpch_graph).collect()))
            finally:
                TR.Translator._var_key_prop_only = orig
            assert on == off, q

    def test_bails_on_full_entity_use(self, spark, tpch_graph):
        # any non-key-prop use keeps the node join
        for q in [
            "MATCH (c:Customer)-[:PLACED]->(o:Order) "
            "RETURN o.orderkey AS k, o.orderstatus AS st",
            "MATCH (c:Customer)-[:PLACED]->(o:Order) WITH o "
            "RETURN o.orderkey AS k",
            "MATCH (c:Customer)-[:PLACED]->(o:Order) "
            "RETURN labels(o) AS l, o.orderkey AS k",
        ]:
            assert "orders.parquet" in plan_of(
                cypher(spark, q + " LIMIT 1", tpch_graph))

    def test_write_in_statement_disables(self, spark, tpch_graph):
        # the write gate sits BEFORE the usage analysis in key_elidable:
        # in a writing statement _var_key_prop_only must never be
        # consulted, even when every use is the key prop
        from neo4j_spark.cypher import translate as TR

        g = tpch_graph.copy()
        calls = []
        orig = TR.Translator._var_key_prop_only

        def spy(self, name, prop):
            calls.append((name, prop))
            return orig(self, name, prop)

        TR.Translator._var_key_prop_only = spy
        try:
            cypher(spark,
                   "MATCH (c:Customer)-[:PLACED]->(o:Order) "
                   "CREATE (:Marker {k: o.orderkey})", g)
        finally:
            TR.Translator._var_key_prop_only = orig
        assert calls == []

    def test_frame_replacement_voids_declaration(self, spark, tpch_graph):
        g = tpch_graph.copy()
        # simulate a write replacing the Order frame (ids minted outside
        # the source bijection): key_prop_of must return None
        g.node_frames["Order"] = g.node_frames["Order"].limit(10)
        assert g.key_prop_of("Order") is None
        assert g.key_prop_of("Customer") is not None
        df = cypher(spark,
                    "MATCH (c:Customer)-[:PLACED]->(o:Order) "
                    "RETURN count(o.orderkey) AS n", g)
        assert "orders.parquet" in plan_of(df)

    def test_extra_label_voids_declaration(self, spark, tpch_graph):
        g = tpch_graph.copy()
        g.note_extra_label("Order")
        assert g.key_prop_of("Order") is None

    def test_copy_preserves_declared_identity(self, spark, tpch_graph):
        g = tpch_graph.copy()
        assert g.key_prop_of("Order") == (
            "orderkey", 6 * 10 ** 12)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
