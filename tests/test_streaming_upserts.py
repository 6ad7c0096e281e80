"""Streaming graph upserts: events stream -> micro-batch MERGE into the
node store; final state must equal the one-shot batch aggregation."""

import tempfile

from pyspark.sql import functions as F


class TestStreamingUpserts:
    def test_stream_merges_equal_batch_agg(self, spark):
        from neo4j_spark.streaming.upserts import (
            ParquetGraphSink, node_updates_from_events, stream_graph_upserts)
        from neo4j_spark.streaming.windows import events_stream, load_events

        sf_dir = "/root/testdata/sf0.001"
        with tempfile.TemporaryDirectory() as d:
            sink = ParquetGraphSink(spark, d + "/store")
            import os
            os.makedirs(d + "/store")
            q = stream_graph_upserts(
                events_stream(spark, sf_dir), sink, d + "/ckpt")
            q.awaitTermination()

            got = {r["id"]: (r["n_events"], round(r["total_value"], 2))
                   for r in sink.read().collect()}
            want = {r["id"]: (r["n_events"], round(r["total_value"], 2))
                    for r in node_updates_from_events(
                        load_events(spark, sf_dir)).collect()}
            assert got == want
            assert len(got) > 0

    def test_incremental_merge_accumulates(self, spark):
        from neo4j_spark.streaming.upserts import ParquetGraphSink

        with tempfile.TemporaryDirectory() as d:
            import os
            os.makedirs(d + "/store")
            sink = ParquetGraphSink(spark, d + "/store")
            b1 = spark.createDataFrame(
                [(1, 2, 10.0), (2, 1, 5.0)],
                "id long, n_events long, total_value double")
            b2 = spark.createDataFrame(
                [(1, 3, 7.0), (3, 1, 1.0)],
                "id long, n_events long, total_value double")
            sink.merge_batch(b1, 0)
            sink.merge_batch(b2, 1)
            got = {r["id"]: (r["n_events"], r["total_value"])
                   for r in sink.read().collect()}
            assert got == {1: (5, 17.0), 2: (1, 5.0), 3: (1, 1.0)}


class TestNewProcedures:
    def test_fulltext_query_relationships(self, spark, tpch_graph):
        from neo4j_spark.procedures.registry import run_procedure

        df = run_procedure(spark, tpch_graph,
                           "db.index.fulltext.queryRelationships",
                           ["returnflag", "R"])
        rows = df.limit(5).collect()
        assert len(rows) == 5 and all(r["score"] > 0.0 for r in rows)

    def test_vector_query_relationships_empty_prop(self, spark, tpch_graph):
        from neo4j_spark.procedures.registry import ProcedureError, run_procedure
        import pytest

        with pytest.raises(ProcedureError):
            run_procedure(spark, tpch_graph,
                          "db.index.vector.queryRelationships",
                          ["embedding", 3, [1.0, 0.0]])

    def test_vector_query_relationships(self, spark):
        from neo4j_spark.graph import PropertyGraph
        from neo4j_spark.procedures.registry import run_procedure

        nodes = {"N": spark.createDataFrame(
            [(1, ["N"]), (2, ["N"])], "id long, labels array<string>")}
        rels = {"R": spark.createDataFrame(
            [(10, 1, 2, "R", [1.0, 0.0]), (11, 2, 1, "R", [0.0, 1.0])],
            "id long, src long, dst long, type string, vec array<double>")}
        g = PropertyGraph(nodes, rels)
        df = run_procedure(spark, g, "db.index.vector.queryRelationships",
                           ["vec", 1, [1.0, 0.1]])
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["relationship"] == 10

    def test_set_node_vector_property(self, spark):
        from neo4j_spark.graph import PropertyGraph
        from neo4j_spark.procedures.registry import run_procedure

        nodes = {"N": spark.createDataFrame(
            [(1, ["N"]), (2, ["N"])], "id long, labels array<string>")}
        g = PropertyGraph(nodes, {})
        run_procedure(spark, g, "db.index.vector.setNodeVectorProperty",
                      [1, "emb", [0.5, 0.5]])
        rows = {r["id"]: r["emb"] for r in g.nodes.collect()}
        assert rows[1] == [0.5, 0.5] and rows[2] is None

    def test_await_and_listconfig(self, spark, tpch_graph):
        from neo4j_spark.procedures.registry import run_procedure

        assert run_procedure(spark, tpch_graph, "db.awaitIndexes",
                             []).count() == 0
        cfg = {r["name"]: r["value"] for r in run_procedure(
            spark, tpch_graph, "dbms.listConfig", []).collect()}
        assert cfg.get("spark.sql.adaptive.enabled") == "true"


class TestStreamStreamJoin:
    def test_interval_join_streaming_equals_batch(self, spark):
        """Stream-stream interval join (two watermarked sides, time-range
        state bound) drains to the same pairs the batch plan produces."""
        import tempfile

        from neo4j_spark.streaming.windows import (
            events_stream, interval_self_join, load_events)

        sf_dir = "/root/testdata/sf0.001"
        batch_pairs = interval_self_join(load_events(spark, sf_dir))
        want = sorted((r.l_id, r.r_id) for r in batch_pairs.collect())

        stream_pairs = interval_self_join(events_stream(spark, sf_dir))
        assert stream_pairs.isStreaming
        with tempfile.TemporaryDirectory() as d:
            q = (stream_pairs.writeStream.format("memory")
                 .queryName("ssjoin").outputMode("append")
                 .option("checkpointLocation", d + "/ck")
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        got = sorted((r.l_id, r.r_id)
                     for r in spark.sql("SELECT * FROM ssjoin").collect())
        assert got == want and len(got) > 0
