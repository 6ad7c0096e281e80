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


class TestStreamingNearDup:
    def _corpus(self, spark, d):
        """documents + near-dup copies (one word changed), written to a
        tempdir so a file stream can replay them."""
        from pyspark.sql import functions as F

        docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .select("doc_id", "text").limit(40))
        dups = docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" near dup tail word soup"))
            .alias("text"))
        corpus = docs.unionByName(dups)
        corpus.coalesce(1).write.mode("overwrite") \
            .parquet(d + "/docs/documents.parquet")
        return spark.read.parquet(d + "/docs/documents.parquet")

    def test_rowwise_signatures_bit_identical_to_batch(self, spark):
        from neo4j_spark.ml.dedup import (_banded_signatures,
                                          exploded_shingles,
                                          rowwise_band_signatures)

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon"),
             (2, "alpha beta"),          # shorter than k tokens
             (3, ""),                    # empty
             (4, "alpha beta gamma"),    # exactly k
             (5, "Alpha, beta; GAMMA delta!")],  # analyzer punctuation
            "doc_id long, text string")
        batch = {tuple(r) for r in _banded_signatures(
            exploded_shingles(docs, "doc_id", "text", 3), 32, 8).collect()}
        roww = {tuple(r) for r in rowwise_band_signatures(
            docs, "doc_id", "text", 32, 8, 3).collect()}
        assert roww == batch and len(batch) == 5 * 8

    def test_stream_near_dup_equals_batch(self, spark):
        import tempfile

        from neo4j_spark.streaming.neardup import (build_near_dup_index,
                                                   stream_near_dup)

        with tempfile.TemporaryDirectory() as d:
            corpus = self._corpus(spark, d)
            build_near_dup_index(corpus, d + "/idx")

            batch_out = stream_near_dup(corpus, spark, d + "/idx",
                                        threshold=0.8)
            want = {(r.doc_id, r.corpus_id, r.jaccard)
                    for r in batch_out.collect()}
            # the synthesized copies must be found (symmetric pairs)
            assert len(want) > 0
            assert all(j >= 0.8 for _, _, j in want)
            assert any(b - a == 100000 for a, b, _ in want)

            stream = (spark.readStream.schema(corpus.schema)
                      .option("maxFilesPerTrigger", 1)
                      .parquet(d + "/docs/documents.parquet"))
            out = stream_near_dup(stream, spark, d + "/idx",
                                  threshold=0.8)
            assert out.isStreaming
            q = (out.writeStream.format("memory").queryName("neardup")
                 .outputMode("append")
                 .option("checkpointLocation", d + "/ck")
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            got = {(r.doc_id, r.corpus_id, r.jaccard) for r in
                   spark.sql("SELECT * FROM neardup").collect()}
            assert got == want
