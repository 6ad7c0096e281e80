"""Deterministic sampling: determinism, completeness, leakage-safety,
statistical shape, and engine-portability of the md5 variant."""

import duckdb
import pytest
from pyspark.sql import functions as F

from neo4j_spark.ml.sampling import (
    dataset_mix, hash_split, kfold_split, md5_split_sql,
    stratified_sample, take_sample, uniform_hash, weighted_sample,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


class TestHashSplit:
    def test_every_row_exactly_one_split(self, docs):
        out = hash_split(docs, "doc_id",
                         {"train": 0.8, "val": 0.1, "test": 0.1})
        assert out.count() == docs.count()
        names = {r[0] for r in out.select("split").distinct().collect()}
        assert names <= {"train", "val", "test"}

    def test_proportions_and_determinism(self, docs):
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = hash_split(docs, "doc_id", w, seed=7)
        counts = dict(a.groupBy("split").count().collect())
        n = docs.count()
        assert abs(counts.get("train", 0) / n - 0.8) < 0.08
        # identical assignment on re-run
        b = hash_split(docs, "doc_id", w, seed=7)
        assert a.select("doc_id", "split").exceptAll(
            b.select("doc_id", "split")).count() == 0
        # a different seed reshuffles
        c = hash_split(docs, "doc_id", w, seed=8)
        moved = a.alias("a").join(c.alias("c"), "doc_id") \
            .where(F.col("a.split") != F.col("c.split")).count()
        assert moved > 0

    def test_group_key_prevents_leakage(self, docs):
        # split on `source`: every doc of a source must share a split
        out = hash_split(docs, "source", {"train": 0.5, "test": 0.5})
        per_group = out.groupBy("source") \
            .agg(F.countDistinct("split").alias("k"))
        assert per_group.where(F.col("k") > 1).count() == 0

    def test_md5_matches_duckdb(self, docs, spark):
        w = {"train": 0.7, "heldout": 0.3}
        sp = hash_split(docs, "doc_id", w, seed=3, hash_fn="md5") \
            .select("doc_id", "split").collect()
        con = duckdb.connect()
        expr = md5_split_sql("doc_id", w, seed=3)
        du = con.sql(
            f"SELECT doc_id, {expr} AS split "
            f"FROM '{SF}/documents.parquet'").fetchall()
        assert sorted((r.doc_id, r.split) for r in sp) == \
            sorted((int(d), s) for d, s in du)


class TestKFold:
    def test_folds_cover_and_balance(self, docs):
        out = kfold_split(docs, "doc_id", 5, seed=1)
        counts = dict(out.groupBy("fold").count().collect())
        assert set(counts) == {0, 1, 2, 3, 4}
        n = docs.count()
        for c in counts.values():
            assert abs(c / n - 0.2) < 0.1


class TestStratified:
    def test_per_stratum_fractions(self, docs):
        fr = {"en": 0.5, "de": 0.1}
        out = stratified_sample(docs, "lang", fr, key="doc_id", seed=2)
        base = dict(docs.groupBy("lang").count().collect())
        got = dict(out.groupBy("lang").count().collect())
        assert set(got) <= set(fr)  # unlisted strata dropped
        for lang, frac in fr.items():
            if base.get(lang, 0) >= 30:
                assert abs(got.get(lang, 0) / base[lang] - frac) < 0.2

    def test_scalar_fraction(self, docs):
        out = stratified_sample(docs, "lang", 0.25, key="doc_id", seed=2)
        ratio = out.count() / docs.count()
        assert abs(ratio - 0.25) < 0.1


class TestTakeSample:
    def test_exact_k_and_deterministic(self, docs):
        a = take_sample(docs, 40, key="doc_id", seed=5)
        b = take_sample(docs, 40, key="doc_id", seed=5)
        assert a.count() == 40
        ids = lambda d: sorted(r.doc_id for r in d.select("doc_id").collect())
        assert ids(a) == ids(b)
        assert ids(a) != ids(take_sample(docs, 40, key="doc_id", seed=6))

    def test_plan_is_take_ordered(self, docs):
        plan = take_sample(docs, 10, key="doc_id") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_schema_unchanged(self, docs):
        assert take_sample(docs, 5, key="doc_id").columns == docs.columns


class TestWeightedSample:
    def test_weight_biases_inclusion(self, spark):
        # two strata, weights 10 vs 1 — heavy stratum should dominate
        rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, w double")
        out = weighted_sample(df, 200, "w", key="id", seed=11)
        heavy = out.where(F.col("id") < 500).count()
        assert out.count() == 200
        assert heavy > 130  # E[heavy] ≈ 180 under A-ES; uniform would be 100

    def test_zero_weight_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0), (2, 1.0), (3, -1.0)], "id long, w double")
        ids = {r.id for r in
               weighted_sample(df, 10, "w", key="id").collect()}
        assert ids == {2}


class TestDatasetMix:
    def test_mix_hits_target_shares(self, docs):
        srcs = {r[0]: docs.where(F.col("source") == r[0])
                for r in docs.select("source").distinct().collect()}
        if len(srcs) < 2:
            pytest.skip("need >=2 sources in fixture")
        names = sorted(srcs)[:2]
        mix = dataset_mix({n: srcs[n] for n in names},
                          {names[0]: 3.0, names[1]: 1.0},
                          key="doc_id", seed=4)
        counts = dict(mix.groupBy("mix_source").count().collect())
        tot = sum(counts.values())
        if tot >= 50:
            assert abs(counts.get(names[0], 0) / tot - 0.75) < 0.15

    def test_no_upsampling(self, docs):
        srcs = {r[0]: docs.where(F.col("source") == r[0])
                for r in docs.select("source").distinct().collect()}
        names = sorted(srcs)[:2]
        if len(names) < 2:
            pytest.skip("need >=2 sources")
        base = {n: srcs[n].count() for n in names}
        mix = dataset_mix({n: srcs[n] for n in names},
                          {names[0]: 1.0, names[1]: 1.0},
                          key="doc_id", seed=4, counts=base)
        counts = dict(mix.groupBy("mix_source").count().collect())
        for n in names:
            assert counts.get(n, 0) <= base[n]


class TestUniformHash:
    def test_range_and_mean(self, docs):
        stats = docs.select(
            uniform_hash(F.col("doc_id"), 9).alias("u")) \
            .agg(F.min("u"), F.max("u"), F.avg("u")).collect()[0]
        assert 0.0 <= stats[0] and stats[1] < 1.0
        assert abs(stats[2] - 0.5) < 0.1


class TestPackSequences:
    """Concat-and-split sequence packing (pack_sequences): the two-phase
    distributed prefix sum must reproduce one global ordered cumsum."""

    def _docs(self, spark, n=60):
        return spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(1 + i % 17)))
             for i in range(n)],
            "doc_id long, text string")

    def test_matches_local_global_cumsum(self, spark):
        import hashlib

        from neo4j_spark.ml.sampling import pack_sequences

        docs = self._docs(spark)
        out = {r["doc_id"]: (r["n_tokens"], r["pack_id"], r["pack_offset"])
               for r in pack_sequences(docs, 16, hash_fn="md5").collect()}
        # local oracle: md5 order, running token position
        rows = [(i, 1 + i % 17,
                 hashlib.md5(f"{i}:0".encode()).hexdigest()[:13])
                for i in range(60)]
        rows.sort(key=lambda t: (t[2], t[0]))
        pos = 0
        for i, nt, _ in rows:
            assert out[i] == (nt, pos // 16, pos % 16), i
            pos += nt

    def test_xxhash_path_invariants(self, spark):
        from neo4j_spark.ml.sampling import pack_sequences

        docs = self._docs(spark, 80)
        got = pack_sequences(docs, 32).collect()
        assert len(got) == 80
        total = sum(r["n_tokens"] for r in got)
        assert all(0 <= r["pack_offset"] < 32 for r in got)
        # global positions reconstruct a gapless concatenation
        positions = sorted(r["pack_id"] * 32 + r["pack_offset"]
                           for r in got)
        acc = 0
        lens = {r["pack_id"] * 32 + r["pack_offset"]: r["n_tokens"]
                for r in got}
        for p in positions:
            assert p == acc
            acc += lens[p]
        assert acc == total

    def test_deterministic_and_validates(self, spark):
        import pytest

        from neo4j_spark.ml.sampling import pack_sequences

        docs = self._docs(spark, 20)
        a = sorted(map(tuple, pack_sequences(docs, 8).collect()))
        b = sorted(map(tuple, pack_sequences(docs, 8).collect()))
        assert a == b
        with pytest.raises(ValueError, match="max_tokens"):
            pack_sequences(docs, 0)

    def test_prefix_bytes_invariant_and_no_driver_collect(self, spark):
        """Bucket granularity must not change the packing (the bucket is
        a prefix of the order key, so bucket-major == global order at
        every prefix_bytes), and the offsets must be computed without a
        driver-side collect — at prefix_bytes=3 the totals can reach
        16.7M rows."""
        import inspect

        from neo4j_spark.ml import sampling
        from neo4j_spark.ml.sampling import pack_sequences

        docs = self._docs(spark, 50)
        base = sorted(map(tuple, pack_sequences(docs, 16).collect()))
        for pb in (1, 3):
            got = sorted(map(tuple,
                             pack_sequences(docs, 16,
                                            prefix_bytes=pb).collect()))
            assert got == base, pb
        src = inspect.getsource(sampling.pack_sequences)
        assert ".collect()" not in src and ".head(" not in src
        assert "createDataFrame" not in src
