"""Streaming near-duplicate detection against an indexed corpus.

The 100 TB training-data shape: the historical corpus is indexed ONCE by
the batch MinHash path (banded LSH signatures + shingle sets, both plain
parquet partitioned for pruning), and incoming documents probe it as an
unbounded stream — the probe is stream-STATIC equi-joins plus per-row
expressions only, no streaming state at all (no watermark, no state
store), so throughput is bounded by the index lookup.

Reference analog: none (the reference is an OLTP store, SURVEY.md §2.9)
— this extends the batch dedup operators (ml/dedup.py) to the streaming
ingest path the brief mandates.

Exactness: candidate generation is the SAME banded LSH as the batch path
(rowwise signatures are bit-identical to exploded_shingles +
_banded_signatures, asserted in tests/test_ml_extensions.py), and every
candidate is verified with the exact shingle-set Jaccard before it is
emitted — so stream-vs-batch results agree exactly on the same inputs
(asserted in tests/test_streaming_upserts.py).

Scale notes:
- the banded index is partitioned by ``band``: a probe joins 1/bands of
  the index files per band key, and (band, bh) is high-cardinality, so
  the static side joins without skew;
- output may contain the same (doc, corpus) pair once per colliding
  band (deduping would need streaming state; exact-dedup consumers take
  DISTINCT per micro-batch downstream);
- self-matches (a document probing an index that contains it) are
  filtered on id inequality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ml.dedup import (_banded_signatures, exploded_shingles, jaccard,
                        rowwise_bands_of, rowwise_shingle_hashes)


def build_near_dup_index(docs: DataFrame, path: str,
                         id_col: str = "doc_id", text_col: str = "text",
                         num_hashes: int = 32, bands: int = 8,
                         shingle_k: int = 3) -> None:
    """Materialize the probe-side index: banded LSH signatures
    (partitioned by band) and exact shingle sets, via the batch
    (window-chain) signature path."""
    ex = exploded_shingles(docs, id_col, text_col, shingle_k).persist()
    (_banded_signatures(ex, num_hashes, bands)
     .write.mode("overwrite").partitionBy("band")
     .parquet(f"{path}/bands"))
    (ex.groupBy("_id").agg(F.collect_set("_s").alias("_sh"))
     .write.mode("overwrite").parquet(f"{path}/shingles"))
    ex.unpersist()


def stream_near_dup(doc_stream: DataFrame, spark: SparkSession,
                    index_path: str, id_col: str = "doc_id",
                    text_col: str = "text", threshold: float = 0.8,
                    num_hashes: int = 32, bands: int = 8,
                    shingle_k: int = 3) -> DataFrame:
    """(doc_id, corpus_id, jaccard) for streamed documents whose exact
    shingle Jaccard against an indexed corpus document is >= threshold.
    Works identically on a batch DataFrame (stream-agnostic plan).

    The document's shingle set is CARRIED through the band explode (one
    projection) rather than re-derived on a second stream branch — a
    branch would make the candidate join stream-stream and drag in
    watermark state for what is logically a per-row attribute."""
    idx = spark.read.parquet(f"{index_path}/bands") \
        .withColumnRenamed("_id", "corpus_id")
    sets = spark.read.parquet(f"{index_path}/shingles") \
        .withColumnRenamed("_id", "corpus_id") \
        .withColumnRenamed("_sh", "sh_corpus")
    sig = (doc_stream.select(
               F.col(id_col).alias("_id"),
               F.array_distinct(rowwise_shingle_hashes(
                   F.col(text_col), shingle_k)).alias("sh_doc"))
           .select("_id", "sh_doc",
                   F.explode(rowwise_bands_of(
                       F.col("sh_doc"), num_hashes, bands)).alias("bb"))
           .select("_id", "sh_doc", F.col("bb.band").alias("band"),
                   F.col("bb.bh").alias("bh")))
    return (sig.join(idx, ["band", "bh"])
            .filter(F.col("_id") != F.col("corpus_id"))
            .join(sets, "corpus_id")
            .withColumn("jaccard", F.round(
                jaccard(F.col("sh_doc"), F.col("sh_corpus")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select(F.col("_id").alias(id_col), "corpus_id", "jaccard"))
