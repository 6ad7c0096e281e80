"""Deterministic sampling for training-data pipelines.

Everything here derives randomness from a *hash of a stable row key*, not
an RNG: the sample a row lands in is a pure function of (key, seed).  That
is the property a 100 TB training pipeline needs — re-running the job, a
task retry, a repartition, or growing the cluster never changes the
sample; new rows join a split without disturbing old ones; and lineage is
auditable ("why is doc X in val?" has a closed-form answer).  Spark's own
``df.sample``/``sampleBy`` are per-partition RNG draws and give none of
those guarantees.

Scale notes
-----------
* ``hash_split`` / ``stratified_sample`` / ``dataset_mix`` are pure column
  expressions (codegen'd, no shuffle, filter-pushdown friendly).
* ``take_sample`` / ``weighted_sample`` are ``ORDER BY hash LIMIT k`` —
  Spark plans TakeOrderedAndProject: one scan, per-partition top-k heaps,
  then a k-row merge on the driver.  O(N) work, no full sort shuffle;
  k must fit in driver memory (it is a *sample*, so it does).
* Leakage control: pass a *group* key (dup-group id, URL domain, user id)
  as ``key`` and every member of the group lands in the same split —
  train/test contamination via near-duplicates is prevented at the
  sampler, not by a downstream audit.

Two hash backends:

* ``xxhash64`` (default) — JVM-side, fastest, use in production.
* ``md5`` — byte-identical in DuckDB/Trino/Spark (first 13 hex chars →
  uniform in [0, 16^13)); use when a sample must be reproduced outside
  Spark.  Both give u ~ Uniform[0, 1) deterministic in (key, seed).

Reference scope: the reference engine has no sampler operator; this is
part of the training-data extension surface the brief asks for (exact
parallels: Spark ``sampleBy``, dbt/recipe hash-mod splits).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

_MD5_SPAN = float(16 ** 13)  # 13 hex chars => [0, 2^52), exact in double
_I64_SPAN = float(2 ** 63)


def uniform_hash(key: Column, seed: int = 0, hash_fn: str = "xxhash64") -> Column:
    """u ~ Uniform[0, 1), a pure function of (key, seed).

    ``md5`` variant is engine-portable: lowercase hex is standardized, so
    DuckDB's ``CAST('0x' || substring(md5(k || ':' || seed), 1, 13) AS
    UBIGINT) / 16^13`` reproduces it bit-for-bit.
    """
    if hash_fn == "xxhash64":
        h = F.xxhash64(key.cast("string"), F.lit(int(seed)))
        # map signed 64-bit to [0,1): shift by +2^63 via unsigned trick
        return (h.cast("double") / _I64_SPAN + 1.0) / 2.0
    if hash_fn == "md5":
        hx = F.substring(
            F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(int(seed))))),
            1, 13)
        return F.conv(hx, 16, 10).cast("double") / F.lit(_MD5_SPAN)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def hash_split(
    df: DataFrame,
    key: str,
    weights: Mapping[str, float],
    seed: int = 0,
    hash_fn: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hashed key.

    ``weights`` are relative (normalized internally); iteration order of
    the mapping fixes the threshold layout, so pass an ordered dict for a
    stable contract.  Rows sharing ``key`` share a split (leakage-safe
    when ``key`` is a group id).  Pure column expression — no shuffle.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    u = uniform_hash(F.col(key), seed, hash_fn)
    expr: Optional[Column] = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def kfold_split(
    df: DataFrame, key: str, k: int, seed: int = 0,
    hash_fn: str = "xxhash64", fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: fold = floor(u * k) in [0, k)."""
    u = uniform_hash(F.col(key), seed, hash_fn)
    return df.withColumn(
        fold_col, F.least(F.floor(u * k), F.lit(k - 1)).cast("int"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions,
    key: str,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep a deterministic fraction of each stratum.

    ``fractions`` is a single float (same rate everywhere) or a
    ``{stratum_value: fraction}`` dict; strata absent from the dict are
    dropped (rate 0).  Unlike ``df.sampleBy`` this needs no RNG and no
    per-stratum counts — one codegen'd filter over the scan.
    """
    u = uniform_hash(F.col(key), seed, hash_fn)
    if isinstance(fractions, (int, float)):
        return df.where(u < F.lit(float(fractions)))
    thresh: Column = F.lit(0.0)
    expr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        expr = F.when(cond, F.lit(float(frac))) if expr is None \
            else expr.when(cond, F.lit(float(frac)))
    thresh = expr.otherwise(F.lit(0.0)) if expr is not None else thresh
    return df.where(u < thresh)


def take_sample(
    df: DataFrame, k: int, key: str, seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Uniform sample of exactly k rows (distributed reservoir analog).

    Ordering by the key hash and taking k is equivalent to a uniform
    k-subset without replacement (every k-subset equally likely under an
    ideal hash) and is deterministic in (key, seed).  Plans as
    TakeOrderedAndProject: per-partition heaps + k-row driver merge — no
    global sort shuffle at 100 TB.
    """
    u = uniform_hash(F.col(key), seed, hash_fn).alias("_u")
    return (df.withColumn("_u", u)
              .orderBy("_u")
              .limit(int(k))
              .drop("_u"))


def weighted_sample(
    df: DataFrame, k: int, weight_col: str, key: str, seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Weighted sample without replacement (Efraimidis–Spirakis A-ES).

    Each row draws u = hash(key, seed) and scores u^(1/w); the top-k
    scores form a sample where inclusion probability is proportional to
    weight.  Same TakeOrdered plan shape as :func:`take_sample`.
    Rows with weight <= 0 are excluded.
    """
    u = uniform_hash(F.col(key), seed, hash_fn)
    w = F.col(weight_col).cast("double")
    score = F.pow(u, F.lit(1.0) / w)
    return (df.where(w > 0)
              .withColumn("_aes", score)
              .orderBy(F.desc("_aes"))
              .limit(int(k))
              .drop("_aes"))


def dataset_mix(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    key: str,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    counts: Optional[Mapping[str, int]] = None,
    source_col: str = "mix_source",
) -> DataFrame:
    """Downsample-only mixture of corpora at target proportions.

    Finds the largest total size at which every source can hit its target
    share WITHOUT upsampling (scale = min over s of n_s / share_s), then
    hash-filters each source at rate share_s * scale / n_s and unions.
    ``counts`` skips the per-source ``count()`` when sizes are known
    (e.g. from catalog stats); otherwise one cheap count aggregate per
    source.  Output carries ``source_col`` for provenance.
    """
    if set(sources) != set(weights):
        raise ValueError("sources and weights must have the same keys")
    total_w = float(sum(weights.values()))
    if counts is None:
        counts = {name: df.count() for name, df in sources.items()}
    shares = {name: weights[name] / total_w for name in sources}
    scale = min(counts[name] / shares[name]
                for name in sources if shares[name] > 0)
    out = None
    for name, df in sources.items():
        rate = 0.0 if counts[name] == 0 else \
            min(1.0, shares[name] * scale / counts[name])
        u = uniform_hash(F.col(key), seed, hash_fn)
        part = df.where(u < F.lit(rate)) \
                 .withColumn(source_col, F.lit(name))
        out = part if out is None else out.unionByName(part)
    return out


def md5_split_sql(key_sql: str, weights: Mapping[str, float],
                  seed: int = 0) -> str:
    """The ANSI-SQL (DuckDB-compatible) expression equivalent to
    ``hash_split(..., hash_fn='md5')`` — used by oracles and by pipelines
    that must reproduce a Spark-side split in another engine."""
    total = float(sum(weights.values()))
    u = (f"CAST('0x' || substring(md5(CAST({key_sql} AS VARCHAR) || "
         f"':{int(seed)}'), 1, 13) AS UBIGINT) / {_MD5_SPAN!r}")
    names = list(weights)
    acc = 0.0
    parts = ["CASE"]
    for name in names[:-1]:
        acc += weights[name] / total
        parts.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)


def pack_sequences(df: DataFrame, max_tokens: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   prefix_bytes: int = 2,
                   hash_fn: str = "xxhash64") -> DataFrame:
    """Concat-and-split sequence packing: assign every document a
    (pack_id, pack_offset) so that documents concatenated in a
    deterministic global order fill fixed ``max_tokens`` context windows
    — the standard LLM-pretraining packing step (documents are laid
    end-to-end; a window boundary may split a document, which the
    consumer handles with position offsets / attention resets).

    Deterministic global order: ``xxhash64(id)`` (a seeded shuffle and a
    stable order in one key).  Scale: the global running token count is
    a two-phase distributed prefix sum — per-bucket window cumsum (the
    shuffle is on the hash bucket, uniform by construction) plus an
    exclusive-prefix-sum window over the tiny per-bucket-totals frame
    (one two-long row per NON-EMPTY bucket), broadcast back — never a
    single-partition window over the data, and never a driver-side
    collect.  Each window task sorts one bucket, so size the bucket
    count to the corpus via ``prefix_bytes`` (leading bytes of the
    order key): 1 -> 256 buckets, 2 -> 65,536 (default; ~1.5 GB per
    bucket at 100 TB), 3 -> 16.7M (totals stay executor-side, so this
    setting is safe too).

    Returns the input columns plus ``n_tokens``, ``pack_id`` (the window
    this document STARTS in) and ``pack_offset`` (token offset within
    that window)."""
    from pyspark.sql import Window as SW

    from .text import token_count

    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    # The bucket must be a PREFIX of the order key (range bucketing by
    # the leading byte, uniform because the key is a hash): only then is
    # bucket-major concatenation identical to the global key order, so
    # per-bucket cumsums + bucket offsets == one global prefix sum.
    if not 1 <= int(prefix_bytes) <= 3:
        raise ValueError("prefix_bytes must be 1..3")
    pb = int(prefix_bytes)
    if hash_fn == "md5":
        # engine-portable order key: fixed-width lowercase hex orders
        # lexicographically == numerically, and DuckDB's md5 reproduces
        # it bit-for-bit (the uniform_hash md5 contract)
        key = F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                              F.lit("0"))), 1, 13)
        bk = F.conv(F.substring(key, 1, 2 * pb), 16, 10).cast("int")
    else:
        key = F.xxhash64(F.col(id_col).cast("string"))
        bk = (F.shiftright(key, 64 - 8 * pb)
              + F.lit(1 << (8 * pb - 1))).cast("int")
    base = (df.withColumn("_pk", key)
              .withColumn("_bk", bk)
              .withColumn("n_tokens", token_count(F.col(text_col))))
    w = SW.partitionBy("_bk").orderBy("_pk", id_col)
    base = base.withColumn(
        "_cum", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    # bucket offsets = exclusive prefix sum over the per-bucket totals —
    # one row per non-empty bucket.  Computed as a window over that tiny
    # totals frame, NEVER collected to the driver: at prefix_bytes=3 the
    # totals can reach 16.7M rows (a driver-side dict would stall), while
    # the single-task window over two-long rows is cheap at every
    # prefix_bytes setting.
    totals = base.groupBy("_bk").agg(F.sum("n_tokens").alias("_tot"))
    w_off = SW.orderBy("_bk").rowsBetween(SW.unboundedPreceding, -1)
    off = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off),
                           F.lit(0)).cast("long")).drop("_tot")
    out = (base.join(F.broadcast(off), "_bk")
           .withColumn("_gpos", F.col("_cum") + F.col("_off"))
           .withColumn("pack_id",
                       F.floor(F.col("_gpos") / F.lit(max_tokens))
                       .cast("long"))
           .withColumn("pack_offset",
                       F.pmod(F.col("_gpos"), F.lit(max_tokens))
                       .cast("long")))
    return out.drop("_pk", "_bk", "_cum", "_off", "_gpos")
