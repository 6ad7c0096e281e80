"""Text analysis operators for large-scale corpus pipelines.

All pure ``pyspark.sql.functions`` column expressions (JVM-side, codegen'd,
no Python UDFs) so they survive 100 TB scans: token counting, quality
scoring, language id (stopword-ratio heuristic), and rolling-hash
fingerprinting.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.let import let

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "para", "que"],
}


def tokens(text: Column) -> Column:
    """Whitespace + punctuation tokenizer (BPE-ish word split)."""
    return F.filter(
        F.split(F.lower(text), r"[^\p{L}\p{N}']+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0),
        lambda acc, x: acc + x)
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length, punctuation, stopwords."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    sw_score = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return F.round((len_score + punct_score + sw_score) / 3, 6)


def _lang_vote(toks: Column) -> Column:
    """array<struct<h,ni>> of stopword-hit counts per language.  ``ni`` is
    the negated language index so ``array_max`` (lexicographic struct
    order) picks the highest hit count and, on ties, the EARLIEST language
    in ``STOPWORDS`` order — matching a strict-greater argmax loop."""
    return F.array(*[
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(sw))).alias("h"),
            F.lit(-i).alias("ni"))
        for i, (_, sw) in enumerate(STOPWORDS.items())])


def _lang_pick(vote: Column) -> Column:
    langs = F.array(*[F.lit(lang) for lang in STOPWORDS])
    best = F.array_max(vote)
    return F.when(best["h"] > 0,
                  F.element_at(langs, F.lit(1) - best["ni"])) \
            .otherwise(F.lit("und"))


def language_id(text: Column) -> Column:
    """Stopword-vote language id over the built-in lists; 'und' if no vote."""
    return let(_lang_vote(tokens(text)), _lang_pick)


def fingerprint(text: Column) -> Column:
    """Order-sensitive 64-bit document fingerprint: xxhash of the token
    stream (rolling-hash analog, shuffle-free)."""
    return F.xxhash64(F.concat_ws("", tokens(text)))


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All stats in one explode + codegen'd aggregate pass — ONE scan,
    ONE (map-side-combined) shuffle, NO join.

    The per-row HOF form (filter/aggregate lambdas over a let-bound token
    array) is a CodegenFallback — ~0.26 ms/row interpreted, which is the
    difference between a day and a month at 100 TB.  Instead: explode the
    token stream once and count tokens / stopword hits / token chars with
    plain conditional aggregates (whole-stage codegen, map-side partial
    agg).

    Everything per-doc that needs no token loop (the original columns,
    char count, punct ratio, fingerprint — ``concat_ws`` drops empty
    strings, so the fingerprint needs no token filter) is computed BEFORE
    the explode and carried through the aggregate as ``first()`` — the
    partial aggregate collapses the exploded rows per doc before the
    exchange, so the shuffle moves one row of small scalars per document
    and, unless the caller actually selects them, none of the original
    payload columns (Catalyst prunes unused ``first()`` aggregates; the
    former join-back shape re-shuffled the whole corpus, text included,
    to meet the aggregated side).  The earlier join key
    (``monotonically_increasing_id`` on a second scan of the same files)
    is also gone — the row id is computed once, on the only scan."""
    t = F.col(text_col)
    split_pat = r"[^\p{L}\p{N}']+"
    langs = list(STOPWORDS)
    base = df.select(
        "*",
        F.monotonically_increasing_id().alias("__did"),
        F.length(t).cast("long").alias("__n_chars"),
        (F.length(F.regexp_replace(t, r"[\p{L}\p{N}\s]", ""))
         / F.greatest(F.length(t), F.lit(1))).alias("__p_ratio"),
        F.xxhash64(F.concat_ws("", F.split(F.lower(t), split_pat)))
         .alias("__fp"))
    carried = [c for c in base.columns if c != "__did"]
    toks = base.select(
        *carried, "__did",
        F.explode_outer(F.split(F.lower(t), split_pat)).alias("_t"))
    valid = F.col("_t").isNotNull() & (F.col("_t") != "")
    aggs = toks.groupBy("__did").agg(
        *[F.first(c).alias(c) for c in carried],
        F.sum(F.when(valid, 1).otherwise(0)).cast("long").alias("__n_tok"),
        F.sum(F.when(valid, F.length("_t")).otherwise(0)).alias("__tok_chars"),
        *[F.sum(F.when(valid & F.col("_t").isin(sw), 1).otherwise(0))
          .alias(f"__h_{lang}") for lang, sw in STOPWORDS.items()])

    n_tok = F.col("__n_tok")
    nz = F.greatest(n_tok, F.lit(1))
    p_ratio = F.col("__p_ratio")
    sw_ratio = F.col("__h_en") / nz
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(p_ratio * 5, F.lit(1.0))
    sw_score = F.least(sw_ratio * 4, F.lit(1.0))
    hits = [F.col(f"__h_{l}") for l in langs]
    # argmax with earliest-language tie-break, 'und' when no hits at all
    def _max(cols):
        return cols[0] if len(cols) == 1 else F.greatest(*cols)

    pick = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        pick = F.when(hits[i] >= _max(hits[i + 1:]), F.lit(langs[i])) \
                .otherwise(pick)
    total_hits = hits[0]
    for h in hits[1:]:
        total_hits = total_hits + h
    lang_pred = F.when(total_hits == 0, F.lit("und")).otherwise(pick)

    return (aggs
            .select(*[c for c in df.columns],
                    n_tok.alias("n_tokens"),
                    F.col("__n_chars").alias("n_chars_computed"),
                    F.round(p_ratio, 6).alias("punct_ratio"),
                    F.round(sw_ratio, 6).alias("stopword_ratio"),
                    F.round(F.col("__tok_chars") / nz, 6).alias("mean_word_len"),
                    F.round((len_score + punct_score + sw_score) / 3, 6)
                     .alias("quality"),
                    lang_pred.alias("lang_pred"),
                    F.col("__fp").alias("fingerprint")))


# ---- PII scrubbing + repetition quality signal ----------------------------
# Codegen'd regexp_replace only — no Python in the hot path.  Pattern
# choices mirror common training-data pipeline scrubbers; all patterns are
# also valid RE2/PCRE so a SQL oracle can reproduce them exactly.

PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"(?:\+\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
]


def scrub_pii(text: Column) -> Column:
    """Redact emails, phone numbers and IPv4 addresses to typed tags."""
    out = text
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


def pii_counts(text: Column) -> List[Column]:
    return [F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            .cast("long").alias(f"n_{tag}") for tag, pat in PII_PATTERNS]


def dup_line_ratio(text: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line — the
    boilerplate/repetition quality signal (Gopher-rule style): 1 -
    distinct_lines / lines, 0.0 for single-line docs."""
    lines = F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
    n = F.size(lines)
    nd = F.size(F.array_distinct(F.transform(lines, F.trim)))
    return F.when(n <= 0, F.lit(0.0)) \
        .otherwise(F.round((n - nd) / n.cast("double"), 6))


def dup_ngram_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that repeat an earlier n-gram in the SAME
    document — the Gopher repetition rules' "fraction of duplicate
    n-grams" signal (Rae et al. 2021, §A1.1).  Pure array expressions
    (tokens once, n-grams by F.get windows, distinct/size), zero Python
    and zero shuffle: a quality column at scan cost.  0.0 for docs with
    fewer than n tokens."""
    from ..functions.let import let

    def with_toks(w):
        cnt = F.size(w) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(cnt - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", *[F.get(w, i + j)
                                         for j in range(n)]))
        return F.when(cnt <= 0, F.lit(0.0)).otherwise(
            F.round((cnt - F.size(F.array_distinct(grams)))
                    / cnt.cast("double"), 6))

    return let(tokens(text), with_toks)


def scrub_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "*", scrub_pii(t).alias("text_scrubbed"), *pii_counts(t),
        dup_line_ratio(t).alias("dup_line_ratio"))


# ---- chunking (training-example preparation) ------------------------------


def chunk_documents(df: DataFrame, max_tokens: int, overlap: int = 0,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split documents into overlapping fixed-token-window chunks — the
    standard training-example preparation step (context-window packing).

    One ``posexplode`` over a generated start-offset sequence; the chunk
    text is a slice+join over the token array — all codegen'd expressions,
    no shuffle at all (chunks stay co-partitioned with their document).
    At 100 TB this is a pure map stage.

    Chunk k covers tokens ``[k*stride, k*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; the final chunk may be short.
    Returns (id, chunk_id, chunk_text, n_tokens)."""
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    words = F.split(F.col(text_col), " ")
    # stop once the previous chunk reaches the end: a start past
    # size-overlap-1 would emit a chunk fully contained in its
    # predecessor (duplicate training example); keep >= one chunk
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(words) - overlap - 1, F.lit(0)), F.lit(stride))
    out = df.select(
        id_col, words.alias("__words"),
        F.posexplode(starts).alias("__pos", "__start"))
    chunk = F.slice(F.col("__words"), F.col("__start") + 1, max_tokens)
    return out.select(
        id_col,
        F.col("__pos").cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"))


# ---- TF-IDF ---------------------------------------------------------------


def tf_idf_top_terms(df: DataFrame, k: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Top-k terms per document by tf-idf (ln(N/df) idf, ties by term).

    Shuffle profile: one explode feeding a map-side-combined (doc, term)
    count, the per-term document frequency as a COUNT WINDOW over the tf
    rows (term keys are high-cardinality — no skew), and one window for
    the per-doc top-k.  The window computes the same df as a separate
    term-keyed aggregate joined back, but the tf lineage is traversed
    ONCE — the join shape re-tokenized the whole corpus for each side.
    The corpus size N is a 1-row aggregate cross-joined in (broadcast),
    never a driver-side count."""
    from pyspark.sql import Window as W
    terms = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    total = df.select(F.count_distinct(F.col(id_col)).alias("__n_docs"))
    scored = (tf.withColumn("df", F.count(F.lit(1))
                            .over(W.partitionBy("term")))
                .crossJoin(F.broadcast(total))
                .withColumn("tfidf",
                            F.round(F.col("tf")
                                    * F.log(F.col("__n_docs") / F.col("df")),
                                    6)))
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(id_col, "term", "tfidf",
                          F.col("rank").cast("long").alias("rank")))


# ---- benchmark contamination ---------------------------------------------


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams as an array of space-joined strings."""
    words = F.split(text, " ")
    m = F.size(words) - (n - 1)
    grams = F.when(m >= 1, F.transform(
        F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def contamination_check(df: DataFrame, bench: DataFrame, n: int = 3,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-document fraction of distinct word n-grams that also occur in a
    benchmark/eval corpus — the train/test contamination signal used to
    hold eval sets out of training data.

    The benchmark side collapses to a distinct n-gram set (small — eval
    corpora are tiny next to training corpora) so the probe join
    broadcasts; the training side's grams are exploded once and the
    match flag averages map-side.  Returns (id, n_grams, contamination)."""
    bench_grams = (bench.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .dropDuplicates())
    doc_grams = df.select(
        id_col, F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
    joined = doc_grams.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))),
        "gram", "left")
    agg = (joined.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_grams"),
                F.round(F.avg(F.coalesce(F.col("__hit"), F.lit(0))), 6)
                .alias("contamination")))
    # documents shorter than n words produce zero gram rows — report them
    # as n_grams=0 / contamination=0.0 instead of dropping them entirely
    return (df.select(id_col).dropDuplicates()
            .join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
                    F.coalesce(F.col("contamination"), F.lit(0.0))
                    .alias("contamination")))
