"""Text analysis operators for large-scale corpus pipelines.

All pure ``pyspark.sql.functions`` column expressions (JVM-side, codegen'd,
no Python UDFs) so they survive 100 TB scans: token counting, quality
scoring, language id (stopword-ratio heuristic), and rolling-hash
fingerprinting.
"""

from __future__ import annotations

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
    """All stats in ONE pass: the token array is let-bound (tokenized once
    per row, not once per stat), every stat is a field of one struct, and
    ``inline`` expands the struct through a Generate node — so projection
    collapsing cannot re-inline the tokenizer per output column."""
    t = F.col(text_col)

    def stats(toks: Column) -> Column:
        def with_vote(vote: Column) -> Column:
            n_tok = F.size(toks).cast("long")
            nz = F.greatest(F.size(toks), F.lit(1))
            p_ratio = F.length(F.regexp_replace(t, r"[\p{L}\p{N}\s]", "")) \
                / F.greatest(F.length(t), F.lit(1))
            # STOPWORDS iterates insertion-ordered, so element 1 is "en"
            sw_ratio = F.element_at(vote, 1)["h"] / nz
            mean_wl = F.aggregate(toks, F.lit(0),
                                  lambda acc, x: acc + F.length(x)) / nz
            len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
            punct_score = F.lit(1.0) - F.least(p_ratio * 5, F.lit(1.0))
            sw_score = F.least(sw_ratio * 4, F.lit(1.0))
            return F.struct(
                n_tok.alias("n_tokens"),
                F.length(t).cast("long").alias("n_chars_computed"),
                F.round(p_ratio, 6).alias("punct_ratio"),
                F.round(sw_ratio, 6).alias("stopword_ratio"),
                F.round(mean_wl, 6).alias("mean_word_len"),
                F.round((len_score + punct_score + sw_score) / 3, 6)
                 .alias("quality"),
                _lang_pick(vote).alias("lang_pred"),
                F.xxhash64(F.concat_ws("", toks)).alias("fingerprint"),
            )

        return let(_lang_vote(toks), with_vote)

    return df.select("*", F.inline(F.array(let(tokens(t), stats))))
