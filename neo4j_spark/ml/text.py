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


def language_id(text: Column) -> Column:
    """Stopword-vote language id over the built-in lists; 'und' if no vote."""
    toks = tokens(text)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, sw in STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
        cond = hits > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return best_lang


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
        n_tok = F.size(toks).cast("long")
        nz = F.greatest(F.size(toks), F.lit(1))
        p_ratio = F.length(F.regexp_replace(t, r"[\p{L}\p{N}\s]", "")) \
            / F.greatest(F.length(t), F.lit(1))
        sw_hits = {
            lang: F.size(F.filter(toks, lambda x: x.isin(sw)))
            for lang, sw in STOPWORDS.items()
        }
        sw_ratio = sw_hits["en"] / nz
        mean_wl = F.aggregate(toks, F.lit(0),
                              lambda acc, x: acc + F.length(x)) / nz
        len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
        punct_score = F.lit(1.0) - F.least(p_ratio * 5, F.lit(1.0))
        sw_score = F.least(sw_ratio * 4, F.lit(1.0))
        best_lang, best_hits = F.lit("und"), F.lit(0)
        for lang, hits in sw_hits.items():
            cond = hits > best_hits
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_hits = F.when(cond, hits).otherwise(best_hits)
        return F.struct(
            n_tok.alias("n_tokens"),
            F.length(t).cast("long").alias("n_chars_computed"),
            F.round(p_ratio, 6).alias("punct_ratio"),
            F.round(sw_ratio, 6).alias("stopword_ratio"),
            F.round(mean_wl, 6).alias("mean_word_len"),
            F.round((len_score + punct_score + sw_score) / 3, 6).alias("quality"),
            best_lang.alias("lang_pred"),
            F.xxhash64(F.concat_ws("", toks)).alias("fingerprint"),
        )

    return df.select("*", F.inline(F.array(let(tokens(t), stats))))
