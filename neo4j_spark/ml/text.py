"""Text analysis operators for large-scale corpus pipelines.

All pure ``pyspark.sql.functions`` column expressions (JVM-side, codegen'd,
no Python UDFs) so they survive 100 TB scans: token counting, quality
scoring, language id (stopword-ratio heuristic), and rolling-hash
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

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
    t = F.col(text_col)
    return df.withColumns({
        "n_tokens": token_count(t),
        "n_chars_computed": char_count(t),
        "punct_ratio": F.round(punct_ratio(t), 6),
        "stopword_ratio": F.round(stopword_ratio(t), 6),
        "mean_word_len": F.round(mean_word_length(t), 6),
        "quality": quality_score(t),
        "lang_pred": language_id(t),
        "fingerprint": fingerprint(t),
    })
