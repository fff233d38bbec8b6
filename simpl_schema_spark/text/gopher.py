"""Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", §A1.1) — the
standard pre-filter battery web pipelines run before model-based
scoring (MassiveWeb, RefinedWeb, FineWeb and Dolma all start from this
list).  Complements the repo's composite :func:`.analysis.quality_score`
(a smooth [0,1] heuristic) with the paper's hard PASS/FAIL gates, each
exposed individually so ablations can toggle rules.

Rules (document fails if any is violated):

1. word count in [min_words, max_words]           (paper: 50..100k)
2. mean word length in [3, 10]
3. symbol-to-word ratio ('#' or ellipsis) <= 0.1
4. fraction of lines starting with a bullet <= 0.9
5. fraction of lines ending with an ellipsis <= 0.3
6. fraction of words with >= 1 alphabetic char >= 0.8
7. >= 2 distinct "required" English stopwords present

All JVM expressions in one scan-fused projection; the token and line
arrays are STAGED as named columns before the flag expressions consume
them (multiple HOF references — the lambda-CSE rule, BENCH/ROUND5.md).
Ratios are rounded to 6 dp so the DuckDB oracle's accumulation order
can't flip a boundary comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .analysis import word_tokens

__all__ = ["GOPHER_STOPWORDS", "gopher_quality", "gopher_filter"]

#: the paper's "required word" list
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: a '#' or a three-dot/unicode ellipsis
_SYMBOL_RE = r"#|\.\.\.|…"
_ELLIPSIS_END_RE = r"(\.\.\.|…)$"
_BULLET_START_RE = r"^[-*•]"


def _flags(
    toks: Column,
    lines: Column,
    text: Column,
    *,
    min_words: int,
    max_words: int,
    min_stopwords: int,
) -> list:
    """The seven rule columns + components; toks/lines MUST be staged
    column references (multi-referenced inside HOF lambdas)."""
    n = F.size(toks)
    n_d = n.cast("double")
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wlen = F.when(n > 0, total_len / n_d).otherwise(F.lit(0.0))
    symbol_ratio = F.when(
        n > 0, F.regexp_count(text, F.lit(_SYMBOL_RE)) / n_d
    ).otherwise(F.lit(0.0))
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(_BULLET_START_RE)))
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_END_RE)))
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter(toks, lambda w: w.rlike(r"\p{L}"))) / n_d,
    ).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.filter(sw, lambda s: F.array_contains(toks, s))
    )
    return [
        n.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        (
            n.between(min_words, max_words)
            & F.round(mean_wlen, 6).between(3.0, 10.0)
            & (F.round(symbol_ratio, 6) <= 0.1)
            & (F.round(bullet_frac, 6) <= 0.9)
            & (F.round(ellipsis_frac, 6) <= 0.3)
            & (F.round(alpha_frac, 6) >= 0.8)
            & (n_stop >= min_stopwords)
        ).alias("passes"),
    ]


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
) -> DataFrame:
    """Per-document rule components + the conjunction ``passes``.

    Tokens are LOWERCASED for the stopword rule only after the length
    rules (token text is length-invariant under lower()); one staged
    projection feeds all seven rules — a single scan pass, no shuffle.
    """
    t = F.col(text_col)
    staged = df.where(t.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        t.alias("__text"),
        F.transform(word_tokens(t), lambda w: F.lower(w)).alias("__toks"),
        F.filter(
            F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ).alias("__lines"),
    )
    return staged.select(
        "doc_id",
        *_flags(
            F.col("__toks"),
            F.col("__lines"),
            F.col("__text"),
            min_words=min_words,
            max_words=max_words,
            min_stopwords=min_stopwords,
        ),
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
) -> DataFrame:
    """Just the survivors' ids — the composable filter form."""
    q = gopher_quality(
        df, text_col, id_col, min_words=min_words, max_words=max_words,
        min_stopwords=min_stopwords,
    )
    return q.where(F.col("passes")).select("doc_id")
