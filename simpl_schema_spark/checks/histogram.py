"""Equal-width histograms — the distribution profile behind drift
monitoring and data-quality dashboards.

:mod:`.drift` compares distributions against FIXED baseline edges; this
operator produces the profile itself: an equal-width binning of a
numeric column, optionally auto-ranged.  The classic Spark trap here is
``df.rdd.histogram`` (RDD path, no codegen) or a ``width_bucket``-style
UDF; both are replaced by one arithmetic projection + one
map-side-combinable aggregation whose reduce side is ``bins`` rows.

Auto-ranging adds one min/max aggregate kept LAZY as a 1-row broadcast
crossJoin (no driver action), so the whole profile is two passes at
most and one tiny shuffle.  Bin arithmetic is pure double ops with no
accumulation, so the DuckDB oracle reproduces assignments bit-for-bit.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ["histogram"]


def histogram(
    df: DataFrame,
    col: str,
    *,
    bins: int = 10,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> DataFrame:
    """``(bin, bin_lo, bin_hi, n)`` equal-width counts over ``col``.

    NULLs are excluded.  With ``lo``/``hi`` unset the range is the
    column's observed min/max (computed distributed, never collected);
    values equal to ``hi`` land in the LAST bin (right-closed top bin,
    half-open elsewhere — SQL ``width_bucket`` semantics), values
    outside an explicit range are clamped into the edge bins.  Empty
    bins are absent from the output (left-join a ``sequence`` frame if
    a dense grid is needed).  Degenerate ranges (min == max) put
    everything in bin 0.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if (lo is None) != (hi is None):
        raise ValueError("lo and hi must be provided together")
    if lo is not None and not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi}]")

    x = F.col(col).cast("double")
    base = df.where(x.isNotNull()).select(x.alias("__x"))
    if lo is None:
        rng = base.agg(
            F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
        )
        base = base.crossJoin(F.broadcast(rng))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))

    width = (hi_c - lo_c) / F.lit(float(bins))
    raw = F.floor((F.col("__x") - lo_c) / width)
    # clamp in DOUBLE before the int cast: with an explicit narrow
    # [lo, hi] an extreme outlier makes |raw| exceed int range, and a
    # double→int cast of that value wraps (non-ANSI) or throws (ANSI)
    # before the old int-side clamp could fix it — clamped first, the
    # cast input is always within [0, bins-1]
    b = (
        F.when(hi_c <= lo_c, F.lit(0))           # degenerate range
        .otherwise(
            F.greatest(
                F.lit(0.0), F.least(F.lit(float(bins - 1)), raw)
            ).cast("int")
        )
        .cast("int")
    )
    return (
        base.select(
            b.alias("bin"),
            F.round(lo_c + b.cast("double") * width, 6).alias("bin_lo"),
            F.round(lo_c + (b.cast("double") + 1) * width, 6).alias("bin_hi"),
        )
        .groupBy("bin", "bin_lo", "bin_hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )
