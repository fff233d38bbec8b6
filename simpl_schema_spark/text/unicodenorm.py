"""Unicode NFC normalization — the Arrow-batched Python-UDF path.

Web text arrives in mixed normalization forms (decomposed sequences from
macOS filesystems and some CMSes, precomposed from everything else);
dedup keys, token counts, and equality joins silently fracture unless the
corpus is canonicalized first.  Spark SQL has no built-in Unicode
normalizer, so this is one of the few operators here that genuinely
requires Python — implemented as a vectorized pandas UDF (Arrow batch
transfer, ``Series.str.normalize`` → C-level unicodedata loop), never
row-at-a-time.

Scale shape: a pure projection — fuses with the scan like any
expression, no shuffle, and the only cost over a JVM expression is the
Arrow serialization of the one string column.  The DuckDB oracle's
``nfc_normalize`` pins cross-engine agreement (both sides implement
Unicode canonical composition; tested on combining-mark sequences, not
just ASCII).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

__all__ = ["nfc_normalize"]


@F.pandas_udf(StringType())
def _nfc(s: pd.Series) -> pd.Series:
    # Series.str.normalize is NULL-preserving; fillna would corrupt
    return s.str.normalize("NFC")


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC (canonical decomposition + canonical composition)."""
    return _nfc(col)
