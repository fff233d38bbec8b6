"""Referential-integrity checks (north rule: "referential-integrity joins").

Scale notes: the dimension side of an FK check (allowed language codes, host
allowlists, partner feeds) is almost always orders of magnitude smaller than
the fact table — broadcast it so the anti-join is map-side with NO shuffle of
the 100 TB side.  ``broadcast='auto'`` trusts Catalyst/AQE (which broadcasts
under the threshold); ``True`` forces the hint.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, functions as F

__all__ = ["referential_violations", "referential_violation_rows"]


def _prep(dim: DataFrame, broadcast: Union[bool, str]) -> DataFrame:
    if broadcast is True or broadcast == "force":
        return F.broadcast(dim)
    return dim


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    fk: Union[str, Sequence[str]],
    pk: Union[str, Sequence[str], None] = None,
    *,
    broadcast: Union[bool, str] = True,
) -> DataFrame:
    """Fact rows whose FK value has no match in the dimension.

    NULL FKs are not referential violations (SQL semantics; required-ness is
    the schema validator's job) — they are filtered out first, which also
    keeps the anti-join null-safe.
    """
    fks = [fk] if isinstance(fk, str) else list(fk)
    pks = fks if pk is None else ([pk] if isinstance(pk, str) else list(pk))
    cond = None
    for f_col, p_col in zip(fks, pks):
        c = fact[f_col] == dim[p_col]
        cond = c if cond is None else (cond & c)
    non_null = fact.where(
        F.lit(True) if not fks else F.coalesce(
            *[fact[c].isNotNull() for c in fks], F.lit(False)
        )
    )
    for c in fks:
        non_null = non_null.where(F.col(c).isNotNull())
    return non_null.join(_prep(dim, broadcast), on=cond, how="left_anti")


def referential_violation_rows(
    fact: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: Union[str, None] = None,
    *,
    id_col: str = "url",
    broadcast: Union[bool, str] = True,
) -> DataFrame:
    """Violation-row form: ``(id, name, type, value)`` per broken reference."""
    bad = referential_violations(fact, dim, fk, pk, broadcast=broadcast)
    return bad.select(
        F.col(id_col),
        F.lit(fk).alias("name"),
        F.lit("brokenReference").alias("type"),
        F.col(fk).cast("string").alias("value"),
    )
