"""Engine-portable scalar helpers shared by queries and oracles."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(c: Column, nd: int = 4) -> Column:
    """round-half-away-from-zero on the scaled double — bit-identical
    to DuckDB's ``round(x + 1e-9, nd)`` (which computes
    ``round(x·10^nd)/10^nd``), unlike Spark's decimal-string
    ``F.round`` which can disagree on exact .5-at-scale ties.

    The 1e-9 epsilon (applied identically in every oracle SQL round —
    see ``__spark_entry__._epsilonize``) pushes values sitting exactly
    on a .5·10^-nd decimal boundary decisively to one side, so
    ulp-level float-summation-order differences between engines (e.g.
    tier-cascade partial sums vs a flat sum) cannot flip the rounding
    of boundary values like mean = 46.23125."""
    p = F.lit(float(10 ** nd))
    return F.round((c + F.lit(1e-9)) * p) / p
