"""Broadcast dimension enrichment — the star/snowflake join the
metrics layer needs when a rollup must slice by attributes that live
in small dimension tables (customer segment, nation, device class),
not in the fact stream itself.

The 100 TB rule this module encodes: the fact side NEVER shuffles for
a dimension join. Every dimension is explicitly ``F.broadcast``-ed,
so the plan is a chain of map-side BroadcastHashJoins feeding one
map-side-combined groupBy — exactly one exchange end-to-end no matter
how many dimensions are chained (plan-audited). AQE would usually
pick this on its own for small dims, but at real table sizes the
statistics that decision rides on can be stale or missing; an
explicit broadcast pins the only acceptable strategy (a sort-merge
join here would shuffle the full fact table per dimension).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    facts: DataFrame,
    dims: Sequence[tuple[DataFrame, str, str, Sequence[str]]],
    how: str = "inner",
) -> DataFrame:
    """Chain-join small dimensions onto a fact relation.

    ``dims``: sequence of ``(dim_df, fact_key, dim_key, attr_cols)``
    applied in order — later dims may join on attributes added by
    earlier ones (snowflake: facts→customer→nation). Each dim is
    pruned to ``dim_key`` + ``attr_cols`` BEFORE the broadcast (ship
    only the columns the query reads) and joined with the fact-side
    key name, so chaining needs no aliases.

    ``how="inner"`` (default) assumes referential integrity — a fact
    row with no dimension row is DROPPED; pass ``how="left"`` to keep
    orphans with NULL attributes instead (and count them — an orphan
    spike is a DQ signal, see :func:`tsanalytics.dq_profile`).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    out = facts
    for dim, fact_key, dim_key, attr_cols in dims:
        pruned = dim.select(
            F.col(dim_key).alias(fact_key), *[F.col(c) for c in attr_cols]
        )
        out = out.join(F.broadcast(pruned), on=fact_key, how=how)
    return out
