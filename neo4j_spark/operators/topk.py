"""Top-k operators.

Top (LP:3913) is planned by Catalyst itself (``orderBy().limit(k)`` ->
TakeOrderedAndProject), so only the ties variant needs an operator here.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F


def top1_with_ties(df: DataFrame,
                   order: Sequence[Union[str, Column]],
                   ascending: Optional[Sequence[bool]] = None) -> DataFrame:
    """Top1WithTies (LP:3923, pipes/TopPipe.scala Top1WithTiesPipe): every
    row tying for rank 1 under ``order``.

    Scale shape: a rank-1 window over a global ordering would funnel all
    rows through one task, so instead the winning key is found with a
    distributed TakeOrderedAndProject (``orderBy().limit(1)``) and the
    ties are selected by an equality filter pushed into the scan — two
    passes, both fully parallel, no global shuffle.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    if ascending is None:
        ascending = [True] * len(cols)
    keyed = [c.asc() if a else c.desc() for c, a in zip(cols, ascending)]
    probe = df.orderBy(*keyed).limit(1).select(
        *[c.alias(f"_k{i}") for i, c in enumerate(cols)])
    top = probe.head()
    if top is None:
        return df.limit(0)
    cond = None
    for i, c in enumerate(cols):
        eq = c.eqNullSafe(F.lit(top[i]))
        cond = eq if cond is None else (cond & eq)
    return df.filter(cond)
