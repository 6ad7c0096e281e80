"""Let-binding for Column expressions.

Catalyst's CollapseProject inlines aliased expressions into every consumer,
so an expensive subtree referenced N times in the same projection is
evaluated N times per row (and the duplication compounds across chained
projections — e.g. a MinHash signature referenced by 8 band hashes re-runs
the whole shingle pipeline 8x).  ``let`` forces single evaluation *inside*
one projection by binding the value as a higher-order-function lambda
variable: ``transform(array(value), x -> body(x))[1]``.  Lambda variables
are bound once per row, so every reference to ``x`` in the body is free.

This stays a pure Catalyst expression — no persist/checkpoint/exchange
barrier, whole-stage codegen friendly, and therefore safe in 100 TB scans.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row; ``body`` may reference it freely."""
    return F.element_at(F.transform(F.array(value), body), 1)


def let2(v1: Column, v2: Column,
         body: Callable[[Column, Column], Column]) -> Column:
    """Two-value let: both evaluated once per row."""
    return let(v1, lambda a: let(v2, lambda b: body(a, b)))
