"""Vector / embedding operators (SURVEY.md §2.K K3/K6 [EXT]).

Pure higher-order-function column math over array<float> — JVM-side, no Python
in the hot path. Left-fold accumulation order is pinned (init 0.0, element
order) so results are bit-identical to DuckDB's list_reduce oracle.

At 100 TB the brute-force cosine join is O(n·m); the scale path is LSH
bucketing (ksql_spark/operators/dedup.py) or an IVF-style coarse quantizer
(cluster assignment then per-cell search) — see ann_ivf_topk below.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    """Dot product of two array<float> columns, accumulated in double
    (left fold, pinned order)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def l2_norm_sq(a) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.aggregate(sq, F.lit(0.0), lambda acc, p: acc + p)


def l2_norm(a) -> Column:
    return F.sqrt(l2_norm_sq(a))


def cosine(a, b) -> Column:
    """Cosine similarity; NULL when either vector has zero norm (try_divide
    — a plain division would ANSI-abort the job on the first zero/empty
    embedding; identical to `/` for every nonzero divisor)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def l2_sq_dist(a, b) -> Column:
    """Squared euclidean distance between two array columns (double fold).
    The classic IVF cell-assignment metric — monotone in L2, no sqrt needed."""
    diffs = F.zip_with(
        _c(a), _c(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def normalize(a) -> Column:
    """Unit-normalize an array<float> → array<double>; NULL elements for a
    zero-norm vector (same try_divide rationale as cosine)."""
    n = l2_norm(a)
    return F.transform(_c(a), lambda x: F.try_divide(x.cast("double"), n))
