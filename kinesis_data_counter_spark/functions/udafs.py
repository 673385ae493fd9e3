"""Pandas UDAFs — the engine's custom-aggregate extension point.

Completes the extension tiers above the reference's two hooks
(``target_expr`` scalar tier, reference config.go:93-99; ``jq_expr`` output
tier, config.go:112-118): scalar expr → UDTF (functions/udtfs.py) → and
here the aggregate tier the reference lacks entirely (SURVEY.md §2.5
"no user-pluggable aggregate").

A ``pandas_udf`` GROUPED_AGG function receives each group's column(s) as
pandas Series via Arrow and returns one scalar — Catalyst plans it like any
aggregate (hash-partition by group key, one Python evaluation per group per
partition... note: GROUPED_AGG is NOT split partial/final; the whole
group's values ship to one task. Use it for logic built-ins can't express,
at group sizes that fit a task — for algebraic aggregates always prefer
built-ins, and for huge groups restructure as two-level explicit partials.

``weighted_median`` is the worked example because it is genuinely
non-algebraic (no bounded mergeable state computes an exact weighted
median), deterministic (an exact order-statistic definition, no float
arithmetic on the values), and therefore oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Exact lower weighted median: the smallest value v such that the
    cumulative weight of all values ≤ v reaches half the total weight.

    Null values (and their weights) are excluded, mirroring SQL aggregate
    null semantics. Returns None for an all-null group.
    """
    mask = values.notna() & weights.notna()
    if not mask.any():
        return None
    v = values[mask].to_numpy()
    w = weights[mask].to_numpy(dtype="float64")
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    half = cum[-1] / 2.0
    idx = int(np.searchsorted(cum, half, side="left"))
    return float(v[idx])
