"""Multi-criteria normalization, scoring, and ranking (A15-A17, O1).

Semantics re-expressed from the reference's tiny-table pandas stage
(/root/reference/processing_alg/topocorrection_eval/multi_criteria_rank.py:152-197
and metrics.py:60-78):

1. combine: flip reduction metrics (std, cv, iqr, both outlier counts, r^2)
   so "higher is better" (combine multiplier -1, metrics.py:64-78);
   relative_median_difference becomes -abs(corrected - original)
   (metrics.py:139-141).
2. normalize per (band, metric) against the ORIGINAL image: results better
   than the original map to [0,1] (min = original, max = best correction),
   worse map to [-1,0) (max = original, min = worst correction), equal -> 0
   (multi_criteria_rank.py:180-197).
3. score = weighted sum of normalized metrics per (correction, band)
   (:169-178); band scores combined per correction by a strategy
   (max/min/mean/median/sum, :52-79); sort descending (:112-113).

Deliberate clarification vs the reference: the original row used for the
gt/lt comparison is taken AFTER the combine step, so comparisons happen on
the combined ("higher is better") scale -- the reference's intent; its code
relies on pandas .xs copy semantics that are version-dependent.  The numpy
oracle mirrors this exactly.

This stage is a driver-side computation over a tiny frame
(corrections x bands x metrics), matching the reference's shape.
"""
from __future__ import annotations

import pandas as pd

REDUCTION_MULTIPLIER = {
    "std_reduction": -1.0,
    "cv_reduction": -1.0,
    "iqr_reduction": -1.0,
    "outliers_threshold": -1.0,
    "outliers_iqr": -1.0,
    "determination_coefficient": -1.0,
}
ORIG_KEY = "__orig__"
STRATEGIES = {
    "max": lambda g: g.max(),
    "min": lambda g: g.min(),
    "mean": lambda g: g.mean(),
    "median": lambda g: g.median(),
    "sum": lambda g: g.sum(),
}


def combine(wide: pd.DataFrame) -> pd.DataFrame:
    """wide: index (method, band), columns = metric ids."""
    out = wide.copy()
    for m, mult in REDUCTION_MULTIPLIER.items():
        if m in out.columns:
            out[m] = out[m] * mult
    if "relative_median_difference" in out.columns:
        orig = wide.xs(ORIG_KEY)["relative_median_difference"]
        bands = out.index.get_level_values(1)
        out["relative_median_difference"] = -(
            out["relative_median_difference"] - orig.reindex(bands).to_numpy()
        ).abs()
    return out


def normalize(combined: pd.DataFrame) -> pd.DataFrame:
    """Min-max normalize vs the original per (band, metric); good -> [0,1],
    bad -> [-1,0), equal -> 0; original row dropped."""
    orig = combined.xs(ORIG_KEY)
    bands = combined.index.get_level_values(1)
    orig_aligned = orig.reindex(bands).set_axis(combined.index)

    good = combined.where(combined.gt(orig_aligned))
    good_max = good.groupby(level=1).max()
    ga_max = good_max.reindex(bands).set_axis(combined.index)
    norm_good = (good - orig_aligned) / (ga_max - orig_aligned)

    bad = combined.where(combined.lt(orig_aligned))
    bad_min = bad.groupby(level=1).min()
    ba_min = bad_min.reindex(bands).set_axis(combined.index)
    norm_bad = (bad - ba_min) / (orig_aligned - ba_min) - 1.0

    norm = norm_good.where(~combined.eq(orig_aligned), 0.0)
    norm = norm.fillna(norm_bad)
    return norm.drop(ORIG_KEY, level=0)


def rank_scores(metrics_long: pd.DataFrame,
                weights: dict[str, float] | None = None,
                strategy: str = "sum") -> pd.DataFrame:
    """metrics_long: columns (method, band, metric_id, value) for ONE group.
    Returns (method, score) sorted descending (dense ranking order)."""
    wide = metrics_long.pivot_table(index=["method", "band"],
                                    columns="metric_id", values="value")
    wide = wide.sort_index()
    combined = combine(wide)
    norm = normalize(combined)
    w = pd.Series({c: (weights or {}).get(c, 1.0) for c in norm.columns})
    per_band = (norm * w).sum(axis=1)
    scores = STRATEGIES[strategy](per_band.groupby(level=0))
    out = scores.sort_values(ascending=False).reset_index()
    out.columns = ["method", "score"]
    return out
