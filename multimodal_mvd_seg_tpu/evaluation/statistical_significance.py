"""Paired significance testing between two methods' evaluation results.

Parity: reference ``nnunetv2/utilities/statistical_significance.py`` — a
run-once script (hard-coded fold folders, commented-out alternates) that
collects per-fold Dice/clDice from ``summary.json`` files of two methods
and prints ``scipy.stats.ttest_rel`` / ``ttest_ind`` results. This module
is the reusable form of the same analysis:

- samples are paired **per case** (matched by prediction file name across
  the two methods' ``summary.json``), not only per fold — strictly more
  statistical power with the same test;
- per-fold pairing is still available by passing one summary per fold
  (``paired=\"per_summary\"``), which reproduces the reference's
  fold-mean ttest_rel exactly;
- both the paired t-test and the (distribution-free) Wilcoxon
  signed-rank test are reported.

``summary.json`` structure is the one `evaluation.evaluate` writes
(reference evaluate_predictions.py:123-180): ``metric_per_case`` records
with ``prediction_file`` and ``metrics[label][metric]``.
"""

import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..utils.files import load_json

__all__ = ["collect_metric_samples", "paired_significance",
           "compare_methods"]


def collect_metric_samples(summary_files: Sequence[Union[str, dict]],
                           metric: str = "Dice",
                           label: Optional[Union[int, str]] = None,
                           ) -> Dict[str, float]:
    """{case name: metric value} across the given summary.json files.

    ``label`` selects one label/region (string-compared, so int labels
    and '(1, 2)' region keys both work); None averages the metric over
    all foreground labels of each case (matching the reference's use of
    the per-case foreground mean)."""
    out: Dict[str, float] = {}
    for s in summary_files:
        summary = load_json(s) if isinstance(s, str) else s
        for rec in summary["metric_per_case"]:
            case = os.path.basename(rec["prediction_file"])
            vals = []
            for lab, m in rec["metrics"].items():
                if str(lab) in ("0", "background"):
                    continue
                if label is not None and str(lab) != str(label):
                    continue
                v = m.get(metric)
                if v is not None:
                    vals.append(float(v))
            if vals:
                if case in out:
                    raise ValueError(
                        f"case {case!r} appears in more than one summary "
                        f"(folds must hold disjoint validation cases)")
                out[case] = float(np.nanmean(vals))
    return out


def paired_significance(a: Sequence[float], b: Sequence[float]) -> dict:
    """Paired t-test + Wilcoxon signed-rank over two matched samples."""
    from scipy import stats
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError("need two matched samples with n >= 2")
    keep = ~(np.isnan(a) | np.isnan(b))
    a, b = a[keep], b[keep]
    # validity check AFTER dropping NaN pairs — heavily-NaN inputs must hit
    # this error, not produce n=0/1 nan statistics downstream
    if a.size < 2:
        raise ValueError("need two matched samples with n >= 2 "
                         f"(only {a.size} non-NaN pair(s))")
    t, t_p = stats.ttest_rel(a, b)
    if np.allclose(a, b):
        w, w_p = np.nan, 1.0  # wilcoxon is undefined on all-zero diffs
    else:
        w, w_p = stats.wilcoxon(a, b)
    return {"n": int(a.size),
            "mean_a": float(np.mean(a)), "mean_b": float(np.mean(b)),
            "mean_diff": float(np.mean(a - b)),
            "t_statistic": float(t), "t_p_value": float(t_p),
            "wilcoxon_statistic": float(w), "wilcoxon_p_value": float(w_p)}


def compare_methods(summaries_a: Sequence[Union[str, dict]],
                    summaries_b: Sequence[Union[str, dict]],
                    metric: str = "Dice",
                    label: Optional[Union[int, str]] = None,
                    paired: str = "per_case") -> dict:
    """Significance of method A vs B on the same validation cases.

    ``paired="per_case"`` pairs individual cases present in both methods'
    summaries; ``paired="per_summary"`` pairs the per-summary (per-fold)
    means — the reference script's granularity."""
    if paired == "per_summary":
        def fold_mean(s):
            vals = collect_metric_samples([s], metric, label)
            return float(np.nanmean(list(vals.values())))
        a = [fold_mean(s) for s in summaries_a]
        b = [fold_mean(s) for s in summaries_b]
        result = paired_significance(a, b)
    elif paired == "per_case":
        sa = collect_metric_samples(summaries_a, metric, label)
        sb = collect_metric_samples(summaries_b, metric, label)
        common = sorted(set(sa) & set(sb))
        if len(common) < 2:
            raise ValueError(
                f"methods share only {len(common)} case(s); per-case "
                f"pairing needs the same validation cases on both sides")
        result = paired_significance([sa[c] for c in common],
                                     [sb[c] for c in common])
    else:
        raise ValueError(f"unknown pairing {paired!r}")
    result.update({"metric": metric, "label": label, "paired": paired})
    return result
