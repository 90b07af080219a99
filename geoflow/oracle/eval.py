"""Transcription oracle for the evaluation/ranking layer.

Single-process truth for metric evaluation (full-array band values,
``multi_criteria_eval.py:123-158``) and the merge/normalize/rank math
(``multi_criteria_rank.py:169-197``), written in the reference's pandas
idioms (.xs pre-combine capture, .where/.gt(level=1) split
normalization) so the engine's independent implementation can be
checked against the exact reference behavior — including the
combined-vs-raw-original comparison quirk (see
geoflow.pipelines.rank docstring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..context import CorrectionContext, DEFAULT_CONTEXT
from ..stages.metrics import METRIC_IDS, ORIG_KEY, evaluate_metrics
from . import kernels as ok


def oracle_metrics_table(bands: np.ndarray, dem: np.ndarray,
                         names: list[str] | None = None,
                         ctx: CorrectionContext = DEFAULT_CONTEXT) -> pd.DataFrame:
    """(correction, band) x 7 metrics over full arrays (driver-style)."""
    names = names or list(ok.CORRECTION_NAMES)
    slope = ok.zt_slope_radians(dem)
    aspect = ok.zt_aspect_radians(dem)
    lum = ok.luminance(slope, aspect, ctx).astype(np.float32)
    coeffs = ok.fit_coefficients(bands, lum, slope, ctx)
    lum_flat = lum.ravel()
    rows = []
    for b in range(bands.shape[0]):
        orig = bands[b].ravel()
        omin, omax = float(orig.min()), float(orig.max())
        m = evaluate_metrics(orig, omin, omax, lum_flat)
        m.update({"correction": ORIG_KEY, "band": b})
        rows.append(m)
        for name in names:
            vals = ok.apply_correction(name, bands[b], lum, slope, coeffs, b,
                                       ctx).ravel()
            m = evaluate_metrics(vals, omin, omax, lum_flat)
            m.update({"correction": name, "band": b})
            rows.append(m)
    df = pd.DataFrame(rows)[["correction", "band"] + METRIC_IDS]
    return df.set_index(["correction", "band"]).sort_index()


def oracle_metrics_table_zonal(bands: np.ndarray, dem: np.ndarray,
                               zones: np.ndarray,
                               names: list[str] | None = None,
                               ctx: CorrectionContext = DEFAULT_CONTEXT) -> pd.DataFrame:
    """(correction, band, zone) x 7 metrics over zone-masked full arrays
    (eval.py:173-179 masking; luminance masked per group,
    multi_criteria_eval.py:128)."""
    names = names or list(ok.CORRECTION_NAMES)
    slope = ok.zt_slope_radians(dem)
    aspect = ok.zt_aspect_radians(dem)
    lum = ok.luminance(slope, aspect, ctx).astype(np.float32)
    coeffs = ok.fit_coefficients(bands, lum, slope, ctx)
    zflat = zones.ravel()
    lum_flat = lum.ravel()
    rows = []
    for b in range(bands.shape[0]):
        orig = bands[b].ravel()
        corrected = {name: ok.apply_correction(name, bands[b], lum, slope,
                                               coeffs, b, ctx).ravel()
                     for name in names}
        for zone in np.unique(zflat):
            zmask = zflat == zone
            zorig = orig[zmask]
            zlum = lum_flat[zmask]
            omin, omax = float(zorig.min()), float(zorig.max())
            m = evaluate_metrics(zorig, omin, omax, zlum)
            m.update({"correction": ORIG_KEY, "band": b, "zone": int(zone)})
            rows.append(m)
            for name in names:
                m = evaluate_metrics(corrected[name][zmask], omin, omax, zlum)
                m.update({"correction": name, "band": b, "zone": int(zone)})
                rows.append(m)
    df = pd.DataFrame(rows)[["correction", "band", "zone"] + METRIC_IDS]
    return df.set_index(["correction", "band", "zone"]).sort_index()


def oracle_merge_rank(metrics: pd.DataFrame,
                      weights: dict[str, float] | None = None,
                      band_combine: str = "sum"):
    """multi_criteria_rank.py:169-197 in the reference's own pandas style."""
    orig_metrics = metrics.xs(ORIG_KEY)           # PRE-combine capture (:170)
    combined = metrics.copy()
    for m in METRIC_IDS:                          # combine (:171-173)
        if m == "relative_median_difference":     # metrics.py:139-140
            combined[m] = -combined[m].subtract(orig_metrics[m], level=1).abs()
        else:                                     # metrics.py:77-78
            combined[m] = combined[m] * -1

    # _normalize (:180-190)
    good_results = combined.where(combined.gt(orig_metrics, level=1))
    norm_good = good_results.subtract(orig_metrics, level=1).divide(
        good_results.groupby(level=1).max() - orig_metrics, level=1)
    bad_results = combined.where(combined.lt(orig_metrics, level=1))
    bad_min = bad_results.groupby(level=1).min()
    norm_bad = bad_results.subtract(bad_min, level=1).divide(
        orig_metrics - bad_min, level=1) - 1
    norm_good[combined.eq(orig_metrics, level=1)] = 0.0
    normalized = norm_good.fillna(norm_bad).drop(ORIG_KEY)

    w = [(weights or {}).get(m, 1.0) for m in METRIC_IDS]
    per_band = (normalized * w).sum(1)            # merge (:175-178)
    grouped = per_band.groupby(level=0)           # BandMetricsCombiner (:52-79)
    scores = {
        "sum": grouped.sum(), "mean": grouped.mean(), "max": grouped.max(),
        "min": grouped.min(), "median": grouped.median(),
    }[band_combine].to_frame(name="Score")
    return scores.sort_values("Score", ascending=False), normalized
