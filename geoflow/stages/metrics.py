"""The 7 evaluation metrics + distributed evaluation over corrections.

Transcribed metric semantics (reference
``processing_alg/topocorrection_eval/metrics.py:81-206``):

| id                         | evaluate(values)                         |
|----------------------------|------------------------------------------|
| std_reduction              | np.std(values)                           |
| cv_reduction               | np.std/np.mean                           |
| iqr_reduction              | P75 - P25 (np.percentile linear interp)  |
| relative_median_difference | np.median (combine: -abs(corr - orig))   |
| outliers_threshold         | count outside [orig_min, orig_max]       |
| outliers_iqr               | count outside [Q1-IQR, Q3+IQR]           |
| determination_coefficient  | r^2 of OLS values ~ luminance            |

``determination_coefficient`` uses the closed-form Pearson r (the
standard formula behind scipy.stats.linregress, metrics.py:193-195;
scipy is not available in this environment — SURVEY.md section 7.0).

Evaluation shape: corrections are applied in ONE wide ``map_batches``
pass (one column per correction + the original), then
``groupby("band").map_groups`` computes all metrics for all corrections
of a band in one task. Exact medians/percentiles come from the gathered
per-band group — correct at raster scale where a band fits a worker
(reference holds full bands in the driver, multi_criteria_eval.py:128);
the web-scale variant groups by (band, cell) so groups stay small.
Group rows are sorted by (tile_y, tile_x) before concatenation so
floating reductions are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

METRIC_IDS = [
    "std_reduction", "cv_reduction", "iqr_reduction",
    "relative_median_difference", "outliers_threshold", "outliers_iqr",
    "determination_coefficient",
]

# is_reduction flag per metric (metrics.py:60-78; DeterminationCoefficient
# and the others all default True in the registry — combine multiplies by -1)
IS_REDUCTION = {m: True for m in METRIC_IDS}

ORIG_KEY = "__orig__"


def metric_ids() -> list[str]:
    """Current metric registry order (includes user-registered metrics;
    geoflow.registry.register_metric)."""
    from ..registry import METRICS
    return list(METRICS)


def pearson_r2(x: np.ndarray, y: np.ndarray) -> float:
    """r^2 of the OLS fit y ~ x (scipy.stats.linregress semantics)."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    n = x.size
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    syy = (y * y).sum()
    sxy = (x * y).sum()
    num = n * sxy - sx * sy
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den <= 0:
        return 0.0
    r = num / np.sqrt(den)
    return float(r * r)


def _metric_snapshot():
    """Registry snapshot taken ON THE DRIVER so user-registered metrics
    travel into worker processes via the pickled closure."""
    from ..registry import METRICS
    return [(mid, spec.fn) for mid, spec in METRICS.items()]


def evaluate_metrics(values: np.ndarray, orig_min: float, orig_max: float,
                     luminance: np.ndarray, specs=None) -> dict[str, float]:
    """All registered metric values for one (correction, band[, zone])
    array (the 7 reference metrics plus any user-registered ones)."""
    specs = specs if specs is not None else _metric_snapshot()
    return {mid: fn(values, orig_min, orig_max, luminance)
            for mid, fn in specs}


def metrics_for_band_group(correction_cols: list[str]):
    """map_groups fn over a per-band group of wide tile rows.

    Expects columns: band, tile_y, tile_x, pixels (original), luminance,
    and one column per correction name in ``correction_cols``.
    Emits one row per correction (plus ``__orig__``) with the 7 metrics.
    """
    specs = _metric_snapshot()
    ids = [mid for mid, _ in specs]

    def _eval(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tile_y", "tile_x"])
        band = int(g["band"].iloc[0])
        lum = np.concatenate([np.asarray(v, np.float32) for v in g["luminance"]])
        orig = np.concatenate([np.asarray(v, np.float32) for v in g["pixels"]])
        orig_min, orig_max = float(orig.min()), float(orig.max())
        rows = []
        sources = [(ORIG_KEY, orig)] + [
            (name, np.concatenate([np.asarray(v, np.float32) for v in g[name]]))
            for name in correction_cols
        ]
        for name, vals in sources:
            m = evaluate_metrics(vals, orig_min, orig_max, lum, specs)
            m.update({"correction": name, "band": band})
            rows.append(m)
        return pd.DataFrame(rows)[["correction", "band"] + ids]
    return _eval


def evaluate_corrections_ds(wide_ds, correction_cols: list[str]):
    """wide per-tile dataset -> (correction, band, 7 metrics) Dataset."""
    return wide_ds.groupby("band").map_groups(
        metrics_for_band_group(correction_cols), batch_format="pandas")


def metrics_for_band_group_zonal(correction_cols: list[str]):
    """Zonal variant: per-band group rows carry ``zone_ids``; metrics are
    evaluated per (zone, correction) over zone-masked pixels, with the
    original stats and luminance masked by the SAME zone (reference:
    ``eval.py:173-179`` + ``multi_criteria_eval.py:123-133`` — masked
    luminance/min/max per group)."""
    specs = _metric_snapshot()
    ids = [mid for mid, _ in specs]

    def _eval(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tile_y", "tile_x"])
        band = int(g["band"].iloc[0])
        lum = np.concatenate([np.asarray(v, np.float32) for v in g["luminance"]])
        orig = np.concatenate([np.asarray(v, np.float32) for v in g["pixels"]])
        zones = np.concatenate([np.asarray(v, np.int32) for v in g["zone_ids"]])
        sources = [(ORIG_KEY, orig)] + [
            (name, np.concatenate([np.asarray(v, np.float32) for v in g[name]]))
            for name in correction_cols
        ]
        rows = []
        for zone in np.unique(zones):
            zmask = zones == zone
            zlum = lum[zmask]
            zorig = orig[zmask]
            omin, omax = float(zorig.min()), float(zorig.max())
            for name, vals in sources:
                m = evaluate_metrics(vals[zmask], omin, omax, zlum, specs)
                m.update({"correction": name, "band": band, "zone": int(zone)})
                rows.append(m)
        return pd.DataFrame(rows)[["correction", "band", "zone"] + ids]
    return _eval


def evaluate_corrections_zonal_ds(wide_ds, correction_cols: list[str]):
    """-> (correction, band, zone, 7 metrics) Dataset."""
    return wide_ds.groupby("band").map_groups(
        metrics_for_band_group_zonal(correction_cols), batch_format="pandas")
