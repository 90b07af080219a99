"""Distributed fit + apply for the 11 topographic-correction kernels.

Two-phase design (SURVEY.md section 2.3 "Ray Data mapping"):

FIT — one streaming pass over the terrain-enriched tile dataset computes
per-(raster_id, band) float64 moment partials inside ``map_batches``
(a combiner: one output row per key per batch), a tiny
``groupby.aggregate(Sum)`` merges them, and the driver solves the
closed-form OLS / means. This single pass yields the coefficients for
ALL 11 corrections at once — the reference reruns its full fit per
correction and per band in the driver process
(``LuminanceRegressionTopoCorrectionAlgorithm.py:30-35``,
``MinnaertTopoCorrectionAlgorithm.py:107-115``,
``CosineCTopoCorrectionAlgorithm.py:40-42``).

APPLY — a stateless Arrow ``map_batches`` over tile rows with the
coefficient dict captured in the closure (small: O(bands) floats — no
actor state needed, kernels are pure). Per-pixel formulas are shared
with the transcription oracle (geoflow.oracle.kernels) so engine tiles
are bit-identical to the oracle given identical coefficients; the
closed-form fit matches the oracle's ``np.polynomial.polyfit`` to
<=1e-9 relative on well-conditioned data (tolerance documented in
SURVEY.md section 7.4).

NDV propagation transcribes ``util/raster_calc.py:257-274``: nodata
cells are zeroed then set to gdal_calc's Float32 default NDV.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from ..context import CorrectionContext, DEFAULT_CONTEXT
from ..oracle import kernels as ok
from ..registry import CORRECTIONS, apply_registered
from .terrain import _rows_as_arrays

CORRECTION_NAMES = list(ok.CORRECTION_NAMES)

_MOMENT_COLS = [
    "n", "sum_I", "sum_lum",
    "m_n", "m_sum_x", "m_sum_y", "m_sum_xx", "m_sum_xy",   # OLS on masked px
    "mn_sum_x", "mn_sum_y", "mn_sum_xx", "mn_sum_xy",      # Minnaert log-fit
]


def fit_moments_batch(batch: pa.Table,
                      ctx: CorrectionContext = DEFAULT_CONTEXT) -> pa.Table:
    """Collapse a tile batch to per-(raster_id, band) moment partials."""
    rid = batch.column("raster_id").to_pylist()
    band = batch.column("band").to_numpy()
    pixels = _rows_as_arrays(batch.column("pixels"))
    lums = _rows_as_arrays(batch.column("luminance"))
    slopes = _rows_as_arrays(batch.column("slope"))
    acc: dict[tuple, np.ndarray] = {}
    T = ctx.pixel_ignore_threshold
    for r, b, I, L, s in zip(rid, band, pixels, lums, slopes):
        I64 = I.astype(np.float64)
        L64 = L.astype(np.float64)
        mask = I > T
        x = L64[mask]
        y = I64[mask]
        # Minnaert log-fit inputs with the reference's -10 fills
        # (MinnaertTopoCorrectionAlgorithm.py:74-105); fills participate.
        mx = ok.minnaert_x(L, s).astype(np.float64).ravel()
        my = ok.minnaert_y(I, s).astype(np.float64).ravel()
        vals = np.array([
            I.size, I64.sum(), L64.sum(),
            x.size, x.sum(), y.sum(), (x * x).sum(), (x * y).sum(),
            mx.sum(), my.sum(), (mx * mx).sum(), (mx * my).sum(),
        ])
        key = (r, int(b))
        if key in acc:
            acc[key] += vals
        else:
            acc[key] = vals
    rows = {
        "raster_id": [k[0] for k in acc],
        "band": np.array([k[1] for k in acc], dtype=np.int32),
    }
    stacked = (np.vstack(list(acc.values()))
               if acc else np.empty((0, len(_MOMENT_COLS))))
    for j, c in enumerate(_MOMENT_COLS):
        rows[c] = stacked[:, j]
    return pa.table(rows)


def _closed_form_ols(n, sx, sy, sxx, sxy) -> tuple[float, float]:
    """(intercept, slope) from float64 moments — matches polyfit analytically.

    Degenerate regressor (constant x — e.g. flat terrain giving constant
    luminance, as on the reference's own 10x10 test grid): the normal
    equations are rank-deficient; the minimum-norm least-squares solution
    is slope 0, intercept mean(y) (what lstsq returns where polyfit
    warns). Corrections built on these coefficients reduce to identity
    on such rasters, which is the physically right answer."""
    denom = n * sxx - sx * sx
    if denom == 0:
        return (float(sy / n) if n else 0.0), 0.0
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    return float(intercept), float(slope)


def fit_corrections(terrain_ds, ctx: CorrectionContext = DEFAULT_CONTEXT) -> dict:
    """Streaming fit pass -> {raster_id: coeffs} (oracle-shaped dicts)."""
    partials = terrain_ds.map_batches(
        lambda b: fit_moments_batch(b, ctx), batch_format="pyarrow")
    # few (raster, band) keys over many tile blocks: coalesce the slim
    # per-batch moment rows so the sort shuffle doesn't make one (mostly
    # empty) reduce partition per tile block
    from ..functions.agg import coalesce_blocks
    partials = coalesce_blocks(partials, 1)
    aggs = [Sum(c, alias_name=c) for c in _MOMENT_COLS]
    table = partials.groupby(["raster_id", "band"]).aggregate(*aggs).to_pandas()
    out: dict[str, dict] = {}
    for rid, g in table.groupby("raster_id"):
        coeffs = {"luminance_mean": None, "h0": ok.pbc_h0(ctx), "bands": {}}
        for row in g.itertuples(index=False):
            b = int(row.band)
            intercept, slope = _closed_form_ols(
                row.m_n, row.m_sum_x, row.m_sum_y, row.m_sum_xx, row.m_sum_xy)
            m_int, m_slope = _closed_form_ols(
                row.n, row.mn_sum_x, row.mn_sum_y, row.mn_sum_xx, row.mn_sum_xy)
            coeffs["bands"][b] = {
                "ols_intercept": intercept,
                "ols_slope": slope,
                # degenerate fits (slope/intercept 0 on flat terrain —
                # see _closed_form_ols): c / pbc_c are arbitrary there
                # because the correction factor is identically 1 when
                # luminance is constant; pin 0.0 to keep kernels finite
                "c": intercept / slope if slope != 0 else 0.0,
                "minnaert_intercept": m_int,
                "minnaert_k": m_slope,
                "pbc_c": m_slope / m_int if m_int != 0 else 0.0,
                "band_mean": float(row.sum_I / row.n),
                "zero_noise": ok.deterministic_zero_noise(b),
            }
            # luminance is band-independent; any band's sums give the mean
            coeffs["luminance_mean"] = float(row.sum_lum / row.n)
        out[rid] = coeffs
    return out


def apply_correction_batch(batch: pa.Table, fn, coeffs_by_raster: dict,
                           ctx: CorrectionContext = DEFAULT_CONTEXT,
                           out_col: str = "corrected") -> pa.Table:
    """Stateless apply kernel over tile rows; adds ``out_col`` (f32 list).

    ``fn`` is the correction callable resolved from the registry ON THE
    DRIVER (geoflow.registry) — passing the function through the closure
    (cloudpickle serializes it by value) means user-registered
    corrections work in worker processes that never ran the registering
    code.
    """
    rid = batch.column("raster_id").to_pylist()
    band = batch.column("band").to_numpy()
    pixels = _rows_as_arrays(batch.column("pixels"))
    lums = _rows_as_arrays(batch.column("luminance"))
    slopes = _rows_as_arrays(batch.column("slope"))
    has_nodata = "nodata" in batch.column_names
    ndmasks = (_rows_as_arrays_bool(batch.column("nodata"))
               if has_nodata else [None] * len(rid))
    outs = []
    for r, b, I, L, s, nd in zip(rid, band, pixels, lums, slopes, ndmasks):
        coeffs = coeffs_by_raster[r]
        res = np.asarray(fn(I, L, s, coeffs, int(b), ctx), dtype=np.float32)
        if nd is not None and nd.any():
            res = ok.propagate_ndv(res, nd)
        outs.append(res.ravel())
    return batch.append_column(out_col, pa.array(outs, pa.list_(pa.float32())))


def _rows_as_arrays_bool(col) -> list[np.ndarray]:
    out = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        flat = chunk.values.to_numpy(zero_copy_only=False)
        offsets = chunk.offsets.to_numpy(zero_copy_only=False)
        for i in range(len(chunk)):
            out.append(flat[offsets[i]:offsets[i + 1]])
    return out


def apply_correction_ds(terrain_ds, name: str, coeffs_by_raster: dict,
                        ctx: CorrectionContext = DEFAULT_CONTEXT,
                        out_col: str = "corrected"):
    if name not in CORRECTIONS:
        raise KeyError(f"unknown correction {name!r}; "
                       f"registry: {sorted(CORRECTIONS)}")
    fn = CORRECTIONS[name]          # resolve on the driver (see batch fn)
    return terrain_ds.map_batches(
        lambda b: apply_correction_batch(b, fn, coeffs_by_raster, ctx, out_col),
        batch_format="pyarrow",
    )
