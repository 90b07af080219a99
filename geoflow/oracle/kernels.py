"""Transcription oracle: single-process numpy truth for every kernel.

Each function is a literal transcription of the cited reference code
(`/root/reference/...`), preserving dtype casts, the
``np.divide(..., out=input.astype('float32'), where=mask)`` masked-output
idiom (masked pixels keep the raw input cast to float32), fill values,
and even the reference's quirks (C-correction divides everywhere — no
``where`` mask, ``CTopoCorrectionAlgorithm.py:29-33``). The distributed
engine must reproduce these outputs; tests compare engine tiles against
these full-array results (SURVEY.md section 5).

Slope/aspect transcribe GDAL's Zevenbergen-Thorne kernels (public GDAL
source, ``gdaldem_lib.cpp``: GDALSlopeZevenbergenThorneAlg /
GDALAspectZevenbergenThorneAlg) with COMPUTE_EDGES linear extrapolation,
because the reference shells out to gdal:slope / gdal:aspect with exactly
those options (``processing_alg/execution_context.py:193-262``).

Determinism decision (SURVEY.md section 7.4): the reference's
``zero_noise`` is ``0.0001 + 0.000001*randint(1,99)`` drawn fresh per
block (``LuminanceRegressionTopoCorrectionAlgorithm.py:37-38``) —
non-deterministic. Engine + oracle pin it to a hash of the band index so
outputs are reproducible; any value in the reference's range is
consistent with reference behavior.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from ..context import CorrectionContext, DEFAULT_CONTEXT

# gdal_calc's default NoDataValue table (public osgeo_utils.gdal_calc
# DefaultNDVLookup; the reference imports it at util/raster_calc.py:25
# and applies it at :176 when NoDataValue is None). The engine's kernels
# compute in float32, but integer-typed inputs/outputs resolve through
# the same table via default_ndv().
DEFAULT_NDV_LOOKUP = {
    np.dtype(np.uint8): 255,
    np.dtype(np.int8): -128,
    np.dtype(np.uint16): 65535,
    np.dtype(np.int16): -32768,
    np.dtype(np.uint32): 4294967293,
    np.dtype(np.int32): -2147483647,
    np.dtype(np.float32): 3.402823466e38,
    np.dtype(np.float64): 1.7976931348623158e308,
}
FLOAT32_NDV = DEFAULT_NDV_LOOKUP[np.dtype(np.float32)]


def default_ndv(dtype) -> float:
    """Default output NODATA for a numpy dtype (raster_calc.py:176)."""
    return DEFAULT_NDV_LOOKUP[np.dtype(dtype)]


# ---------------------------------------------------------------------------
# Terrain: slope / aspect (Zevenbergen-Thorne) + luminance
# ---------------------------------------------------------------------------

def _pad_odd(dem: np.ndarray) -> np.ndarray:
    """COMPUTE_EDGES: out-of-bounds neighbor = 2*edge - inner (odd reflect)."""
    return np.pad(np.asarray(dem, dtype=np.float64), 1,
                  mode="reflect", reflect_type="odd")


def zt_slope_degrees_padded(p: np.ndarray, ewres: float = 1.0,
                            nsres: float = -1.0, scale: float = 1.0) -> np.ndarray:
    """ZT slope on a 1-px-padded array (engine tiles carry this halo).

    GDALSlopeZevenbergenThorneAlg: dx=(W-E)/ewres, dy=(S-N)/nsres,
    slope = atan(sqrt(dx^2+dy^2) / (2*scale)) in degrees; Float32 output.
    """
    p = np.asarray(p, dtype=np.float64)
    west = p[1:-1, :-2]
    east = p[1:-1, 2:]
    north = p[:-2, 1:-1]
    south = p[2:, 1:-1]
    dx = (west - east) / ewres
    dy = (south - north) / nsres
    key = dx * dx + dy * dy
    return np.degrees(np.arctan(np.sqrt(key) / (2.0 * scale))).astype(np.float32)


def zt_slope_degrees(dem: np.ndarray, ewres: float = 1.0,
                     nsres: float = -1.0, scale: float = 1.0) -> np.ndarray:
    """gdal:slope ZEVENBERGEN=True, COMPUTE_EDGES=True, SCALE=1, degrees."""
    return zt_slope_degrees_padded(_pad_odd(dem), ewres, nsres, scale)


def zt_aspect_degrees_padded(p: np.ndarray, zero_flat: bool = True) -> np.ndarray:
    """ZT aspect on a 1-px-padded array (azimuth convention).

    GDALAspectZevenbergenThorneAlg: dx=E-W, dy=S-N, a=atan2(dy,-dx) deg;
    azimuth convention: a>90 -> 450-a else 90-a; flat -> 0 (ZERO_FLAT);
    360 -> 0. Float32 output.
    """
    p = np.asarray(p, dtype=np.float64)
    west = p[1:-1, :-2]
    east = p[1:-1, 2:]
    north = p[:-2, 1:-1]
    south = p[2:, 1:-1]
    dx = east - west
    dy = south - north
    aspect = np.degrees(np.arctan2(dy, -dx)).astype(np.float32)
    azim = np.where(aspect > 90.0, 450.0 - aspect, 90.0 - aspect).astype(np.float32)
    flat = (dx == 0) & (dy == 0)
    azim = np.where(flat, np.float32(0.0 if zero_flat else FLOAT32_NDV), azim)
    azim = np.where(azim == 360.0, np.float32(0.0), azim)
    return azim


def zt_aspect_degrees(dem: np.ndarray, zero_flat: bool = True) -> np.ndarray:
    """gdal:aspect ZEVENBERGEN=True, ZERO_FLAT=True, TRIG_ANGLE=False, edges."""
    return zt_aspect_degrees_padded(_pad_odd(dem), zero_flat)


def zt_slope_radians(dem: np.ndarray) -> np.ndarray:
    """slope degrees -> radians (gdal rastercalculator deg2rad, Float32)."""
    return np.deg2rad(zt_slope_degrees(dem))


def zt_aspect_radians(dem: np.ndarray) -> np.ndarray:
    return np.deg2rad(zt_aspect_degrees(dem))


def luminance(slope_rad: np.ndarray, aspect_rad: np.ndarray,
              ctx: CorrectionContext = DEFAULT_CONTEXT) -> np.ndarray:
    """Illumination model, execution_context.py:281-285 (calc_function):

        fmax(0, cos(sza)*cos(slope) + sin(sza)*sin(slope)*cos(aspect-az))
    """
    sza = ctx.sza_radians()
    az = ctx.azimuth_radians()
    return np.fmax(
        0.0,
        math.cos(sza) * np.cos(slope_rad) +
        math.sin(sza) * np.sin(slope_rad) * np.cos(aspect_rad - az))


# ---------------------------------------------------------------------------
# Fits (global reductions feeding the kernels)
# ---------------------------------------------------------------------------

def ols_intercept_slope(luminance_flat: np.ndarray, band_flat: np.ndarray,
                        threshold: float) -> tuple[float, float]:
    """LuminanceRegressionTopoCorrectionAlgorithm.py:30-35: polyfit deg 1
    of band ~ luminance over pixels with band > threshold."""
    mask = band_flat > threshold
    intercept, slope = np.polynomial.polynomial.polyfit(
        luminance_flat[mask], band_flat[mask], 1)
    return float(intercept), float(slope)


def minnaert_x(lum: np.ndarray, slope_rad: np.ndarray) -> np.ndarray:
    """MinnaertTopoCorrectionAlgorithm.py:74-89 (_calculate_x):
    log(cos(slope)*luminance) where luminance > 0 else fill -10."""
    return np.log(
        np.cos(slope_rad) * lum,
        out=np.full_like(slope_rad, -10),
        where=(lum > 0))


def minnaert_y(band: np.ndarray, slope_rad: np.ndarray) -> np.ndarray:
    """MinnaertTopoCorrectionAlgorithm.py:91-105 (_calculate_y):
    log(cos(slope)*band) where band > 0 else fill -10."""
    return np.log(
        np.cos(slope_rad) * band,
        out=np.full_like(slope_rad, -10),
        where=(band > 0))


def minnaert_intercept_slope(lum: np.ndarray, band: np.ndarray,
                             slope_rad: np.ndarray) -> tuple[float, float]:
    """MinnaertTopoCorrectionAlgorithm.py:107-115: polyfit of y on x over
    ALL pixels (the -10 fills participate in the fit)."""
    x = minnaert_x(lum, slope_rad).ravel()
    y = minnaert_y(band, slope_rad).ravel()
    intercept, slope = np.polynomial.polynomial.polyfit(x, y, 1)
    return float(intercept), float(slope)


def deterministic_zero_noise(band_idx: int) -> float:
    """Seeded stand-in for LuminanceRegression...py:37-38 (see module doc)."""
    h = int.from_bytes(
        hashlib.blake2b(f"zero-noise:{band_idx}".encode(), digest_size=4).digest(),
        "big")
    return 0.0001 + 0.000001 * (h % 99 + 1)


# ---------------------------------------------------------------------------
# The 11 correction kernels (registry order: topocorrection/__init__.py:32-44)
# ---------------------------------------------------------------------------

def apply_cosine_t(I, L, ctx: CorrectionContext):
    """CosineTTopoCorrectionAlgorithm.py:36-53."""
    return I * np.divide(
        ctx.sza_cosine(), L,
        out=I.astype('float32'),
        where=np.logical_and(L > 0, I > ctx.pixel_ignore_threshold))


def apply_cosine_c(I, L, ctx: CorrectionContext, luminance_mean: float):
    """CosineCTopoCorrectionAlgorithm.py:44-61 (mean: :40-42)."""
    return I * (1 + np.divide(
        luminance_mean - L, luminance_mean,
        out=I.astype('float32'),
        where=I > ctx.pixel_ignore_threshold))


def apply_c(I, L, ctx: CorrectionContext, c: float):
    """CTopoCorrectionAlgorithm.py:27-33 — NOTE: no `where` mask; the
    reference divides everywhere (inf at L == -c). Reproduced, not fixed."""
    denominator = L + c
    return I * np.divide(
        ctx.sza_cosine() + c, denominator,
        I.astype('float32'))


def apply_scs(I, L, slope, ctx: CorrectionContext):
    """ScsTopoCorrectionAlgorithm.py:36-54."""
    return I * np.divide(
        np.cos(slope) * ctx.sza_cosine(), L,
        out=I.astype('float32'),
        where=np.logical_and(L > 0, I > ctx.pixel_ignore_threshold))


def apply_scs_c(I, L, slope, ctx: CorrectionContext, c: float):
    """ScsCTopoCorrectionAlgorithm.py:36-57."""
    denominator = L + c
    return I * np.divide(
        np.cos(slope) * ctx.sza_cosine() + c, denominator,
        out=I.astype('float32'),
        where=np.logical_and(denominator > 0, I > ctx.pixel_ignore_threshold))


def apply_minnaert(I, L, ctx: CorrectionContext, k: float):
    """MinnaertTopoCorrectionAlgorithm.py:48-68."""
    quotient = np.divide(
        ctx.sza_cosine(), L,
        out=I.astype('float32'),
        where=np.logical_and(L > 0, I > ctx.pixel_ignore_threshold))
    return I * np.power(quotient, k)


def apply_minnaert_scs(I, L, slope, ctx: CorrectionContext, k: float):
    """MinnaertScsTopoCorrectionAlgorithm.py:36-57."""
    quotient = np.divide(
        ctx.sza_cosine(), L,
        out=I.astype('float32'),
        where=np.logical_and(L > 0, I > ctx.pixel_ignore_threshold))
    return I * np.cos(slope) * np.power(quotient, k)


def apply_pbm(I, L, slope, ctx: CorrectionContext, k: float):
    """PbmTopoCorrectionAlgorithm.py:36-58."""
    slope_cos = np.cos(slope)
    return I * np.divide(
        slope_cos,
        np.power(slope_cos * L, k),
        out=I.astype('float32'),
        where=np.logical_and(L > 0, I > ctx.pixel_ignore_threshold))


def apply_veca(I, L, ctx: CorrectionContext, intercept: float, slope_coef: float,
               band_mean: float, zero_noise: float):
    """VecaTopoCorrectionAlgorithm.py:41-63."""
    denominator = slope_coef * L + intercept
    result = I * np.divide(
        band_mean, denominator,
        out=I.astype('float32'),
        where=np.logical_and(denominator > 0, I > ctx.pixel_ignore_threshold))
    result[result <= 0] = zero_noise
    return result


def apply_teillet(I, L, ctx: CorrectionContext, intercept: float,
                  slope_coef: float, band_mean: float, zero_noise: float):
    """TeilletRegressionTopoCorrectionAlgorithm.py:45-66."""
    result = np.add(
        I - slope_coef * L - intercept, band_mean,
        out=I.astype('float32'),
        where=I > ctx.pixel_ignore_threshold)
    result[result <= 0] = zero_noise
    return result


def pbc_h(slope_rad: np.ndarray) -> np.ndarray:
    """PbcTopoCorrectionAlgorithm.py:46-55: h = (1 - slope)/pi over the
    slope *radians* raster (reference quirk: not cos(slope))."""
    return (1 - slope_rad) / math.pi


def pbc_h0(ctx: CorrectionContext) -> float:
    """PbcTopoCorrectionAlgorithm.py:49."""
    return (math.pi + 2 * ctx.azimuth_radians()) / (2 * math.pi)


def apply_pbc(I, L, h, ctx: CorrectionContext, c: float, h0: float):
    """PbcTopoCorrectionAlgorithm.py:57-76; c = slope/intercept of the
    Minnaert log-fit (:80-82 — inverse of C-correction's ratio)."""
    denominator = L + c * h / h0
    return I * np.divide(
        ctx.sza_cosine() + c / h0, denominator,
        out=I.astype('float32'),
        where=np.logical_and(denominator > 0, I > ctx.pixel_ignore_threshold))


def propagate_ndv(result: np.ndarray, ndv_mask: np.ndarray,
                  out_ndv: float = FLOAT32_NDV) -> np.ndarray:
    """raster_calc.py:257-274: zero nodata cells then add the output NDV."""
    myNDVs = 1 * ndv_mask
    return (((1 * (myNDVs == 0)) * result) + (out_ndv * myNDVs)).astype(np.float32)


# ---------------------------------------------------------------------------
# Full-raster oracle: fit + apply per band, returns coeffs + corrected stack
# ---------------------------------------------------------------------------

CORRECTION_NAMES = [
    "COSINE-T", "COSINE-C", "C-correction", "SCS", "SCS+C", "Minnaert",
    "Minnaert-SCS", "Pixel based Minnaert", "VECA", "Teillet regression",
    "Pixel based C-correction",
]


def fit_coefficients(bands: np.ndarray, lum: np.ndarray, slope_rad: np.ndarray,
                     ctx: CorrectionContext = DEFAULT_CONTEXT) -> dict:
    """All global/per-band reductions the 11 kernels need, via the
    reference's own formulas (polyfit / np.mean)."""
    n_bands = bands.shape[0]
    lum_flat = lum.ravel()
    coeffs: dict = {
        "luminance_mean": float(np.mean(lum)),     # CosineC...py:42
        "h0": pbc_h0(ctx),
        "bands": {},
    }
    for b in range(n_bands):
        band_flat = bands[b].ravel()
        intercept, slope_c = ols_intercept_slope(lum_flat, band_flat,
                                                 ctx.pixel_ignore_threshold)
        m_int, m_slope = minnaert_intercept_slope(lum, bands[b], slope_rad)
        coeffs["bands"][b] = {
            "ols_intercept": intercept,
            "ols_slope": slope_c,
            "c": intercept / slope_c,              # CTopoCorrection...py:60-62
            "minnaert_intercept": m_int,
            "minnaert_k": m_slope,                 # Minnaert...py:70-72
            "pbc_c": m_slope / m_int,              # Pbc...py:80-82
            "band_mean": float(np.mean(bands[b])), # gdal_utils.py:70-88, exact
            "zero_noise": deterministic_zero_noise(b),
        }
    return coeffs


def apply_correction(name: str, I: np.ndarray, L: np.ndarray,
                     slope_rad: np.ndarray, coeffs: dict, band_idx: int,
                     ctx: CorrectionContext = DEFAULT_CONTEXT) -> np.ndarray:
    bc = coeffs["bands"][band_idx]
    if name == "COSINE-T":
        out = apply_cosine_t(I, L, ctx)
    elif name == "COSINE-C":
        out = apply_cosine_c(I, L, ctx, coeffs["luminance_mean"])
    elif name == "C-correction":
        out = apply_c(I, L, ctx, bc["c"])
    elif name == "SCS":
        out = apply_scs(I, L, slope_rad, ctx)
    elif name == "SCS+C":
        out = apply_scs_c(I, L, slope_rad, ctx, bc["c"])
    elif name == "Minnaert":
        out = apply_minnaert(I, L, ctx, bc["minnaert_k"])
    elif name == "Minnaert-SCS":
        out = apply_minnaert_scs(I, L, slope_rad, ctx, bc["minnaert_k"])
    elif name == "Pixel based Minnaert":
        out = apply_pbm(I, L, slope_rad, ctx, bc["minnaert_k"])
    elif name == "VECA":
        out = apply_veca(I, L, ctx, bc["ols_intercept"], bc["ols_slope"],
                         bc["band_mean"], bc["zero_noise"])
    elif name == "Teillet regression":
        out = apply_teillet(I, L, ctx, bc["ols_intercept"], bc["ols_slope"],
                            bc["band_mean"], bc["zero_noise"])
    elif name == "Pixel based C-correction":
        out = apply_pbc(I, L, pbc_h(slope_rad), ctx, bc["pbc_c"], coeffs["h0"])
    else:
        raise KeyError(name)
    return np.asarray(out, dtype=np.float32)


def correct_raster(name: str, bands: np.ndarray, dem: np.ndarray,
                   ctx: CorrectionContext = DEFAULT_CONTEXT,
                   nodata: np.ndarray | None = None,
                   coeffs: dict | None = None):
    """End-to-end oracle: terrain -> fit -> apply for every band.

    Returns (corrected (B,H,W) float32, coeffs dict).
    """
    slope = zt_slope_radians(dem)
    aspect = zt_aspect_radians(dem)
    lum = luminance(slope, aspect, ctx).astype(np.float32)
    if coeffs is None:
        coeffs = fit_coefficients(bands, lum, slope, ctx)
    out = np.empty_like(bands, dtype=np.float32)
    for b in range(bands.shape[0]):
        res = apply_correction(name, bands[b], lum, slope, coeffs, b, ctx)
        if nodata is not None:
            res = propagate_ndv(res, nodata)
        out[b] = res
    return out, coeffs
