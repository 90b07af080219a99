"""Per-tile terrain derivation: slope / aspect / luminance as map_batches.

Engine counterpart of the reference's derived-layer computation
(``processing_alg/execution_context.py:193-294``): where the reference
shells out to gdal:slope / gdal:aspect / a raster calculator and caches
temp GeoTIFF paths, the engine derives all three as columns on the tile
row in ONE stateless Arrow ``map_batches`` pass. Each tile row carries a
1-pixel DEM halo (geoflow.sources.tiles), so the Zevenbergen-Thorne
stencil needs no neighbor join; raster-boundary tiles were halo-padded
with GDAL's COMPUTE_EDGES linear extrapolation at tiling time.

The numeric kernels are shared with the transcription oracle
(geoflow.oracle.kernels — single source of truth for the formulas);
parity tests exercise the genuinely distributed risk: tiled + halo
execution must reproduce the oracle's full-array results exactly.

Scale notes: the stage is stateless (task pool, elastic), output drops
``dem_halo`` so the heaviest column dies as early as possible, and all
downstream correction stages consume the slope/aspect/luminance columns
without recomputing them (the reference recomputes derived layers per
correction run — SURVEY.md section 3.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..context import CorrectionContext, DEFAULT_CONTEXT
from ..oracle import kernels as ok


def _rows_as_arrays(col: pa.ChunkedArray | pa.Array) -> list[np.ndarray]:
    """Zero-copy-ish list<float32> column -> per-row numpy views."""
    out = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        flat = chunk.values.to_numpy(zero_copy_only=False)
        offsets = chunk.offsets.to_numpy(zero_copy_only=False)
        for i in range(len(chunk)):
            out.append(flat[offsets[i]:offsets[i + 1]])
    return out


def derive_terrain_batch(batch: pa.Table,
                         ctx: CorrectionContext = DEFAULT_CONTEXT,
                         drop_halo: bool = True,
                         ewres: float = 1.0, nsres: float = -1.0) -> pa.Table:
    """Add slope/aspect (radians, f32) + luminance (f32) columns per tile.

    ``ewres``/``nsres``: pixel size from the raster geotransform (GDAL
    convention: nsres negative for north-up rasters); defaults keep the
    synthetic fixtures' unit grid.
    """
    heights = batch.column("height").to_numpy()
    widths = batch.column("width").to_numpy()
    halos = _rows_as_arrays(batch.column("dem_halo"))
    slopes, aspects, lums = [], [], []
    for h, w, halo in zip(heights, widths, halos):
        p = halo.reshape(h + 2, w + 2)
        slope_rad = np.deg2rad(ok.zt_slope_degrees_padded(p, ewres, nsres))
        aspect_rad = np.deg2rad(ok.zt_aspect_degrees_padded(p))
        lum = ok.luminance(slope_rad, aspect_rad, ctx).astype(np.float32)
        slopes.append(slope_rad.ravel())
        aspects.append(aspect_rad.ravel())
        lums.append(lum.ravel())
    out = batch
    if drop_halo:
        out = out.drop_columns(["dem_halo"])
    out = out.append_column("slope", pa.array(slopes, pa.list_(pa.float32())))
    out = out.append_column("aspect", pa.array(aspects, pa.list_(pa.float32())))
    out = out.append_column("luminance", pa.array(lums, pa.list_(pa.float32())))
    return out


def derive_terrain(tiles_ds, ctx: CorrectionContext = DEFAULT_CONTEXT,
                   drop_halo: bool = True,
                   ewres: float = 1.0, nsres: float = -1.0):
    return tiles_ds.map_batches(
        lambda b: derive_terrain_batch(b, ctx, drop_halo, ewres, nsres),
        batch_format="pyarrow",
    )
