"""End-to-end topographic-correction pipeline (reference entry point #1).

Engine shape (SURVEY.md section 3.1): read tiles -> derive terrain once
-> one fit pass (all corrections' coefficients) -> stateless apply ->
write/collect. Control stays on the Ray driver; coefficients move
through closures instead of the reference's temp-GeoTIFF + re-opened
file paths (``processing_alg/execution_context.py:325-346``).

The terrain dataset is computed ONCE and shared by the fit pass and
every apply pass. Two sharing modes:

- ``materialize`` (default): pin the terrain blocks in the object store;
  right for datasets that fit in aggregate cluster memory (lets the
  apply stages read zero-copy, spills transparently if needed).
- ``checkpoint_dir``: stream terrain to partitioned Parquet once and
  re-read per pass; right at 100 TB scale (object-store pinning would
  evict) and doubles as the resume point (geoflow.state.lineage).
"""

from __future__ import annotations

from ..context import CorrectionContext, DEFAULT_CONTEXT
from ..stages.corrections import (CORRECTION_NAMES, apply_correction_ds,
                                  fit_corrections)
from ..stages.terrain import derive_terrain


def prepare_terrain(tiles_ds, ctx: CorrectionContext = DEFAULT_CONTEXT,
                    checkpoint_dir: str | None = None):
    terrain = derive_terrain(tiles_ds, ctx)
    if checkpoint_dir is not None:
        import ray.data as rd
        terrain.write_parquet(checkpoint_dir)
        return rd.read_parquet(checkpoint_dir)
    return terrain.materialize()


def run_correction(tiles_ds, name: str,
                   ctx: CorrectionContext = DEFAULT_CONTEXT,
                   checkpoint_dir: str | None = None,
                   coeffs: dict | None = None):
    """One correction end-to-end. Returns (corrected_ds, coeffs_by_raster)."""
    terrain = prepare_terrain(tiles_ds, ctx, checkpoint_dir)
    if coeffs is None:
        coeffs = fit_corrections(terrain, ctx)
    return apply_correction_ds(terrain, name, coeffs, ctx), coeffs


def run_all_corrections(tiles_ds, names: list[str] | None = None,
                        ctx: CorrectionContext = DEFAULT_CONTEXT,
                        checkpoint_dir: str | None = None):
    """All (or selected) corrections off one terrain pass + one fit pass.

    Returns ({name: corrected_ds}, coeffs_by_raster). The reference runs
    one full pipeline per correction, re-deriving slope/aspect/luminance
    each time (``multi_criteria_rank.py:199-239``); here every correction
    shares both the terrain dataset and the single fit pass.
    """
    names = names or CORRECTION_NAMES
    terrain = prepare_terrain(tiles_ds, ctx, checkpoint_dir)
    coeffs = fit_corrections(terrain, ctx)
    return {n: apply_correction_ds(terrain, n, coeffs, ctx) for n in names}, coeffs
