"""Scalar execution parameters for correction pipelines.

Mirrors the scalar state of the reference's execution context
(``processing_alg/execution_context.py:40-86``): solar zenith angle,
solar azimuth, pixel-ignore threshold. The reference carries these on a
QGIS-coupled context object; here they are a plain frozen dataclass that
is captured by closure into ``map_batches`` stages (cheap to serialize,
no file paths, no handles).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class CorrectionContext:
    """Scalars shared by every correction kernel.

    sza_degrees / solar_azimuth_degrees: sun position (reference
    ``execution_context.py:43-44``). pixel_ignore_threshold: pixels at or
    below this input value are passed through unchanged by most kernels
    (reference default 5, ``execution_context.py:55``).
    """

    sza_degrees: float = 35.0
    solar_azimuth_degrees: float = 145.0
    pixel_ignore_threshold: float = 5.0

    def sza_cosine(self) -> float:
        # reference execution_context.py:84-85
        return math.cos(math.radians(self.sza_degrees))

    def sza_radians(self) -> float:
        return math.radians(self.sza_degrees)

    def azimuth_radians(self) -> float:
        return math.radians(self.solar_azimuth_degrees)


DEFAULT_CONTEXT = CorrectionContext()
