"""Global configuration for the terraspark engine.

Scalar parameters mirror the reference plugin's execution context
(/root/reference/processing_alg/execution_context.py:40-55): solar zenith
angle (SZA), solar azimuth, pixel-ignore threshold (default 5,
/root/reference/processing_alg/topocorrection/qgis_algorithm.py:152-158).

Fixture-scale constants follow FIXTURES.md: SEED=42, TILE=64, 4 bands,
SZA=30 deg, azimuth=135 deg.
"""
from __future__ import annotations

import math
import zlib
from dataclasses import dataclass, field
from decimal import ROUND_HALF_UP, Decimal

SEED = 42
TILE = 64                    # tile edge in pixels
BANDS = 4
IMG_W = 256                  # fixture image width (4x4 tiles)
IMG_H = 256

# Cell grid: resolution r -> cell edge of 1/2**r degrees.  We pick the
# resolution so one tile spans exactly one cell: pixel size is chosen as
# cell_deg / TILE, making the image tile grid coincide with the cell grid
# (the engine never assumes this -- it is a fixture-generation convenience
# that makes tile->cell assignment exactly checkable).
CELL_RES = 7                                 # 1/128 deg = 0.0078125 deg
CELL_DEG = 1.0 / (1 << CELL_RES)
PIXEL_DEG = CELL_DEG / TILE

# Vertical/horizontal scaling for terrain derivatives.  The reference runs
# gdal:slope with SCALE=1 over whatever horizontal units the raster has
# (execution_context.py:204-208, including the "magic number 111120 lol"
# comment noting degrees were NOT converted to meters).  We define an
# explicit ground resolution instead, shared by engine and oracle.
PIXEL_SIZE_M = 10.0

DEFAULT_SZA_DEG = 30.0
DEFAULT_AZIMUTH_DEG = 135.0
DEFAULT_IGNORE_THRESHOLD = 5.0

METHODS = (
    "cosine_t",       # C1  CosineTTopoCorrectionAlgorithm.py:36-53
    "cosine_c",       # C2  CosineCTopoCorrectionAlgorithm.py:40-61
    "c_correction",   # C3  CTopoCorrectionAlgorithm.py:27-62
    "scs",            # C4  ScsTopoCorrectionAlgorithm.py:36-54
    "scs_c",          # C5  ScsCTopoCorrectionAlgorithm.py:36-57
    "minnaert",       # C6  MinnaertTopoCorrectionAlgorithm.py:42-115
    "minnaert_scs",   # C7  MinnaertScsTopoCorrectionAlgorithm.py:36-57
    "pbm",            # C8  PbmTopoCorrectionAlgorithm.py:36-58
    "veca",           # C9  VecaTopoCorrectionAlgorithm.py:37-63
    "teillet",        # C10 TeilletRegressionTopoCorrectionAlgorithm.py:41-66
    "pbc",            # C11 PbcTopoCorrectionAlgorithm.py:43-83
)


@dataclass(frozen=True)
class CorrectionParams:
    """Scalar parameters of a correction run (reference: ExecutionContext)."""

    sza_degrees: float = DEFAULT_SZA_DEG
    solar_azimuth_degrees: float = DEFAULT_AZIMUTH_DEG
    pixel_ignore_threshold: float = DEFAULT_IGNORE_THRESHOLD
    pixel_size_m: float = PIXEL_SIZE_M
    tile: int = TILE

    @property
    def sza_cosine(self) -> float:
        # execution_context.py:85-86
        return math.cos(math.radians(self.sza_degrees))

    @property
    def sza_radians(self) -> float:
        return math.radians(self.sza_degrees)

    @property
    def azimuth_radians(self) -> float:
        return math.radians(self.solar_azimuth_degrees)

    @property
    def pbc_h0(self) -> float:
        # PbcTopoCorrectionAlgorithm.py:49
        return (math.pi + 2.0 * self.azimuth_radians) / (2.0 * math.pi)


def zero_noise(image_id: str, band: int, method: str) -> float:
    """Deterministic replacement for the reference's nondeterministic
    ``0.0001 + 0.000001 * randint(1, 99)``
    (LuminanceRegressionTopoCorrectionAlgorithm.py:37-38).

    Seeded per (image, band, method) so engine and oracle agree exactly.
    Documented deliberate divergence: same value range, deterministic draw.
    """
    h = zlib.crc32(f"{image_id}|{band}|{method}".encode())
    return 0.0001 + 0.000001 * (1 + h % 99)


def half_up(x: float, nd: int) -> float:
    """Deterministic HALF_UP rounding -- matches Spark's ROUND semantics
    (python's round() is banker's rounding and would diverge)."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal("1." + "0" * nd), rounding=ROUND_HALF_UP))


DEFAULT_PARAMS = CorrectionParams()
