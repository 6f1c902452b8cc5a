"""Per-cell (localized) C-correction: kNN ring context regression.

North-rule addition (SURVEY.md J5): the reference fits ONE global
regression per band over the whole scene
(/root/reference/processing_alg/topocorrection/LuminanceRegressionTopoCorrectionAlgorithm.py:30-35);
terrain is rarely homogeneous at scene scale, so the engine also offers a
LOCALIZED variant -- each tile's C-correction constant is fit over its
ring-k cell neighborhood (same image, same band).

Scalable shape: the regression needs only sufficient statistics, so the
kNN join exchanges TINY per-tile stat rows (5 doubles), not pixels:

  1. one map pass   -> per-tile (n, Σx, Σy, Σxy, Σx²) masked DN>threshold
  2. ring fan-out   -> each stats row addressed to its (2k+1)² neighbor
                       cells (vectorized key arithmetic, no shuffle blow-up:
                       9 x ~50 B rows per tile)
  3. groupBy center -> summed neighborhood stats -> closed-form OLS ->
                       c = intercept/slope  (CTopoCorrectionAlgorithm.py:60-62)
  4. broadcast-join c back to the tile rows; apply the C-correction
     formula with the per-tile c (same unguarded divide semantics as the
     global C3 kernel, CTopoCorrectionAlgorithm.py:27-33).

Tiles at image borders simply have smaller neighborhoods (missing ring
cells contribute nothing) -- mirrored exactly by the numpy oracle.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import _LON_BITS
from .config import TILE, CorrectionParams
from .kernels import ols_from_sums
from .tiling import tiles_as_numpy

_STATS = ("n", "sx", "sy", "sxx", "sxy")
TILE_STATS_SCHEMA = ("image_id string, band int, cell long, "
                     + ", ".join(f"{f} double" for f in _STATS))

LOCAL_CORRECTED_SCHEMA = (
    "image_id string, caption string, band int, tile_x int, tile_y int, "
    "cell long, method string, px binary"
)


def _tile_stats(batches: Iterator[pd.DataFrame], tile: int,
                params: CorrectionParams) -> Iterator[pd.DataFrame]:
    thr = params.pixel_ignore_threshold
    for pdf in batches:
        if not len(pdf):
            continue
        dn = tiles_as_numpy(pdf, "px", tile).astype(np.float64)
        lum = tiles_as_numpy(pdf, "lum_px", tile).astype(np.float64)
        mask = (dn > thr) & ~np.isnan(dn)          # F3 sample filter
        x = np.where(mask, lum, 0.0)
        y = np.where(mask, dn, 0.0)
        yield pd.DataFrame({
            "image_id": pdf["image_id"], "band": pdf["band"],
            "cell": pdf["cell"],
            "n": mask.sum(axis=1).astype(np.float64),
            "sx": x.sum(axis=1), "sy": y.sum(axis=1),
            "sxx": (x * x).sum(axis=1), "sxy": (x * y).sum(axis=1),
        })


def ring_stats_c(stats: DataFrame, k: int = 1) -> DataFrame:
    """Fan each per-tile stats row out to its ring-k neighbor cells, then
    accumulate per receiving cell IN A FIXED ORDER (north-west -> south-east,
    the numpy oracle's loop order) and evaluate c = intercept/slope with
    plain python floats.

    Determinism note: the regression difference (n*Σxy − ΣxΣy) suffers
    catastrophic cancellation on weakly-correlated neighborhoods, so an
    unordered F.sum (nondeterministic float association) would make c --
    and through the unguarded C3 divide, the output pixels -- vary between
    runs at ~1e-4.  Ordered accumulation makes the result bit-stable and
    bit-identical to the oracle."""
    width = 2 * k + 1
    # struct per neighbor: ord encodes the receiver-relative tile offset
    # (dy, dx) = (dla, -dlo): receiver-relative cell offset is (-dla, -dlo)
    # and tile_y grows southward while ilat grows northward
    structs = [
        F.struct(
            (F.col("cell") + F.lit((dla << _LON_BITS) + dlo)).cast("long")
            .alias("target"),
            F.lit((dla + k) * width + (-dlo + k)).cast("int").alias("ord"),
        )
        for dla in range(-k, k + 1) for dlo in range(-k, k + 1)
    ]
    fanned = stats.withColumn("t", F.explode(F.array(*structs))) \
        .select("image_id", "band", F.col("t.target").alias("cell"),
                F.col("t.ord").alias("ord"), *_STATS)
    parts = int(stats.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    shuffled = fanned.repartition(parts, "image_id", "band", "cell") \
        .sortWithinPartitions("image_id", "band", "cell", "ord")

    def fold(batches):
        leftover = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if not len(pdf):
                continue
            keys = pdf[["image_id", "band", "cell"]]
            last = keys.iloc[-1]
            tail = ((keys["image_id"] == last["image_id"])
                    & (keys["band"] == last["band"])
                    & (keys["cell"] == last["cell"]))
            leftover = pdf[tail]
            head = pdf[~tail]
            if len(head):
                yield _fold_groups(head)
        if leftover is not None and len(leftover):
            yield _fold_groups(leftover)

    return shuffled.mapInPandas(
        fold, schema="image_id string, band int, cell long, c double")


def _fold_groups(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = {"image_id": [], "band": [], "cell": [], "c": []}
    for (iid, band, cell), g in pdf.groupby(["image_id", "band", "cell"],
                                            sort=False):
        n = sx = sy = sxx = sxy = 0.0
        for r in g.sort_values("ord").itertuples(index=False):
            # sequential left-to-right accumulation (oracle loop order)
            n += r.n; sx += r.sx; sy += r.sy; sxx += r.sxx; sxy += r.sxy
        intercept, slope = ols_from_sums(n, sx, sy, sxx, sxy)
        rows["image_id"].append(iid)
        rows["band"].append(int(band))
        rows["cell"].append(int(cell))
        rows["c"].append(intercept / slope if slope else float("nan"))
    return pd.DataFrame(rows)


def _apply_local_c(batches: Iterator[pd.DataFrame], tile: int,
                   params: CorrectionParams) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        dn = tiles_as_numpy(pdf, "px", tile)
        lum = tiles_as_numpy(pdf, "lum_px", tile)
        c = pdf["c"].to_numpy(dtype=np.float64)[:, None]
        dn32 = dn.astype("float32")
        # CTopoCorrectionAlgorithm.py:27-33 with per-tile c: no where-guard
        with np.errstate(all="ignore"):
            out = dn32 * np.divide(params.sza_cosine + c, lum + c,
                                   dn32.astype("float32"))
        out = out.astype("float32")
        ndv = np.isnan(dn32)
        out[ndv] = np.nan
        yield pd.DataFrame({
            "image_id": pdf["image_id"], "caption": pdf["caption"],
            "band": pdf["band"], "tile_x": pdf["tile_x"],
            "tile_y": pdf["tile_y"], "cell": pdf["cell"],
            "method": "c_correction_local",
            "px": [out[i].tobytes() for i in range(len(pdf))],
        })


def local_c_correction(joined: DataFrame, params: CorrectionParams,
                       k: int = 1, tile: int = TILE) -> DataFrame:
    """joined tile rows (px + lum_px) -> locally-corrected tiles."""
    stats = joined.select("image_id", "band", "cell", "px", "lum_px") \
        .mapInPandas(lambda it: _tile_stats(it, tile, params),
                     schema=TILE_STATS_SCHEMA)
    c_df = ring_stats_c(stats, k)
    enriched = joined.join(c_df, ["image_id", "band", "cell"], "inner")
    return enriched.mapInPandas(
        lambda it: _apply_local_c(it, tile, params),
        schema=LOCAL_CORRECTED_SCHEMA)
