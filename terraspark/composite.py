"""Per-pixel temporal compositing: N epochs of a scene -> one plane.

The classic remote-sensing "cloud-free mosaic": every scene is observed
several times; masked pixels (clouds, NoData) are NaN after decode, and
the composite takes a NaN-aware statistic per pixel across the epoch
stack -- median (robust to outlier epochs), mean, or max.  The same
shape serves any multi-epoch reduction (max-NDVI compositing, temporal
change baselines).

Distributed shape:

* input is the engine's central tile table plus a ``scene_group``
  column assigning each image to its epoch stack;
* ONE hash shuffle on (scene_group, band, tile_y, tile_x) brings the
  k epoch blocks of each tile position together -- the only time pixel
  bytes move, and exactly the bytes of the input (no amplification);
  if epoch tables are written bucketed by scene the exchange disappears
  entirely (same co-location contract as joins.bucketed_cell_join);
* each group is one bounded task: k TILE*TILE float32 blocks ->
  float64 stack -> nanmedian/nanmean/nanmax along the epoch axis ->
  one composite block + its summary stats.  k = epochs per scene
  (single digits in practice), so task memory is k * 16 KiB however
  large the corpus is.

Reference scope note: the reference engine processes single rasters
(no temporal stack surface); this extends the north-rule image-corpus
side the way its band-merge sink (SURVEY S7) extends single bands.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .config import TILE

_STATS = {"median": np.nanmedian, "mean": np.nanmean, "max": np.nanmax}

COMPOSITE_SCHEMA = (
    "scene_group int, band int, tile_x int, tile_y int, "
    "n_epochs int, n_valid long, mean_val double, px binary"
)


def temporal_composite(tiles: DataFrame, stat: str = "median") -> DataFrame:
    """(scene_group, band, tile_x, tile_y, n_epochs, n_valid, mean_val,
    px): one composite tile per group position.

    ``tiles`` must carry the engine tile columns plus ``scene_group``.
    n_valid counts non-NaN composite pixels (a pixel is NaN only when
    EVERY epoch masked it); mean_val is the float64 nanmean of the
    composite plane (NaN when the whole block is masked everywhere).
    All arithmetic is float64 and the epoch stack folds in canonical
    image_id order (shuffle arrival order is not deterministic), so
    every stat -- including the order-sensitive nanmean fold -- is
    partition- and run-invariant and bit-reproducible against the
    numpy reference model.
    """
    if stat not in _STATS:
        raise ValueError(f"stat must be one of {sorted(_STATS)}: {stat}")
    fn = _STATS[stat]

    def _reduce(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # canonical epoch order: shuffle arrival order is nondeterministic
        # and nanmean/nanmax fold in stack order, so sort by image_id to
        # make every stat (not just the order-free median) partition- and
        # run-invariant
        pdf = pdf.sort_values("image_id")
        stack = np.stack([
            np.frombuffer(b, dtype="<f4").reshape(TILE, TILE)
            for b in pdf["px"]]).astype(np.float64)
        with np.errstate(all="ignore"):
            comp = fn(stack, axis=0)
        valid = np.isfinite(comp)
        mean_val = float(np.nanmean(comp)) if valid.any() else float("nan")
        return pd.DataFrame({
            "scene_group": [key[0]], "band": [key[1]],
            "tile_x": [key[2]], "tile_y": [key[3]],
            "n_epochs": [len(pdf)], "n_valid": [int(valid.sum())],
            "mean_val": [mean_val],
            "px": [comp.astype("<f8").tobytes()],
        })

    return (tiles.select("scene_group", "band", "tile_x", "tile_y",
                         "image_id", "px")
            .groupBy("scene_group", "band", "tile_x", "tile_y")
            .applyInPandas(_reduce, COMPOSITE_SCHEMA))
