"""Multimodal (image/audio/video) column plumbing.

Binary media columns ride as opaque ``binary`` with typed metadata
(w/h/fmt), decoded inside Arrow-batched ``mapInPandas`` -- the schema,
partitioning, UDF signature, and batch shapes here are the real, tested
engine surface.  Actual image/audio codecs beyond the three built-in ones
(raw_f32 / PNG16 / the deterministic lossy stub) are NOT available in this
container, so ``decode_media`` raises ``NotImplementedError`` for foreign
formats -- a clearly-marked stub boundary to swap for PIL/ffmpeg decoders.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs

SUPPORTED = {"raw_f32", "png", "jpeg"}

THUMB_SCHEMA = ("image_id string, caption string, thumb array<double>, "
                "mean_px double")


def decode_media(data: bytes, fmt: str, bands: int, h: int, w: int) -> np.ndarray:
    if fmt in SUPPORTED:
        return codecs.decode(data, fmt, bands, h, w)
    raise NotImplementedError(
        f"decoder for fmt={fmt!r} requires an external media library "
        "(PIL/ffmpeg); plug it in here")


def thumbnails(images: DataFrame, grid: int = 4, bands: int = 4) -> DataFrame:
    """Decode -> block-mean downsample to grid x grid (band 0) -> feature
    vector + scene mean.  The resize/feature-extract pattern for media
    columns: pure numpy over Arrow batches, one output row per input row."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"image_id": [], "caption": [], "thumb": [], "mean_px": []}
            for r in pdf.itertuples(index=False):
                px = decode_media(r.bytes, r.fmt, bands, r.h, r.w)
                band = np.nan_to_num(px[0].astype(np.float64))
                gh = band.shape[0] // grid
                gw = band.shape[1] // grid
                thumb = band[:gh * grid, :gw * grid] \
                    .reshape(grid, gh, grid, gw).mean(axis=(1, 3))
                rows["image_id"].append(r.image_id)
                rows["caption"].append(r.caption)
                rows["thumb"].append([round(float(v), 4)
                                      for v in thumb.ravel()])
                rows["mean_px"].append(round(float(band.mean()), 4))
            yield pd.DataFrame(rows)

    return images.mapInPandas(gen, schema=THUMB_SCHEMA)
