"""Multimodal (image/audio/video) column plumbing.

Binary media columns ride as opaque ``binary`` with typed metadata
(w/h/fmt for images, n_frames/h/w for video, sr for audio), decoded
inside Arrow-batched ``mapInPandas`` -- the schema, partitioning, UDF
signature, and batch shapes here are the real, tested engine surface.

Three modalities, each with a REAL built-in codec plus a clearly-marked
``NotImplementedError`` boundary for foreign formats (swap for
PIL/ffmpeg/libsndfile decoders in production):

* images  -- raw_f32 / PNG16 / deterministic lossy stub (:mod:`codecs`);
  :func:`thumbnails` is the decode -> resize/feature-extract pattern.
* video   -- ``rawvideo_f32``: n_frames contiguous h x w float32 frames;
  :func:`frame_sample` is the 1-row -> many-rows frame-sampling pattern
  (the UDTF shape: stride-sampled frames fan out of ``mapInPandas``).
* audio   -- ``pcm_s16le``: int16 little-endian samples;
  :func:`audio_features` is the per-clip signal-stats pattern.

Deterministic synthetic media tables (:func:`synth_video_table`,
:func:`synth_audio_table`) have closed-form per-frame/per-clip statistics
(documented at each synth), so driver oracles are pure SQL arithmetic --
no committed expectation files needed.
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


# ----------------------------------------------------------------------
# video: rawvideo_f32 frame sampling
# ----------------------------------------------------------------------
VIDEO_DDL = ("video_id string, data binary, n_frames int, h int, w int, "
             "fmt string")
FRAME_SCHEMA = ("video_id string, frame_idx int, mean_px double, "
                "min_px double, max_px double")


def synth_video_table(spark, n_videos: int = 8, n_frames: int = 12,
                      h: int = 32, w: int = 32) -> DataFrame:
    """Deterministic test video source: frame ``f`` of video ``v`` is the
    float32 ramp ``base + 0.5 * i`` over the h*w pixels, with
    ``base = (v * 131 + f * 17) % 251``.  All values are exact binary
    fractions, so per-frame stats have closed forms (N = h*w):
    mean = base + 0.25 * (N - 1), min = base, max = base + 0.5 * (N - 1)
    -- float64-exact, which is what makes pure-SQL oracles possible."""
    rows = []
    for v in range(n_videos):
        frames = []
        for f in range(n_frames):
            base = float((v * 131 + f * 17) % 251)
            frames.append(
                (base + np.arange(h * w, dtype=np.float32) * 0.5)
                .astype("<f4"))
        rows.append({"video_id": f"vid_{v:04d}",
                     "data": np.concatenate(frames).tobytes(),
                     "n_frames": n_frames, "h": h, "w": w,
                     "fmt": "rawvideo_f32"})
    return spark.createDataFrame(pd.DataFrame(rows), schema=VIDEO_DDL)


def frame_sample(videos: DataFrame, stride: int = 4) -> DataFrame:
    """Sample every ``stride``-th frame of each video and emit one row per
    sampled frame with per-frame pixel stats -- the frame-sampling /
    feature-extraction stage of a video training-data pipeline.

    Scale shape: 1 input row -> ceil(n_frames/stride) output rows inside
    one Arrow batch (the UDTF fan-out, same shape as image tiling); no
    shuffle -- a pure map stage over however many file splits the video
    table scan provides.  Foreign containers (mp4/webm/...) hit the
    NotImplementedError decoder boundary; ``rawvideo_f32`` decoding is
    real (frombuffer + reshape, zero-copy)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "mean_px": [],
                   "min_px": [], "max_px": []}
            for r in pdf.itertuples(index=False):
                if r.fmt != "rawvideo_f32":
                    raise NotImplementedError(
                        f"video decoder for fmt={r.fmt!r} requires an "
                        "external library (ffmpeg); plug it in here")
                fsz = int(r.h) * int(r.w)
                arr = np.frombuffer(r.data, dtype="<f4").reshape(
                    int(r.n_frames), fsz)
                for idx in range(0, int(r.n_frames), stride):
                    fr = arr[idx].astype(np.float64)
                    out["video_id"].append(r.video_id)
                    out["frame_idx"].append(idx)
                    out["mean_px"].append(float(fr.mean()))
                    out["min_px"].append(float(fr.min()))
                    out["max_px"].append(float(fr.max()))
            yield pd.DataFrame(out)

    return videos.mapInPandas(gen, schema=FRAME_SCHEMA)


# ----------------------------------------------------------------------
# audio: pcm_s16le signal features
# ----------------------------------------------------------------------
AUDIO_DDL = "audio_id string, data binary, sr int, fmt string"
AUDIO_SCHEMA = ("audio_id string, n_samples long, mean_amp double, "
                "rms double, peak double")


def synth_audio_table(spark, n_clips: int = 8, sr: int = 16000,
                      period: int = 8) -> DataFrame:
    """Deterministic test audio source: clip ``v`` is one second of a
    square wave, amplitude ``a = (v * 37) % 1000 + 100`` (int16), period
    ``period`` samples (half +a, half -a).  With sr a multiple of the
    period: mean = 0, rms = a, peak = a -- all float64-exact."""
    rows = []
    for v in range(n_clips):
        a = (v * 37) % 1000 + 100
        cycle = np.concatenate([np.full(period // 2, a, dtype="<i2"),
                                np.full(period // 2, -a, dtype="<i2")])
        rows.append({"audio_id": f"aud_{v:04d}",
                     "data": np.tile(cycle, sr // period).tobytes(),
                     "sr": sr, "fmt": "pcm_s16le"})
    return spark.createDataFrame(pd.DataFrame(rows), schema=AUDIO_DDL)


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip signal statistics (sample count, mean amplitude, RMS,
    peak) -- the audio feature-extraction stage.  ``pcm_s16le`` decoding
    is real (frombuffer int16); foreign codecs (mp3/opus/...) hit the
    NotImplementedError boundary.  Pure map stage, one output row per
    clip."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "n_samples": [], "mean_amp": [],
                   "rms": [], "peak": []}
            for r in pdf.itertuples(index=False):
                if r.fmt != "pcm_s16le":
                    raise NotImplementedError(
                        f"audio decoder for fmt={r.fmt!r} requires an "
                        "external library (libsndfile); plug it in here")
                x = np.frombuffer(r.data, dtype="<i2").astype(np.float64)
                out["audio_id"].append(r.audio_id)
                out["n_samples"].append(len(x))
                out["mean_amp"].append(float(x.mean()))
                out["rms"].append(float(np.sqrt((x * x).mean())))
                out["peak"].append(float(np.abs(x).max()))
            yield pd.DataFrame(out)

    return audio.mapInPandas(gen, schema=AUDIO_SCHEMA)
