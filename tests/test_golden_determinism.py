"""Golden-file guard: the committed oracle expectations regenerate
byte-for-byte identically -- protects against accidental nondeterminism in
fixtures or the reference model (the whole correctness scheme depends on
SEED-fixed reproducibility)."""
import os

import numpy as np
import pandas as pd

from terraspark.config import half_up

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")


def test_correction_summary_regenerates_identically(fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    fresh = oracle.expected_correction_summary(round_to=10)
    fresh["mean_px"] = fresh["mean_px"].map(lambda v: half_up(v, 3))
    committed = pd.read_parquet(f"{FIX}/expected_corrections.parquet")
    pd.testing.assert_frame_equal(
        fresh.reset_index(drop=True), committed.reset_index(drop=True))


def test_assignments_regenerate_identically(fixture_tables):
    images, scenes, dem, aoi, grids, oracle = fixture_tables
    fresh = oracle.expected_assignments()
    committed = pd.read_parquet(f"{FIX}/expected_assignments.parquet")
    pd.testing.assert_frame_equal(
        fresh.reset_index(drop=True), committed.reset_index(drop=True))


def test_images_bytes_deterministic(fixture_tables):
    """Encoded image bytes are identical across regenerations (codecs and
    RNG fully seeded)."""
    from terraspark.fixtures import build_tables
    images, *_ = fixture_tables
    images2, _, _, _, _ = build_tables(8)
    assert list(images["image_id"]) == list(images2["image_id"])
    for a, b in zip(images["bytes"], images2["bytes"]):
        assert a == b
    assert list(images["phash"]) == list(images2["phash"])
