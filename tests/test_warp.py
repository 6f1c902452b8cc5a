"""Affine warp: plane-model semantics + tiled == plane bit-equality."""
import numpy as np
import pytest

from terraspark.warp import WarpSpec, warp_plane, warp_tiles


def test_warp_plane_identity_and_halfscale():
    # identity spec (same dims, zero offsets) reproduces the source
    z = np.arange(64.0, dtype=np.float64).reshape(8, 8)
    spec = WarpSpec(h=8, w=8, ht=8, wt=8, tile=4)
    out = warp_plane(z, spec)
    assert np.allclose(out, z, atol=1e-12)
    # half-scale of a LINEAR ramp: bilinear of a linear function is exact,
    # target pixel centers sit at source coords (2*yt + 0.5)
    ramp = np.outer(np.arange(8.0), np.ones(8))
    spec2 = WarpSpec(h=8, w=8, ht=4, wt=4, tile=4)
    out2 = warp_plane(ramp, spec2)
    want = (np.arange(4.0) * 2 + 0.5)[:, None] * np.ones((1, 4))
    assert np.allclose(out2, want, atol=1e-12)


def test_warp_plane_uses_bottom_pad():
    # offset pushes the last target row's sample past the source edge:
    # linear extrapolation pad keeps a linear ramp exactly linear
    ramp = np.outer(np.arange(8.0), np.ones(8))
    spec = WarpSpec(h=8, w=8, ht=8, wt=8, oy=0.7, tile=4)
    out = warp_plane(ramp, spec)
    want = (np.arange(8.0) + 0.7)[:, None] * np.ones((1, 8))
    assert np.allclose(out, want, atol=1e-12)


def test_warp_tiles_bit_equal_to_plane(spark):
    rng = np.random.default_rng(7)
    h, w, t = 12, 16, 4
    z = rng.uniform(50, 500, size=(h, w)).astype(np.float32)
    spec = WarpSpec(h=h, w=w, ht=8, wt=8, oy=0.6, ox=0.3, tile=t)
    rows = []
    for ty in range(h // t):
        for tx in range(w // t):
            blk = z[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            rows.append(("img_a", 0, tx, ty,
                         bytearray(np.ascontiguousarray(
                             blk, dtype="<f4").tobytes())))
    df = spark.createDataFrame(
        rows, "image_id string, band int, tile_x int, tile_y int, px binary")
    got = {(r["tile_y"], r["tile_x"]):
           np.frombuffer(r["px"], dtype="<f4").reshape(t, t)
           for r in warp_tiles(df, spec, partitions=4).collect()}
    plane = warp_plane(z, spec)
    assert len(got) == (8 // t) * (8 // t)
    for (ty, tx), blk in got.items():
        want = plane[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
        # engine emits f32; compare at f32 precision, bit-exact
        assert np.array_equal(blk, want.astype(np.float32)), (ty, tx)


def test_warp_plan_single_exchange(spark):
    # one exchange total: emit (map) -> repartition by target tile ->
    # assemble (map); no extra sort-merge or aggregate exchanges
    z = np.zeros((8, 8), dtype=np.float32)
    rows = [("img_a", 0, tx, ty,
             bytearray(np.ascontiguousarray(
                 z[ty * 4:(ty + 1) * 4, tx * 4:(tx + 1) * 4],
                 dtype="<f4").tobytes()))
            for ty in range(2) for tx in range(2)]
    df = spark.createDataFrame(
        rows, "image_id string, band int, tile_x int, tile_y int, px binary")
    spec = WarpSpec(h=8, w=8, ht=4, wt=4, tile=4)
    plan = warp_tiles(df, spec, partitions=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_warpspec_rejects_out_of_pad_sampling():
    """Offsets (or strong downscale) pushing sampling more than 1 px
    outside the source must fail in __init__, not produce NaN tiles."""
    import pytest
    from terraspark.warp import WarpSpec
    WarpSpec(64, 64, 64, 64, oy=0.4)           # within the 1-px pad: fine
    with pytest.raises(ValueError, match="extrapolation pad"):
        WarpSpec(64, 64, 64, 64, oy=3.0)       # shifts past the pad
    with pytest.raises(ValueError, match="extrapolation pad"):
        WarpSpec(64, 64, 64, 64, ox=-3.0)
    # a 4x downscale samples the interior only -- must NOT raise
    WarpSpec(64, 64, 16, 16, tile=16)
