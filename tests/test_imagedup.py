"""phash near-dup invariants: banding is pure pruning (== brute force),
pigeonhole bound enforced, bucket cap + audit, CC resolution, partition
invariance."""
import itertools

import pytest
from pyspark.sql import functions as F

from terraspark import imagedup
from terraspark.fixtures import build_tables


@pytest.fixture(scope="module")
def sig(spark):
    images, *_ = build_tables(8)
    rows = [(r["image_id"], int(r["phash"]))
            for _, r in images.iterrows()]
    # planted exact-dup groups: sizes 3, 3, 2, 2 (mirrors the driver
    # query) on top of the natural distance-2 pair
    rows += [(f"img_{i:06d}_d1", rows[i][1]) for i in range(4)]
    rows += [(f"img_{i:06d}_d2", rows[i][1]) for i in range(2)]
    return spark.createDataFrame(rows, "image_id string, phash long")


def brute(rows, max_dist):
    out = set()
    for (a, pa), (b, pb) in itertools.combinations(sorted(rows), 2):
        d = bin((pa ^ pb) & (2**64 - 1)).count("1")
        if d <= max_dist:
            out.add((a, b, d))
    return out


@pytest.mark.parametrize("band_bits,max_dist",
                         [(16, 3), (16, 2), (16, 0), (8, 7), (8, 3), (32, 1)])
def test_banded_equals_brute_force(spark, sig, band_bits, max_dist):
    rows = [(r["image_id"], int(r["phash"])) for r in sig.collect()]
    got = {(r["image_a"], r["image_b"], r["dist"]) for r in
           imagedup.phash_neardup(sig, max_dist=max_dist,
                                  band_bits=band_bits).collect()}
    assert got == brute(rows, max_dist)


def test_fixture_is_nonvacuous(spark, sig):
    got = imagedup.phash_neardup(sig, max_dist=3).collect()
    dists = sorted(r["dist"] for r in got)
    # 8 distance-0 planted pairs + the natural distance-2 pair
    assert dists == [0] * 8 + [2]


def test_pigeonhole_bound_enforced(spark, sig):
    with pytest.raises(ValueError, match="pigeonhole"):
        imagedup.phash_neardup(sig, max_dist=4, band_bits=16)
    with pytest.raises(ValueError, match="divide"):
        imagedup.phash_bands(sig, band_bits=12)


def test_bucket_cap_excludes_and_audits(spark, sig):
    # cap 1: every shared band bucket is excluded -> zero pairs, and the
    # audit surfaces exactly the buckets that were dropped
    assert imagedup.phash_neardup(sig, max_dist=3, max_bucket=1).count() == 0
    audit = imagedup.phash_bucket_audit(
        imagedup.phash_bands(sig), max_bucket=1)
    assert audit.count() > 0
    assert audit.agg(F.min("n")).first()[0] >= 2


def test_dedup_resolution(spark, sig):
    got = {r["image_id"]: r for r in
           imagedup.phash_dedup(sig, max_dist=3).collect()}
    assert len(got) == 12
    # copy-of-copy chain folds into ONE cluster with canonical min id
    for i in (0, 1):
        ids = [f"img_{i:06d}", f"img_{i:06d}_d1", f"img_{i:06d}_d2"]
        assert {got[x]["cluster"] for x in ids} == {ids[0]}
        assert all(got[x]["n_members"] == 3 for x in ids)
        assert [got[x]["keep"] for x in ids] == [True, False, False]
    # natural near-dup pair
    assert got["img_000005"]["keep"] and not got["img_000006"]["keep"]
    assert got["img_000006"]["cluster"] == "img_000005"
    # drop list = non-canonical members only
    drops = sum(not r["keep"] for r in got.values())
    assert drops == 12 - 5  # 5 clusters


def test_caption_edges_are_star_shaped(spark):
    rows = [("a", "dup cap"), ("b", "dup cap"), ("c", "dup cap"),
            ("d", "unique")]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    got = sorted(map(tuple, imagedup.caption_edges(df).collect()))
    # k-1 star edges from the min id, never the k(k-1)/2 clique
    assert got == [("a", "b"), ("a", "c")]


def test_joint_dedup_merges_across_modalities(spark, sig):
    # bridge row: phash of img_000004, caption of img_000007 -- the two
    # singletons must fold into ONE cluster via composed edges
    caps = {f"img_{i:06d}": f"cap {i}" for i in range(8)}
    rows = [(r["image_id"], r["phash"],
             caps.get(r["image_id"][:10], "planted"))
            for r in sig.collect()]
    ph4 = dict((r[0], r[1]) for r in rows)["img_000004"]
    rows.append(("bridge", ph4, "cap 7"))
    df = spark.createDataFrame(
        rows, "image_id string, phash long, caption string")
    got = {r["image_id"]: r for r in
           imagedup.joint_dedup(df, max_dist=3).collect()}
    assert got["img_000004"]["cluster"] == got["img_000007"]["cluster"] \
        == got["bridge"]["cluster"] == "bridge"  # 'bridge' < 'img_...'
    assert got["img_000004"]["n_members"] == 3
    # phash-only pair still present
    assert got["img_000006"]["cluster"] == "img_000005"


def test_partition_invariance(spark, sig):
    a = sorted(map(tuple, imagedup.phash_neardup(
        sig.repartition(1), max_dist=3).collect()))
    b = sorted(map(tuple, imagedup.phash_neardup(
        sig.repartition(7, "phash"), max_dist=3).collect()))
    assert a == b


def test_bytes_column_pruned(spark, sig):
    """The banded join must not carry the binary payload: running over a
    table WITH a bytes column, the scan schema read by the pair plan
    excludes it (column pruning keeps the shuffle narrow)."""
    wide = sig.withColumn("bytes", F.lit(b"\x00" * 64))
    plan = imagedup.phash_neardup(wide, max_dist=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "bytes" not in plan
