"""Perceptual-hash near-duplicate detection over image corpora.

The input table (image_id, bytes, ..., phash) carries a 64-bit
perceptual hash per image (dhash, codecs.dhash64); visually identical
or near-identical images land within a small Hamming distance even
when their encoded bytes differ (re-encode, lossy round-trip, small
crops).  Web-scale image dedup is a Hamming-ball self-join on that
column -- the multi-index pigeonhole construction (Norouzi et al.,
"Fast Search in Hamming Space with Multi-Index Hashing"):

* split the 64-bit hash into ``n_bands`` disjoint bands of
  ``band_bits`` bits.  If hamming(a, b) <= max_dist and
  max_dist < n_bands, at least one band is bit-identical
  (pigeonhole), so an equi-self-join on (band, band_val) has EXACT
  recall for the ball;
* candidate pairs are verified exactly with a JVM-side popcount:
  bit_count(phash_a XOR phash_b) <= max_dist.  Precision is exact,
  so banding is pure pruning -- results equal the brute-force
  quadratic join.

Scale shape (the reason this is not a crossJoin): only
(image_id, phash, band, band_val) rows enter the shuffle -- the bytes
column is pruned at the scan.  ``band_bits`` trades recall radius for
bucket selectivity: 16-bit bands give radius 3 with a 65,536-value key
space per band; at 10^12 images a band value still holds ~10^7 ids, so
-- exactly like the text-LSH path (datapipe.dedup.candidate_pairs) --
buckets above ``max_bucket`` are excluded from pairing and surfaced
via :func:`phash_bucket_audit` instead of silently exploding a task.
A production run drains audited buckets with a second pass at wider
``band_bits`` (32-bit bands, radius 1) or treats them as exact-dup
groups keyed by the full hash.

Reference scope note: the reference engine has no image-dedup surface;
this implements the north-rule image+caption corpus side (phash column
of the input hint).  Cluster resolution reuses the distributed
connected-components loop (vectorize.connected_components) -- labels
are one row per *duplicated* image, the corpus itself never enters the
loop.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_BITS = 64
#: same default cap as the text-LSH path: a bucket with > this many
#: members contributes O(cap^2) pairs per task at most.
DEFAULT_MAX_BUCKET = 5000


def phash_bands(images: DataFrame, band_bits: int = 16) -> DataFrame:
    """(image_id, phash, band, band_val): disjoint ``band_bits``-bit
    slices of the 64-bit hash, one row per (image, band).

    Pure JVM expressions (shift + mask + posexplode); the only columns
    read are image_id and phash, so the binary payload never leaves the
    scan.
    """
    if HASH_BITS % band_bits:
        raise ValueError(f"band_bits must divide {HASH_BITS}: {band_bits}")
    n_bands = HASH_BITS // band_bits
    mask = (1 << band_bits) - 1
    slices = [
        F.shiftrightunsigned(F.col("phash"), i * band_bits)
         .bitwiseAND(F.lit(mask)) for i in range(n_bands)
    ]
    return images.select(
        "image_id", "phash",
        F.posexplode(F.array(*slices)).alias("band", "band_val"))


def phash_bucket_audit(bands: DataFrame,
                       max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """(band, band_val, n) for band buckets above the pairing cap --
    the images whose neighbors must come from a wider-band second pass."""
    return (bands.groupBy("band", "band_val")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > max_bucket))


def phash_neardup(images: DataFrame, max_dist: int = 3,
                  band_bits: int = 16,
                  max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """All image pairs within ``max_dist`` Hamming distance:
    (image_a, image_b, dist), image_a < image_b.

    Exact (equal to the brute-force quadratic join) whenever no bucket
    exceeds ``max_bucket``: banding guarantees recall for
    max_dist < n_bands (pigeonhole) and the popcount verify guarantees
    precision.  One hash shuffle on (band, band_val) + one distinct.
    """
    n_bands = HASH_BITS // band_bits
    if max_dist >= n_bands:
        raise ValueError(
            f"pigeonhole recall needs max_dist < {n_bands} bands of "
            f"{band_bits} bits: max_dist={max_dist}")
    bands = phash_bands(images, band_bits)
    # the band table is consumed three times (cap sizes + both sides of
    # the self-join) and Spark does not share non-exchange subtrees, so
    # each consumer would re-run the scan + slice projection; the table
    # is narrow (n_images x n_bands of int rows) -- materialize it once
    # (same cut as datapipe.dedup.candidate_pairs)
    if not bands.isStreaming:
        bands = bands.localCheckpoint(eager=True)
    sizes = bands.groupBy("band", "band_val").agg(F.count("*").alias("_n"))
    ok = sizes.where(F.col("_n") <= max_bucket).select("band", "band_val")
    # the cap table is one row per non-empty band bucket -- broadcast it
    # instead of letting the planner shuffle the band rows against it
    capped = bands.join(F.broadcast(ok), ["band", "band_val"])
    a = capped.select("band", "band_val",
                      F.col("image_id").alias("image_a"),
                      F.col("phash").alias("phash_a"))
    b = capped.select("band", "band_val",
                      F.col("image_id").alias("image_b"),
                      F.col("phash").alias("phash_b"))
    return (a.join(b, ["band", "band_val"])
            .where(F.col("image_a") < F.col("image_b"))
            .select("image_a", "image_b",
                    F.bit_count(F.col("phash_a").bitwiseXOR(
                        F.col("phash_b"))).cast("int").alias("dist"))
            .where(F.col("dist") <= max_dist)
            .distinct())


def resolve_pairs(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """Close (image_a, image_b) pairs transitively into dedup decisions:
    (image_id, cluster, n_members, keep) -- one row per image appearing
    in at least one pair; singletons are implicitly kept.

    cluster = MIN image_id of the connected component (near-duplication
    is not transitive, so pairs are closed with the distributed
    min-label/pointer-jumping CC); keep = True exactly for that
    canonical member, so ``where(~keep)`` is the drop list.

    Thin column-rename wrapper over
    :func:`terraspark.datapipe.dedup.dedup_clusters` (which also
    documents the checkpoint/iteration tuning) -- the CC resolution
    logic lives in one place; it is id-type-agnostic, so string image
    ids work unchanged.
    """
    from terraspark.datapipe.dedup import dedup_clusters
    out = dedup_clusters(
        pairs.select(F.col("image_a").alias("doc_a"),
                     F.col("image_b").alias("doc_b")), max_iter)
    return out.select(F.col("doc_id").alias("image_id"), "cluster",
                      "n_members", "keep")


def phash_dedup(images: DataFrame, max_dist: int = 3,
                band_bits: int = 16,
                max_bucket: int = DEFAULT_MAX_BUCKET,
                max_iter: int = 30) -> DataFrame:
    """Hamming-ball near-dup resolution: see :func:`resolve_pairs`."""
    return resolve_pairs(
        phash_neardup(images, max_dist, band_bits, max_bucket), max_iter)


def caption_edges(images: DataFrame) -> DataFrame:
    """Star edges linking every image to the canonical (MIN image_id)
    member of its exact-caption group: (image_a, image_b), a < b.

    A caption shared by k images induces k-1 star edges instead of the
    k(k-1)/2 clique -- identical connectivity for CC, linear instead of
    quadratic in group size, so a viral caption ('untitled', '') cannot
    explode a task the way a pair self-join would.  One groupBy + one
    broadcast-able join on the caption hub table.
    """
    hubs = images.groupBy("caption").agg(F.min("image_id").alias("image_a"))
    return (images.join(hubs, "caption")
            .where(F.col("image_id") != F.col("image_a"))
            .select("image_a", F.col("image_id").alias("image_b")))


def joint_dedup(images: DataFrame, max_dist: int = 3,
                band_bits: int = 16,
                max_bucket: int = DEFAULT_MAX_BUCKET,
                max_iter: int = 30) -> DataFrame:
    """Cross-modal dedup over image+caption pairs: an edge exists when
    EITHER the perceptual hashes are within ``max_dist`` OR the captions
    are bit-identical; components are closed over the union, so a
    re-captioned pixel-dup and a re-encoded caption-dup land in the same
    cluster (the standard web-corpus curation rule: near-dup in any
    modality = duplicate).
    """
    ph = phash_neardup(images, max_dist, band_bits, max_bucket) \
        .select("image_a", "image_b")
    cap = caption_edges(images.select("image_id", "caption"))
    return resolve_pairs(ph.unionByName(cap).distinct(), max_iter)
