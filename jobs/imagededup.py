"""spark-submit job: image-corpus near-dup dedup (phash + captions).

Usage (north rule: ship the package with --py-files):

    python scripts/make_zip.py                       # -> dist/terraspark.zip
    spark-submit --master local[32] \\
        --py-files dist/terraspark.zip \\
        jobs/imagededup.py --images /path/to/images.parquet \\
        --out /tmp/imgdedup_out --max-dist 3 [--captions]

Pipeline: banded Hamming self-join on the 64-bit perceptual hash
(pigeonhole multi-index, bucket skew cap + audit) -> exact popcount
verify at --max-dist -> optionally UNION exact-caption star edges
(--captions) -> distributed connected components -> canonical-image
selection.  Only (image_id, phash[, caption]) is ever read -- the image
bytes stay in the parquet files (column pruning).  Writes:

    <out>/clusters.parquet   (image_id, cluster, n_members, keep)
    <out>/keep.parquet       canonical members of dup clusters
                             (singletons are implicitly kept -- apply as
                             an anti-join of ~keep rows)

and prints one JSON summary line.  Every stage is the library operator
the driver's correctness gate verifies (img_phash_neardup,
img_phash_dedup, img_joint_dedup); this job only composes them.
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="images parquet (image_id, ..., phash[, caption])")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-dist", type=int, default=3)
    ap.add_argument("--band-bits", type=int, default=16)
    ap.add_argument("--max-bucket", type=int, default=None)
    ap.add_argument("--captions", action="store_true",
                    help="also link images with bit-identical captions")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = SparkSession.builder.appName("terraspark-imagededup") \
        .getOrCreate()

    from terraspark import imagedup

    cols = ["image_id", "phash"] + (["caption"] if args.captions else [])
    images = spark.read.parquet(args.images).select(*cols)
    max_bucket = imagedup.DEFAULT_MAX_BUCKET \
        if args.max_bucket is None else args.max_bucket
    t0 = time.time()

    n_images = images.count()
    n_oversize = imagedup.phash_bucket_audit(
        imagedup.phash_bands(images.select("image_id", "phash"),
                             args.band_bits), max_bucket).count()
    pairs = imagedup.phash_neardup(images, args.max_dist, args.band_bits,
                                   max_bucket).select("image_a", "image_b")
    if args.captions:
        pairs = pairs.unionByName(imagedup.caption_edges(
            images.select("image_id", "caption"))).distinct()
    # materialize the pair plan ONCE: the count below, and the CC loop's
    # own checkpoint inside resolve_pairs, would otherwise each re-run
    # the banded shuffle + verify pipeline
    pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()

    clusters = imagedup.resolve_pairs(pairs)
    clusters.write.mode("overwrite").parquet(f"{args.out}/clusters.parquet")
    clusters_r = spark.read.parquet(f"{args.out}/clusters.parquet")
    clusters_r.where(F.col("keep")).select("image_id") \
        .write.mode("overwrite").parquet(f"{args.out}/keep.parquet")

    n_clustered = clusters_r.count()
    n_drop = clusters_r.where(~F.col("keep")).count()
    wall = time.time() - t0
    print(json.dumps({
        "n_images": n_images, "n_pairs": n_pairs,
        "n_clustered_images": n_clustered, "n_dropped": n_drop,
        "n_oversize_buckets": n_oversize, "max_dist": args.max_dist,
        "captions": bool(args.captions), "wall_sec": round(wall, 2),
        "images_per_sec": round(n_images / wall, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
