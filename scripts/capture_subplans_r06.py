"""Capture .explain('formatted') for the INTERNAL stage frames of the
operators optimized in round 6 -- the registry-level frames of iterative/
checkpointing operators degenerate to `Scan ExistingRDD` (the work already
ran during construction), so the evidence plans are captured one level
down, pre-materialization.

Usage: python scripts/capture_subplans_r06.py <outdir> <suffix>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    from pyspark.sql import functions as F
    from terraspark.session import build_session
    spark = build_session("capture-subplans")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding")

    from terraspark.datapipe import dedup, similarity

    plans = {}
    plans["minhash_shingle_signature"] = explain(
        dedup.minhash_shingle_signature(docs, k=5, seeds=12))
    # SRP near-dup: full pair plan (banding + verify) is lazy end to end
    plans["srp_neardup_pairs"] = explain(
        similarity.srp_neardup_pairs(emb, dim=64))
    # IVF-cell near-dup pair legs (the quadratic verify stage)
    plans["ivf_neardup_pairs"] = explain(
        similarity.neardup_pairs(emb, threshold=0.8, n_centroids=8))

    from terraspark import imagedup
    import bench
    data_dir = bench.ensure_bench_tables(
        int(os.environ.get("TERRASPARK_BENCH_IMAGES", "512")))
    images = spark.read.parquet(f"{data_dir}/images.parquet") \
        .select("image_id", "phash")
    plans["phash_neardup"] = explain(imagedup.phash_neardup(images, 3))

    # image pipeline joined-table plan (pre-pin): broadcast DEM join
    from terraspark.pipeline import TopoEngine
    scenes = spark.read.parquet(f"{data_dir}/scenes.parquet")
    dem_df = spark.read.parquet(f"{data_dir}/dem.parquet")
    full = spark.read.parquet(f"{data_dir}/images.parquet")
    eng = TopoEngine(spark)
    tiles = eng.tiles(full, scenes)
    from terraspark import corrections, dem as demmod
    feats = eng._features
    if feats is None:
        try:
            feats = demmod.derive_features(dem_df, eng.params, eng.tile,
                                           emit_aspect=False)
        except TypeError:   # round-start code has no emit_aspect
            feats = demmod.derive_features(dem_df, eng.params, eng.tile)
    plans["image_joined"] = explain(
        corrections.join_dem(tiles, feats, True))

    for name, plan in plans.items():
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
