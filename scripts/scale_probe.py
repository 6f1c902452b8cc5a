"""Per-phase scaling probe: best-of-N timings at local[8] vs local[32].

Isolates which pipeline phase fails to scale: decode/tile, DEM halo
features, scalar stats, kernel map.  Run exclusively (no other Spark jobs).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PROBE_IMAGES", "512"))
REPS = int(os.environ.get("PROBE_REPS", "3"))


def probe(cores: int) -> dict:
    from terraspark.session import build_session
    from terraspark.pipeline import TopoEngine
    from terraspark import corrections
    from terraspark.config import METHODS

    spark = build_session(f"probe{cores}", cores=cores, shuffle_partitions=64,
                          max_partition_bytes="8m")
    d = f"/tmp/terraspark_bench/n{N}"
    images = spark.read.parquet(f"{d}/images.parquet")
    scenes = spark.read.parquet(f"{d}/scenes.parquet")
    dem = spark.read.parquet(f"{d}/dem.parquet")
    eng = TopoEngine(spark)

    out = {}

    def best(name, fn):
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        out[name] = round(min(ts), 2)

    kernels_only = os.environ.get("PROBE_KERNELS_ONLY") == "1"

    tiles = eng.tiles(images, scenes)
    if not kernels_only:
        best("decode_tile", lambda: tiles.count())

        feats_fresh = lambda: eng.dem_features(dem, persist=False).count()
        best("dem_features", feats_fresh)

    joined = eng.joined(images, scenes, dem)
    joined.count()          # materialize persist once (excluded)
    # never-collect scalar path -- the engine default and what bench.py
    # times (r1 verdict: one protocol everywhere)
    if not kernels_only:
        best("scalar_stats", lambda: eng.scalars_df(joined).count())
    sc = eng.scalars_df(joined).persist()
    sc.count()

    best("kernels_x11", lambda: corrections.apply_corrections(
        joined, sc, METHODS, eng.params, eng.tile).count())

    eng.unpersist()
    spark.stop()
    return out


if __name__ == "__main__":
    cores_env = os.environ.get("PROBE_CORES")
    if cores_env:
        # single pinned level (invoke under `taskset -c 0-(N-1)`)
        c = int(cores_env)
        print("PROBE " + json.dumps({"cores": c, **probe(c)}))
    else:
        res = {c: probe(c) for c in (8, 32)}
        eff = {k: round((res[8][k] / res[32][k]) / 4, 3) for k in res[8]}
        print(json.dumps({"local8": res[8], "local32": res[32],
                          "phase_efficiency": eff}))
