"""Machine-ceiling probe: the SAME numpy kernel math, NO Spark.

Runs the 11-method correction kernels (terraspark.kernels, the exact
functions the engine's mapInPandas stage calls) over identical synthetic
tile arrays in a multiprocessing pool of N pinned workers, N in (1, 2, 8,
32).  There is no JVM, no Arrow, no shuffle, no Python<->JVM boundary --
each worker is a pure numpy loop on its own pre-built input.  If THIS
sub-scales from 2 -> 8 workers the same way the Spark kernel stage does,
the efficiency loss is the box's shared DRAM/CPU ceiling, not the engine:
on a real cluster each 4x-executor step brings 4x DRAM bandwidth with it.

Usage: taskset is applied per level inside the script.
Prints one JSON line: {workers: {n: tiles_per_sec}, efficiency: {...}}.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILES_PER_WORKER = int(os.environ.get("BW_TILES", "2048"))
TILE = 64


def worker_loop(n_tiles: int) -> float:
    """One worker: run all 11 kernels over n_tiles synthetic tiles.
    Returns elapsed seconds.  Mirrors corrections._correct_batches's
    per-group shape (one vectorized kernel call over a group of tiles)."""
    import numpy as np

    from terraspark.config import METHODS, CorrectionParams
    from terraspark.kernels import apply_correction

    params = CorrectionParams()
    rng = np.random.default_rng(7)
    group = 64                                    # tiles per kernel call
    dn = rng.uniform(1.0, 1000.0, (group, TILE * TILE)).astype(np.float32)
    lum = rng.uniform(0.0, 1.0, (group, TILE * TILE)).astype(np.float32)
    slope = rng.uniform(0.0, 1.2, (group, TILE * TILE)).astype(np.float32)
    sc = {"reg_intercept": 10.0, "reg_slope": 500.0, "c": 0.02, "k": 0.7,
          "pbc_c": 50.0, "band_mean": 480.0, "lum_mean": 0.55}

    t0 = time.time()
    for _ in range(max(1, n_tiles // group)):
        for m in METHODS:
            apply_correction(m, "img", 0, dn, lum, slope, sc, params)
    return time.time() - t0


def run_level(n_workers: int) -> dict:
    """Spawn n_workers pinned processes, each doing TILES_PER_WORKER tiles.
    Aggregate throughput = total tiles / wall."""
    from multiprocessing import Pool

    t0 = time.time()
    with Pool(n_workers) as pool:
        pool.map(worker_loop, [TILES_PER_WORKER] * n_workers)
    wall = time.time() - t0
    tiles = TILES_PER_WORKER * n_workers * 11
    return {"workers": n_workers, "wall_sec": round(wall, 2),
            "tiles_per_sec": round(tiles / wall, 1),
            "per_worker_tps": round(tiles / wall / n_workers, 1)}


def main():
    if os.environ.get("BW_LEVEL"):
        # child invocation, already under taskset
        print("LEVEL " + json.dumps(run_level(int(os.environ["BW_LEVEL"]))))
        return
    levels = (1, 2, 8, 32)
    rounds = int(os.environ.get("BW_ROUNDS", "2"))
    best = {}
    for _ in range(rounds):
        for n in levels:
            env = dict(os.environ, BW_LEVEL=str(n))
            out = subprocess.run(
                ["taskset", "-c", f"0-{n - 1}", sys.executable,
                 os.path.abspath(__file__)],
                capture_output=True, text=True, env=env, check=True)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("LEVEL ")][-1]
            r = json.loads(line[len("LEVEL "):])
            if n not in best or r["tiles_per_sec"] > best[n]["tiles_per_sec"]:
                best[n] = r
            print(f"workers {n}: {r}", file=sys.stderr)

    def eff(lo, hi):
        return round((best[hi]["tiles_per_sec"] / best[lo]["tiles_per_sec"])
                     / (hi / lo), 3)

    print(json.dumps({
        "levels": {str(n): best[n] for n in levels},
        "efficiency": {"1->2": eff(1, 2), "2->8": eff(2, 8),
                       "8->32": eff(8, 32)},
        "note": "pure numpy, no Spark: the machine's own scaling ceiling "
                "for the exact kernel math",
    }))


if __name__ == "__main__":
    main()
