"""One-off: interleaved pinned 2<->8 probe at 1024 images (fixed-cost
amortization evidence for BENCH/BASELINE.md; does NOT rewrite the doc)."""
import json
import os
import subprocess
import sys

LEVELS = (2, 8)
ROUNDS = int(os.environ.get("SCALE_ROUNDS", "2"))
N_IMAGES = int(os.environ.get("TERRASPARK_SCALE_IMAGES", "1024"))
PHASES = ("decode_tile", "dem_features", "scalar_stats", "kernels_x11")


def one(cores: int) -> dict:
    env = dict(os.environ, PROBE_IMAGES=str(N_IMAGES), PROBE_REPS="2",
               PROBE_CORES=str(cores))
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable,
         os.path.join(os.path.dirname(__file__), "scale_probe.py")],
        capture_output=True, text=True, env=env, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("PROBE ")][-1]
    return json.loads(line[len("PROBE "):])


best = {}
for rnd in range(ROUNDS):
    for c in LEVELS:
        r = one(c)
        if c not in best:
            best[c] = dict(r)
        else:
            for p in PHASES:
                best[c][p] = min(best[c][p], r[p])
        print(f"round {rnd} cores {c}: {r}", flush=True)

total = {c: round(sum(best[c][p] for p in PHASES), 2) for c in LEVELS}
eff = round((total[2] / total[8]) / 4.0, 3)
keff = round((best[2]["kernels_x11"] / best[8]["kernels_x11"]) / 4.0, 3)
per_phase = {p: round((best[2][p] / best[8][p]) / 4.0, 3) for p in PHASES}
print(json.dumps({"n_images": N_IMAGES, "best": best, "total": total,
                  "eff_2_8": eff, "kernel_eff_2_8": keff,
                  "per_phase_eff": per_phase}))
