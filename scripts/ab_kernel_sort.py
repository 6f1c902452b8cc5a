"""A/B probe: kernel stage with vs without the sortWithinPartitions +
zero-copy-view optimization (corrections.apply_corrections).

Interleaved pinned best-of (the only credible protocol on this host --
see BENCH/BASELINE.md throttle notes): for each round, each core level
runs variant A (sorted, the shipping default) and B (unsorted fallback)
back-to-back under the same taskset, so throttle drift hits both equally.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LEVELS = tuple(int(c) for c in
               os.environ.get("AB_LEVELS", "2,8").split(","))
ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))
N_IMAGES = os.environ.get("PROBE_IMAGES", "512")


def one(cores: int, sort_on: bool) -> float:
    env = dict(os.environ, PROBE_IMAGES=N_IMAGES, PROBE_REPS="2",
               PROBE_CORES=str(cores), PROBE_KERNELS_ONLY="1",
               TERRASPARK_SORT_KERNELS="1" if sort_on else "0")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable,
         os.path.join(HERE, "scale_probe.py")],
        capture_output=True, text=True, env=env, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("PROBE ")][-1]
    return json.loads(line[len("PROBE "):])["kernels_x11"]


def main():
    best = {}
    for rnd in range(ROUNDS):
        for c in LEVELS:
            for variant, sort_on in (("sorted", True), ("unsorted", False)):
                t = one(c, sort_on)
                key = (c, variant)
                best[key] = min(best.get(key, 1e9), t)
                print(f"round {rnd} cores {c} {variant}: {t}",
                      file=sys.stderr)
    res = {f"{c}_{v}": best[(c, v)] for (c, v) in best}
    for v in ("sorted", "unsorted"):
        lo, hi = LEVELS[0], LEVELS[-1]
        res[f"eff_{lo}to{hi}_{v}"] = round(
            (best[(lo, v)] / best[(hi, v)]) / (hi / lo), 3)
    print("AB " + json.dumps(res))


if __name__ == "__main__":
    main()
