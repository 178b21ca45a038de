"""A/B probes on the scoring leg at one width: join strategy + shuffle
partitioning. Relative comparison under identical ambient conditions
(variants interleaved).

Usage: python tools/score_probe.py [width] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "base": {},
    "shj": {"SCORE_EXTRA_CONF": json.dumps(
        {"spark.sql.join.preferSortMergeJoin": "false"})},
    "shuf2x": {"SCORE_SHUFFLE": None},   # filled with 2*width
    "shj+shuf2x": {},                    # filled below
}


def run_leg(width: int, env_extra: dict, ctx: str) -> dict:
    env = dict(os.environ)
    env.update({
        "SCORE_INPUT_DIR": "/dev/shm/score_probe_input",
        "SCORE_CPUS": str(width),
        "SCORE_REPS": "2",
        "SPARK_GRAFT_DRIVER_MEM": f"{max(6, (3 * width) // 2)}g",
    })
    env.update({k: v for k, v in env_extra.items() if v is not None})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "score_leg.py")],
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(f"{ctx}: {out.stdout[-500:]}\n{out.stderr[-1000:]}")
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{ctx}: no JSON")


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    VARIANTS["shuf2x"] = {"SCORE_SHUFFLE": str(2 * width)}
    VARIANTS["shj+shuf2x"] = {
        "SCORE_SHUFFLE": str(2 * width),
        "SCORE_EXTRA_CONF": json.dumps(
            {"spark.sql.join.preferSortMergeJoin": "false"}),
    }

    input_dir = "/dev/shm/score_probe_input"
    if not os.path.isdir(f"{input_dir}/pairs"):
        env = dict(os.environ)
        env.update({"SCORE_INPUT_DIR": input_dir,
                    "SCORE_SF_DIR": "/root/testdata/sf0.1",
                    "SCORE_VARIANTS": "64", "SCORE_CPUS": "32",
                    "SPARK_GRAFT_DRIVER_MEM": "48g"})
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "score_prep.py")],
            env=env, capture_output=True, text=True, timeout=3600, cwd=REPO)
        print("prep:", out.stdout.strip().splitlines()[-1] if out.returncode == 0
              else out.stderr[-800:], flush=True)

    results: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for r in range(rounds):
        for name, extra in VARIANTS.items():
            res = run_leg(width, extra, f"{name} r{r}")
            results[name].append(res["pairs_scored_per_sec"])
            print(json.dumps({"round": r, "variant": name, **res}), flush=True)
    print(json.dumps({k: {"best": max(v), "all": [round(x, 1) for x in v]}
                      for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
