"""Measure the scoring job's throughput at several local[k] widths over the
SAME pre-staged input — picks the N→4N width pair for the gated legs and
documents how throughput scales across the whole width range on this host.

Usage: python tools/score_matrix.py [sf_dir] [variants] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WIDTHS = [4, 16, 8, 32]   # interleaved N/4N pairs: (4,16) and (8,32)


def run(script: str, env_extra: dict, ctx: str) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script)],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(f"{ctx}: rc={out.returncode}\n{out.stdout[-800:]}\n{out.stderr[-1200:]}")
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{ctx}: no JSON\n{out.stdout[-800:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    variants = sys.argv[2] if len(sys.argv) > 2 else "64"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    input_dir = os.path.join(base, "score_matrix_input")
    shutil.rmtree(input_dir, ignore_errors=True)
    prep = run("score_prep.py", {
        "SCORE_INPUT_DIR": input_dir, "SCORE_SF_DIR": sf_dir,
        "SCORE_VARIANTS": variants, "SCORE_CPUS": "32",
        "SPARK_GRAFT_DRIVER_MEM": "48g",
    }, "prep")
    print(json.dumps({"prep": prep}), flush=True)

    legs: dict[int, list[float]] = {w: [] for w in WIDTHS}
    colds: dict[int, list[float]] = {w: [] for w in WIDTHS}
    try:
        for r in range(rounds):
            for w in WIDTHS:
                res = run("score_leg.py", {
                    "SCORE_INPUT_DIR": input_dir,
                    "SCORE_CPUS": str(w),
                    "SCORE_REPS": "2",
                    "SPARK_GRAFT_DRIVER_MEM": f"{max(6, (3 * w) // 2)}g",
                }, f"leg {w} round {r}")
                legs[w].append(res["pairs_scored_per_sec"])
                colds[w].append(res["score_cold_sec"])
                print(json.dumps({"round": r, "width": w, **res}), flush=True)
    finally:
        shutil.rmtree(input_dir, ignore_errors=True)

    summary = {}
    for w in WIDTHS:
        summary[w] = {"best": max(legs[w]), "median": statistics.median(sorted(legs[w])),
                      "all": [round(v, 1) for v in legs[w]]}
    for n, m in ((4, 16), (8, 32)):
        summary[f"eff_{n}_{m}_best"] = round(summary[m]["best"] / summary[n]["best"] / 4, 3)
        summary[f"eff_{n}_{m}_median"] = round(
            summary[m]["median"] / summary[n]["median"] / 4, 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
