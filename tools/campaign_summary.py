"""Summarize every committed training campaign into one JSON table.

Reads each logs/<experiment>/<run>/metrics.jsonl tracked in git (the
committed evidence set) and emits first/last/peak values of the headline
series, so a reviewer can audit campaign claims without re-parsing the
curves. Run from the repo root:

    python tools/campaign_summary.py [--out logs/campaigns.json]
"""

import argparse
import glob
import json
import os
import subprocess

HEADLINE = [
    "Train/mean_reward",
    "Train/mean_step_reward",
    "Train/mean_episode_length",
    "Train/mean_arm_reward",
    "Episode/terrain_level",
    "Episode/rew_tracking_lin_vel_x_l1",
    "Episode/term_timeout",
    "Episode/term_z",
    "Episode/term_roll",
    "Policy/leg_mean_noise_std",
    "Loss/arm_torques_loss",
]


def summarize(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn tail line of a live run
    if not rows:
        return None
    out = {"iters_logged": len(rows),
           "first_it": rows[0].get("it"), "last_it": rows[-1].get("it")}
    for k in HEADLINE:
        series = [(r.get("it"), r[k]) for r in rows
                  if isinstance(r.get(k), (int, float))]
        if not series:
            continue
        vals = [v for _, v in series]
        short = k.split("/")[-1]
        out[short] = {
            "first": round(series[0][1], 4), "last": round(series[-1][1], 4),
            "max": round(max(vals), 4), "min": round(min(vals), 4)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the summary JSON to this path")
    args = ap.parse_args()

    # the docstring's "committed evidence set" claim must hold: mark any
    # working-tree curve that is not tracked in git (ADVICE r4), so the
    # summary can't present uncommitted data as committed evidence
    tracked = set(subprocess.run(
        ["git", "ls-files", "logs/*/*/metrics.jsonl"],
        capture_output=True, text=True).stdout.split())
    table = {}
    for path in sorted(glob.glob("logs/*/*/metrics.jsonl")):
        _, experiment, run, _ = path.split(os.sep)
        s = summarize(path)
        if s is not None:
            if path not in tracked:
                s["UNTRACKED"] = True  # not in git: do not cite as evidence
            table[f"{experiment}/{run}"] = s
    text = json.dumps(table, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
