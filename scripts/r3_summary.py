"""Assemble round-3 experiment tables (markdown) from runs/.

Usage: python scripts/r3_summary.py
"""
import glob
import json
import os
import sys


def last_eval(run):
    evs = []
    try:
        with open(f"{run}/metrics.jsonl") as f:
            for line in f:
                r = json.loads(line)
                if r.get("kind") == "eval":
                    evs.append(r)
    except FileNotFoundError:
        return None
    return evs[-1] if evs else None


def basin_table():
    print("### Billiards basin levers (360 ep, fresh seeds 10-14)\n")
    print("| lever | seed | final epoch | mse@8 | vel_rms | basin (<=0.015) |")
    print("|---|---|---|---|---|---|")
    for lever, pat in (("linear->1%", "runs/r3a_bil_s*"),
                       ("linear->1% rerun", "runs/r3a2_bil_s*"),
                       ("cosine->1%", "runs/r3c_bil_s*"),
                       ("cosine->1% rerun", "runs/r3c2_bil_s*")):
        for d in sorted(glob.glob(pat)):
            e = last_eval(d)
            if e is None:
                continue
            seed = d.rsplit("_s", 1)[-1]
            done = e["epoch"] == 359
            mark = "yes" if (done and e["mse_final"] <= 0.015) else (
                "no" if done else "INCOMPLETE")
            print(f"| {lever} | {seed} | {e['epoch']} | "
                  f"{e['mse_final']:.4f} | {e['handoff_vel_rms']:.4f} "
                  f"| {mark} |")
    print()


def grav_table():
    p = "runs/grav_select.json"
    if not os.path.exists(p):
        return
    d = json.load(open(p))
    print("### Gravity stability (pre-registered selection; test half)\n")
    print("| run | sel step | val ratio | test mean ratio | test sampled "
          "ratio | test mse@8 | in-frame (m/s) |")
    print("|---|---|---|---|---|---|---|")
    for run, r in d.items():
        print(f"| {os.path.basename(run)} | {r['step']} | "
              f"{r['val_ratio']:.3f} | {r['test_ratio_mean']:.3f} | "
              f"{r['test_ratio_sampled']:.3f} | {r['test_mse8']:.4f} | "
              f"{r['test_in_frame_mean']:.2f}/"
              f"{r['test_in_frame_sampled']:.2f} |")
    print()


def budget_tables():
    for p in sorted(glob.glob("runs/plan_budget_sweep_*.json")):
        d = json.load(open(p))
        print(f"### Budget sweep {d['run']} ({d['episodes']} CRN eps)\n")
        print("| sims | frontier | model | oracle | paired gap +- SEM | "
              "random | wall s |")
        print("|---|---|---|---|---|---|---|")
        for sims, r in d["budgets"].items():
            print(f"| {sims} | {r['frontier']} | "
                  f"{r['model_mean_reward']:.2f} | "
                  f"{r['oracle_mean_reward']:.2f} | "
                  f"{r['model_oracle_gap_mean']:.2f} +- "
                  f"{r['model_oracle_gap_sem']:.2f} | "
                  f"{r['random_mean_reward']:.2f} | {r['wall_s']} |")
        print()


def lockstep_table():
    p = "runs/plan_lockstep_bench.json"
    if not os.path.exists(p):
        return
    d = json.load(open(p))
    print(f"### Lockstep vs serial ({d['episodes']} episodes): "
          f"serial {d['serial']['wall_s']}s vs lockstep "
          f"{d['lockstep']['wall_s']}s = {d['speedup']}x; identical "
          f"scores: {d['scores_identical']}\n")


def branch_tables():
    rows = []
    for p in sorted(glob.glob("runs/plan_branch_diag_*.json")):
        rows.append(json.load(open(p)))
    if not rows:
        return
    print("### Branch-value diagnostic (64 states x 9 actions x 16 CRN "
          "futures)\n")
    print("| model | regret/step | regret(random root) | spearman | "
          "AUC root | AUC depth 1..8 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        aucs = "/".join(f"{a:.2f}" for a in r["reward_auc_per_depth"])
        print(f"| {os.path.basename(r['run'])} | "
              f"{r['mean_regret_per_step']:.3f} | "
              f"{r['mean_regret_random_root']:.3f} | "
              f"{r['spearman_mean']:.2f} | {r['reward_auc_root']:.2f} | "
              f"{aucs} |")
    print()


if __name__ == "__main__":
    basin_table()
    grav_table()
    budget_tables()
    lockstep_table()
    branch_tables()
    sys.exit(0)
