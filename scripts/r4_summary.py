"""Assemble round-4 experiment tables (markdown) from runs/.

Usage: python scripts/r4_summary.py
"""
import glob
import json
import os

REPO = os.path.join(os.path.dirname(__file__), "..")


def rows(run, kind):
    out = []
    try:
        with open(f"{run}/metrics.jsonl") as f:
            for line in f:
                r = json.loads(line)
                if r.get("kind") == kind:
                    out.append(r)
    except FileNotFoundError:
        pass
    return out


def basin_avoidance_table():
    print("### Basin-protocol avoidance planners (queue 1)\n")
    print("| run | final epoch | mse@8 | train overshoot (last) | "
          "reward AUC | in basin (ov<=0.010) |")
    print("|---|---|---|---|---|---|")
    for d in sorted(glob.glob(f"{REPO}/runs/r4a_dense_s*")):
        evs, trs = rows(d, "eval"), rows(d, "train")
        if not evs or not trs:
            continue
        e, t = evs[-1], trs[-1]
        ov = t.get("overshoot", float("nan"))
        print(f"| {os.path.basename(d)} | {e.get('epoch')} | "
              f"{e.get('mse_final', float('nan')):.4f} | {ov:.4f} | "
              f"{e.get('reward_auc', float('nan')):.3f} | "
              f"{'yes' if ov <= 0.010 else 'no'} |")
    print()


def sweep_table(path, title):
    p = f"{REPO}/runs/{path}"
    if not os.path.exists(p):
        return
    d = json.load(open(p))
    print(f"### {title}  ({d['run']}, {d['episodes']} episodes)\n")
    print("| budget | lambda | model | paired gap +- SEM | 95% CI |")
    print("|---|---|---|---|---|")
    for b, entry in d["budgets"].items():
        for lam, r in entry["lambdas"].items():
            lo = r["gap_mean"] - 1.96 * r["gap_sem"]
            hi = r["gap_mean"] + 1.96 * r["gap_sem"]
            print(f"| {b} | {lam} | {r['model_mean']:.2f} | "
                  f"{r['gap_mean']:.2f} +- {r['gap_sem']:.2f} | "
                  f"[{lo:.2f}, {hi:.2f}] |")
        print(f"| {b} | oracle | {entry['oracle_mean']:.2f} | "
              f"random {entry['random_mean']:.2f} | |")
    print()


def gravity_table():
    p = f"{REPO}/runs/grav_select_r4.json"
    if not os.path.exists(p):
        return
    d = json.load(open(p))
    print("### Gravity multi-horizon sigma (queue 2, grav_select_r4)\n")
    print("| run | sel. step | mean ratio | sampled RAW | "
          "sampled calib (temp) | mse@8 |")
    print("|---|---|---|---|---|---|")
    for run, r in d.items():
        calib = (f"{r.get('test_ratio_sampled_calib', float('nan')):.3f} "
                 f"({r.get('calib_temp', '-')})")
        print(f"| {os.path.basename(run)} | {r.get('step')} | "
              f"{r.get('test_ratio_mean', float('nan')):.3f} | "
              f"{r.get('test_ratio_sampled', float('nan')):.3f} | {calib} | "
              f"{r.get('test_mse8', float('nan')):.4f} |")
    print()


def restart_tables():
    for task in ("billiards", "gravity"):
        p = f"{REPO}/runs/restart_protocol_{task}.json"
        if not os.path.exists(p):
            continue
        d = json.load(open(p))
        print(f"### Restart protocol — {task} (queue 4)\n")
        print("| slot | attempts (seed: trigger, tripped) | final run | "
              "restarts |")
        print("|---|---|---|---|")
        for slot, e in sorted(d.items()):
            att = "; ".join(
                f"s{a['seed']}: {a['trigger_value']:.4f}"
                f"{' TRIP' if a['tripped'] else ''}"
                for a in e["attempts"])
            print(f"| {slot} | {att} | {e.get('final_run')} | "
                  f"{e.get('restarts_used', '-')} |")
        print()


def rescue_table():
    print("### Anneal-cycle rescue evidence (queue 4)\n")
    print("| run | before mse@8 | after mse@8 | rescued (<=0.015) |")
    print("|---|---|---|---|")
    for base in ("r2a_bil_seed2", "r2a_bil_seed4", "r2f_bil_seed1"):
        pre = rows(f"{REPO}/runs/{base}", "eval")
        post = rows(f"{REPO}/runs/{base}_cyc120", "eval")
        if not pre or not post:
            continue
        b, a = pre[-1]["mse_final"], post[-1]["mse_final"]
        print(f"| {base} | {b:.4f} | {a:.4f} | "
              f"{'yes' if a <= 0.015 else 'no'} |")
    print()


def phase_table():
    p = f"{REPO}/runs/phase_bench.json"
    if not os.path.exists(p):
        return
    d = json.load(open(p))
    print("### Phase bench (fused-likelihood measurement)\n")
    for k, v in d.items():
        print(f"- {k}: {v}")
    print()


if __name__ == "__main__":
    basin_avoidance_table()
    for tag, title in (("_fine80", "fine-lambda leaf"),
                       ("_tree80", "tree-mode"),
                       ("_l60_80", "lambda 0.60 CI arm")):
        for d in sorted(glob.glob(f"{REPO}/runs/plan_shrink_sweep_*{tag}.json")):
            sweep_table(os.path.basename(d),
                        f"{title} [{os.path.basename(d)}]")
    gravity_table()
    restart_tables()
    rescue_table()
    phase_table()
