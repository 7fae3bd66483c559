"""Apply the pre-registered in-basin trigger to the queue-1 avoidance
trainings and emit the planner model for queue 3 (RESULTS.md round-4
criterion 1).

Rule (registered before the runs): final train overshoot <= 0.010 marks
the basin; pick the in-basin run with the lowest test mse@8.  If ALL runs
trip the trigger, run ONE anneal-cycle rescue (+120 epochs, 0.3x restart)
on the lowest-overshoot run and use the rescued model regardless (the
attribution then applies to the strongest model this protocol produces).

Prints the chosen run dir on the LAST line (consumed by the queue script).
"""
import json
import glob
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def stats(run):
    ov, mse = None, None
    try:
        with open(f"{run}/metrics.jsonl") as f:
            for line in f:
                r = json.loads(line)
                if r.get("kind") == "train" and "overshoot" in r:
                    ov = r["overshoot"]
                if r.get("kind") == "eval" and "mse_final" in r:
                    mse = r["mse_final"]
    except FileNotFoundError:
        return None, None
    return ov, mse


def main():
    runs = sorted(glob.glob(os.path.join(REPO, "runs", "r4a_dense_s*")))
    runs = [r for r in runs if "_cyc" not in r]
    cands = []
    for r in runs:
        ov, mse = stats(r)
        if ov is None or mse is None:
            continue
        cands.append((r, ov, mse))
        print(f"[choose] {os.path.basename(r)}: overshoot {ov:.4f} "
              f"mse@8 {mse:.4f} {'BASIN' if ov <= 0.010 else 'plateau'}",
              flush=True)
    if not cands:
        print("[choose] no completed runs", flush=True)
        sys.exit(1)

    basin = [c for c in cands if c[1] <= 0.010]
    if basin:
        best = min(basin, key=lambda c: c[2])
        print(f"[choose] in-basin pick: {best[0]}", flush=True)
        print(os.path.relpath(best[0], REPO), flush=True)
        return

    # all tripped: pre-registered fallback = one rescue on the best run
    best = min(cands, key=lambda c: c[1])
    print(f"[choose] ALL plateaued; rescuing {best[0]}", flush=True)
    subprocess.run(["python", "scripts/anneal_cycle.py",
                    os.path.relpath(best[0], REPO), "120", "0.3"],
                   cwd=REPO, timeout=3600, check=False)
    rescued = os.path.relpath(best[0], REPO) + "_cyc120"
    if os.path.exists(os.path.join(REPO, rescued, "metrics.jsonl")):
        ov, mse = stats(os.path.join(REPO, rescued))
        print(f"[choose] rescued: overshoot {ov:.4f} mse@8 {mse:.4f}",
              flush=True)
        print(rescued, flush=True)
    else:
        print(os.path.relpath(best[0], REPO), flush=True)


if __name__ == "__main__":
    main()
