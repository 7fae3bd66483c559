"""Aggregate runs/*/metrics.jsonl into a final-eval summary table.

Usage: python scripts/summarize_runs.py [glob ...]
Groups runs whose names differ only by a _seedN suffix and reports
mean ± std across seeds (the honest way to compare configs: single-run
mse@8 at the 120-epoch budget spans ±2× with the seed — measured
m1_seed0/1/2 = 0.067/0.056/0.029 on identical configs).
"""
import glob
import json
import re
import sys
from collections import defaultdict


def last_eval(path):
    rec = None
    try:
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                if r.get("kind") == "eval":
                    rec = r
    except (FileNotFoundError, NotADirectoryError):
        return None
    return rec


def main(argv):
    pats = argv[1:] or ["runs/*"]
    rows = []
    for pat in pats:
        for d in sorted(glob.glob(pat)):
            r = last_eval(f"{d}/metrics.jsonl")
            if r is None:
                continue
            rows.append((d.split("/")[-1], r))
    groups = defaultdict(list)
    for name, r in rows:
        groups[re.sub(r"_(seed|s)\d+$", "", name)].append((name, r))
    for gname, members in groups.items():
        import numpy as np
        mse8 = np.array([m[1].get("mse_final", float("nan"))
                         for m in members])
        det = np.array([m[1].get("detect_mse", float("nan"))
                        for m in members])
        auc = [m[1].get("reward_auc") for m in members
               if m[1].get("reward_auc") is not None]
        extra = f"  auc={np.mean(auc):.3f}" if auc else ""
        tag = f"(n={len(members)})" if len(members) > 1 else ""
        print(f"{gname:24s} step={members[-1][1].get('step'):>6} "
              f"detect={det.mean():.6f}±{det.std():.6f} "
              f"mse8={mse8.mean():.4f}±{mse8.std():.4f}{extra} {tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
