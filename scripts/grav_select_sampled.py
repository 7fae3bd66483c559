"""Sampled-aware gravity checkpoint selection — pre-registered ablation.

Pre-registration (RESULTS.md "sampled-aware checkpoint selection
ablation"): among checkpoints with val mean-rollout ratio in [0.8, 1.2],
take the top 6 by |log mean ratio|, run the standard 4-temperature val
sampled sweep on each, select the (step, temp) minimizing
|log mean ratio| + |log sampled ratio|; fall back to the mean-only rule
(scripts/grav_select.py) if no checkpoint has mean ratio in band.
Report held-out TEST-half metrics at the chosen (step, temp).

Zero training cost: runs purely over committed checkpoints.

Usage: python scripts/grav_select_sampled.py runs/r4rp_grav_s30 [...]
"""
import glob
import json
import os
import sys

OUT = "artifacts/r5/grav_select_sampled.json"

import jax

try:  # persistent compile cache (shared with the planning scripts)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from stove_tpu.envs import data as data_lib  # noqa: E402
from stove_tpu.models.bundle import StoveModel  # noqa: E402
from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402
from stove_tpu.train import evaluate as eval_lib  # noqa: E402

TEMPS = (1.0, 0.7, 0.5, 0.35)
TOP_K = 6


def main():
    runs = sys.argv[1:]
    results = {}
    for run in runs:
        cfg = ckpt_lib.load_config(run)
        model = StoveModel(cfg)
        tpl = {"params": model.init_params()}
        test_ep = data_lib.ensure_dataset(cfg, "test")
        n_val = test_ep.frames.shape[0] // 2
        val_ep = jax.tree_util.tree_map(lambda x: x[:n_val], test_ep)
        held_ep = jax.tree_util.tree_map(lambda x: x[n_val:], test_ep)

        # Stage 1: val mean-rollout ratio for every checkpoint (same keys
        # as grav_select.py so the mean-only baseline is reproduced).
        cands = []
        for ck in sorted(glob.glob(os.path.join(run, "ckpt_*.npz"))):
            step = int(os.path.basename(ck).split("_")[1].split(".")[0])
            _, loaded = ckpt_lib.restore(run, tpl, step=step)
            params = loaded["params"]
            lh = eval_lib.longhorizon_metrics(
                model, params, val_ep, jax.random.key(101), t_pred=80)
            ratio = float(lh["speed_ratio"])
            cands.append({"step": step, "val_ratio_mean": ratio,
                          "mean_score": abs(np.log(max(ratio, 1e-6))),
                          "params": params})
            print(f"[{run}] step {step}: val mean ratio {ratio:.3f}",
                  flush=True)

        in_band = [c for c in cands
                   if 0.8 <= c["val_ratio_mean"] <= 1.2]
        fallback = not in_band
        pool = (sorted(in_band, key=lambda c: c["mean_score"])[:TOP_K]
                if in_band
                else [min(cands, key=lambda c: c["mean_score"])])

        # Stage 2: 4-temp val sampled sweep on the pool; combined score.
        best = None
        for c in pool:
            for t in TEMPS:
                m_t = StoveModel(cfg.with_overrides(rollout_sigma_temp=t))
                v = eval_lib.longhorizon_metrics(
                    m_t, c["params"], val_ep, jax.random.key(505),
                    t_pred=80, sample=True)
                vr = float(v["speed_ratio"])
                samp_score = abs(np.log(max(vr, 1e-6)))
                comb = c["mean_score"] + samp_score
                print(f"[{run}] step {c['step']} temp {t}: "
                      f"val sampled ratio {vr:.3f} combined {comb:.4f}",
                      flush=True)
                if best is None or comb < best["combined_score"]:
                    best = {"step": c["step"], "temp": t,
                            "val_ratio_mean": c["val_ratio_mean"],
                            "val_ratio_sampled": vr,
                            "combined_score": comb,
                            "params": c["params"]}

        # Held-out test metrics at the chosen (step, temp) — same keys as
        # grav_select.py so numbers are directly comparable.
        params = best.pop("params")
        m_t = StoveModel(cfg.with_overrides(rollout_sigma_temp=best["temp"]))
        lh_m = eval_lib.longhorizon_metrics(
            model, params, held_ep, jax.random.key(202), t_pred=80)
        lh_s = eval_lib.longhorizon_metrics(
            m_t, params, held_ep, jax.random.key(303), t_pred=80,
            sample=True)
        rm = eval_lib.rollout_metrics(model, params, held_ep,
                                      jax.random.key(404))
        results[run] = {
            **best,
            "fallback_mean_only": fallback,
            "test_ratio_mean": float(lh_m["speed_ratio"]),
            "test_in_frame_mean": float(lh_m["frac_in_frame"]),
            "test_ratio_sampled_calib": float(lh_s["speed_ratio"]),
            "test_in_frame_sampled_calib": float(lh_s["frac_in_frame"]),
            "test_mse8": float(rm["mse_final"]),
        }
        print(f"[{run}] SELECTED step {best['step']} temp {best['temp']}: "
              f"test mean {results[run]['test_ratio_mean']:.3f} "
              f"sampled@temp {results[run]['test_ratio_sampled_calib']:.3f} "
              f"mse@8 {results[run]['test_mse8']:.4f}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
