"""Third-stage probe: validate the ROUND-4 sampled-path fixes on silicon.

Round-3 shipped the fused rollout kernel validated only on the MEAN path;
the advisor then found the sampled path broken (signed-shift Box-Muller:
std 3.83 normals with a 7.4σ atom) plus a rollout_sigma_temp divergence
vs XLA and a small-batch padding crash.  This probe checks, on the real
chip:

1. kernel-PRNG Box-Muller moments (mean ~0, std ~1, no >6.5σ atom)
2. sampled-rollout dispersion parity vs the XLA path (same cfg incl.
   rollout_sigma_temp<1): per-step state std across noise realizations
   must match within ~10% (different PRNG, same injected sigma)
3. the small-batch pallas leaf-eval path (n=36 < block=256: the padding
   bug made rollout_act raise) via LearnedSimulator.evaluate

Writes runs/pallas_rollout_probe3.json.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from stove_tpu.config import Config  # noqa: E402
from stove_tpu.models import stove as stove_lib  # noqa: E402
from stove_tpu.ops import pallas_rollout as pr  # noqa: E402

OUT = "/root/repo/runs/pallas_rollout_probe3.json"
RES = {}


def rec(k, v):
    RES[k] = v
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(f"[probe3] {k}: {v}", flush=True)


def main():
    rec("device", str(jax.devices()[0]))

    # ---- 1. kernel Box-Muller moments -----------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_moments(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        o_ref[:] = pr._normals(o_ref.shape)

    draws = pl.pallas_call(
        k_moments,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32),
    )(jnp.asarray([13], jnp.int32))
    x = np.asarray(draws).ravel()
    rec("normals_mean", float(x.mean()))
    rec("normals_std", float(x.std()))
    rec("normals_frac_gt5", float((np.abs(x) > 5.0).mean()))
    rec("normals_max_abs", float(np.abs(x).max()))
    ok = (abs(x.mean()) < 0.01 and abs(x.std() - 1.0) < 0.01
          and (np.abs(x) > 6.5).sum() == 0)
    rec("normals_ok", bool(ok))

    # ---- 2. sampled dispersion parity vs XLA (with sigma temp) ----------
    cfg = Config().with_overrides(open_loop_sigma=True, overshoot_k=4,
                                  rollout_sigma_temp=0.5)
    specs = stove_lib.make_specs(jax.random.key(0), cfg)
    params = stove_lib.init_params(jax.random.key(1), cfg, specs)
    w = params["dynamics"]["out"][-1]["w"]
    params["dynamics"]["out"][-1]["w"] = 0.01 * jax.random.normal(
        jax.random.key(5), w.shape)

    B, H = 2048, 16
    z0_one = 0.1 * jax.random.normal(
        jax.random.key(2), (1, cfg.num_obj, cfg.full_state_dim))
    z0 = jnp.tile(z0_one, (B, 1, 1))  # same start; dispersion = noise only

    ref_s, _ = stove_lib.rollout(params, cfg, z0, None, H,
                                 jax.random.key(3), sample=True)
    got_s = pr.rollout_pallas(params["dynamics"], cfg, z0, H, seed=7,
                              sample=True, block=256)
    # per-step std over the batch (pure noise dispersion), pos+vel dims
    ref_disp = np.asarray(jnp.std(ref_s[..., 2:6], axis=0)).mean(axis=(1, 2))
    got_disp = np.asarray(jnp.std(got_s[..., 2:6], axis=0)).mean(axis=(1, 2))
    ratio = got_disp / np.maximum(ref_disp, 1e-9)
    rec("dispersion_ratio_by_step", [round(float(r), 4) for r in ratio])
    rec("dispersion_ratio_final", float(ratio[-1]))
    rec("dispersion_ok", bool(0.9 < float(ratio[-1]) < 1.1))

    # temp actually folds in: temp=1 run must be ~2x the temp=0.5 run at
    # step 0 (before compounding takes over)
    cfg1 = cfg.with_overrides(rollout_sigma_temp=1.0)
    got1 = pr.rollout_pallas(params["dynamics"], cfg1, z0, H, seed=7,
                             sample=True, block=256)
    d1 = float(jnp.std(got1[:, 0, :, 2:6] - z0[:, None][:, 0, :, 2:6]))
    d05 = float(jnp.std(got_s[:, 0, :, 2:6] - z0[:, None][:, 0, :, 2:6]))
    rec("temp_fold_ratio_step0", round(d1 / max(d05, 1e-12), 3))

    # ---- 3. small-batch pallas leaf eval (padding-bug regression) -------
    from stove_tpu.models.bundle import StoveModel
    from stove_tpu.planning.simulators import LearnedSimulator

    cfg_p = Config().with_overrides(
        task="avoidance", action_conditioned=True, reward_head=True,
        mcts_rollout_impl="pallas", mcts_eval_samples=1)
    model = StoveModel(cfg_p)
    p2 = model.init_params()
    sim = LearnedSimulator(model, p2)
    z36 = 0.1 * jax.random.normal(
        jax.random.key(9), (36, cfg_p.num_obj, cfg_p.full_state_dim))
    t0 = time.time()
    vals = sim.evaluate(z36, jax.random.key(10), 8)
    vals.block_until_ready()
    rec("smallbatch_eval_ok", bool(np.isfinite(np.asarray(vals)).all()))
    rec("smallbatch_eval_s", round(time.time() - t0, 1))

    print("[probe3] done", flush=True)


if __name__ == "__main__":
    main()
