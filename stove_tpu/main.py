"""Experiment entry point: `python -m stove_tpu.main key=value ...`.

Reference parity [ref: model/main.py; SURVEY.md §3.2, §3.5]: builds the
config from defaults ⊕ `key=value` CLI overrides, seeds the RNG, creates the
run directory (config serialized into it), and dispatches train /
restore-and-resume / eval / planning.

Special keys (beyond Config fields):
    preset=<name>   apply a named preset from stove_tpu.config.PRESETS
    mode=<m>        train (default) | eval | mcts | generate
    restore=<dir>   resume from a run directory (config loaded from it)

Examples:
    python -m stove_tpu.main preset=stove_billiards
    python -m stove_tpu.main preset=stove_avoidance batch_size=128
    python -m stove_tpu.main restore=runs/stove_bil mode=eval
    python -m stove_tpu.main preset=mcts_avoidance mode=mcts
"""

from __future__ import annotations

import sys
from typing import List, Optional

import jax
import numpy as np

from stove_tpu.config import Config, make_config


def build_config(argv: List[str]) -> tuple:
    """Split CLI tokens into (config, mode)."""
    mode = "train"
    preset: Optional[str] = None
    overrides: List[str] = []
    restore: Optional[str] = None
    for tok in argv:
        key, _, val = tok.partition("=")
        if key == "mode":
            mode = val
        elif key == "preset":
            preset = val
        elif key == "restore":
            restore = val
        else:
            overrides.append(tok)

    if restore is not None:
        from stove_tpu.train import checkpoint as ckpt_lib
        cfg = ckpt_lib.load_config(restore)
        cfg = cfg.with_overrides(*overrides, restore=restore)
    else:
        cfg = make_config(preset, *overrides)
    return cfg, mode


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg, mode = build_config(argv)
    np.random.seed(cfg.seed)

    if mode == "generate":
        from stove_tpu.envs import data as data_lib
        for split in ("train", "test"):
            ep = data_lib.ensure_dataset(cfg, split)
            print(f"{split}: frames {tuple(ep.frames.shape)} -> "
                  f"{data_lib.dataset_path(cfg, split)}")
        return 0

    if mode == "train":
        from stove_tpu.train.trainer import Trainer
        trainer = Trainer(cfg)
        result = trainer.train()
        print("final:", {k: v for k, v in result.items()
                         if not isinstance(v, list)})
        return 0

    if mode == "eval":
        from stove_tpu.envs import data as data_lib
        from stove_tpu.train import checkpoint as ckpt_lib
        from stove_tpu.train import evaluate as eval_lib
        from stove_tpu.models.bundle import StoveModel

        if cfg.restore is None:
            raise SystemExit("mode=eval requires restore=<run_dir>")
        model = StoveModel(cfg)
        params_tpl = model.init_params()
        _, loaded = ckpt_lib.restore(cfg.restore, {"params": params_tpl},)
        test_ep = data_lib.ensure_dataset(cfg, "test")
        m = eval_lib.rollout_metrics(model, loaded["params"], test_ep,
                                     jax.random.key(cfg.seed))
        m.update({f"longhorizon_{k}": v for k, v in
                  eval_lib.longhorizon_metrics(
                      model, loaded["params"], test_ep,
                      jax.random.key(cfg.seed + 1), t_pred=80).items()})
        m.update({f"longhorizon_sampled_{k}": v for k, v in
                  eval_lib.longhorizon_metrics(
                      model, loaded["params"], test_ep,
                      jax.random.key(cfg.seed + 2), t_pred=80,
                      sample=True).items()})
        m.update(eval_lib.baseline_metrics(cfg, test_ep))
        for k, v in m.items():
            print(f"{k}: {np.asarray(v)}")
        return 0

    if mode == "viz":
        # render a conditioned rollout from a trained checkpoint:
        # true | predicted gif + detection frame grid (reference gif dumps)
        import numpy as _np

        from stove_tpu.envs import data as data_lib
        from stove_tpu.models.bundle import StoveModel
        from stove_tpu.models.dynamics import POS, SIZE
        from stove_tpu.train import checkpoint as ckpt_lib
        from stove_tpu.train import visualize as viz

        if cfg.restore is None:
            raise SystemExit("mode=viz requires restore=<run_dir>")
        model = StoveModel(cfg)
        _, loaded = ckpt_lib.restore(cfg.restore, {"params": model.init_params()})
        params = loaded["params"]
        ep = data_lib.ensure_dataset(cfg, "test")
        t_cond, t_pred = cfg.window, cfg.eval_rollout_steps
        frames = data_lib.normalize_frames(ep.frames[:1, :t_cond])
        k_inf, k_roll = jax.random.split(jax.random.key(cfg.seed))
        inf = model.infer(params, frames, ep.actions[:1, :t_cond], k_inf)
        states, _ = model.rollout(
            params, inf.z_mean[:, -1],
            ep.actions[:1, t_cond - 1:t_cond - 1 + t_pred], k_roll,
            horizon=t_pred, sample=False)
        true = data_lib.normalize_frames(
            ep.frames[0, t_cond:t_cond + t_pred])
        gif = viz.dump_rollout_gif(cfg, cfg.restore, "viz",
                                   _np.asarray(true),
                                   _np.asarray(states[0, :, :, POS]),
                                   pred_sizes=_np.asarray(
                                       states[0, :, :, SIZE]))
        boxes = _np.concatenate([_np.asarray(inf.z[0, :, :, SIZE]),
                                 _np.asarray(inf.z[0, :, :, POS])], -1)
        grid = viz.frame_grid(
            f"{cfg.restore}/detect_grid.png",
            _np.asarray(data_lib.normalize_frames(ep.frames[0, :t_cond])),
            boxes)
        print(f"wrote {gif}\nwrote {grid}")
        return 0

    if mode == "profile":
        from stove_tpu.utils.profiling import profile_train_steps
        out = profile_train_steps(cfg)
        print(f"trace written to {out}")
        return 0

    if mode == "mcts":
        from stove_tpu.planning import runner
        result = runner.run_planning(cfg)
        print("planning:", result)
        return 0

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    sys.exit(main())
