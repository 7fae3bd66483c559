"""Post-hoc eval of saved checkpoints on CPU (adds metrics introduced after
the runs finished, e.g. handoff_vel_rms).

Usage: python scripts/posthoc_eval.py runs/m1_seed1 [more run dirs ...]
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from stove_tpu.config import Config  # noqa: E402
from stove_tpu.envs import data as data_lib  # noqa: E402
from stove_tpu.models.bundle import StoveModel  # noqa: E402
from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402
from stove_tpu.train import evaluate as eval_lib  # noqa: E402


def main(argv):
    for run in argv[1:]:
        base = {k: (tuple(v) if isinstance(v, list) else v)
                for k, v in json.load(open(f"{run}/config.json")).items()}
        cfg = Config(**base)
        model = StoveModel(cfg)
        tpl = {"params": model.init_params()}
        _, loaded = ckpt_lib.restore(run, tpl)
        test_ep = data_lib.ensure_dataset(cfg, "test")
        m = eval_lib.rollout_metrics(model, loaded["params"], test_ep,
                                     jax.random.key(0), batch=100)
        print(f"{run.rstrip('/').split('/')[-1]:18s} "
              f"detect={float(m['detect_mse']):.6f} "
              f"vel_rms={float(m['handoff_vel_rms']):.5f} "
              f"mse4={float(np.asarray(m['mse_per_step'])[3]):.4f} "
              f"mse8={float(m['mse_final']):.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
