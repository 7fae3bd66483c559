"""Deterministic, resumable checkpoints (params, opt state, PRNG key, step).

Reference parity: `torch.save` of model+optimizer state dicts into the run
directory, `restore=<rundir>` reloads config + latest checkpoint
[ref: train.py / main.py; SURVEY.md §5.4].  TPU equivalent kept dependency-
light per SURVEY §5.4: pytrees flattened with `jax.tree_util` key paths into
a compressed npz — no orbax required, fully deterministic resume.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from stove_tpu.config import Config


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


def _unflatten(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves:
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, "
                f"model expects {np.shape(leaf)}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save(run_dir: str, step: int, state: Any, keep: int = 3) -> str:
    """Write ckpt_<step>.npz; prune old ones beyond `keep`."""
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, f"ckpt_{step:08d}.npz")
    np.savez_compressed(path, **_flatten(state))
    ckpts = sorted(glob.glob(os.path.join(run_dir, "ckpt_*.npz")))
    for old in ckpts[:-keep]:
        os.remove(old)
    return path


def latest_step(run_dir: str) -> Optional[int]:
    ckpts = sorted(glob.glob(os.path.join(run_dir, "ckpt_*.npz")))
    if not ckpts:
        return None
    return int(re.search(r"ckpt_(\d+)\.npz", ckpts[-1]).group(1))


def restore(run_dir: str, template: Any, step: Optional[int] = None
            ) -> Tuple[int, Any]:
    """Load the latest (or given) checkpoint into the template's structure."""
    if step is None:
        step = latest_step(run_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {run_dir}")
    path = os.path.join(run_dir, f"ckpt_{step:08d}.npz")
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return step, _unflatten(template, flat)


def save_config(run_dir: str, cfg: Config) -> None:
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())


def load_config(run_dir: str) -> Config:
    with open(os.path.join(run_dir, "config.json")) as f:
        return Config.from_json(f.read())
