"""Reference-style compatibility shims.

The reference exposes small stateful classes — `BillardsEnv` (sic),
`GravityEnv`, `AvoidanceTask` with `step()`/`reset()`, and a `generate_data`
that writes train/test pickles [ref: envs.py; SURVEY.md §2].  Users coming
from jlko/STOVE can keep that surface: these shims wrap the functional JAX
core in the familiar object API and write/read the reference's pickle
schema (`X`, `y`, `action`, `reward`, `done`).

The shims are conveniences for interop and small-scale tinkering — the
native path (`stove_tpu.envs`) generates whole corpora in one vmapped scan
and should be preferred for training data.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stove_tpu.config import Config
from stove_tpu.envs import physics


class PhysicsEnv:
    """Stateful wrapper over the functional simulators (reference API)."""

    task = "billiards"

    def __init__(self, num_obj: int = 3, seed: int = 0, **overrides):
        self.cfg = Config().with_overrides(task=self.task,
                                           num_obj=num_obj, **overrides)
        self._key = jax.random.key(seed)
        self._step = jax.jit(lambda s, a: physics.env_step(self.cfg, s, a))
        self._init = jax.jit(lambda k: physics.init_state(self.cfg, k))
        self._render = jax.jit(
            lambda s: physics.render(self.cfg, s.pos, s.radii))
        self.state: Optional[physics.EnvState] = None
        self.reset()

    def reset(self) -> np.ndarray:
        self._key, sub = jax.random.split(self._key)
        self.state = self._init(sub)
        return self.render()

    def step(self, action: int = 0) -> Tuple[np.ndarray, np.ndarray, float]:
        """Returns (frame, state_vector (O, 4), reward) — reference layout.

        The frame and state vector describe the SAME post-step instant
        (frames[t] renders states[t], like the dataset layout)."""
        self.state, reward = self._step(self.state,
                                        jnp.int32(action))
        sv = np.concatenate([np.asarray(self.state.pos),
                             np.asarray(self.state.vel)], -1)
        return self.render(), sv, float(reward)

    def render(self) -> np.ndarray:
        return np.asarray(self._render(self.state))


class BilliardsEnv(PhysicsEnv):
    task = "billiards"


# the public reference repo spells it "billards" (SURVEY.md §0); keep both
BillardsEnv = BilliardsEnv


class GravityEnv(PhysicsEnv):
    task = "gravity"


class AvoidanceTask(PhysicsEnv):
    """Action-conditioned billiards; `step(action)` like the reference."""

    task = "avoidance"

    def step(self, action: int = 0):
        return super().step(action)


def generate_data(task: str = "billiards", num_obj: int = 3,
                  num_train: int = 1000, num_test: int = 300,
                  seq_len: int = 100, data_dir: str = "data",
                  seed: int = 0, pickle_format: bool = True,
                  **overrides) -> Tuple[str, str]:
    """Generate reference-schema datasets (train/test pickles or npz).

    Pickle schema matches the reference loader's expectations:
    `X` (N,T,H,W,1) float32, `y` (N,T,O,4), `action` (N,T), `reward` (N,T),
    `done` (N,T) — so tooling written against jlko/STOVE data keeps working.
    """
    from stove_tpu.envs import data as data_lib

    cfg = Config().with_overrides(task=task, num_obj=num_obj,
                                  num_train=num_train, num_test=num_test,
                                  seq_len=seq_len, data_dir=data_dir,
                                  seed=seed, **overrides)
    paths = []
    for split, num, salt in (("train", num_train, 0), ("test", num_test, 1)):
        ep = data_lib.generate(cfg, num, jax.random.key(seed + salt),
                               quantize=not pickle_format)
        if pickle_format:
            os.makedirs(data_dir, exist_ok=True)
            path = os.path.join(data_dir,
                                f"{task}_o{num_obj}_{split}.pkl")
            N, T = ep.frames.shape[:2]
            payload = {
                "X": np.asarray(ep.frames, np.float32)[..., None],
                "y": np.asarray(ep.states, np.float32),
                "action": np.asarray(ep.actions, np.int64),
                "reward": np.asarray(ep.rewards, np.float32),
                "done": np.zeros((N, T), bool),
                "r": np.asarray(ep.radii, np.float32),
            }
            with open(path, "wb") as f:
                pickle.dump(payload, f)
        else:
            path = data_lib.dataset_path(cfg, split)
            data_lib.save(ep, path)
        paths.append(path)
    return tuple(paths)
