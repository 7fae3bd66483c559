"""Dataset generation, storage, and on-device windowing.

The reference dumps `{train,test}` pickles of `X` frames (N, T, 32, 32),
ground-truth `y` positions+velocities, `action`, `reward`, `done`
[ref: envs.py generate_data / __main__; SURVEY.md §3.1].  We keep the same
record schema but:

* generation is one `vmap(scan)` — the whole corpus is simulated and rendered
  on device in a single jitted call (batched over sequences, scanned over
  time) instead of a per-step numpy loop;
* frames are stored **uint8** (the renderer emits [0, 1]); normalization back
  to float happens on device at batch time (BASELINE.json north-star: "loaded,
  normalized and windowed on device");
* storage is `.npz`; the loader also accepts reference-style pickles, under
  both the correct spelling and the reference's "billards" typo
  (SURVEY.md §0).

Ground-truth `y` layout per object: (x, y, vx, vy) in **arena** coordinates,
like the reference; helpers convert to the model's [−1, 1] image frame.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stove_tpu.config import Config
from stove_tpu.envs import physics


class Episode(NamedTuple):
    """One batch of trajectories (leading dims N, T)."""
    frames: jnp.ndarray    # (N, T, img, img) uint8 or float32
    states: jnp.ndarray    # (N, T, O, 4)  x, y, vx, vy (arena coords)
    actions: jnp.ndarray   # (N, T) int32  (zeros when not action-conditioned)
    rewards: jnp.ndarray   # (N, T) float32
    radii: jnp.ndarray     # (N, O) float32


def _rollout_one(cfg: Config, key: jax.Array) -> Episode:
    """Simulate and render one sequence of cfg.seq_len frames."""
    k_init, k_act = jax.random.split(key)
    state = physics.init_state(cfg, k_init)
    T = cfg.seq_len
    if cfg.task == "avoidance":
        actions = jax.random.randint(k_act, (T,), 0, cfg.num_actions)
    else:
        actions = jnp.zeros((T,), jnp.int32)

    def step(s, a):
        new, reward = physics.env_step(cfg, s, a)
        out = (jnp.concatenate([s.pos, s.vel], -1), reward)
        return new, out

    # frame t records the state *before* stepping to t+1 (reference layout)
    _, (states, rewards) = jax.lax.scan(step, state, actions)
    frames = physics.render_sequence(cfg, states[:, :, :2], state.radii)
    return Episode(
        frames=frames,
        states=states,
        actions=actions,
        rewards=rewards,
        radii=state.radii,
    )


def generate(cfg: Config, num: int, key: jax.Array, quantize: bool = True,
             chunk: int = 256) -> Episode:
    """Generate `num` sequences fully on device: vmap over sequences.

    Generation runs in chunks of ≤`chunk` sequences (one jitted vmap(scan)
    program per chunk, same executable reused) — bounded program/memory size
    regardless of corpus scale, then concatenated on host.
    """
    gen = jax.jit(jax.vmap(lambda k: _rollout_one(cfg, k)))
    parts = []
    remaining, i = num, 0
    while remaining > 0:
        n = min(chunk, remaining)
        keys = jax.random.split(jax.random.fold_in(key, i), n)
        ep = gen(keys)
        if quantize:
            ep = ep._replace(
                frames=jnp.round(ep.frames * 255.0).astype(jnp.uint8))
        parts.append(jax.tree_util.tree_map(np.asarray, ep))
        remaining -= n
        i += 1
    if len(parts) == 1:
        return jax.tree_util.tree_map(jnp.asarray, parts[0])
    out = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.concatenate(xs, axis=0)), *parts)
    return out


def _physics_tag(cfg: Config) -> str:
    """Short hash of physics params that differ from the defaults.

    The dataset content depends on these, so they must be part of the file
    identity — otherwise e.g. `avoidance_dense` (r=1.6, faster balls) would
    silently load a default-physics corpus generated earlier (round-2 bug:
    exactly that happened).  Default-physics configs keep the untagged
    name, so existing corpora remain valid.
    """
    import hashlib

    defaults = Config()
    keys = ("arena_size", "ball_radius", "init_speed", "gravity_strength",
            "gravity_eps", "gravity_center_pull", "gravity_dt",
            "physics_substeps", "num_actions", "action_speed",
            "reward_contact", "reward_free", "img_size")
    diffs = [f"{k}={getattr(cfg, k)}" for k in keys
             if getattr(cfg, k) != getattr(defaults, k)]
    if not diffs:
        return ""
    return "_p" + hashlib.md5(",".join(diffs).encode()).hexdigest()[:8]


def dataset_path(cfg: Config, split: str) -> str:
    num = cfg.num_train if split == "train" else cfg.num_test
    name = (f"{cfg.task}_o{cfg.num_obj}_n{num}_t{cfg.seq_len}"
            f"{_physics_tag(cfg)}_{split}.npz")
    return os.path.join(cfg.data_dir, name)


def save(ep: Episode, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        frames=np.asarray(ep.frames),
        states=np.asarray(ep.states),
        actions=np.asarray(ep.actions),
        rewards=np.asarray(ep.rewards),
        radii=np.asarray(ep.radii),
    )


def load(path: str) -> Episode:
    """Load .npz (ours) or reference-style pickle dicts.

    Reference pickles hold keys like `X` (N,T,H,W[,1]), `y` (N,T,O,4),
    `action`, `reward` [ref: envs.py pickle schema]; accepted here so users of
    the reference's data can switch without regenerating.
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            return Episode(
                frames=jnp.asarray(z["frames"]),
                states=jnp.asarray(z["states"]),
                actions=jnp.asarray(z["actions"]),
                rewards=jnp.asarray(z["rewards"]),
                radii=jnp.asarray(z["radii"]),
            )
    with open(path, "rb") as f:
        raw = pickle.load(f)
    X = np.asarray(raw["X"])
    if X.ndim == 5:  # (N, T, H, W, 1)
        X = X[..., 0]
    y = np.asarray(raw["y"])
    N, T = X.shape[:2]
    O = y.shape[2]
    actions = np.asarray(raw.get("action", np.zeros((N, T), np.int32)))
    if actions.ndim == 3:  # one-hot
        actions = actions.argmax(-1)
    rewards = np.asarray(raw.get("reward", np.zeros((N, T), np.float32)))
    rewards = rewards.reshape(N, -1)[:, :T]
    radii = np.asarray(raw.get("r", np.full((N, O), 1.2, np.float32)))
    radii = radii.reshape(N, -1)[:, :O]
    if X.dtype != np.uint8:
        X = np.round(np.clip(X, 0, 1) * 255).astype(np.uint8)
    return Episode(jnp.asarray(X), jnp.asarray(y[..., :4]),
                   jnp.asarray(actions.astype(np.int32)),
                   jnp.asarray(rewards.astype(np.float32)),
                   jnp.asarray(radii.astype(np.float32)))


def ensure_dataset(cfg: Config, split: str, key: Optional[jax.Array] = None
                   ) -> Episode:
    """Load the split if present, else generate and save it."""
    path = dataset_path(cfg, split)
    # accept the reference's "billards" typo in pre-existing file names
    alt = path.replace("billiards", "billards")
    for p in (path, alt, path.replace(".npz", ".pkl"), alt.replace(".npz", ".pkl")):
        if os.path.exists(p):
            return load(p)
    if key is None:
        key = jax.random.key(cfg.seed + (0 if split == "train" else 1))
    num = cfg.num_train if split == "train" else cfg.num_test
    ep = generate(cfg, num, key)
    save(ep, path)
    return ep


# --------------------------------------------------------------------------
# on-device batching
# --------------------------------------------------------------------------

def normalize_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """uint8 → float32 in [0, 1] (no-op when already float)."""
    if frames.dtype == jnp.uint8:
        return frames.astype(jnp.float32) / 255.0
    return frames.astype(jnp.float32)


def arena_to_model(cfg: Config, pos: jnp.ndarray) -> jnp.ndarray:
    """Arena [0, A] coords → model/ST [−1, 1] coords (same for velocities
    up to the 2/A scale; apply to positions only)."""
    return pos / (cfg.arena_size / 2.0) - 1.0


def model_to_arena(cfg: Config, pos: jnp.ndarray) -> jnp.ndarray:
    return (pos + 1.0) * (cfg.arena_size / 2.0)


def sample_windows(ep: Episode, cfg: Config, key: jax.Array, batch: int
                   ) -> Dict[str, jnp.ndarray]:
    """Sample `batch` random T-frame windows on device.

    Equivalent of the reference's torch Dataset of 8-frame windows
    [ref: train.py data loading; SURVEY §3.2], but implemented as two gathers
    inside jit: one over sequences, one (via dynamic slicing with a time
    index vector) over start offsets.
    """
    N, T = ep.frames.shape[:2]
    W = cfg.window
    k_seq, k_off = jax.random.split(key)
    seq = jax.random.randint(k_seq, (batch,), 0, N)
    off = jax.random.randint(k_off, (batch,), 0, T - W + 1)
    t_idx = off[:, None] + jnp.arange(W)[None, :]            # (batch, W)
    frames = normalize_frames(ep.frames[seq[:, None], t_idx])  # (B, W, H, Wd)
    states = ep.states[seq[:, None], t_idx]
    actions = ep.actions[seq[:, None], t_idx]
    rewards = ep.rewards[seq[:, None], t_idx]
    return dict(frames=frames, states=states, actions=actions, rewards=rewards)
