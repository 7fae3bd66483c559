"""MCTS (UCT) planning with batched, jitted model rollouts.

Reference parity [ref: model/mcts/mcts.py; SURVEY.md §3.4]: UCT tree search
over the 9 discrete avoidance actions — selection by UCB1, expansion,
evaluation by rolling a simulator to a horizon and summing (predicted)
rewards, backup of mean value.  The simulator is pluggable: the learned STOVE
rollout or the true environment.

TPU redesign (the reference evaluates simulations serially, SURVEY §3.4
"embarrassingly batchable"): when a leaf is reached we expand **all** A
children at once and evaluate all of them with **one** batched jitted
H-step rollout — one device call per tree visit instead of A·(H+1).  Batch
shapes are fixed (A children, H horizon), so everything hits the same
compiled executable.

The tree itself lives on host (python objects, numpy stats) — it is tiny;
the device only ever sees fixed-shape batches.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stove_tpu.config import Config


class Simulator:
    """Pluggable simulator interface (learned model or true env).

    States are opaque pytrees whose leaves have a leading batch dim.
    """

    num_actions: int

    def step(self, states, actions: jnp.ndarray, key) -> Tuple[object, jnp.ndarray]:
        """Batched one-step transition: (states[B], actions[B]) →
        (next_states[B], rewards[B])."""
        raise NotImplementedError

    def evaluate(self, states, key, horizon: int) -> jnp.ndarray:
        """Batched return estimate: roll `horizon` steps, sum rewards →
        (B,)."""
        raise NotImplementedError


class _Node:
    __slots__ = ("state", "reward", "children", "N", "W")

    def __init__(self, state, reward: float = 0.0):
        self.state = state          # host-side pytree slice (leading dim 1)
        self.reward = reward        # transition reward from the parent
        self.children: Optional[List["_Node"]] = None
        self.N = 0
        self.W = 0.0

    @property
    def value(self) -> float:
        return self.W / self.N if self.N else 0.0


def _ucb(node: _Node, child: _Node, c: float) -> float:
    if child.N == 0:
        return float("inf")
    return child.value + c * math.sqrt(math.log(node.N) / child.N)


class MCTS:
    """UCT with batched expansion+evaluation (one device call per visit)."""

    def __init__(self, sim: Simulator, cfg: Config):
        self.sim = sim
        self.cfg = cfg

    def run(self, root_state, key: jax.Array,
            n_simulations: Optional[int] = None) -> Tuple[int, np.ndarray]:
        """Search from root_state (unbatched pytree).  Returns (best action,
        visit counts).

        Frontier batching: `mcts_frontier` (K) leaves are selected per
        iteration under a virtual loss (their paths' visit counts are
        pre-incremented and a pessimistic value is charged so consecutive
        selections diverge), then ALL K·A children are expanded and evaluated
        in a single fixed-shape device call — K·A rollouts per round-trip
        instead of the reference's one [ref: model/mcts/mcts.py serial
        evaluation; SURVEY §3.4]."""
        cfg = self.cfg
        A = self.sim.num_actions
        K = max(1, cfg.mcts_frontier)
        n_sim = n_simulations or cfg.mcts_simulations
        g = cfg.mcts_discount
        root = _Node(jax.tree_util.tree_map(lambda x: x[None], root_state))

        visits = 0
        while visits < n_sim:
            key, k_step, k_eval = jax.random.split(key, 3)

            # ---- selection of up to K distinct leaves with virtual loss
            leaves, paths = [], []
            for _ in range(K):
                path = [root]
                node = root
                while node.children is not None:
                    node = max(node.children,
                               key=lambda ch: _ucb(node, ch, cfg.mcts_c_uct))
                    path.append(node)
                if node in leaves:
                    break  # tree exhausted for this round
                leaves.append(node)
                paths.append(path)
                for n in path:  # virtual loss: discourage re-selection
                    n.N += A
                    n.W -= A * cfg.mcts_virtual_loss
                if node is root:
                    break  # root not yet expanded: only one leaf exists

            k = len(leaves)
            # ---- expansion: all k·A children in one batched step.  Always
            # pad to the full K·A shape so every call hits one executable.
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(
                    list(xs) + [xs[-1]] * (K - k), axis=0),
                *[leaf.state for leaf in leaves])
            tiled = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, A, axis=0), stacked)   # (K·A, ...)
            acts = jnp.tile(jnp.arange(A, dtype=jnp.int32), K)
            nxt, rewards = self.sim.step(tiled, acts, k_step)

            # ---- evaluation: all k·A children in one batched rollout
            returns = self.sim.evaluate(nxt, k_eval, cfg.mcts_horizon)
            rewards_np = np.asarray(rewards, dtype=np.float64)
            returns_np = np.asarray(returns, dtype=np.float64)
            child_values = rewards_np + g * returns_np         # (K·A,)

            for i, (leaf, path) in enumerate(zip(leaves, paths)):
                leaf.children = []
                for a in range(A):
                    j = i * A + a
                    child = _Node(
                        jax.tree_util.tree_map(lambda x: x[j:j + 1], nxt),
                        float(rewards_np[j]))
                    child.N = 1
                    child.W = float(child_values[j])
                    leaf.children.append(child)

                # ---- backup: undo virtual loss, add the real value
                mean_v = float(np.mean(child_values[i * A:(i + 1) * A]))
                for n in reversed(path):
                    n.W += A * (mean_v + cfg.mcts_virtual_loss)
                    mean_v = n.reward + g * mean_v
                visits += A

        counts = np.array([ch.N for ch in root.children])
        # prefer higher value among equally-visited on small budgets
        best = int(np.argmax(counts + 1e-3 * np.array(
            [ch.value for ch in root.children])))
        return best, counts
