"""MCTS (UCT) planning with batched, jitted model rollouts.

Reference parity [ref: model/mcts/mcts.py; SURVEY.md §3.4]: UCT tree search
over the 9 discrete avoidance actions — selection by UCB1, expansion,
evaluation by rolling a simulator to a horizon and summing (predicted)
rewards, backup of mean value.  The simulator is pluggable: the learned STOVE
rollout or the true environment.

TPU redesign (the reference evaluates simulations serially, SURVEY §3.4
"embarrassingly batchable"):

* **Frontier batching** — when leaves are reached, ALL `mcts_frontier` (K)
  leaves × A children are expanded and evaluated with ONE batched jitted
  H-step rollout: one device call per tree round instead of A·(H+1).
* **Lockstep episode batching** (`MCTSLockstep`) — E independent searches
  (one per evaluation episode) advance in lockstep, merging their K·A
  frontiers into one (E, K·A) device call per round.  Planning evaluation
  episodes are fully independent, so this multiplies the batch by E with
  zero interaction — the round-2 planning evals paid 3×40×40 serial MCTS
  calls over a ~ms-latency tunnel for exactly this workload.

The trees live on host as python objects with **numpy** states — the device
only ever sees fixed-shape batches, and each round does exactly one
device→host transfer (the stacked children), so tree bookkeeping costs no
device round-trips.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from stove_tpu.config import Config


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class Simulator:
    """Pluggable simulator interface (learned model or true env).

    States are pytrees whose leaves have leading batch dims.  `step` /
    `evaluate` take a (B, ...) batch; `step_many` / `evaluate_many` take an
    (E, B, ...) batch with one PRNG key per episode (lockstep mode) and are
    per-episode-identical to E separate `step`/`evaluate` calls.
    """

    num_actions: int

    def step(self, states, actions, key):
        """(states[B], actions[B]) → (next_states[B], rewards[B])."""
        raise NotImplementedError

    def evaluate(self, states, key, horizon: int):
        """Roll `horizon` steps, sum discounted rewards → (B,)."""
        raise NotImplementedError

    def step_many(self, states, actions, keys):
        """(states[E,B], actions[E,B], keys[E]) → (next[E,B], rewards[E,B])."""
        raise NotImplementedError

    def evaluate_many(self, states, keys, horizon: int):
        """(states[E,B], keys[E]) → returns (E, B)."""
        raise NotImplementedError

    def round_one(self, states, actions, key, horizon: int, depths=None):
        """One FUSED search round, serial tree: split the key 3-ways (as
        `MCTS.run` did host-side), step the (B,) frontier with split[1],
        evaluate the children with split[2].  Returns (new_key, next_states,
        rewards, returns) from a single device call — the tunnel's
        heavy-tailed dispatch latency makes one call per round worth it.
        `depths` (B,) int32 gives each child's tree depth from the root;
        only tree-mode depth shrink consumes it (others ignore it)."""
        raise NotImplementedError

    def round_many(self, states, actions, keys_data, horizon: int,
                   depths=None):
        """Fused lockstep round: per-episode 3-way key splits + step +
        evaluate over (E, B) in ONE device call.  `keys_data` is the raw
        (E, kd) key-data array; returns (new_keys_data[E,kd], next[E,B],
        rewards[E,B], returns[E,B]).  Bit-identical to a host-side vmapped
        3-way split + `step_many` + `evaluate_many` with the same keys.
        `depths` (E, B) as in `round_one`."""
        raise NotImplementedError


class _Node:
    __slots__ = ("state", "reward", "children", "N", "W")

    def __init__(self, state, reward: float = 0.0):
        self.state = state          # host-side numpy pytree (leading dim 1)
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


class _Search:
    """One tree's in-flight search state (host side)."""

    __slots__ = ("root", "visits", "n_sim", "leaves", "paths")

    def __init__(self, root_state, n_sim: int):
        # root state arrives as a device or host pytree, unbatched
        self.root = _Node(jax.tree_util.tree_map(
            lambda x: np.asarray(x)[None], root_state))
        self.visits = 0
        self.n_sim = n_sim
        self.leaves: List[_Node] = []
        self.paths: List[List[_Node]] = []

    @property
    def done(self) -> bool:
        return self.visits >= self.n_sim


class MCTS:
    """UCT with batched expansion+evaluation (one device call per round)."""

    def __init__(self, sim: Simulator, cfg: Config):
        self.sim = sim
        self.cfg = cfg

    # ---------------------------------------------------------------- rounds
    def _select_round(self, search: _Search) -> int:
        """Select up to K distinct leaves under a virtual loss (paths' visit
        counts pre-incremented, pessimistic value charged, so consecutive
        selections diverge).  Fills search.leaves/paths; returns k."""
        cfg = self.cfg
        A = self.sim.num_actions
        K = max(1, cfg.mcts_frontier)
        root = search.root
        search.leaves, search.paths = [], []
        for _ in range(K):
            path = [root]
            node = root
            while node.children is not None:
                node = max(node.children,
                           key=lambda ch: _ucb(node, ch, cfg.mcts_c_uct))
                path.append(node)
            if node in search.leaves:
                break  # tree exhausted for this round
            search.leaves.append(node)
            search.paths.append(path)
            for n in path:  # virtual loss: discourage re-selection
                n.N += A
                n.W -= A * cfg.mcts_virtual_loss
            if node is root:
                break  # root not yet expanded: only one leaf exists
        return len(search.leaves)

    def _stack_frontier(self, search: _Search):
        """Stack the selected leaves' states into a fixed (K·A, ...) numpy
        batch (padded by duplicating the last leaf) plus the action vector
        and each child's tree depth (= open-loop steps from the root; used
        by tree-mode depth shrink, ignored otherwise).  An empty selection
        (finished lockstep episode) stacks the root as a dummy whose results
        are discarded."""
        A = self.sim.num_actions
        K = max(1, self.cfg.mcts_frontier)
        states = [leaf.state for leaf in search.leaves] or [search.root.state]
        states = states + [states[-1]] * (K - len(states))
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.repeat(np.concatenate(xs, axis=0), A, axis=0),
            *states)                                            # (K·A, ...)
        acts = np.tile(np.arange(A, dtype=np.int32), K)
        # child depth = leaf depth + 1; path includes the root, so leaf
        # depth is len(path) - 1
        leaf_depths = [len(p) for p in search.paths] or [1]
        leaf_depths = leaf_depths + [leaf_depths[-1]] * (K - len(leaf_depths))
        depths = np.repeat(np.asarray(leaf_depths, dtype=np.int32), A)
        return stacked, acts, depths

    def _apply_round(self, search: _Search, nxt_np, rewards_np,
                     returns_np) -> None:
        """Expand the selected leaves with the children's host-side results
        and back up (undoing the virtual loss)."""
        cfg = self.cfg
        A = self.sim.num_actions
        g = cfg.mcts_discount
        child_values = rewards_np + g * returns_np              # (K·A,)
        for i, (leaf, path) in enumerate(zip(search.leaves, search.paths)):
            leaf.children = []
            for a in range(A):
                j = i * A + a
                # np.array (not a view): a view would pin the whole round's
                # (K·A, ...) batch in memory for the life of the tree —
                # ~1.5 GB over a 3456-simulation lockstep search
                child = _Node(
                    jax.tree_util.tree_map(lambda x: np.array(x[j:j + 1]),
                                           nxt_np),
                    float(rewards_np[j]))
                child.N = 1
                child.W = float(child_values[j])
                leaf.children.append(child)

            mean_v = float(np.mean(child_values[i * A:(i + 1) * A]))
            for n in reversed(path):
                n.W += A * (mean_v + cfg.mcts_virtual_loss)
                mean_v = n.reward + g * mean_v
            search.visits += A
        search.leaves, search.paths = [], []

    @staticmethod
    def _best(search: _Search) -> Tuple[int, np.ndarray]:
        counts = np.array([ch.N for ch in search.root.children])
        # prefer higher value among equally-visited on small budgets
        best = int(np.argmax(counts + 1e-3 * np.array(
            [ch.value for ch in search.root.children])))
        return best, counts

    # ---------------------------------------------------------------- serial
    def run(self, root_state, key: jax.Array,
            n_simulations: Optional[int] = None) -> Tuple[int, np.ndarray]:
        """Search from root_state (unbatched pytree).  Returns (best action,
        visit counts)."""
        cfg = self.cfg
        search = _Search(root_state, n_simulations or cfg.mcts_simulations)
        while not search.done:
            self._select_round(search)
            stacked, acts, depths = self._stack_frontier(search)
            # fused split+step+evaluate: one device call per round (the
            # tunnel's dispatch latency is heavy-tailed; see BASELINE.md)
            key, nxt, rewards, returns = self.sim.round_one(
                stacked, acts, key, cfg.mcts_horizon, depths)
            self._apply_round(search, _to_host(nxt),
                              np.asarray(rewards, dtype=np.float64),
                              np.asarray(returns, dtype=np.float64))
        return self._best(search)


class MCTSLockstep:
    """E independent UCT searches advanced in lockstep.

    Per round: every still-running search selects its K-leaf frontier
    (host), the E frontiers are stacked into ONE (E, K·A) device call
    (step + evaluate), and results scatter back to each tree.  Per-episode
    results are identical to E serial `MCTS.run` calls with the same keys:
    selection depends only on that tree's statistics, the per-episode PRNG
    chains are advanced with the same splits (batched `vmap(split)` equals
    per-key splits; splits of finished episodes are discarded — splitting
    is pure), and the batched simulator calls are vmaps of the serial ones.
    """

    def __init__(self, sim: Simulator, cfg: Config):
        self.sim = sim
        self.cfg = cfg
        self._mcts = MCTS(sim, cfg)

    def run(self, root_states: Sequence, keys: jax.Array,
            n_simulations: Optional[int] = None
            ) -> Tuple[List[int], List[np.ndarray]]:
        """root_states: length-E sequence of unbatched pytrees; keys: (E,)
        key array (one per episode, exactly what the serial path would get).
        Returns (best actions, visit counts) per episode."""
        cfg = self.cfg
        E = len(root_states)
        n_sim = n_simulations or cfg.mcts_simulations
        searches = [_Search(s, n_sim) for s in root_states]
        keys_data = np.array(jax.random.key_data(keys))        # (E, kd) copy

        while any(not s.done for s in searches):
            active = []
            for e, s in enumerate(searches):
                if s.done:
                    continue
                self._mcts._select_round(s)
                active.append(e)

            frontiers = [self._mcts._stack_frontier(searches[e])
                         for e in range(E)]
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0),
                *[f[0] for f in frontiers])                 # (E, K·A, ...)
            acts = np.stack([f[1] for f in frontiers], axis=0)
            depths = np.stack([f[2] for f in frontiers], axis=0)

            # fused per-episode split + step + evaluate: ONE device call per
            # lockstep round (was three; the tunnel's dispatch latency is
            # heavy-tailed, so every saved call trims the tail)
            new_keys, nxt, rewards, returns = self.sim.round_many(
                stacked, acts, keys_data, cfg.mcts_horizon, depths)
            # finished episodes keep their keys (their splits are discarded;
            # splitting is pure, so this matches the serial chains exactly)
            keys_data[active] = np.asarray(new_keys)[active]
            nxt_np = _to_host(nxt)
            rewards_np = np.asarray(rewards, dtype=np.float64)
            returns_np = np.asarray(returns, dtype=np.float64)
            for e in active:
                self._mcts._apply_round(
                    searches[e],
                    jax.tree_util.tree_map(lambda x: x[e], nxt_np),
                    rewards_np[e], returns_np[e])

        results = [MCTS._best(s) for s in searches]
        return [r[0] for r in results], [r[1] for r in results]
