"""Planning: UCT MCTS with batched jitted rollouts (reference model/mcts)."""

from stove_tpu.planning.mcts import MCTS, Simulator  # noqa: F401
from stove_tpu.planning.simulators import (  # noqa: F401
    LearnedSimulator,
    TrueSimulator,
)
