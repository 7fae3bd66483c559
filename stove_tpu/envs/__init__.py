"""Physics environments and data pipeline (reference envs.py equivalent)."""

from stove_tpu.envs.physics import (  # noqa: F401
    EnvState,
    action_directions,
    avoidance_step,
    billiards_step,
    env_step,
    gravity_step,
    init_state,
    render,
    render_sequence,
)
from stove_tpu.envs.data import (  # noqa: F401
    Episode,
    arena_to_model,
    ensure_dataset,
    generate,
    load,
    model_to_arena,
    normalize_frames,
    sample_windows,
    save,
)
