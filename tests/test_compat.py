"""Reference-compatibility shims: stateful env API + pickle round-trip."""

import numpy as np

from stove_tpu import compat
from stove_tpu.envs import data as data_lib


class TestStatefulEnvs:
    def test_billiards_env_api(self):
        env = compat.BillardsEnv(num_obj=2, seed=3)  # reference spelling
        frame = env.reset()
        assert frame.shape == (32, 32)
        frame, state, reward = env.step()
        assert state.shape == (2, 4)
        assert reward == 0.0

    def test_avoidance_task_rewards(self):
        env = compat.AvoidanceTask(num_obj=3, seed=1)
        rewards = [env.step(a % 9)[2] for a in range(30)]
        assert set(rewards) <= {0.0, 1.0}
        assert 0.0 < np.mean(rewards) <= 1.0

    def test_gravity_env(self):
        env = compat.GravityEnv(num_obj=3, seed=0)
        for _ in range(20):
            frame, state, _ = env.step()
        assert np.isfinite(state).all()


class TestGenerateData:
    def test_reference_pickles_load_back(self, tmp_path):
        train, test = compat.generate_data(
            task="billiards", num_obj=2, num_train=3, num_test=2,
            seq_len=6, data_dir=str(tmp_path))
        assert train.endswith(".pkl")
        ep = data_lib.load(train)
        assert ep.frames.shape == (3, 6, 32, 32)
        assert ep.states.shape == (3, 6, 2, 4)
