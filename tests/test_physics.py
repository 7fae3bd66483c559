"""Physics oracle tests (SURVEY.md §4: energy/momentum conservation etc.).

The reference has no test suite; these tests pin the generative contract of
SURVEY.md §2.1, which is the ground truth the models train on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stove_tpu.config import Config
from stove_tpu.envs import physics, data


def _cfg(**kw) -> Config:
    return Config().with_overrides(**kw)


class TestBilliards:
    def test_speed_conserved(self):
        """Elastic collisions + walls preserve each system's kinetic energy."""
        cfg = _cfg(num_obj=3)
        state = physics.init_state(cfg, jax.random.key(1))
        e0 = jnp.sum(state.vel**2)

        def step(s, _):
            s = physics.billiards_step(cfg, s)
            return s, jnp.sum(s.vel**2)

        _, energies = jax.lax.scan(step, state, None, length=200)
        np.testing.assert_allclose(energies, e0, rtol=1e-4)

    def test_momentum_conserved_between_wall_hits(self):
        """Ball-ball collisions alone conserve total momentum."""
        cfg = _cfg(num_obj=2, arena_size=100.0)  # huge arena: no wall hits
        # two balls on a collision course
        pos = jnp.array([[45.0, 50.0], [55.0, 50.0]])
        vel = jnp.array([[0.5, 0.0], [-0.5, 0.0]])  # head-on along x
        r = jnp.full((2,), cfg.ball_radius)
        m = jnp.ones((2,))
        state = physics.EnvState(pos, vel, r, m)
        p0 = jnp.sum(vel, axis=0)
        step = jax.jit(lambda s: physics.billiards_step(cfg, s))
        for _ in range(50):
            state = step(state)
        np.testing.assert_allclose(jnp.sum(state.vel, 0), p0, atol=1e-5)
        # head-on equal mass: velocities exchange along x
        assert state.vel[0, 0] < 0 < state.vel[1, 0]

    def test_balls_stay_in_arena_and_apart(self):
        cfg = _cfg(num_obj=3)
        state = physics.init_state(cfg, jax.random.key(3))

        def step(s, _):
            s = physics.billiards_step(cfg, s)
            return s, s.pos

        _, traj = jax.lax.scan(step, state, None, length=300)
        r = cfg.ball_radius
        assert jnp.all(traj >= r - 1e-3)
        assert jnp.all(traj <= cfg.arena_size - r + 1e-3)
        # pairwise separation ≥ 2r (tiny transient tolerance)
        diff = traj[:, :, None, :] - traj[:, None, :, :]
        dist = jnp.sqrt(jnp.sum(diff**2, -1))
        eye = jnp.eye(cfg.num_obj, dtype=bool)
        min_sep = jnp.min(jnp.where(eye[None], jnp.inf, dist))
        assert min_sep > 2 * r * 0.8

    def test_init_no_overlap(self):
        cfg = _cfg(num_obj=4)
        for s in range(5):
            st = physics.init_state(cfg, jax.random.key(s))
            diff = st.pos[:, None] - st.pos[None, :]
            dist = np.sqrt(np.sum(np.asarray(diff) ** 2, -1))
            np.fill_diagonal(dist, np.inf)
            assert dist.min() >= 2 * cfg.ball_radius - 1e-4


class TestGravity:
    def test_two_body_bound_orbit_stays_in_frame(self):
        cfg = _cfg(task="gravity", num_obj=2, init_speed=0.5)
        state = physics.init_state(cfg, jax.random.key(0))

        def step(s, _):
            s = physics.gravity_step(cfg, s)
            return s, s.pos

        _, traj = jax.lax.scan(step, state, None, length=500)
        assert jnp.all(jnp.isfinite(traj))
        assert jnp.all(traj >= 0.0) and jnp.all(traj <= cfg.arena_size)

    def test_attraction_direction(self):
        """Two static bodies accelerate toward each other."""
        cfg = _cfg(task="gravity", num_obj=2, gravity_center_pull=0.0)
        pos = jnp.array([[3.0, 5.0], [7.0, 5.0]])
        vel = jnp.zeros((2, 2))
        state = physics.EnvState(pos, vel, jnp.full((2,), 1.2), jnp.ones((2,)))
        new = physics.gravity_step(cfg, state)
        assert new.vel[0, 0] > 0 and new.vel[1, 0] < 0
        np.testing.assert_allclose(new.vel[0], -new.vel[1], atol=1e-6)


class TestAvoidance:
    def test_action_sets_velocity(self):
        cfg = _cfg(task="avoidance", num_obj=3)
        state = physics.init_state(cfg, jax.random.key(0))
        # place ball 0 far from others so no collision interferes
        pos = state.pos.at[0].set(jnp.array([5.0, 5.0]))
        pos = pos.at[1].set(jnp.array([1.5, 1.5]))
        pos = pos.at[2].set(jnp.array([8.5, 8.5]))
        state = state._replace(pos=pos)
        new, reward = physics.avoidance_step(cfg, state, jnp.int32(1))  # east
        d = physics.action_directions()[1] * cfg.action_speed
        np.testing.assert_allclose(new.vel[0], d, atol=1e-5)
        assert reward == cfg.reward_free

    def test_contact_reward(self):
        cfg = _cfg(task="avoidance", num_obj=2)
        pos = jnp.array([[5.0, 5.0], [5.0 + 2 * cfg.ball_radius + 0.1, 5.0]])
        vel = jnp.zeros((2, 2))
        state = physics.EnvState(pos, vel, jnp.full((2,), cfg.ball_radius),
                                 jnp.ones((2,)))
        new, reward = physics.avoidance_step(cfg, state, jnp.int32(1))  # toward
        assert reward == cfg.reward_contact


class TestRender:
    def test_values_and_coverage(self):
        cfg = _cfg(num_obj=1)
        pos = jnp.array([[5.0, 5.0]])
        img = physics.render(cfg, pos, jnp.array([1.2]))
        assert img.shape == (32, 32)
        assert float(img.max()) == 1.0 and float(img.min()) == 0.0
        # disc area ≈ π r² in pixels (r=1.2 arena → 3.84 px)
        area = float(jnp.sum(img))
        expect = np.pi * (1.2 * 32 / 10.0) ** 2
        assert abs(area - expect) / expect < 0.15

    def test_center_of_mass_matches_position(self):
        cfg = _cfg(num_obj=1)
        pos = jnp.array([[3.0, 7.0]])
        img = physics.render(cfg, pos, jnp.array([1.2]))
        n = cfg.img_size
        grid = (jnp.arange(n) + 0.5) * cfg.arena_size / n
        gy, gx = jnp.meshgrid(grid, grid, indexing="ij")
        cx = float(jnp.sum(gx * img) / jnp.sum(img))
        cy = float(jnp.sum(gy * img) / jnp.sum(img))
        assert abs(cx - 3.0) < 0.1 and abs(cy - 7.0) < 0.1


class TestData:
    def test_generate_shapes_and_ranges(self):
        cfg = _cfg(num_obj=3, seq_len=12)
        ep = data.generate(cfg, 4, jax.random.key(0))
        assert ep.frames.shape == (4, 12, 32, 32)
        assert ep.frames.dtype == jnp.uint8
        assert ep.states.shape == (4, 12, 3, 4)
        assert ep.rewards.shape == (4, 12)

    def test_frames_consistent_with_states(self):
        """Re-rendering stored states reproduces stored frames."""
        cfg = _cfg(num_obj=3, seq_len=6)
        ep = data.generate(cfg, 2, jax.random.key(1), quantize=False)
        re_rendered = physics.render_sequence(cfg, ep.states[0, :, :, :2],
                                              ep.radii[0])
        np.testing.assert_allclose(ep.frames[0], re_rendered, atol=1e-5)

    def test_sample_windows(self):
        cfg = _cfg(num_obj=2, seq_len=16, window=8)
        ep = data.generate(cfg, 4, jax.random.key(0))
        batch = data.sample_windows(ep, cfg, jax.random.key(2), 5)
        assert batch["frames"].shape == (5, 8, 32, 32)
        assert batch["frames"].dtype == jnp.float32
        assert float(batch["frames"].max()) <= 1.0

    def test_roundtrip_npz(self, tmp_path):
        cfg = _cfg(num_obj=2, seq_len=5)
        ep = data.generate(cfg, 2, jax.random.key(0))
        p = str(tmp_path / "d.npz")
        data.save(ep, p)
        back = data.load(p)
        np.testing.assert_array_equal(ep.frames, back.frames)
        np.testing.assert_allclose(ep.states, back.states)

    def test_reference_pickle_compat(self, tmp_path):
        """Loader accepts reference-style pickles (SURVEY §0 schema)."""
        import pickle
        N, T, O = 2, 4, 3
        raw = {
            "X": np.random.rand(N, T, 32, 32, 1).astype(np.float32),
            "y": np.random.rand(N, T, O, 4).astype(np.float32),
            "action": np.zeros((N, T), np.int64),
            "reward": np.zeros((N, T), np.float32),
        }
        p = str(tmp_path / "billards_train.pkl")
        with open(p, "wb") as f:
            pickle.dump(raw, f)
        ep = data.load(p)
        assert ep.frames.shape == (N, T, 32, 32)
        assert ep.states.shape == (N, T, O, 4)

    def test_coordinate_transforms(self):
        cfg = _cfg()
        x = jnp.array([0.0, 5.0, 10.0])
        m = data.arena_to_model(cfg, x)
        np.testing.assert_allclose(m, [-1.0, 0.0, 1.0])
        np.testing.assert_allclose(data.model_to_arena(cfg, m), x)
