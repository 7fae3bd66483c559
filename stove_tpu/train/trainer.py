"""Trainer: epoch loop over on-device 8-frame windows, Adam, eval, ckpt.

Reference parity [ref: model/video_prediction/train.py; SURVEY.md §2, §3.2]:
epoch loop over random windows from the 100-frame sequences, Adam with
separate learning rates for the SuPAIR and dynamics parts, ELBO (+ reward)
loss, periodic rollout-MSE eval, checkpointing, structured logging, and a
SuPAIR-only warm-up curriculum.

TPU design:
* the whole corpus lives in HBM as uint8; windowing, normalization, and the
  training step are one fused jitted call per step (north-star: load /
  normalize / window on device);
* data parallelism via NamedSharding over the 'data' mesh axis — params
  replicated, the sampled window batch sharded on its leading dim, gradient
  all-reduce inserted by XLA over ICI (SURVEY §5.8);
* the train state is donated, so params/optimizer memory is reused in-place.
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stove_tpu.config import Config
from stove_tpu.envs import data as data_lib
from stove_tpu.models.bundle import StoveModel
from stove_tpu.parallel import mesh as mesh_lib
from stove_tpu.train import checkpoint as ckpt_lib
from stove_tpu.train import evaluate as eval_lib
from stove_tpu.train.metrics import MetricsLogger


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array
    step: jnp.ndarray


def anneal_steps(cfg: Config) -> int:
    """Length of the lr-anneal schedule in optimizer steps.

    Uses the SAME floor formula as Trainer.steps_per_epoch so the schedule
    spans exactly the run (round-2 advisor: a ceil here made preset runs end
    at ~33% of base lr instead of the documented anneal_final)."""
    spe = cfg.steps_per_epoch or max(1, cfg.num_train // cfg.batch_size)
    return max(int(cfg.debug_anneal_lr if cfg.debug_anneal_lr > 1
                   else cfg.debug_anneal_lr * cfg.num_epochs * spe), 1)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with separate lrs for supair vs dynamics + global-norm clip
    (reference: two parameter groups [ref: train.py optimizer setup])."""
    def labels(params):
        return {
            "supair": jax.tree_util.tree_map(lambda _: "supair",
                                             params["supair"]),
            "dynamics": jax.tree_util.tree_map(lambda _: "dynamics",
                                               params["dynamics"]),
        }

    def lr(base: float):
        if cfg.debug_anneal_lr > 0:
            # decay to anneal_final × base.  Values > 1 are an absolute
            # step count; values in (0, 1] are a FRACTION of the full
            # training budget (num_epochs × steps_per_epoch), so presets
            # can turn annealing on scale-free.  Measured (chain 10):
            # annealing moves 360-epoch billiards mse@8 from the 0.041
            # plateau to 0.0097 — it reliably reaches the precise-dynamics
            # basin that un-annealed runs only hit on lucky seeds.
            steps = anneal_steps(cfg)
            if cfg.anneal_shape == "cosine":
                return optax.cosine_decay_schedule(
                    base, steps, alpha=cfg.anneal_final)
            return optax.linear_schedule(base, cfg.anneal_final * base,
                                         steps)
        return base

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform(
            {
                "supair": optax.adam(lr(cfg.supair_lr), b1=cfg.adam_b1,
                                     b2=cfg.adam_b2),
                "dynamics": optax.adam(lr(cfg.dynamics_lr), b1=cfg.adam_b1,
                                       b2=cfg.adam_b2),
            },
            labels,
        ),
    )


class Trainer:
    """Reference `Trainer(config).train()` equivalent [ref: train.py]."""

    def __init__(self, cfg: Config, run_dir: Optional[str] = None):
        self.cfg = cfg
        self.run_dir = run_dir or os.path.join(cfg.run_dir, cfg.run_name)
        self.logger = MetricsLogger(None if cfg.nolog else self.run_dir)

        # data (generated on demand; stays on device as uint8)
        self.train_ep = data_lib.ensure_dataset(cfg, "train")
        self.test_ep = data_lib.ensure_dataset(cfg, "test")

        if (cfg.action_conditioned and cfg.reward_balanced_loss
                and cfg.reward_pos_rate == 0.0):  # -1 forces legacy per-batch
            # corpus-level class prior for the balanced BCE + planner
            # calibration: per-batch estimates are high-variance at
            # realistic collision rates (a few % over B windows × 6 steps).
            # Persisted into the run config so eval/planning see the same π.
            rate = float(jnp.mean(self.train_ep.rewards))
            cfg = self.cfg = cfg.with_overrides(
                reward_pos_rate=round(rate, 6))
        if not cfg.nolog:
            ckpt_lib.save_config(self.run_dir, cfg)

        # model + optimizer
        self.model = StoveModel(cfg)
        self.optimizer = make_optimizer(cfg)
        params = self.model.init_params()
        opt_state = self.optimizer.init(params)
        self.state = TrainState(params, opt_state,
                                jax.random.key(cfg.seed + 2),
                                jnp.zeros((), jnp.int32))

        # mesh + shardings (single-device mesh degrades gracefully).
        # With >1 device: params/opt-state replicated, the sampled window
        # batch sharded on 'data' via a sharding constraint inside the jitted
        # step — XLA partitions the ELBO/grad computation across devices and
        # all-reduces gradients over ICI (SURVEY §5.8).
        self.mesh = mesh_lib.make_mesh(cfg)
        if cfg.batch_size % self.mesh.devices.size != 0:
            # shrink to the largest device count that divides the batch
            n = self.mesh.devices.size
            while cfg.batch_size % n != 0:
                n -= 1
            self.mesh = mesh_lib.make_mesh(
                devices=list(self.mesh.devices.flat)[:n])
        self._dp = self.mesh.devices.size > 1
        if self._dp:
            self.state = mesh_lib.replicate(self.mesh, self.state)
            self.train_ep = mesh_lib.replicate(self.mesh, self.train_ep)
        self._build_steps()

        self.start_epoch = 0
        if cfg.restore is not None:
            self.restore(cfg.restore)

    # ------------------------------------------------------------------ jit
    def _build_steps(self):
        cfg = self.cfg
        model = self.model
        optimizer = self.optimizer
        actions = cfg.action_conditioned

        batch_sharding = (mesh_lib.batch_sharding(self.mesh)
                          if self._dp else None)

        def sample_batch(ep: data_lib.Episode, key, batch):
            out = data_lib.sample_windows(ep, cfg, key, batch)
            if batch_sharding is not None:
                out = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, batch_sharding), out)
            return out

        def train_step(state: TrainState, batch) -> tuple:
            key, k_elbo = jax.random.split(state.key)

            def loss_fn(params):
                out = model.elbo(params, batch["frames"],
                                 batch["actions"] if actions else None,
                                 batch["rewards"] if actions else None,
                                 k_elbo)
                return out.loss, out

            grads, out = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {
                "loss": out.loss, "elbo": out.elbo, "log_lik": out.log_lik,
                "kl": out.kl, "reward_loss": out.reward_loss,
                "overshoot": out.overshoot_loss,
                "overshoot_reward": out.overshoot_reward_loss,
                "open_sigma_nll": out.open_sigma_nll,
                "grad_norm": optax.global_norm(grads),
            }
            return TrainState(params, opt_state, key, state.step + 1), metrics

        def supair_step(state: TrainState, batch) -> tuple:
            """SuPAIR-only warm-up: detection ELBO on individual frames."""
            key, k_elbo = jax.random.split(state.key)
            frames = batch["frames"].reshape(-1, cfg.img_size, cfg.img_size)

            def loss_fn(params):
                value, diag = model.supair_elbo(params, frames, k_elbo)
                return -value, diag

            grads, diag = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {"loss": -diag["supair_ll"],
                       "supair_ll": diag["supair_ll"],
                       "mean_scale": diag["boxes_mean_scale"]}
            return TrainState(params, opt_state, key, state.step + 1), metrics

        def fused_epoch(step_fn):
            """Whole epoch as one lax.scan inside one jit call.

            The per-step host→device dispatch dominates wall clock on
            remote/tunneled TPUs (measured: 18k windows/s on device vs ~100
            steps/epoch-minute host-driven), so the epoch loop — window
            sampling included — runs on device.
            """
            def epoch_fn(state: TrainState, ep: data_lib.Episode,
                         n_steps: int):
                def body(state, _):
                    key, k_samp = jax.random.split(state.key)
                    state = state._replace(key=key)
                    batch = sample_batch(ep, k_samp, cfg.batch_size)
                    return step_fn(state, batch)

                state, ms = jax.lax.scan(body, state, None, length=n_steps)
                last = jax.tree_util.tree_map(lambda x: x[-1], ms)
                return state, last
            return epoch_fn

        donate = (0,) if self.cfg.donate_state else ()
        self._sample_batch = jax.jit(sample_batch,
                                     static_argnames=("batch",))
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._supair_step = jax.jit(supair_step, donate_argnums=donate)
        self._train_epoch_fused = jax.jit(fused_epoch(train_step),
                                          donate_argnums=donate,
                                          static_argnames=("n_steps",))
        self._supair_epoch_fused = jax.jit(fused_epoch(supair_step),
                                           donate_argnums=donate,
                                           static_argnames=("n_steps",))

    # ------------------------------------------------------------- training
    def steps_per_epoch(self) -> int:
        if self.cfg.steps_per_epoch:
            return self.cfg.steps_per_epoch
        return max(1, self.train_ep.frames.shape[0] // self.cfg.batch_size)

    def _use_fused(self) -> bool:
        """Fused epochs amortize host→device dispatch over the remote-TPU
        tunnel; on the local CPU backend dispatch is cheap and the fused
        scan only multiplies XLA compile time (measured: minutes vs ~40 s
        for full-size configs).  Debug-size configs stay fused so tests
        exercise the path."""
        if not self.cfg.fused_epoch:
            return False
        return jax.default_backend() != "cpu" or self.cfg.debug

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        warmup = epoch < cfg.supair_only_epochs
        n = self.steps_per_epoch()
        if self._use_fused():
            epoch_fn = (self._supair_epoch_fused if warmup
                        else self._train_epoch_fused)
            self.state, metrics = epoch_fn(self.state, self.train_ep,
                                           n_steps=n)
            last = metrics
        else:
            step_fn = self._supair_step if warmup else self._train_step
            last = {}
            for _ in range(n):
                self.state, sample_key = self._next_key()
                batch = self._sample_batch(self.train_ep, sample_key,
                                           cfg.batch_size)
                self.state, last = step_fn(self.state, batch)
        last = {k: float(v) for k, v in last.items()}
        self.logger.log(int(self.state.step), "train", epoch=epoch,
                        warmup=warmup, **last)
        return last

    def _next_key(self):
        key, sub = jax.random.split(self.state.key)
        return self.state._replace(key=key), sub

    def evaluate(self, epoch: int) -> Dict[str, float]:
        # eval key from its own stream (fold_in on the step), NOT from the
        # training key chain — otherwise eval_every changes the window
        # sampling of every later training step and runs with different
        # eval cadence are not comparable
        key = jax.random.fold_in(jax.random.key(self.cfg.seed + 7919),
                                 int(self.state.step))
        m = eval_lib.rollout_metrics(self.model, self.state.params,
                                     self.test_ep, key)
        if self.cfg.eval_longhorizon > 0:
            # long-horizon stability on the VALIDATION half of the test
            # sequences (pre-registered selection: pick the checkpoint whose
            # val speed_ratio is closest to 1; report on the other half)
            n_val = self.test_ep.frames.shape[0] // 2
            val_ep = jax.tree_util.tree_map(lambda x: x[:n_val],
                                            self.test_ep)
            k_mean, k_samp = jax.random.split(
                jax.random.fold_in(key, 1))
            lh = eval_lib.longhorizon_metrics(
                self.model, self.state.params, val_ep, k_mean,
                t_pred=self.cfg.eval_longhorizon)
            m["val_speed_ratio"] = lh["speed_ratio"]
            m["val_in_frame"] = lh["frac_in_frame"]
            lhs = eval_lib.longhorizon_metrics(
                self.model, self.state.params, val_ep, k_samp,
                t_pred=self.cfg.eval_longhorizon, sample=True)
            m["val_speed_ratio_sampled"] = lhs["speed_ratio"]
            m["val_in_frame_sampled"] = lhs["frac_in_frame"]
        if not getattr(self, "_baselines_logged", False):
            # trivial-predictor context (training-invariant; logged once)
            self._baselines_logged = True
            bl = eval_lib.baseline_metrics(self.cfg, self.test_ep)
            self.logger.log(int(self.state.step), "baseline", **{
                k: (np.asarray(v).tolist() if np.ndim(v) else float(v))
                for k, v in bl.items()})
        flat = {k: (np.asarray(v).tolist() if np.ndim(v) else float(v))
                for k, v in m.items()}
        self.logger.log(int(self.state.step), "eval", epoch=epoch, **flat)
        if (self.cfg.supair_only_epochs <= epoch
                < self.cfg.supair_only_epochs + 4 * max(1, self.cfg.eval_every)
                and flat.get("detect_mse", 0.0) > 0.05):
            # seed-specific recognition→dynamics handoff collapse: healthy
            # runs sit at detect_mse ≈ 0.007 by the first joint-phase eval;
            # collapsed ones (~0.15) never recover (RESULTS.md round 3,
            # "Gravity seed 20").  Flag it so the user reseeds instead of
            # burning the full budget.
            print(f"[warn] detect_mse={flat['detect_mse']:.3f} at epoch "
                  f"{epoch}: recognition/tracking handoff failure signature "
                  "— this seed is unlikely to recover; consider restarting "
                  "with a different seed", flush=True)
        if not self.cfg.nolog:
            try:
                self._dump_gif(epoch, key)
            except Exception as e:  # viz must never kill training
                print(f"[viz] gif dump failed: {e}")
        return flat

    def _dump_gif(self, epoch: int, key) -> None:
        """true | reconstruction→prediction gif for one test sequence
        (reference gif dumps: true vs reconstructed vs predicted)."""
        from stove_tpu.train import visualize as viz

        cfg = self.cfg
        t_cond, t_pred = cfg.window, cfg.eval_rollout_steps
        frames = data_lib.normalize_frames(self.test_ep.frames[:1, :t_cond])
        actions = self.test_ep.actions[:1]
        k_inf, k_roll = jax.random.split(key)
        inf = self.model.infer(self.state.params, frames,
                               actions[:, :t_cond], k_inf)
        states, _ = self.model.rollout(
            self.state.params, inf.z_mean[:, -1],
            actions[:, t_cond - 1:t_cond - 1 + t_pred], k_roll,
            horizon=t_pred, sample=False)
        # model panel: reconstruction (inferred) for t < t_cond, then the
        # predicted rollout; true panel: the real frames over the same span
        model_pos = np.concatenate([
            np.asarray(inf.pos_mean[0]),          # (t_cond, O, 2)
            np.asarray(states[0, :, :, 2:4]),     # (t_pred, O, 2)
        ], axis=0)
        model_size = np.concatenate([
            np.asarray(inf.z_mean[0, :, :, 0:2]),
            np.asarray(states[0, :, :, 0:2]),
        ], axis=0)
        true = data_lib.normalize_frames(
            self.test_ep.frames[0, :t_cond + t_pred])
        viz.dump_rollout_gif(cfg, self.run_dir, f"ep{epoch:04d}",
                             np.asarray(true), model_pos,
                             pred_sizes=model_size)

    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        result: Dict[str, float] = {}
        for epoch in range(self.start_epoch, cfg.num_epochs):
            train_metrics = self.train_epoch(epoch)
            result.update(train_metrics)
            if (epoch + 1) % cfg.eval_every == 0:
                result.update(self.evaluate(epoch))
            if not cfg.nolog and (epoch + 1) % cfg.ckpt_every == 0:
                self.save(epoch)
        if not cfg.nolog:
            self.save(cfg.num_epochs - 1)
        return result

    # ----------------------------------------------------------- persistence
    def save(self, epoch: int) -> None:
        ckpt_lib.save(self.run_dir, int(self.state.step), keep=self.cfg.ckpt_keep, state={
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "key": jax.random.key_data(self.state.key),
            "epoch": np.int32(epoch),
        })

    def restore(self, run_dir: str) -> None:
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "key": jax.random.key_data(self.state.key),
            "epoch": np.int32(0),
        }
        step, loaded = ckpt_lib.restore(run_dir, template)
        self.state = TrainState(
            loaded["params"], loaded["opt_state"],
            jax.random.wrap_key_data(loaded["key"]),
            jnp.asarray(step, jnp.int32))
        if self._dp:
            # restored arrays land on one device; restore the replicated
            # placement or training would silently drop to a single device
            self.state = mesh_lib.replicate(self.mesh, self.state)
        self.start_epoch = int(loaded["epoch"]) + 1
