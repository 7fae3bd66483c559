"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference;
here: `jax.profiler` traces with named annotations around the hot phases).

Usage:
    with trace("runs/exp/trace"):           # writes a Perfetto/TensorBoard trace
        train_step(...)

    with annotate("spn_likelihood"):        # names a region inside jit traces
        ...

`python -m stove_tpu.main mode=profile ...` captures a trace of a few train
steps into `<run_dir>/trace/`.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace into log_dir (view with Perfetto/TensorBoard)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def profile_train_steps(cfg, n_steps: int = 3) -> str:
    """Capture a trace of `n_steps` train steps; returns the trace dir."""
    from stove_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    # warm up compilation outside the trace so the trace shows steady state
    trainer.state, key = trainer._next_key()
    batch = trainer._sample_batch(trainer.train_ep, key, cfg.batch_size)
    trainer.state, _ = trainer._train_step(trainer.state, batch)

    trace_dir = os.path.join(trainer.run_dir, "trace")
    with trace(trace_dir):
        for _ in range(n_steps):
            trainer.state, key = trainer._next_key()
            batch = trainer._sample_batch(trainer.train_ep, key,
                                          cfg.batch_size)
            trainer.state, metrics = trainer._train_step(trainer.state, batch)
        jax.block_until_ready(metrics)
    return trace_dir
