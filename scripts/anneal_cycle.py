"""Second anneal cycle (warm-restart rescue) for plateau-stuck runs.

Round-3 finding: with anneal-to-1%, billiards seeds land bimodally — basin
runs show train overshoot < 0.008 by epoch ~240, plateau runs sit at
~0.015 to the end (same signature in gravity).  Basin entry happens during
the anneal endgame, so the rescue hypothesis is SGDR-style: restart the lr
at a fraction of base and anneal to 1% again for `epochs` more, from the
trained params (FRESH optimizer state + schedule).

Usage:
  python scripts/anneal_cycle.py <run_dir> [epochs=120] [lr_frac=0.3] [tag]

Writes a new run dir <run>_cyc<N>[tag].
"""
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402


def main():
    run = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    lr_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    tag = sys.argv[4] if len(sys.argv) > 4 else ""

    cfg = ckpt_lib.load_config(run)
    cfg = cfg.with_overrides(
        num_epochs=epochs,
        supair_lr=cfg.supair_lr * lr_frac,
        dynamics_lr=cfg.dynamics_lr * lr_frac,
        debug_anneal_lr=1.0,
        # anneal_final is relative to the (reduced) base: 0.01/0.3 of the
        # original base ends the cycle at ~3% of the original lr
        run_name=f"{cfg.run_name}_cyc{epochs}{tag}",
        restore=None,
    )

    from stove_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    # params-only warm start: fresh optimizer + fresh anneal schedule
    _, loaded = ckpt_lib.restore(run, {"params": trainer.state.params})
    trainer.state = trainer.state._replace(params=loaded["params"])
    if trainer._dp:
        from stove_tpu.parallel import mesh as mesh_lib
        trainer.state = mesh_lib.replicate(trainer.mesh, trainer.state)
    result = trainer.train()
    print("final:", {k: v for k, v in result.items()
                     if not isinstance(v, list)})


if __name__ == "__main__":
    main()
