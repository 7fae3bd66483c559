"""Second anneal cycle (warm-restart rescue) for plateau-stuck runs.

Round-3 finding: with anneal-to-1%, billiards seeds land bimodally — basin
runs show train overshoot < 0.008 by epoch ~240, plateau runs sit at
~0.015 to the end (same signature in gravity).  Basin entry happens during
the anneal endgame, so the rescue hypothesis is SGDR-style: restart the lr
at a fraction of base and anneal to 1% again for `epochs` more, from the
trained params (FRESH optimizer state + schedule).

Usage:
  python scripts/anneal_cycle.py <run_dir> [epochs=120] [lr_frac=0.3] [tag]

Writes a new run dir <run>_cyc<N>[tag], and prints a SUCCESS/FAILURE
verdict from the post-cycle overshoot signature (measured to separate
rescued from still-plateaued runs 9/9 across rounds 3-5: successes end
at mean train overshoot ~= 0.005, failures stay ~= 0.014; bar 0.010,
the same separation bar as the restart-protocol trigger —
RESULTS.md "Budget-exhaustion salvage outcome").
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def rescue_signature(rows, last_epochs=10):
    """Mean train overshoot over the final `last_epochs` epochs of a
    cycle's metrics rows -> (mean, verdict). verdict is "SUCCESS" below
    the 0.010 separation bar, "FAILURE" above, "UNKNOWN" with no data."""
    tr = [r for r in rows if r.get("kind") == "train" and "overshoot" in r]
    if not tr:
        return float("nan"), "UNKNOWN"
    end = max(r.get("epoch", -1) for r in tr)
    ov = [r["overshoot"] for r in tr
          if r.get("epoch", -1) > end - last_epochs]
    mean = sum(ov) / len(ov)
    return mean, ("SUCCESS" if mean < 0.010 else "FAILURE")


def main():
    import jax  # noqa: F401  (device init before trainer import)

    from stove_tpu.train import checkpoint as ckpt_lib

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

    path = os.path.join(cfg.run_dir, cfg.run_name, "metrics.jsonl")
    with open(path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    mean, verdict = rescue_signature(rows)
    print(f"rescue signature: {verdict} (post-cycle overshoot "
          f"{mean:.4f}; success band ~0.005, failure band ~0.014, "
          f"bar 0.010)")


if __name__ == "__main__":
    main()
