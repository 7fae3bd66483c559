"""Structured metrics logging: JSONL + stdout.

Reference parity: prints + CSV/pickle logs of ELBO components, per-step
rollout MSE, reward accuracy [ref: train.py logging; SURVEY.md §5.5].  We
write one JSON object per line to `<run_dir>/metrics.jsonl` (machine
readable, append-only, resume-safe) and mirror a compact line to stdout.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, run_dir: Optional[str], echo: bool = True):
        self.echo = echo
        self.path = None
        if run_dir is not None:
            os.makedirs(run_dir, exist_ok=True)
            self.path = os.path.join(run_dir, "metrics.jsonl")
        self._t0 = time.time()

    def log(self, step: int, kind: str, **values: Any) -> None:
        rec: Dict[str, Any] = {
            "step": int(step),
            "kind": kind,
            "wall_s": round(time.time() - self._t0, 2),
        }
        for k, v in values.items():
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                v = round(v, 6)
            rec[k] = v
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.echo:
            body = " ".join(f"{k}={v}" for k, v in rec.items()
                            if k not in ("kind",))
            print(f"[{kind}] {body}", flush=True)
