"""Structured metrics logging (SURVEY §5.5): per-step JSONL with loss, lr,
grad_norm, tokens/sec, examples/sec/chip — the reference only had HF
Trainer's --logging_steps console prints (train.sh:31)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger("macaw")


def setup_logging(level=logging.INFO):
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, log_every: int = 10):
        self.path = path
        self.log_every = log_every
        self._f = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        self._last_time = time.perf_counter()
        self._last_step = 0

    def log(self, step: int, metrics: Dict[str, float], *,
            tokens_per_batch: Optional[int] = None,
            examples_per_batch: Optional[int] = None,
            n_chips: int = 1):
        now = time.perf_counter()
        dt = now - self._last_time
        dsteps = max(step - self._last_step, 1)
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if tokens_per_batch:
            rec["tokens_per_sec"] = tokens_per_batch * dsteps / dt
        if examples_per_batch:
            rec["examples_per_sec_per_chip"] = (
                examples_per_batch * dsteps / dt / n_chips)
        rec["step_time_s"] = dt / dsteps
        self._last_time = now
        self._last_step = step
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if step % self.log_every == 0:
            logger.info(" ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()))
        return rec

    def close(self):
        if self._f:
            self._f.close()
