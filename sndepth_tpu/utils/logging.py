"""Training observability: scalar metric logging + step timing.

The reference writes tensorboardX scalars every 100 iters and prints wall
time (`/root/reference/models/baseline.py:712,1208-1216`). Here: a JSONL
metric stream (always), optional tensorboardX (if importable), and a
steps/sec + frames/sec tracker as a first-class metric.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


class MetricLogger:
    def __init__(self, log_dir: str | None = None, use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from tensorboardX import SummaryWriter
                    self._tb = SummaryWriter(logdir=log_dir, flush_secs=30)
                except Exception:
                    self._tb = None
        self._t_last = time.perf_counter()
        self._step_last = 0

    def log(self, step: int, metrics: Mapping[str, float],
            prefix: str = "") -> None:
        now = time.perf_counter()
        record = {("%s%s" % (prefix, k)): float(v) for k, v in metrics.items()}
        record["step"] = int(step)
        if step > self._step_last:
            record["steps_per_sec"] = ((step - self._step_last) /
                                       max(now - self._t_last, 1e-9))
        self._t_last = now
        self._step_last = int(step)
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in record.items():
                if k != "step":
                    self._tb.add_scalar(k, v, int(step))
        print(" ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in record.items()), flush=True)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
