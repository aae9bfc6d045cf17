"""Metrics registry + TensorBoard writer.

The reference logs 13 scalars per log step under train/* via
SummaryWriter (train_hybrid.py:621-624, 929-946). Uses torch's TB writer
when available, else buffers to a JSONL file (so headless/TPU-only
environments still get metric history).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict


class MetricsWriter:
    def __init__(self, log_dir: str):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(str(self.log_dir))
        except Exception:
            pass
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")

    def log(self, metrics: Dict[str, float], step: int,
            prefix: str = "train") -> None:
        clean = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
        self._jsonl.write(json.dumps(
            {"step": step, "time": time.time(), "prefix": prefix, **clean}) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
