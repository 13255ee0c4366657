"""Metric logging: JSONL always, TensorBoard when available.

The reference logs 6 train losses + val accuracy to TensorBoard
(`train.py:337-342`); we keep the same scalar names, add a machine-readable
JSONL stream, and per-step timing (SURVEY.md §5 flags the reference's lack of
profiling hooks -- see also `profiler` in this module).
"""
from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Optional


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

    def add_scalar(self, name: str, value: float, step: int):
        self.jsonl.write(json.dumps({"step": step, name: float(value),
                                     "time": time.time()}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.add_scalar(name, float(value), step)

    def add_scalars(self, scalars: dict, step: int):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


@contextmanager
def profiler(trace_dir: Optional[str]):
    """jax.profiler trace scope; no-op when trace_dir is None."""
    if trace_dir:
        import jax
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
