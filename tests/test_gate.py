"""Best-checkpoint gate: decode-invariant scoring + stale-record migration.

Round-3 postmortem (VERDICT r3 weak #2): the gate scored a tau-sensitive
adaptive-decode adx10; retuning tau mid-run left a stale high record that
froze the best checkpoint forever while the net kept improving. The fix
gates on a decode-invariant signal (1 - mean per-bit error) whose memory is
a METRIC-TAGGED best_score.json record — scores from a different (or legacy
untagged) gate definition are ignored, matching the reference's stable
single-metric gate semantics (/root/reference/checkerpose/train.py:367-370).
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.loop import run_training
from checkerpose_tpu.train.state import TrainState
from checkerpose_tpu.utils.logging import MetricWriter


def test_best_floor_is_metric_tagged(tmp_path):
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d)
    # legacy record (no metric tag): must not floor any metric
    with open(os.path.join(mgr.dir, "best_score.json"), "w") as f:
        json.dump({"step": 3600, "best_score": 0.6328}, f)
    assert mgr.best_floor("one_minus_mean_bit_err") == float("-inf")
    assert mgr.best_floor("test_acc") == float("-inf")
    # tagged record floors ONLY its own metric
    with open(os.path.join(mgr.dir, "best_score.json"), "w") as f:
        json.dump({"step": 100, "best_score": 0.7,
                   "metric": "one_minus_mean_bit_err"}, f)
    assert mgr.best_floor("one_minus_mean_bit_err") == pytest.approx(0.7)
    assert mgr.best_floor("test_acc") == float("-inf")
    # absent record
    os.remove(os.path.join(mgr.dir, "best_score.json"))
    assert mgr.best_floor("one_minus_mean_bit_err") == float("-inf")


def _toy_loader():
    while True:
        yield {"x": np.zeros((8, 2), np.float32)}


def test_gate_advances_regardless_of_tau_swings(tmp_path):
    """Improving per-bit nets always advance the best ckpt even when the
    tau-sensitive test_acc swings wildly AND a stale legacy record with an
    unbeatable score sits in best_score.json (the exact r3 failure)."""
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    # the r3 poison pill: legacy (untagged) record with a score nothing beats
    with open(os.path.join(ckpt.dir, "best_score.json"), "w") as f:
        json.dump({"step": 3600, "best_score": 0.9999}, f)

    state = TrainState(params={"w": np.zeros((4,), np.float32)},
                       batch_stats={}, opt_state={}, step=0, best_score=0.9999)

    def step_fn(sd, batch, key):
        return sd, {"loss": jnp.float32(1.0)}

    evals = []

    def eval_fn(variables):
        i = len(evals)
        evals.append(i)
        # test_acc swings (tau retune artifact); per-bit gate improves
        return {"test_acc": [0.9, 0.1, 0.5][i],
                "gate_score": [0.2, 0.5, 0.8][i],
                "gate_metric": "one_minus_mean_bit_err"}

    writer = MetricWriter(str(tmp_path / "tb"))
    final = run_training(
        state=state, step_fns={None: step_fn}, loader=_toy_loader(),
        total_iteration=6, eval_fn=eval_fn, ckpt=ckpt, writer=writer,
        log_freq=100, test_freq=2)
    writer.close()

    assert len(evals) == 3
    # best ckpt advanced at EVERY eval -> sits at the last step
    assert ckpt.best_mgr.latest_step() == 6
    assert final.best_score == pytest.approx(0.8)
    with open(os.path.join(ckpt.dir, "best_score.json")) as f:
        rec = json.load(f)
    assert rec == {"step": 6, "best_score": pytest.approx(0.8),
                   "metric": "one_minus_mean_bit_err"}


def test_gate_same_metric_record_still_floors(tmp_path):
    """A record written under the SAME gate metric keeps gating across
    segment restarts (no churn: worse evals must not steal the best slot)."""
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    with open(os.path.join(ckpt.dir, "best_score.json"), "w") as f:
        json.dump({"step": 50, "best_score": 0.75,
                   "metric": "one_minus_mean_bit_err"}, f)

    state = TrainState(params={"w": np.zeros((4,), np.float32)},
                       batch_stats={}, opt_state={}, step=0, best_score=-1.0)

    def step_fn(sd, batch, key):
        return sd, {"loss": jnp.float32(1.0)}

    def eval_fn(variables):
        return {"test_acc": 0.99, "gate_score": 0.5,
                "gate_metric": "one_minus_mean_bit_err"}

    writer = MetricWriter(str(tmp_path / "tb"))
    run_training(
        state=state, step_fns={None: step_fn}, loader=_toy_loader(),
        total_iteration=2, eval_fn=eval_fn, ckpt=ckpt, writer=writer,
        log_freq=100, test_freq=2)
    writer.close()

    # 0.5 < floor 0.75 -> no best save happened
    assert ckpt.best_mgr.latest_step() is None
    with open(os.path.join(ckpt.dir, "best_score.json")) as f:
        assert json.load(f)["best_score"] == pytest.approx(0.75)
