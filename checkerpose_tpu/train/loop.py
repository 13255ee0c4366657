"""Training loop driver shared by the pretrain/train CLIs.

Reference cadence (`train.py:267-379`): infinite step loop over mixed
loaders, per-step loss logging, every `test_freq` steps a full validation
sweep gating the best checkpoint + a rolling keep-3 checkpoint.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from checkerpose_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import TrainState
from checkerpose_tpu.utils.logging import MetricWriter


def run_training(*, state: TrainState, step_fns, loader: Iterable,
                 total_iteration: int, eval_fn: Callable[[Dict], Dict],
                 ckpt: CheckpointManager, writer: MetricWriter,
                 log_freq: int = 100, test_freq: int = 1000,
                 save_freq: Optional[int] = None,
                 get_stage: Optional[Callable[[int], int]] = None,
                 extra_batch: Optional[Callable[[Dict], Dict]] = None,
                 mesh=None, seed: int = 0, sync_freq: int = 8) -> TrainState:
    """Args:
      step_fns: dict stage->jitted step (or {None: step} when no curriculum);
        each maps (state_dict, batch, key) -> (state_dict, metrics).
      eval_fn: state_dict -> metrics dict. The best checkpoint is gated on
        "gate_score" when present (with its metric named by "gate_metric"),
        else on "test_acc". Gate scores must be DECODE-INVARIANT and
        monotone with training quality (e.g. 1 - mean per-bit error):
        round 3 showed a tau-sensitive adaptive-decode gate freezes the
        best checkpoint forever when tau is retuned mid-run. The gate's
        memory lives in the metric-tagged best_score.json side record
        (CheckpointManager.best_floor), NOT in the restored state's
        best_score, so records written under a different gate definition
        are ignored rather than trusted. Reference gate semantics:
        /root/reference/checkerpose/train.py:367-370 (single stable metric
        for the whole run).
      save_freq: rolling-checkpoint cadence, decoupled from test_freq
        (defaults to test_freq). The rolling save happens BEFORE any eval at
        the same step: the tunneled TPU client can wedge with zero CPU inside
        an eval sweep (observed 2026-08-19: a segment died at its final eval
        and lost all 1200 steps), so the segment's work must already be on
        disk when the eval starts. Best-score freshness across the reordering
        is kept by CheckpointManager's best_score.json side record.
      get_stage: step -> curriculum stage (config.get_train_stage).
      extra_batch: hook to add derived fields (e.g. broadcast p3d_normed).
      sync_freq: materialize a result scalar on the host every N steps.
        Async dispatch otherwise races arbitrarily far ahead of device
        execution and the runtime retains every in-flight batch's buffers
        (measured: ~13 MB/step leak-like growth to 70+ GB and a 7x step-time
        degradation over 5k steps on the tunneled TPU). One scalar fetch per
        N steps bounds in-flight work at N batches. block_until_ready is NOT
        a substitute here: on this backend it returns before execution
        finishes (CLAUDE.md env rule 3).
    """
    mesh = mesh if mesh is not None else make_mesh()
    sd = {"params": replicate_tree(state.params, mesh),
          "batch_stats": replicate_tree(state.batch_stats, mesh),
          "opt_state": replicate_tree(state.opt_state, mesh)}
    key = jax.random.PRNGKey(seed)
    step_no = state.step
    # best-gate memory is resolved at the FIRST eval from the metric-tagged
    # side record (ckpt.best_floor): the restored state's best_score may have
    # been produced under a different gate metric and must not be trusted
    best = None
    t_last = time.time()
    data_iter = iter(loader)

    inflight = []
    loader_wait = 0.0  # time blocked on the input pipeline this log window
    while step_no < total_iteration:
        t_fetch = time.time()
        batch = next(data_iter)
        loader_wait += time.time() - t_fetch
        batch.pop("n_real", None)
        if extra_batch is not None:
            batch = extra_batch(batch)
        stage = get_stage(step_no) if get_stage else None
        step_fn = step_fns[stage] if stage is not None else step_fns[None]
        key, sub = jax.random.split(key)
        sharded = shard_batch(batch, mesh)
        sd, metrics = step_fn(sd, sharded, sub)
        inflight.append(sharded)
        step_no += 1
        if step_no % sync_freq == 0:
            float(metrics["loss"])  # host sync: bound in-flight batches
            # the sync proves every queued step is done -> force-free the
            # window's input buffers (the tunnel runtime otherwise retains
            # them: measured ~10 MB/step unbounded growth)
            for b in inflight:
                for v in b.values():
                    try:
                        v.delete()
                    except Exception:
                        pass
            inflight.clear()

        if step_no % log_freq == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = (time.time() - t_last) / log_freq
            t_last = time.time()
            m["step_time_s"] = dt
            # input-vs-compute attribution (VERDICT r2 #7): average time per
            # step the loop was BLOCKED waiting on the input pipeline
            m["loader_wait_s"] = loader_wait / log_freq
            loader_wait = 0.0
            eta_h = dt * (total_iteration - step_no) / 3600.0
            writer.add_scalars({f"TRAIN/{k}": v for k, v in m.items()}, step_no)
            print(f"step {step_no}/{total_iteration} "
                  + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                  + f" eta={eta_h:.2f}h", flush=True)

        at_end = step_no == total_iteration
        if step_no % (save_freq or test_freq) == 0 or at_end:
            # save BEFORE eval (see save_freq docstring): the eval sweep is
            # where tunnel wedges strike, and it must not hold the segment's
            # steps hostage. best_score staleness is covered by the
            # best_score.json floor applied on restore.
            ckpt.save(TrainState(params=sd["params"],
                                 batch_stats=sd["batch_stats"],
                                 opt_state=sd["opt_state"], step=step_no,
                                 best_score=(best if best is not None
                                             else float("-inf"))))
        if step_no % test_freq == 0 or at_end:
            ev = eval_fn({"params": sd["params"],
                          "batch_stats": sd["batch_stats"]})
            writer.add_scalar("TESTDATA_ACC/ACC_test", ev["test_acc"], step_no)
            gate = float(ev.get("gate_score", ev["test_acc"]))
            gate_metric = str(ev.get("gate_metric", "test_acc"))
            if best is None:
                best = ckpt.best_floor(gate_metric)
            print(f"eval @ {step_no}: " + " ".join(
                f"{k}={v:.4f}" for k, v in ev.items()
                if isinstance(v, (int, float)))
                + f" gate[{gate_metric}]={gate:.4f} (best {best:.4f})",
                flush=True)
            if gate > best:
                best = gate
                ckpt.save_best(TrainState(
                    params=sd["params"], batch_stats=sd["batch_stats"],
                    opt_state=sd["opt_state"], step=step_no, best_score=best),
                    metric=gate_metric)

    ckpt.wait()
    return TrainState(params=sd["params"], batch_stats=sd["batch_stats"],
                      opt_state=sd["opt_state"], step=step_no,
                      best_score=(best if best is not None else float("-inf")))
