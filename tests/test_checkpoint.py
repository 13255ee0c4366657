import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import TrainState


def _mk_state(step, scale=1.0):
    params = {"dense": {"kernel": jnp.full((4, 4), scale), "bias": jnp.zeros(4)}}
    bs = {"bn": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}
    opt = {"mu": jax.tree.map(jnp.zeros_like, params)}
    return TrainState(params=params, batch_stats=bs, opt_state=opt,
                      step=step, best_score=0.5)


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    st = _mk_state(100, scale=3.0)
    mgr.save(st)
    mgr.wait()
    restored = mgr.restore(_mk_state(0))
    assert restored.step == 100
    assert restored.best_score == 0.5
    np.testing.assert_array_equal(np.asarray(restored.params["dense"]["kernel"]),
                                  np.full((4, 4), 3.0))


def test_keep_3_rolling(tmp_path):
    """Rolling window of 3 step checkpoints, resume from max step -- the
    reference's retention semantics (utils.py:4-31)."""
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=3)
    for s in (10, 20, 30, 40):
        mgr.save(_mk_state(s, scale=float(s)))
    mgr.wait()
    assert mgr.latest_step() == 40
    steps = sorted(mgr.mgr.all_steps())
    assert steps == [20, 30, 40]
    restored = mgr.restore(_mk_state(0))
    assert restored.step == 40


def test_restore_eval_across_optimizers(tmp_path):
    """A checkpoint saved under the two-phase-lr optimizer (whose opt_state
    carries a schedule count) must restore into an eval CLI built with a
    plain optimizer: restore_eval ignores opt_state structure entirely.
    Regression: the synth proof's final cli.test crashed on the structural
    mismatch (EmptyState vs dict at opt_state[1])."""
    import optax
    from checkerpose_tpu.train.state import make_optimizer

    params = {"dense": {"kernel": jnp.full((4, 4), 3.0), "bias": jnp.zeros(4)}}
    bs = {"bn": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}
    sched_opt = make_optimizer(1e-4, lr2=5e-5, lr2_start=100)
    st = TrainState(params=params, batch_stats=bs,
                    opt_state=sched_opt.init(params), step=7, best_score=0.3)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(st)
    mgr.wait()

    plain_opt = make_optimizer(1e-4)
    fresh = TrainState(params=jax.tree.map(jnp.zeros_like, params),
                       batch_stats=jax.tree.map(jnp.zeros_like, bs),
                       opt_state=plain_opt.init(params), step=0, best_score=0.0)
    restored = mgr.restore_eval(fresh)
    assert restored.step == 7
    np.testing.assert_array_equal(np.asarray(restored.params["dense"]["kernel"]),
                                  np.full((4, 4), 3.0))
    # fresh opt_state is kept as-is (eval never steps the optimizer)
    assert restored.opt_state is fresh.opt_state


def test_best_checkpoint_separate(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    st = _mk_state(10, scale=1.0)
    st.best_score = 0.7
    mgr.save_best(st)
    for s in (20, 30):
        mgr.save(_mk_state(s, scale=2.0))
    mgr.wait()
    best = mgr.restore(_mk_state(0), best=True)
    assert best.step == 10 and abs(best.best_score - 0.7) < 1e-6  # f32 roundtrip
    np.testing.assert_array_equal(np.asarray(best.params["dense"]["kernel"]),
                                  np.ones((4, 4)))


def test_best_score_floor_survives_pre_eval_save(tmp_path):
    """loop.py saves the rolling checkpoint BEFORE the eval at the same step
    (wedge-proofing: a tunnel stall inside eval must not lose the segment),
    so the rolling ckpt can carry a stale best_score. save_best side-records
    the score in best_score.json and restore floors with it, so a resumed
    segment can never let a worse model overwrite the best checkpoint."""
    mgr = CheckpointManager(str(tmp_path / "ck"))
    # step 10: rolling save (best still 0.5), then eval improves to 0.9
    mgr.save(_mk_state(10))
    st = _mk_state(10)
    st.best_score = 0.9
    mgr.save_best(st)
    mgr.wait()
    # resume from the rolling ckpt: best_score must be the FLOORED 0.9,
    # not the stale 0.5 stored inside the rolling payload
    restored = mgr.restore(_mk_state(0))
    assert abs(restored.best_score - 0.9) < 1e-6
    restored_eval = mgr.restore_eval(_mk_state(0))
    assert abs(restored_eval.best_score - 0.9) < 1e-6
    # the best ckpt itself reports its own score unfloored
    best = mgr.restore(_mk_state(0), best=True)
    assert abs(best.best_score - 0.9) < 1e-6
