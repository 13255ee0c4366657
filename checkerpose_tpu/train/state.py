"""Train state: params + BN stats + optimizer, with factories per model.

Optimizer semantics mirror the reference (Adam, cfg `learning_rate`,
`train.py:240-248`; two-phase LR drop for LM, `train_lm.py:247-249`) via an
optax schedule.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from checkerpose_tpu.models import InitNet, PoseNet


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int
    best_score: float

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(learning_rate: float, lr2: Optional[float] = None,
                   lr2_start: Optional[int] = None) -> optax.GradientTransformation:
    if lr2 is not None and lr2_start is not None:
        sched = optax.join_schedules(
            [optax.constant_schedule(learning_rate), optax.constant_schedule(lr2)],
            boundaries=[lr2_start])
        return optax.adam(sched)
    return optax.adam(learning_rate)


def create_init_state(net: InitNet, knn_idx: np.ndarray, crop_size_img: int,
                      optimizer: optax.GradientTransformation,
                      rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    img = jnp.zeros((1, crop_size_img, crop_size_img, 3), jnp.float32)
    variables = jax.jit(net.init, static_argnames=("train",))(rng, img, knn_idx, train=False)
    params = variables["params"]
    return TrainState(params=params, batch_stats=variables.get("batch_stats", FrozenDict()),
                      opt_state=optimizer.init(params), step=0, best_score=-1.0)


def create_pose_state(net: PoseNet, knn_idx: np.ndarray, crop_size_img: int,
                      optimizer: optax.GradientTransformation, npoint: int,
                      rng=None, init_params=None) -> TrainState:
    """init_params: optional pretrained InitNet params to graft in (the
    reference's non-strict pretrain->train handoff, `train.py:212-218`)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    img = jnp.zeros((1, crop_size_img, crop_size_img, 3), jnp.float32)
    p3d = jnp.zeros((1, npoint, 3), jnp.float32)
    # train=True so train-only submodules (the opt-in aux_refine_heads convs)
    # create their params; BatchNorm running stats keep their initializer
    # values during init (flax guards updates with is_initializing), so the
    # resulting variables are identical to a train=False init otherwise.
    variables = jax.jit(
        net.init, static_argnames=("stage", "train"),
    )(rng, img, knn_idx, p3d, stage=net.num_refine_steps, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    if init_params is not None:
        params = graft_init_params(params, init_params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=optimizer.init(params), step=0, best_score=-1.0)


def graft_init_params(pose_params, init_bundle):
    """Copy pretrained InitNet params (and optionally batch_stats) into the
    PoseNet's `init_net` submodule -- keys present in both are overwritten,
    missing/unexpected keys are reported (the reference loads non-strict and
    prints them, `train.py:212-218`)."""
    init_params = init_bundle["params"] if "params" in init_bundle else init_bundle
    pose = jax.tree_util.tree_map(lambda x: x, dict(pose_params))  # shallow-ish copy
    tgt = dict(pose.get("init_net", {}))
    missing, loaded = [], []
    for k, v in init_params.items():
        if k in tgt:
            tgt[k] = v
            loaded.append(k)
        else:
            missing.append(k)
    pose["init_net"] = tgt
    if missing:
        print(f"graft_init_params: unexpected keys not grafted: {missing}")
    print(f"graft_init_params: loaded {len(loaded)} top-level modules into init_net")
    return pose


def param_count(params) -> float:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)) / 1e6
