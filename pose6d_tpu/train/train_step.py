"""Jitted train step + optimizer (single-chip and data-parallel).

Mirrors the reference's optimization recipe (scripts/train.py:71-124 and
config/dpfm_orig.gin): RMSprop lr 5e-4 (torch semantics: alpha 0.99,
eps 1e-8 outside the sqrt), global-norm gradient clipping at 5.0, and a
step-decay schedule (lr * decay_factor every decay_iter epochs). Unlike
the reference, optimizer state is part of the checkpointed train state.

Data parallelism: the same step shards over the batch axis of a 1-D
jax.sharding.Mesh; gradients are averaged by XLA-inserted collectives
over ICI — see pose6d_tpu.parallel.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import DPFMConfig, DPFMNet
from .loss import DPFMLossConfig, dpfm_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 5e-4, decay_factor: float = 0.1,
                   decay_every_steps: int = 0, clip_norm: float = 5.0):
    """RMSprop with torch semantics + step decay + global-norm clip."""
    if decay_every_steps > 0:
        schedule = lambda step: lr * decay_factor ** (  # noqa: E731
            step // decay_every_steps)
    else:
        schedule = lr
    try:
        rms = optax.rmsprop(schedule, decay=0.99, eps=1e-8,
                            eps_in_sqrt=False)
    except TypeError:  # older optax without eps_in_sqrt
        rms = optax.rmsprop(schedule, decay=0.99, eps=1e-8)
    return optax.chain(optax.clip_by_global_norm(clip_norm), rms)


def make_train_step(model_cfg: DPFMConfig = DPFMConfig(),
                    loss_cfg: DPFMLossConfig = DPFMLossConfig(),
                    optimizer=None, augment_angle: float = 0.0,
                    augment_trans: float = 0.0):
    """Returns (init_fn, step_fn).

    init_fn(key, example_batch) -> TrainState
    step_fn(state, batch, key) -> (TrainState, logs)

    augment_angle/augment_trans: train-time rigid perturbation of the
    partial cloud (train/augment.py) — spectral quantities and GT stay
    valid under rigid motion; 0 disables (reference behavior).
    """
    model = DPFMNet(model_cfg)
    tx = optimizer if optimizer is not None else make_optimizer()
    from .augment import augment_pc_batch

    def fwd_batch(params, batch):
        return jax.vmap(lambda c, p: model.apply(params, c, p))(
            batch["cad"], batch["pc"])

    def init_fn(key, example_batch):
        one = jax.tree_util.tree_map(lambda x: x[0], example_batch)
        params = model.init(key, one["cad"], one["pc"])
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def loss_fn(params, batch, key):
        out = fwd_batch(params, batch)
        loss, logs = dpfm_loss(key, out, batch, loss_cfg)
        return loss, (logs, out["C"])

    def step_fn(state, batch, key):
        if augment_angle > 0.0 or augment_trans > 0.0:
            kaug, key = jax.random.split(key)
            batch = augment_pc_batch(kaug, batch, augment_angle,
                                     augment_trans)
        (loss, (logs, C)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        logs["grad_norm"] = optax.global_norm(grads)
        # the step's own forward's fmap, exposed so metrics (IR logging)
        # reuse it instead of paying a second forward (reference
        # train.py:109-116 computes IR from the same forward)
        logs["_C"] = C
        return TrainState(params, opt_state, state.step + 1), logs

    return init_fn, step_fn, fwd_batch
