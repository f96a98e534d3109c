"""Sharded train step: dp over batch, tp over wide conv channels.

Both model families train under one step function jitted over a
("dp", "tp") mesh: parameters are placed with parallel.mesh.shard_params
(output channels over tp where divisible), batches are dp-sharded, and
XLA derives the gradient psums / activation all-gathers from the
shardings — no hand-written collectives.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import orientation_net, yolov4_tiny
from . import losses


@dataclasses.dataclass
class TrainState:
    variables: Dict[str, Any]   # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    step: jnp.ndarray


def _split_variables(variables):
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    return params, rest


def make_train_step(loss_kind: str, model_cfg, tx: optax.GradientTransformation,
                    mesh: Mesh | None = None) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    loss_kind: "yolo" (batch = images, tgt_boxes, tgt_class, tgt_pos) or
    "multibin" (batch = crops, tgt_dims, tgt_bin, tgt_angle_offset).
    """
    if loss_kind == "yolo":
        loss_fn = functools.partial(losses.yolo_loss, cfg=model_cfg)
    elif loss_kind == "multibin":
        loss_fn = functools.partial(losses.multibin_loss, cfg=model_cfg)
    else:
        raise ValueError(loss_kind)

    def train_step(state: TrainState, *batch):
        params, rest = _split_variables(state.variables)

        def wrapped(p):
            variables = {"params": p, **rest}
            loss, (mutated, aux) = loss_fn(variables, *batch, train=True)
            return loss, (mutated, aux)

        (loss, (mutated, aux)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(params)
        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_vars = {"params": new_params, **rest}
        new_vars.update(mutated)
        metrics = {"loss": loss, **aux}
        return TrainState(variables=new_vars, opt_state=new_opt,
                          step=state.step + 1), metrics

    if mesh is not None:
        dp = NamedSharding(mesh, P("dp"))

        def sharded_step(state, *batch):
            batch = tuple(
                jax.lax.with_sharding_constraint(b, dp) for b in batch)
            return train_step(state, *batch)

        return jax.jit(sharded_step, donate_argnums=(0,))
    return jax.jit(train_step, donate_argnums=(0,))


def init_train_state(loss_kind: str, model_cfg,
                     tx: optax.GradientTransformation,
                     rng: jax.Array) -> TrainState:
    if loss_kind == "yolo":
        variables = yolov4_tiny.init_params(rng, model_cfg)
    else:
        variables = orientation_net.init_params(rng, model_cfg)
    variables = dict(variables)
    opt_state = tx.init(variables["params"])
    return TrainState(variables=variables, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


# TrainState must be a pytree for jit/donation.
jax.tree_util.register_dataclass(
    TrainState, data_fields=["variables", "opt_state", "step"],
    meta_fields=[])
