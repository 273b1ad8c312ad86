"""Data-parallel training over a device mesh.

The TPU replacement for the reference's ``nn.DataParallel`` (trainer.py:387):
each device holds one padded sub-batch (leading axis ``[D, ...]``), computes
loss and gradients locally under ``shard_map``, and gradients are averaged with
``pmean`` over the ICI mesh before a replicated optimizer step.

Loss reporting note: the global loss is the pmean of per-shard masked means;
with unevenly filled shards this deviates from the exact global masked mean by
the shard-count imbalance (standard DP behavior).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def default_mesh(axis_name: str = "dp", devices=None) -> Mesh:
    """A 1D mesh over all (or the given) local devices."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def make_dp_train_step(compute_loss, optimizer, mesh: Mesh | None = None, axis: str = "dp"):
    """Jitted data-parallel train step.

    ``compute_loss(params, batch, rng, training) -> (loss, pred)`` runs per
    shard; the batch pytree must have a leading device axis on every array.
    Returns a function ``(params, opt_state, rng, sharded_batch) -> (params,
    opt_state, loss, pred)`` with ``pred`` still sharded ``[D, G, ...]``.
    """
    mesh = mesh or default_mesh(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)),
        out_specs=(P(), P(), P(), P(axis), P()),
        check_rep=False,
    )
    def step(params, opt_state, rng, batch):
        local = jax.tree.map(lambda a: a[0], batch)  # drop the size-1 shard axis
        next_rng, shard_base = jax.random.split(rng)
        shard_rng = jax.random.fold_in(shard_base, jax.lax.axis_index(axis))
        (loss, pred), grads = jax.value_and_grad(lambda p: compute_loss(p, local, shard_rng, True), has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        params, opt_state = optimizer.step(params, grads, opt_state)
        return params, opt_state, loss, pred[None], next_rng

    return jax.jit(step)


def make_dp_eval_step(compute_loss, mesh: Mesh | None = None, axis: str = "dp"):
    """Jitted data-parallel eval step over a sharded batch."""
    mesh = mesh or default_mesh(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P(axis)),
        check_rep=False,
    )
    def step(params, batch):
        local = jax.tree.map(lambda a: a[0], batch)
        loss, pred = compute_loss(params, local, None, False)
        loss = jax.lax.pmean(loss, axis)
        return loss, pred[None]

    return jax.jit(step)
