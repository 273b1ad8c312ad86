"""Parity tests for the fused Pallas GINet tower kernel (ops/pallas_ginet.py).

Runs in Pallas interpreter mode on CPU (conftest forces jax_platforms=cpu);
the same kernels compile for TPU via Mosaic.
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import deeprank2_tpu.ops.pallas_ginet as pg


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        return orig(*args, **kwargs, interpret=True)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _inputs(G=16, N=64, F=38, C1=32, C2=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(G, N, F)), jnp.float32)
    adj = np.asarray(rng.random((G, N, N)) < 0.1, np.float32)
    adj = jnp.asarray(np.maximum(adj, adj.transpose(0, 2, 1)))
    mask = jnp.asarray(rng.random((G, N)) < 0.9, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(F, C1)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(C1, C2)) * 0.1, jnp.float32)
    return w1, w2, x, adj, mask


def test_forward_matches_reference(interpret_pallas):
    w1, w2, x, adj, mask = _inputs()
    out = pg.ginet_tower_pooled(w1, w2, x, adj, mask)
    ref = pg.ginet_tower_pooled_reference(w1, w2, x, adj, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_weight_gradients_match_reference(interpret_pallas):
    w1, w2, x, adj, mask = _inputs()

    def loss(fn, w1, w2):
        return (fn(w1, w2, x, adj, mask) ** 2).sum() * 1e-4

    g1, g2 = jax.grad(lambda a, b: loss(pg.ginet_tower_pooled, a, b), argnums=(0, 1))(w1, w2)
    r1, r2 = jax.grad(lambda a, b: loss(pg.ginet_tower_pooled_reference, a, b), argnums=(0, 1))(w1, w2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=1e-4, atol=1e-3 * float(jnp.abs(r1).max()))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), rtol=1e-4, atol=1e-3 * float(jnp.abs(r2).max()))


def test_batch_and_data_cotangents_are_zero(interpret_pallas):
    # x/adj/mask are data, not parameters: the custom VJP returns zeros so
    # they never receive spurious gradients if someone differentiates them.
    w1, w2, x, adj, mask = _inputs(G=16, N=32)
    dx, dadj = jax.grad(lambda x_, a_: pg.ginet_tower_pooled(w1, w2, x_, a_, mask).sum(), argnums=(0, 1))(x, adj)
    assert float(jnp.abs(dx).max()) == 0.0
    assert float(jnp.abs(dadj).max()) == 0.0


def test_block_graphs_and_supports():
    assert pg._block_graphs(512) == pg._BLOCK_GRAPHS
    assert pg._block_graphs(24) == 8
    assert pg._block_graphs(12) == 0  # not divisible by the minimum block
    assert not pg.supports(512)  # CPU backend in tests -> unsupported


def test_ginet_dense_pallas_backend_fallback_and_parity(interpret_pallas, monkeypatch):
    """With the pallas backend selected, GINetDense matches its XLA path."""
    from deeprank2_tpu.neuralnets.gnn import ginet_dense as gd
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    entries = synthetic_entries(16, 48, 38, 6, seed=3)
    batch, _ = collate_graphs_dense(entries, pad_graphs=16, pad_nodes=64)
    batch = jax.tree.map(jnp.asarray, batch)
    model = gd.GINetDense(38, 2, 6)
    params = model.init(jax.random.PRNGKey(0))
    ref = model.apply(params, batch)

    # on CPU supports() is False -> silently falls back to the XLA path
    gd.set_dense_tower_backend("pallas")
    try:
        out = model.apply(params, batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
        # force the kernel (interpreted) to check the fused-weight wiring
        with mock.patch.object(pg, "supports", return_value=True):
            out_k = model.apply(params, batch)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=1e-5, atol=1e-5)
    finally:
        gd.set_dense_tower_backend("xla")

    with pytest.raises(ValueError, match="unknown dense tower backend"):
        gd.set_dense_tower_backend("nope")
