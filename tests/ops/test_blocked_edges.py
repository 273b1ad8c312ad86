"""Blocked per-edge-feature message passing: layout + kernel parity.

Oracle: the plain COO evaluation of the VanillaNetwork message rule
(reference: deeprank2/neuralnets/gnn/vanilla_gnn.py:10-41)."""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from deeprank2_tpu.ops.blocked_edges import (
    EDGE_TILE,
    TILE_E,
    blocked_message_sum,
    blocked_message_sum_xla,
    build_blocked_edges,
    required_slabs,
)


def _random_graph(num_nodes: int, num_pairs: int, fe: int = 6, seed: int = 0):
    rng = np.random.default_rng(seed)
    und = rng.integers(0, num_nodes, size=(num_pairs, 2))
    und = und[und[:, 0] != und[:, 1]]
    eattr = rng.normal(size=(len(und), fe)).astype(np.float32)
    return und, eattr


def _coo_oracle(und, eattr, num_nodes, xr, xc, w_e):
    """Dense-python evaluation of the message sum over mirrored edges."""
    out = np.zeros_like(xr)
    rows = np.concatenate([und[:, 0], und[:, 1]])
    cols = np.concatenate([und[:, 1], und[:, 0]])
    ea = np.concatenate([eattr, eattr], axis=0)
    pre = xr[rows] + xc[cols] + ea @ w_e
    msg = np.maximum(pre, 0.0)
    np.add.at(out, rows, msg)
    return out


@pytest.mark.parametrize("num_nodes,num_pairs", [(50, 200), (300, 2000), (1000, 8000)])
def test_xla_path_matches_coo_oracle(num_nodes, num_pairs):
    und, eattr = _random_graph(num_nodes, num_pairs)
    structure = build_blocked_edges(und, eattr, num_nodes)
    v_pad = structure.padded_nodes
    rng = np.random.default_rng(1)
    m = 32
    xr = np.zeros((v_pad, m), dtype=np.float32)
    xc = np.zeros((v_pad, m), dtype=np.float32)
    xr[:num_nodes] = rng.normal(size=(num_nodes, m))
    xc[:num_nodes] = rng.normal(size=(num_nodes, m))
    w_e = rng.normal(size=(eattr.shape[1], m)).astype(np.float32)

    got = blocked_message_sum_xla(structure, jnp.asarray(xr), jnp.asarray(xc), jnp.asarray(w_e))
    want = _coo_oracle(und, eattr, num_nodes, xr, xc, w_e)
    np.testing.assert_allclose(np.asarray(got)[:num_nodes], want[:num_nodes], rtol=1e-5, atol=1e-5)
    # padded node rows receive nothing
    np.testing.assert_array_equal(np.asarray(got)[num_nodes:], 0.0)


def test_structure_shapes_and_padding():
    und, eattr = _random_graph(500, 3000)
    structure = build_blocked_edges(und, eattr, 500)
    assert structure.padded_nodes % EDGE_TILE == 0
    e_cap = structure.row_local.shape[0]
    assert e_cap % TILE_E == 0
    assert structure.step_row.shape[0] == e_cap // TILE_E
    # every real edge is represented exactly once (sentinel rows are pads)
    assert int((np.asarray(structure.row_local) < EDGE_TILE).sum()) == 2 * len(und)
    assert required_slabs(und, 500) == structure.num_slabs
    # the XLA evaluation over (step_row, sub_col, locals) reproduces exactly
    # the mirrored edge multiset
    from deeprank2_tpu.ops.blocked_edges import global_indices

    grow, gcol = global_indices(structure)
    real = np.asarray(grow) < structure.padded_nodes
    got = {tuple(p) for p in np.stack([np.asarray(grow)[real], np.asarray(gcol)[real]], axis=1)}
    want = {(int(a), int(b)) for a, b in und} | {(int(b), int(a)) for a, b in und}
    assert got == want


def test_slab_capacity_bucketing():
    und, eattr = _random_graph(200, 1000)
    req = required_slabs(und, 200)
    structure = build_blocked_edges(und, eattr, 200, pad_slabs=req + 3)
    assert structure.num_slabs == req + 3
    # capacity pads change nothing numerically
    base = build_blocked_edges(und, eattr, 200)
    v_pad = structure.padded_nodes
    rng = np.random.default_rng(2)
    xr = rng.normal(size=(v_pad, 8)).astype(np.float32)
    xc = rng.normal(size=(v_pad, 8)).astype(np.float32)
    w_e = rng.normal(size=(eattr.shape[1], 8)).astype(np.float32)
    a = blocked_message_sum_xla(structure, xr, xc, w_e)
    b = blocked_message_sum_xla(base, xr, xc, w_e)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    with pytest.raises(ValueError, match="pad_slabs"):
        build_blocked_edges(und, eattr, 200, pad_slabs=max(req - 1, 0))


def test_empty_edges():
    structure = build_blocked_edges(np.zeros((0, 2), np.int64), np.zeros((0, 6), np.float32), 100)
    xr = jnp.ones((structure.padded_nodes, 4))
    out = blocked_message_sum_xla(structure, xr, xr, jnp.ones((6, 4)))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_gradients_match_coo_autodiff():
    und, eattr = _random_graph(120, 700)
    structure = build_blocked_edges(und, eattr, 120)
    v_pad = structure.padded_nodes
    rng = np.random.default_rng(3)
    m = 16
    xr = jnp.asarray(rng.normal(size=(v_pad, m)), dtype=jnp.float32)
    xc = jnp.asarray(rng.normal(size=(v_pad, m)), dtype=jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(eattr.shape[1], m)), dtype=jnp.float32)

    rows = np.concatenate([und[:, 0], und[:, 1]])
    cols = np.concatenate([und[:, 1], und[:, 0]])
    ea = jnp.asarray(np.concatenate([eattr, eattr], axis=0))

    def blocked_loss(xr, xc, w_e):
        out = blocked_message_sum(structure, xr, xc, w_e)
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

    def coo_loss(xr, xc, w_e):
        pre = xr[rows] + xc[cols] + ea @ w_e
        msg = jax.nn.relu(pre)
        out = jax.ops.segment_sum(msg, rows, num_segments=v_pad)
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

    got = jax.grad(blocked_loss, argnums=(0, 1, 2))(xr, xc, w_e)
    want = jax.grad(coo_loss, argnums=(0, 1, 2))(xr, xc, w_e)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4)


def _entries(num_graphs=3, nodes=90, feat=10, fe=6, seed=5):
    rng = np.random.default_rng(seed)
    out = []
    for g in range(num_graphs):
        v = nodes + g * 7
        pos = rng.uniform(0, 30, size=(v, 3)).astype(np.float32)
        from scipy.spatial import cKDTree

        pairs = cKDTree(pos).query_pairs(6.0, output_type="ndarray").astype(np.int64)
        out.append(
            {
                "x": rng.normal(size=(v, feat)).astype(np.float32),
                "edge_index": pairs,
                "edge_attr": rng.normal(size=(len(pairs), fe)).astype(np.float32),
                "pos": pos,
                "y": float(g % 2),
                "entry_name": f"g{g}",
            }
        )
    return out


def test_vanilla_blocked_matches_coo_model():
    """VanillaNetworkBlocked == VanillaNetwork on the same entries/params:
    forward predictions and parameter gradients agree."""
    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetwork, VanillaNetworkBlocked
    from deeprank2_tpu.ops.batch import collate_graphs, collate_graphs_blocked
    from deeprank2_tpu.ops.losses import CrossEntropyLoss

    entries = _entries()
    feat, fe = entries[0]["x"].shape[1], entries[0]["edge_attr"].shape[1]
    coo_batch, _ = collate_graphs(entries)
    blk_batch, _ = collate_graphs_blocked(entries)

    model_coo = VanillaNetwork(feat, 2, fe)
    model_blk = VanillaNetworkBlocked(feat, 2, fe)
    params = model_coo.init(jax.random.PRNGKey(0))

    pred_coo = model_coo.apply(params, coo_batch)
    pred_blk = model_blk.apply(params, blk_batch)
    np.testing.assert_allclose(np.asarray(pred_blk), np.asarray(pred_coo), rtol=2e-4, atol=2e-4)

    loss_fn = CrossEntropyLoss()

    def loss_of(model, batch):
        def f(p):
            pred = model.apply(p, batch)
            return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

        return f

    g_coo = jax.grad(loss_of(model_coo, coo_batch))(params)
    g_blk = jax.grad(loss_of(model_blk, blk_batch))(params)
    flat_coo, _ = jax.flatten_util.ravel_pytree(g_coo)
    flat_blk, _ = jax.flatten_util.ravel_pytree(g_blk)
    np.testing.assert_allclose(np.asarray(flat_blk), np.asarray(flat_coo), rtol=2e-3, atol=2e-4)


def test_trainer_smoke_blocked(tmp_path):
    """End-to-end: atomic-style entries -> BlockedEdgeBatch -> train epochs."""
    from deeprank2_tpu.ops.batch import collate_graphs_blocked

    entries = _entries(num_graphs=4)
    batch, names = collate_graphs_blocked(entries, pad_graphs=6)
    assert names[:4] == ["g0", "g1", "g2", "g3"]
    assert batch.y_mask.sum() == 4

    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetworkBlocked
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    feat, fe = entries[0]["x"].shape[1], entries[0]["edge_attr"].shape[1]
    model = VanillaNetworkBlocked(feat, 2, fe)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()
    batch = jax.device_put(batch)

    @jax.jit
    def step(params, opt_state, batch):
        def f(p):
            pred = model.apply(p, batch, training=True, rng=jax.random.PRNGKey(2))
            return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

        loss, grads = jax.value_and_grad(f)(params)
        params, opt_state = optimizer.step(params, grads, opt_state)
        return params, opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_pallas_kernel_logic_interpret_mode():
    """The Pallas kernels (fwd + both backward passes) match the XLA
    reference exactly in interpret mode — the logic check that runs without
    TPU hardware (numerics on the real chip: <= 3e-5 max abs diff, verified
    on v5e)."""
    from deeprank2_tpu.ops import pallas_vanilla

    und, eattr = _random_graph(700, 5000)
    structure = build_blocked_edges(und, eattr, 700)
    v_pad = structure.padded_nodes
    rng = np.random.default_rng(7)
    m = 32
    xr = jnp.asarray(rng.normal(size=(v_pad, m)), dtype=jnp.float32)
    xc = jnp.asarray(rng.normal(size=(v_pad, m)), dtype=jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(eattr.shape[1], m)), dtype=jnp.float32)

    old = pallas_vanilla._INTERPRET
    pallas_vanilla._INTERPRET = True
    try:
        out_k = pallas_vanilla.blocked_message_sum_tpu(structure, xr, xc, w_e)
        out_ref = blocked_message_sum_xla(structure, xr, xc, w_e)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), rtol=1e-5, atol=1e-4)

        def loss(fn):
            def f(xr, xc, w_e):
                o = fn(structure, xr, xc, w_e)
                return jnp.sum(o * jnp.sin(jnp.arange(o.size).reshape(o.shape)))

            return f

        g_k = jax.grad(loss(pallas_vanilla.blocked_message_sum_tpu), argnums=(0, 1, 2))(xr, xc, w_e)
        g_ref = jax.grad(loss(blocked_message_sum_xla), argnums=(0, 1, 2))(xr, xc, w_e)
        for a, b in zip(g_k, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3)
    finally:
        pallas_vanilla._INTERPRET = old
