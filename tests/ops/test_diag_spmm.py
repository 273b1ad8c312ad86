"""Graph-diagonal SpMM oracles (ops/diag_spmm.py).

The TPU kernel runs in interpret mode on CPU here; the real-hardware path is
exercised by bench.py and tests/perf/sol_perf.py. A kernel fault must FAIL
these tests (not skip) — interpret mode is the kernel's only CPU coverage.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from deeprank2_tpu.ops import diag_spmm

GS = diag_spmm.GS  # 16 by default; tests build G as a multiple of it


def _batch(g=GS, n=32, f=10, seed=0):
    rng = np.random.default_rng(seed)
    adj = rng.random((g, n, n)) < 0.2
    adj = adj | adj.transpose(0, 2, 1)
    x_t = rng.normal(size=(f, g * n)).astype(np.float32)
    return jnp.asarray(adj.astype(np.int8)), jnp.asarray(x_t)


def test_xla_fallback_matches_per_graph_matmul() -> None:
    adj, x_t = _batch()
    out = np.asarray(diag_spmm.diag_spmm_t_xla(adj, x_t))
    a = np.asarray(adj, np.float32)
    for gi in range(adj.shape[0]):
        seg = slice(gi * 32, (gi + 1) * 32)
        np.testing.assert_allclose(out[:, seg], np.asarray(x_t)[:, seg] @ a[gi].T, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_kernel_interpret_matches_xla(compute_dtype) -> None:
    adj, x_t = _batch(seed=2)
    want = np.asarray(diag_spmm.diag_spmm_t_xla(adj, x_t))
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(diag_spmm._diag_spmm_tpu(adj, x_t, None, relu=False, compute_dtype=compute_dtype))
    except NotImplementedError as e:  # pragma: no cover - interpreter support varies
        pytest.skip(f"pallas interpret mode unavailable here: {e}")
    tol = 5e-4 if compute_dtype == "float32" else 5e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_kernel_interpret_relu_mask_epilogue() -> None:
    adj, x_t = _batch(seed=3)
    g, n = adj.shape[0], adj.shape[1]
    mask = np.ones((g, n), bool)
    mask[:, n - 5 :] = False
    agg = np.asarray(diag_spmm.diag_spmm_t_xla(adj, x_t))
    want = np.maximum(agg, 0.0) * mask.reshape(1, g * n)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(diag_spmm._diag_spmm_tpu(adj, x_t, jnp.asarray(mask), relu=True, compute_dtype="float32"))
    except NotImplementedError as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable here: {e}")
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_diag_layer_grad_matches_autodiff_reference() -> None:
    adj, x_t = _batch(g=4, n=16, f=6, seed=4)
    g, n = adj.shape[0], adj.shape[1]
    mask = jnp.asarray(np.ones((g, n), bool))

    def via_layer(fcx_t):
        return (diag_spmm.diag_layer_t(adj, mask, fcx_t) ** 2).sum()

    def via_ref(fcx_t):
        h = diag_spmm.diag_spmm_t_xla(adj, fcx_t)
        h = jnp.maximum(h, 0.0) * mask.reshape(1, g * n)
        return (h**2).sum()

    g1 = jax.grad(via_layer)(x_t)
    g2 = jax.grad(via_ref)(x_t)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


def test_hi_lo_split_survives_jit() -> None:
    """The naive ``x - f32(bf16(x))`` residual is folded to ZERO by XLA's
    excess-precision convert-pair elision on TPU (observed on v5e) — the
    split must go through lax.reduce_precision, which XLA keeps. The jaxpr
    check pins the implementation; the numeric check pins the semantics."""
    jaxpr = str(jax.make_jaxpr(diag_spmm._hi_lo_split)(jnp.ones((4, 8))))
    assert "reduce_precision" in jaxpr

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64), jnp.float32)
    hi, lo = jax.jit(diag_spmm._hi_lo_split)(x)
    recon = hi.astype(jnp.float32) + lo.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), rtol=2e-5, atol=2e-5)
    assert float(jnp.abs(lo.astype(jnp.float32)).max()) > 0.0


def test_bcsr_split_uses_reduce_precision() -> None:
    """Same elision hazard in the BCSR near-f32 pre-split (ops/block_sparse)."""
    from deeprank2_tpu.ops import block_sparse as bs

    pairs = np.array([[0, 1], [1, 2], [2, 3]], np.int64)
    st = bs.build_blocksparse(pairs, 4, to_device=False)

    def spmm_tpu(x):
        return bs._bcsr_spmm_tpu(
            jnp.asarray(st.blocks_t),
            jnp.asarray(st.block_col),
            jnp.asarray(st.batch_row),
            jnp.asarray(st.batch_chunk),
            jnp.asarray(st.visited),
            x,
            num_tiles=st.num_tiles,
            num_chunks=st.num_chunks,
            block=st.block,
            precision=jax.lax.Precision.HIGHEST,
        )

    jaxpr = str(jax.make_jaxpr(spmm_tpu)(jnp.ones((st.padded_nodes, 8), jnp.float32)))
    assert "reduce_precision" in jaxpr


def test_model_flat_path_matches_batched_path() -> None:
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    entries = synthetic_entries(3, 24, 11, 4, seed=5)
    batch, _ = collate_graphs_dense(entries, pad_graphs=4, pad_nodes=32)
    model = GINetDense(11, 2, 4)
    params = model.init(jax.random.PRNGKey(0))
    # on CPU supports() is False, so exercise _apply_flat directly (its XLA
    # fallback) against the batched formulation
    p_flat = model._apply_flat(params, batch, False, None)
    p_batched = model.apply(params, dataclasses.replace(batch, adj_i8=None, x_t=None), training=False)
    np.testing.assert_allclose(np.asarray(p_flat), np.asarray(p_batched), rtol=2e-5, atol=2e-5)


def test_pool_layer_fwd_grad_matches_reference() -> None:
    adj, x_t = _batch(g=GS, n=16, f=6, seed=7)
    g, n = adj.shape[0], adj.shape[1]
    mask = np.ones((g, n), bool)
    mask[:, n - 3 :] = False
    mask_j = jnp.asarray(mask)

    def via_pool(fcx_t):
        return diag_spmm.diag_layer_pool_t(adj, mask_j, fcx_t)

    def via_ref(fcx_t):
        h = diag_spmm.diag_spmm_t_xla(adj, fcx_t)
        h = jnp.maximum(h, 0.0) * mask_j.reshape(1, g * n)
        return h.reshape(h.shape[0], g, n).sum(axis=2)

    np.testing.assert_allclose(np.asarray(via_pool(x_t)), np.asarray(via_ref(x_t)), rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda v: (via_pool(v) ** 2).sum())(x_t)
    g2 = jax.grad(lambda v: (via_ref(v) ** 2).sum())(x_t)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


def test_pool_kernel_interpret_matches_xla() -> None:
    adj, x_t = _batch(g=GS, n=32, f=10, seed=8)
    g, n = adj.shape[0], adj.shape[1]
    mask = jnp.asarray(np.ones((g, n), bool))
    agg = np.asarray(diag_spmm.diag_spmm_t_xla(adj, x_t))
    h_want = np.maximum(agg, 0.0)
    pool_want = h_want.reshape(h_want.shape[0], g, n).sum(axis=2)
    try:
        with pltpu.force_tpu_interpret_mode():
            h, pooled = diag_spmm._diag_spmm_tpu(adj, x_t, mask, relu=True, compute_dtype="float32", pool=True)
            du = diag_spmm._diag_pool_bwd_tpu(adj, jnp.asarray(h_want).astype(jnp.bfloat16), jnp.asarray(pool_want), compute_dtype="float32")
    except NotImplementedError as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable here: {e}")
    assert h.dtype == jnp.bfloat16  # residual stored bf16 (sign-only use)
    np.testing.assert_allclose(np.asarray(h.astype(jnp.float32)), h_want, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(pooled), pool_want, rtol=5e-4, atol=5e-4)
    u = pool_want.repeat(n, axis=1).reshape(h_want.shape) * (h_want > 0)
    du_want = np.asarray(diag_spmm.diag_spmm_t_xla(adj, jnp.asarray(u.astype(np.float32))))
    np.testing.assert_allclose(np.asarray(du), du_want, rtol=5e-3, atol=5e-3)


def test_pick_gs_covers_trainer_batch_sizes() -> None:
    """Realistic Trainer batches (pad_graphs = batch_size, small) must get a
    legal kernel grouping — not fall back to the batched XLA path."""
    for g, n in [(4, 160), (8, 96), (3, 160), (6, 64), (512, 160), (1, 160)]:
        gs = diag_spmm._pick_gs(g, n)
        assert gs is not None and g % gs == 0
        assert (gs * n) % 128 == 0 or gs == g
    assert diag_spmm._pick_gs(5, 8) == 5  # whole-array block is always legal
