"""Fused Pallas TPU kernel for the block-dense GINet tower pair.

The block-dense GINet forward (neuralnets/gnn/ginet_dense.py) is two
adjacency matmuls with an elementwise relu between them:

    h1 = relu(adj @ (x W1));  h2 = relu(adj @ (h1 W2));  pooled = mask-sum(h2)

XLA runs each ``adj @ _`` as a separate batched matmul, so a full train step
reads the ``[G, N, N]`` adjacency — by far the largest tensor — from HBM four
times (twice forward, twice backward).  This kernel fuses each pass so every
graph's adjacency block is DMA'd into VMEM **once per pass**:

- forward: one grid step loads ``adj[g]`` and runs both layer matmuls plus the
  masked pooling sum on-chip; nothing but the ``[G, C2]`` pooled output leaves.
- backward: recomputes h1/h2 from the same VMEM-resident adjacency block
  (rematerialization is free here — the expensive operand is already on-chip)
  and accumulates the two weight gradients across the sequential TPU grid.

Net HBM traffic for the adjacency: 2 reads per train step instead of 4, and
no residual h1/h2 round-trip.  The two towers of the reference GINet
(reference: deeprank2/neuralnets/gnn/ginet_nocluster.py:84-111; attention is
identically 1.0 there — see ginet.py "reference bug") are fused channel-wise
exactly as in ``GINetDense.apply``: W1 = [W1a ‖ W1b] and W2 = blockdiag(W2a,
W2b), which keeps the math of two independent 16->32 towers.

Weight gradients are accumulated in the output block itself: on TPU the grid
is executed sequentially on one core, and an out BlockSpec whose index_map is
constant keeps the block resident in VMEM across all grid steps.
"""

from __future__ import annotations

import functools

import jax

from deeprank2_tpu.ops.segment import effective_platform, plain_matmul_precision
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# graphs per grid step: adj block = BG * N^2 * 4 bytes (BG=16, N=160 -> 1.6 MB
# f32, double-buffered by the Pallas pipeline; BG=32 overflows the ~16 MB VMEM
# budget once the batched-dot intermediates are live). Measured on one v5e
# chip (512x160-node graphs, fwd+bwd): BG=16 bf16-adj 422 us/step, BG=16 f32
# 519 us, BG=8 f32 545 us — versus 386 us for XLA's batched-matmul path, which
# on this chip already runs at ~90 % of the HBM speed-of-light for its 4
# adjacency passes. The fused kernel halves adjacency traffic (2 passes) but
# Mosaic's batched small-matmul schedule is compute-bound, so XLA stays the
# default backend; re-profile on directly-attached chips (ROADMAP item 7).
_BLOCK_GRAPHS = 16
_MIN_BLOCK_GRAPHS = 8  # mask/pooled blocks need a sublane-multiple graph axis


def _bmm(adj, v, compute_dtype=jnp.float32):
    """Batched ``adj[g] @ v[g]`` with f32 accumulation. ``adj`` entries are
    exactly 0/1, so casting the adjacency to any compute dtype is lossless
    (Mosaic requires matching matmul operand dtypes). With
    ``compute_dtype=bfloat16`` the MXU runs single-pass bf16 (~6x the f32
    rate on v5e) at ~1e-3 relative error on ``v``."""
    return jax.lax.dot_general(
        adj.astype(compute_dtype),
        v.astype(compute_dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


@plain_matmul_precision
def _fwd_kernel(x_ref, adj_ref, mask_ref, w1_ref, w2_ref, pooled_ref, *, compute_dtype):
    adj = adj_ref[:]
    cd = compute_dtype
    fcx = jnp.einsum("gnf,fc->gnc", x_ref[:].astype(cd), w1_ref[:].astype(cd), preferred_element_type=jnp.float32)
    h1 = jnp.maximum(_bmm(adj, fcx, cd), 0.0)
    fcx2 = jnp.einsum("gnc,cd->gnd", h1.astype(cd), w2_ref[:].astype(cd), preferred_element_type=jnp.float32)
    h2 = jnp.maximum(_bmm(adj, fcx2, cd), 0.0)
    h2 = h2 * mask_ref[:][:, :, None]
    pooled_ref[:] = jnp.sum(h2, axis=1)


@plain_matmul_precision
def _bwd_kernel(x_ref, adj_ref, mask_ref, w1_ref, w2_ref, dpooled_ref, dw1_ref, dw2_ref, *, compute_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    cd = compute_dtype
    adj = adj_ref[:]
    x = x_ref[:].astype(cd)
    w2 = w2_ref[:].astype(cd)
    # recompute forward from the VMEM-resident adjacency block
    fcx = jnp.einsum("gnf,fc->gnc", x, w1_ref[:].astype(cd), preferred_element_type=jnp.float32)
    h1 = jnp.maximum(_bmm(adj, fcx, cd), 0.0)
    fcx2 = jnp.einsum("gnc,cd->gnd", h1.astype(cd), w2, preferred_element_type=jnp.float32)
    h2 = jnp.maximum(_bmm(adj, fcx2, cd), 0.0)
    h2 = h2 * mask_ref[:][:, :, None]

    # pooled = sum_n h2 -> dh2 = broadcast; relu'+mask via (h2 > 0)
    dh2 = dpooled_ref[:][:, None, :] * (h2 > 0.0).astype(jnp.float32)
    # adj is symmetric (mirrored undirected edges), so adj^T @ v == adj @ v
    dfcx2 = _bmm(adj, dh2, cd)
    flat = lambda v: v.reshape(v.shape[0] * v.shape[1], v.shape[2])
    dw2_ref[:] += jax.lax.dot_general(
        flat(h1).astype(cd), flat(dfcx2).astype(cd), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh1 = jax.lax.dot_general(dfcx2.astype(cd), w2, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dh1 = dh1 * (h1 > 0.0).astype(jnp.float32)
    dfcx1 = _bmm(adj, dh1, cd)
    dw1_ref[:] += jax.lax.dot_general(
        flat(x).astype(cd), flat(dfcx1).astype(cd), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _block_graphs(num_graphs: int) -> int:
    """Largest supported block size dividing ``num_graphs`` (0 = unsupported)."""
    bg = _BLOCK_GRAPHS
    while bg >= _MIN_BLOCK_GRAPHS and num_graphs % bg:
        bg //= 2
    return bg if bg >= _MIN_BLOCK_GRAPHS else 0


def supports(num_graphs: int) -> bool:
    """Whether the fused kernel can handle this batch on the current backend."""
    return effective_platform() == "tpu" and _block_graphs(num_graphs) > 0


def ginet_tower_pooled(
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    x: jnp.ndarray,
    adj: jnp.ndarray,
    mask: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Masked-sum pooled output ``[G, C2]`` of the fused two-layer GINet tower.

    ``w1``: [F, C1] fused tower-1 weights; ``w2``: [C1, C2] blockdiag fused
    tower-2 weights; ``x``: [G, N, F]; ``adj``: [G, N, N] symmetric (f32 or
    bf16); ``mask``: [G, N] f32.  Divide by the node counts outside for the
    masked mean. ``compute_dtype`` sets the matmul operand dtype (bfloat16 =
    the fast TPU training path; accumulation is always f32).
    """
    return _tower_for_dtype(jnp.dtype(compute_dtype).name)(w1, w2, x, adj, mask)


@functools.lru_cache(maxsize=4)
def _tower_for_dtype(dtype_name: str):
    compute_dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def tower(w1, w2, x, adj, mask):
        return _pooled_fwd_call(w1, w2, x, adj, mask, compute_dtype)

    def fwd(w1, w2, x, adj, mask):
        return _pooled_fwd_call(w1, w2, x, adj, mask, compute_dtype), (w1, w2, x, adj, mask)

    def bwd(residuals, dpooled):
        return _pooled_bwd_call(residuals, dpooled, compute_dtype)

    tower.defvjp(fwd, bwd)
    return tower


def _pooled_fwd_call(w1, w2, x, adj, mask, compute_dtype):
    num_graphs, n, _ = x.shape
    bg = _block_graphs(num_graphs)
    grid = (num_graphs // bg,)
    c2 = w2.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bg, n, x.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bg, c2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_graphs, c2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_graphs * n * (x.shape[2] * w1.shape[1] + n * w1.shape[1] + w1.shape[1] * c2 + n * c2),
            bytes_accessed=adj.size * adj.dtype.itemsize + x.size * 4,
            transcendentals=0,
        ),
    )(x, adj, mask, w1, w2)


def _pooled_bwd_call(residuals, dpooled, compute_dtype):
    w1, w2, x, adj, mask = residuals
    num_graphs, n, _ = x.shape
    bg = _block_graphs(num_graphs)
    grid = (num_graphs // bg,)
    dw1, dw2 = pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bg, n, x.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, w2.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # constant index_map: the grad blocks stay VMEM-resident across the
            # sequential grid and accumulate in place
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * num_graphs * n * (x.shape[2] * w1.shape[1] + n * w1.shape[1] + w1.shape[1] * w2.shape[1] + n * w2.shape[1]),
            bytes_accessed=adj.size * adj.dtype.itemsize + x.size * 4,
            transcendentals=0,
        ),
    )(x, adj, mask, w1, w2, dpooled)
    return dw1, dw2, jnp.zeros_like(x), jnp.zeros_like(adj), jnp.zeros_like(mask)


def ginet_tower_pooled_reference(w1, w2, x, adj, mask):
    """Plain-XLA reference of :func:`ginet_tower_pooled` (identical math)."""
    h1 = jax.nn.relu(adj @ (x @ w1))
    h2 = jax.nn.relu(adj @ (h1 @ w2))
    h2 = h2 * mask[:, :, None]
    return h2.sum(axis=1)
