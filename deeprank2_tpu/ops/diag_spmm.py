"""Graph-diagonal SpMM — the dense-batch aggregation as a Pallas kernel.

A collated :class:`~deeprank2_tpu.ops.batch.DenseGraphBatch` is a
block-diagonal adjacency: graph ``g`` owns rows/cols ``[g*N, (g+1)*N)`` of the
batch graph and no edges cross graphs. The batched-matmul formulation
(``[G,N,N] @ [G,N,C]``, ginet_dense.py) leaves ~35 % of the train step in
XLA dot-emitter layout copies of the backward cotangents (every batched
cotangent has two matmul consumers with conflicting operand layouts —
profiled round 3, three formulation rewrites measured as no-ops). This module
removes the batch dimension instead: activations live flat and transposed
(``[F, G*N]``, features on sublanes — the BCSR model's discipline, where the
same GINet math measures >90 % of its roofline), every XLA-side contraction
is 2-D, and the per-graph aggregation runs in a kernel that streams the
adjacency as int8 (entries are exactly 0/1 — half the bytes of the bf16
batched path, and the adjacency stream is the step's dominant traffic).

Kernel shape: grid over groups of ``GS`` graphs; each step receives the
group's adjacency blocks ``[GS, N, N]`` (int8) and activation slab
``[F, GS, N]`` and emits the aggregated slab — each output tile depends only
on the same-graph input tile, so there is no chunking, no run bookkeeping,
and no scatter: Mosaic's input pipeline streams everything.

Precision follows ops/block_sparse.py: ``compute_dtype=bfloat16`` is the
single-pass MXU path; the default near-f32 path splits ``x`` into a bf16
hi+lo pair OUTSIDE the kernel (same bytes as f32, ~1e-5 relative error
against the exactly-representable 0/1 adjacency; XLA fuses the split into the
producer) and contracts each block twice. True-f32 oracles use the XLA
fallback (:func:`diag_spmm_t_xla`).

Adjacency symmetry (edges are mirrored, reference dataset.py:944-951) makes
``A^T = A`` per graph, so every VJP is the same kernel applied to the
cotangent.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeprank2_tpu.ops.segment import effective_platform, plain_matmul_precision

# max graphs per grid step (sweepable like the DR2_BCSR_* knobs); the
# actual group size adapts per batch shape (see _pick_gs)
GS_DEFAULT = int(_os.environ.get("DR2_DIAG_GS", "16"))
GS = GS_DEFAULT  # back-compat alias (tests size their batches off it)


# VMEM headroom for one grid step's adjacency group: the [gs, N, N] int8
# block is double-buffered by the Pallas pipeline next to the x/out slabs
_ADJ_GROUP_BUDGET = 4 * 1024 * 1024


def _pick_gs(num_graphs: int, nodes: int, itemsize: int = 1) -> int | None:
    """Largest group size <= GS that divides the batch, keeps the 2-D
    [fw, gs*N] blocks lane-legal (gs*N a multiple of 128, or the block
    covering the whole array), and fits the adjacency group in VMEM
    (``itemsize`` = adjacency bytes/entry: int8 0/1 or bf16 weighted).
    None when no legal grouping exists."""
    for gs in range(min(GS_DEFAULT, num_graphs), 0, -1):
        if num_graphs % gs or gs * nodes * nodes * itemsize > _ADJ_GROUP_BUDGET:
            continue
        if (gs * nodes) % 128 == 0 or gs == num_graphs:
            return gs
    return None


def _hi_lo_split(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 pair with ``hi + lo ~= x`` to ~1e-5 relative.

    The rounded value is taken via ``lax.reduce_precision`` — the naive
    ``x - f32(bf16(x))`` formulation is folded to ZERO under jit by XLA's
    excess-precision simplification (convert-pair elision), which silently
    degrades the near-f32 path to a single bf16 pass (caught on v5e,
    round 4)."""
    hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)


def supports(num_graphs: int, nodes: int, adj_dtype=jnp.int8) -> bool:
    """Whether the TPU kernel covers this batch shape (else XLA fallback).

    f32 adjacencies never engage the kernel: its MXU passes load the
    adjacency as bf16, and f32 weights are the collate's EXACT-oracle mode
    (``weight_dtype=np.float32``) whose whole point is full precision — the
    XLA fallback keeps HIGHEST there (mirrors ops/block_sparse.py's
    weighted-BCSR split)."""
    itemsize = jnp.dtype(adj_dtype).itemsize
    return (
        effective_platform() == "tpu"
        and itemsize <= 2
        and _pick_gs(num_graphs, nodes, itemsize) is not None
        and nodes % 8 == 0
        and nodes <= 2048  # one [gs, N, N] adjacency group must fit VMEM
    )


def diag_spmm_t_xla(adj: jnp.ndarray, x_t: jnp.ndarray, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Reference/fallback ``[F, G*N] -> [F, G*N]`` aggregation: per-graph
    ``x_t_g @ A_g`` (``A`` symmetric). Used on CPU and as the kernel oracle."""
    g, n, _ = adj.shape
    f = x_t.shape[0]
    x3 = x_t.reshape(f, g, n)
    out3 = jnp.einsum("fgj,gij->fgi", x3, adj.astype(x_t.dtype), precision=precision)
    return out3.reshape(f, g * n)


@plain_matmul_precision
def _diag_kernel(adj_ref, *rest, gs, n, relu, split, pool):
    nx = 2 if split else 1
    xs = rest[:nx]
    mask_ref = rest[nx] if relu else None
    out_ref = rest[nx + (1 if relu else 0)]
    pool_ref = rest[-1] if pool else None
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # x/out ride as true 2-D [fw, GS*N] blocks (features on sublanes, the
    # group's nodes on lanes) — the [fw, GS, N] 3-D form puts fw on the
    # OUTER (untiled) axis, so every per-graph slice was a full cross-tile
    # relayout (measured 947 us vs 363 us XLA, round 4). Lane slices at
    # k*N offsets are merely (possibly) lane-rotates.
    sums = []
    for k in range(gs):  # unrolled: gs is static
        a = adj_ref[k].astype(jnp.bfloat16)
        sl = pl.ds(k * n, n)
        acc = dot(xs[0][:, sl], a)
        if split:
            acc = acc + dot(xs[1][:, sl], a)
        if relu:
            acc = jnp.maximum(acc, 0.0) * mask_ref[:, sl]
        if pool:
            # the pooled layer's h is only ever read back for its relu sign
            # (the backward kernel), so store it bf16 — halves this write and
            # that read. (An int8 SIGN store would quarter them, but the
            # f32->int8 repack relayouts cost far more than the bandwidth:
            # 1039 us vs 335 us step, measured round 4. The f32->bf16 pack is
            # a native vector op.)
            out_ref[:, sl] = acc.astype(jnp.bfloat16)
            sums.append(jnp.sum(acc, axis=1, keepdims=True))
        else:
            out_ref[:, sl] = acc
    if pool:
        # per-graph lane sums, one [1, fw, GS] block store per grid step
        # (a flat [fw, G] output would need 16-lane dynamic store offsets,
        # which Mosaic rejects — lane offsets must be 128-provable)
        pool_ref[0] = jnp.concatenate(sums, axis=1)


@functools.partial(jax.jit, static_argnames=("relu", "compute_dtype", "pool"))
def _diag_spmm_tpu(adj_i8, x_t, mask, *, relu, compute_dtype="float32", pool=False):
    g, n, _ = adj_i8.shape
    GS = _pick_gs(g, n, adj_i8.dtype.itemsize) or min(GS_DEFAULT, g)  # noqa: N806 — local group size
    feat = x_t.shape[0]
    cd = jnp.dtype(compute_dtype)
    split = cd.itemsize == 4
    pad_f = (-feat) % 16  # operands ride the MXU as bf16 either way
    if pad_f:
        x_t = jnp.pad(x_t, ((0, pad_f), (0, 0)))
    fw = feat + pad_f
    if split:
        x_ops = _hi_lo_split(x_t)
    else:
        x_ops = (x_t.astype(jnp.bfloat16),)

    gn = GS * n
    in_specs = [
        pl.BlockSpec((GS, n, n), lambda i: (i, 0, 0)),
        *[pl.BlockSpec((fw, gn), lambda i: (0, i)) for _ in x_ops],
    ]
    operands = [adj_i8, *x_ops]
    if relu:
        in_specs.append(pl.BlockSpec((1, gn), lambda i: (0, i)))
        operands.append(mask.astype(jnp.float32).reshape(1, g * n))

    out_specs = pl.BlockSpec((fw, gn), lambda i: (0, i))
    out_shape = jax.ShapeDtypeStruct((fw, g * n), jnp.bfloat16 if pool else jnp.float32)
    if pool:
        out_specs = [out_specs, pl.BlockSpec((1, fw, GS), lambda i: (i, 0, 0))]
        out_shape = [out_shape, jax.ShapeDtypeStruct((g // GS, fw, GS), jnp.float32)]

    out = pl.pallas_call(
        functools.partial(_diag_kernel, gs=GS, n=n, relu=relu, split=split, pool=pool),
        grid=(g // GS,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*operands)
    if pool:
        # [steps, fw, GS] -> [fw, G] (tiny: fw x G f32)
        pooled = out[1].transpose(1, 0, 2).reshape(fw, g)
        return out[0][:feat], pooled[:feat]
    return out[:feat]


def _agg(adj_i8, x_t, compute_dtype):
    """Plain aggregation dispatch (no epilogue)."""
    g, n, _ = adj_i8.shape
    if supports(g, n, adj_i8.dtype):
        cd = "float32" if compute_dtype is None else jnp.dtype(compute_dtype).name
        return _diag_spmm_tpu(adj_i8, x_t, None, relu=False, compute_dtype=cd)
    return diag_spmm_t_xla(adj_i8, x_t.astype(compute_dtype) if compute_dtype is not None else x_t).astype(jnp.float32)


def diag_spmm_t(adj_i8: jnp.ndarray, x_t: jnp.ndarray, compute_dtype: jnp.dtype | None = None) -> jnp.ndarray:
    """``[F, G*N] -> [F, G*N]`` symmetric per-graph aggregation,
    differentiable w.r.t. ``x_t`` (VJP = same SpMM on the cotangent)."""

    @jax.custom_vjp
    def spmm(x_t):
        return _agg(adj_i8, x_t, compute_dtype)

    def fwd(x_t):
        return spmm(x_t), None

    def bwd(_, g):
        return (_agg(adj_i8, g, compute_dtype),)

    spmm.defvjp(fwd, bwd)
    return spmm(x_t)


def diag_layer_t(
    adj_i8: jnp.ndarray,
    node_mask: jnp.ndarray,  # [G, N] bool/float; masked cols zeroed
    fcx_t: jnp.ndarray,  # [F, G*N]
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """``relu(mask ⊙ (fcx_t @ A))`` with the relu+mask fused into the kernel
    epilogue — saves one full ``[C, G*N]`` f32 read+write per layer vs doing
    them as a separate XLA pass. VJP: ``d fcx = A @ (g ⊙ [h > 0])`` (the
    output is its own relu mask, and masked columns are 0 so they also drop;
    ``relu'(0) = 0`` matches jax.nn.relu's VJP)."""
    g, n, _ = adj_i8.shape

    @jax.custom_vjp
    def layer(fcx_t):
        if supports(g, n, adj_i8.dtype):
            cd = "float32" if compute_dtype is None else jnp.dtype(compute_dtype).name
            return _diag_spmm_tpu(adj_i8, fcx_t, node_mask, relu=True, compute_dtype=cd)
        h = _agg(adj_i8, fcx_t, compute_dtype)
        return jnp.maximum(h, 0.0) * node_mask.astype(h.dtype).reshape(1, g * n)

    def fwd(fcx_t):
        h = layer(fcx_t)
        return h, h

    def bwd(h, gct):
        u = gct * (h > 0).astype(gct.dtype)
        return (_agg(adj_i8, u, compute_dtype),)

    layer.defvjp(fwd, bwd)
    return layer(fcx_t)


@plain_matmul_precision
def _pool_bwd_kernel(adj_ref, h_ref, gp_ref, out_ref, *, gs, n, split):
    """``d fcx = A @ ((h > 0) ⊙ broadcast(g_pool))`` fused: the per-graph
    cotangent is one COLUMN of g_pool lane-broadcast over the graph's nodes,
    so the XLA-side broadcast/reshape passes over [C, G*N] (~55 us/step,
    profiled round 4) disappear; the near-f32 hi/lo split happens in-kernel
    (Mosaic does not elide it — unlike XLA HLO, see _hi_lo_split)."""
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for k in range(gs):  # unrolled: gs is static
        a = adj_ref[k].astype(jnp.bfloat16)
        sl = pl.ds(k * n, n)
        # bf16 residual; only its sign is used. Widen before the compare —
        # an i1 mask derived from a sub-32-bit vector hits a Mosaic relayout
        # limitation ("non-singleton dimension replicated in destination").
        h = h_ref[:, sl].astype(jnp.float32)
        gcol = gp_ref[0][:, k : k + 1]  # [fw, 1] — static slice of the [fw, GS] block
        u = jnp.where(h > 0, jnp.broadcast_to(gcol, h.shape), 0.0)
        if split:
            u_hi = u.astype(jnp.bfloat16)
            u_lo = (u - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = dot(u_hi, a) + dot(u_lo, a)
        else:
            acc = dot(u.astype(jnp.bfloat16), a)
        out_ref[:, sl] = acc


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _diag_pool_bwd_tpu(adj_i8, h, g_pool, *, compute_dtype="float32"):
    g, n, _ = adj_i8.shape
    GS = _pick_gs(g, n, adj_i8.dtype.itemsize) or min(GS_DEFAULT, g)  # noqa: N806 — local group size
    feat = h.shape[0]
    split = jnp.dtype(compute_dtype).itemsize == 4
    pad_f = (-feat) % 16
    if pad_f:
        h = jnp.pad(h, ((0, pad_f), (0, 0)))
        g_pool = jnp.pad(g_pool, ((0, pad_f), (0, 0)))
    fw = feat + pad_f
    gn = GS * n
    # [fw, G] -> [steps, fw, GS] so each grid step gets its graphs' columns
    # as a small block (tiny transpose; flat [fw, G] blocks would need
    # 16-lane dynamic read offsets, which Mosaic rejects)
    gp3 = g_pool.astype(jnp.float32).reshape(fw, g // GS, GS).transpose(1, 0, 2)
    out = pl.pallas_call(
        functools.partial(_pool_bwd_kernel, gs=GS, n=n, split=split),
        grid=(g // GS,),
        in_specs=[
            pl.BlockSpec((GS, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((fw, gn), lambda i: (0, i)),
            pl.BlockSpec((1, fw, GS), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((fw, gn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((fw, g * n), jnp.float32),
    )(adj_i8, h, gp3)
    return out[:feat]


def diag_layer_pool_t(
    adj_i8: jnp.ndarray,
    node_mask: jnp.ndarray,  # [G, N]
    fcx_t: jnp.ndarray,  # [F, G*N]
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """Final conv layer + per-graph SUM pooling in one kernel pass:
    returns ``pooled[c, g] = Σ_v relu(mask ⊙ (fcx_t @ A))[c, v in graph g]``
    (``[F, G]`` — divide by node counts outside for the mean). The flat
    ``[C, G*N] -> [C, G, N] -> reduce`` XLA formulation materialized two
    layout-changing reshapes plus a broadcast and reduce (~106 us of the
    437 us step, profiled round 4); here the forward sums each graph's
    output block over lanes while it is still in VMEM, and the backward
    (:func:`_pool_bwd_kernel`) broadcasts the tiny ``[C, G]`` cotangent
    in-kernel."""
    g, n, _ = adj_i8.shape

    @jax.custom_vjp
    def layer(fcx_t):
        if supports(g, n, adj_i8.dtype):
            cd = "float32" if compute_dtype is None else jnp.dtype(compute_dtype).name
            _, pooled = _diag_spmm_tpu(adj_i8, fcx_t, node_mask, relu=True, compute_dtype=cd, pool=True)
            return pooled
        h = _agg(adj_i8, fcx_t, compute_dtype)
        h = jnp.maximum(h, 0.0) * node_mask.astype(h.dtype).reshape(1, g * n)
        return h.reshape(h.shape[0], g, n).sum(axis=2)

    def fwd(fcx_t):
        if supports(g, n, adj_i8.dtype):
            cd = "float32" if compute_dtype is None else jnp.dtype(compute_dtype).name
            h, pooled = _diag_spmm_tpu(adj_i8, fcx_t, node_mask, relu=True, compute_dtype=cd, pool=True)
            return pooled, h
        h = _agg(adj_i8, fcx_t, compute_dtype)
        h = jnp.maximum(h, 0.0) * node_mask.astype(h.dtype).reshape(1, g * n)
        return h.reshape(h.shape[0], g, n).sum(axis=2), h.astype(jnp.bfloat16)

    def bwd(h, g_pool):
        if supports(g, n, adj_i8.dtype):
            cd = "float32" if compute_dtype is None else jnp.dtype(compute_dtype).name
            return (_diag_pool_bwd_tpu(adj_i8, h, g_pool, compute_dtype=cd),)
        u = jnp.repeat(g_pool, n, axis=1) * (h > 0).astype(g_pool.dtype)
        return (_agg(adj_i8, u, compute_dtype),)

    layer.defvjp(fwd, bwd)
    return layer(fcx_t)


# ---------------------------------------------------------------------------
# Fused GINet tower: both conv layers + pooling in ONE forward kernel and ONE
# backward kernel per train step. The adjacency is read once per direction
# (the separate-layer formulation reads it twice), weight applications and
# relu/mask epilogues never round-trip HBM, and only the backward's actual
# needs are materialized: h1 (values, for dw2 and the relu VJP) and the SIGN
# of h2 (int8 — h2's values are never used again, so storing f32 h2 would
# waste a 21 MB write + read at bench shape).


def _split16(v):
    """In-kernel bf16 hi/lo split (Mosaic keeps it — see _hi_lo_split)."""
    hi = v.astype(jnp.bfloat16)
    return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)


@plain_matmul_precision
def _tower_fwd_kernel(adj_ref, *refs, gs, n, split):
    if split:
        xhi_ref, xlo_ref, mask_ref, w1_ref, w2_ref, h1_ref, sign_ref, pool_ref = refs
    else:
        xhi_ref, mask_ref, w1_ref, w2_ref, h1_ref, sign_ref, pool_ref = refs
        xlo_ref = None
    adot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    wdot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sums = []
    for k in range(gs):  # unrolled: gs is static
        a = adj_ref[k].astype(jnp.bfloat16)
        sl = pl.ds(k * n, n)
        m = mask_ref[:, sl]
        # layer 1: weights ride single-pass bf16 (the XLA default-precision
        # equivalent); x keeps its hi/lo pair
        fcx1 = wdot(w1_ref[...], xhi_ref[:, sl])
        if split:
            fcx1 = fcx1 + wdot(w1_ref[...], xlo_ref[:, sl])
        if split:
            f1h, f1l = _split16(fcx1)
            h1 = adot(f1h, a) + adot(f1l, a)
        else:
            h1 = adot(fcx1.astype(jnp.bfloat16), a)
        h1 = jnp.maximum(h1, 0.0) * m
        h1_ref[:, sl] = h1
        # layer 2
        if split:
            h1h, h1l = _split16(h1)
            fcx2 = wdot(w2_ref[...], h1h) + wdot(w2_ref[...], h1l)
            f2h, f2l = _split16(fcx2)
            h2 = adot(f2h, a) + adot(f2l, a)
        else:
            fcx2 = wdot(w2_ref[...], h1.astype(jnp.bfloat16))
            h2 = adot(fcx2.astype(jnp.bfloat16), a)
        h2 = jnp.maximum(h2, 0.0) * m
        sign_ref[:, sl] = (h2 > 0.0).astype(jnp.int8)
        sums.append(jnp.sum(h2, axis=1, keepdims=True))
    pool_ref[0] = jnp.concatenate(sums, axis=1)


@plain_matmul_precision
def _tower_bwd_kernel(adj_ref, gp_ref, sign_ref, h1_ref, w2_ref, t2_ref, t1_ref, *, gs, n, split):
    adot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for k in range(gs):  # unrolled: gs is static
        a = adj_ref[k].astype(jnp.bfloat16)
        sl = pl.ds(k * n, n)
        gcol = gp_ref[0][:, k : k + 1]  # [C2, 1]
        # sign is exactly 0/1 int8, so mask by multiply (an i1 select on an
        # int8-derived mask hits a Mosaic relayout limitation here)
        u2 = sign_ref[:, sl].astype(jnp.float32) * jnp.broadcast_to(gcol, (gp_ref.shape[1], n))
        if split:
            u2h, u2l = _split16(u2)
            t2 = adot(u2h, a) + adot(u2l, a)
        else:
            t2 = adot(u2.astype(jnp.bfloat16), a)
        t2_ref[:, sl] = t2.astype(jnp.bfloat16)
        # dh1 = w2 @ t2  ([C1, C2] x [C2, n])
        if split:
            t2h, t2l = _split16(t2)
            dh1 = adot(w2_ref[...], t2h) + adot(w2_ref[...], t2l)
        else:
            dh1 = adot(w2_ref[...], t2.astype(jnp.bfloat16))
        h1 = h1_ref[:, sl]
        u1 = jnp.where(h1 > 0, dh1, 0.0)
        if split:
            u1h, u1l = _split16(u1)
            t1 = adot(u1h, a) + adot(u1l, a)
        else:
            t1 = adot(u1.astype(jnp.bfloat16), a)
        t1_ref[:, sl] = t1.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _tower_fwd_tpu(adj_i8, x_t, mask, w1, w2, *, compute_dtype="float32"):
    g, n, _ = adj_i8.shape
    GS = _pick_gs(g, n, adj_i8.dtype.itemsize) or min(GS_DEFAULT, g)  # noqa: N806 — local group size
    feat = x_t.shape[0]
    c1, c2 = w1.shape[1], w2.shape[1]
    split = jnp.dtype(compute_dtype).itemsize == 4
    pad_f = (-feat) % 16
    if pad_f:
        x_t = jnp.pad(x_t, ((0, pad_f), (0, 0)))
    fw = feat + pad_f
    if split:
        x_ops = _hi_lo_split(x_t)
    else:
        x_ops = (x_t.astype(jnp.bfloat16),)
    # transposed weights, bf16 single-pass (== XLA default precision class)
    w1t = jnp.pad(w1.T, ((0, 0), (0, pad_f))).astype(jnp.bfloat16)  # [C1, fw]
    w2t = w2.T.astype(jnp.bfloat16)  # [C2, C1]
    gn = GS * n
    h1, sign, pooled = pl.pallas_call(
        functools.partial(_tower_fwd_kernel, gs=GS, n=n, split=split),
        grid=(g // GS,),
        in_specs=[
            pl.BlockSpec((GS, n, n), lambda i: (i, 0, 0)),
            *[pl.BlockSpec((fw, gn), lambda i: (0, i)) for _ in x_ops],
            pl.BlockSpec((1, gn), lambda i: (0, i)),
            pl.BlockSpec((c1, fw), lambda i: (0, 0)),
            pl.BlockSpec((c2, c1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((c1, gn), lambda i: (0, i)),
            pl.BlockSpec((c2, gn), lambda i: (0, i)),
            pl.BlockSpec((1, c2, GS), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c1, g * n), jnp.float32),
            jax.ShapeDtypeStruct((c2, g * n), jnp.int8),
            jax.ShapeDtypeStruct((g // GS, c2, GS), jnp.float32),
        ],
    )(adj_i8, *x_ops, mask.astype(jnp.float32).reshape(1, g * n), w1t, w2t)
    return h1, sign, pooled.transpose(1, 0, 2).reshape(c2, g)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _tower_bwd_tpu(adj_i8, g_pool, sign, h1, w2, *, compute_dtype="float32"):
    g, n, _ = adj_i8.shape
    GS = _pick_gs(g, n, adj_i8.dtype.itemsize) or min(GS_DEFAULT, g)  # noqa: N806 — local group size
    c1, c2 = w2.shape
    split = jnp.dtype(compute_dtype).itemsize == 4
    gn = GS * n
    gp3 = g_pool.astype(jnp.float32).reshape(c2, g // GS, GS).transpose(1, 0, 2)
    t2, t1 = pl.pallas_call(
        functools.partial(_tower_bwd_kernel, gs=GS, n=n, split=split),
        grid=(g // GS,),
        in_specs=[
            pl.BlockSpec((GS, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c2, GS), lambda i: (i, 0, 0)),
            pl.BlockSpec((c2, gn), lambda i: (0, i)),
            pl.BlockSpec((c1, gn), lambda i: (0, i)),
            pl.BlockSpec((c1, c2), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((c2, gn), lambda i: (0, i)),
            pl.BlockSpec((c1, gn), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c2, g * n), jnp.bfloat16),
            jax.ShapeDtypeStruct((c1, g * n), jnp.bfloat16),
        ],
    )(adj_i8, gp3, sign, h1, w2.astype(jnp.bfloat16))
    return t2, t1


def tower_pooled(
    adj_i8: jnp.ndarray,
    node_mask: jnp.ndarray,  # [G, N]
    x_t: jnp.ndarray,  # [F, G*N] node features (no gradient — batch data)
    w1: jnp.ndarray,  # [F, C1] fused tower-1 weights
    w2: jnp.ndarray,  # [C1, C2] fused (block-diagonal) tower-2 weights
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """The whole GINet no-cluster tower — two conv layers, relu/mask, and
    per-graph SUM pooling — as one forward + one backward Pallas kernel.
    Returns pooled sums ``[C2, G]``; differentiable w.r.t. ``w1``/``w2``
    (``x_t`` is batch data and gets no cotangent).

    Traffic per step at the bench shape (512 graphs x 160 nodes): the
    adjacency streams ONCE per direction (the per-layer kernels read it
    twice), and the only inter-kernel tensors are h1 (f32, for dw2 and the
    relu VJP) and h2's sign (int8). The weight gradients contract over the
    flat node axis in XLA (2-D NT matmuls) from bf16 t1/t2 aggregates —
    the same precision class as XLA's default-precision dw matmuls.
    """
    g, n, _ = adj_i8.shape
    cd = "float32" if compute_dtype is None else jnp.dtype(compute_dtype).name

    @jax.custom_vjp
    def tower(w1, w2):
        if supports(g, n, adj_i8.dtype):
            _, _, pooled = _tower_fwd_tpu(adj_i8, x_t, node_mask, w1, w2, compute_dtype=cd)
            return pooled
        return _tower_ref(adj_i8, node_mask, x_t, w1, w2)[2]

    def fwd(w1, w2):
        if supports(g, n, adj_i8.dtype):
            h1, sign, pooled = _tower_fwd_tpu(adj_i8, x_t, node_mask, w1, w2, compute_dtype=cd)
            return pooled, (h1, sign, w2)
        h1, h2, pooled = _tower_ref(adj_i8, node_mask, x_t, w1, w2)
        return pooled, (h1, (h2 > 0).astype(jnp.int8), w2)

    def bwd(res, g_pool):
        h1, sign, w2 = res
        if supports(g, n, adj_i8.dtype):
            t2, t1 = _tower_bwd_tpu(adj_i8, g_pool, sign, h1, w2, compute_dtype=cd)
        else:
            u2 = jnp.repeat(g_pool, n, axis=1) * (sign > 0)
            t2 = _agg(adj_i8, u2.astype(jnp.float32), compute_dtype)
            dh1 = w2 @ t2
            u1 = dh1 * (h1 > 0)
            t1 = _agg(adj_i8, u1, compute_dtype)
        dw2 = jax.lax.dot_general(h1, t2.astype(jnp.float32), (((1,), (1,)), ((), ())))
        dw1 = jax.lax.dot_general(x_t, t1.astype(jnp.float32), (((1,), (1,)), ((), ())))
        return dw1, dw2

    tower.defvjp(fwd, bwd)
    return tower(w1, w2)


def _tower_ref(adj_i8, node_mask, x_t, w1, w2):
    """XLA reference for the fused tower (CPU fallback + oracle)."""
    g, n, _ = adj_i8.shape
    m = node_mask.astype(jnp.float32).reshape(1, g * n)
    h1 = jnp.maximum(diag_spmm_t_xla(adj_i8, w1.T @ x_t), 0.0) * m
    h2 = jnp.maximum(diag_spmm_t_xla(adj_i8, w2.T @ h1), 0.0) * m
    pooled = h2.reshape(h2.shape[0], g, n).sum(axis=2)
    return h1, h2, pooled
