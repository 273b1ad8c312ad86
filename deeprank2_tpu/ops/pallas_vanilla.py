"""Pallas TPU kernels for blocked per-edge-feature message passing.

Implements :func:`deeprank2_tpu.ops.blocked_edges.blocked_message_sum` on TPU:
``out[v] = sum_{e: row(e)=v} relu(xr[v] + xc[col(e)] + e_attr(e) @ w_e)`` —
the per-edge message pipeline of VanillaNetwork-style models (reference:
deeprank2/neuralnets/gnn/vanilla_gnn.py:10-41).

Three kernels over TILE_E edge slabs, each slab tied to one (destination,
source) node-tile pair (scalar-prefetched — see ops/blocked_edges.py for the
layout):

- forward (row-major sort): gather both endpoints as one-hot MXU matmuls,
  thin edge-feature matmul, relu, aggregate back with the transposed one-hot
  into a VMEM-resident destination tile;
- backward/rows (row-major sort): recomputes the pre-activations from the
  same VMEM tiles (rematerialization — the operands are already on-chip),
  forms ``dmsg = gather(g) * relu'`` and accumulates ``d xr`` (destination
  tiles, consecutive) and ``d w_e`` (constant block resident across the
  sequential TPU grid);
- backward/cols (col-major sort): same recompute, accumulates ``d xc``
  (source tiles, consecutive in this sort).

Everything per-edge lives only in VMEM ([M, TILE_E] slabs); HBM never sees an
``[E, M]`` message matrix in either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeprank2_tpu.ops.blocked_edges import EDGE_TILE, TILE_E, BlockedEdgeStructure


def _onehot(local_ref, tile: int, dtype) -> jnp.ndarray:
    """[tile, TILE_E] one-hot of within-tile indices; the sentinel ``tile``
    yields an all-zero column (how padded edges vanish)."""
    local = local_ref[:]  # [TILE_E] slab of the flat index array
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, TILE_E), 0)
    return (local[None, :] == iota).astype(dtype)


def _pre_activations(xr_ref, xc_ref, we_ref, e_ref, row_ref, col_ref, cd, precision, tile):
    """Recompute the [M, TILE_E] pre-activation slab plus the row one-hot."""
    oh_r = _onehot(row_ref, tile, cd)
    oh_c = _onehot(col_ref, tile, cd)
    dot = functools.partial(
        jax.lax.dot_general,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    dst = dot(xr_ref[:].astype(cd), oh_r, (((1,), (0,)), ((), ())))
    src = dot(xc_ref[:].astype(cd), oh_c, (((1,), (0,)), ((), ())))
    ew = dot(we_ref[:].astype(cd), e_ref[:].astype(cd), (((1,), (0,)), ((), ())))
    return dst + src + ew, oh_r, oh_c, dot


def _fwd_kernel(step_row_ref, step_col_ref, row_ref, col_ref, e_ref, xr_ref, xc_ref, we_ref, out_ref, *, cd, precision, tile):
    bi = pl.program_id(0)
    prev = jnp.maximum(bi - 1, 0)

    @pl.when(jnp.logical_or(bi == 0, step_row_ref[bi] != step_row_ref[prev]))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pre, oh_r, _oh_c, dot = _pre_activations(xr_ref, xc_ref, we_ref, e_ref, row_ref, col_ref, cd, precision, tile)
    msg = jnp.maximum(pre, 0.0)
    # sentinel rows have an all-zero one-hot column -> padded edges vanish here
    out_ref[:] += dot(msg.astype(cd), oh_r, (((1,), (1,)), ((), ())))


def _bwd_rows_kernel(
    step_row_ref, step_col_ref, row_ref, col_ref, e_ref, xr_ref, xc_ref, we_ref, g_ref, dxr_ref, dwe_ref, *, cd, precision, tile
):
    bi = pl.program_id(0)
    prev = jnp.maximum(bi - 1, 0)

    @pl.when(bi == 0)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)

    @pl.when(jnp.logical_or(bi == 0, step_row_ref[bi] != step_row_ref[prev]))
    def _():
        dxr_ref[:] = jnp.zeros_like(dxr_ref)

    pre, oh_r, _oh_c, dot = _pre_activations(xr_ref, xc_ref, we_ref, e_ref, row_ref, col_ref, cd, precision, tile)
    # gather the outer cotangent by destination; sentinel columns give 0, so
    # padded edges contribute to no gradient
    dmsg = dot(g_ref[:].astype(cd), oh_r, (((1,), (0,)), ((), ())))
    dmsg = dmsg * (pre > 0.0).astype(jnp.float32)
    dxr_ref[:] += dot(dmsg.astype(cd), oh_r, (((1,), (1,)), ((), ())))
    dwe_ref[:] += dot(dmsg.astype(cd), e_ref[:].astype(cd), (((1,), (1,)), ((), ())))


def _bwd_cols_kernel(
    step_row_ref, step_col_ref, row_ref, col_ref, e_ref, xr_ref, xc_ref, we_ref, g_ref, dxc_ref, *, cd, precision, tile
):
    bi = pl.program_id(0)
    prev = jnp.maximum(bi - 1, 0)

    @pl.when(jnp.logical_or(bi == 0, step_col_ref[bi] != step_col_ref[prev]))
    def _():
        dxc_ref[:] = jnp.zeros_like(dxc_ref)

    pre, oh_r, oh_c, dot = _pre_activations(xr_ref, xc_ref, we_ref, e_ref, row_ref, col_ref, cd, precision, tile)
    dmsg = dot(g_ref[:].astype(cd), oh_r, (((1,), (0,)), ((), ())))
    dmsg = dmsg * (pre > 0.0).astype(jnp.float32)
    dxc_ref[:] += dot(dmsg.astype(cd), oh_c, (((1,), (1,)), ((), ())))


def _mt_specs(tile, m_pad, fe_pad):
    """The shared input BlockSpecs: locals, edge slab, xr/xc tiles, w_e."""
    return [
        pl.BlockSpec((TILE_E,), lambda bi, sr, sc: (bi,), memory_space=pltpu.VMEM),  # row_local
        pl.BlockSpec((TILE_E,), lambda bi, sr, sc: (bi,), memory_space=pltpu.VMEM),  # col_local
        pl.BlockSpec((fe_pad, TILE_E), lambda bi, sr, sc: (0, bi), memory_space=pltpu.VMEM),  # eattr_t
        pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sr[bi]), memory_space=pltpu.VMEM),  # xrT tile
        pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sc[bi]), memory_space=pltpu.VMEM),  # xcT tile
        pl.BlockSpec((m_pad, fe_pad), lambda bi, sr, sc: (0, 0), memory_space=pltpu.VMEM),  # w_eT
    ]


def _pad_cols(a: jnp.ndarray, to: int) -> jnp.ndarray:
    if a.shape[1] == to:
        return a
    return jnp.pad(a, ((0, 0), (0, to - a.shape[1])))


def _call_setup(order, xr_t, we_t, compute_dtype):
    tile = EDGE_TILE
    m_pad, fe_pad = xr_t.shape[0], we_t.shape[1]
    ns = order.step_row.shape[0]
    cd = jnp.dtype(compute_dtype)
    precision = jax.lax.Precision.HIGHEST if cd == jnp.float32 else jax.lax.Precision.DEFAULT
    operands = (
        order.step_row,
        order.step_col,
        order.row_local,
        order.col_local,
        order.eattr_t,
    )
    mask = jnp.repeat(order.out_visited, tile)[None, :]
    return tile, m_pad, fe_pad, ns, cd, precision, operands, mask


@functools.partial(jax.jit, static_argnames=("num_tiles", "compute_dtype"))
def _fwd_call(order, xr_t, xc_t, we_t, *, num_tiles, compute_dtype):
    tile, m_pad, fe_pad, ns, cd, precision, operands, mask = _call_setup(order, xr_t, we_t, compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ns,),
        in_specs=_mt_specs(tile, m_pad, fe_pad),
        out_specs=pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sr[bi]), memory_space=pltpu.VMEM),
    )
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, cd=cd, precision=precision, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, num_tiles * tile), jnp.float32),
    )(*operands, xr_t, xc_t, we_t)
    return jnp.where(mask, out_t, 0.0)


@functools.partial(jax.jit, static_argnames=("num_tiles", "compute_dtype"))
def _bwd_rows_call(order, xr_t, xc_t, we_t, g_t, *, num_tiles, compute_dtype):
    tile, m_pad, fe_pad, ns, cd, precision, operands, mask = _call_setup(order, xr_t, we_t, compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ns,),
        in_specs=[
            *_mt_specs(tile, m_pad, fe_pad),
            pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sr[bi]), memory_space=pltpu.VMEM),  # gT tile
        ],
        out_specs=(
            pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sr[bi]), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, fe_pad), lambda bi, sr, sc: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    dxr_t, dwe_t = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, cd=cd, precision=precision, tile=tile),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, num_tiles * tile), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, fe_pad), jnp.float32),
        ),
    )(*operands, xr_t, xc_t, we_t, g_t)
    return jnp.where(mask, dxr_t, 0.0), dwe_t


@functools.partial(jax.jit, static_argnames=("num_tiles", "compute_dtype"))
def _bwd_cols_call(order, xr_t, xc_t, we_t, g_t, *, num_tiles, compute_dtype):
    tile, m_pad, fe_pad, ns, cd, precision, operands, mask = _call_setup(order, xr_t, we_t, compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ns,),
        in_specs=[
            *_mt_specs(tile, m_pad, fe_pad),
            pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sr[bi]), memory_space=pltpu.VMEM),  # gT tile
        ],
        out_specs=pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sc[bi]), memory_space=pltpu.VMEM),
    )
    dxc_t = pl.pallas_call(
        functools.partial(_bwd_cols_kernel, cd=cd, precision=precision, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, num_tiles * tile), jnp.float32),
    )(*operands, xr_t, xc_t, we_t, g_t)
    return jnp.where(mask, dxc_t, 0.0)


def blocked_message_sum_tpu(
    structure: BlockedEdgeStructure,
    xr: jnp.ndarray,
    xc: jnp.ndarray,
    w_e: jnp.ndarray,
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """TPU implementation of :func:`blocked_edges.blocked_message_sum`;
    differentiable w.r.t. ``xr``, ``xc``, ``w_e``."""
    cd_name = jnp.dtype(compute_dtype or jnp.float32).name
    m = xr.shape[1]
    fe = structure.edge_dim
    m_pad = m + (-m) % 8
    fe_pad = structure.rm.eattr_t.shape[0]
    num_tiles = structure.num_node_tiles

    def _pack(xr, xc, w_e):
        xr_t = _pad_cols(xr, m_pad).T
        xc_t = _pad_cols(xc, m_pad).T
        # [fe, M] -> [M_pad, fe_pad] (transposed, zero-padded both ways)
        we_t = jnp.pad(jnp.pad(w_e, ((0, fe_pad - fe), (0, 0))).T, ((0, m_pad - m), (0, 0)))
        return xr_t, xc_t, we_t

    @jax.custom_vjp
    def op(xr, xc, w_e):
        xr_t, xc_t, we_t = _pack(xr, xc, w_e)
        out_t = _fwd_call(structure.rm, xr_t, xc_t, we_t, num_tiles=num_tiles, compute_dtype=cd_name)
        return out_t[:m].T

    def fwd(xr, xc, w_e):
        return op(xr, xc, w_e), (xr, xc, w_e)

    def bwd(res, g):
        xr, xc, w_e = res
        xr_t, xc_t, we_t = _pack(xr, xc, w_e)
        g_t = _pad_cols(g, m_pad).T
        dxr_t, dwe_t = _bwd_rows_call(structure.rm, xr_t, xc_t, we_t, g_t, num_tiles=num_tiles, compute_dtype=cd_name)
        dxc_t = _bwd_cols_call(structure.cm, xr_t, xc_t, we_t, g_t, num_tiles=num_tiles, compute_dtype=cd_name)
        return dxr_t[:m].T, dxc_t[:m].T, dwe_t[:m, :fe].T

    op.defvjp(fwd, bwd)
    return op(xr, xc, w_e)
