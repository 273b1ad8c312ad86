"""Pallas TPU kernels for blocked per-edge-feature message passing.

Implements :func:`deeprank2_tpu.ops.blocked_edges.blocked_message_sum` on TPU:
``out[v] = sum_{e: row(e)=v} relu(xr[v] + xc[col(e)] + e_attr(e) @ w_e)`` —
the per-edge message pipeline of VanillaNetwork-style models (reference:
deeprank2/neuralnets/gnn/vanilla_gnn.py:10-41).

Two kernels over TILE_E edge slabs; each slab has one destination tile and
``K_SUB`` source tiles (all scalar-prefetched — see ops/blocked_edges.py for
the layout):

- forward: gather both endpoints as one-hot MXU matmuls (per-sub-block for
  the source side), thin edge-feature matmul, relu, aggregate back with the
  transposed one-hot into a VMEM-resident destination tile;
- backward (same sort, mirror-fused): recomputes the pre-activations from
  the same VMEM tiles (rematerialization — the operands are already
  on-chip), forms ``dmsg = gather(g) * relu'`` and accumulates ``d xr``
  and ``d w_e``; for ``d xc`` it evaluates each edge's MIRROR message
  (role-swapped gathers of the same resident tiles — the edge set is closed
  under mirroring) so the source-side gradient also scatters by destination
  tile, which the grid visits consecutively. No col-major sort exists.

Everything per-edge lives only in VMEM ([M, TILE_E] slabs); HBM never sees an
``[E, M]`` message matrix in either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeprank2_tpu.ops.blocked_edges import EDGE_TILE, K_SUB, SUB_E, TILE_E, BlockedEdgeStructure
from deeprank2_tpu.ops.segment import plain_matmul_precision

# run the kernels in the Pallas interpreter (exact, any backend) — used by
# tests to check kernel logic without TPU hardware
_INTERPRET = False


# perf-triage knob (tests/perf/blocked_decompose.py): "noonehot" replaces
# one-hot synthesis with a constant (wrong results, isolates its VPU cost)
_DEBUG = __import__("os").environ.get("DR2_BLOCKED_DEBUG", "")
if _DEBUG:
    import warnings as _warnings

    _warnings.warn(
        f"DR2_BLOCKED_DEBUG={_DEBUG!r}: blocked-edge kernels will produce WRONG results "
        "(perf-triage mode; unset the variable for real runs)",
        stacklevel=1,
    )


def _onehot(local: jnp.ndarray, tile: int, width: int, dtype) -> jnp.ndarray:
    """[tile, width] one-hot of within-tile indices; the sentinel ``tile``
    yields an all-zero column (how padded edges vanish)."""
    if _DEBUG == "noonehot":
        return jnp.full((tile, width), 0.0078125, dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, width), 0)
    return (local[None, :] == iota).astype(dtype)


def _dot_for(precision):
    return functools.partial(jax.lax.dot_general, precision=precision, preferred_element_type=jnp.float32)


def _make_gdot(cd, precision):
    """Gather/scatter matmul against an exactly-bf16 one-hot operand.

    f32 path: one-hots are exactly representable in bf16, so near-f32
    results need only the x side split into bf16 hi+lo — two single-pass
    MXU matmuls (f32 accumulation, ~1e-5 relative) instead of Mosaic's
    six-pass HIGHEST emulation. The same trick as the BCSR SpMM
    (ops/block_sparse.py); round 3 closed the f32 blocked path's 4.8x gap
    to its bf16 twin with it. bf16 path: plain single-pass matmul."""
    if _DEBUG == "cheapdot":
        # wrong results: every gather/scatter dot becomes a slice/pad of its
        # x operand — keeps the data dependencies and slab shapes, removes
        # the MXU work (tests/perf/blocked_decompose.py)
        def gdot(x, oh, dims):
            width = oh.shape[1] if dims[0][1] == (0,) else oh.shape[0]
            out = x.astype(jnp.float32)[:, :width]
            if out.shape[1] < width:
                out = jnp.pad(out, ((0, 0), (0, width - out.shape[1])))
            return out + oh[0, 0].astype(jnp.float32)
    elif cd == jnp.float32:

        def gdot(x, oh, dims):
            x = x.astype(jnp.float32)
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            d = functools.partial(jax.lax.dot_general, dimension_numbers=dims, preferred_element_type=jnp.float32)
            return d(hi, oh) + d(lo, oh)
    else:

        def gdot(x, oh, dims):
            return jax.lax.dot_general(x.astype(cd), oh, dims, precision=precision, preferred_element_type=jnp.float32)

    return gdot


def _oh_dtype(cd):
    """One-hot operand dtype: bf16 rides the f32 split path exactly."""
    return jnp.bfloat16 if cd == jnp.float32 else cd


def _gather_subs(x_col_refs, col_local, tile, cd, gdot):
    """Per-sub-block source gathers, concatenated to [M, TILE_E]; also
    returns the per-sub one-hots for reuse."""
    ohs, parts = [], []
    for k in range(K_SUB):
        oh = _onehot(col_local[k * SUB_E : (k + 1) * SUB_E], tile, SUB_E, _oh_dtype(cd))
        ohs.append(oh)
        parts.append(gdot(x_col_refs[k][:], oh, (((1,), (0,)), ((), ()))))
    return jnp.concatenate(parts, axis=1), ohs


@plain_matmul_precision
def _fwd_kernel(step_row_ref, sub_col_ref, row_ref, col_ref, e_ref, xr_ref, *rest, cd, precision, tile):
    xc_refs, we_ref, out_ref = rest[:K_SUB], rest[K_SUB], rest[K_SUB + 1]
    bi = pl.program_id(0)
    prev = jnp.maximum(bi - 1, 0)

    @pl.when(jnp.logical_or(bi == 0, step_row_ref[bi] != step_row_ref[prev]))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dot = _dot_for(precision)
    gdot = _make_gdot(cd, precision)
    row_local, col_local = row_ref[:], col_ref[:]
    oh_r = _onehot(row_local, tile, TILE_E, _oh_dtype(cd))
    src, _ = _gather_subs(xc_refs, col_local, tile, cd, gdot)
    dst = gdot(xr_ref[:], oh_r, (((1,), (0,)), ((), ())))
    # thin [M, fe] @ [fe, TILE_E] matmul: HIGHEST stays cheap here (fe <= 8)
    ew = dot(we_ref[:].astype(cd), e_ref[:].astype(cd), (((1,), (0,)), ((), ())))
    msg = jnp.maximum(dst + src + ew, 0.0)
    # sentinel rows have an all-zero one-hot column -> padded edges vanish here
    out_ref[:] += gdot(msg, oh_r, (((1,), (1,)), ((), ())))


@plain_matmul_precision
def _bwd_kernel(step_row_ref, sub_col_ref, row_ref, col_ref, e_ref, xr_ref, *rest, cd, precision, tile):
    xc_refs = rest[:K_SUB]
    we_ref = rest[K_SUB]
    xc_row_ref = rest[K_SUB + 1]
    xr_col_refs = rest[K_SUB + 2 : 2 * K_SUB + 2]
    g_row_ref = rest[2 * K_SUB + 2]
    g_col_refs = rest[2 * K_SUB + 3 : 3 * K_SUB + 3]
    dxr_ref, dxc_ref, dwe_ref = rest[3 * K_SUB + 3 :]

    bi = pl.program_id(0)
    prev = jnp.maximum(bi - 1, 0)

    @pl.when(bi == 0)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)

    @pl.when(jnp.logical_or(bi == 0, step_row_ref[bi] != step_row_ref[prev]))
    def _():
        dxr_ref[:] = jnp.zeros_like(dxr_ref)
        dxc_ref[:] = jnp.zeros_like(dxc_ref)

    dot = _dot_for(precision)
    gdot = _make_gdot(cd, precision)
    row_local, col_local = row_ref[:], col_ref[:]
    oh_r = _onehot(row_local, tile, TILE_E, _oh_dtype(cd))
    eT = e_ref[:].astype(cd)
    ew = dot(we_ref[:].astype(cd), eT, (((1,), (0,)), ((), ())))

    # original messages: dmsg = g[row] * relu'(pre)
    src, oh_cs = _gather_subs(xc_refs, col_local, tile, cd, gdot)
    dst = gdot(xr_ref[:], oh_r, (((1,), (0,)), ((), ())))
    pre = dst + src + ew
    dmsg = gdot(g_row_ref[:], oh_r, (((1,), (0,)), ((), ())))
    dmsg = dmsg * (pre > 0.0).astype(jnp.float32)
    dxr_ref[:] += gdot(dmsg, oh_r, (((1,), (1,)), ((), ())))
    # thin contraction onto [M, fe]: HIGHEST keeps weight grads exact
    dwe_ref[:] += dot(dmsg.astype(cd) if cd != jnp.float32 else dmsg, eT, (((1,), (1,)), ((), ())))

    # mirror messages: for e = (r, c), dmsg[mirror] = g[c] * relu'(xr[c] +
    # xc[r] + ew) — scattered by r, which gives d xc (see module docstring)
    src_m_parts, gm_parts = [], []
    for k in range(K_SUB):
        src_m_parts.append(gdot(xr_col_refs[k][:], oh_cs[k], (((1,), (0,)), ((), ()))))
        gm_parts.append(gdot(g_col_refs[k][:], oh_cs[k], (((1,), (0,)), ((), ()))))
    pre_m = gdot(xc_row_ref[:], oh_r, (((1,), (0,)), ((), ()))) + jnp.concatenate(src_m_parts, axis=1) + ew
    dmsg_m = jnp.concatenate(gm_parts, axis=1) * (pre_m > 0.0).astype(jnp.float32)
    dxc_ref[:] += gdot(dmsg_m, oh_r, (((1,), (1,)), ((), ())))


def _common_specs(tile, m_pad, fe_pad):
    """locals, edge slab, xr destination tile."""
    return [
        pl.BlockSpec((TILE_E,), lambda bi, sr, sc: (bi,), memory_space=pltpu.VMEM),  # row_local
        pl.BlockSpec((TILE_E,), lambda bi, sr, sc: (bi,), memory_space=pltpu.VMEM),  # col_local
        pl.BlockSpec((fe_pad, TILE_E), lambda bi, sr, sc: (0, bi), memory_space=pltpu.VMEM),  # eattr_t
        pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sr[bi]), memory_space=pltpu.VMEM),  # xrT row tile
    ]


def _col_spec(tile, m_pad, k):
    return pl.BlockSpec((m_pad, tile), lambda bi, sr, sc, _k=k: (0, sc[bi * K_SUB + _k]), memory_space=pltpu.VMEM)


def _row_spec(tile, m_pad):
    return pl.BlockSpec((m_pad, tile), lambda bi, sr, sc: (0, sr[bi]), memory_space=pltpu.VMEM)


def _pad_cols(a: jnp.ndarray, to: int) -> jnp.ndarray:
    if a.shape[1] == to:
        return a
    return jnp.pad(a, ((0, 0), (0, to - a.shape[1])))


def _call_setup(structure, xr_t, we_t, compute_dtype):
    tile = EDGE_TILE
    m_pad, fe_pad = xr_t.shape[0], we_t.shape[1]
    ns = structure.num_slabs
    cd = jnp.dtype(compute_dtype)
    precision = jax.lax.Precision.HIGHEST if cd == jnp.float32 else jax.lax.Precision.DEFAULT
    operands = (structure.step_row, structure.sub_col, structure.row_local, structure.col_local, structure.eattr_t)
    mask = jnp.repeat(structure.out_visited, tile)[None, :]
    return tile, m_pad, fe_pad, ns, cd, precision, operands, mask


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _fwd_call(structure, xr_t, xc_t, we_t, *, compute_dtype):
    tile, m_pad, fe_pad, ns, cd, precision, operands, mask = _call_setup(structure, xr_t, we_t, compute_dtype)
    num_tiles = structure.num_node_tiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ns,),
        in_specs=[
            *_common_specs(tile, m_pad, fe_pad),
            *[_col_spec(tile, m_pad, k) for k in range(K_SUB)],  # xcT source tiles
            pl.BlockSpec((m_pad, fe_pad), lambda bi, sr, sc: (0, 0), memory_space=pltpu.VMEM),  # w_eT
        ],
        out_specs=_row_spec(tile, m_pad),
    )
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, cd=cd, precision=precision, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, num_tiles * tile), jnp.float32),
        interpret=_INTERPRET,
    )(*operands, xr_t, *([xc_t] * K_SUB), we_t)
    return jnp.where(mask, out_t, 0.0)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _bwd_call(structure, xr_t, xc_t, we_t, g_t, *, compute_dtype):
    tile, m_pad, fe_pad, ns, cd, precision, operands, mask = _call_setup(structure, xr_t, we_t, compute_dtype)
    num_tiles = structure.num_node_tiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ns,),
        in_specs=[
            *_common_specs(tile, m_pad, fe_pad),
            *[_col_spec(tile, m_pad, k) for k in range(K_SUB)],  # xcT source tiles
            pl.BlockSpec((m_pad, fe_pad), lambda bi, sr, sc: (0, 0), memory_space=pltpu.VMEM),  # w_eT
            _row_spec(tile, m_pad),  # xcT at the destination tile (mirror)
            *[_col_spec(tile, m_pad, k) for k in range(K_SUB)],  # xrT source tiles (mirror)
            _row_spec(tile, m_pad),  # gT destination tile
            *[_col_spec(tile, m_pad, k) for k in range(K_SUB)],  # gT source tiles (mirror)
        ],
        out_specs=(
            _row_spec(tile, m_pad),  # d xr
            _row_spec(tile, m_pad),  # d xc (mirror-scattered by destination)
            pl.BlockSpec((m_pad, fe_pad), lambda bi, sr, sc: (0, 0), memory_space=pltpu.VMEM),  # d w_e
        ),
    )
    dxr_t, dxc_t, dwe_t = pl.pallas_call(
        functools.partial(_bwd_kernel, cd=cd, precision=precision, tile=tile),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, num_tiles * tile), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, num_tiles * tile), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, fe_pad), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(*operands, xr_t, *([xc_t] * K_SUB), we_t, xc_t, *([xr_t] * K_SUB), g_t, *([g_t] * K_SUB))
    return jnp.where(mask, dxr_t, 0.0), jnp.where(mask, dxc_t, 0.0), dwe_t


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
    fe_pad = structure.eattr_t.shape[0]

    def _pack(xr, xc, w_e):
        xr_t = _pad_cols(xr, m_pad).T
        xc_t = _pad_cols(xc, m_pad).T
        # [fe, M] -> [M_pad, fe_pad] (transposed, zero-padded both ways)
        we_t = jnp.pad(jnp.pad(w_e, ((0, fe_pad - fe), (0, 0))).T, ((0, m_pad - m), (0, 0)))
        return xr_t, xc_t, we_t

    @jax.custom_vjp
    def op(xr, xc, w_e):
        xr_t, xc_t, we_t = _pack(xr, xc, w_e)
        out_t = _fwd_call(structure, xr_t, xc_t, we_t, compute_dtype=cd_name)
        return out_t[:m].T

    def fwd(xr, xc, w_e):
        return op(xr, xc, w_e), (xr, xc, w_e)

    def bwd(res, g):
        xr, xc, w_e = res
        xr_t, xc_t, we_t = _pack(xr, xc, w_e)
        g_t = _pad_cols(g, m_pad).T
        dxr_t, dxc_t, dwe_t = _bwd_call(structure, xr_t, xc_t, we_t, g_t, compute_dtype=cd_name)
        return dxr_t[:m].T, dxc_t[:m].T, dwe_t[:m, :fe].T

    op.defvjp(fwd, bwd)
    return op(xr, xc, w_e)
