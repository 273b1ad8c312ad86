"""Pallas TPU kernel for the GNN aggregation primitive (segment-sum / SpMM).

The message-passing hot op is ``out[v] = sum_{e: row[e]==v} msg[e]``. This
kernel reformulates it as a *banded one-hot matmul* on the MXU:

- edges are sorted by destination row (the batcher emits them sorted);
- the grid tiles the output rows; each program double-buffer-DMAs only the
  edge blocks whose rows fall inside its tile (block ranges scalar-prefetched);
- messages travel transposed ``[F, E]`` so the feature dim (often 32) rides
  the sublanes and the 128-lane axis carries edges — no padding of F to 128
  (4x less DMA and MXU work than the row-major formulation);
- within a tile, ``out^T += msg_block [F, TE] @ onehot[TV, TE]^T`` — rows
  outside the tile and padded edges (row == num_segments) give zero one-hot
  columns and vanish.

Measured on one v5e chip ([1.31M, 32] messages into 82k segments, honest
data-dependent-sync timing): 10.3 ms/op exact-f32 vs 17.4 ms for XLA's sorted
scatter — 1.7x. The remaining gap to the ~0.5 ms roofline is MXU
underutilization at M = F = 32; the block-dense layout (ops/batch.py)
remains the fast path where graphs are small enough for dense adjacencies.

Use :func:`pallas_segment_sum` for the end-to-end op (sorts under jit) or
:func:`segment_sum_sorted` when edges are pre-sorted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeprank2_tpu.ops.segment import plain_matmul_precision

TILE_V = 256  # output rows per program
TILE_E = 2048  # edges per DMA block


@plain_matmul_precision
def _kernel(block_start_ref, block_count_ref, rows_vmem, msgT_hbm, out_ref, msg_buf, sems):
    i = pl.program_id(0)
    base = i * TILE_V
    out_ref[:] = jnp.zeros_like(out_ref)

    start = block_start_ref[i]
    count = block_count_ref[i]

    def dma(block_index, slot):
        return pltpu.make_async_copy(
            msgT_hbm.at[:, pl.ds(block_index * TILE_E, TILE_E)],
            msg_buf.at[slot],
            sems.at[slot],
        )

    def body(b, _):
        blk = start + b
        slot = b % 2

        @pl.when(b == 0)
        def _():
            dma(blk, slot).start()

        @pl.when(b + 1 < count)
        def _():
            dma(blk + 1, (b + 1) % 2).start()

        offset = pl.multiple_of(blk * TILE_E, TILE_E)
        rows = rows_vmem[pl.ds(offset, TILE_E)]
        local = rows - base
        onehot = (local[None, :] == jax.lax.broadcasted_iota(jnp.int32, (TILE_V, TILE_E), 0)).astype(jnp.float32)

        dma(blk, slot).wait()
        # out^T[f, v] += msgT[f, e] @ onehot[v, e]^T; HIGHEST keeps the
        # messages exact f32 through the MXU (default rounds them to bf16,
        # ~1e-3 relative error on the sums)
        out_ref[:] += jax.lax.dot_general(
            msg_buf[slot],
            onehot,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_sorted(messages: jnp.ndarray, rows: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Segment sum over edges pre-sorted by ``rows`` (OOB rows must sort last).

    Differentiable wrt ``messages`` (the VJP is a row gather).

    Args:
        messages: f32 [E, F].
        rows: i32 [E] ascending; padded entries >= num_segments.
        num_segments: output rows (padded to a multiple of TILE_V internally).
    """
    return _segment_sum_sorted_impl(messages, rows, num_segments)


def _segment_sum_fwd(messages, rows, num_segments):
    return _segment_sum_sorted_impl(messages, rows, num_segments), rows


def _segment_sum_bwd(num_segments, rows, g):
    safe = jnp.clip(rows, 0, num_segments - 1)
    d_messages = g[safe] * (rows < num_segments).astype(g.dtype)[:, None]
    return d_messages, None


segment_sum_sorted.defvjp(_segment_sum_fwd, _segment_sum_bwd)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _segment_sum_sorted_impl(messages: jnp.ndarray, rows: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    num_edges, feat = messages.shape
    pad_e = (-num_edges) % TILE_E
    pad_v = (-num_segments) % TILE_V
    v_cap = num_segments + pad_v
    if pad_e:
        messages = jnp.pad(messages, ((0, pad_e), (0, 0)))
        rows = jnp.pad(rows, (0, pad_e), constant_values=v_cap)
    pad_f = (-feat) % 8  # sublane quantum for the [F, E] layout
    if pad_f:
        messages = jnp.pad(messages, ((0, 0), (0, pad_f)))
    rows = rows.astype(jnp.int32)
    fw = feat + pad_f
    msg_t = messages.T  # [F, E]: feature dim on sublanes, edges on lanes

    num_v_tiles = v_cap // TILE_V

    # per-v-tile edge-block ranges: edges for rows [i*TV, (i+1)*TV)
    boundaries = jnp.arange(num_v_tiles + 1, dtype=jnp.int32) * TILE_V
    edge_bounds = jnp.searchsorted(rows, boundaries, side="left").astype(jnp.int32)
    block_start = edge_bounds[:-1] // TILE_E
    block_end = -(-jnp.maximum(edge_bounds[1:], 1) // TILE_E)  # ceil
    block_count = jnp.maximum(block_end - block_start, 0)
    block_count = jnp.where(edge_bounds[1:] > edge_bounds[:-1], block_count, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_v_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows: whole array in VMEM (E ints, small)
            pl.BlockSpec(memory_space=pltpu.HBM),  # messages stay in HBM
        ],
        out_specs=pl.BlockSpec((fw, TILE_V), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, fw, TILE_E), jnp.float32),  # double-buffered edge blocks
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out_t = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((fw, v_cap), jnp.float32),
    )(block_start, block_count, rows, msg_t)

    return out_t[:feat, :num_segments].T


def pallas_segment_sum(messages: jnp.ndarray, rows: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Segment sum for arbitrary row order: sorts by row, then runs the kernel."""
    order = jnp.argsort(rows)
    return segment_sum_sorted(messages[order], rows[order], num_segments)
