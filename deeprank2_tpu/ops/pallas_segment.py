"""Pallas TPU kernel for the GNN aggregation primitive (segment-sum / SpMM).

The message-passing hot op is ``out[v] = sum_{e: row[e]==v} msg[e]``. XLA's
scatter handles this well in f32; this kernel reformulates it as a *banded
one-hot matmul* that runs on the MXU, the shape recommended by the
sparse-GNN-on-dense-hardware literature:

- edges are sorted by destination row (the batcher can emit them sorted);
- the grid is tiled over output rows; each program DMAs only the edge blocks
  whose rows fall inside its tile (block ranges are scalar-prefetched);
- within a tile, ``out += onehot(rows - base) @ msg_block`` — a
  [TV, TE] x [TE, F] MXU contraction; rows outside the tile and padded edges
  (row == num_segments) produce zero one-hot columns and vanish.

Use :func:`pallas_segment_sum` for the end-to-end op (sorts + computes block
ranges under jit) or :func:`segment_sum_sorted` when edges are pre-sorted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_V = 256  # output rows per program
TILE_E = 1024  # edges per DMA block (i32 VMEM tiling quantum)


def _kernel(block_start_ref, block_count_ref, rows_vmem, msg_hbm, out_ref, msg_buf, sems):
    i = pl.program_id(0)
    base = i * TILE_V
    out_ref[:] = jnp.zeros_like(out_ref)

    start = block_start_ref[i]
    count = block_count_ref[i]

    def body(b, _):
        blk = start + b
        msg_dma = pltpu.make_async_copy(msg_hbm.at[pl.ds(blk * TILE_E, TILE_E), :], msg_buf, sems.at[0])
        msg_dma.start()

        offset = pl.multiple_of(blk * TILE_E, TILE_E)
        rows = rows_vmem[pl.ds(offset, TILE_E)]  # [TE] vector load, tile-aligned
        local = rows - base
        onehot = (local[None, :] == jax.lax.broadcasted_iota(jnp.int32, (TILE_V, TILE_E), 0)).astype(jnp.float32)

        msg_dma.wait()
        out_ref[:] += jax.lax.dot(onehot, msg_buf[:], precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_sorted(messages: jnp.ndarray, rows: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Segment sum over edges pre-sorted by ``rows`` (OOB rows must sort last).

    Differentiable wrt ``messages`` (the VJP is a row gather).

    Args:
        messages: f32 [E, F]; E padded to a multiple of TILE_E, F to 128.
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
    pad_f = (-feat) % 128
    pad_v = (-num_segments) % TILE_V
    v_cap = num_segments + pad_v
    if pad_e:
        messages = jnp.pad(messages, ((0, pad_e), (0, 0)))
        rows = jnp.pad(rows, (0, pad_e), constant_values=v_cap)
    if pad_f:
        messages = jnp.pad(messages, ((0, 0), (0, pad_f)))
    rows = rows.astype(jnp.int32)

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
        out_specs=pl.BlockSpec((TILE_V, feat + pad_f), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_E, feat + pad_f), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_cap, feat + pad_f), jnp.float32),
    )(block_start, block_count, rows, messages)

    return out[:num_segments, :feat]


def pallas_segment_sum(messages: jnp.ndarray, rows: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Segment sum for arbitrary row order: sorts by row, then runs the kernel."""
    order = jnp.argsort(rows)
    return segment_sum_sorted(messages[order], rows[order], num_segments)
