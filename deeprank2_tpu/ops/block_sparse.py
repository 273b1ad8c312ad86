"""Block-sparse (BCSR) adjacency SpMM — the large-graph aggregation path.

The block-dense layout (ops/batch.py DenseGraphBatch) owns small graphs: a
``[G, N, N]`` adjacency is affordable for N up to a few hundred. Atomic-
resolution interface graphs grow to 10^4-10^5 nodes, where a dense adjacency
is quadratically impossible and the COO gather/segment path (ops/segment.py)
leaves the MXU idle. This module covers that regime:

- nodes are reordered by spatial locality (8 Å cell lexsort — geometric
  graphs with a distance cutoff then have near-banded adjacency);
- the adjacency is tiled into ``B x B`` blocks (B = 128, the MXU edge);
  only nonzero blocks are kept (measured fill on locality-sorted atomic
  graphs: 1-2 %, e.g. 1ATN at 4.5 Å: 1.6 %), stored int8 (entries are
  exactly 0/1, so int8 is lossless; the kernel widens to f32 on the fly).
  int8 + 16-block grid steps cut the raw SpMM ~10 % vs bf16 + 8-block
  steps and shrink the resident adjacency ~35 % (e.g. 377 MB for a
  100k-node atomic graph) — the grid is per-step-overhead-bound on v5e,
  so fewer/larger steps beat smaller bytes-per-step;
- the SpMM ``out = A @ x`` runs as ONE Pallas grid over KBATCH-sized block
  batches in the *transposed* layout (features ride sublanes — no 4x lane
  padding at the typical F = 16..64). Mosaic's own input pipeline streams
  the block batches (no manual DMA, no per-tile pipeline drains); each batch
  contracts as a single ``[F, K*B] @ [K*B, B]`` MXU matmul; the output block
  is revisited and accumulated in VMEM while consecutive batches share a
  destination row tile (the builder sorts and zero-pads per tile, so no
  masking is needed anywhere in the kernel).

Graphs whose ``x^T`` exceeds VMEM are handled by the same kernel through
*column chunking*: blocks are sorted by (source chunk, dest row tile), the
x^T chunk is DMA'd into a VMEM scratch whenever the chunk id changes (a few
times per SpMM), and the kernel emits one output slab per chunk; a masked
XLA sum collapses the slabs (the mask keeps uninitialized never-visited slab
tiles out).

Adjacency symmetry (edges are mirrored, reference dataset.py:944-951) makes
``A^T = A``, so the VJP w.r.t. ``x`` is the same SpMM applied to the
cotangent — no transposed block structure is needed.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax

from deeprank2_tpu.ops.segment import effective_platform, plain_matmul_precision
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

DEFAULT_BLOCK = 128
# adjacency blocks per run-padding quantum / per MXU contraction. Runs are
# zero-padded to a KBATCH multiple; on banded atomic graphs the mean run
# length is ~15 blocks, so KBATCH=16 pads the stream ~50 % while KBATCH=8
# pads ~18 %. The round-5 sweep at the slot8 clustered bench shape (v5e,
# 100k nodes) flipped the round-3 verdict: KBATCH=8/SUPER=16 runs the
# clustered train step at 1.488 ms vs 16/8's 1.542 and the plain BCSR step
# at 3.10 vs 3.15 ms, while storing 22 % fewer blocks (287 vs 369 MB) — the
# kernel's time model is stream_bytes/BW + num_subs * ~75 ns of per-sub
# scalar/slice/dot-issue work, and at kb=8 the padding savings beat the
# doubled sub count. (A contiguous-column window layout that would delete
# the per-sub gather entirely measured +121-141 % blocks on the
# locality-ordered bench graph — scattered in-run columns — and was
# rejected.) Sweepable via DR2_BCSR_* env vars; sharded/ring slices choose
# per-structure quanta (parallel/blocksparse_partition.py:_choose_kbatch).
KBATCH = int(_os.environ.get("DR2_BCSR_KBATCH", "8"))
# KBATCH sub-batches per Pallas grid step: each step processes SUPER
# sub-batches and writes completed (chunk, row-tile) output tiles with
# explicit async DMA (each run is visited exactly once per SpMM, so flushes
# are plain writes; waits are deferred one run via the parity double-buffer,
# see _kernel_stream). Capacity pads to KBATCH*SUPER blocks; run padding
# stays KBATCH-granular. 16x8 int8 blocks/step = 2 MB pipelined payload.
SUPER = int(_os.environ.get("DR2_BCSR_SUPER", "16"))
# tiles per x^T column chunk: sized so an F=64 f32 chunk fits the VMEM budget
# next to the (now SUPER-deep) double-buffered block pipeline
CHUNK_TILES = int(_os.environ.get("DR2_BCSR_CHUNK_TILES", "320"))
_CELL = 8.0  # Å — locality-sort cell size (≈ 2x the atomic contact cutoff)


def locality_order(positions: np.ndarray, cell: float = _CELL) -> np.ndarray:
    """Node permutation that clusters spatial neighbours: lexsort by 8 Å grid
    cell, then by coordinates within the cell. Geometric-cutoff graphs sorted
    this way have ~1-2 % nonzero-block fill at B = 128.

    Measured alternatives on a 100k-node protein-density graph (4.5 Å
    cutoff), both WORSE than this lexsort: reverse Cuthill-McKee gives +50 %
    nonzero blocks (bandwidth minimization spreads neighbours thinly along
    the band instead of densifying local blocks) and Morton/Z-order on the
    cells gives +37 % at any cell size 6-12 Å (octant jumps break the
    within-column contiguity the final coordinate sort provides)."""
    pos = np.asarray(positions, dtype=np.float64)
    q = np.floor(pos / cell).astype(np.int64)
    return np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0], q[:, 2], q[:, 1], q[:, 0]))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockSparseStructure:
    """BCSR adjacency of one (batched) graph, sorted by (col chunk, row tile).

    ``blocks_t[k][c, r] = 1`` iff the graph has the directed edge
    ``(row_tile[k]*B + r  <-  col_tile[k]*B + c)`` — blocks are stored
    *transposed* so the kernel's ``x^T_tile @ block`` contraction needs no
    in-kernel transpose. Each (chunk, row tile) run is zero-padded to a
    KBATCH multiple (zero blocks contribute nothing); ``visited`` marks the
    (chunk, row tile) slab entries the kernel writes.
    """

    blocks_t: jax.Array  # int8 [NB, B, B] (entries 0/1), NB a KBATCH multiple
    block_row: jax.Array  # i32 [NB] destination row tile, LOCAL to the row slice (zero-pads keep their run's row)
    block_col: jax.Array  # i32 [NB] source col tile, global (zero-pads: first tile of their chunk)
    batch_row: jax.Array  # i32 [NB/KBATCH] destination row tile per batch (local)
    batch_chunk: jax.Array  # i32 [NB/KBATCH] source col chunk per batch
    visited: jax.Array  # bool [C, R] slab entries written by the kernel
    num_tiles: int = field(metadata={"static": True})  # source/column tile count (global)
    num_chunks: int = field(metadata={"static": True})
    block: int = field(metadata={"static": True})
    # destination/row tile count: equal to num_tiles for the square symmetric
    # case; a row slice ``A[r0:r1, :]`` (multi-device graph parallelism,
    # parallel/blocksparse_partition.py) has R = r1 - r0 < NT. Row indices are
    # stored local to the slice, so the offset itself is not retained.
    num_row_tiles: int = field(metadata={"static": True}, default=-1)
    # whether this structure is a symmetric matrix (the full adjacency, or a
    # diagonal slice A[r, r] of it): gates the "VJP == same SpMM" shortcut.
    # A ring bucket A[d, s] with s != d is square-SHAPED but not symmetric.
    symmetric: bool = field(metadata={"static": True}, default=True)
    # run-padding quantum / MXU contraction depth this structure was built
    # with. The full single-chip adjacency keeps the global KBATCH (8 since
    # the round-5 sweep — see the constant's comment); sharded/ring SLICES
    # have short runs whose run padding is real multi-chip stream, so their
    # builders pick per-bucket quanta (parallel/blocksparse_partition.py:
    # _choose_quanta). -1 = the build-time global.
    kbatch: int = field(metadata={"static": True}, default=-1)
    # sub-batches per Pallas grid step; tiny sharded buckets drop below the
    # global SUPER so their capacity floor is kbatch*super_batches, not
    # kbatch*SUPER (a far ring step can hold 8 real blocks total)
    super_batches: int = field(metadata={"static": True}, default=-1)
    # tiles per x^T column chunk (the chunk sort is baked into the block
    # order at build time). The global default is sized for fw=64 f32
    # operands; builders whose consumers contract at fw<=32 (the clustered
    # collate) can double it — fewer chunk slabs to mask+sum per SpMM and
    # fewer chunk-switch DMAs.
    chunk_tiles: int = field(metadata={"static": True}, default=-1)

    def __post_init__(self):
        if self.num_row_tiles == -1:
            object.__setattr__(self, "num_row_tiles", self.num_tiles)
        if self.kbatch == -1:
            object.__setattr__(self, "kbatch", KBATCH)
        if self.super_batches == -1:
            object.__setattr__(self, "super_batches", SUPER)
        if self.chunk_tiles == -1:
            object.__setattr__(self, "chunk_tiles", CHUNK_TILES)

    @property
    def num_blocks(self) -> int:
        return self.blocks_t.shape[0]

    @property
    def padded_nodes(self) -> int:
        return self.num_tiles * self.block

    @property
    def padded_rows(self) -> int:
        return self.num_row_tiles * self.block

    @property
    def is_square(self) -> bool:
        return self.num_row_tiles == self.num_tiles


def required_blocks(
    und_pairs: np.ndarray,
    num_nodes: int,
    block: int = DEFAULT_BLOCK,
    row_tile_range: tuple[int, int] | None = None,
    col_tile_range: tuple[int, int] | None = None,
    kbatch: int | None = None,
    chunk_tiles: int | None = None,
) -> int:
    """The run-padded block count :func:`build_blocksparse` would produce for
    these (locality-ordered) pairs — the light requirements pass used to
    equalize per-shard capacities before sharded collation. ``kbatch``
    overrides the global run-padding quantum (``kbatch=1`` returns the REAL
    unique-block count, the denominator of padding-fraction accounting);
    ``chunk_tiles`` must match the build's."""
    kb = kbatch or KBATCH
    ct = chunk_tiles or CHUNK_TILES
    und = np.asarray(und_pairs, dtype=np.int64).reshape(-1, 2)
    num_tiles = max(-(-num_nodes // block), 1)
    rows = np.concatenate([und[:, 0], und[:, 1]])
    cols = np.concatenate([und[:, 1], und[:, 0]])
    bi, bj = rows // block, cols // block
    if row_tile_range is not None:
        t0, t1 = row_tile_range
        sel = (bi >= t0) & (bi < t1)
        bi, bj = bi[sel], bj[sel]
    if col_tile_range is not None:
        c0, c1 = col_tile_range
        sel = (bj >= c0) & (bj < c1)
        bi, bj = bi[sel], bj[sel] - c0
        num_tiles = max(c1 - c0, 1)
    chunk = bj // ct
    key = (chunk * num_tiles + bi) * num_tiles + bj
    uniq = np.unique(key)
    if not uniq.size:
        return kb
    _, counts = np.unique(uniq // num_tiles, return_counts=True)
    return max(int((-(-counts // kb) * kb).sum()), kb)


def build_blocksparse(
    und_pairs: np.ndarray,
    num_nodes: int,
    block: int = DEFAULT_BLOCK,
    pad_blocks_to: int | None = None,
    row_tile_range: tuple[int, int] | None = None,
    col_tile_range: tuple[int, int] | None = None,
    to_device: bool = True,
    weights: np.ndarray | None = None,
    weight_dtype: np.dtype | None = None,
    kbatch: int | None = None,
    super_batches: int | None = None,
    chunk_tiles: int | None = None,
) -> BlockSparseStructure:
    """BCSR structure from *undirected* node-index pairs (mirrored internally,
    so the adjacency is symmetric by construction). Node indices must already
    be in the locality order (see :func:`locality_order`); ``num_nodes`` is
    rounded up to a whole number of tiles.

    ``pad_blocks_to`` may be a callable ``required -> capacity`` (e.g. a
    grow-only bucketing policy) resolved against the KBATCH-padded block count.

    ``row_tile_range=(t0, t1)`` keeps only the blocks whose destination row
    tile lies in ``[t0, t1)`` — the row slice ``A[t0*B : t1*B, :]`` used for
    multi-device graph parallelism. Such a slice is NOT symmetric on its own;
    use :func:`deeprank2_tpu.parallel.blocksparse_partition.bcsr_spmm_sharded`
    (whose VJP exploits the symmetry of the *global* adjacency).

    ``col_tile_range=(c0, c1)`` additionally keeps only the blocks whose
    source column tile lies in ``[c0, c1)`` and REBASES columns to be local to
    that range — the rectangular bucket ``A[t0*B : t1*B, c0*B : c1*B]`` whose
    SpMM consumes only shard ``s``'s node block (the ppermute ring's rotating
    buffer; see ``parallel.blocksparse_partition.ring_bcsr_spmm``).

    ``weights`` (f32 [num_pairs]) builds a *weighted* symmetric adjacency:
    entry (i, j) and (j, i) both carry the pair's weight (the sGAT
    edge-weighted aggregation). Duplicate pairs accumulate. Storage dtype is
    ``weight_dtype`` (default bfloat16: ~0.4 % relative error, halved stream
    bytes, and what the TPU kernel's single-pass MXU path consumes anyway;
    float32 keeps the XLA fallback exact for oracle tests).
    """
    und = np.asarray(und_pairs, dtype=np.int64).reshape(-1, 2)
    num_tiles = max(-(-num_nodes // block), 1)
    rows = np.concatenate([und[:, 0], und[:, 1]])
    cols = np.concatenate([und[:, 1], und[:, 0]])
    wvals = None
    if weights is not None:
        w = np.asarray(weights, dtype=np.float32).reshape(-1)
        if w.shape[0] != und.shape[0]:
            msg = f"weights has {w.shape[0]} entries for {und.shape[0]} pairs"
            raise ValueError(msg)
        wvals = np.concatenate([w, w])
    if rows.size and (rows.max() >= num_nodes or rows.min() < 0):
        msg = f"edge index out of range: max {rows.max()} for {num_nodes} nodes"
        raise ValueError(msg)

    bi, bj = rows // block, cols // block
    t0, t1 = row_tile_range if row_tile_range is not None else (0, num_tiles)
    num_row_tiles = max(t1 - t0, 1)
    if row_tile_range is not None:
        sel = (bi >= t0) & (bi < t1)
        rows, cols, bi, bj = rows[sel], cols[sel], bi[sel], bj[sel]
        wvals = wvals[sel] if wvals is not None else None
    if col_tile_range is not None:
        c0, c1 = col_tile_range
        sel = (bj >= c0) & (bj < c1)
        rows, cols, bi, bj = rows[sel], cols[sel] - c0 * block, bi[sel], bj[sel] - c0
        wvals = wvals[sel] if wvals is not None else None
        num_tiles = max(c1 - c0, 1)
    ct = chunk_tiles or CHUNK_TILES
    num_chunks = -(-num_tiles // ct)
    bi_local = bi - t0
    chunk = bj // ct
    key = (chunk * num_row_tiles + bi_local) * num_tiles + bj
    order = np.argsort(key, kind="stable")
    uniq_key, inverse_sorted = np.unique(key[order], return_inverse=True)
    nb = len(uniq_key)

    uniq_col = (uniq_key % num_tiles).astype(np.int32)
    uniq_row = ((uniq_key // num_tiles) % num_row_tiles).astype(np.int32)
    uniq_chunk = (uniq_key // (num_tiles * num_row_tiles)).astype(np.int32)

    # group = one (chunk, row tile) run, padded to a kbatch multiple with
    # zero blocks so batches never straddle runs and the kernel needs no masks
    kb = kbatch or KBATCH
    group_key = uniq_chunk.astype(np.int64) * num_row_tiles + uniq_row
    group_ids, group_counts = np.unique(group_key, return_counts=True)
    pad_counts = -(-group_counts // kb) * kb
    group_start = np.concatenate([[0], np.cumsum(pad_counts)])[:-1]
    nb_pad = max(int(pad_counts.sum()), kb)

    if callable(pad_blocks_to):
        pad_blocks_to = pad_blocks_to(nb_pad)
    cap = max(pad_blocks_to or 0, nb_pad)
    sb = super_batches or SUPER
    cap = -(-cap // (kb * sb)) * (kb * sb)
    if (pad_blocks_to or 0) and pad_blocks_to < nb_pad:
        msg = f"pad_blocks={pad_blocks_to} < required {nb_pad}"
        raise ValueError(msg)

    block_dtype = np.int8 if wvals is None else np.float32
    blocks = np.zeros((cap, block, block), dtype=block_dtype)
    block_row = np.zeros(cap, dtype=np.int32)
    block_col = np.zeros(cap, dtype=np.int32)
    block_chunk = np.zeros(cap, dtype=np.int32)
    visited = np.zeros((num_chunks, num_row_tiles), dtype=bool)
    for gi, g in enumerate(group_ids):
        g_chunk, g_row = int(g // num_row_tiles), int(g % num_row_tiles)
        s, c = group_start[gi], pad_counts[gi]
        block_row[s : s + c] = g_row
        block_chunk[s : s + c] = g_chunk
        block_col[s : s + c] = g_chunk * ct  # zero-pads point in-chunk
        visited[g_chunk, g_row] = True

    # destination slot of each unique block: its group's start + rank inside
    rank = np.arange(nb) - np.searchsorted(group_key, group_key, side="left")
    slot = (group_start[np.searchsorted(group_ids, group_key)] + rank) if nb else np.zeros(0, np.int64)
    block_col[slot] = uniq_col

    k = np.empty(len(key), dtype=np.int64)
    k[order] = slot[inverse_sorted]
    # transposed fill: [slot, col-within, row-within]
    if len(key):
        if wvals is None:
            blocks[k, cols % block, rows % block] = 1
        else:
            np.add.at(blocks, (k, cols % block, rows % block), wvals)

    batch_row = block_row[::kb].astype(np.int32)
    batch_chunk = block_chunk[::kb].astype(np.int32)
    # trailing capacity-pad batches: route to the last real batch's slab entry
    # (their blocks are zero, so they only re-accumulate zeros there)
    nbatch_real = nb_pad // kb
    batch_row[nbatch_real:] = batch_row[max(nbatch_real - 1, 0)]
    batch_chunk[nbatch_real:] = batch_chunk[max(nbatch_real - 1, 0)]
    # ...and point their block_col INTO the routed chunk (like in-run zero
    # pads) — np.zeros left them at global tile 0, which for a chunk > 0 makes
    # the kernel's ``local = block_col - chunk*CHUNK_TILES`` negative and the
    # xchunk slice out of bounds (garbage reads; harmless only by accident
    # because the pad block is all-zero)
    block_col[nb_pad:] = batch_chunk[max(nbatch_real - 1, 0)] * ct
    if nb == 0:
        visited[0, 0] = True  # the artificial zero batch writes slab (0, 0)

    # to_device=False keeps leaves as numpy: multi-structure builders (the
    # ring/partitioned collates) stack dozens of structures and transfer the
    # stacked result once instead of per-leaf-per-structure
    conv = jnp.asarray if to_device else np.asarray
    if wvals is None:
        store_dtype = np.int8
    elif weight_dtype is not None:
        store_dtype = weight_dtype
    else:
        import ml_dtypes

        store_dtype = ml_dtypes.bfloat16
    return BlockSparseStructure(
        blocks_t=conv(blocks, dtype=store_dtype),
        block_row=conv(block_row),
        block_col=conv(block_col),
        batch_row=conv(batch_row),
        batch_chunk=conv(batch_chunk),
        visited=conv(visited),
        num_tiles=num_tiles,
        num_chunks=num_chunks,
        block=block,
        num_row_tiles=num_row_tiles if row_tile_range is not None else num_tiles,
        kbatch=kb,
        super_batches=sb,
        chunk_tiles=ct,
        symmetric=(row_tile_range is None and col_tile_range is None)
        or (col_tile_range is not None and row_tile_range == col_tile_range),
    )


# ---------------------------------------------------------------------------
# SpMM


def bcsr_spmm(
    structure: BlockSparseStructure,
    x: jnp.ndarray,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """``A @ x`` for a symmetric BCSR adjacency; differentiable w.r.t. ``x``
    (the VJP is the same SpMM on the cotangent — A is symmetric because edges
    are mirrored). ``x`` must have ``structure.padded_nodes`` rows.

    ``compute_dtype=bfloat16`` runs the block matmuls with bf16 operands
    (single-pass MXU, f32 accumulation) and keeps the resident x^T chunk in
    bf16 — the fast training path; the default (None) keeps f32 operands.

    Precision caveat (TPU kernel path): the f32 kernel always uses a bf16
    hi+lo split of ``x`` against the exactly-bf16 0/1 adjacency (two
    single-pass MXU matmuls, ~1e-5 relative error) regardless of
    ``precision`` — Mosaic's HIGHEST is a 6-pass emulation ~3x slower and
    rejects bf16 operands. Only the XLA fallback (CPU, or graphs whose x^T
    chunk exceeds VMEM) honors ``precision`` exactly; callers needing
    bit-exact HIGHEST should use :func:`bcsr_spmm_xla` directly.
    """
    if not structure.symmetric:
        msg = (
            "bcsr_spmm requires a symmetric structure (the full adjacency or "
            "a diagonal slice) — an asymmetric slice's VJP is not the same "
            "SpMM; use parallel.blocksparse_partition.bcsr_spmm_sharded or "
            "ring_bcsr_spmm for slices."
        )
        raise ValueError(msg)
    if x.shape[0] != structure.padded_nodes:
        msg = f"x has {x.shape[0]} rows; structure expects {structure.padded_nodes}"
        raise ValueError(msg)

    @jax.custom_vjp
    def spmm(x):
        return _spmm_impl(structure, x, precision, compute_dtype)

    def fwd(x):
        return spmm(x), None

    def bwd(_, g):
        return (_spmm_impl(structure, g, precision, compute_dtype),)

    spmm.defvjp(fwd, bwd)
    return spmm(x)


def bcsr_spmm_t(
    structure: BlockSparseStructure,
    x_t: jnp.ndarray,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """``A @ x`` with transposed ``[F, padded_nodes] -> [F, padded_rows]``
    input/output — the layout the kernel computes in natively. Models that
    keep activations transposed between layers (`GINetBlockSparse`) skip the
    per-SpMM ``x.T`` / ``out.T`` HBM round-trips this way. Same symmetry/
    differentiability contract as :func:`bcsr_spmm`."""
    if not structure.symmetric:
        msg = "bcsr_spmm_t requires a symmetric structure (see bcsr_spmm)"
        raise ValueError(msg)
    if x_t.shape[1] != structure.padded_nodes:
        msg = f"x_t has {x_t.shape[1]} cols; structure expects {structure.padded_nodes}"
        raise ValueError(msg)

    @jax.custom_vjp
    def spmm(x_t):
        return _spmm_impl(structure, x_t, precision, compute_dtype, transposed_io=True)

    def fwd(x_t):
        return spmm(x_t), None

    def bwd(_, g):
        return (_spmm_impl(structure, g, precision, compute_dtype, transposed_io=True),)

    spmm.defvjp(fwd, bwd)
    return spmm(x_t)


_XCHUNK_VMEM_BUDGET = 13 * 1024 * 1024


def _spmm_impl(structure: BlockSparseStructure, x: jnp.ndarray, precision, compute_dtype=None, transposed_io: bool = False) -> jnp.ndarray:
    """Raw (non-differentiable) ``A_slice @ x``: x has ``padded_nodes`` rows
    (the full column space), the output has ``padded_rows`` rows; with
    ``transposed_io`` both sides are ``[F, nodes]`` instead."""
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(jnp.float32)
    if cd.itemsize == 2:
        # bf16 operands run single-pass; HIGHEST is an f32-only request and
        # Mosaic rejects the combination ("Bad lhs type")
        precision = jax.lax.Precision.DEFAULT
    sublane = 16  # operands ride the MXU as bf16 in both paths (hi+lo pair for f32)
    feat = x.shape[0] if transposed_io else x.shape[1]
    fw = feat + (-feat) % sublane
    chunk_tiles = min(structure.chunk_tiles, structure.num_tiles)
    if effective_platform() == "tpu" and fw * chunk_tiles * structure.block * cd.itemsize <= _XCHUNK_VMEM_BUDGET:
        return _bcsr_spmm_tpu(
            structure.blocks_t,
            structure.block_col,
            structure.batch_row,
            structure.batch_chunk,
            structure.visited,
            x,
            num_tiles=structure.num_tiles,
            num_chunks=structure.num_chunks,
            chunk_tiles_cfg=structure.chunk_tiles,
            block=structure.block,
            num_row_tiles=structure.num_row_tiles,
            precision=precision,
            compute_dtype=cd.name,
            transposed_io=transposed_io,
            kbatch=structure.kbatch,
            super_batches=structure.super_batches,
        )
    if transposed_io:
        return bcsr_spmm_xla(structure, x.T, precision).T
    return bcsr_spmm_xla(structure, x, precision)


def bcsr_spmm_xla(structure: BlockSparseStructure, x: jnp.ndarray, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Reference/fallback SpMM: gather source tiles, batched block matmuls,
    segment-sum over destination tiles. Used on CPU and as the kernel oracle."""
    nt, b = structure.num_tiles, structure.block
    feat = x.shape[1]
    xt = x.reshape(nt, b, feat)
    gathered = xt[jnp.clip(structure.block_col, 0, nt - 1)]  # [NB, B, F]
    blocks = structure.blocks_t.astype(x.dtype)
    # blocks_t[k][c, r] contracted over c (source-within-block)
    prod = jax.lax.dot_general(
        blocks,
        gathered,
        (((1,), (1,)), ((0,), (0,))),
        precision=precision,
    )  # [NB, r, F]
    out = jax.ops.segment_sum(prod, structure.block_row, num_segments=structure.num_row_tiles)
    return out.reshape(structure.num_row_tiles * b, feat)


@plain_matmul_precision
def _kernel_stream(
    batch_row_ref,
    batch_chunk_ref,
    block_col_ref,
    blk_ref,
    *rest,
    block,
    kbatch,
    chunk_tiles,
    precision,
    compute_dtype,
    num_subs,
    split,
    super_batches,
):
    """One grid step = SUPER sub-batches of KBATCH blocks each. The output
    tile of a (chunk, row-tile) run accumulates in a VMEM scratch and is
    DMA'd to its HBM slab when the run ends (each run is visited exactly
    once per SpMM, so the flush is a plain write — see module docstring).

    The accumulator is double-buffered by run parity and the flush's wait is
    deferred until the SAME-parity buffer is next reused (two runs later) —
    a synchronous ``start(); wait()`` per run cost ~0.2 us x ~1000 runs per
    SpMM on v5e (round-3 sweep: time was invariant to both stream bytes and
    sub-batch count, leaving flush-wait latency as the residual).
    ``runct[0]`` counts runs started so far; ``runct[1]`` holds the current
    run's parity.

    ``split=True`` is the near-f32 path with the bf16 hi+lo decomposition of
    ``x`` done OUTSIDE the kernel (two bf16 HBM operands and chunk/gather
    buffer pairs): the in-kernel split cost a VPU pass over every gathered
    sub-batch serialized against the MXU — measured round 3, the bf16
    single-pass variant ran at 96 % of the f32 bound while f32 sat at 82 %,
    so the f32 residual was compute serialization, not bytes (hi+lo bf16
    streams the same bytes as f32)."""
    if split:
        x_hbms, xchunks, xcats = rest[0:2], rest[3:5], ()
        out_hbm, acc, runct, sem_x, sem_out = rest[2], rest[5], rest[6], rest[7], rest[8]
    else:
        x_hbms, xchunks, xcats = rest[0:1], rest[2:3], rest[3:4]
        out_hbm, acc, runct, sem_x, sem_out = rest[1], rest[4], rest[5], rest[6], rest[7]
    bi = pl.program_id(0)

    def flush_cp(sub, parity):
        return pltpu.make_async_copy(
            acc.at[parity],
            out_hbm.at[batch_chunk_ref[sub], :, pl.ds(batch_row_ref[sub] * block, block)],
            sem_out.at[parity],
        )

    @pl.when(bi == 0)
    def _():
        runct[0] = 0
        runct[1] = 0

    for k in range(super_batches):  # unrolled: static per structure
        sub = bi * super_batches + k
        prev = jnp.maximum(sub - 1, 0)
        chunk_changed = jnp.logical_or(sub == 0, batch_chunk_ref[sub] != batch_chunk_ref[prev])
        run_changed = jnp.logical_or(chunk_changed, batch_row_ref[sub] != batch_row_ref[prev])

        @pl.when(jnp.logical_and(run_changed, sub > 0))
        def _():
            flush_cp(prev, runct[1]).start()

        @pl.when(chunk_changed)
        def _():
            c = batch_chunk_ref[sub]
            cps = [
                pltpu.make_async_copy(
                    hbm.at[:, pl.ds(pl.multiple_of(c * chunk_tiles * block, block), chunk_tiles * block)],
                    chunk_buf,
                    sem_x.at[i],
                )
                for i, (hbm, chunk_buf) in enumerate(zip(x_hbms, xchunks))
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        @pl.when(run_changed)
        def _():
            nrun = runct[0]
            parity = jnp.bitwise_and(nrun, 1)
            runct[0] = nrun + 1
            runct[1] = parity

            # same-parity buffer was flushed two runs ago; drain before reuse
            @pl.when(nrun >= 2)
            def _():
                flush_cp(sub, parity).wait()

            acc[parity] = jnp.zeros_like(acc[parity])

        parity = runct[1]
        base = batch_chunk_ref[sub] * chunk_tiles
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # int8 -> compute dtype on the fly (blocks are exactly 0/1, so any
        # widening is lossless; Mosaic requires matching matmul operand dtypes)
        if split:
            # near-f32 path: hi + lo bf16 operand pair (pre-split in XLA),
            # single-pass MXU matmuls with f32 accumulation — ~1e-5 relative
            # vs Mosaic's six-pass HIGHEST emulation at ~3x the cost. The
            # matmuls read the resident chunks directly at per-block dynamic
            # offsets (no gather copies). The XLA fallback (bcsr_spmm_xla)
            # keeps true HIGHEST and is the exactness oracle.
            for kk in range(kbatch):  # unrolled: kbatch is static
                local = block_col_ref[sub * kbatch + kk] - base
                sl = pl.ds(pl.multiple_of(local * block, block), block)
                blk_k = blk_ref[k * kbatch + kk].astype(jnp.bfloat16)
                acc[parity] += dot(xchunks[0][:, sl], blk_k) + dot(xchunks[1][:, sl], blk_k)
        else:
            # unrolled gather into one [fw, KBATCH*B] buffer, then a single
            # wide contraction (a lax.fori_loop variant compiles even slower
            # in Mosaic than the SUPER*KBATCH-slice unroll)
            for kk in range(kbatch):
                local = block_col_ref[sub * kbatch + kk] - base
                xcats[0][:, kk * block : (kk + 1) * block] = xchunks[0][:, pl.ds(pl.multiple_of(local * block, block), block)]
            blk = blk_ref[k * kbatch : (k + 1) * kbatch].reshape(kbatch * block, block).astype(compute_dtype)
            acc[parity] += jax.lax.dot_general(
                xcats[0][:],
                blk,
                (((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )

        @pl.when(sub == num_subs - 1)
        def _():
            last = flush_cp(sub, parity)
            last.start()
            last.wait()

            # the previous run's flush (opposite parity) may still be in
            # flight; drain it so every semaphore is settled at kernel exit
            @pl.when(runct[0] >= 2)
            def _():
                flush_cp(sub, 1 - parity).wait()


@functools.partial(jax.jit, static_argnames=("num_tiles", "num_chunks", "block", "num_row_tiles", "precision", "compute_dtype", "transposed_io", "kbatch", "super_batches", "chunk_tiles_cfg"))
def _bcsr_spmm_tpu(
    blocks_t,
    block_col,
    batch_row,
    batch_chunk,
    visited,
    x,
    *,
    num_tiles,
    num_chunks,
    block,
    precision,
    num_row_tiles=None,
    compute_dtype="float32",
    transposed_io=False,
    kbatch=None,
    super_batches=None,
    chunk_tiles_cfg=None,
):
    if num_row_tiles is None:
        num_row_tiles = num_tiles
    kbatch = kbatch or KBATCH
    sb = super_batches or SUPER
    cd = jnp.dtype(compute_dtype)
    split = cd.itemsize == 4
    feat = x.shape[0] if transposed_io else x.shape[1]
    # operands ride the MXU as bf16 either way (hi+lo pair for the near-f32
    # path), so the [F, N] layout always pads F to the bf16 sublane quantum
    pad_f = (-feat) % 16
    if transposed_io:
        x_t = jnp.pad(x, ((0, pad_f), (0, 0))) if pad_f else x
    else:
        if pad_f:
            x = jnp.pad(x, ((0, 0), (0, pad_f)))
        x_t = x.T  # [F, N]: features on sublanes, nodes on lanes
    fw = feat + pad_f
    ct_cfg = chunk_tiles_cfg or CHUNK_TILES
    chunk_tiles = min(ct_cfg, num_tiles) if num_chunks == 1 else ct_cfg
    pad_n = num_chunks * chunk_tiles * block - x_t.shape[1]
    if pad_n:
        x_t = jnp.pad(x_t, ((0, 0), (0, pad_n)))
    if split:
        # bf16 hi+lo pre-split (same total bytes as f32; XLA fuses it into
        # x_t's producer) — see _kernel_stream's split note. The rounded
        # value MUST come from lax.reduce_precision: the naive
        # ``x - f32(bf16(x))`` residual is folded to zero under jit by XLA's
        # excess-precision convert-pair elision, silently degrading this
        # path to a single bf16 pass (caught on v5e, round 4).
        x_hi_f32 = jax.lax.reduce_precision(x_t, exponent_bits=8, mantissa_bits=7)
        x_hi = x_hi_f32.astype(jnp.bfloat16)
        x_lo = (x_t - x_hi_f32).astype(jnp.bfloat16)
        x_operands = (x_hi, x_lo)
    else:
        x_operands = (x_t.astype(cd),)

    num_subs = blocks_t.shape[0] // kbatch
    buf_dtype = jnp.bfloat16 if split else cd
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_subs // sb,),
        in_specs=[
            # sb*kbatch blocks per grid step, pipelined by Mosaic
            pl.BlockSpec((sb * kbatch, block, block), lambda bi, *_: (bi, 0, 0), memory_space=pltpu.VMEM),
            # x^T (hi+lo pair when split); chunks DMA'd manually
            *[pl.BlockSpec(memory_space=pltpu.HBM) for _ in x_operands],
        ],
        # per-chunk slabs written tile-by-tile with explicit DMA in-kernel
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            *[pltpu.VMEM((fw, chunk_tiles * block), buf_dtype) for _ in x_operands],  # resident x^T chunks
            # gather buffer (non-split only; split matmuls slice the chunks directly)
            *([] if split else [pltpu.VMEM((fw, kbatch * block), buf_dtype)]),
            pltpu.VMEM((2, fw, block), jnp.float32),  # run accumulators (parity double-buffer)
            pltpu.SMEM((2,), jnp.int32),  # [runs started, current parity]
            pltpu.SemaphoreType.DMA((2,)),  # chunk-stream semaphores
            pltpu.SemaphoreType.DMA((2,)),  # per-parity flush semaphores
        ],
    )

    slabs = pl.pallas_call(
        functools.partial(
            _kernel_stream,
            block=block,
            kbatch=kbatch,
            chunk_tiles=chunk_tiles,
            precision=precision,
            compute_dtype=cd,
            num_subs=num_subs,
            split=split,
            super_batches=sb,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_chunks, fw, num_row_tiles * block), jnp.float32),
    )(batch_row, batch_chunk, block_col, blocks_t, *x_operands)

    # collapse chunk slabs; never-visited slab tiles are uninitialized memory,
    # so select (not multiply) them away before summing
    mask = jnp.repeat(visited, block, axis=1)[:, None, :]  # [C, 1, N]
    out_t = jnp.where(mask, slabs, 0.0).sum(axis=0)
    if transposed_io:
        return out_t[:feat].astype(x.dtype)
    return out_t[:feat].T.astype(x.dtype)
