"""Multi-device graph parallelism for the block-sparse (BCSR) path.

The BCSR SpMM (ops/block_sparse.py) is the MXU aggregation for
atomic-resolution graphs; this module scales it across a device mesh for
graphs whose adjacency (or activations) outgrow one chip — the BASELINE
north-star axis (the reference has no equivalent; its only multi-device mode
is ``nn.DataParallel``, reference trainer.py:387-389):

- row tiles are split into ``D`` contiguous, equal-length ranges; device ``d``
  owns the node rows of its range and the adjacency blocks whose *destination*
  row tile falls in it (``A[r_d : r_{d+1}, :]`` — a rectangular
  :class:`~deeprank2_tpu.ops.block_sparse.BlockSparseStructure` built with
  ``row_tile_range``), so block streaming and MXU work shard ~evenly
  (locality-ordered geometric graphs have near-uniform block density);
- per layer, each device transforms its local node block and ``all_gather``\\ s
  the (low-dimensional, already-transformed) features over ICI; the local
  rectangular SpMM then needs no further communication;
- **backward**: a row slice is not symmetric, but the global adjacency is
  (edges are mirrored), so ``(A^T g)[rows of d] = (A g)[rows of d] =
  A[rows of d, :] @ g_full`` — the VJP is the SAME local SpMM applied to the
  all-gathered cotangent. ``bcsr_spmm_sharded`` encodes exactly this as a
  ``custom_vjp`` (the all_gather of the cotangent is the transpose of the
  forward all_gather's implicit psum).

Validated against the single-device model to float tolerance on the virtual
CPU mesh (tests/utils/test_blocksparse_partition.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.ops.block_sparse import BlockSparseStructure, _spmm_impl, build_blocksparse, required_blocks
from deeprank2_tpu.ops.segment import segment_sum
from deeprank2_tpu.parallel.dp import default_mesh


@jax.tree_util.register_dataclass
@dataclass
class PartitionedBlockSparseBatch:
    """A block-sparse batch split by contiguous row-tile ranges.

    Array leaves carry a leading device axis ``D``; the structure's leaves are
    stacked the same way (all shards share block/tile capacities so the pytree
    is rectangular). ``y``/``y_mask`` are replicated per shard.
    """

    x: jax.Array  # f32 [D, R*B, F] local node features
    node_graph: jax.Array  # i32 [D, R*B] graph id per local node (padded = G)
    node_mask: jax.Array  # bool [D, R*B]
    y_rep: jax.Array  # f32 [D, G] targets, replicated per shard
    y_mask_rep: jax.Array  # bool [D, G]
    structure: BlockSparseStructure  # leaves stacked [D, ...]; statics shared
    num_graphs: int = field(metadata={"static": True})

    @property
    def y(self) -> jax.Array:
        """Global targets [G] (the replicated copies are identical)."""
        return self.y_rep[0]

    @property
    def y_mask(self) -> jax.Array:
        return self.y_mask_rep[0]


def _collate_shard_arrays(entries: list[dict], num_shards: int, block: int, pad_tiles, pad_graphs: int | None):
    """Shared collate body for the graph-parallel batch forms: one
    :func:`blocksparse_layout` pass, tile padding to a shard multiple, node
    arrays reshaped per shard, targets replicated.

    Returns ``(pairs, r_per, num_nodes, arrays, names, num_graphs)`` where
    ``arrays`` holds the x/node_graph/node_mask/y_rep/y_mask_rep kwargs.
    """
    from deeprank2_tpu.ops.batch import blocksparse_layout

    num_real = len(entries)
    num_graphs = pad_graphs or num_real
    if num_real > num_graphs:
        msg = f"{num_real} entries exceed pad_graphs={num_graphs}"
        raise ValueError(msg)
    names = [e["entry_name"] for e in entries] + [""] * (num_graphs - num_real)

    layout = blocksparse_layout(entries, block, num_graphs)
    num_tiles = layout["num_tiles"]
    if callable(pad_tiles):
        num_tiles = pad_tiles(num_tiles)
    elif pad_tiles is not None:
        num_tiles = max(num_tiles, pad_tiles)
    r_per = -(-num_tiles // num_shards)
    num_nodes = r_per * num_shards * block

    feat_dim = layout["feat_dim"]
    real_rows = sum(a.shape[0] for a in layout["xs"])
    extra = num_nodes - real_rows
    if extra:
        layout["xs"].append(np.zeros((extra, feat_dim), np.float32))
        layout["graph_ids"].append(np.full(extra, num_graphs, np.int32))
        layout["masks"].append(np.zeros(extra, bool))

    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    for g, entry in enumerate(entries):
        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True

    arrays = {
        "x": jnp.asarray(np.concatenate(layout["xs"]).reshape(num_shards, r_per * block, feat_dim)),
        "node_graph": jnp.asarray(np.concatenate(layout["graph_ids"]).reshape(num_shards, r_per * block)),
        "node_mask": jnp.asarray(np.concatenate(layout["masks"]).reshape(num_shards, r_per * block)),
        "y_rep": jnp.asarray(np.broadcast_to(y, (num_shards, num_graphs)).copy()),
        "y_mask_rep": jnp.asarray(np.broadcast_to(y_mask, (num_shards, num_graphs)).copy()),
    }
    return layout["pairs"], r_per, num_nodes, arrays, names, num_graphs


def _choose_quanta(buckets, num_nodes: int, block: int, rc_ranges, target_waste: float = 0.25) -> tuple[int, int]:
    """Run quantum + grid depth ``(kbatch, super_batches)`` for a stacked
    bucket group (round-4 verdict #7: sharded slices have short
    (chunk, row-tile) runs, so the full-graph KBATCH=16 run padding is
    ~50 % of real blocks — dead stream on the multi-chip paths, where bytes
    ARE the cost). Picks the largest quantum from (16, 8, 4, 2) whose total
    padded blocks (shared stacked capacity included) stay within
    ``target_waste`` of the real count (falling back to 2), then shrinks the
    per-grid-step depth for tiny buckets so their capacity floor is
    ``kbatch * super_batches``, not ``kbatch * SUPER`` (a far ring step can
    hold 8 real blocks total). The shared capacity keeps the stacked pytree
    rectangular."""
    from deeprank2_tpu.ops.block_sparse import SUPER, required_blocks

    real = sum(
        required_blocks(b, num_nodes, block, row_tile_range=r, col_tile_range=c, kbatch=1)
        for b, (r, c) in zip(buckets, rc_ranges)
    )

    def group_cap(kb: int) -> int:
        return max(
            required_blocks(b, num_nodes, block, row_tile_range=r, col_tile_range=c, kbatch=kb)
            for b, (r, c) in zip(buckets, rc_ranges)
        )

    kb, cap = 2, None
    for cand in (16, 8, 4, 2):
        cap = group_cap(cand)
        if cap * len(buckets) <= (1.0 + target_waste) * real:
            kb = cand
            break
    else:
        cap = group_cap(kb)
    sb = min(SUPER, max(1, -(-cap // kb)))
    return kb, sb


def collate_graphs_blocksparse_partitioned(
    entries: list[dict],
    num_shards: int,
    block: int = 128,
    pad_tiles=None,
    pad_blocks=None,
    pad_graphs: int | None = None,
) -> tuple[PartitionedBlockSparseBatch, list[str]]:
    """Collate entry dicts straight into a row-tile-partitioned batch — the
    Trainer's graph-parallel path. One :func:`blocksparse_layout` pass feeds
    the per-shard rectangular builders directly (no intermediate full
    structure, no device round-trip). ``pad_tiles``/``pad_blocks`` as in
    ``collate_graphs_blocksparse`` (``pad_tiles`` resolves BEFORE rounding up
    to a shard multiple).
    """
    pairs, r_per, num_nodes, arrays, names, num_graphs = _collate_shard_arrays(entries, num_shards, block, pad_tiles, pad_graphs)

    ranges = [(d * r_per, (d + 1) * r_per) for d in range(num_shards)]
    kb, sb = _choose_quanta([pairs] * num_shards, num_nodes, block, [(rng, None) for rng in ranges])
    cap_blocks = max(required_blocks(pairs, num_nodes, block, row_tile_range=rng, kbatch=kb) for rng in ranges)
    if callable(pad_blocks):
        cap_blocks = pad_blocks(cap_blocks)
    elif pad_blocks is not None:
        cap_blocks = max(cap_blocks, pad_blocks)
    structures = [
        build_blocksparse(pairs, num_nodes, block, pad_blocks_to=cap_blocks, row_tile_range=rng, to_device=False, kbatch=kb, super_batches=sb) for rng in ranges
    ]
    stacked = jax.tree.map(lambda *leaves: jnp.asarray(np.stack(leaves)), *structures)

    return PartitionedBlockSparseBatch(
        **arrays,
        structure=stacked,
        num_graphs=num_graphs,
    ), names


def _structure_pairs(st: BlockSparseStructure) -> np.ndarray:
    """Recover undirected node-index pairs from a full (square) structure.

    Entry ``blocks_t[k, c, r] = 1`` means the directed edge
    ``(row_tile[k]*B + r <- col_tile[k]*B + c)``; the builders mirror
    internally, so one representative per undirected pair suffices (self
    loops appear once and mirror onto themselves).
    """
    block = st.block
    blocks = np.asarray(st.blocks_t)
    k_idx, c_idx, r_idx = np.nonzero(blocks)
    br = np.asarray(st.block_row)[k_idx]
    bc = np.asarray(st.block_col)[k_idx]
    dst = br.astype(np.int64) * block + r_idx
    src = bc.astype(np.int64) * block + c_idx
    directed = np.stack([dst, src], axis=1)
    keep = directed[:, 0] <= directed[:, 1]
    return directed[keep]


def partition_blocksparse_batch(batch, num_shards: int, pad_blocks=None) -> PartitionedBlockSparseBatch:
    """Split an ALREADY-COLLATED :class:`~deeprank2_tpu.ops.batch.BlockSparseBatch`
    into ``num_shards`` row-tile ranges (the standalone API for a batch whose
    source entries are gone; the Trainer collates directly into the
    partitioned form via :func:`collate_graphs_blocksparse_partitioned`).

    The full structure's blocks are decomposed back into (row, col) tile
    coordinates and re-built per range with shared capacities.
    ``pad_blocks`` (int or ``required -> capacity`` callable) bounds jit
    recompilation across batches, as in ``collate_graphs_blocksparse``.
    """
    st = batch.structure
    if not st.is_square:
        msg = "partition_blocksparse_batch expects a full (square) structure"
        raise ValueError(msg)
    block = st.block
    nt = st.num_tiles
    r_per = -(-nt // num_shards)
    nt_pad = r_per * num_shards
    num_nodes = nt_pad * block
    pairs = _structure_pairs(st)

    ranges = [(d * r_per, (d + 1) * r_per) for d in range(num_shards)]
    kb, sb = _choose_quanta([pairs] * num_shards, num_nodes, block, [(rng, None) for rng in ranges])
    cap_blocks = max(required_blocks(pairs, num_nodes, block, row_tile_range=rng, kbatch=kb) for rng in ranges)
    if callable(pad_blocks):
        cap_blocks = pad_blocks(cap_blocks)
    elif pad_blocks is not None:
        cap_blocks = max(cap_blocks, pad_blocks)
    structures = [
        build_blocksparse(pairs, num_nodes, block, pad_blocks_to=cap_blocks, row_tile_range=rng, to_device=False, kbatch=kb, super_batches=sb) for rng in ranges
    ]
    stacked = jax.tree.map(lambda *leaves: jnp.asarray(np.stack(leaves)), *structures)

    arrays = _shard_node_arrays(batch, num_shards, num_nodes, r_per, block)
    return PartitionedBlockSparseBatch(
        **arrays,
        structure=stacked,
        num_graphs=batch.num_graphs,
    )


def _shard_node_arrays(batch, num_shards: int, num_nodes: int, r_per: int, block: int) -> dict:
    """Row-pad a full batch's node arrays to ``num_nodes`` and reshape them to
    per-shard [D, r_per*B, ...]; targets are replicated per shard."""

    def pad_rows(a, fill=0):
        a = np.asarray(a)
        pad = num_nodes - a.shape[0]
        if pad:
            width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            a = np.pad(a, width, constant_values=fill)
        return a

    x = pad_rows(batch.x).reshape(num_shards, r_per * block, -1)
    node_graph = pad_rows(batch.node_graph, fill=batch.num_graphs).reshape(num_shards, r_per * block)
    node_mask = pad_rows(batch.node_mask).reshape(num_shards, r_per * block)
    y = np.broadcast_to(np.asarray(batch.y), (num_shards, *np.asarray(batch.y).shape)).copy()
    y_mask = np.broadcast_to(np.asarray(batch.y_mask), (num_shards, *np.asarray(batch.y_mask).shape)).copy()
    return {
        "x": jnp.asarray(x),
        "node_graph": jnp.asarray(node_graph),
        "node_mask": jnp.asarray(node_mask),
        "y_rep": jnp.asarray(y),
        "y_mask_rep": jnp.asarray(y_mask),
    }


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_sharded(axis, precision, treedef, leaves, xl):
    structure = jax.tree_util.tree_unflatten(treedef, leaves)
    x_full = jax.lax.all_gather(xl, axis, axis=0, tiled=True)
    return _spmm_impl(structure, x_full, precision)


def _spmm_sharded_fwd(axis, precision, treedef, leaves, xl):
    return _spmm_sharded(axis, precision, treedef, leaves, xl), leaves


def _spmm_sharded_bwd(axis, precision, treedef, leaves, g):
    structure = jax.tree_util.tree_unflatten(treedef, leaves)
    g_full = jax.lax.all_gather(g, axis, axis=0, tiled=True)
    gx = _spmm_impl(structure, g_full, precision)
    # structure leaves are integer/bool: their cotangents are symbolic float0s
    zeros = tuple(np.zeros(np.shape(leaf), dtype=jax.dtypes.float0) for leaf in leaves)
    return zeros, gx


_spmm_sharded.defvjp(_spmm_sharded_fwd, _spmm_sharded_bwd)


def bcsr_spmm_sharded(
    structure: BlockSparseStructure,
    x_local: jnp.ndarray,
    axis: str,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """``(A @ x)[rows of this shard]`` inside ``shard_map``: all_gather the
    local features over ``axis``, then the local rectangular SpMM.

    Differentiable w.r.t. ``x_local``: by global symmetry the VJP is the same
    gather + local SpMM applied to the cotangent (see module docstring) — the
    Pallas kernel needs no AD support and no transposed block structure. (The
    structure rides through the ``custom_vjp`` as an explicit pytree argument
    — a closure over its traced leaves would break under grad-of-shard_map.)
    """
    leaves, treedef = jax.tree_util.tree_flatten(structure)
    return _spmm_sharded(axis, precision, treedef, tuple(leaves), x_local)


def make_blocksparse_ginet_forward(model, mesh: Mesh | None = None, axis: str = "bp", training: bool = False):
    """Jitted row-partitioned forward for :class:`GINetBlockSparse`.

    Same math as the single-device model (fused dual towers, one SpMM per
    layer, dropout when ``training``); returns ``fn(params, part_batch[,
    rng]) -> [G, out]`` replicated.
    """
    mesh = mesh or default_mesh(axis)
    axis = mesh.axis_names[0]
    dropout = getattr(model, "dropout", 0.4)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )
    def forward(params, part, rng):
        local = jax.tree.map(lambda a: a[0], part)
        st = local.structure
        x = local.x
        act = nn.relu

        fcx = jnp.concatenate([nn.linear(params["conv1"]["fc"], x), nn.linear(params["conv1_ext"]["fc"], x)], axis=1)
        h = act(bcsr_spmm_sharded(st, fcx, axis))
        h_int, h_ext = h[:, :16], h[:, 16:]

        fcx2 = jnp.concatenate(
            [nn.linear(params["conv2"]["fc"], h_int), nn.linear(params["conv2_ext"]["fc"], h_ext)], axis=1
        )
        h2 = act(bcsr_spmm_sharded(st, fcx2, axis))
        h2 = h2 * local.node_mask[:, None]

        # per-graph mean over ALL shards: psum of sums and counts
        sums = segment_sum(h2, local.node_graph, part.num_graphs)
        counts = segment_sum(local.node_mask.astype(jnp.float32), local.node_graph, part.num_graphs)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        pooled = sums / jnp.maximum(counts, 1.0)[:, None]

        out = nn.relu(nn.linear(params["fc1"], pooled))
        # rng is replicated, so every shard draws the same mask
        out = nn.dropout(rng, out, dropout, training)
        return nn.linear(params["fc2"], out)

    if training:
        return jax.jit(forward)
    return jax.jit(lambda params, part, rng=None: forward(params, part, jax.random.PRNGKey(0) if rng is None else rng))


# ---------------------------------------------------------------------------
# ppermute ring halo exchange (ROADMAP item: cap peak memory at one shard's
# node block instead of all_gather's full [V, F] and skip empty buckets)


@jax.tree_util.register_dataclass
@dataclass
class RingBlockSparseBatch:
    """A block-sparse batch bucketed for the ppermute ring.

    Shard ``d`` owns row tiles ``[d*r_per, (d+1)*r_per)``. Its blocks are
    split by source-shard: ``diag`` holds the symmetric diagonal bucket
    ``A[d, d]`` (consumes only the local node block — no communication, its
    own, large capacity), and ``off`` holds ``D-1`` rectangular buckets in
    RING-STEP order — bucket ``k-1`` is ``A[d, (d-k) % D]`` with
    source-LOCAL column tiles, aggregated at ring step ``k`` directly from
    the rotating buffer. The ring loop is statically unrolled, so each step
    has its OWN capacity (``off[k-1]`` leaves are stacked over shards only):
    on locality-banded graphs most steps collapse to the minimum block count
    instead of all paying the worst bucket. ``off_has_blocks[k-1]`` lets
    empty buckets skip their SpMM under ``lax.cond`` (the ppermute itself
    runs every step — collectives must be uniform across devices).
    """

    x: jax.Array  # f32 [D, R*B, F]
    node_graph: jax.Array  # i32 [D, R*B]
    node_mask: jax.Array  # bool [D, R*B]
    y_rep: jax.Array  # f32 [D, G]
    y_mask_rep: jax.Array  # bool [D, G]
    diag: BlockSparseStructure  # leaves [D, ...]
    off: tuple  # D-1 BlockSparseStructures, leaves [D, cap_k, ...]
    off_has_blocks: jax.Array  # bool [D, D-1]
    num_graphs: int = field(metadata={"static": True})
    num_shards: int = field(metadata={"static": True})

    @property
    def y(self) -> jax.Array:
        return self.y_rep[0]

    @property
    def y_mask(self) -> jax.Array:
        return self.y_mask_rep[0]


def _build_ring_structures(pairs: np.ndarray, num_nodes: int, block: int, num_shards: int, r_per: int, pad_blocks_diag=None, pad_blocks_off=None):
    """(diag stacked [D,...], off = D-1 structures stacked [D, cap_k, ...],
    off_has_blocks [D, D-1]).

    Directed edges are pre-bucketed by (row owner, col owner) in ONE pass, so
    each of the D^2 builder calls scans only its own bucket's edges (its
    internal mirroring re-adds the already-present reverse direction for
    diagonal buckets, which is harmless — block entries are 0/1 assignments).
    Each ring step's capacity is independent (``pad_blocks_off`` callables
    receive ``(required, step_k)``): on banded graphs only the near-diagonal
    steps pay real block counts.
    """
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    ranges = [(d * r_per, (d + 1) * r_per) for d in range(num_shards)]
    # mirrored directed edges (dst, src), bucketed by (dst owner, src owner)
    dst = np.concatenate([pairs[:, 0], pairs[:, 1]])
    src = np.concatenate([pairs[:, 1], pairs[:, 0]])
    owner_r = np.minimum(dst // block // r_per, num_shards - 1)
    owner_c = np.minimum(src // block // r_per, num_shards - 1)
    order = np.argsort(owner_r * num_shards + owner_c, kind="stable")
    bucket_edges = np.stack([dst[order], src[order]], axis=1)
    bounds = np.searchsorted(
        (owner_r * num_shards + owner_c)[order], np.arange(num_shards * num_shards + 1)
    )

    def bucket(d: int, s: int) -> np.ndarray:
        lo, hi = bounds[d * num_shards + s], bounds[d * num_shards + s + 1]
        return bucket_edges[lo:hi]

    diag_pairs = [bucket(d, d) for d in range(num_shards)]
    kb_diag, sb_diag = _choose_quanta(diag_pairs, num_nodes, block, [(rng, rng) for rng in ranges])
    cap_diag = max(
        required_blocks(diag_pairs[d], num_nodes, block, row_tile_range=rng, col_tile_range=rng, kbatch=kb_diag)
        for d, rng in enumerate(ranges)
    )
    if callable(pad_blocks_diag):
        cap_diag = pad_blocks_diag(cap_diag)
    elif pad_blocks_diag is not None:
        cap_diag = max(cap_diag, pad_blocks_diag)
    diag_structs = [
        build_blocksparse(diag_pairs[d], num_nodes, block, pad_blocks_to=cap_diag, row_tile_range=rng, col_tile_range=rng, to_device=False, kbatch=kb_diag, super_batches=sb_diag)
        for d, rng in enumerate(ranges)
    ]
    diag = jax.tree.map(lambda *leaves: jnp.asarray(np.stack(leaves)), *diag_structs)

    if num_shards == 1:
        return diag, (), jnp.zeros((1, 0), dtype=bool)

    # off bucket (d, k): rows of d, cols of s = (d - k) % D, k = 1..D-1;
    # capacity per ring step k (the loop is unrolled, shapes may differ by k)
    nonempty = np.zeros((num_shards, num_shards - 1), dtype=bool)
    off_structs = []
    for k in range(1, num_shards):
        sources = [(d - k) % num_shards for d in range(num_shards)]
        kb_k, sb_k = _choose_quanta(
            [bucket(d, s) for d, s in enumerate(sources)], num_nodes, block,
            [(ranges[d], ranges[s]) for d, s in enumerate(sources)],
        )
        cap_k = max(
            required_blocks(bucket(d, s), num_nodes, block, row_tile_range=ranges[d], col_tile_range=ranges[s], kbatch=kb_k)
            for d, s in enumerate(sources)
        )
        if callable(pad_blocks_off):
            cap_k = pad_blocks_off(cap_k, k)
        elif pad_blocks_off is not None:
            cap_k = max(cap_k, pad_blocks_off)
        per_k = []
        for d, s in enumerate(sources):
            nonempty[d, k - 1] = len(bucket(d, s)) > 0
            per_k.append(
                build_blocksparse(
                    bucket(d, s), num_nodes, block, pad_blocks_to=cap_k,
                    row_tile_range=ranges[d], col_tile_range=ranges[s], to_device=False, kbatch=kb_k, super_batches=sb_k,
                )
            )
        off_structs.append(jax.tree.map(lambda *leaves: jnp.asarray(np.stack(leaves)), *per_k))
    return diag, tuple(off_structs), jnp.asarray(nonempty)


def partition_blocksparse_batch_ring(batch, num_shards: int, pad_blocks_diag=None, pad_blocks_off=None) -> RingBlockSparseBatch:
    """Split an already-collated ``BlockSparseBatch`` into ring-halo buckets
    (see :class:`RingBlockSparseBatch`). ``pad_blocks_diag``/``pad_blocks_off``
    (int or ``required -> capacity`` callable) bound jit recompilation."""
    st = batch.structure
    if not st.is_square:
        msg = "partition_blocksparse_batch_ring expects a full (square) structure"
        raise ValueError(msg)
    block = st.block
    r_per = -(-st.num_tiles // num_shards)
    num_nodes = r_per * num_shards * block
    pairs = _structure_pairs(st)

    diag, off, nonempty = _build_ring_structures(pairs, num_nodes, block, num_shards, r_per, pad_blocks_diag, pad_blocks_off)
    arrays = _shard_node_arrays(batch, num_shards, num_nodes, r_per, block)
    return RingBlockSparseBatch(
        **arrays,
        diag=diag,
        off=off,
        off_has_blocks=nonempty,
        num_graphs=batch.num_graphs,
        num_shards=num_shards,
    )


def collate_graphs_blocksparse_ring(
    entries: list[dict],
    num_shards: int,
    block: int = 128,
    pad_tiles=None,
    pad_blocks_diag=None,
    pad_blocks_off=None,
    pad_graphs: int | None = None,
) -> tuple[RingBlockSparseBatch, list[str]]:
    """Collate entry dicts straight into a ring-partitioned batch — the
    Trainer's graph-parallel path for :class:`GINetBlockSparseRing`."""
    pairs, r_per, num_nodes, arrays, names, num_graphs = _collate_shard_arrays(entries, num_shards, block, pad_tiles, pad_graphs)
    diag, off, nonempty = _build_ring_structures(pairs, num_nodes, block, num_shards, r_per, pad_blocks_diag, pad_blocks_off)
    return RingBlockSparseBatch(
        **arrays,
        diag=diag,
        off=off,
        off_has_blocks=nonempty,
        num_graphs=num_graphs,
        num_shards=num_shards,
    ), names


def _ring_impl(axis, precision, num_shards, td_diag, td_off, diag_leaves, off_leaves, flags, xl):
    """sum_s A[d, s] @ x_s via the ppermute ring; xl is shard d's node block."""
    diag = jax.tree_util.tree_unflatten(td_diag, diag_leaves)
    acc = _spmm_impl(diag, xl, precision)
    if num_shards == 1:
        return acc
    off = jax.tree_util.tree_unflatten(td_off, off_leaves)  # tuple of D-1 per-step structures
    perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]

    # statically unrolled ring (bucket shapes differ per step): hop, then
    # aggregate the matching source bucket unless it is empty on this shard
    buf = xl
    for k in range(1, num_shards):
        buf = jax.lax.ppermute(buf, axis, perm)  # after k hops: shard (d-k) % D's block
        bucket = off[k - 1]
        acc = jax.lax.cond(
            flags[k - 1],
            lambda acc, buf, bucket=bucket: acc + _spmm_impl(bucket, buf, precision),
            lambda acc, buf: acc,
            acc,
            buf,
        )
    return acc


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _ring_spmm(axis, precision, num_shards, td_diag, td_off, diag_leaves, off_leaves, flags, xl):
    return _ring_impl(axis, precision, num_shards, td_diag, td_off, diag_leaves, off_leaves, flags, xl)


def _ring_spmm_fwd(axis, precision, num_shards, td_diag, td_off, diag_leaves, off_leaves, flags, xl):
    out = _ring_spmm(axis, precision, num_shards, td_diag, td_off, diag_leaves, off_leaves, flags, xl)
    return out, (diag_leaves, off_leaves, flags)


def _ring_spmm_bwd(axis, precision, num_shards, td_diag, td_off, res, g):
    # by global symmetry gx_d = sum_s A[d, s] g_s — the SAME ring on the cotangent
    diag_leaves, off_leaves, flags = res
    gx = _ring_impl(axis, precision, num_shards, td_diag, td_off, diag_leaves, off_leaves, flags, g)
    zeros_d = tuple(np.zeros(np.shape(leaf), dtype=jax.dtypes.float0) for leaf in diag_leaves)
    zeros_o = tuple(np.zeros(np.shape(leaf), dtype=jax.dtypes.float0) for leaf in off_leaves)
    zero_f = np.zeros(np.shape(flags), dtype=jax.dtypes.float0)
    return zeros_d, zeros_o, zero_f, gx


_ring_spmm.defvjp(_ring_spmm_fwd, _ring_spmm_bwd)


def ring_bcsr_spmm(
    diag: BlockSparseStructure,
    off: tuple,
    off_has_blocks: jnp.ndarray,
    x_local: jnp.ndarray,
    axis: str,
    num_shards: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """``(A @ x)[rows of this shard]`` inside ``shard_map`` via the ppermute
    ring: the local diagonal SpMM runs first (no communication), then the
    transformed node block rotates ``D-1`` hops — each hop's bucket SpMM is
    skipped when the bucket is empty. Peak live activation memory is one
    shard's block [Vd, F] (vs [V, F] for the all_gather path), and each hop
    overlaps with the previous bucket's compute.

    Differentiable w.r.t. ``x_local``: by global symmetry the VJP is the same
    ring applied to the cotangent (see :func:`bcsr_spmm_sharded`).
    """
    diag_leaves, td_diag = jax.tree_util.tree_flatten(diag)
    off_leaves, td_off = jax.tree_util.tree_flatten(off)
    return _ring_spmm(axis, precision, num_shards, td_diag, td_off, tuple(diag_leaves), tuple(off_leaves), off_has_blocks, x_local)


def make_blocksparse_ginet_ring_forward(model, mesh: Mesh | None = None, axis: str = "bp", training: bool = False):
    """Jitted ring-halo forward for :class:`GINetBlockSparse` semantics —
    identical math to :func:`make_blocksparse_ginet_forward`, with
    ``all_gather`` replaced by the ppermute ring."""
    mesh = mesh or default_mesh(axis)
    axis = mesh.axis_names[0]
    num_shards = mesh.devices.size
    dropout = getattr(model, "dropout", 0.4)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )
    def forward(params, part, rng):
        local = jax.tree.map(lambda a: a[0], part)
        diag, off, flags = local.diag, local.off, local.off_has_blocks
        x = local.x
        act = nn.relu

        fcx = jnp.concatenate([nn.linear(params["conv1"]["fc"], x), nn.linear(params["conv1_ext"]["fc"], x)], axis=1)
        h = act(ring_bcsr_spmm(diag, off, flags, fcx, axis, num_shards))
        h_int, h_ext = h[:, :16], h[:, 16:]

        fcx2 = jnp.concatenate(
            [nn.linear(params["conv2"]["fc"], h_int), nn.linear(params["conv2_ext"]["fc"], h_ext)], axis=1
        )
        h2 = act(ring_bcsr_spmm(diag, off, flags, fcx2, axis, num_shards))
        h2 = h2 * local.node_mask[:, None]

        sums = segment_sum(h2, local.node_graph, part.num_graphs)
        counts = segment_sum(local.node_mask.astype(jnp.float32), local.node_graph, part.num_graphs)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        pooled = sums / jnp.maximum(counts, 1.0)[:, None]

        out = nn.relu(nn.linear(params["fc1"], pooled))
        out = nn.dropout(rng, out, dropout, training)
        return nn.linear(params["fc2"], out)

    if training:
        return jax.jit(forward)
    return jax.jit(lambda params, part, rng=None: forward(params, part, jax.random.PRNGKey(0) if rng is None else rng))


class GINetBlockSparseRing:
    """Graph-parallel :class:`GINetBlockSparse` with ppermute ring halo
    exchange instead of all_gather: peak activation memory stays at one
    shard's node block and empty source buckets skip their SpMM. Same ctor
    contract and parameter pytree as the single-device model (checkpoints
    interchange); the Trainer collates into :class:`RingBlockSparseBatch`
    automatically (``ring_halo`` attribute).
    """

    needs_clusters = False
    blocksparse_batches = True
    graph_parallel = True
    ring_halo = True
    dropout = 0.4

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int = 1):
        from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse

        self._single = GINetBlockSparse(input_shape, output_shape, input_shape_edge)
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self._forwards: dict[bool, object] = {}

    def init(self, rng: jax.Array) -> dict:
        return self._single.init(rng)

    def apply(self, params: dict, batch: RingBlockSparseBatch, training: bool = False, rng: jax.Array | None = None):
        fwd = self._forwards.get(training)
        if fwd is None:
            fwd = make_blocksparse_ginet_ring_forward(self._single, training=training)
            self._forwards[training] = fwd
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return fwd(params, batch, rng)


class GINetBlockSparseGP:
    """Graph-parallel :class:`GINetBlockSparse`: each batch is partitioned by
    row tiles across ALL local devices, so one structure larger than a chip's
    HBM trains across the mesh. Same ctor contract and parameter pytree as the
    single-device model (checkpoints interchange); the Trainer collates and
    partitions automatically (``graph_parallel`` attribute).
    """

    needs_clusters = False
    blocksparse_batches = True
    graph_parallel = True
    dropout = 0.4

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int = 1):
        from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse

        self._single = GINetBlockSparse(input_shape, output_shape, input_shape_edge)
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self._forwards: dict[bool, object] = {}

    def init(self, rng: jax.Array) -> dict:
        return self._single.init(rng)

    def apply(self, params: dict, batch: PartitionedBlockSparseBatch, training: bool = False, rng: jax.Array | None = None):
        fwd = self._forwards.get(training)
        if fwd is None:
            fwd = make_blocksparse_ginet_forward(self._single, training=training)
            self._forwards[training] = fwd
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return fwd(params, batch, rng)
