"""Blocked per-edge-feature message passing — the fast path for models whose
messages consume per-edge features (reference: deeprank2/neuralnets/gnn/
vanilla_gnn.py:10-41, whose conv is ``relu(MLP([x_i || x_j || e_ij]))``
summed onto the destination node).

The COO gather/segment path (ops/segment.py) leaves the MXU idle on these
models: XLA lowers ``x[col]`` gathers and row scatters of ``[E, M]`` message
matrices to serialized dynamic ops. This module reformulates the whole
``edge-MLP -> relu -> aggregate`` pipeline as *tile-local one-hot matmuls*:

- directed (mirrored) edges are sorted by ``(row tile, col tile)`` with tile
  size ``EDGE_TILE``; each ``(row, col)`` tile-pair's run is zero-padded to a
  ``SUB_E`` multiple and carved into *sub-blocks* of ``SUB_E`` edges (one
  source tile each); ``K_SUB`` consecutive sub-blocks that share a
  destination tile form one ``TILE_E``-edge grid slab — the sub-block
  granularity keeps run padding small while the slab granularity keeps the
  grid short (both tile indices are scalar-prefetched per slab);
- inside the kernel, gathers become ``x_tile [M, B] @ onehot [B, E]`` MXU
  matmuls (the one-hot materializes only in VMEM from an iota compare —
  zero HBM traffic), the thin edge-feature matmul ``w_e^T @ e^T`` runs on
  the slab, and the aggregation back onto the destination tile is the same
  one-hot matmul transposed, accumulated in a VMEM-resident output tile;
- padded edges carry the row sentinel ``EDGE_TILE`` whose one-hot column is
  all zeros, so they vanish from the output AND from every gradient.

The backward runs in the SAME row-major order (no second sort): because the
edge set is closed under mirroring (undirected pairs are mirrored, reference
dataset.py:944-951), ``d xc[v] = sum_{col(e)=v} dmsg[e]`` equals
``sum_{row(e)=v} dmsg[mirror(e)]`` — the kernel evaluates each edge's mirror
message in place (its operands are the same resident tiles with row/col
roles swapped) and scatters by destination, so every gradient accumulates
into consecutively-visited row tiles. Everything per-edge lives only in VMEM;
HBM never sees an ``[E, M]`` message matrix in either direction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

# nodes per tile: the one-hot edge of the gather/scatter matmuls
EDGE_TILE = int(_os.environ.get("DR2_BLOCKED_EDGE_TILE", "256"))
# edges per grid slab (one destination tile each). Geometry is env-sweepable
# (DR2_BLOCKED_*) like the DR2_BCSR_* knobs; collate and kernels must agree,
# so set them before building structures. Round-3 note: the 2048/K_SUB=8
# variant's Mosaic compile exceeds 8 minutes on this box's tunnel — budget
# accordingly when sweeping.
TILE_E = int(_os.environ.get("DR2_BLOCKED_TILE_E", "1024"))
# sub-blocks per slab; each sub-block of SUB_E = TILE_E // K_SUB edges has its
# own source tile, so (row, col) runs pad to SUB_E instead of TILE_E
K_SUB = int(_os.environ.get("DR2_BLOCKED_K_SUB", "4"))
if TILE_E % K_SUB:
    msg = f"DR2_BLOCKED_TILE_E={TILE_E} must be a multiple of DR2_BLOCKED_K_SUB={K_SUB}"
    raise ValueError(msg)
SUB_E = TILE_E // K_SUB


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockedEdgeStructure:
    """Row-major sorted edge slabs plus static geometry.

    ``E_cap`` is a ``TILE_E`` multiple; slab ``s`` covers edges
    ``[s*TILE_E, (s+1)*TILE_E)``, has the single destination tile
    ``step_row[s]``, and its ``K_SUB`` sub-blocks have source tiles
    ``sub_col[s*K_SUB : (s+1)*K_SUB]``. ``row_local``/``col_local`` are
    within-tile indices; padded edges hold the row sentinel ``EDGE_TILE``
    (their one-hot column is zero everywhere it matters).
    """

    row_local: jax.Array  # i32 [E_cap]
    col_local: jax.Array  # i32 [E_cap]
    eattr_t: jax.Array  # f32 [Fe_pad, E_cap] edge features, transposed
    step_row: jax.Array  # i32 [NS] destination tile per slab
    sub_col: jax.Array  # i32 [NS * K_SUB] source tile per sub-block
    out_visited: jax.Array  # bool [num_node_tiles] row tiles the kernel writes
    num_node_tiles: int = field(metadata={"static": True})
    edge_dim: int = field(metadata={"static": True})  # un-padded Fe

    @property
    def padded_nodes(self) -> int:
        return self.num_node_tiles * EDGE_TILE

    @property
    def num_slabs(self) -> int:
        return self.step_row.shape[0]


def _fe_pad(edge_dim: int) -> int:
    return edge_dim + (-edge_dim) % 8  # f32 sublane quantum


def _group_layout(rows: np.ndarray, cols: np.ndarray, num_tiles: int):
    """Sorted group geometry shared by the builder and the requirements pass.

    Returns (order, uniq keys, real counts, SUB_E-padded counts, per-row-tile
    slab count after K_SUB alignment, total slab count).
    """
    tile = EDGE_TILE
    rt, ct = rows // tile, cols // tile
    key = rt * num_tiles + ct
    order = np.argsort(key, kind="stable")
    uniq, counts = np.unique(key[order], return_counts=True)
    pad_counts = -(-counts // SUB_E) * SUB_E
    # sub-blocks per row tile, padded so slabs never straddle row tiles
    row_of = uniq // num_tiles
    subs_per_row = np.zeros(num_tiles, dtype=np.int64)
    np.add.at(subs_per_row, row_of, pad_counts // SUB_E)
    slabs_per_row = -(-subs_per_row // K_SUB)
    ns = max(int(slabs_per_row.sum()), 1)
    return order, uniq, counts, pad_counts, slabs_per_row, ns


def required_slabs(und_pairs: np.ndarray, num_nodes: int) -> int:
    """The slab count :func:`build_blocked_edges` would produce — the light
    requirements pass used to equalize capacities before sharded collation."""
    und = np.asarray(und_pairs, dtype=np.int64).reshape(-1, 2)
    num_tiles = max(-(-num_nodes // EDGE_TILE), 1)
    rows = np.concatenate([und[:, 0], und[:, 1]])
    cols = np.concatenate([und[:, 1], und[:, 0]])
    return _group_layout(rows, cols, num_tiles)[5]


def build_blocked_edges(
    und_pairs: np.ndarray,
    edge_attr: np.ndarray,
    num_nodes: int,
    pad_slabs=None,
    to_device: bool = True,
) -> BlockedEdgeStructure:
    """Blocked-edge structure from *undirected* node pairs and their edge
    features (mirrored internally — both directions get the same features).
    Node indices should already be locality-ordered for large graphs (the
    collate does this); ``num_nodes`` is rounded up to whole ``EDGE_TILE``
    tiles. ``pad_slabs`` buckets the slab capacity (int or a
    ``required -> capacity`` callable)."""
    und = np.asarray(und_pairs, dtype=np.int64).reshape(-1, 2)
    eattr = np.asarray(edge_attr, dtype=np.float32)
    if eattr.ndim != 2:
        eattr = eattr.reshape(len(und), 1) if len(und) else eattr.reshape(0, 1)
    if und.size and (und.max() >= num_nodes or und.min() < 0):
        msg = f"edge index out of range: max {und.max()} for {num_nodes} nodes"
        raise ValueError(msg)
    tile = EDGE_TILE
    num_tiles = max(-(-num_nodes // tile), 1)
    rows = np.concatenate([und[:, 0], und[:, 1]])
    cols = np.concatenate([und[:, 1], und[:, 0]])
    ea2 = np.concatenate([eattr, eattr], axis=0)
    fe = eattr.shape[1]
    fep = _fe_pad(fe)

    order, uniq, counts, pad_counts, slabs_per_row, ns = _group_layout(rows, cols, num_tiles)
    if callable(pad_slabs):
        pad_slabs = pad_slabs(ns)
    if pad_slabs is not None:
        if pad_slabs < ns:
            msg = f"pad_slabs={pad_slabs} < required {ns}"
            raise ValueError(msg)
        ns_cap = pad_slabs
    else:
        ns_cap = ns
    e_cap = ns_cap * TILE_E

    row_local = np.full(e_cap, tile, dtype=np.int32)  # sentinel
    col_local = np.zeros(e_cap, dtype=np.int32)
    eattr_t = np.zeros((fep, e_cap), dtype=np.float32)
    step_row = np.zeros(ns_cap, dtype=np.int32)
    sub_col = np.zeros(ns_cap * K_SUB, dtype=np.int32)
    out_visited = np.zeros(num_tiles, dtype=bool)

    # slab layout: row tiles in ascending order, each owning slabs_per_row[r]
    # slabs; sub-blocks of that row's groups fill them in (col-ascending) order
    slab_start_of_row = np.concatenate([[0], np.cumsum(slabs_per_row)])[:-1]
    sub_cursor = np.zeros(num_tiles, dtype=np.int64)  # sub-blocks filled per row

    pos = 0
    for g, (k, cnt) in enumerate(zip(uniq, counts)):
        r_tile = int(k // num_tiles)
        c_tile = int(k % num_tiles)
        sel = order[pos : pos + cnt]
        pos += cnt
        # this group's sub-blocks start at the row's cursor
        sub0 = slab_start_of_row[r_tile] * K_SUB + sub_cursor[r_tile]
        nsub = int(pad_counts[g]) // SUB_E
        s = int(sub0) * SUB_E
        row_local[s : s + cnt] = rows[sel] % tile
        col_local[s : s + cnt] = cols[sel] % tile
        eattr_t[:fe, s : s + cnt] = ea2[sel].T
        sub_col[int(sub0) : int(sub0) + nsub] = c_tile
        sub_cursor[r_tile] += nsub
        out_visited[r_tile] = True

    for r in range(num_tiles):
        n_slab = int(slabs_per_row[r])
        if n_slab == 0:
            continue
        s0 = int(slab_start_of_row[r])
        step_row[s0 : s0 + n_slab] = r
        # row-run padding: dummy sub-blocks repeat the last real col tile
        # (their edges are all sentinel, so they contribute nothing)
        filled = int(sub_cursor[r])
        total = n_slab * K_SUB
        if filled < total:
            last_col = sub_col[s0 * K_SUB + filled - 1] if filled else 0
            sub_col[s0 * K_SUB + filled : s0 * K_SUB + total] = last_col

    # trailing capacity-pad slabs: repeat the last real slab's tiles
    step_row[ns:] = step_row[ns - 1]
    sub_col[ns * K_SUB :] = sub_col[ns * K_SUB - 1]
    if not len(uniq):
        out_visited[0] = True

    structure = BlockedEdgeStructure(
        row_local=row_local,
        col_local=col_local,
        eattr_t=eattr_t,
        step_row=step_row,
        sub_col=sub_col,
        out_visited=out_visited,
        num_node_tiles=num_tiles,
        edge_dim=fe,
    )
    if to_device:
        structure = jax.tree.map(jnp.asarray, structure)
    return structure


# ---------------------------------------------------------------------------
# message-sum op


def blocked_message_sum(
    structure: BlockedEdgeStructure,
    xr: jnp.ndarray,
    xc: jnp.ndarray,
    w_e: jnp.ndarray,
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """``out[v] = sum_{e: row(e)=v} relu(xr[v] + xc[col(e)] + e_attr(e) @ w_e)``

    ``xr``/``xc``: ``[padded_nodes, M]`` per-node message parts (destination /
    source; precompute ``x @ w_row + bias`` and ``x @ w_col`` outside — the
    bias MUST ride one of them, the kernel adds nothing). ``w_e``:
    ``[edge_dim, M]``. Differentiable w.r.t. ``xr``, ``xc`` and ``w_e``;
    edge features are data (not differentiated).

    ``compute_dtype=bfloat16`` runs the one-hot matmuls single-pass on the
    MXU (f32 accumulation) — the fast training setting; the default f32 uses
    ``Precision.HIGHEST`` (exact, ~5x slower).

    On TPU this runs the fused Pallas kernels (ops/pallas_vanilla.py); other
    backends use an XLA reference with identical semantics.
    """
    from deeprank2_tpu.ops.segment import effective_platform

    if xr.shape[0] != structure.padded_nodes or xc.shape[0] != structure.padded_nodes:
        msg = f"xr/xc must have {structure.padded_nodes} rows, got {xr.shape[0]}/{xc.shape[0]}"
        raise ValueError(msg)
    fe = structure.edge_dim
    if w_e.shape[0] != fe:
        msg = f"w_e expects {fe} edge channels, got {w_e.shape[0]}"
        raise ValueError(msg)
    if effective_platform() == "tpu":
        from deeprank2_tpu.ops import pallas_vanilla

        return pallas_vanilla.blocked_message_sum_tpu(structure, xr, xc, w_e, compute_dtype=compute_dtype)
    return blocked_message_sum_xla(structure, xr, xc, w_e)


def global_indices(structure: BlockedEdgeStructure) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(row, col) global node indices per edge slot; sentinel rows map to
    ``padded_nodes`` (one-past-the-end, for scatter dropping)."""
    tile = EDGE_TILE
    v_pad = structure.padded_nodes
    e = jnp.arange(structure.row_local.shape[0], dtype=jnp.int32)
    grow = structure.step_row[e // TILE_E] * tile + structure.row_local
    grow = jnp.where(structure.row_local >= tile, v_pad, grow)
    gcol = structure.sub_col[e // SUB_E] * tile + structure.col_local
    return grow, gcol


def blocked_message_sum_xla(
    structure: BlockedEdgeStructure, xr: jnp.ndarray, xc: jnp.ndarray, w_e: jnp.ndarray
) -> jnp.ndarray:
    """Reference/fallback path (CPU tests + kernel oracle): the same sorted
    slab layout evaluated with XLA gathers and a segment sum."""
    v_pad = structure.padded_nodes
    grow, gcol = global_indices(structure)
    fe = structure.edge_dim
    # HIGHEST keeps the edge-feature matmul exact f32 on TPU (default rounds
    # the operands to bf16), matching the Pallas kernel's f32 path
    ew = jnp.dot(structure.eattr_t[:fe].T, w_e, precision=jax.lax.Precision.HIGHEST)
    pre = xr[jnp.clip(grow, 0, v_pad - 1)] + xc[gcol] + ew
    msg = jax.nn.relu(pre) * (grow < v_pad)[:, None]
    out = jax.ops.segment_sum(msg, grow, num_segments=v_pad + 1)
    return out[:v_pad]
