"""Blocked per-edge-feature message passing — the fast path for models whose
messages consume per-edge features (reference: deeprank2/neuralnets/gnn/
vanilla_gnn.py:10-41, whose conv is ``relu(MLP([x_i || x_j || e_ij]))``
summed onto the destination node).

The COO gather/segment path (ops/segment.py) leaves the MXU idle on these
models: XLA lowers ``x[col]`` gathers and row scatters of ``[E, M]`` message
matrices to serialized dynamic ops. This module reformulates the whole
``edge-MLP -> relu -> aggregate`` pipeline as *tile-local one-hot matmuls*:

- directed (mirrored) edges are sorted by ``(row tile, col tile)`` with tile
  size ``EDGE_TILE``; each ``(row, col)`` tile-pair's edge run is zero-padded
  to a ``TILE_E`` multiple, so every ``TILE_E`` edge slab has ONE destination
  tile and ONE source tile — both scalar-prefetched per grid step;
- inside the kernel, gathers become ``x_tile [M, B] @ onehot [B, TILE_E]``
  MXU matmuls (the one-hot materializes only in VMEM from an iota compare —
  zero HBM traffic), the thin edge-feature matmul ``w_e^T @ e^T`` runs on
  the slab, and the aggregation back onto the destination tile is the same
  one-hot matmul transposed, accumulated in a VMEM-resident output tile;
- padded edges carry the row sentinel ``EDGE_TILE`` whose one-hot column is
  all zeros, so they vanish from the output AND from every gradient.

The backward pass needs the same structure sorted by ``(col tile, row tile)``
for the ``d x_col`` scatter (accumulation requires consecutive visits to an
output tile); since per-edge pre-activations are recomputed per-slab from
VMEM-resident tiles, the mirror sort only duplicates the (tiny, Fe <= 6)
edge features and index arrays — never an ``[E, M]`` message matrix.

HDF5/graph semantics are unchanged: this is a pure layout + kernel module;
:mod:`deeprank2_tpu.neuralnets.gnn.vanilla_gnn` exposes the blocked model.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

# nodes per tile: the one-hot edge of the gather/scatter matmuls. 256 halves
# run padding and grid steps vs 128 at 2x the one-hot FLOPs — measured faster
# on v5e for atomic-density graphs (see tests/perf/vanilla_perf.py).
EDGE_TILE = 256
# edges per grid step; (row, col) runs are padded to a TILE_E multiple
TILE_E = 1024


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockedEdgeOrder:
    """One sorted view of the edge list (row-major or col-major).

    ``E_cap`` is a ``TILE_E`` multiple; slab ``s`` covers edges
    ``[s*TILE_E, (s+1)*TILE_E)`` and has the single destination tile
    ``step_row[s]`` and source tile ``step_col[s]``. ``row_local``/
    ``col_local`` are within-tile indices; padded edges hold the row sentinel
    ``EDGE_TILE`` (their one-hot column is zero everywhere it matters).
    """

    row_local: jax.Array  # i32 [E_cap]
    col_local: jax.Array  # i32 [E_cap]
    eattr_t: jax.Array  # f32 [Fe_pad, E_cap] edge features, transposed
    step_row: jax.Array  # i32 [NS] destination tile per slab
    step_col: jax.Array  # i32 [NS] source tile per slab
    out_visited: jax.Array  # bool [num_out_tiles] tiles the kernel writes


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockedEdgeStructure:
    """Both sorted views plus static geometry.

    ``rm`` (row-major) drives the forward aggregation and the ``d x_row`` /
    ``d w_e`` backward; ``cm`` (col-major, i.e. sorted by source tile) drives
    the ``d x_col`` backward. ``cm.step_row``/``cm.step_col`` keep their
    forward meaning (destination / source tile) — only the sort key changes,
    so in ``cm`` the kernel's *output* tile is ``step_col``.
    """

    rm: BlockedEdgeOrder
    cm: BlockedEdgeOrder
    num_node_tiles: int = field(metadata={"static": True})
    edge_dim: int = field(metadata={"static": True})  # un-padded Fe

    @property
    def padded_nodes(self) -> int:
        return self.num_node_tiles * EDGE_TILE

    @property
    def num_slabs(self) -> int:
        return self.rm.step_row.shape[0]


def _fe_pad(edge_dim: int) -> int:
    return edge_dim + (-edge_dim) % 8  # f32 sublane quantum


def _build_order(
    rows: np.ndarray,
    cols: np.ndarray,
    eattr: np.ndarray,
    num_tiles: int,
    col_major: bool,
    pad_slabs_to=None,
) -> BlockedEdgeOrder:
    tile = EDGE_TILE
    fe = eattr.shape[1]
    fep = _fe_pad(fe)
    rt, ct = rows // tile, cols // tile
    key = (ct * num_tiles + rt) if col_major else (rt * num_tiles + ct)
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, counts = np.unique(key_s, return_counts=True)
    pad_counts = -(-counts // TILE_E) * TILE_E
    e_cap = max(int(pad_counts.sum()), TILE_E)
    ns = e_cap // TILE_E
    if callable(pad_slabs_to):
        pad_slabs_to = pad_slabs_to(ns)
    if pad_slabs_to is not None:
        if pad_slabs_to < ns:
            msg = f"pad_slabs={pad_slabs_to} < required {ns}"
            raise ValueError(msg)
        ns = pad_slabs_to
        e_cap = ns * TILE_E

    row_local = np.full(e_cap, tile, dtype=np.int32)  # sentinel
    col_local = np.zeros(e_cap, dtype=np.int32)
    eattr_t = np.zeros((fep, e_cap), dtype=np.float32)
    step_row = np.zeros(ns, dtype=np.int32)
    step_col = np.zeros(ns, dtype=np.int32)
    out_visited = np.zeros(num_tiles, dtype=bool)

    starts = np.concatenate([[0], np.cumsum(pad_counts)])[:-1]
    pos = 0  # cursor into the sorted real edges
    for g, (k, cnt) in enumerate(zip(uniq, counts)):
        s = int(starts[g])
        sel = order[pos : pos + cnt]
        pos += cnt
        row_local[s : s + cnt] = rows[sel] % tile
        col_local[s : s + cnt] = cols[sel] % tile
        eattr_t[:fe, s : s + cnt] = eattr[sel].T
        r_tile = int(k % num_tiles) if col_major else int(k // num_tiles)
        c_tile = int(k // num_tiles) if col_major else int(k % num_tiles)
        slab0, nslab = s // TILE_E, int(pad_counts[g]) // TILE_E
        step_row[slab0 : slab0 + nslab] = r_tile
        step_col[slab0 : slab0 + nslab] = c_tile
        out_visited[c_tile if col_major else r_tile] = True

    # trailing capacity-pad slabs: repeat the last real slab's tiles (their
    # edges are all sentinel, so they only re-accumulate zeros there)
    nslab_real = max(int(pad_counts.sum()) // TILE_E, 1)
    step_row[nslab_real:] = step_row[nslab_real - 1]
    step_col[nslab_real:] = step_col[nslab_real - 1]
    if not len(uniq):
        out_visited[0] = True

    return BlockedEdgeOrder(
        row_local=np.asarray(row_local),
        col_local=np.asarray(col_local),
        eattr_t=np.asarray(eattr_t),
        step_row=np.asarray(step_row),
        step_col=np.asarray(step_col),
        out_visited=np.asarray(out_visited),
    )


def required_slabs(und_pairs: np.ndarray, num_nodes: int) -> tuple[int, int]:
    """(row-major, col-major) slab counts :func:`build_blocked_edges` would
    produce — the light requirements pass used to equalize capacities."""
    und = np.asarray(und_pairs, dtype=np.int64).reshape(-1, 2)
    num_tiles = max(-(-num_nodes // EDGE_TILE), 1)
    rows = np.concatenate([und[:, 0], und[:, 1]])
    cols = np.concatenate([und[:, 1], und[:, 0]])
    out = []
    for col_major in (False, True):
        rt, ct = rows // EDGE_TILE, cols // EDGE_TILE
        key = (ct * num_tiles + rt) if col_major else (rt * num_tiles + ct)
        _, counts = np.unique(key, return_counts=True)
        e_cap = max(int((-(-counts // TILE_E) * TILE_E).sum()), TILE_E)
        out.append(e_cap // TILE_E)
    return out[0], out[1]


def build_blocked_edges(
    und_pairs: np.ndarray,
    edge_attr: np.ndarray,
    num_nodes: int,
    pad_slabs_rm=None,
    pad_slabs_cm=None,
    to_device: bool = True,
) -> BlockedEdgeStructure:
    """Blocked-edge structure from *undirected* node pairs and their edge
    features (mirrored internally — both directions get the same features,
    reference dataset.py:944-951). ``num_nodes`` is rounded up to whole
    ``EDGE_TILE`` tiles. ``pad_slabs_rm``/``pad_slabs_cm`` bucket the slab
    capacities (ints or ``required -> capacity`` callables)."""
    und = np.asarray(und_pairs, dtype=np.int64).reshape(-1, 2)
    eattr = np.asarray(edge_attr, dtype=np.float32)
    if eattr.ndim != 2:
        eattr = eattr.reshape(len(und), -1) if len(und) else eattr.reshape(0, max(eattr.shape[-1] if eattr.ndim else 1, 1))
    if und.size and (und.max() >= num_nodes or und.min() < 0):
        msg = f"edge index out of range: max {und.max()} for {num_nodes} nodes"
        raise ValueError(msg)
    num_tiles = max(-(-num_nodes // EDGE_TILE), 1)
    rows = np.concatenate([und[:, 0], und[:, 1]])
    cols = np.concatenate([und[:, 1], und[:, 0]])
    ea2 = np.concatenate([eattr, eattr], axis=0)

    rm = _build_order(rows, cols, ea2, num_tiles, col_major=False, pad_slabs_to=pad_slabs_rm)
    cm = _build_order(rows, cols, ea2, num_tiles, col_major=True, pad_slabs_to=pad_slabs_cm)
    structure = BlockedEdgeStructure(rm=rm, cm=cm, num_node_tiles=num_tiles, edge_dim=eattr.shape[1])
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

    On TPU this runs the fused Pallas kernel (ops/pallas_vanilla.py); other
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


def blocked_message_sum_xla(
    structure: BlockedEdgeStructure, xr: jnp.ndarray, xc: jnp.ndarray, w_e: jnp.ndarray
) -> jnp.ndarray:
    """Reference/fallback path (CPU tests + kernel oracle): the same sorted
    slab layout evaluated with XLA gathers and a segment sum."""
    tile = EDGE_TILE
    rm = structure.rm
    v_pad = structure.padded_nodes
    # global indices; sentinel rows land on v_pad (dropped by the scatter)
    slab = jnp.arange(rm.row_local.shape[0], dtype=jnp.int32) // TILE_E
    grow = rm.step_row[slab] * tile + rm.row_local
    grow = jnp.where(rm.row_local >= tile, v_pad, grow)
    gcol = rm.step_col[slab] * tile + rm.col_local
    fe = structure.edge_dim
    pre = (
        xr[jnp.clip(grow, 0, v_pad - 1)]
        + xc[gcol]
        + rm.eattr_t[:fe].T @ w_e
    )
    msg = jax.nn.relu(pre) * (grow < v_pad)[:, None]
    out = jax.ops.segment_sum(msg, grow, num_segments=v_pad + 1)
    return out[:v_pad]
