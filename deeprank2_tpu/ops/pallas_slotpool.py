"""8-lane slot max pooling — the kernel half of the clustered slot layout.

The clustered block-sparse collate can lay nodes out cluster-major in 8-lane
"slots" (``ops/batch.py:collate_graphs_blocksparse_clustered(slot8=True)``):
every cluster owns a contiguous run of slots, members padded to a multiple of
8 lanes. Depth-0 community pooling then factorizes into

1. a **slot max** over every aligned 8-lane group of the ``[F, V]`` activation
   (this module), and
2. a tiny member-matrix max over the per-cluster slot partials (
   :func:`deeprank2_tpu.ops.pooling.member_max_pool` on ``V/8`` rows).

Stage 1 is where XLA loses: every lane-group-reduce formulation measured on
v5e (lane-window ``reduce_window``, stride-8 lane slices, 3-D reshapes) costs
90-180 us *per pass* over a ``[32, 100k]`` activation — stride-8 lane access
is a cross-register relayout however it is spelled. The round-3
member-matrix pool avoids that but pays XLA's row-gather rate on
``C x S_max`` rows (~1.3 us per 1k rows; 159k rows at the 100k-node bench
shape, ~0.53 ms of a 2.05 ms step with its VJP).  This kernel does the
group reduce in one pass at stream speed:

- the in-group max rides a 3-step masked roll tree (``pltpu.roll`` by 1/2/4
  lanes; lane ``8j`` ends up holding its group's max — neighbouring groups
  pollute the other lanes, which are never read);
- the stride-8 **extraction** (the part Mosaic has no cheap lane-gather for)
  rides the MXU instead: a ``[T, T/8]`` 0/1 selection matmul. Exactness
  (the backward compares ``h == max`` bit-for-bit) comes from a THREE-term
  bf16 split (8+8+8 mantissa bits cover f32's 24; each selection product is
  a single term, so the f32 accumulation reconstructs the value exactly —
  a two-term split would round the low 8 bits and zero the gradients).

Semantics match :func:`member_max_pool` per 8-lane group: ``h >= 0`` with
padded lanes zero (all models pool post-relu, masked), empty groups pool to
0, and the backward routes the FULL cotangent to every valid max-achieving
lane (no tie division — round-5 change: the tie-count machinery cost a
second selection-matmul group plus an eq matmul per forward tile, and ties
only matter on measure-zero sets: exact POSITIVE ties in continuous conv
activations, or all-zero groups whose lanes are relu-dead downstream
anyway — ``h == 0`` post-relu means the pre-activation was ``<= 0``, so the
SpMM VJP's relu factor kills whatever arrives there).

Reference parity: this implements the scatter_max half of PyG
``max_pool_x`` (reference deeprank2/utils/community_pooling.py:229-242) for
the slot-aligned layout; the divergence from torch's single-winner gradient
(every tied winner gets the cotangent instead of the first) lives on the
same measure-zero set as member_max_pool's documented convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeprank2_tpu.ops.segment import effective_platform, plain_matmul_precision

SLOT = 8
TILE = 1024  # lanes per grid step (the selection-matmul span)


def _split3(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """f32 -> three bf16 terms whose f32 sum reconstructs ``v`` EXACTLY
    (8+8+8 mantissa bits >= f32's 24; each residual subtraction is exact).
    In-kernel only — Mosaic keeps the naive residual form (XLA HLO would
    fold it to zero under --xla_allow_excess_precision, see ops/diag_spmm.py
    ``_hi_lo_split``)."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - mid.astype(jnp.float32)
    return hi, mid, r2.astype(jnp.bfloat16)


_dot = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
)


def _sel3(v: jnp.ndarray, sel: jnp.ndarray, dot=_dot) -> jnp.ndarray:
    """Exact f32 selection/expansion matmul via the three-term split."""
    hi, mid, lo = _split3(v)
    return dot(hi, sel) + dot(mid, sel) + dot(lo, sel)


def _tree_max(h: jnp.ndarray, slot: int = SLOT) -> jnp.ndarray:
    """Lane ``slot*j`` of the result holds ``max(h[:, slot*j : slot*(j+1)])``;
    other lanes hold cross-group garbage (never read — the selection matmul
    drops them). Reads never wrap: lane ``slot*j`` looks at most slot-1
    lanes ahead. ``slot`` must be a power of two (2/4/8 — the mixed
    layout's size-class regions use the narrow strides)."""
    m = h
    step = 1
    while step < slot:
        # roll requires a non-negative shift; T - step rolls left by step
        m = jnp.maximum(m, pltpu.roll(m, m.shape[1] - step, 1))
        step *= 2
    return m


def _contain(h, mask, vp):
    """Zero lanes past the true width ``vp`` (None = the grid divides
    evenly). The final ragged block reads past the array; whatever Pallas
    fills there must not reach the selection matmuls — an uncontained NaN
    would poison VALID columns through the 0-weight products."""
    if vp is None:
        return h, mask
    idx = pl.program_id(0) * TILE + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    live = idx < vp
    return jnp.where(live, h, 0.0), jnp.where(live, mask, 0.0)


@plain_matmul_precision
def _fwd_kernel(h_ref, gsel_ref, pooled_ref, *, vp, slot):
    # h: [fs, T] f32, padded lanes pre-zeroed by the model's mask
    h = h_ref[:]
    if vp is not None:
        idx = pl.program_id(0) * TILE + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        h = jnp.where(idx < vp, h, 0.0)
    pooled_ref[:] = _sel3(_tree_max(h, slot), gsel_ref[:])  # [fs, T/slot], exact


@plain_matmul_precision
def _bwd_kernel(h_ref, mask_ref, pooled_ref, g_ref, exp_ref, dh_ref, *, fs, vp, slot):
    h, mask = _contain(h_ref[:], mask_ref[:], vp)
    pooled, gd = pooled_ref[:], g_ref[:]
    if vp is not None:
        # the compact-side blocks read past vp/slot on the final block too;
        # their garbage would poison valid lanes through the expansion
        # matmul's 0-weight products if it were NaN
        cidx = pl.program_id(0) * (TILE // slot) + jax.lax.broadcasted_iota(jnp.int32, (1, TILE // slot), 1)
        clive = cidx < vp // slot
        pooled = jnp.where(clive, pooled, 0.0)
        gd = jnp.where(clive, gd, 0.0)
    # one stacked expansion for (pooled, g): pooled must be exact for the
    # winner compare; the three-term split costs nothing extra for gd
    e = _sel3(jnp.concatenate([pooled, gd], axis=0), exp_ref[:])
    eq = jnp.where(h == e[:fs], 1.0, 0.0) * mask
    dh_ref[:] = eq * e[fs:]


@functools.cache
def _consts(tile: int, slot: int = SLOT) -> tuple[np.ndarray, np.ndarray]:
    lanes = np.arange(tile)
    groups = np.arange(tile // slot)
    gsel = (lanes[:, None] == slot * groups[None, :]).astype(np.float32)
    exp = (lanes[None, :] // slot == groups[:, None]).astype(np.float32)
    return gsel.astype(jnp.bfloat16), exp.astype(jnp.bfloat16)


def supports(num_lanes: int, slot: int = SLOT) -> bool:
    """Whether the TPU kernel covers this activation width.

    Any slot-aligned width works: the grid rounds up and the final block
    reads past the array. That is safe BECAUSE ``num_lanes % slot == 0`` —
    no group straddles the boundary, so out-of-bounds garbage only feeds
    group columns ``>= num_lanes/slot``, whose output stores Pallas masks
    off (and which no consumer references)."""
    return effective_platform() == "tpu" and num_lanes % slot == 0 and num_lanes > 0


@functools.partial(jax.jit, static_argnames=("interpret", "slot"))
def _slot_fwd_tpu(h_t, *, interpret=False, slot=SLOT):
    feat, vp = h_t.shape
    pad_f = (-feat) % 8
    if pad_f:
        h_t = jnp.pad(h_t, ((0, pad_f), (0, 0)))
    fs = feat + pad_f
    gsel, _ = _consts(TILE, slot)
    grid = (-(-vp // TILE),)  # ceil: the final block may read past vp (contained in-kernel)
    pooled = pl.pallas_call(
        functools.partial(_fwd_kernel, vp=vp if vp % TILE else None, slot=slot),
        grid=grid,
        in_specs=[
            pl.BlockSpec((fs, TILE), lambda i: (0, i)),
            pl.BlockSpec((TILE, TILE // slot), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((fs, TILE // slot), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((fs, vp // slot), jnp.float32),
        interpret=interpret,
    )(h_t, jnp.asarray(gsel))
    return pooled[:feat]


@functools.partial(jax.jit, static_argnames=("interpret", "slot"))
def _slot_bwd_tpu(h_t, mask_row, pooled, g, *, interpret=False, slot=SLOT):
    feat, vp = h_t.shape
    pad_f = (-feat) % 8
    if pad_f:
        h_t = jnp.pad(h_t, ((0, pad_f), (0, 0)))
        pooled = jnp.pad(pooled, ((0, pad_f), (0, 0)))
        g = jnp.pad(g, ((0, pad_f), (0, 0)))
    fs = feat + pad_f
    _, exp = _consts(TILE, slot)
    dh = pl.pallas_call(
        functools.partial(_bwd_kernel, fs=fs, vp=vp if vp % TILE else None, slot=slot),
        grid=(-(-vp // TILE),),
        in_specs=[
            pl.BlockSpec((fs, TILE), lambda i: (0, i)),
            pl.BlockSpec((1, TILE), lambda i: (0, i)),
            pl.BlockSpec((fs, TILE // slot), lambda i: (0, i)),
            pl.BlockSpec((fs, TILE // slot), lambda i: (0, i)),
            pl.BlockSpec((TILE // slot, TILE), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((fs, TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((fs, vp), jnp.float32),
        interpret=interpret,
    )(h_t, mask_row, pooled, g, jnp.asarray(exp))
    return dh[:feat]


def _xla_fwd(h_t: jnp.ndarray, mask_row: jnp.ndarray, slot: int = SLOT) -> jnp.ndarray:  # noqa: ARG001 (contract parity with the kernel)
    """CPU fallback / oracle: the 3-D reshape formulation (fine off-TPU)."""
    feat, vp = h_t.shape
    return h_t.reshape(feat, vp // slot, slot).max(axis=2)


def slot_group_max(h_t: jnp.ndarray, mask_row: jnp.ndarray, *, interpret: bool = False, slot: int = SLOT) -> jnp.ndarray:
    """Max over every aligned ``slot``-lane group: ``[F, V] -> [F, V/slot]``
    (slot a power of two <= 8; the mixed layout's size-class regions use
    2 and 4).

    ``h_t`` must be non-negative with padded lanes zero (post-relu, masked —
    the member_max_pool contract); ``mask_row`` is the ``[1, V]`` f32
    validity row (real nodes 1). Differentiable; every valid max-achieving
    lane receives the full cotangent (see the module docstring for why the
    tie set is gradient-immaterial here); gradient flows to ``h_t`` only
    (the mask is batch data).
    """
    vp = h_t.shape[1]
    on_tpu = supports(vp, slot) or interpret

    @jax.custom_vjp
    def pool(h):
        if on_tpu:
            return _slot_fwd_tpu(h, interpret=interpret, slot=slot)
        return _xla_fwd(h, mask_row, slot)

    def fwd(h):
        pooled = pool(h)
        return pooled, (h, pooled)

    def bwd(res, g):
        h, pooled = res
        if on_tpu:
            return (_slot_bwd_tpu(h, mask_row, pooled, g, interpret=interpret, slot=slot),)
        feat, vp = h.shape
        h3 = h.reshape(feat, vp // slot, slot)
        m3 = mask_row.reshape(1, vp // slot, slot)
        eq = (h3 == pooled[:, :, None]) * m3
        dh3 = eq * g[:, :, None]
        return (dh3.reshape(feat, vp),)

    pool.defvjp(fwd, bwd)
    return pool(h_t)
