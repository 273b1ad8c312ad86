"""Segment aggregation primitives — the GNN message-passing core.

These replace the reference stack's ``torch_scatter`` kernels
(scatter_sum/mean/max used in deeprank2/neuralnets/gnn/*.py) with jit-safe,
padding-aware JAX ops. Padding convention: out-of-range segment ids (>=
``num_segments``) are dropped by XLA scatter semantics, so padded edges simply
carry ``segment_id = num_segments``.

A Pallas TPU kernel path for the hot segment-sum (see ops/pallas_segment.py)
plugs in behind the same API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SEGMENT_BACKEND = "pallas"


def plain_matmul_precision(kernel):
    """Trace a Pallas kernel body under the stock matmul precision.

    In-kernel MXU dots deliberately run bf16 single-pass (f32 exactness, where
    needed, comes from hi/lo operand splits — ops/block_sparse.py,
    ops/diag_spmm.py, ops/pallas_slotpool.py). A caller-side
    ``jax_default_matmul_precision=highest`` context (e.g. the
    accuracy-parity harness's determinism setting) would otherwise leak into
    the kernel trace and make Mosaic reject the bf16 operands outright
    ("Bad lhs type"); explicit ``Precision.DEFAULT`` on the dots cannot
    prevent this — DEFAULT *means* "follow the config default"."""

    @functools.wraps(kernel)
    def wrapped(*refs, **kw):
        with jax.default_matmul_precision("default"):
            return kernel(*refs, **kw)

    return wrapped


def effective_platform() -> str:
    """The platform computations will actually run on: an active
    ``jax.default_device`` context wins over the process default backend.

    Pallas TPU kernels must not be selected when a CPU ``jax.default_device``
    (or CPU mesh dry run) is active while the process default is a TPU."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax accepts both a Device and a platform-name string here
        return dev if isinstance(dev, str) else dev.platform
    return jax.default_backend()


def set_segment_backend(name: str) -> None:
    """Select the segment-sum implementation: "pallas" (default; banded
    one-hot MXU matmul for sorted-row 2D sums on TPU — 1.7x XLA's sorted
    scatter at exact f32, see ops/pallas_segment.py) or "xla" (scatter;
    also what non-TPU backends and unsorted/1D sums always use)."""
    global _SEGMENT_BACKEND
    if name not in ("xla", "pallas"):
        msg = f"unknown segment backend: {name}"
        raise ValueError(msg)
    _SEGMENT_BACKEND = name


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_sorted: bool = False,
) -> jnp.ndarray:
    """Sum ``data`` rows into ``num_segments`` buckets; OOB ids are dropped.

    ``indices_sorted=True`` promises ascending ids (padding sorted last, as the
    batcher produces) and unlocks the Pallas kernel when the backend is set.
    """
    if _SEGMENT_BACKEND == "pallas" and indices_sorted and data.ndim == 2 and effective_platform() == "tpu":
        from deeprank2_tpu.ops.pallas_segment import TILE_E, TILE_V, segment_sum_sorted

        # the kernel holds the whole sorted row array in VMEM (plus the
        # double-buffered edge blocks and one output tile) — beyond ~3M
        # edges that overflows the ~16 MB budget, so fall back to XLA
        fw = data.shape[1] + (-data.shape[1]) % 8
        e_pad = data.shape[0] + (-data.shape[0]) % TILE_E
        vmem = 4 * e_pad + 4 * fw * (2 * TILE_E + TILE_V)
        if vmem <= 13 * 1024 * 1024:
            return segment_sum_sorted(data, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments, indices_are_sorted=indices_sorted)


def segment_count(segment_ids: jnp.ndarray, num_segments: int, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Count of rows per segment (optionally masked)."""
    ones = jnp.ones(segment_ids.shape[0], dtype=jnp.float32)
    if valid is not None:
        ones = ones * valid.astype(jnp.float32)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Mean of ``data`` rows per segment; empty segments give 0 (the reference's
    ``scatter_mean`` into a zero-initialized output behaves the same for empty
    rows — torch_scatter divides by clamped count)."""
    sums = segment_sum(data, segment_ids, num_segments)
    counts = segment_count(segment_ids, num_segments)
    counts = jnp.maximum(counts, 1.0)
    return sums / counts.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Max of ``data`` rows per segment; empty segments give 0 (torch_scatter
    parity: scatter_max into a zero-initialized ``out`` keeps 0 for empties,
    and features pooled this way in the reference are post-ReLU, i.e. >= 0)."""
    init = jnp.full((num_segments,) + data.shape[1:], -jnp.inf, dtype=data.dtype)
    out = init.at[segment_ids].max(data, mode="drop")
    return jnp.where(jnp.isneginf(out), 0.0, out)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Numerically-stable softmax over rows sharing a segment id (true graph
    attention; masked rows get probability 0)."""
    maxes = jnp.full((num_segments,) + logits.shape[1:], -jnp.inf, dtype=logits.dtype)
    maxes = maxes.at[segment_ids].max(logits, mode="drop")
    maxes = jnp.where(jnp.isneginf(maxes), 0.0, maxes)
    shifted = logits - maxes[jnp.clip(segment_ids, 0, num_segments - 1)]
    expd = jnp.exp(shifted)
    if valid is not None:
        expd = expd * valid.astype(expd.dtype).reshape((-1,) + (1,) * (expd.ndim - 1))
    denom = segment_sum(expd, segment_ids, num_segments)
    denom = jnp.maximum(denom, 1e-16)
    out = expd / denom[jnp.clip(segment_ids, 0, num_segments - 1)]
    in_range = (segment_ids < num_segments).astype(out.dtype)
    return out * in_range.reshape((-1,) + (1,) * (out.ndim - 1))
