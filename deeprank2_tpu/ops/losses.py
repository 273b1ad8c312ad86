"""In-repo loss functions (JAX), mirroring the torch.nn loss classes the
reference whitelists (deeprank2/domain/losstypes.py).

Every loss is a class with ``__call__(pred, target, mask=None)`` returning the
mean over valid elements (``mask`` excludes padded graphs in a batch).
Classification losses accept a per-class ``weight`` array and follow torch's
weighted-mean semantics (divide by the summed weights of the targets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray | None, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    if weights is None:
        weights = jnp.ones_like(values)
    if mask is not None:
        weights = weights * mask.astype(values.dtype)
    total = jnp.sum(weights)
    return jnp.sum(values * weights) / jnp.maximum(total, 1e-12)


class _Loss:
    """Base: repr/name used in checkpoints."""

    def __repr__(self) -> str:
        return f"{type(self).__name__}()"

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other)

    def __hash__(self) -> int:
        return hash(type(self).__name__)


# ---------------------------------------------------------------------------
# Regression losses
# ---------------------------------------------------------------------------
class MSELoss(_Loss):
    def __call__(self, pred, target, mask=None):
        return _masked_mean((pred - target) ** 2, mask)


class L1Loss(_Loss):
    def __call__(self, pred, target, mask=None):
        return _masked_mean(jnp.abs(pred - target), mask)


class SmoothL1Loss(_Loss):
    def __init__(self, beta: float = 1.0):
        self.beta = beta

    def __call__(self, pred, target, mask=None):
        diff = jnp.abs(pred - target)
        vals = jnp.where(diff < self.beta, 0.5 * diff**2 / self.beta, diff - 0.5 * self.beta)
        return _masked_mean(vals, mask)


class HuberLoss(_Loss):
    def __init__(self, delta: float = 1.0):
        self.delta = delta

    def __call__(self, pred, target, mask=None):
        diff = jnp.abs(pred - target)
        vals = jnp.where(diff < self.delta, 0.5 * diff**2, self.delta * (diff - 0.5 * self.delta))
        return _masked_mean(vals, mask)


# ---------------------------------------------------------------------------
# Classification losses
# ---------------------------------------------------------------------------
class CrossEntropyLoss(_Loss):
    """Softmax cross entropy on raw logits ``[N, C]`` and integer targets ``[N]``."""

    def __init__(self, weight: jnp.ndarray | None = None):
        self.weight = weight

    def __call__(self, logits, target, mask=None):
        target = target.astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
        weights = None if self.weight is None else jnp.asarray(self.weight)[target]
        return _masked_mean(nll, mask, weights)


class NLLLoss(_Loss):
    """Expects log-probabilities ``[N, C]``."""

    def __init__(self, weight: jnp.ndarray | None = None):
        self.weight = weight

    def __call__(self, logp, target, mask=None):
        target = target.astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
        weights = None if self.weight is None else jnp.asarray(self.weight)[target]
        return _masked_mean(nll, mask, weights)


class BCELoss(_Loss):
    """Binary cross entropy on probabilities in (0, 1)."""

    def __init__(self, weight: jnp.ndarray | None = None):
        self.weight = weight

    def __call__(self, pred, target, mask=None):
        eps = 1e-12
        vals = -(target * jnp.log(jnp.clip(pred, eps, 1.0)) + (1 - target) * jnp.log(jnp.clip(1 - pred, eps, 1.0)))
        return _masked_mean(vals, mask)


class BCEWithLogitsLoss(_Loss):
    def __init__(self, weight: jnp.ndarray | None = None):
        self.weight = weight

    def __call__(self, logits, target, mask=None):
        vals = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return _masked_mean(vals, mask)


class SoftMarginLoss(_Loss):
    def __call__(self, pred, target, mask=None):
        vals = jnp.log1p(jnp.exp(-target * pred))
        return _masked_mean(vals, mask)


class PoissonNLLLoss(_Loss):
    def __init__(self, log_input: bool = True):
        self.log_input = log_input

    def __call__(self, pred, target, mask=None):
        vals = jnp.exp(pred) - target * pred if self.log_input else pred - target * jnp.log(jnp.clip(pred, 1e-8))
        return _masked_mean(vals, mask)


class GaussianNLLLoss(_Loss):
    def __init__(self, eps: float = 1e-6):
        self.eps = eps

    def __call__(self, pred, target, var=None, mask=None):
        if var is None:
            var = jnp.ones_like(pred)
        var = jnp.clip(var, self.eps)
        vals = 0.5 * (jnp.log(var) + (pred - target) ** 2 / var)
        return _masked_mean(vals, mask)


class KLDivLoss(_Loss):
    def __call__(self, logp, target, mask=None):
        vals = target * (jnp.log(jnp.clip(target, 1e-12)) - logp)
        return _masked_mean(jnp.sum(vals, axis=-1), mask)


class MultiLabelMarginLoss(_Loss):
    """Multi-class multi-label hinge (torch.nn.MultiLabelMarginLoss semantics).

    ``target`` is ``[N, C]`` int where each row lists the positive class
    indices and is terminated by the first ``-1``; entries after it are
    ignored. Per sample: ``sum_{j in targets, i not in targets}
    max(0, 1 - (x[y_j] - x_i)) / C``.
    """

    def __call__(self, pred, target, mask=None):
        pred = jnp.atleast_2d(pred)
        target = jnp.atleast_2d(target).astype(jnp.int32)
        num_classes = pred.shape[-1]
        valid = jnp.cumprod(target >= 0, axis=1).astype(bool)
        tgt = jnp.where(valid, target, 0)
        onehot = jax.nn.one_hot(tgt, num_classes) * valid[..., None]
        is_target = onehot.sum(axis=1) > 0
        x_tgt = jnp.take_along_axis(pred, tgt, axis=1)
        margins = jnp.maximum(0.0, 1.0 - (x_tgt[:, :, None] - pred[:, None, :]))
        pair_mask = valid[:, :, None] & (~is_target)[:, None, :]
        vals = jnp.sum(margins * pair_mask, axis=(1, 2)) / num_classes
        return _masked_mean(vals, mask)


class MultiLabelSoftMarginLoss(_Loss):
    def __call__(self, pred, target, mask=None):
        vals = -(target * jax.nn.log_sigmoid(pred) + (1 - target) * jax.nn.log_sigmoid(-pred))
        return _masked_mean(jnp.mean(vals, axis=-1), mask)


# "other" losses: present for whitelist parity; using them for these tasks is
# rejected by Trainer.set_lossfunction exactly like in the reference.
class HingeEmbeddingLoss(_Loss):
    def __call__(self, pred, target, mask=None):
        vals = jnp.where(target == 1, pred, jnp.maximum(0.0, 1.0 - pred))
        return _masked_mean(vals, mask)


class CosineEmbeddingLoss(_Loss):
    """torch.nn.CosineEmbeddingLoss: ``1 - cos`` for ``target=1``,
    ``max(0, cos - margin)`` for ``target=-1``."""

    def __init__(self, margin: float = 0.0, eps: float = 1e-8):
        self.margin = margin
        self.eps = eps

    def __call__(self, x1, x2, target, mask=None):
        dot = jnp.sum(x1 * x2, axis=-1)
        norm = jnp.linalg.norm(x1, axis=-1) * jnp.linalg.norm(x2, axis=-1)
        cos = dot / jnp.maximum(norm, self.eps)
        vals = jnp.where(target == 1, 1.0 - cos, jnp.maximum(0.0, cos - self.margin))
        return _masked_mean(vals, mask)


class MarginRankingLoss(_Loss):
    """torch.nn.MarginRankingLoss: ``max(0, -y * (x1 - x2) + margin)``."""

    def __init__(self, margin: float = 0.0):
        self.margin = margin

    def __call__(self, x1, x2, target, mask=None):
        vals = jnp.maximum(0.0, -target * (x1 - x2) + self.margin)
        return _masked_mean(vals, mask)


class TripletMarginLoss(_Loss):
    """torch.nn.TripletMarginLoss: ``max(d(a,p) - d(a,n) + margin, 0)`` with
    torch's pairwise distance convention (``eps`` added to the difference)."""

    def __init__(self, margin: float = 1.0, p: float = 2.0, eps: float = 1e-6, swap: bool = False):
        self.margin = margin
        self.p = p
        self.eps = eps
        self.swap = swap

    def _dist(self, a, b):
        return jnp.sum(jnp.abs(a - b + self.eps) ** self.p, axis=-1) ** (1.0 / self.p)

    def __call__(self, anchor, positive, negative, mask=None):
        d_pos = self._dist(anchor, positive)
        d_neg = self._dist(anchor, negative)
        if self.swap:
            d_neg = jnp.minimum(d_neg, self._dist(positive, negative))
        vals = jnp.maximum(0.0, d_pos - d_neg + self.margin)
        return _masked_mean(vals, mask)


class CTCLoss(_Loss):
    """torch.nn.CTCLoss (forward algorithm over blank-extended targets).

    ``log_probs`` is ``[T, N, C]`` log-softmax output, ``targets`` ``[N, L]``
    padded class ids, plus per-sample ``input_lengths``/``target_lengths``.
    Reduction matches torch's default ``"mean"``: each sample's negative log
    likelihood is divided by its target length (clamped to 1), then averaged.
    The alpha recursion runs as a ``lax.scan`` over time with per-sample
    freezing past ``input_lengths`` — jit-compatible static shapes throughout.
    """

    _NEG_INF = -1e30

    def __init__(self, blank: int = 0):
        self.blank = blank

    def _single(self, logp, tgt, input_len, target_len):
        """NLL for one sample: logp [T, C], tgt [L] (padded)."""
        num_ext = 2 * tgt.shape[0] + 1
        s_idx = jnp.arange(num_ext)
        ext = jnp.where(s_idx % 2 == 1, tgt[jnp.minimum(s_idx // 2, tgt.shape[0] - 1)], self.blank)
        ext_shift2 = jnp.concatenate([jnp.full((2,), self.blank, ext.dtype), ext[:-2]])
        # s-2 transitions only between distinct non-blank labels
        allow_skip = (s_idx % 2 == 1) & (s_idx >= 2) & (ext != ext_shift2)

        alpha0 = jnp.full((num_ext,), self._NEG_INF)
        alpha0 = alpha0.at[0].set(logp[0, self.blank])
        alpha0 = jnp.where((s_idx == 1) & (target_len > 0), logp[0, ext[1]], alpha0)

        def step(alpha, t):
            stay = alpha
            advance = jnp.concatenate([jnp.array([self._NEG_INF]), alpha[:-1]])
            skip = jnp.concatenate([jnp.full((2,), self._NEG_INF), alpha[:-2]])
            merged = jnp.logaddexp(jnp.logaddexp(stay, advance), jnp.where(allow_skip, skip, self._NEG_INF))
            new = merged + logp[t, ext]
            return jnp.where(t < input_len, new, alpha), None

        alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, logp.shape[0]))
        end = jnp.logaddexp(
            alpha[2 * target_len],
            jnp.where(target_len > 0, alpha[jnp.maximum(2 * target_len - 1, 0)], self._NEG_INF),
        )
        return -end

    def __call__(self, log_probs, targets, input_lengths, target_lengths, mask=None):
        targets = jnp.atleast_2d(targets).astype(jnp.int32)
        input_lengths = jnp.asarray(input_lengths, jnp.int32)
        target_lengths = jnp.asarray(target_lengths, jnp.int32)
        nll = jax.vmap(self._single, in_axes=(1, 0, 0, 0))(log_probs, targets, input_lengths, target_lengths)
        vals = nll / jnp.maximum(target_lengths, 1)
        return _masked_mean(vals, mask)
