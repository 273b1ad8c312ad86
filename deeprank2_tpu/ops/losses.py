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
    def __call__(self, pred, target, mask=None):  # pragma: no cover - rarely used
        msg = "MultiLabelMarginLoss is listed for API parity but not implemented."
        raise NotImplementedError(msg)


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
    def __call__(self, x1, x2, target, mask=None):  # pragma: no cover
        msg = "CosineEmbeddingLoss is listed for API parity but not implemented."
        raise NotImplementedError(msg)


class MarginRankingLoss(_Loss):
    def __call__(self, x1, x2, target, mask=None):  # pragma: no cover
        msg = "MarginRankingLoss is listed for API parity but not implemented."
        raise NotImplementedError(msg)


class TripletMarginLoss(_Loss):
    def __call__(self, a, p, n, mask=None):  # pragma: no cover
        msg = "TripletMarginLoss is listed for API parity but not implemented."
        raise NotImplementedError(msg)


class CTCLoss(_Loss):
    def __call__(self, *args, **kwargs):  # pragma: no cover
        msg = "CTCLoss is listed for API parity but not implemented."
        raise NotImplementedError(msg)
