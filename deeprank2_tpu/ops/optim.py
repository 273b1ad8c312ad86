"""In-repo optimizers (JAX pytree-based), mirroring the torch.optim classes the
reference defaults to (Adam with L2 weight decay, trainer.py:401-426).

API: ``opt = Adam(lr=1e-3, weight_decay=1e-5); state = opt.init(params);
params, state = opt.step(params, grads, state)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Optimizer:
    """Base optimizer; subclasses implement ``init`` and ``step``."""

    def __init__(self, lr: float = 1e-3, weight_decay: float = 0.0):
        self.lr = lr
        self.weight_decay = weight_decay

    def init(self, params):
        raise NotImplementedError

    def step(self, params, grads, state):
        raise NotImplementedError

    def state_dict(self) -> dict:
        return {"type": type(self).__name__, "lr": self.lr, "weight_decay": self.weight_decay}

    def __repr__(self) -> str:
        return f"{type(self).__name__}(lr={self.lr}, weight_decay={self.weight_decay})"


class Adam(Optimizer):
    """Adam with L2 weight decay folded into the gradient (torch.optim.Adam
    semantics — decay decoupled variants use :class:`AdamW`)."""

    def __init__(self, lr: float = 1e-3, betas: tuple[float, float] = (0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.0):
        super().__init__(lr, weight_decay)
        self.betas = betas
        self.eps = eps

    def init(self, params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"step": jnp.zeros((), jnp.int32), "m": zeros, "v": jax.tree.map(jnp.zeros_like, params)}

    def step(self, params, grads, state):
        b1, b2 = self.betas
        count = state["step"] + 1
        if self.weight_decay:
            grads = jax.tree.map(lambda g, p: g + self.weight_decay * p, grads, params)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
        mhat_scale = 1.0 / (1 - b1**count.astype(jnp.float32))
        vhat_scale = 1.0 / (1 - b2**count.astype(jnp.float32))
        params = jax.tree.map(
            lambda p, m_, v_: p - self.lr * (m_ * mhat_scale) / (jnp.sqrt(v_ * vhat_scale) + self.eps),
            params,
            m,
            v,
        )
        return params, {"step": count, "m": m, "v": v}


class AdamW(Adam):
    """Adam with decoupled weight decay."""

    def step(self, params, grads, state):
        wd = self.weight_decay
        self.weight_decay = 0.0
        try:
            new_params, new_state = super().step(params, grads, state)
        finally:
            self.weight_decay = wd
        if wd:
            new_params = jax.tree.map(lambda np_, p: np_ - self.lr * wd * p, new_params, params)
        return new_params, new_state


class SGD(Optimizer):
    def __init__(self, lr: float = 1e-3, momentum: float = 0.0, weight_decay: float = 0.0):
        super().__init__(lr, weight_decay)
        self.momentum = momentum

    def init(self, params):
        return {"momentum": jax.tree.map(jnp.zeros_like, params)}

    def step(self, params, grads, state):
        if self.weight_decay:
            grads = jax.tree.map(lambda g, p: g + self.weight_decay * p, grads, params)
        if self.momentum:
            buf = jax.tree.map(lambda b, g: self.momentum * b + g, state["momentum"], grads)
            params = jax.tree.map(lambda p, b: p - self.lr * b, params, buf)
            return params, {"momentum": buf}
        params = jax.tree.map(lambda p, g: p - self.lr * g, params, grads)
        return params, state
