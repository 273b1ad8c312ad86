"""Checkpoint serialization.

Two interchangeable formats behind one save/load API:

- **pickle** (default, ``*.pth.tar``): the reference's single-file checkpoint
  with its 28-key dict schema (reference trainer.py:910-958).
- **orbax** (``*.orbax`` directory): params/optimizer-state stored with
  ``orbax.checkpoint`` (sharded-array ready for multi-host) plus a JSON
  metadata sidecar — no code objects in the checkpoint (transform lambdas are
  stored as source strings, like the pickle format).
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np


def is_orbax_path(path: str) -> bool:
    return str(path).rstrip("/").endswith(".orbax")


def save_checkpoint(state: dict, path: str) -> None:
    """Persist a trainer checkpoint dict in the format implied by ``path``."""
    if not is_orbax_path(path):
        with open(path, "wb") as f:
            pickle.dump(state, f)
        return

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    arrays = {
        "model_state": state["model_state"],
        "optimizer_state": state["optimizer_state"],
    }
    metadata = {}
    for key, value in state.items():
        if key in arrays:
            continue
        if key == "optimizer":
            metadata[key] = value.__name__ if isinstance(value, type) else type(value).__name__
        elif key == "lossfunction":
            metadata[key] = type(value).__name__
        else:
            metadata[key] = _jsonable(value)

    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(os.path.join(path, "arrays"), arrays, force=True)
    with open(os.path.join(path, "metadata.json"), "w", encoding="utf-8") as f:
        json.dump(metadata, f, indent=1)


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint saved by :func:`save_checkpoint` (either format), or
    a checkpoint produced by the reference (PyTorch) framework."""
    if not is_orbax_path(path):
        import zipfile

        if zipfile.is_zipfile(path):  # torch.save zip container
            return _load_reference_checkpoint(path)
        with open(path, "rb") as f:
            return pickle.load(f)  # noqa: S301

    import orbax.checkpoint as ocp

    from deeprank2_tpu.ops import losses as loss_nn
    from deeprank2_tpu.ops import optim

    path = os.path.abspath(path)
    checkpointer = ocp.PyTreeCheckpointer()
    arrays = checkpointer.restore(os.path.join(path, "arrays"))
    with open(os.path.join(path, "metadata.json"), encoding="utf-8") as f:
        metadata = json.load(f)

    state = dict(metadata)
    state["model_state"] = arrays["model_state"]
    state["optimizer_state"] = arrays["optimizer_state"]
    state["optimizer"] = getattr(optim, metadata["optimizer"])
    state["lossfunction"] = getattr(loss_nn, metadata["lossfunction"])()
    # JSON turns classes_to_index keys into strings; restore int keys
    if state.get("classes_to_index"):
        state["classes_to_index"] = {_maybe_int(k): v for k, v in state["classes_to_index"].items()}
    return state


def _jsonable(value):
    if isinstance(value, np.ndarray):
        return value.tolist()
    if isinstance(value, (np.floating, np.integer)):
        return value.item()
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    return value


def _maybe_int(key: str):
    try:
        return int(key)
    except (TypeError, ValueError):
        return key


# ---------------------------------------------------------------------------
# Reference (PyTorch) checkpoint import
# ---------------------------------------------------------------------------
class _InertMeta(type):
    """Metaclass for stub classes standing in for unimportable pickled types.

    Calling a stub returns another stub *class* (dill reconstructs functions
    and types by calling loader helpers whose results are then used as
    classes); attribute access also yields stubs. ``__setstate__`` absorbs any
    state. This lets the reference checkpoint's dill-serialized objects and
    ``deeprank2.*`` class references deserialize inertly — their *data* is
    not needed, only the surrounding dict — without importing the reference
    package (whose Python-3.10 code objects crash this interpreter).
    """

    def __call__(cls, *args, **kwargs):  # noqa: ARG002
        return _inert(f"{cls.__name__}_r")

    def __getattr__(cls, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return _inert(name)


def _inert(name: str) -> type:
    return _InertMeta(name, (), {"__setstate__": lambda *a, **k: None})


def _load_reference_checkpoint(path: str) -> dict:
    """Load a reference ``torch.save`` checkpoint into our state schema.

    The model weights stay a flat torch-style state_dict (numpy values) with
    ``model_state_format="torch"``; the Trainer translates them into the
    selected architecture's pytree (neuralnets/torch_interop.py). The
    optimizer state is NOT imported (its param ordering is
    architecture-internal to torch) — fine for inference/fine-tune restarts.
    """
    import logging

    import torch

    from deeprank2_tpu.ops import losses as loss_nn
    from deeprank2_tpu.ops import optim

    log = logging.getLogger(__name__)

    class _Unpickler(pickle.Unpickler):
        # whitelist unpickler: only torch/numpy/collections reconstruct for
        # real; everything else (deeprank2.*, dill-by-value objects, and any
        # os.system-style gadget a tampered file could carry) becomes an
        # inert stub instead of executing
        def find_class(self, module, name):
            root = module.split(".")[0]
            if root in ("torch", "numpy", "collections") or (module, name) == ("_codecs", "encode"):
                return super().find_class(module, name)
            return _inert(name)

    class _PickleShim:
        Unpickler = _Unpickler
        load = staticmethod(pickle.load)

    state = torch.load(path, map_location="cpu", weights_only=False, pickle_module=_PickleShim)

    def to_numpy(value):
        if isinstance(value, torch.Tensor):
            return np.asarray(value.detach().numpy())
        if isinstance(value, dict):
            return {k: to_numpy(v) for k, v in value.items()}
        return value

    state["model_state"] = {k: to_numpy(v) for k, v in dict(state["model_state"]).items()}
    state["model_state_format"] = "torch"

    data_type = state.get("data_type")
    if not isinstance(data_type, str):
        state["data_type"] = getattr(data_type, "__name__", str(data_type))

    opt = state.get("optimizer")
    opt_name = opt.__name__ if isinstance(opt, type) else type(opt).__name__
    opt_name = opt_name.removesuffix("_r")
    state["optimizer"] = getattr(optim, opt_name, None)
    if state["optimizer"] is None:
        log.warning(f"Unknown optimizer {opt_name!r} in reference checkpoint; defaulting to Adam.")
        state["optimizer"] = optim.Adam
    state["optimizer_state"] = None  # torch param ordering is not portable

    loss_name = type(state.get("lossfunction")).__name__.removesuffix("_r")
    loss_cls = getattr(loss_nn, loss_name, None)
    if loss_cls is None:
        log.warning(f"Unknown loss {loss_name!r} in reference checkpoint; using task default.")
        state["lossfunction"] = None
    else:
        state["lossfunction"] = loss_cls()

    for key in ("means", "devs", "class_weights"):
        if key in state:
            state[key] = to_numpy(state[key])
    return state
