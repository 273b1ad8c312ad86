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
    """Load a checkpoint saved by :func:`save_checkpoint` (either format)."""
    if not is_orbax_path(path):
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
