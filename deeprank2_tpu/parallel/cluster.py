"""Multi-host cluster setup helpers.

One TPU host sees only its local chips; ``initialize()`` wires hosts into one
JAX process group (collectives then ride ICI within a slice and DCN across
slices). Mesh construction separates the two fabrics so data parallelism maps
to DCN (infrequent, large, latency-tolerant gradients) and graph/edge
parallelism maps to ICI (per-layer all_gathers).

Single-process environments (tests, one-host runs) pass through unchanged.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh

_log = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Join the multi-host process group (no-op when single-process).

    With no arguments, relies on the cluster environment (TPU pod metadata /
    JAX_COORDINATOR_ADDRESS) like ``jax.distributed.initialize`` does.
    """
    if num_processes == 1 or (coordinator_address is None and jax.process_count() == 1 and num_processes is None):
        _log.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _log.info(f"joined process group: process {jax.process_index()}/{jax.process_count()}")


def hybrid_mesh(dp: int | None = None, gp: int | None = None) -> Mesh:
    """A (dp, gp) mesh: ``dp`` across hosts (DCN), ``gp`` within a host (ICI).

    Defaults: dp = number of processes, gp = local device count. For
    single-host runs this degrades to (1, local devices) — still valid for
    shard_map code written against both axes.
    """
    devices = jax.devices()
    if dp is None:
        dp = jax.process_count()
    if gp is None:
        gp = max(1, len(devices) // dp)
    if dp * gp != len(devices):
        msg = f"mesh {dp}x{gp} does not cover {len(devices)} devices"
        raise ValueError(msg)
    # order devices host-major so the gp axis stays within a host (ICI)
    ordered = sorted(devices, key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(ordered).reshape(dp, gp), ("dp", "gp"))
