"""Device-mesh construction.

Replaces the reference engine's device topology management — one NCCL comm +
thread per GPU with tp/pp split (3rd/bmengine/bmengine/core/engine.cpp:94-140)
— with a `jax.sharding.Mesh`. Axis names:

  "dp" — data parallel (request-level; also MLA attention-DP)
  "pp" — pipeline parallel (layer stages; models/pipeline.py)
  "tp" — tensor parallel (weight sharding; experts sharded here too)

Multi-host: jax.distributed.initialize handles what the reference's
ZMQ HostCommunicator + NCCL uniqueID broadcast did (host_communicator.hpp:17-110).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..config.engine_config import ParallelConfig

__all__ = ["make_mesh", "single_device_mesh", "mesh_from_config"]

DP_AXIS = "dp"
PP_AXIS = "pp"
TP_AXIS = "tp"


def make_mesh(
    tp: int = 1, dp: int = 1, pp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = tp * dp * pp
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for dp={dp} x pp={pp} x tp={tp}, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(dp, pp, tp)
    return Mesh(dev_array, (DP_AXIS, PP_AXIS, TP_AXIS))


def single_device_mesh(device=None) -> Mesh:
    dev = device if device is not None else jax.devices()[0]
    return Mesh(np.asarray([dev]).reshape(1, 1, 1), (DP_AXIS, PP_AXIS, TP_AXIS))


_dist_initialized = False


def ensure_distributed(pcfg: ParallelConfig):
    """Join the jax.distributed runtime (idempotent). MUST run before any
    JAX call that initializes the backend, so LLM calls it first thing."""
    global _dist_initialized
    if _dist_initialized or pcfg.num_hosts <= 1 or not pcfg.coordinator_address:
        return
    jax.distributed.initialize(
        coordinator_address=pcfg.coordinator_address,
        num_processes=pcfg.num_hosts,
        process_id=pcfg.host_rank,
    )
    _dist_initialized = True


def mesh_from_config(pcfg: ParallelConfig, devices: Optional[Sequence] = None) -> Mesh:
    ensure_distributed(pcfg)
    return make_mesh(tp=pcfg.tp, dp=pcfg.dp, pp=pcfg.pp, devices=devices)
