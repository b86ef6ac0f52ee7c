"""Multi-host (DCN) wiring: process bootstrap + cross-host data plumbing.

The reference is single-process (SURVEY §2: no distributed runtime); this
module is the TPU-native growth path for pod slices spanning hosts.  One
process per host calls :func:`initialize` (jax.distributed handshake over
the coordinator), after which ``jax.devices()`` spans every chip of every
host and the ordinary ``Mesh``/``shard_map`` training step from
train/steps.py runs unchanged — XLA routes the gradient psum over ICI
within a slice and DCN across slices.

Data feeding follows the process-local pattern: each host loads only the
dataset rows its own devices consume (``local_shard``) and contributes
them to the global batch with ``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    initialization_timeout: int = 600,
    heartbeat_timeout_seconds: int = 600,
) -> None:
    """jax.distributed bootstrap; parameters default to the standard env
    vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID),
    and a no-argument call on a managed TPU pod autodetects everything.

    Both timeouts default well above jax's own (300/100 s): on a loaded
    host a first-run XLA compile can exceed 100 s, and a starved heartbeat
    thread then gets the whole job torn down as "dead" mid-compile.  Ten
    minutes of heartbeat grace costs nothing when healthy (failures still
    surface via the coordination barrier / collective errors)."""
    import inspect

    # pass the timeout overrides only where this jax build accepts them
    # (the dependency is unpinned; older releases predate these kwargs,
    # and a TypeError here would break even the no-argument autodetect)
    accepted = inspect.signature(jax.distributed.initialize).parameters
    kwargs = {
        key: val
        for key, val in (
            ("initialization_timeout", initialization_timeout),
            ("heartbeat_timeout_seconds", heartbeat_timeout_seconds),
        )
        if key in accepted
    }
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"]
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes if num_processes is not None
                                      else os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(process_id if process_id is not None
                                   else os.environ["JAX_PROCESS_ID"])
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Coordination-service rendezvous (gRPC to the coordinator — NOT a
    device collective): block until every process arrives at ``name``.

    The CPU cross-process backend (Gloo) has a short non-configurable
    collective timeout, so a device collective launched while the peer is
    still compiling the same program (cache-state skew, loaded host) dies
    with DEADLINE_EXCEEDED.  The cure is to compile first — AOT
    ``.lower(...).compile()`` or a persistent-cache load — then meet here,
    then execute: collectives start within milliseconds of each other.
    No-op single-process, so callers need no topology guard."""
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is not None and jax.process_count() > 1:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def global_mesh(axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over every device of every process (1-D by default)."""
    devices = np.array(jax.devices())
    shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), tuple(axis_names))


def local_shard(items: Sequence, process_index: Optional[int] = None):
    """The subsequence of a global dataset this process is responsible
    for (strided split, so shards stay balanced under any length)."""
    index = jax.process_index() if process_index is None else process_index
    return list(items[index :: jax.process_count()])


def global_batch(mesh: Mesh, local_batch: dict, axis: str = "data") -> dict:
    """Assemble the global device batch from each process's local rows.

    ``local_batch`` arrays carry this process's rows only (global batch
    size = local rows x process count); the returned jax.Arrays are
    sharded over ``axis`` and usable directly by the shard_map train step.
    """
    sharding = NamedSharding(mesh, P(axis))
    return {
        key: jax.make_array_from_process_local_data(sharding, np.asarray(value))
        for key, value in local_batch.items()
    }
