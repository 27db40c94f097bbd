"""Multi-host (DCN) initialization for sharded training.

The reference has no distribution of any kind (SURVEY.md §5); this is the
TPU-native growth path: `jax.distributed.initialize` wires the hosts of a
pod slice together over DCN, after which `jax.devices()` spans every chip
and the 2-D (gauss × tile) mesh from `msgs.dist.mesh.make_mesh` lays its
gauss axis across hosts (parameters/optimizer sharded over DCN-connected
groups) while tile stripes stay within a host's ICI domain.

Activated by `--multihost` on the trainer. Configuration follows JAX's
standard environment contract: on Cloud TPU, `initialize()` autodetects
coordinator/process ids from the TPU metadata; elsewhere set
  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        number of hosts
  JAX_PROCESS_ID           this host's rank
or pass them explicitly.

Data-loading contract under multi-host: every process loads the same scene
and steps the same camera schedule (the host schedule is deterministic given
the seed), while `jax.device_put` with the mesh shardings makes each process
materialize only its addressable shard of parameters and ground-truth
stripes.
"""
from __future__ import annotations

import os
from typing import Optional


def maybe_initialize(enabled: bool,
                     coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when `enabled`. Returns True if this is
    process 0 (the process that should write logs/checkpoints)."""
    import jax

    if not enabled:
        return True
    kw = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        pid = process_id if process_id is not None else int(
            os.environ["JAX_PROCESS_ID"])
        kw["process_id"] = pid
    jax.distributed.initialize(**kw)
    return jax.process_index() == 0
