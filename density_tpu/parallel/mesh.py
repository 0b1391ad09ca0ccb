"""Device mesh helpers.

The framework's parallelism model (SURVEY.md §2b, §5): compression is
data-decomposed over independent streams; a 1-D "streams" mesh axis is
the DP analogue. Encode is embarrassingly parallel (zero collectives in
the hot loop); the only communication is the ordered gather of
variable-length compressed streams at container-assembly time, which
rides ICI within a slice / DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STREAM_AXIS = "streams"


def default_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), (STREAM_AXIS,))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (stream) axis across the mesh."""
    return NamedSharding(mesh, P(STREAM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up: wraps jax.distributed.initialize so a pod
    slice can run container compression with streams sharded across
    hosts. No-op when already initialized or single-process."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment
