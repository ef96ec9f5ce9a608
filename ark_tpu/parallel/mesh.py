"""Device-mesh helpers for FOV-sharded data parallelism.

The framework's natural parallelism (SURVEY.md §2.5) is data parallelism over
FOVs: whole FOVs shard across chips with no cross-FOV communication except
small cohort reductions (channel percentiles, SOM batch statistics). These
helpers build the 1-D 'fov' mesh, and initialize jax.distributed for the
multi-host (DCN) cohort configuration."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FOV_AXIS = "fov"


def get_mesh(n_devices: Optional[int] = None, axis_name: str = FOV_AXIS) -> Mesh:
    """A 1-D mesh over the first n (default: all) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def fov_sharding(mesh: Mesh, axis_name: str = FOV_AXIS) -> NamedSharding:
    """Shard the leading (FOV/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for the multi-host (DCN) cohort config
    (BASELINE.json config 5). Per-host TIFF loading feeds the global mesh;
    no-op if already initialized — any other failure propagates."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # jax's actual double-init message is 'distributed.initialize
        # should only be called once.' (jax 0.9); older builds said
        # 'already initialized' — accept both, re-raise anything else
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "should only be called once" not in msg):
            raise


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
