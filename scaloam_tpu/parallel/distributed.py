"""Multi-host initialization (the DCN layer).

Reference transport is single-host ROS1 TCPROS (SURVEY.md §5); here
multi-host runs initialize jax.distributed so the `kf` mesh axis spans all
hosts' devices — collectives ride ICI within a slice and DCN across hosts.

Usage on each host:
    from scaloam_tpu.parallel import distributed
    distributed.initialize()            # env-driven (TPU pods auto-detect)
    mesh = distributed.global_mesh()

The sharded components (parallel/pgo.py, parallel/sc_retrieval.py,
parallel/gridmap.py) take any mesh; with a global mesh their psum /
all_gather collectives become cross-host automatically. Keyframe payloads
(clouds) stay on their producing host; only descriptors, factors and poses
— the small state — are device-sharded, which is what the solves need.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from scaloam_tpu.parallel.mesh import KF_AXIS


_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper.

    Explicit no-ops: a second call from this module, or an explicit
    single-process run (num_processes == 1 with no coordinator). Anything
    else — an unreachable or typo'd coordinator, inconsistent process ids,
    a double-init from outside this module — RAISES: silently degrading a
    requested multi-host run to single-host corrupts the sharded state's
    world view (every psum/all_gather sees a mesh of the wrong size)."""
    global _initialized
    if _initialized:
        return
    if num_processes in (None, 1) and coordinator_address is None and (
        process_id in (None, 0)
    ):
        # Explicit single-process (or env-driven auto-detect on a platform
        # with no cluster env): initialize only if the env declares a
        # cluster, otherwise stay single-process without touching the
        # distributed runtime.
        import os

        cluster_env = any(
            k in os.environ
            for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
        )
        if not cluster_env:
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def global_mesh() -> Mesh:
    """One-axis mesh over every device of every host."""
    return Mesh(np.array(jax.devices()), (KF_AXIS,))
