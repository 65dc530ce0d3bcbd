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


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize passthrough; no-op if already initialized
    or running single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def global_mesh() -> Mesh:
    """One-axis mesh over every device of every host."""
    return Mesh(np.array(jax.devices()), (KF_AXIS,))
