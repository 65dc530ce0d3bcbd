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


def _cluster_env_present() -> bool:
    """True iff jax's cluster auto-detection would find a managed
    environment — the exact registry jax.distributed.initialize consults
    (jax._src.clusters.ClusterEnv), so pod auto-detect and this gate can
    never disagree. Falls back to the documented env markers if the
    private registry moves."""
    try:
        from jax._src.clusters import ClusterEnv

        return any(
            not env.opt_in_only_method and env.is_env_present()
            for env in ClusterEnv._cluster_types
        )
    except Exception:
        import os

        markers = (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "SLURM_JOB_ID", "OMPI_MCA_orte_hnp_uri",
            "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
        )
        return any(k in os.environ for k in markers)


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
        # No-arg call: defer to jax's OWN cluster auto-detection (SLURM,
        # Open MPI, GCE/GKE TPU pods, K8s) rather than re-implementing it
        # with custom env names (ADVICE r2: a private env-var allowlist
        # silently skipped pod auto-detect — the exact failure mode this
        # gate exists to prevent). Probe the same registry
        # jax.distributed.initialize consults; if no cluster env is
        # present this is an explicit single-process run and we stay
        # un-initialized.
        if not _cluster_env_present():
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
