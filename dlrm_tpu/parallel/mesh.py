"""Device-mesh construction and sharding helpers.

The reference has no distributed layer (single-process shared memory,
SURVEY.md §2.4); here the mesh is a first-class component.  Default topology
for DLRM is a 1-D mesh whose single axis serves double duty — batch
data-parallelism for the MLPs AND model-parallel table sharding for the
embeddings (the classic hybrid).  Multi-host extends the same mesh over DCN
via ``jax.distributed`` (same code path; JAX orders devices host-major).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.parallel.placement import TablePlacement, plan_placement


def make_mesh(n_devices: Optional[int] = None, axis: str = "d") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"device(s) are visible on platform "
                f"'{devs[0].platform}'; for a virtual CPU mesh set "
                "jax.config.update('jax_platforms', 'cpu') and "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "d") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params: dict, axis: str = "d") -> dict:
    """Sharding pytree for the parameter pytree: MLPs replicated (they are
    small; data-parallel), sharded embedding stack (N, R, D) split on axis."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return {
        "bottom": jax.tree.map(lambda _: repl, params["bottom"]),
        "emb": shard,
        "top": jax.tree.map(lambda _: repl, params["top"]),
    }
