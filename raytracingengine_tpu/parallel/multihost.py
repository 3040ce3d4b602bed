"""Multi-host initialization and mesh layout.

The reference is strictly single-process (SURVEY.md §2: no NCCL/MPI/
anything). The TPU-native scale-out story: `jax.distributed.initialize`
connects the hosts, and the global device list forms a
('rays', 'prims') mesh with the *ray* axis spanning hosts (DCN) and the
*prim* axis staying inside a slice (ICI), so the per-ray winner combine
(an all_gather over 'prims', geometry/intersect.py) rides the fast
interconnect while rays need no cross-host traffic at all — scene-param
gradient psums are the only DCN collective, and XLA's latency-hiding
scheduler overlaps them with the backward pass.

Single-chip (this image) and CPU-mesh environments skip initialize and
just build a local mesh, so the same entry points work everywhere.
"""

from __future__ import annotations

import os

import jax

from raytracingengine_tpu.parallel.mesh import make_mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Call jax.distributed.initialize when multi-process env is present.

    Returns True if distributed mode was initialized. Arguments default
    to the standard env vars (JAX_COORDINATOR_ADDRESS etc.) / TPU
    auto-detection; on single-process environments this is a no-op.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto_tpu = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi = explicit is not None or ("," in auto_tpu)
    if not multi:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_mesh(n_prim_shards: int = 1):
    """('rays',) or ('rays','prims') mesh over *all* processes' devices.

    Device order from jax.devices() groups by process, so contiguous
    blocks of the ray axis land on single hosts: ray sharding is pure DCN
    data-parallelism, and each host's chips subdivide rays over ICI.
    `n_prim_shards` > 1 carves the prim axis from within each host's
    chips (must divide the local device count).
    """
    n = len(jax.devices())
    if n % max(n_prim_shards, 1) != 0:
        raise ValueError(f"{n} devices not divisible by {n_prim_shards} prim shards")
    return make_mesh(
        n_ray_shards=n // n_prim_shards, n_prim_shards=n_prim_shards
    )
