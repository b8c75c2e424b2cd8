"""Multi-process (multi-host) initialization — the DCN tier.

SURVEY.md §5 prescribes ``jax.distributed.initialize()`` + DCN-aware mesh
placement as the framework's distributed communication backend (the
reference is a single serial process). Single-process multi-device
sharding lives in :mod:`lumfuncmcmc_tpu.parallel.mesh`; this module adds
the multi-process entry so the same code runs across hosts:

- each process calls :func:`init_distributed` before any other JAX use;
- ``jax.devices()`` then returns the GLOBAL device list, ordered by
  process, so :func:`~lumfuncmcmc_tpu.parallel.mesh.make_mesh` with the
  walker axis leading automatically places *walkers across hosts* (rare,
  tiny collectives ride DCN) and *sources within a host* (the per-eval
  ``psum`` rides ICI) — the placement SURVEY.md §5 calls for;
- :func:`smoke_check` exercises a cross-process all-gather and a
  ``psum`` over a global-mesh ``shard_map`` — the 2-process CPU test in
  ``tests/test_distributed.py`` drives it end to end.

Validated on multi-process CPU (the test suite); real multi-host TPU
pods are not reachable from this environment, so that path is untested
but follows the standard JAX multi-controller recipe.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int,
                     local_device_count: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime for this process.

    ``coordinator``: "host:port" of process 0. On CPU backends,
    ``local_device_count`` forces N virtual devices per process (must be
    set before any backend initialization).
    """
    import jax

    if local_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={local_device_count}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
        else:
            # always regex-replace: a substring test would skip the
            # update when the wanted count is a string prefix of the
            # existing one (want "=2" inside existing "=24")
            import re
            os.environ["XLA_FLAGS"] = re.sub(
                r"--xla_force_host_platform_device_count=\d+", want,
                flags)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )


def parse_distributed_spec(spec: str):
    """Parse the CLI spec ``host:port,num_processes,process_id``."""
    try:
        coord, nproc, pid = spec.rsplit(",", 2)
        return coord, int(nproc), int(pid)
    except ValueError as e:
        raise ValueError(
            f"--distributed expects 'host:port,num_processes,process_id',"
            f" got {spec!r}") from e


def is_primary() -> bool:
    """True on the process that should write artifacts (process 0)."""
    import jax
    return jax.process_index() == 0


def to_host(x):
    """Fetch a (possibly cross-process-sharded) array to host numpy.

    Single-process arrays (and anything fully addressable) go through
    ``np.asarray`` unchanged. Global arrays whose shards live on other
    processes are allgathered first — a COLLECTIVE: every process in
    the job must call this on the same array in the same order (true
    for the sampler driver, which runs the identical program
    everywhere)."""
    import numpy as np
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x,
                                                            tiled=True))
    return np.asarray(x)


def smoke_check() -> dict:
    """Cross-process sanity: all-gather the process ids and psum a
    walker-sharded vector over a global mesh. Returns a dict of facts
    (asserted by the 2-process CPU test)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from lumfuncmcmc_tpu.parallel.mesh import AXIS_WALKERS, make_mesh

    pids = np.asarray(multihost_utils.process_allgather(
        jnp.asarray([jax.process_index()])))
    mesh = make_mesh(jax.device_count(), 1)
    local = np.ones((len(mesh.local_devices),), dtype=np.float32)
    global_x = multihost_utils.host_local_array_to_global_array(
        local, mesh, P(AXIS_WALKERS))
    total = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(jnp.sum(x), AXIS_WALKERS),
            mesh=mesh, in_specs=P(AXIS_WALKERS), out_specs=P()),
    )(global_x)
    return {
        "process_index": int(jax.process_index()),
        "process_count": int(jax.process_count()),
        "device_count": int(jax.device_count()),
        "local_device_count": int(jax.local_device_count()),
        "gathered_pids": sorted(int(p) for p in pids.ravel()),
        "psum_total": float(np.asarray(total)),
    }
