"""Device-mesh construction.

The reference has no parallelism at all (serial emcee, single process —
SURVEY.md §5 "Distributed communication backend: none"). The TPU mapping
is a 2-D logical mesh:

- ``walkers`` axis — independent ensemble-walker lnprob evaluations
  (the data-parallel analogue); collectives: none within a batch, the
  stretch move gathers the complementary half ensemble (tiny, (W, D)).
- ``sources`` axis — the per-source ln-term reduction of the likelihood
  is summed with a ``psum`` (the sequence/tensor-parallel analogue for
  mega-catalogs).

Within a slice both axes ride ICI; multi-slice deployments should map
``walkers`` (infrequent small collectives) across DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

AXIS_WALKERS = "walkers"
AXIS_SOURCES = "sources"


def make_mesh(n_walkers: int = 0, n_sources: int = 1, devices=None) -> Mesh:
    """Build a (walkers, sources) mesh.

    ``n_walkers=0`` means "all remaining devices": with 8 devices and
    ``n_sources=2`` the mesh is 4x2.
    """
    devices = list(devices if devices is not None else jax.devices())
    ndev = len(devices)
    if n_walkers <= 0:
        n_walkers = max(1, ndev // max(1, n_sources))
    use = n_walkers * n_sources
    if use > ndev:
        raise ValueError(f"mesh {n_walkers}x{n_sources} needs {use} devices,"
                         f" have {ndev}")
    if use < ndev:
        import warnings
        warnings.warn(f"mesh {n_walkers}x{n_sources} uses {use} of "
                      f"{ndev} devices; {ndev - use} sit idle "
                      "(pick axis sizes whose product divides the "
                      "device count)", stacklevel=2)
    arr = np.array(devices[:use]).reshape(n_walkers, n_sources)
    return Mesh(arr, (AXIS_WALKERS, AXIS_SOURCES))
