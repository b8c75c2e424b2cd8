"""Device-mesh parallelism: walker sharding (DP analogue) and source
sharding (the framework's sequence-parallel analogue)."""

from lumfuncmcmc_tpu.parallel.mesh import make_mesh  # noqa: F401
from lumfuncmcmc_tpu.parallel.sharding import (  # noqa: F401
    make_lnprob_sharded, pad_sources,
)
