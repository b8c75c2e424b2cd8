"""Samplers: pure-JAX affine-invariant ensemble + gradient-based NUTS."""

from lumfuncmcmc_tpu.samplers.affine import run_stretch  # noqa: F401
from lumfuncmcmc_tpu.samplers.diagnostics import (  # noqa: F401
    integrated_autocorr_time, effective_sample_size, gelman_rubin,
    rank_normalized_rhat,
    burnin_steps,
)
