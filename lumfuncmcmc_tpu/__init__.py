"""lumfuncmcmc_tpu — TPU-native galaxy luminosity-function inference.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
LumFuncMCMC code (Astropianist/LumFuncMCMC): Bayesian fitting of Schechter
luminosity functions — optionally with jointly-fit Fleming completeness
parameters per survey field, or with quadratic redshift evolution of
(L*, phi*) — from multi-field emission-line catalogs, via an
inhomogeneous-Poisson point-process likelihood, plus a classical 1/V_eff
binned estimator with bootstrap errors as a cross-check.

Architecture (TPU-first, not a port):

- All math kernels are pure jittable JAX functions operating in log-space
  (float32-safe on TPU; float64 parity path on CPU).
- The scipy-spline precompute caches of the reference become a single
  immutable pytree (`LFContext`) of dense interpolation tables built once
  on the host in float64.
- The emcee ensemble sampler is replaced by a pure-JAX affine-invariant
  stretch-move sampler (`samplers.affine`) with all walkers advanced in
  parallel under `lax.scan`, walker batches sharded over a device mesh,
  plus a gradient-based NUTS sampler (new capability) via autodiff of the
  same likelihood.
- The hot likelihood reduction has a fused Pallas TPU kernel
  (`ops.pallas_lnlike`) as an alternative to the pure-XLA path.

See SURVEY.md at the repo root for the component-by-component mapping to
the reference implementation.
"""

__version__ = "0.1.0"

from lumfuncmcmc_tpu.config import LFConfig  # noqa: F401
