"""Simulation-based calibration (SBC; Talts et al. 2018).

The strongest end-to-end Bayesian validation this framework runs: draw
theta* from the prior, generate a catalog from it, fit with the SAME
prior, and rank theta*_d among M approximately-independent posterior
draws. If likelihood + quadrature + sampler + priors are all correct,
the rank of the truth is uniform on {0..M} by construction — ANY
systematic bias shows as a non-uniform rank histogram (U-shape =
posterior too narrow, hump = too wide, slope = location bias).

Complements examples/coverage_check.py (frequentist interval coverage):
SBC tests the full shape of the posterior, not just two quantiles, and
its uniformity guarantee is exact rather than asymptotic.

Validity requirements handled here:
- the GENERATING prior equals the FITTING prior (the cfg *_lims box is
  set to the draw box — a mismatch voids the uniformity theorem), so
  catalogs keep their physical normalization (no n_target rescale,
  which would silently change the phistar the posterior estimates);
- ranks use M=7 posterior draws taken from distinct walkers at steps
  >= 2*tau apart (approximate independence; Talts et al. section 5.1
  thinning prescription).

    python examples/sbc_check.py [K]        # default 48 replicates,
                                            # ~5-10 min on CPU

Fixed-completeness model: the collapsed O(1) ln-term makes the fit
cost independent of the (2k-16k source) physical catalog sizes the
prior box produces.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# pin CPU BEFORE any backend touch: this is an f64 validation harness,
# and merely asking for the default backend would initialize the
# remote-TPU tunnel first on the deployment box
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import numpy as np

from lumfuncmcmc_tpu.utils.calibration import (
    PARAMS, SBC_BOX, sbc_replicate)

M = 7                     # posterior draws per rank -> M+1 rank bins


def one_replicate(k, rng):
    ranks, _cover, nsrc, tau = sbc_replicate(k, rng, M=M)
    return ranks, nsrc, tau


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rng = np.random.default_rng(7)
    t0 = time.time()
    all_ranks = np.empty((K, len(PARAMS)), dtype=int)
    for k in range(K):
        all_ranks[k], nsrc, tau = one_replicate(k, rng)
        print(f"  replicate {k + 1:3d}/{K}: N={nsrc}, tau={tau:.1f}, "
              f"ranks={all_ranks[k]}")
    print(f"\n{K} replicates in {time.time() - t0:.0f} s")

    expected = K / (M + 1)
    print(f"rank histograms over {{0..{M}}} "
          f"(expected {expected:.1f} per bin):")
    for d, nm in enumerate(PARAMS):
        counts = np.bincount(all_ranks[:, d], minlength=M + 1)
        chi2 = float(((counts - expected) ** 2 / expected).sum())
        # chi2 with M dof: mean M, sd sqrt(2M); flag > mean + 3 sd
        flag = "" if chi2 < M + 3 * np.sqrt(2 * M) else "  <-- CHECK"
        print(f"  {nm:8s} {counts}  chi2={chi2:.1f} "
              f"(dof {M}){flag}")


if __name__ == "__main__":
    main()
