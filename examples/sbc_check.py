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

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.utils.synth import apply_completeness_cut, make_catalog

PARAMS = ["Lstar", "phistar", "sch_al"]
# prior == generating box (load-bearing for the uniformity theorem)
BOX = {"Lstar_lims": (42.3, 42.7), "phistar_lims": (-2.9, -2.3),
       "sch_al_lims": (-1.8, -1.4)}
M = 7                     # posterior draws per rank -> M+1 rank bins


def one_replicate(k, rng):
    truth = {nm: rng.uniform(*BOX[nm + "_lims"]) for nm in PARAMS}
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   nwalkers=64, nsteps=600, seed=k, **BOX, **truth)
    cat = apply_completeness_cut(
        make_catalog(cfg, n_target=None, seed=1000 + k,
                     lum_err_dex=0.0), cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    lnprob = jax.vmap(make_lnprob(ctx, layout))
    pos0 = sample_init(jax.random.PRNGKey(2000 + k), layout, 64)
    _, chain, _, _ = run_stretch(lnprob, pos0,
                                 jax.random.PRNGKey(3000 + k), 600)
    chain = np.asarray(chain)
    burn, tau = burnin_steps(chain, 600)
    post = chain[burn:]

    # M draws from distinct walkers, steps ~2*tau apart but capped so
    # they NEVER wrap onto the same step (post is already burn-sliced;
    # same-step draws from an interacting ensemble are strongly
    # correlated and would bias the rank histogram)
    gap = max(min(int(2 * tau), post.shape[0] // M), 1)
    steps = gap * np.arange(M)
    assert steps[-1] < post.shape[0]
    walkers = rng.choice(chain.shape[1], size=M, replace=False)
    draws = post[steps, walkers]                          # (M, ndim)

    tvec = np.asarray([truth[nm] for nm in PARAMS])
    ranks = (draws < tvec[None, :]).sum(axis=0)           # (ndim,)
    return ranks, len(cat["z"]), tau


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
