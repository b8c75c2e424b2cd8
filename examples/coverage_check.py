"""Frequentist coverage check of the full inference pipeline.

Draws K independent synthetic catalogs from known truths (varied per
replicate), runs the complete fit on each, and reports how often the
central 68% / 95% posterior intervals cover the true parameters. A
correctly-implemented likelihood + sampler + quadrature stack gives
nominal coverage (binomial error ~ sqrt(p(1-p)/K)); biases in any layer
show up as under/over-coverage. Results recorded in docs/VALIDATION.md.

    python examples/coverage_check.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import numpy as np

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut

PARAMS = ["Lstar", "phistar", "sch_al"]
FREE = "--free" in sys.argv  # 9-parameter free-completeness model
PALLAS = "--pallas" in sys.argv  # validate the native-tier engine
MOVE = "mix" if "--mix" in sys.argv else "stretch"  # ensemble proposal
# --init-map: Laplace warm start + HALF the chain length — validates
# that the warm start stays calibrated even when the budget saved on
# burn-in is actually taken away from the run
INITMAP = "--init-map" in sys.argv


def one_replicate(k, rng):
    truth = dict(Lstar=rng.uniform(42.2, 42.8),
                 phistar=rng.uniform(-3.2, -2.2),
                 sch_al=rng.uniform(-1.8, -1.2))
    nsteps = 1500 if FREE else 600
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=not FREE,
                   quadrature="gauss", nwalkers=64, nsteps=nsteps,
                   seed=k, **truth)
    cat = apply_completeness_cut(
        make_catalog(cfg, n_target=1500, seed=1000 + k, lum_err_dex=0.0), cfg)
    truth = dict(truth)
    truth["phistar"] = cat["theta_true"]["phistar"]  # amplitude rescale
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    # pad the source axis to a fixed size so every replicate reuses ONE
    # compiled program (shapes are static under jit)
    from lumfuncmcmc_tpu.parallel.sharding import pad_sources
    ctx = pad_sources(ctx, 2048)
    layout = ThetaLayout.from_config(cfg)
    if PALLAS:
        from lumfuncmcmc_tpu.ops.pallas_lnlike import make_pallas_lnprob
        lnprob = make_pallas_lnprob(ctx, layout,
                                    interpret=jax.default_backend()
                                    != "tpu")
    else:
        lnprob = jax.vmap(make_lnprob(ctx, layout))
    if INITMAP:
        import jax.numpy as jnp
        from lumfuncmcmc_tpu.models.mapfit import laplace_fit
        lo, hi = layout.bounds_arrays()
        res = laplace_fit(make_lnprob(ctx, layout), lo, hi,
                          key=jax.random.PRNGKey(5 * k + 3), nstarts=4)
        u = sample_init(jax.random.PRNGKey(3 * k + 7), layout,
                        cfg.nwalkers)
        if res["hess_ok"] and not np.asarray(res["boundary"]).any():
            # boundary modes leave NaN rows in cov, which cholesky
            # silently propagates — same guard as _map_init_positions
            chol = np.linalg.cholesky(res["cov"])
            z = jax.random.normal(jax.random.PRNGKey(2 * k),
                                  (cfg.nwalkers, layout.ndim),
                                  dtype=lo.dtype)
            pos0 = (jnp.asarray(res["theta"], lo.dtype)[None, :]
                    + 2.0 * (z @ jnp.asarray(chol, lo.dtype).T))
            mid = (lo + hi) / 2.0
            pos0 = jnp.where((pos0 > lo) & (pos0 < hi), pos0,
                             0.8 * mid[None, :] + 0.2 * u)
        else:
            pos0 = u
    else:
        pos0 = sample_init(jax.random.PRNGKey(2 * k), layout,
                           cfg.nwalkers)
    _, chain, _, _ = run_stretch(lnprob, pos0,
                                 jax.random.PRNGKey(2 * k + 1),
                                 cfg.nsteps, move=MOVE)
    chain = np.asarray(chain)
    burn, _ = burnin_steps(chain, cfg.nsteps)
    post = chain[burn:].reshape(-1, layout.ndim)
    cover = {}
    # in the free model the completeness truths are the config values
    if FREE:
        for i in range(len(cfg.Flim)):
            truth[f"Flim_{i}"] = cfg.Flim[i]
        truth["alpha"] = cfg.alpha
    names = list(layout.names)
    for i, name in enumerate(names):
        lo68, hi68 = np.percentile(post[:, i], [16, 84])
        lo95, hi95 = np.percentile(post[:, i], [2.5, 97.5])
        cover[name] = (lo68 <= truth[name] <= hi68,
                       lo95 <= truth[name] <= hi95)
    return cover


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    K = int(args[0]) if args else 40
    rng = np.random.default_rng(7)
    params = PARAMS + ([f"Flim_{i}" for i in range(5)] + ["alpha"]
                       if FREE else [])
    hits68 = {p: 0 for p in params}
    hits95 = {p: 0 for p in params}
    t0 = time.time()
    for k in range(K):
        cover = one_replicate(k, rng)
        for p in params:
            hits68[p] += cover[p][0]
            hits95[p] += cover[p][1]
        done = {p: f"{hits68[p]}/{k + 1}" for p in params}
        print(f"replicate {k + 1}/{K}: 68% running coverage {done}",
              flush=True)
    dt = time.time() - t0
    print(f"\n=== coverage over {K} replicates ({dt:.0f}s) ===")
    err = np.sqrt(0.68 * 0.32 / K)
    for p in params:
        print(f"  {p:8s}: 68% interval covers {hits68[p] / K:.2f} "
              f"(nominal 0.68 +- {err:.2f}); "
              f"95% covers {hits95[p] / K:.2f} (nominal 0.95)")


if __name__ == "__main__":
    main()
