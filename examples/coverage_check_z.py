"""Frequentist coverage of the redshift-evolving (3-pivot) model.

Catalogs are drawn from a NON-evolving Schechter process, so the true
value of every L* pivot is the generating Lstar and of every phi* pivot
the (amplitude-rescaled) phistar — the quadratic evolution model must
recover flat evolution with nominal interval coverage.

    python examples/coverage_check_z.py [K]
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
from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ, make_lnprob_z
from lumfuncmcmc_tpu.parallel.sharding import pad_sources
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut


NATURAL = "--natural" in sys.argv


def one_replicate(k, rng):
    truth = dict(Lstar=rng.uniform(42.2, 42.8),
                 phistar=rng.uniform(-3.2, -2.2),
                 sch_al=rng.uniform(-1.8, -1.2))
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, quadrature="gauss",
                   nwalkers=64, nsteps=1500, seed=k,
                   z_param="natural" if NATURAL else "pivots", **truth)
    cat = apply_completeness_cut(
        make_catalog(cfg, n_target=1500, seed=2000 + k, lum_err_dex=0.0), cfg)
    phistar_eff = cat["theta_true"]["phistar"]
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    ctx = pad_sources(ctx, 2048)   # fixed shapes -> one compiled program
    layout = ThetaLayoutZ.from_config(cfg)
    lnprob = jax.vmap(make_lnprob_z(ctx, layout))
    lo, hi = layout.bounds_arrays()
    import jax.numpy as jnp
    u = jax.random.uniform(jax.random.PRNGKey(2 * k),
                           (cfg.nwalkers, layout.ndim), dtype=lo.dtype)
    pos0 = u * (hi - lo) + lo
    _, chain, _, _ = run_stretch(lnprob, pos0,
                                 jax.random.PRNGKey(2 * k + 1),
                                 cfg.nsteps)
    chain = np.asarray(chain)
    burn, _ = burnin_steps(chain, cfg.nsteps)
    post = chain[burn:].reshape(-1, layout.ndim)
    if NATURAL:
        truths = [truth["Lstar"], 0.0, 0.0, phistar_eff, 0.0, 0.0,
                  truth["sch_al"]]
    else:
        truths = ([truth["Lstar"]] * 3 + [phistar_eff] * 3
                  + [truth["sch_al"]])
    cover = {}
    for i, name in enumerate(layout.names):
        lo68, hi68 = np.percentile(post[:, i], [16, 84])
        lo95, hi95 = np.percentile(post[:, i], [2.5, 97.5])
        cover[name] = (lo68 <= truths[i] <= hi68,
                       lo95 <= truths[i] <= hi95)
    return cover, list(layout.names)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    K = int(args[0]) if args else 30
    rng = np.random.default_rng(11)
    hits68 = hits95 = None
    t0 = time.time()
    for k in range(K):
        cover, names = one_replicate(k, rng)
        if hits68 is None:
            hits68 = {p: 0 for p in names}
            hits95 = {p: 0 for p in names}
        for p in names:
            hits68[p] += cover[p][0]
            hits95[p] += cover[p][1]
        print(f"replicate {k + 1}/{K}: "
              f"{ {p: hits68[p] for p in names} }", flush=True)
    print(f"\n=== z-model coverage over {K} replicates "
          f"({time.time() - t0:.0f}s) ===")
    for p in names:
        print(f"  {p:8s}: 68% covers {hits68[p] / K:.2f} "
              f"(nominal 0.68); 95% covers {hits95[p] / K:.2f}")


if __name__ == "__main__":
    main()
