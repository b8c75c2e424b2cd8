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

from lumfuncmcmc_tpu.utils.calibration import (
    PARAMS as _P, coverage_replicate)

PARAMS = list(_P)
FREE = "--free" in sys.argv  # 9-parameter free-completeness model
PALLAS = "--pallas" in sys.argv  # validate the native-tier engine
MOVE = "mix" if "--mix" in sys.argv else "stretch"  # ensemble proposal
# --init-map: Laplace warm start + HALF the chain length — validates
# that the warm start stays calibrated even when the budget saved on
# burn-in is actually taken away from the run
INITMAP = "--init-map" in sys.argv


def one_replicate(k, rng):
    return coverage_replicate(k, rng, free=FREE, pallas=PALLAS,
                              move=MOVE, init_map=INITMAP)


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
