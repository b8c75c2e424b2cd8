"""MAP point estimation + Laplace approximation (new capability).

The reference has no gradient surface, so its only "point estimate" is
the posterior median of an MCMC run. This framework's likelihoods are
jax-differentiable end to end (the property NUTS already exploits), so
a multi-start BFGS in an unconstrained reparameterization gives the
posterior mode in milliseconds-to-seconds, and the Hessian at the mode
gives

- asymptotic standard errors (the Laplace covariance ``-H^{-1}``), and
- a third, independent marginal-likelihood estimator
  ``ln Z ~ lnpost(MAP) + d/2 ln 2pi - 1/2 ln det(-H) + ln pi_norm``
  that cross-checks the tempered ladder's stepping-stone/TI numbers
  (:mod:`~lumfuncmcmc_tpu.samplers.tempering`) wherever the posterior
  is unimodal and roughly Gaussian.

TPU mapping: the whole multi-start BFGS is ONE jitted
``vmap(minimize)`` program (``jax.scipy.optimize.minimize`` lowers to a
``while_loop``), so a remote-device run pays a single dispatch — not a
host optimization loop (the ``schfit.py`` remote-device trap does not
apply). The Hessian is one ``jax.hessian`` call at the mode.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def laplace_fit(lnpost, lo, hi, key=None, nstarts: int = 8,
                maxiter: int = 500, gtol: float = 1e-6,
                restarts: int = 3):
    """Maximize ``lnpost`` over the box ``[lo, hi]`` and Laplace-expand.

    The box constraint is removed by ``theta = lo + (hi-lo)*sigmoid(y)``
    and BFGS runs on ``-lnpost(theta(y))`` — NOT on the y-space density
    (no Jacobian term: the optimum must be the theta-space mode, unlike
    NUTS' ``make_unconstrained`` which needs the volume correction).
    ``nstarts`` center-shrunk uniform starts run as one vmapped
    minimize; the best finite optimum wins.

    Returns a dict: ``theta`` (MAP), ``lnpost``, ``grad_norm``, ``cov``
    / ``se`` (Laplace; NaN entries for ``boundary`` directions — a
    posterior monotone toward a prior-box edge pins the MAP there, the
    pinned axes are profiled out and the interior block keeps honest
    errors; None when even the interior block is not negative
    definite), ``ln_int`` = ``ln integral exp(lnpost) dtheta`` under
    the Gaussian expansion (None for boundary modes — edge mass is not
    Gaussian), ``hess_ok``, ``boundary`` (bool per dim), ``converged``
    (BFGS's own gradient criterion on the winning start),
    ``n_finite`` (starts that found a finite optimum).
    """
    from jax.scipy.optimize import minimize

    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    d = int(lo.shape[0])
    dt = lo.dtype
    if key is None:
        key = jax.random.PRNGKey(0)

    span = hi - lo

    def to_theta(y):
        return lo + span * jax.nn.sigmoid(y)

    def to_y(theta):
        p = jnp.clip((theta - lo) / span, 1e-6, 1.0 - 1e-6)
        return jnp.log(p) - jnp.log1p(-p)

    def obj(y, sc):
        return -lnpost(to_theta(y)) / sc

    u = jax.random.uniform(key, (nstarts, d), dtype=dt)
    mid = (lo + hi) / 2.0
    starts = 0.8 * mid[None, :] + 0.2 * (lo[None, :] + u * span[None, :])
    y0 = jax.vmap(to_y)(starts)

    @jax.jit
    def solve(y0_batch):
        def one(y):
            # scale the objective to O(1): |lnpost| is O(1e4) on real
            # catalogs and the unscaled magnitude breaks BFGS's line
            # search mid-valley (measured: 2/4 starts stalled at
            # |grad| ~ 1e3). RESTARTS reset the Hessian approximation
            # and rescue both stalled line searches and the sigmoid
            # saturation trap, where a start that dives toward a box
            # corner sees vanishing y-space gradients (d theta/d y ->
            # 0) and "converges" at the corner; with scale + restarts
            # every probed start reaches the true mode.
            sc = jnp.maximum(1.0, jnp.abs(lnpost(to_theta(y))))

            def restart(_, carry):
                yy, ff, ok = carry
                res = minimize(obj, yy, args=(sc,), method="BFGS",
                               options={"maxiter": maxiter,
                                        "gtol": gtol})
                # keep the new iterate only where it IMPROVES: a
                # restart whose line search fails can end at a worse
                # point than an earlier restart's optimum, and the
                # best-so-far must not be discarded (nan/inf res.fun
                # compares False and is rejected) — ADVICE r3
                better = res.fun < ff
                return (jnp.where(better, res.x, yy),
                        jnp.where(better, res.fun, ff),
                        jnp.where(better, res.success, ok))

            # fori_loop, not an unrolled Python loop: the minimize
            # body is large and would otherwise trace `restarts` times
            # (the dev-notes long-loops-inside-jit rule)
            y, f, ok = jax.lax.fori_loop(
                0, max(int(restarts), 1), restart,
                (y, jnp.asarray(jnp.inf, dt), jnp.asarray(False)))
            return y, f * sc, ok, sc
        return jax.vmap(one)(y0_batch)

    ys, funs, succ, scales = solve(y0)
    funs = np.asarray(funs, dtype=np.float64)
    funs_rank = np.where(np.isfinite(funs), funs, np.inf)
    n_finite = int(np.isfinite(funs).sum())
    if n_finite == 0:
        raise RuntimeError(
            "laplace_fit: no start converged to a finite optimum — "
            "the posterior may have no interior mode in the box")
    best = int(np.argmin(funs_rank))
    theta = to_theta(ys[best])
    # BFGS's success flag is pessimistic (a failed final line search
    # reports False even at |grad| ~ 1e-8); convergence is defined by
    # BFGS's own gradient criterion on the winning start, in the same
    # scaled units the solver used
    g_y = np.asarray(jax.grad(
        lambda y: -lnpost(to_theta(y)))(ys[best]), dtype=np.float64)
    # the solver's own per-start scale, not |lnpost(mode)| — the check
    # must mirror the criterion BFGS actually ran under
    sc_best = float(np.asarray(scales)[best])
    converged = bool(np.asarray(succ)[best]) or bool(
        np.max(np.abs(g_y)) / sc_best <= 10.0 * gtol)

    g = jax.grad(lnpost)(theta)
    H = jax.hessian(lnpost)(theta)
    negH = np.asarray(-0.5 * (H + H.T), dtype=np.float64)
    th = np.asarray(theta, dtype=np.float64)
    lo_np = np.asarray(lo, dtype=np.float64)
    hi_np = np.asarray(hi, dtype=np.float64)
    span_np = hi_np - lo_np
    # BOUNDARY modes: a posterior monotone in some direction pins the
    # MAP to the prior box edge — the full Laplace expansion is then
    # invalid (near-zero/negative curvature along the pinned axis),
    # but the interior block still carries honest standard errors.
    # Profile the pinned directions out instead of returning nothing.
    boundary = ((th - lo_np < 1e-4 * span_np)
                | (hi_np - th < 1e-4 * span_np))
    free = ~boundary
    sub = negH[np.ix_(free, free)]
    eigval, eigvec = (np.linalg.eigh(sub) if free.any()
                      else (np.empty(0), np.empty((0, 0))))
    hess_ok = bool(free.any() and np.all(eigval > 0)
                   and np.all(np.isfinite(eigval)))
    lnpost_map = float(lnpost(theta))
    if hess_ok:
        cov_sub = (eigvec / eigval) @ eigvec.T
        cov = np.full((d, d), np.nan)
        cov[np.ix_(free, free)] = cov_sub
        se = np.full(d, np.nan)
        se[free] = np.sqrt(np.diag(cov_sub))
        if boundary.any():
            # half-space mass at the edge is not Gaussian: no ln_int
            ln_int = None
        else:
            ln_int = (lnpost_map + 0.5 * d * math.log(2.0 * math.pi)
                      - 0.5 * float(np.sum(np.log(eigval))))
    else:
        cov = se = ln_int = None
    return {
        "theta": th,
        "lnpost": lnpost_map,
        "grad_norm": float(jnp.linalg.norm(g)),
        "cov": cov,
        "se": se,
        "ln_int": ln_int,
        "hess_eigvals": np.asarray(eigval, dtype=np.float64),
        "hess_ok": hess_ok,
        "boundary": boundary,
        "converged": converged,
        "n_finite": n_finite,
        "nstarts": int(nstarts),
    }
