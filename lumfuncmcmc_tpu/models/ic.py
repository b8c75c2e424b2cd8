"""Predictive information criteria: WAIC and PSIS-LOO (new capability).

The reference offers no model-comparison machinery beyond eyeballing
overlaid fits; the tempered-evidence ladder
(:mod:`~lumfuncmcmc_tpu.samplers.tempering`) gives fully Bayesian
marginal likelihoods but costs a dedicated multi-rung run. WAIC and
PSIS-LOO (Watanabe 2010; Vehtari, Gelman & Gabry 2017) estimate
out-of-sample predictive accuracy from the SAME posterior draws a fit
already produced — no extra sampling.

Pointwise decomposition of the Poisson point process
----------------------------------------------------

The likelihood (``likelihood.py``; reference ``lumfuncmcmc.py:360-393``)
is an inhomogeneous Poisson process with rate density
``lambda(x) = phi(L) * Omega(L, z)`` and total intensity
``Lam(theta) = integral lambda``. Conditioning on the observed count N
factorizes it into N iid per-source densities — the standard
exchangeable decomposition for point-process IC:

    ln p(x_i | theta, N) = ln lambda(x_i) - ln Lam(theta)
    ln L(theta) = sum_i ln p(x_i | theta, N) + [N ln Lam - Lam]

The bracketed count term is the Poisson probability of observing N
sources at all; it is reported separately (``count_*``) and added into
``elpd_waic_total`` so full-likelihood comparisons remain possible,
while the headline ``elpd_waic`` / ``elpd_loo`` are the conditional
(per-source) quantities that leave-one-out actually makes sense for.
The decomposition is exact: ``max_abs_recon_err`` checks
``sum_i ln p_i + N ln Lam - Lam == lnlike`` per draw at float precision.

All four model families are supported through the same layout dispatch
as :mod:`~lumfuncmcmc_tpu.models.ppc` (the hierarchical hyperprior is a
prior term, not likelihood — excluded, consistent with the tempering
split in ``hierarchical.lnlike_h_split``).

TPU mapping: the (draws x sources) log-likelihood matrix is evaluated
in source chunks of static shape (one jit compile), each chunk batched
over draws with ``lax.map(batch_size=...)`` so device memory stays
bounded at (batch x chunk) regardless of catalog or chain size; the
PSIS tail fits run on host, vectorized across all sources in a chunk
at once (no per-source Python loop).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from lumfuncmcmc_tpu.models.context import LFContext
from lumfuncmcmc_tpu.models.hierarchical import ThetaLayoutH
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, lnlike_exact_bounds_parts, lnlike_single_epoch_parts)
from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ, lnlike_z_parts
from lumfuncmcmc_tpu.ops.omega import omega_from_logf
from lumfuncmcmc_tpu.ops.schechter import (
    LN10, log_schechter_z, log_true_lum_func)


# ---------------------------------------------------------------------------
# pointwise ln lambda(x_i) and total intensity Lam(theta)
# ---------------------------------------------------------------------------

def _parts_h(theta, ctx: LFContext, layout: ThetaLayoutH):
    """(lnpart, fullint) for the hierarchical DATA term (no hyperprior).

    ``lnlike_h_split`` returns the already-differenced sum; the IC
    reconstruction needs the two pieces separately.
    """
    _, _, _, _, sch_al, lstar_f, phistar_f = layout.unpack(theta)
    dt = theta.dtype
    log_ln10 = jnp.log(jnp.asarray(LN10, dt))
    lnpart_f = (ctx.nsrc_f * (log_ln10 + LN10 * phistar_f)
                + LN10 * (sch_al + 1.0)
                * (ctx.sum_lum_f - ctx.nsrc_f * lstar_f)
                - jnp.exp(LN10 * (ctx.lref - lstar_f)) * ctx.sum_pow_lum_f
                + ctx.sum_ln_om_f)
    lnphi_grid = log_true_lum_func(
        ctx.logL_grid, sch_al, lstar_f[:, None, None],
        phistar_f[:, None, None])
    int_f = jnp.sum(jnp.exp(lnphi_grid) * ctx.w_fixed, axis=(1, 2))
    return jnp.sum(lnpart_f), jnp.sum(int_f)


def make_pointwise_fns(ctx: LFContext, layout, exact_bounds: bool = False,
                       min_comp_frac: float = 0.5, lh: float = 46.0):
    """Build ``(loglam_chunk, parts)`` for the layout's model family.

    ``loglam_chunk(theta, lum, z, lnom, logf, om0, fid) -> (C,)`` is the
    per-source ``ln lambda`` on an arbitrary slice of catalog columns
    (so the driver can chunk sources without rebuilding the context);
    ``parts(theta) -> (lnpart, fullint)`` is the likelihood's own split,
    reused for ``Lam`` and the exactness check.
    """
    if isinstance(layout, ThetaLayoutZ):
        def loglam_chunk(theta, lum, z, lnom, logf, om0, fid):
            L1, L2, L3, p1, p2, p3, al = layout.unpack(theta)
            lnphi = log_schechter_z(lum, z, al, L1, L2, L3, p1, p2, p3,
                                    layout.z1, layout.z2, layout.z3)
            return lnphi + lnom

        def parts(theta):
            return lnlike_z_parts(theta, ctx, layout)
        return loglam_chunk, parts

    if isinstance(layout, ThetaLayoutH):
        def loglam_chunk(theta, lum, z, lnom, logf, om0, fid):
            _, _, _, _, sch_al, lstar_f, phistar_f = layout.unpack(theta)
            lnphi = log_true_lum_func(lum, sch_al, lstar_f[fid],
                                      phistar_f[fid])
            return lnphi + lnom

        def parts(theta):
            return _parts_h(theta, ctx, layout)
        return loglam_chunk, parts

    if not isinstance(layout, ThetaLayout):
        raise TypeError(f"unknown layout type {type(layout)!r}")

    if exact_bounds:
        if layout.fix_comp:
            raise ValueError("exact_bounds applies to free completeness "
                             "only")
        lum_floor = float(jnp.min(ctx.lum))   # same floor as make_lnprob

        def parts(theta):
            return lnlike_exact_bounds_parts(theta, ctx, layout,
                                             min_comp_frac, lum_floor, lh)
    else:
        def parts(theta):
            return lnlike_single_epoch_parts(theta, ctx, layout)

    if layout.fix_comp:
        def loglam_chunk(theta, lum, z, lnom, logf, om0, fid):
            lstar, phistar, sch_al, _, _ = layout.unpack(theta)
            return log_true_lum_func(lum, sch_al, lstar, phistar) + lnom
    else:
        def loglam_chunk(theta, lum, z, lnom, logf, om0, fid):
            lstar, phistar, sch_al, logf50, alpha_c = layout.unpack(theta)
            om = omega_from_logf(logf, om0, logf50[fid], alpha_c,
                                 layout.fcmin)
            lnphi = log_true_lum_func(lum, sch_al, lstar, phistar)
            return lnphi + jnp.log(om)
    return loglam_chunk, parts


# ---------------------------------------------------------------------------
# generalized-Pareto tail fit (Zhang & Stephens 2009), vectorized
# ---------------------------------------------------------------------------

def gpd_fit_tail(x):
    """Fit GPD(xi, sigma) to exceedances, vectorized over rows.

    ``x``: (C, M) exceedances over the tail threshold, each row sorted
    ascending, all positive (zeros from ties allowed). Returns
    ``(xi, sigma)`` of shape (C,) using the Zhang & Stephens (2009)
    weighted-profile estimator with the Vehtari et al. (2021, app. C)
    weak prior shrinking xi toward 0.5 — the same estimator arviz/loo
    use, independently implemented from the papers' equations
    (standard sign convention: xi > 0 is heavy-tailed).

    Rows whose exceedances carry no information (zero spread or a
    non-positive quartile) return ``xi = inf`` — callers skip
    smoothing for those.
    """
    x = np.asarray(x, dtype=np.float64)
    C, n = x.shape
    # the (rows, m, n) profile tensor is the memory hot spot: block rows
    # so it stays ~25 MB regardless of the caller's source-chunk size
    blk = max(1, int(3.2e6 // max(n * (30 + int(math.sqrt(n))), 1)))
    if C > blk:
        parts = [gpd_fit_tail(x[i:i + blk]) for i in range(0, C, blk)]
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))
    xn = x[:, -1]
    xq = x[:, max(int(n / 4 + 0.5) - 1, 0)]
    ok = (xn > 0) & (xq > 0) & (xn > x[:, 0] + 1e-290)

    m = 30 + int(math.sqrt(n))
    j = np.arange(1, m + 1, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        # theta grid per row; every theta satisfies 1 + theta*x > 0
        # because (1 - sqrt(m/(j-1/2))) <= 0 for j <= m - 1/2
        safe_xn = np.where(ok, xn, 1.0)
        safe_xq = np.where(ok, xq, 1.0)
        theta = (-1.0 / safe_xn[:, None]
                 + (np.sqrt(m / (j - 0.5)) - 1.0)[None, :]
                 / (3.0 * safe_xq[:, None]))            # (C, m), = -b_ZS
        # xi(theta) = mean_i log1p(theta * x_i); profile log-likelihood
        # l(theta) = n * (log(theta/xi) - xi - 1)
        xi_j = np.mean(np.log1p(theta[:, :, None] * x[:, None, :]),
                       axis=2)                           # (C, m)
        lprof = n * (np.log(theta / xi_j) - xi_j - 1.0)
        lprof = np.where(np.isfinite(lprof), lprof, -np.inf)
        lmax = lprof.max(axis=1, keepdims=True)
        w = np.exp(lprof - lmax)
        w /= w.sum(axis=1, keepdims=True)
        theta_hat = np.sum(w * theta, axis=1)            # (C,)
        xi = np.mean(np.log1p(theta_hat[:, None] * x), axis=1)
        sigma = xi / theta_hat
        # weak prior: shrink xi toward 1/2 (Vehtari et al. 2021)
        xi = (n * xi + 5.0) / (n + 10.0)
    return np.where(ok, xi, np.inf), np.where(ok, sigma, np.nan)


def _gpd_quantiles(p, xi, sigma):
    """GPD inverse CDF, broadcasting (M,) probs against (C,) params."""
    with np.errstate(over="ignore", invalid="ignore"):
        near0 = np.abs(xi) < 1e-12
        safe = np.where(near0, 1.0, xi)
        q = sigma * np.where(near0[None, :],
                             -np.log1p(-p[:, None]),
                             np.expm1(-safe[None, :]
                                      * np.log1p(-p[:, None])) / safe)
    return q


def psis_smooth(loglik):
    """Pareto-smoothed importance weights for LOO.

    ``loglik``: (S, C) pointwise log-likelihood columns. Returns
    ``(logw, k)`` — smoothed, max-normalized log importance weights of
    the same shape and the per-column Pareto shape diagnostic
    (Vehtari, Simpson & Gelman 2015: k < 0.7 reliable).
    """
    ll = np.asarray(loglik, dtype=np.float64)
    S, C = ll.shape
    lr = -ll
    lr = lr - lr.max(axis=0, keepdims=True)
    M = int(np.ceil(min(0.2 * S, 3.0 * math.sqrt(S))))
    if M < 5:
        return lr, np.full(C, np.inf)

    order = np.argsort(lr, axis=0)
    srt = np.take_along_axis(lr, order, axis=0)
    cutoff = np.exp(srt[S - M - 1])                     # (C,)
    tail = srt[S - M:]                                  # (M, C) ascending
    x = np.exp(tail) - cutoff[None, :]
    xi, sigma = gpd_fit_tail(np.ascontiguousarray(x.T))
    usable = np.isfinite(xi) & (sigma > 0)
    p = (np.arange(1, M + 1, dtype=np.float64) - 0.5) / M
    q = _gpd_quantiles(p, np.where(usable, xi, 0.0),
                       np.where(usable, sigma, 1.0))
    smoothed = np.log(np.maximum(q + cutoff[None, :], 1e-300))
    tail = np.where(usable[None, :], np.minimum(smoothed, 0.0), tail)
    srt[S - M:] = tail
    logw = np.empty_like(lr)
    np.put_along_axis(logw, order, srt, axis=0)
    return logw, np.where(usable, xi, np.inf)


def _logsumexp0(a):
    """logsumexp over axis 0 (scipy-free; loglik rows are finite)."""
    amax = a.max(axis=0, keepdims=True)
    return (np.log(np.sum(np.exp(a - amax), axis=0))
            + amax[0])


def waic_from_loglik(loglik):
    """Per-observation WAIC pieces from an (S, C) log-lik block:
    ``(lppd_i, p_i, elpd_i)``, each (C,). Variance uses ddof=1."""
    ll = np.asarray(loglik, dtype=np.float64)
    lppd = _logsumexp0(ll) - math.log(ll.shape[0])
    p = (ll.var(axis=0, ddof=1) if ll.shape[0] > 1
         else np.zeros(ll.shape[1]))
    return lppd, p, lppd - p


def loo_from_loglik(loglik):
    """Per-observation PSIS-LOO elpd and Pareto k from an (S, C) block."""
    ll = np.asarray(loglik, dtype=np.float64)
    logw, k = psis_smooth(ll)
    elpd = _logsumexp0(ll + logw) - _logsumexp0(logw)
    return elpd, k


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _batched_map(fn, thetas, batch: int):
    return jax.lax.map(fn, thetas, batch_size=min(batch,
                                                  thetas.shape[0]))


def information_criteria(samples, ctx: LFContext, layout,
                         exact_bounds: bool = False,
                         min_comp_frac: float = 0.5, lh: float = 46.0,
                         ndraws: int = 1000, seed: int = 0,
                         chunk: int = 8192, theta_batch: int = 64,
                         return_pointwise: bool = False):
    """WAIC + PSIS-LOO from posterior draws.

    ``samples``: flat posterior array (n, ndim [+ lnp column — extra
    columns ignored]), as produced by ``fit_model``/``select_samples``.
    ``ndraws`` posterior draws are subsampled without replacement
    (all, if the chain is shorter). ``chunk``/``theta_batch`` bound
    device memory at roughly ``theta_batch x chunk`` elements.

    Returns a dict: conditional ``elpd_waic/p_waic/se_waic`` and
    ``elpd_loo/p_loo/se_loo``, Pareto-k diagnostics (``k_max``,
    ``frac_k_gt_07``), the Poisson count term (``count_lppd``,
    ``count_p``, ``elpd_waic_total``), and ``max_abs_recon_err`` — the
    worst per-draw error of ``sum_i ln p_i + N ln Lam - Lam`` against
    the likelihood's own (lnpart - fullint), which must sit at float
    roundoff (the decomposition is exact, not approximate).
    """
    samples = np.asarray(samples)
    thetas_all = samples[:, :layout.ndim]
    rng = np.random.default_rng(seed)
    if thetas_all.shape[0] > ndraws:
        idx = rng.choice(thetas_all.shape[0], size=ndraws, replace=False)
        thetas_all = thetas_all[idx]
    thetas = jnp.asarray(thetas_all, dtype=ctx.lum.dtype)
    S = int(thetas.shape[0])

    loglam_chunk, parts = make_pointwise_fns(
        ctx, layout, exact_bounds=exact_bounds,
        min_comp_frac=min_comp_frac, lh=lh)

    lnpart_S, fullint_S = jax.jit(
        lambda th: _batched_map(parts, th, theta_batch))(thetas)
    lnpart_S = np.asarray(lnpart_S, dtype=np.float64)
    fullint_S = np.asarray(fullint_S, dtype=np.float64)
    lnLam_S = np.log(fullint_S)

    # real (unpadded) catalog columns, on host
    mask = np.asarray(ctx.src_mask) > 0
    cols = [np.asarray(a)[mask] for a in
            (ctx.lum, ctx.zsrc, ctx.ln_om_src, ctx.logf_src,
             ctx.omega0_src)]
    fid = np.asarray(ctx.field_id)[mask]
    N = int(mask.sum())
    chunk = max(1, min(chunk, N))

    @jax.jit
    def ll_block(th, lum, z, lnom, logf, om0, fid_c):
        return _batched_map(
            lambda t: loglam_chunk(t, lum, z, lnom, logf, om0, fid_c),
            th, theta_batch)

    lppd_i = np.empty(N)
    p_i = np.empty(N)
    elpd_loo_i = np.empty(N)
    k_i = np.empty(N)
    point_sum_S = np.zeros(S, dtype=np.float64)
    pointwise = np.empty((S, N)) if return_pointwise else None
    for lo_c in range(0, N, chunk):
        hi_c = min(lo_c + chunk, N)
        sl = slice(lo_c, hi_c)
        pad = chunk - (hi_c - lo_c)

        def pick(a):
            seg = a[sl]
            if pad:
                seg = np.concatenate([seg, np.repeat(seg[:1], pad)])
            return seg
        args = [jnp.asarray(pick(c), dtype=ctx.lum.dtype) for c in cols]
        fid_c = jnp.asarray(pick(fid))
        lam = np.asarray(ll_block(thetas, *args, fid_c),
                         dtype=np.float64)[:, :hi_c - lo_c]
        ll = lam - lnLam_S[:, None]
        point_sum_S += ll.sum(axis=1)
        if return_pointwise:
            pointwise[:, sl] = ll
        lppd_i[sl], p_i[sl], _ = waic_from_loglik(ll)
        elpd_loo_i[sl], k_i[sl] = loo_from_loglik(ll)

    elpd_waic_i = lppd_i - p_i
    recon = point_sum_S + N * lnLam_S - fullint_S
    ref = lnpart_S - fullint_S
    scale = np.maximum(np.abs(ref), 1.0)
    recon_err = float(np.max(np.abs(recon - ref) / scale))

    # Poisson count term ln P(N | Lam) as one extra "observation"
    count_ll = N * lnLam_S - fullint_S - math.lgamma(N + 1)
    count_lppd, count_p, count_elpd = (
        float(x[0]) for x in waic_from_loglik(count_ll[:, None]))

    se_waic = float(np.sqrt(N * np.var(elpd_waic_i, ddof=1)))
    se_loo = float(np.sqrt(N * np.var(elpd_loo_i, ddof=1)))
    out = {
        "elpd_waic": float(elpd_waic_i.sum()),
        "p_waic": float(p_i.sum()),
        "se_waic": se_waic,
        "elpd_loo": float(elpd_loo_i.sum()),
        "p_loo": float((lppd_i - elpd_loo_i).sum()),
        "se_loo": se_loo,
        "lppd": float(lppd_i.sum()),
        "k_max": float(k_i.max()),
        "frac_k_gt_07": float(np.mean(k_i > 0.7)),
        "count_lppd": count_lppd,
        "count_p": count_p,
        "elpd_waic_total": float(elpd_waic_i.sum()) + count_elpd,
        "max_abs_recon_err": recon_err,
        "n_sources": N,
        "ndraws": S,
        # per-source arrays (N floats each — cheap at any catalog
        # size): the paired-difference inputs compare_ic needs
        "elpd_waic_i": elpd_waic_i,
        "elpd_loo_i": elpd_loo_i,
        "pareto_k": k_i,
    }
    if return_pointwise:
        out["pointwise_loglik"] = pointwise
    return out


def stacking_weights(lpd, maxiter: int = 500):
    """Stacking weights for model averaging (Yao et al. 2018).

    ``lpd``: (N, K) pointwise log predictive densities — K models'
    ``elpd_loo_i`` columns on the SAME N sources. Maximizes the
    leave-one-out log score of the mixture predictive

        sum_i log sum_k w_k exp(lpd_ik)

    over the probability simplex (softmax parameterization, BFGS — one
    jitted solve; the softmax's shift direction is flat and harmless).
    Stacking finds the best predictive MIXTURE; unlike pseudo-BMA it
    does not pile all weight on one model when several are close, and
    it zeroes strictly-dominated ones.

    Returns ``(w (K,), info)`` with ``info['log_score']`` (the stacked
    total), ``info['log_score_single']`` (each model alone, (K,)) and
    ``info['pseudo_bma']`` (exp-elpd weights, the cruder alternative,
    for comparison).
    """
    lpd = jnp.asarray(np.asarray(lpd, dtype=np.float64))
    n, k = lpd.shape
    if k < 2:
        raise ValueError("stacking needs at least 2 models")

    def neg_score(a):
        logw = jax.nn.log_softmax(a)
        return -jnp.sum(jax.scipy.special.logsumexp(
            lpd + logw[None, :], axis=1))

    from jax.scipy.optimize import minimize
    res = minimize(neg_score, jnp.zeros(k, lpd.dtype), method="BFGS",
                   options={"maxiter": maxiter})
    w = np.asarray(jax.nn.softmax(res.x), dtype=np.float64)
    elpd_k = np.asarray(lpd.sum(axis=0), dtype=np.float64)
    bma = np.exp(elpd_k - elpd_k.max())
    info = {
        "log_score": -float(res.fun),
        "log_score_single": elpd_k,
        "pseudo_bma": bma / bma.sum(),
        "converged": bool(res.success) or bool(
            np.linalg.norm(np.asarray(jax.grad(neg_score)(res.x)))
            < 1e-4 * max(1.0, abs(float(res.fun)))),
    }
    return w, info


def compare_ic(ic_a: dict, ic_b: dict, which: str = "loo"):
    """Paired elpd comparison of two models fitted to the SAME catalog.

    The per-source elpd contributions of two models on shared data are
    strongly correlated, so the standard error of the DIFFERENCE
    (Vehtari et al. 2017, eq. 24: ``sqrt(N var(d_i))`` over the paired
    ``d_i = a_i - b_i``) is far smaller than the two marginal SEs
    combined — comparing totals +- marginal SEs systematically
    overstates the uncertainty. ``which``: "loo" (default) or "waic".

    Returns ``{delta, se, z, n_sources, preferred}`` with
    ``delta = elpd_a - elpd_b`` (positive favors model A) and
    ``preferred`` = "a"/"b"/"tie" at the conventional |z| > 2 line.
    """
    key = f"elpd_{which}_i"
    a = np.asarray(ic_a[key], dtype=np.float64)
    b = np.asarray(ic_b[key], dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(
            f"paired comparison needs the same sources: model A has "
            f"{a.shape[0]} pointwise terms, model B {b.shape[0]} — "
            "were the two fits run on the same catalog?")
    d = a - b
    n = d.size
    delta = float(d.sum())
    se = float(np.sqrt(n * np.var(d, ddof=1))) if n > 1 else 0.0
    if se > 0:
        z = delta / se
    elif delta == 0.0:
        z = 0.0          # identical pointwise arrays: a tie, not +inf
    else:
        z = np.inf * np.sign(delta)
    return {
        "delta": delta,
        "se": se,
        "z": float(z),
        "n_sources": int(n),
        "preferred": ("a" if z > 2.0 else "b" if z < -2.0 else "tie"),
    }


def format_ic_report(ic: dict) -> str:
    """Human-readable multi-line summary (logged and written by the
    CLI's ``--ic``)."""
    lines = [
        "Predictive information criteria "
        "(%d sources, %d posterior draws)" % (ic["n_sources"],
                                              ic["ndraws"]),
        "  elpd_waic   = %12.3f  (se %.3f, p_waic %.2f)"
        % (ic["elpd_waic"], ic["se_waic"], ic["p_waic"]),
        "  elpd_loo    = %12.3f  (se %.3f, p_loo  %.2f)"
        % (ic["elpd_loo"], ic["se_loo"], ic["p_loo"]),
        "  pareto-k    max %.3f, frac>0.7 %.4f"
        % (ic["k_max"], ic["frac_k_gt_07"]),
        "  count term  lppd %.3f (p %.2f); elpd_waic_total = %.3f"
        % (ic["count_lppd"], ic["count_p"], ic["elpd_waic_total"]),
        "  decomposition check: max rel err %.2e"
        % ic["max_abs_recon_err"],
    ]
    return "\n".join(lines)
