"""Hierarchical multi-field joint Schechter fit (new capability).

The reference fits one global (L*, phi*, alpha) across all fields
(fields differ only in completeness). This model gives every field its
own (logL*_f, logphi*_f) drawn from Gaussian population hyperpriors —
the "joint multi-field hierarchical fit" target configuration of
BASELINE.json — while sharing the faint-end slope:

    theta = [mu_L, sig_L, mu_p, sig_p, sch_al,
             Lstar_0..Lstar_{F-1}, phistar_0..phistar_{F-1}]

    lnpost = sum_f [ lnpart_f(Lstar_f, phistar_f, sch_al)
                     - integral_f(Lstar_f, phistar_f, sch_al) ]
           + sum_f [ ln N(Lstar_f | mu_L, sig_L)
                     + ln N(phistar_f | mu_p, sig_p) ]
           + priors(mu, sig, sch_al)

Per-field ln-terms use the same exact O(1) collapsed form as the
single-epoch model, via the per-field catalog scalars in
:class:`~lumfuncmcmc_tpu.models.context.LFContext` — so the whole
likelihood is a handful of (F,)-vector ops plus the per-field grid
reduction. Completeness is fixed (build-time parameters), matching the
fixed-comp path this extends.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import LFContext
from lumfuncmcmc_tpu.ops.schechter import LN10, log_true_lum_func

NEG_INF = -jnp.inf
_LOG_2PI = float(np.log(2.0 * np.pi))


@dataclass(frozen=True)
class ThetaLayoutH:
    names: tuple
    lo: tuple
    hi: tuple
    nfields: int
    fix_sch_al: bool
    sch_al0: float

    @property
    def ndim(self) -> int:
        return len(self.names)

    @classmethod
    def from_config(cls, cfg: LFConfig) -> "ThetaLayoutH":
        nf = len(cfg.Flim)
        names = ["mu_L", "sig_L", "mu_p", "sig_p"]
        lo = [cfg.Lstar_lims[0], 0.01, cfg.phistar_lims[0], 0.01]
        hi = [cfg.Lstar_lims[1], 2.0, cfg.phistar_lims[1], 3.0]
        if not cfg.fix_sch_al:
            names.append("sch_al")
            lo.append(cfg.sch_al_lims[0]); hi.append(cfg.sch_al_lims[1])
        for i in range(nf):
            names.append(f"Lstar_{i}")
            lo.append(cfg.Lstar_lims[0]); hi.append(cfg.Lstar_lims[1])
        for i in range(nf):
            names.append(f"phistar_{i}")
            lo.append(cfg.phistar_lims[0]); hi.append(cfg.phistar_lims[1])
        return cls(names=tuple(names), lo=tuple(lo), hi=tuple(hi),
                   nfields=nf, fix_sch_al=cfg.fix_sch_al,
                   sch_al0=cfg.sch_al)

    def plot_names(self):
        out = [r"$\mu_{L_*}$", r"$\sigma_{L_*}$", r"$\mu_{\phi_*}$",
               r"$\sigma_{\phi_*}$"]
        if not self.fix_sch_al:
            out.append(r"$\alpha$")
        out += [r"$\log L_{*,%d}$" % i for i in range(self.nfields)]
        out += [r"$\log \phi_{*,%d}$" % i for i in range(self.nfields)]
        return out

    def unpack(self, theta):
        mu_l, sig_l, mu_p, sig_p = theta[0], theta[1], theta[2], theta[3]
        k = 4
        if self.fix_sch_al:
            sch_al = jnp.asarray(self.sch_al0, theta.dtype)
        else:
            sch_al = theta[k]; k += 1
        lstar_f = theta[k:k + self.nfields]
        phistar_f = theta[k + self.nfields:k + 2 * self.nfields]
        return mu_l, sig_l, mu_p, sig_p, sch_al, lstar_f, phistar_f

    def bounds_arrays(self, dtype=None):
        return (jnp.asarray(self.lo, dtype=dtype),
                jnp.asarray(self.hi, dtype=dtype))


def _ln_normal(x, mu, sig):
    return -0.5 * (((x - mu) / sig) ** 2 + _LOG_2PI) - jnp.log(sig)


def lnprior_h(theta, layout: ThetaLayoutH):
    """Uniform box prior — the same masking rule as the single-epoch
    model (``likelihood.lnprior`` is layout-duck-typed)."""
    from lumfuncmcmc_tpu.models.likelihood import lnprior
    return lnprior(theta, layout)


def lnlike_h_split(theta, ctx: LFContext, layout: ThetaLayoutH):
    """``(data, hyper)`` split: the per-field Poisson point-process
    terms and the population-hyperprior terms. Tempered-evidence runs
    (:mod:`~lumfuncmcmc_tpu.samplers.tempering`) temper only ``data``
    — the hyperprior is part of the prior measure, not the
    likelihood."""
    mu_l, sig_l, mu_p, sig_p, sch_al, lstar_f, phistar_f = \
        layout.unpack(theta)
    dt = theta.dtype
    log_ln10 = jnp.log(jnp.asarray(LN10, dt))

    # per-field collapsed ln-terms (exact; see likelihood.py)
    lnpart_f = (ctx.nsrc_f * (log_ln10 + LN10 * phistar_f)
                + LN10 * (sch_al + 1.0)
                * (ctx.sum_lum_f - ctx.nsrc_f * lstar_f)
                - jnp.exp(LN10 * (ctx.lref - lstar_f)) * ctx.sum_pow_lum_f
                + ctx.sum_ln_om_f)

    # per-field grid integrals: phi_f on field f's frozen grid
    lnphi_grid = log_true_lum_func(
        ctx.logL_grid, sch_al, lstar_f[:, None, None],
        phistar_f[:, None, None])
    int_f = jnp.sum(jnp.exp(lnphi_grid) * ctx.w_fixed, axis=(1, 2))

    # population hyperprior terms
    hyper = (jnp.sum(_ln_normal(lstar_f, mu_l, sig_l))
             + jnp.sum(_ln_normal(phistar_f, mu_p, sig_p)))

    return jnp.sum(lnpart_f - int_f), hyper


def lnlike_h(theta, ctx: LFContext, layout: ThetaLayoutH):
    """Joint likelihood with per-field (L*, phi*) and shared alpha."""
    data, hyper = lnlike_h_split(theta, ctx, layout)
    return data + hyper


def make_lnprob_h(ctx: LFContext, layout: ThetaLayoutH):
    def lnprob(theta):
        lp = lnprior_h(theta, layout)
        lnl = lnlike_h(theta, ctx, layout)
        return jnp.where(jnp.isfinite(lp), lp + lnl, NEG_INF)
    return lnprob


def _gauss_cdf(x):
    # np.vectorize(math.erf): exact f64 on the host, no scipy (test
    # oracles only) and no device round-trip for a one-time precompute
    import math
    erf = np.vectorize(math.erf, otypes=[np.float64])
    return 0.5 * (1.0 + erf(np.asarray(x, np.float64) / math.sqrt(2.0)))


def _box_mass_integral(m0, m1, s0, s1, a, b, F, n_mu=32, n_sig=48):
    """``I = int_{m0}^{m1} dmu int_{s0}^{s1} dsig G(mu, sig)^F`` with
    ``G = Phi((b-mu)/sig) - Phi((a-mu)/sig)`` — the total mass the
    box-truncated Gaussian hyperprior block contributes to the prior
    normalization (F fields share one (mu, sig); [a, b] is the FIELD
    parameter box, [m0, m1] x [s0, s1] the hyper box).

    Deterministic split-panel Gauss-Legendre: G is analytic in sigma,
    but in mu it has erf boundary layers of width ~sigma around the
    field-box edges, so for each sigma node the mu integral runs over
    panels split at ``a +- 10 sigma`` / ``b +- 10 sigma`` (clipped to
    the hyper box) — the same split-at-the-kink rule the likelihood's
    GL quadrature uses. 48x(4x32) nodes resolve the layers to ~1e-12
    (pinned vs scipy.dblquad in tests/test_mapfit.py).
    """
    xg, wg = np.polynomial.legendre.leggauss(int(n_mu))
    xs, ws = np.polynomial.legendre.leggauss(int(n_sig))

    def g_pow(mu, sig):
        return (_gauss_cdf((b - mu) / sig)
                - _gauss_cdf((a - mu) / sig)) ** F

    total = 0.0
    for t, w_s in zip(xs, ws):
        sig = 0.5 * (s1 + s0) + 0.5 * (s1 - s0) * t
        w_sig = 0.5 * (s1 - s0) * w_s
        cuts = sorted({m0, m1,
                       *(min(max(c, m0), m1)
                         for c in (a - 10.0 * sig, a + 10.0 * sig,
                                   b - 10.0 * sig, b + 10.0 * sig))})
        acc = 0.0
        for p0, p1 in zip(cuts[:-1], cuts[1:]):
            if p1 <= p0:
                continue
            mu = 0.5 * (p1 + p0) + 0.5 * (p1 - p0) * xg
            acc += 0.5 * (p1 - p0) * float(np.dot(wg, g_pow(mu, sig)))
        total += w_sig * acc
    return total


def lnz0_prior(layout: ThetaLayoutH, n_mu=32, n_sig=48):
    """ln of the hierarchical prior normalization
    ``Z0 = int_box dtheta prod_f N(Lstar_f|mu_L,sig_L)
    N(phistar_f|mu_p,sig_p)``.

    The stepping-stone ladder's beta=0 measure is exactly this
    unnormalized density (``_prior_like_fns``: box + hyperprior), and
    telescoping divides by its total mass — so ``lnz_ss`` is the
    evidence under the NORMALIZED prior automatically. The Laplace
    estimator integrates ``exp(lnpost)`` (the same joint), so
    ``lnz_laplace = ln_int - lnz0_prior`` puts both estimators in one
    convention (the hier twin of the flat-box models' ``- ln V``).

    The integral factorizes: sch_al (when free) is an independent
    uniform (width factor); the (mu_L, sig_L) x {Lstar_f} and
    (mu_p, sig_p) x {phistar_f} blocks each reduce to the 2-D
    erf-product integral of :func:`_box_mass_integral` because every
    field shares the hyper-mean's own box.
    """
    F = layout.nfields
    lo = np.asarray(layout.lo, np.float64)
    hi = np.asarray(layout.hi, np.float64)
    # layout order: mu_L, sig_L, mu_p, sig_p [, sch_al], Lstar_*, phi*_*
    kf = 4 + (0 if layout.fix_sch_al else 1)
    i_l = _box_mass_integral(lo[0], hi[0], lo[1], hi[1],
                             lo[kf], hi[kf], F, n_mu=n_mu, n_sig=n_sig)
    i_p = _box_mass_integral(lo[2], hi[2], lo[3], hi[3],
                             lo[kf + F], hi[kf + F], F,
                             n_mu=n_mu, n_sig=n_sig)
    out = float(np.log(i_l) + np.log(i_p))
    if not layout.fix_sch_al:
        out += float(np.log(hi[4] - lo[4]))
    return out
