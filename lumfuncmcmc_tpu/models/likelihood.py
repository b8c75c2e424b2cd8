"""Log-probability kernels: the hot path of the framework.

Replaces the stateful ``lnprior``/``lnlike``/``lnlike_fix_comp``/``lnprob``
methods of the reference (``lumfuncmcmc.py:320-424``) with pure, jittable,
vmappable functions of a parameter vector theta.

The Poisson point-process likelihood is

    lnL(theta) = sum_n ln[ phi(L_n) * Omega(L_n, z_n) ]
               - sum_fields  integral phi(L) dV/dz Omega(L, z) dlogL dz

with the double integral evaluated by the trapezoid rule on the frozen
per-field grids of :class:`~lumfuncmcmc_tpu.models.context.LFContext`
(exact reference semantics, ``lumfuncmcmc.py:360-393``), i.e. a single
weighted reduction ``sum(phi * W)``.

TPU-native speedups (exact, not approximations):

- **Collapsed ln-term** (fixed-completeness single-epoch path): with
  Omega theta-independent, ``sum_n ln phi(L_n)`` is an affine function of
  three catalog scalars precomputed at build time::

      sum_n ln phi = N (ln ln10 + ln10 phistar)
                   + ln10 (alpha+1) (sum_n L_n - N Lstar)
                   - 10^(Lref - Lstar) * sum_n 10^(L_n - Lref)

  so the per-theta cost of the ln-term is O(1) instead of O(N) — the
  1e6-source mega-catalog costs the same as 1e3 (validated against the
  direct per-source reduction in tests).
- Everything is computed in log space; float32-safe on TPU.
- Priors are branchless where-masks instead of the reference's
  ``isfinite`` branching (``lumfuncmcmc.py:404``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import LFContext
from lumfuncmcmc_tpu.ops.completeness import fleming_root_logf
from lumfuncmcmc_tpu.ops.omega import LOG10_4PI as _LOG10_4PI, omega_from_logf
from lumfuncmcmc_tpu.ops.quadrature import gl_nodes_unit
from lumfuncmcmc_tpu.ops.schechter import LN10, log_true_lum_func

NEG_INF = -jnp.inf


@dataclass(frozen=True)
class ThetaLayout:
    """Static description of the packed parameter vector.

    Ordering matches ``set_parameters_from_list``
    (``lumfuncmcmc.py:320-337``):

        [Lstar, phistar] (+ [sch_al] if free)
        (+ [Flim_0..Flim_{F-1}, alpha_c] if completeness free)

    so posterior tables are column-compatible with the reference.
    """

    names: tuple
    lo: tuple
    hi: tuple
    fix_sch_al: bool
    fix_comp: bool
    nfields: int
    sch_al0: float
    flim0: tuple          # 1e-17 cgs units (reference convention)
    alpha0: float
    fcmin: float

    @property
    def ndim(self) -> int:
        return len(self.names)

    @classmethod
    def from_config(cls, cfg: LFConfig) -> "ThetaLayout":
        names = ["Lstar", "phistar"]
        lo = [cfg.Lstar_lims[0], cfg.phistar_lims[0]]
        hi = [cfg.Lstar_lims[1], cfg.phistar_lims[1]]
        if not cfg.fix_sch_al:
            names.append("sch_al")
            lo.append(cfg.sch_al_lims[0]); hi.append(cfg.sch_al_lims[1])
        if not cfg.fix_comp:
            for i in range(len(cfg.Flim)):
                names.append(f"Flim_{i}")
                lo.append(cfg.Flim_lims[0]); hi.append(cfg.Flim_lims[1])
            names.append("alpha")
            lo.append(cfg.alpha_lims[0]); hi.append(cfg.alpha_lims[1])
        return cls(names=tuple(names), lo=tuple(lo), hi=tuple(hi),
                   fix_sch_al=cfg.fix_sch_al, fix_comp=cfg.fix_comp,
                   nfields=len(cfg.Flim), sch_al0=cfg.sch_al,
                   flim0=tuple(cfg.Flim), alpha0=cfg.alpha,
                   fcmin=cfg.fcmin)

    def plot_names(self):
        """LaTeX labels (``get_param_names``, ``lumfuncmcmc.py:448-461``)."""
        out = [r"$\log L_*$", r"$\log \phi_*$"]
        if not self.fix_sch_al:
            out.append(r"$\alpha$")
        if not self.fix_comp:
            out += [r"$F_{{\rm 50},%d}$" % i for i in range(self.nfields)]
            out.append(r"$\alpha_C$")
        return out

    def unpack(self, theta):
        """theta -> (Lstar, phistar, sch_al, logF50_cgs (F,), alpha_c)."""
        dt = theta.dtype
        lstar, phistar = theta[0], theta[1]
        k = 2
        if self.fix_sch_al:
            sch_al = jnp.asarray(self.sch_al0, dt)
        else:
            sch_al = theta[k]; k += 1
        if self.fix_comp:
            logf50 = jnp.log10(jnp.asarray(self.flim0, dt)) - 17.0
            alpha_c = jnp.asarray(self.alpha0, dt)
        else:
            flim = theta[k:k + self.nfields]
            logf50 = jnp.log10(flim) - 17.0
            alpha_c = theta[k + self.nfields]
        return lstar, phistar, sch_al, logf50, alpha_c

    def bounds_arrays(self, dtype=None):
        return (jnp.asarray(self.lo, dtype=dtype),
                jnp.asarray(self.hi, dtype=dtype))


def lnprior(theta, layout: ThetaLayout):
    """Uniform box prior (``lumfuncmcmc.py:339-358``): 0 inside, -inf out."""
    lo, hi = layout.bounds_arrays(theta.dtype)
    ok = jnp.all((theta >= lo) & (theta <= hi))
    return jnp.where(ok, 0.0, NEG_INF)


def _ln_term_collapsed(ctx: LFContext, lstar, phistar, sch_al):
    """O(1) exact form of sum_n ln phi(L_n) + sum_n ln Omega_n."""
    log_ln10 = jnp.log(jnp.asarray(LN10, ctx.sum_lum.dtype))
    return (ctx.nsrc * (log_ln10 + LN10 * phistar)
            + LN10 * (sch_al + 1.0) * (ctx.sum_lum - ctx.nsrc * lstar)
            - jnp.exp(LN10 * (ctx.lref - lstar)) * ctx.sum_pow_lum
            + ctx.sum_ln_om)


def _ln_term_direct(ctx: LFContext, lstar, phistar, sch_al, ln_om_src):
    """Per-source reduction: sum_n [ln phi(L_n) + ln Omega_n].

    Masked so padded sources (source-axis sharding) contribute exactly 0
    without -inf * 0 NaNs.
    """
    lnphi = log_true_lum_func(ctx.lum, sch_al, lstar, phistar)
    contrib = jnp.where(ctx.src_mask > 0, lnphi + ln_om_src, 0.0)
    return jnp.sum(contrib)


def lnlike_single_epoch_parts(theta, ctx: LFContext, layout: ThetaLayout,
                              collapse: bool = True):
    """(lnpart, fullint) for the single-epoch model.

    Split exposed so the source-sharded evaluator can ``psum`` the
    per-source part alone and add the (replicated-input) grid integral
    exactly once — lnL = lnpart - fullint.
    """
    lstar, phistar, sch_al, logf50, alpha_c = layout.unpack(theta)

    if layout.fix_comp:
        lnpart = (_ln_term_collapsed(ctx, lstar, phistar, sch_al) if collapse
                  else _ln_term_direct(ctx, lstar, phistar, sch_al,
                                       ctx.ln_om_src))
        lnphi_grid = log_true_lum_func(ctx.logL_grid, sch_al, lstar, phistar)
        fullint = jnp.sum(jnp.exp(lnphi_grid) * ctx.w_fixed)
    else:
        logf50_src = logf50[ctx.field_id]
        om_src = omega_from_logf(ctx.logf_src, ctx.omega0_src, logf50_src,
                                 alpha_c, layout.fcmin)
        lnpart = _ln_term_direct(ctx, lstar, phistar, sch_al,
                                 jnp.log(om_src))
        om_grid = omega_from_logf(
            ctx.logf_grid, ctx.omega0_f[:, None, None],
            logf50[:, None, None], alpha_c, layout.fcmin)
        lnphi_grid = log_true_lum_func(ctx.logL_grid, sch_al, lstar, phistar)
        fullint = jnp.sum(jnp.exp(lnphi_grid) * om_grid * ctx.w_open)
    return lnpart, fullint


def lnlike_single_epoch(theta, ctx: LFContext, layout: ThetaLayout,
                        collapse: bool = True):
    """lnL(theta) for the single-epoch Schechter model.

    Fixed completeness -> ``lnlike_fix_comp`` semantics
    (``lumfuncmcmc.py:380-393``): frozen Omega caches, collapsed ln-term.
    Free completeness -> ``lnlike`` semantics (``lumfuncmcmc.py:360-378``):
    Omega recomputed from theta on the frozen grid and per source.
    """
    lnpart, fullint = lnlike_single_epoch_parts(theta, ctx, layout,
                                                collapse=collapse)
    return lnpart - fullint


def lnlike_exact_bounds_parts(theta, ctx: LFContext, layout: ThetaLayout,
                              min_comp_frac: float, lum_floor, lh,
                              n_nodes: int = 32):
    """(lnpart, fullint) for the theta-exact-bounds likelihood; split
    exposed for the source-sharded evaluator (see
    :func:`lnlike_exact_bounds` for the semantics)."""
    lstar, phistar, sch_al, logf50, alpha_c = layout.unpack(theta)
    dt = theta.dtype

    # per-source term (identical to the free-completeness path)
    logf50_src = logf50[ctx.field_id]
    om_src = omega_from_logf(ctx.logf_src, ctx.omega0_src, logf50_src,
                             alpha_c, layout.fcmin)
    lnpart = _ln_term_direct(ctx, lstar, phistar, sch_al,
                             jnp.log(om_src))

    u, w = gl_nodes_unit(n_nodes)
    u = jnp.asarray(u, dt); w = jnp.asarray(w, dt)
    # true data z-range: replicated context scalars (min/max of zsrc
    # would break under source sharding, where each shard sees a slice)
    zmin = ctx.z_lo
    zmax = ctx.z_hi

    if min_comp_frac > 0.001:
        # theta-exact completeness roots per field (in-jit bisection)
        roots = fleming_root_logf(logf50, alpha_c, min_comp_frac,
                                  layout.fcmin, iters=50)   # (F,)
        # minlum(z) = max(root-implied bound, lum_floor) has a
        # derivative kink where the two branches cross; an un-split
        # Gauss-Legendre z panel loses spectral convergence there (the
        # same load-bearing split the frozen-grid gauss mode applies,
        # here per theta AND per field since the roots move). The kink
        # redshift follows from inverting the monotone dL table:
        zstar = jnp.clip(ctx.cosmo.z_at_log10_dl_cm(
            0.5 * (lum_floor - roots - _LOG10_4PI)), zmin, zmax)  # (F,)
        z_lo = jnp.stack([jnp.full_like(zstar, zmin), zstar])  # (2, F)
        z_hi = jnp.stack([zstar, jnp.full_like(zstar, zmax)])
        zspan = z_hi - z_lo
        znodes = z_lo[:, :, None] + u[None, None, :] * zspan[:, :, None]
        wz = w[None, None, :] * zspan[:, :, None]           # (2, F, S)
        log_dl = ctx.cosmo.log10_dl_cm_at(znodes)
        dvdz = ctx.cosmo.differential_comoving_volume(znodes)
        minlum = jnp.maximum(roots[None, :, None] + _LOG10_4PI
                             + 2.0 * log_dl, lum_floor)     # (2, F, S)
        span = lh - minlum
        logL = (minlum[:, :, None, :]
                + u[None, None, :, None] * span[:, :, None, :])
        wl = w[None, None, :, None] * span[:, :, None, :]   # (2,F,S,S)
        logf = logL - _LOG10_4PI - 2.0 * log_dl[:, :, None, :]
        om = omega_from_logf(logf, ctx.omega0_f[None, :, None, None],
                             logf50[None, :, None, None], alpha_c,
                             layout.fcmin)
        lnphi = log_true_lum_func(logL, sch_al, lstar, phistar)
        fullint = jnp.sum(jnp.exp(lnphi) * om * wl
                          * (wz * dvdz)[:, :, None, :])
        return lnpart, fullint

    # no completeness cut: the bound is the constant lum_floor — smooth,
    # one z panel suffices
    znodes = zmin + u * (zmax - zmin)                       # (S,)
    wz = w * (zmax - zmin)
    log_dl = ctx.cosmo.log10_dl_cm_at(znodes)               # (S,)
    dvdz = ctx.cosmo.differential_comoving_volume(znodes)
    minlum = jnp.full((layout.nfields, n_nodes), lum_floor, dt)
    span = lh - minlum
    logL = minlum[:, None, :] + u[None, :, None] * span[:, None, :]
    wl = w[None, :, None] * span[:, None, :]                # (F, S, S)
    logf = logL - _LOG10_4PI - 2.0 * log_dl[None, None, :]
    om = omega_from_logf(logf, ctx.omega0_f[:, None, None],
                         logf50[:, None, None], alpha_c, layout.fcmin)
    lnphi = log_true_lum_func(logL, sch_al, lstar, phistar)
    fullint = jnp.sum(jnp.exp(lnphi) * om * wl
                      * (wz * dvdz)[None, None, :])
    return lnpart, fullint


def lnlike_exact_bounds(theta, ctx: LFContext, layout: ThetaLayout,
                        min_comp_frac: float, lum_floor, lh,
                        n_nodes: int = 32):
    """Free-completeness lnL with theta-EXACT integration bounds.

    The reference freezes the logL grid's lower bound at the build-time
    completeness parameters even while sampling Flim/alpha_c (its exact
    -bounds routine ``setlncomp`` exists but is dead code — its call is
    commented out at ``lumfuncmcmc.py:372``; SURVEY.md §3.2 prescribes
    offering the exact treatment as an option). The bound

        minlum_f(z | theta) = max( log10(4 pi dL^2 root_f(theta)),
                                   min(lum) )

    is re-derived per evaluation: the completeness root by fixed
    -iteration bisection (jittable), and the (L, z) integral by
    Gauss-Legendre on [0, 1]^2 mapped through the theta-dependent bounds
    — static shapes, fully differentiable.
    """
    lnpart, fullint = lnlike_exact_bounds_parts(
        theta, ctx, layout, min_comp_frac, lum_floor, lh, n_nodes)
    return lnpart - fullint


def make_lnprob(ctx: LFContext, layout: ThetaLayout, collapse: bool = True,
                exact_bounds: bool = False, min_comp_frac: float = 0.5,
                lh: float = 46.0):
    """Build the scalar lnprob(theta) (``lumfuncmcmc.py:395-424``).

    Branchless: the likelihood is always evaluated and masked by the
    prior; box bounds are finite so out-of-bounds thetas still produce
    finite lnlike (no NaN leakage into the -inf sum).

    ``exact_bounds`` (free-completeness only) switches to
    :func:`lnlike_exact_bounds`.
    """
    if exact_bounds and layout.fix_comp:
        raise ValueError("exact_bounds applies to free completeness only")
    lum_floor = float(jnp.min(ctx.lum))

    def lnprob(theta):
        lp = lnprior(theta, layout)
        if exact_bounds:
            lnl = lnlike_exact_bounds(theta, ctx, layout, min_comp_frac,
                                      lum_floor, lh)
        else:
            lnl = lnlike_single_epoch(theta, ctx, layout,
                                      collapse=collapse)
        return jnp.where(jnp.isfinite(lp), lp + lnl, NEG_INF)

    return lnprob


def sample_init(key, layout: ThetaLayout, nwalkers: int, diff_rand=True,
                dtype=None):
    """Uniform walker initialization inside the prior box
    (``get_init_walker_values``, ``lumfuncmcmc.py:426-446``), including the
    reference's ``diff_rand=False`` mode that reuses a single U(0,1) draw
    per walker across all dimensions (``lumfuncmcmc.py:443-444``).
    """
    lo, hi = layout.bounds_arrays(dtype)
    if diff_rand:
        u = jax.random.uniform(key, (nwalkers, layout.ndim), dtype=lo.dtype)
    else:
        u = jax.random.uniform(key, (nwalkers, 1), dtype=lo.dtype)
    return u * (hi - lo) + lo
