"""Redshift-evolving Schechter likelihood (LumFuncMCMCz counterpart).

Replaces ``lumfuncmcmc_z.py:332-392``: theta packs three (logL*, logphi*)
pivot values plus optionally a constant alpha; (L*, phi*)(z) are the
quadratics through the pivots (``getQuadCoef``/``schechter_z``,
``lumfuncmcmc_z.py:26-67``). Completeness is always fixed in this model
(the reference z-variant has no free-completeness path; grid size 201,
``lumfuncmcmc_z.py:254``), so the frozen ``w_fixed`` grid and per-source
``ln Omega`` cache apply directly.

The per-source ln-term cannot collapse to O(1) here (phi depends on each
source's z through the quadratics), so it stays an N-vector reduction —
vmapped over walkers and shardable over the source axis.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import LFContext
from lumfuncmcmc_tpu.ops.schechter import log_schechter_z

NEG_INF = -jnp.inf


@dataclass(frozen=True)
class ThetaLayoutZ:
    """Reference parameterization: theta = [L1, L2, L3, phi1, phi2,
    phi3] (+ [sch_al] if free) (``lumfuncmcmc_z.py:332-341``).

    Alternative ``z_param="natural"`` (new capability): theta =
    [Lmid, Lslope, Lcurv, pmid, pslope, pcurv] (+ [sch_al]) — the
    quadratic's value/slope/curvature at the central pivot z2. Uniform
    priors on pivot *values* are informative about the curvature
    direction (measurably skewing credible intervals when the data
    barely constrain evolution — docs/VALIDATION.md); uniform priors on
    the natural coefficients are flat in that direction. ``unpack``
    always returns pivot values, so the likelihood is unchanged.
    """

    names: tuple
    lo: tuple
    hi: tuple
    fix_sch_al: bool
    sch_al0: float
    z1: float
    z2: float
    z3: float
    natural: bool = False

    @property
    def ndim(self) -> int:
        return len(self.names)

    @classmethod
    def from_config(cls, cfg: LFConfig) -> "ThetaLayoutZ":
        natural = getattr(cfg, "z_param", "pivots") == "natural"
        if natural:
            names = ["Lmid", "Lslope", "Lcurv", "pmid", "pslope", "pcurv"]
            lo = [cfg.Lstar_lims[0], -3.0, -6.0,
                  cfg.phistar_lims[0], -5.0, -10.0]
            hi = [cfg.Lstar_lims[1], 3.0, 6.0,
                  cfg.phistar_lims[1], 5.0, 10.0]
        else:
            names = ["L1", "L2", "L3", "phi1", "phi2", "phi3"]
            lo = [cfg.Lstar_lims[0]] * 3 + [cfg.phistar_lims[0]] * 3
            hi = [cfg.Lstar_lims[1]] * 3 + [cfg.phistar_lims[1]] * 3
        if not cfg.fix_sch_al:
            names.append("sch_al")
            lo.append(cfg.sch_al_lims[0]); hi.append(cfg.sch_al_lims[1])
        return cls(names=tuple(names), lo=tuple(lo), hi=tuple(hi),
                   fix_sch_al=cfg.fix_sch_al, sch_al0=cfg.sch_al,
                   z1=cfg.z1, z2=cfg.z2, z3=cfg.z3, natural=natural)

    def plot_names(self):
        """``get_param_names`` (``lumfuncmcmc_z.py:411-421``)."""
        if self.natural:
            out = [r"$\log L_*(z_2)$", r"$dL_*/dz$", r"$d^2L_*/dz^2$",
                   r"$\log \phi_*(z_2)$", r"$d\phi_*/dz$",
                   r"$d^2\phi_*/dz^2$"]
        else:
            out = [r"$\log {\rm{L}}1_*$", r"$\log {\rm{L}}2_*$",
                   r"$\log {\rm{L}}3_*$", r"$\log \phi1_*$",
                   r"$\log \phi2_*$", r"$\log \phi3_*$"]
        if not self.fix_sch_al:
            out.append(r"$\alpha$")
        return out

    def unpack(self, theta):
        """-> (L1, L2, L3, phi1, phi2, phi3, sch_al) pivot values."""
        if self.natural:
            dz1, dz3 = self.z1 - self.z2, self.z3 - self.z2
            Lm, Ls, Lc = theta[0], theta[1], theta[2]
            pm, ps, pc = theta[3], theta[4], theta[5]
            L1 = Lm + Ls * dz1 + Lc * dz1 * dz1
            L3 = Lm + Ls * dz3 + Lc * dz3 * dz3
            p1 = pm + ps * dz1 + pc * dz1 * dz1
            p3 = pm + ps * dz3 + pc * dz3 * dz3
            L2, p2 = Lm, pm
        else:
            L1, L2, L3 = theta[0], theta[1], theta[2]
            p1, p2, p3 = theta[3], theta[4], theta[5]
        sch_al = (jnp.asarray(self.sch_al0, theta.dtype)
                  if self.fix_sch_al else theta[6])
        return L1, L2, L3, p1, p2, p3, sch_al

    def bounds_arrays(self, dtype=None):
        return (jnp.asarray(self.lo, dtype=dtype),
                jnp.asarray(self.hi, dtype=dtype))


def lnprior_z(theta, layout: ThetaLayoutZ):
    """Box prior; pivots use strict inequalities like the reference
    (``lumfuncmcmc_z.py:343-362``: ``>``/``<`` for L/phi, ``>=``/``<=``
    for sch_al)."""
    lo, hi = layout.bounds_arrays(theta.dtype)
    npivot = 6
    ok = jnp.all((theta[:npivot] > lo[:npivot])
                 & (theta[:npivot] < hi[:npivot]))
    if not layout.fix_sch_al:
        ok = ok & (theta[6] >= lo[6]) & (theta[6] <= hi[6])
    return jnp.where(ok, 0.0, NEG_INF)


def lnlike_z_parts(theta, ctx: LFContext, layout: ThetaLayoutZ):
    """(lnpart, fullint) split — the per-source reduction and the grid
    integral — so the source-sharded evaluator can ``psum`` only the
    source part (lnL = lnpart - fullint)."""
    L1, L2, L3, p1, p2, p3, al = layout.unpack(theta)
    zp = (layout.z1, layout.z2, layout.z3)

    lnphi_src = log_schechter_z(ctx.lum, ctx.zsrc, al, L1, L2, L3,
                                p1, p2, p3, *zp)
    lnpart = jnp.sum(jnp.where(ctx.src_mask > 0,
                               lnphi_src + ctx.ln_om_src, 0.0))

    # grid: per-field z nodes broadcast along the L axis
    lnphi_grid = log_schechter_z(ctx.logL_grid, ctx.zarr[:, None, :],
                                 al, L1, L2, L3, p1, p2, p3, *zp)
    fullint = jnp.sum(jnp.exp(lnphi_grid) * ctx.w_fixed)
    return lnpart, fullint


def lnlike_z(theta, ctx: LFContext, layout: ThetaLayoutZ):
    """lnL for the z-evolving model (``lumfuncmcmc_z.py:364-376``)."""
    lnpart, fullint = lnlike_z_parts(theta, ctx, layout)
    return lnpart - fullint


def make_lnprob_z(ctx: LFContext, layout: ThetaLayoutZ):
    def lnprob(theta):
        lp = lnprior_z(theta, layout)
        lnl = lnlike_z(theta, ctx, layout)
        return jnp.where(jnp.isfinite(lp), lp + lnl, NEG_INF)
    return lnprob
