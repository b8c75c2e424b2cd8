"""Fused Pallas TPU kernel for the free-completeness log-likelihood.

The hot path of the flagship model evaluates, per walker theta:

    lnpart  = sum_n [ ln phi(L_n) + ln Omega(L_n, z_n | theta) ]
    fullint = sum_{f,i,j} phi(logL[f,i,j]) * Omega(logf[f,i,j] | theta)
              * w[f,i,j]
    lnlike  = lnpart - fullint

Under vmap+XLA this is a chain of large elementwise ops and reductions
per walker; the Pallas kernel fuses the whole computation for one walker
into a single VMEM-resident pass — the (F*S, S) grids are loaded once and
kept resident across walker programs (constant index maps -> Mosaic skips
the re-fetch), and every transcendental feeds the reduction without
touching HBM.

This is the framework's "native tier" (SURVEY.md §2, native-components
row): the reference has no native code, so its TPU-native equivalent is
the Pallas kernel for the likelihood reduction.

Layout notes:
- all grid arrays are padded to (8k, 128m) float32 tiles with zero
  weights in the padding;
- per-field theta values are mapped onto grid rows / source lanes by
  static per-field selects (no dynamic gathers — Mosaic-friendly);
- per-source arrays are reshaped to (R, 128) with a mask row.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lumfuncmcmc_tpu.models.context import LFContext
from lumfuncmcmc_tpu.cosmology import SQARCSEC_PER_SR
from lumfuncmcmc_tpu.ops.schechter import LN10

_LOG_LN10 = float(np.log(LN10))


def _round_up(x, m):
    return -(-x // m) * m


def _pad2d(a, rows, cols, fill=0.0):
    out = np.full((rows, cols), fill, dtype=np.float32)
    out[: a.shape[0], : a.shape[1]] = a
    return out


@dataclass(frozen=True)
class PallasLnlikeData:
    """Preprocessed, tile-padded device buffers for the kernel."""

    logL: jnp.ndarray       # (G, C) grid logL values
    logf: jnp.ndarray       # (G, C) grid log-flux values
    w: jnp.ndarray          # (G, C) weights incl volume and field area
    grid_fid: jnp.ndarray   # (G, C) float32 field id per grid row
    src_lum: jnp.ndarray    # (R, 128)
    src_logf: jnp.ndarray   # (R, 128)
    src_lnom0: jnp.ndarray  # (R, 128) ln(Omega0_src / sqarcsec)
    src_fid: jnp.ndarray    # (R, 128) float32
    src_mask: jnp.ndarray   # (R, 128)
    fcmin: float
    nfields: int


jax.tree_util.register_pytree_node(
    PallasLnlikeData,
    lambda d: ((d.logL, d.logf, d.w, d.grid_fid, d.src_lum,
                d.src_logf, d.src_lnom0, d.src_fid, d.src_mask),
               (d.fcmin, d.nfields)),
    lambda aux, ch: PallasLnlikeData(*ch, fcmin=aux[0], nfields=aux[1]),
)


def prepare_pallas_data(ctx: LFContext, fcmin: float) -> PallasLnlikeData:
    """Host-side reshape/pad of the context grids into kernel layout.

    The per-field area fraction Omega_0/sqarcsec is folded into the grid
    weights, so the kernel's Omega factor is the bare Fleming curve.
    """
    logL = np.asarray(ctx.logL_grid, dtype=np.float32)
    logf = np.asarray(ctx.logf_grid, dtype=np.float32)
    w = np.asarray(ctx.w_open, dtype=np.float64)
    nf, s, _ = logL.shape
    om0_f = np.asarray(ctx.omega0_f, dtype=np.float64) / SQARCSEC_PER_SR
    w = (w * om0_f[:, None, None]).astype(np.float32)

    rows, cols = nf * s, s
    rows_p = _round_up(rows, 8)
    cols_p = _round_up(cols, 128)
    fid_row = np.repeat(np.arange(nf, dtype=np.float32), s)
    fid_row = np.pad(fid_row, (0, rows_p - rows), constant_values=-1)
    grid_fid = np.repeat(fid_row[:, None], cols_p, axis=1)

    lum = np.asarray(ctx.lum, dtype=np.float32)
    logf_src = np.asarray(ctx.logf_src, dtype=np.float32)
    om0 = np.asarray(ctx.omega0_src, dtype=np.float64) / SQARCSEC_PER_SR
    fid = np.asarray(ctx.field_id, dtype=np.float32)
    mask = np.asarray(ctx.src_mask, dtype=np.float32)
    n = lum.shape[0]
    n_p = _round_up(max(n, 1024), 1024)
    r = n_p // 128

    def pad_src(a, fill=0.0):
        out = np.full(n_p, fill, dtype=np.float32)
        out[:n] = a
        return out.reshape(r, 128)

    return PallasLnlikeData(
        logL=jnp.asarray(_pad2d(logL.reshape(rows, cols), rows_p, cols_p)),
        logf=jnp.asarray(_pad2d(logf.reshape(rows, cols), rows_p, cols_p,
                                fill=-30.0)),
        w=jnp.asarray(_pad2d(w.reshape(rows, cols), rows_p, cols_p)),
        grid_fid=jnp.asarray(grid_fid),
        src_lum=jnp.asarray(pad_src(lum)),
        src_logf=jnp.asarray(pad_src(logf_src, fill=-30.0)),
        src_lnom0=jnp.asarray(pad_src(np.log(np.maximum(om0, 1e-300)))),
        src_fid=jnp.asarray(pad_src(fid, fill=-1.0)),
        src_mask=jnp.asarray(pad_src(mask)),
        fcmin=float(fcmin),
        nfields=int(nf),
    )


def _lnphi(logL, sch_al, lstar, phistar):
    x = logL - lstar
    return (_LOG_LN10 + LN10 * phistar + LN10 * x * (sch_al + 1.0)
            - jnp.exp(LN10 * x))


def _ln_fleming(logf, logF50, alpha_c, fcmin):
    """ln of the modified Fleming curve (see ops/completeness.py)."""
    x = alpha_c * (logf - logF50)
    fc = 0.5 * (1.0 + x * jax.lax.rsqrt(1.0 + x * x))
    ln_fc = jnp.log(jnp.maximum(fc, 1e-30))
    if not fcmin:
        return ln_fc
    a = (2.0 * fcmin - 1.0) ** 2
    log_ftau = logF50 - jnp.sqrt(jnp.abs(a / (1.0 - a))
                                 / (alpha_c * alpha_c))
    ratio = jnp.exp(jnp.minimum((logf - log_ftau) * LN10, 40.0))
    decay = 1.0 - jnp.exp(-ratio)
    return ln_fc / decay


def _select_by_field(fid_arr, theta_at, base, nfields):
    """Map per-field theta entries onto an array of field ids via static
    selects (avoids dynamic gathers inside the kernel)."""
    out = jnp.zeros_like(fid_arr)
    for f in range(nfields):
        out = jnp.where(fid_arr == float(f), theta_at(base + f), out)
    return out


BLK_W = 8  # walkers per program: satisfies the (8, 128) tile rule for
           # the SMEM theta and output blocks


def _kernel(theta_ref, logL_ref, logf_ref, w_ref, gfid_ref,
            slum_ref, slogf_ref, slnom_ref, sfid_ref, smask_ref,
            out_ref, *, fcmin, nfields):
    # one program evaluates BLK_W walkers against the resident grids
    for i in range(BLK_W):
        lstar = theta_ref[i, 0]
        phistar = theta_ref[i, 1]
        sch_al = theta_ref[i, 2]
        alpha_c = theta_ref[i, 3 + nfields]

        def theta_at(j):
            return theta_ref[i, j]

        # grid integral (weights already carry area * volume * trapz)
        logf50_g = _select_by_field(gfid_ref[:, :], theta_at, 3, nfields)
        lnphi = _lnphi(logL_ref[:, :], sch_al, lstar, phistar)
        lnfc = _ln_fleming(logf_ref[:, :], logf50_g, alpha_c, fcmin)
        fullint = jnp.sum(jnp.exp(lnphi + lnfc) * w_ref[:, :])

        # per-source term
        logf50_s = _select_by_field(sfid_ref[:, :], theta_at, 3, nfields)
        lnphi_s = _lnphi(slum_ref[:, :], sch_al, lstar, phistar)
        lnom_s = slnom_ref[:, :] + _ln_fleming(slogf_ref[:, :], logf50_s,
                                               alpha_c, fcmin)
        lnpart = jnp.sum(jnp.where(smask_ref[:, :] > 0.0,
                                   lnphi_s + lnom_s, 0.0))

        out_ref[i, 0] = lnpart - fullint


def make_pallas_lnlike(ctx: LFContext, fcmin: float, nfields: int):
    """Build a (W, K) -> (W,) batched free-completeness lnlike.

    Kernel theta layout per row: [Lstar, phistar, sch_al,
    logF50_0..logF50_{F-1} (log10 cgs), alpha_c].
    """
    data = prepare_pallas_data(ctx, fcmin)
    kern = partial(_kernel, fcmin=float(fcmin), nfields=int(nfields))
    const2 = lambda w: (0, 0)

    def batched(thetas):
        wk_in, k = thetas.shape
        wk = _round_up(wk_in, BLK_W)
        if wk != wk_in:
            thetas = jnp.concatenate(
                [thetas, jnp.broadcast_to(thetas[:1],
                                          (wk - wk_in, k))])
        out = pl.pallas_call(
            kern,
            grid=(wk // BLK_W,),
            in_specs=[
                pl.BlockSpec((BLK_W, k), lambda w: (w, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(data.logL.shape, const2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(data.logf.shape, const2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(data.w.shape, const2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(data.grid_fid.shape, const2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(data.src_lum.shape, const2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(data.src_logf.shape, const2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(data.src_lnom0.shape, const2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(data.src_fid.shape, const2,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(data.src_mask.shape, const2,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK_W, 1), lambda w: (w, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((wk, 1), jnp.float32),
        )(thetas.astype(jnp.float32), data.logL, data.logf, data.w,
          data.grid_fid, data.src_lum, data.src_logf, data.src_lnom0,
          data.src_fid, data.src_mask)
        return out[:wk_in, 0]

    return batched


def make_pallas_lnprob(ctx: LFContext, layout):
    """(W, D) -> (W,) lnprob using the fused kernel, matching
    ``make_lnprob`` semantics for the free-completeness single-epoch
    model (prior mask applied outside the kernel)."""
    if layout.fix_comp or layout.fix_sch_al:
        raise ValueError("pallas path covers the free-completeness, "
                         "free-alpha flagship configuration")
    lnlike = make_pallas_lnlike(ctx, layout.fcmin, layout.nfields)
    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)

    def batched(thetas):
        thetas = thetas.astype(jnp.float32)
        # theta carries Flim in 1e-17 units; kernel wants log10 cgs
        flim = jnp.maximum(thetas[:, 3:3 + layout.nfields], 1e-6)
        kern_theta = jnp.concatenate(
            [thetas[:, :3], jnp.log10(flim) - 17.0,
             thetas[:, 3 + layout.nfields:]], axis=1)
        lnl = lnlike(kern_theta)
        ok = jnp.all((thetas >= lo) & (thetas <= hi), axis=1)
        return jnp.where(ok, lnl, -jnp.inf)

    return batched
