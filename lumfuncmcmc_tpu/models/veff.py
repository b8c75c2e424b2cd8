"""1/V_eff binned luminosity-function estimator with bootstrap errors.

Replaces the Python-loop/scipy.quad/fsolve stack of the reference:

- per-source weights ``lumfunc``/``lumfuncintv2`` (``VmaxLumFunc.py:
  198-257``) — the integrand's Fleming factor is constant along z, so the
  weight is closed-form with the cumulative comoving-volume table::

      w_i = 1 / ( Omega_sr * fc(F_i) * [Vc(zmax_i) - Vc(zmin)] )

  with zmax_i = min(zmax, z at which L_i hits the field's min flux),
  replacing ``getMaxz``'s per-source fsolve (``VmaxLumFunc.py:739-753``)
  by a monotone inversion of the dL table;
- binning + bootstrap ``getBootErrLog``/``getBootErr``
  (``VmaxLumFunc.py:304-449``) — the (nboot x nbins) Python double loop
  becomes one gathered one-hot matmul on the MXU;
- partial-bin completeness correction ``get_mult_factor``
  (``VmaxLumFunc.py:755-777``) via fixed-order Gauss–Legendre.

Reference bin-edge conventions preserved exactly: log version uses edges
``linspace(min(L)*1.001, max(L), nbin+1)`` (the faintest source falls
below bin 0 and is excluded — a reference semantic, kept), linear version
starts at ``get_L_constF(Fmin, zmax)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lumfuncmcmc_tpu.cosmology import CosmoTable, SQARCSEC_PER_SR
from lumfuncmcmc_tpu.ops.completeness import fleming_from_logf
from lumfuncmcmc_tpu.ops.omega import LOG10_4PI as _LOG10_4PI
from lumfuncmcmc_tpu.ops.quadrature import integrate_gl_unit



def max_z_for_lum(lum, logfmin, cosmo: CosmoTable):
    """Redshift at which log-luminosity ``lum`` dims to log-flux
    ``logfmin`` (``getMaxz``, ``VmaxLumFunc.py:739-753``), by inverting
    the monotone log-dL table."""
    log_dl = 0.5 * (lum - logfmin - _LOG10_4PI)
    return cosmo.z_at_log10_dl_cm(log_dl)


def veff_weights(logf_src, lum, logF50_src, roots_logf_src, omega0_total,
                 zmin, zmax, alpha_c, cosmo: CosmoTable, fcmin=0.1,
                 min_comp_frac=0.5):
    """Per-source 1/V_eff weights (vectorized ``VeffLF`` loop,
    ``lumfuncmcmc.py:515-525``).

    ``omega0_total`` is the summed area of all fields in arcsec^2 — the
    reference passes ``sum(self.Omega_0)`` for every source. Sources whose
    zmax does not exceed zmin get weight 0.
    """
    if min_comp_frac <= 0.001:
        zmax_i = jnp.full_like(lum, zmax)
    else:
        zmax_i = jnp.minimum(zmax, max_z_for_lum(lum, roots_logf_src, cosmo))
    fc = fleming_from_logf(logf_src, logF50_src, alpha_c, fcmin)
    vol = cosmo.comoving_volume_between(zmin, zmax_i)          # Mpc^3/sr
    integ = omega0_total / SQARCSEC_PER_SR * fc * vol
    w = jnp.where((zmax_i > zmin) & (integ > 0.0), 1.0 / integ, 0.0)
    return w


@partial(jax.jit, static_argnames=("nboot", "nbins", "log_bins"))
def binned_lf_bootstrap(key, lum, phi, edges, nboot: int, nbins: int,
                        log_bins: bool = True):
    """Binned LF + bootstrap variance.

    Returns (Lavg, lfbinorig, var): bin centers, sum(phi)/dL per bin (log
    version; linear version leaves the dL division out,
    ``VmaxLumFunc.py:304-449``), and the ddof=1 bootstrap variance with
    the reference's positive floor for zero entries.

    Memory: the resamples run as a ``lax.scan`` of per-resample
    segment-sums — O(N) working set, so the 1e6-source mega-catalog fits
    (a gathered one-hot formulation would need nboot*N*nbins elements).
    """
    if nbins < 2:
        # lavg[1] - lavg[0] would clamp to 0 under jit's out-of-bounds
        # gather semantics and silently divide by zero
        raise ValueError("binned_lf_bootstrap needs nbins >= 2")
    n = lum.shape[0]
    lavg = 0.5 * (edges[:-1] + edges[1:])
    dl = lavg[1] - lavg[0]
    denom = dl if log_bins else 1.0

    bin_idx = jnp.clip(jnp.searchsorted(edges, lum, side="right") - 1,
                       0, nbins - 1)
    inside = ((lum >= edges[0]) & (lum < edges[-1])).astype(phi.dtype)
    contrib = phi * inside
    lfbinorig = jnp.zeros(nbins, phi.dtype).at[bin_idx].add(contrib) \
        / denom

    def one_resample(carry, key_k):
        idx = jax.random.randint(key_k, (n,), 0, n)
        lf_k = jnp.zeros(nbins, phi.dtype).at[bin_idx[idx]].add(
            contrib[idx]) / denom
        return carry, lf_k

    keys = jax.random.split(key, nboot)
    _, lfbin = jax.lax.scan(one_resample, 0, keys)   # (nboot, nbins)
    binavg = jnp.mean(lfbin, axis=0)
    var = jnp.sum((lfbin - binavg) ** 2, axis=0) / (nboot - 1)
    # floor zero/negative variances at the smallest positive value
    pos = jnp.where(var > 0.0, var, jnp.inf)
    var = jnp.where(var <= 0.0, jnp.min(pos), var)
    return lavg, lfbinorig, var


def log_bin_edges(lum, nbins: int):
    """Reference log-space edges (``VmaxLumFunc.py:340``)."""
    return jnp.linspace(jnp.min(lum) * 1.001, jnp.max(lum), nbins + 1)


def linear_bin_edges(lum_linear, logfmin, zmax, cosmo: CosmoTable,
                     nbins: int):
    """Reference linear-space edges: from the luminosity of the minimum
    flux at zmax up to max(L) (``getBootErr``, ``VmaxLumFunc.py:411-413``).
    ``lum_linear`` is linear luminosity [erg/s]."""
    lmin = 10.0 ** (logfmin + _LOG10_4PI
                    + 2.0 * cosmo.log10_dl_cm_at(zmax))
    return jnp.linspace(lmin, jnp.max(lum_linear), nbins + 1)


def apply_partial_bin_correction(edges, lfbinorig, var, logfmin, zmin,
                                 zmax, cosmo: CosmoTable):
    """Scale partially-covered faint bins by the ``get_mult_factor``
    ratio (``getBootErrLog`` correct_low branch, ``VmaxLumFunc.py:
    363-378``): walk up from the faintest bin until the factor is 1."""
    edges = np.asarray(edges)
    lf = np.array(lfbinorig, dtype=np.float64)
    vr = np.array(var, dtype=np.float64)
    for j in range(len(lf)):
        m = float(mult_factor(jnp.asarray(edges[j]),
                              jnp.asarray(edges[j + 1]), logfmin,
                              zmin, zmax, cosmo))
        if abs(m - 1.0) < 1.0e-8:
            break
        lf[j] *= m
        vr[j] *= m * m
    return lf, vr


def mult_factor(lum0, lum1, logfmin, zmin, zmax, cosmo: CosmoTable,
                n_nodes: int = 128):
    """Partial-bin completeness correction (``get_mult_factor``,
    ``VmaxLumFunc.py:755-777``): ratio of the full (z x L) bin rectangle
    to the part above the minimum-luminosity curve Lmin(z)."""
    def covered_width(zq):
        lmin_z = logfmin + _LOG10_4PI + 2.0 * cosmo.log10_dl_cm_at(zq)
        return jnp.clip(lum1 - lmin_z, 0.0, lum1 - lum0)

    denom = integrate_gl_unit(covered_width, n_nodes, zmin, zmax)
    full = (zmax - zmin) * (lum1 - lum0)
    lmin_at_zmin = logfmin + _LOG10_4PI + 2.0 * cosmo.log10_dl_cm_at(zmin)
    lmin_at_zmax = logfmin + _LOG10_4PI + 2.0 * cosmo.log10_dl_cm_at(zmax)
    out = jnp.where(lmin_at_zmin >= lum1, jnp.inf,
                    jnp.where(lmin_at_zmax <= lum0, 1.0, full / denom))
    return out


def equal_count_z_bins(z, numbins: int):
    """Equal-count bin index per object (``get_bins``,
    ``VmaxLumFunc.py:45-48``) — host-side numpy."""
    z = np.asarray(z)
    idx = np.linspace(0, numbins, z.size, endpoint=False).astype(int)
    return idx[z.argsort().argsort()]
