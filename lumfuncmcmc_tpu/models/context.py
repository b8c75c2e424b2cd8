"""Immutable precomputed likelihood context (the "model build" step).

Replaces the stateful precompute stack of ``LumFuncMCMC.__init__``
(``lumfuncmcmc.py:162-249``: ``defineFlimOmArr`` / ``getRoot`` /
``setDLdVdz`` / ``setOmegaLz`` / ``setlnsimple``) with a single host-side
builder producing two frozen pytrees:

- :class:`LFData` — the concatenated catalog (lum/flux/z + per-source
  field id), float32-castable;
- :class:`LFContext` — the frozen likelihood grids and caches.

Reference semantics deliberately preserved (SURVEY.md §3.2):

- The z-dependent logL integration grid has lower bound
  ``max(minlum_field(z_j), min(lum))`` and is **frozen at build time with
  the initial completeness parameters** — the free-completeness
  likelihood re-evaluates Omega on this fixed grid rather than re-deriving
  the bounds (``lumfuncmcmc.py:228-231, 375``).
- Grid sizes: 101 nodes (free completeness) / 201 (fixed)
  (``lumfuncmcmc.py:219-220``); overridable via config.

Reference quirks deliberately *fixed* (documented deviations):

- per-source ``Omega_0`` was truncated to int arcsec^2
  (``lumfuncmcmc.py:285`` ``dtype=int``); we keep floats.
- completeness roots came from a 201x201 cubic spline of fsolve results
  (``lumfuncmcmc.py:272-281``); we bisect exactly per field.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.cosmology import (
    CosmoTable, build_cosmo_arrays, SQARCSEC_PER_SR)
from lumfuncmcmc_tpu.ops.completeness import (
    fleming_from_logf_np, fleming_root_logf_np)
from lumfuncmcmc_tpu.ops.omega import (
    LOG10_4PI as _LOG10_4PI, logflux_from_loglum, loglum_from_logflux)



@dataclass(frozen=True)
class LFData:
    """Concatenated multi-field catalog arrays."""

    z: jnp.ndarray          # (N,) redshifts
    lum: jnp.ndarray        # (N,) log10 L [erg/s]
    lum_e: Optional[jnp.ndarray]   # (N,) log10 L errors (or None)
    flux: jnp.ndarray       # (N,) flux [erg/cm^2/s]
    flux_e: Optional[jnp.ndarray]  # (N,) flux errors (or None)
    field_id: jnp.ndarray   # (N,) int32 field index per source


@dataclass(frozen=True)
class LFContext:
    """Frozen likelihood grids + caches. All arrays device-resident."""

    # --- catalog-derived scalars for the collapsed ln-term ---
    nsrc: jnp.ndarray             # () N as float
    sum_lum: jnp.ndarray          # () sum of log-luminosities
    lref: jnp.ndarray             # () max(lum) — scaling anchor
    sum_pow_lum: jnp.ndarray      # () sum of 10^(lum - lref)
    sum_ln_om: jnp.ndarray        # () sum of ln Omega(lum_n, z_n) at the
                                  #    build-time completeness parameters
    # --- same scalars per field (hierarchical multi-field model) ---
    nsrc_f: jnp.ndarray           # (F,)
    sum_lum_f: jnp.ndarray        # (F,)
    sum_pow_lum_f: jnp.ndarray    # (F,) sum of 10^(lum - lref) per field
    sum_ln_om_f: jnp.ndarray      # (F,)
    # --- per-source arrays (for free-completeness / z-evolving paths) ---
    lum: jnp.ndarray              # (N,)
    zsrc: jnp.ndarray             # (N,)
    logf_src: jnp.ndarray         # (N,) log10 implied source flux
    omega0_src: jnp.ndarray       # (N,) per-source survey area (arcsec^2)
    ln_om_src: jnp.ndarray        # (N,) ln Omega at build-time parameters
    field_id: jnp.ndarray         # (N,)
    src_mask: jnp.ndarray         # (N,) 1 for real sources, 0 for padding
                                  #    (source-axis sharding pads N to a
                                  #    multiple of the mesh axis)
    # --- frozen quadrature grids ---
    zarr: jnp.ndarray             # (F, S) z nodes per field (gauss mode
                                  #    splits the z panel at the kink
                                  #    where minlum(z) crosses min(lum),
                                  #    so nodes differ per field; trapz
                                  #    mode replicates one shared grid)
    log_dl_zarr: jnp.ndarray      # (F, S) log10 dL(zarr) [cm]
    volume_part: jnp.ndarray      # (F, S) dV/dz(zarr) [Mpc^3/sr]
    logL_grid: jnp.ndarray        # (F, S, S) logL[f, i, j]; i=L node, j=z node
    w_fixed: jnp.ndarray          # (F, S, S) full weights incl. frozen Omega:
                                  #    integral = sum(phi * w_fixed)
    w_open: jnp.ndarray           # (F, S, S) weights excl. Omega (for paths
                                  #    that recompute Omega from theta)
    logf_grid: jnp.ndarray        # (F, S, S) log10 implied flux on the grid
    # --- scalars ---
    z_lo: jnp.ndarray             # () catalog z range (replicated scalars;
    z_hi: jnp.ndarray             # () safe under any source sharding)
    # --- per-field parameters ---
    omega0_f: jnp.ndarray         # (F,)
    logF50_f: jnp.ndarray         # (F,) log10 of build-time Flim [cgs]
    alpha_c: jnp.ndarray          # () build-time completeness alpha
    roots_logf: jnp.ndarray       # (F,) log10 min-flux at min_comp_frac
    # --- cosmology ---
    cosmo: CosmoTable


_DATA_FIELDS = ("z", "lum", "lum_e", "flux", "flux_e", "field_id")
jax.tree_util.register_pytree_node(
    LFData,
    lambda d: (tuple(getattr(d, f) for f in _DATA_FIELDS), None),
    lambda aux, ch: LFData(*ch),
)

_CTX_FIELDS = (
    "nsrc", "sum_lum", "lref", "sum_pow_lum", "sum_ln_om",
    "nsrc_f", "sum_lum_f", "sum_pow_lum_f", "sum_ln_om_f",
    "lum", "zsrc", "logf_src", "omega0_src", "ln_om_src", "field_id",
    "src_mask",
    "zarr", "log_dl_zarr", "volume_part", "logL_grid",
    "w_fixed", "w_open", "logf_grid", "z_lo", "z_hi",
    "omega0_f", "logF50_f", "alpha_c", "roots_logf", "cosmo",
)
jax.tree_util.register_pytree_node(
    LFContext,
    lambda c: (tuple(getattr(c, f) for f in _CTX_FIELDS), None),
    lambda aux, ch: LFContext(*ch),
)


def propagate_flux_to_lum(flux, flux_e, log_dl_cm):
    """log L and its error from flux via the delta method.

    sigma_logL = sigma_F / (F ln 10) — the linearization the reference
    obtains through ``uncertainties.unumpy`` (``lumfuncmcmc.py:251-260``).
    """
    lum = loglum_from_logflux(np.log10(flux), log_dl_cm)
    lum_e = None if flux_e is None else flux_e / (flux * np.log(10.0))
    return lum, lum_e


def propagate_lum_to_flux(lum, lum_e, log_dl_cm):
    """Inverse conversion (``lumfuncmcmc.py:262-270``)."""
    logf = logflux_from_loglum(lum, log_dl_cm)
    flux = 10.0**logf
    flux_e = None if lum_e is None else lum_e * np.log(10.0) * flux
    return flux, flux_e


def build_context(cfg: LFConfig,
                  z,
                  flux=None, flux_e=None,
                  lum=None, lum_e=None,
                  field_id=None,
                  dtype=None):
    """Build (LFData, LFContext) from a concatenated catalog.

    Parameters mirror ``LumFuncMCMC.__init__`` (``lumfuncmcmc.py:73-178``)
    but take already-concatenated arrays plus a per-source ``field_id``
    instead of per-field lists + offset vector. ``flux``/``flux_e`` are in
    units of 1e-17 erg/cm^2/s (reference convention,
    ``lumfuncmcmc.py:166``).

    All precompute runs in float64 numpy on the host; the returned pytrees
    are cast to ``dtype`` (default: float64 if x64 is enabled, else
    float32).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    z = np.asarray(z, dtype=np.float64)
    n = z.shape[0]
    if n == 0:
        raise ValueError("empty catalog: no sources after cuts")
    if field_id is None:
        field_id = np.zeros(n, dtype=np.int32)
    field_id = np.asarray(field_id, dtype=np.int32)
    nfields = len(cfg.Flim)
    if field_id.min() < 0:
        raise ValueError("field_id contains negative entries")
    if field_id.max() >= nfields:
        raise ValueError(
            f"field_id goes up to {int(field_id.max())} but the config "
            f"provides only {nfields} Flim values — per-field gathers "
            f"would clamp silently; supply one Flim/Omega_0 per field")
    if len(cfg.Omega_0) < nfields:
        raise ValueError(
            f"Omega_0 has {len(cfg.Omega_0)} entries for {nfields} "
            f"fields")

    zmin, zmax = float(z.min()), float(z.max())
    tabs = build_cosmo_arrays(zmax=1.05 * zmax + 0.1)
    cosmo = CosmoTable(*(jnp.asarray(tabs[k], dtype=dtype) for k in
                         ("zgrid", "dc_mpc", "dm_mpc", "dl_mpc",
                          "log10_dl_cm", "dvdz_sr", "vc_sr")))
    zg = tabs["zgrid"]
    logdl_tab = tabs["log10_dl_cm"]
    dvdz_tab = tabs["dvdz_sr"]

    def log_dl_cm(zq):
        return np.interp(zq, zg, logdl_tab)

    def dvdz(zq):
        return np.interp(zq, zg, dvdz_tab)

    # --- fluxes <-> luminosities (C15) ---
    log_dl_src = log_dl_cm(z)
    if flux is not None:
        flux = 1.0e-17 * np.asarray(flux, dtype=np.float64)
        flux_e = None if flux_e is None else 1.0e-17 * np.asarray(
            flux_e, dtype=np.float64)
        lum, lum_e = propagate_flux_to_lum(flux, flux_e, log_dl_src)
    else:
        lum = np.asarray(lum, dtype=np.float64)
        lum_e = None if lum_e is None else np.asarray(lum_e, dtype=np.float64)
        flux, flux_e = propagate_lum_to_flux(lum, lum_e, log_dl_src)

    # --- per-field build-time completeness parameters ---
    flim_cgs = 1.0e-17 * np.asarray(cfg.Flim, dtype=np.float64)
    logF50 = np.log10(flim_cgs)
    alpha_c = float(cfg.alpha)

    if cfg.min_comp_frac > 0.001:
        roots_logf = fleming_root_logf_np(logF50, alpha_c,
                                          cfg.min_comp_frac, cfg.fcmin)
    else:
        roots_logf = np.full(nfields, -np.inf)

    # --- frozen likelihood grids (setlnsimple, lumfuncmcmc.py:217-235) ---
    gauss = cfg.quadrature == "gauss"
    if cfg.size_ln is not None:
        size = int(cfg.size_ln)
    elif gauss:
        size = 32  # split-panel GL-32 beats the reference's trapz-201 by
                   # orders of magnitude (see tests/test_quadrature_modes)
    else:
        size = 201 if cfg.fix_comp else 101

    lum_floor = float(lum.min())

    def minlum_of_z(f, zq):
        if cfg.min_comp_frac > 0.001:
            return np.maximum(roots_logf[f] + _LOG10_4PI
                              + 2.0 * log_dl_cm(zq), lum_floor)
        return np.full_like(np.asarray(zq, dtype=np.float64), lum_floor)

    if gauss:
        u_nodes, u_w = np.polynomial.legendre.leggauss(size)
        u_nodes = 0.5 * (u_nodes + 1.0)
        u_w = 0.5 * u_w
        # Per field, split the z integral at the kink where the
        # completeness luminosity floor crosses min(lum): the integrand is
        # analytic on each panel, so GL converges spectrally.
        zarr = np.empty((nfields, size))
        wz_arr = np.empty((nfields, size))
        for f in range(nfields):
            zstar = None
            if cfg.min_comp_frac > 0.001:
                raw = (roots_logf[f] + _LOG10_4PI
                       + 2.0 * log_dl_cm(np.array([zmin, zmax])))
                if raw[0] < lum_floor < raw[1]:
                    # monotone in z: invert via the dl table
                    target_logdl = 0.5 * (lum_floor - roots_logf[f]
                                          - _LOG10_4PI)
                    zstar = float(np.interp(target_logdl, logdl_tab, zg))
            if zstar is None or not (zmin < zstar < zmax):
                zarr[f] = zmin + u_nodes * (zmax - zmin)
                wz_arr[f] = u_w * (zmax - zmin)
            else:
                n1 = size // 2
                n2 = size - n1
                x1, w1 = np.polynomial.legendre.leggauss(n1)
                x2, w2 = np.polynomial.legendre.leggauss(n2)
                zarr[f, :n1] = zmin + 0.5 * (x1 + 1.0) * (zstar - zmin)
                wz_arr[f, :n1] = 0.5 * w1 * (zstar - zmin)
                zarr[f, n1:] = zstar + 0.5 * (x2 + 1.0) * (zmax - zstar)
                wz_arr[f, n1:] = 0.5 * w2 * (zmax - zstar)
    else:
        zarr1 = np.linspace(zmin, zmax, size)
        wz = np.ones(size); wz[0] = wz[-1] = 0.5
        zarr = np.tile(zarr1, (nfields, 1))
        wz_arr = np.tile(wz * (zmax - zmin) / (size - 1), (nfields, 1))

    log_dl_zarr = log_dl_cm(zarr)                   # (F, S)
    volume_part = dvdz(zarr)                        # (F, S)
    minlum = np.stack([minlum_of_z(f, zarr[f]) for f in range(nfields)])

    span = cfg.Lh - minlum                          # (F, S) column spans
    if gauss:
        # logL[f, i, j] = minlum[f, j] + u_i * span[f, j]
        logL_grid = (minlum[:, None, :]
                     + u_nodes[None, :, None] * span[:, None, :])
        wL_col = u_w[None, :, None] * span[:, None, :]   # (F, S, S)
        w_open = wL_col * (wz_arr * volume_part)[:, None, :]
    else:
        # reference semantics: logL[f, :, j] = linspace(minlum, Lh, size)
        ii = np.linspace(0.0, 1.0, size)[None, :, None]
        logL_grid = minlum[:, None, :] + ii * span[:, None, :]
        dL_col = span / (size - 1)                  # (F, S) per-column dx
        wL = np.ones(size); wL[0] = wL[-1] = 0.5
        w_open = (wL[None, :, None]
                  * (wz_arr * volume_part)[:, None, :]
                  * dL_col[:, None, :])

    # frozen Omega on the grid (exact, not the reference's 501x501 spline)
    logf_grid = logL_grid - _LOG10_4PI - 2.0 * log_dl_zarr[:, None, :]
    omega0_arr = np.asarray(cfg.Omega_0, dtype=np.float64)
    om_grid = (omega0_arr[:, None, None] / SQARCSEC_PER_SR
               * fleming_from_logf_np(logf_grid, logF50[:, None, None],
                                      alpha_c, cfg.fcmin))
    w_fixed = w_open * om_grid

    # --- per-source Omega at build-time parameters ---
    omega0_f = omega0_arr
    omega0_src = omega0_f[field_id]
    logF50_src = logF50[field_id]
    logf_src = lum - _LOG10_4PI - 2.0 * log_dl_src
    om_src = (omega0_src / SQARCSEC_PER_SR
              * fleming_from_logf_np(logf_src, logF50_src, alpha_c,
                                     cfg.fcmin))
    if not np.all(om_src > 0.0):
        # a source >~2.5 dex below its field's F50 underflows the
        # Fleming curve to exactly 0, which would bake ln(0) = -inf
        # into every likelihood evaluation (reachable with -mcf 0,
        # where no completeness cut is applied at read time)
        bad = int(np.sum(om_src <= 0.0))
        raise ValueError(
            f"{bad} source(s) have zero completeness at their flux "
            "(far below the field's F50) — every lnlike would be -inf. "
            "Raise min_comp_frac or remove the sources.")
    ln_om_src = np.log(om_src)

    lref = float(lum.max())

    cast = lambda a: jnp.asarray(a, dtype=dtype)
    data = LFData(
        z=cast(z), lum=cast(lum),
        lum_e=None if lum_e is None else cast(lum_e),
        flux=cast(flux),
        flux_e=None if flux_e is None else cast(flux_e),
        field_id=jnp.asarray(field_id),
    )
    pow_lum = 10.0 ** (lum - lref)
    nsrc_f = np.bincount(field_id, minlength=nfields).astype(np.float64)
    sum_lum_f = np.bincount(field_id, weights=lum, minlength=nfields)
    sum_pow_f = np.bincount(field_id, weights=pow_lum, minlength=nfields)
    sum_lnom_f = np.bincount(field_id, weights=ln_om_src,
                             minlength=nfields)

    ctx = LFContext(
        nsrc=cast(float(n)),
        sum_lum=cast(lum.sum()),
        lref=cast(lref),
        sum_pow_lum=cast(pow_lum.sum()),
        sum_ln_om=cast(ln_om_src.sum()),
        nsrc_f=cast(nsrc_f),
        sum_lum_f=cast(sum_lum_f),
        sum_pow_lum_f=cast(sum_pow_f),
        sum_ln_om_f=cast(sum_lnom_f),
        lum=cast(lum), zsrc=cast(z), logf_src=cast(logf_src),
        omega0_src=cast(omega0_src), ln_om_src=cast(ln_om_src),
        field_id=jnp.asarray(field_id),
        src_mask=cast(np.ones(n)),
        z_lo=cast(zmin), z_hi=cast(zmax),
        zarr=cast(zarr), log_dl_zarr=cast(log_dl_zarr),
        volume_part=cast(volume_part),
        logL_grid=cast(logL_grid), w_fixed=cast(w_fixed),
        w_open=cast(w_open), logf_grid=cast(logf_grid),
        omega0_f=cast(omega0_f), logF50_f=cast(logF50),
        alpha_c=cast(alpha_c), roots_logf=cast(roots_logf),
        cosmo=cosmo,
    )
    return data, ctx
