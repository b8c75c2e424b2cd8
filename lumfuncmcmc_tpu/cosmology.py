"""JAX-native Friedmann–Lemaître–Robertson–Walker cosmology.

Replaces the reference's runtime dependency on
``astropy.cosmology.LambdaCDM(H0=70, Om0=0.3, Ode0=0.7, Tcmb0=2.725)``
(``VmaxLumFunc.py:14-17``) and its scipy ``interp1d`` caches
(``lumfuncmcmc.py:180-202``) with a closed-form E(z) plus a dense comoving
-distance table built once on the host in float64 and evaluated on device
with ``jnp.interp`` — fully jittable and differentiable.

Physics matches astropy's ``LambdaCDM`` with a CMB temperature: photon
density from T_cmb, massless neutrinos with N_eff = 3.04, and the implied
(tiny) curvature Ok0 = 1 − Om0 − Ode0 − Or0 handled with the exact
sin/sinh transverse-distance formula.

The hand-rolled flat-wCDM helpers of the reference
(``VmaxLumFunc.py:39-43,169-196``) are superseded by this module and are
not reproduced; the astropy cosmology is the one actually used by every
live code path in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# --- physical constants (SI, CODATA 2018 — same family astropy uses) ---
_C_M_S = 2.99792458e8            # speed of light [m/s]
_G = 6.6743e-11                  # gravitational constant [m^3/kg/s^2]
_SIGMA_SB = 5.670374419e-8       # Stefan–Boltzmann [W/m^2/K^4]
_MPC_M = 3.0856775814913673e22   # megaparsec [m]
_MPC_CM = 3.0856775814913673e24  # megaparsec [cm]

# Reference uses 3.086e24 cm/Mpc in the flux<->luminosity conversions
# (lumfuncmcmc.py:70,256; VmaxLumFunc.py:737); we keep that exact constant
# for those conversions (see ops/omega.py) while the cosmology itself uses
# the full-precision value.
MPC_CM_REF = 3.086e24

# arcsec^2 per steradian (VmaxLumFunc.py:43)
SQARCSEC_PER_SR = (180.0 / np.pi * 3600.0) ** 2


@dataclass(frozen=True)
class CosmologyParams:
    H0: float = 70.0          # km/s/Mpc
    Om0: float = 0.3
    Ode0: float = 0.7
    Tcmb0: float = 2.725      # K
    Neff: float = 3.04

    @property
    def h(self) -> float:
        return self.H0 / 100.0

    @property
    def hubble_distance_mpc(self) -> float:
        return _C_M_S / (self.H0 * 1000.0 / _MPC_M) / _MPC_M

    @property
    def Ogamma0(self) -> float:
        # photon mass-energy density over critical density
        H0_si = self.H0 * 1000.0 / _MPC_M
        rho_crit = 3.0 * H0_si**2 / (8.0 * np.pi * _G)          # kg/m^3
        a_rad = 4.0 * _SIGMA_SB / _C_M_S                         # J/m^3/K^4
        rho_gamma = a_rad * self.Tcmb0**4 / _C_M_S**2            # kg/m^3
        return float(rho_gamma / rho_crit)

    @property
    def Onu0(self) -> float:
        # massless neutrinos: (7/8)(4/11)^{4/3} per effective species
        return float(self.Neff * 0.875 * (4.0 / 11.0) ** (4.0 / 3.0)
                     * self.Ogamma0)

    @property
    def Or0(self) -> float:
        return self.Ogamma0 + self.Onu0

    @property
    def Ok0(self) -> float:
        return 1.0 - self.Om0 - self.Ode0 - self.Or0


DEFAULT_COSMOLOGY = CosmologyParams()


def efunc(z, p: CosmologyParams = DEFAULT_COSMOLOGY):
    """E(z) = H(z)/H0, with matter + lambda + radiation + curvature."""
    zp1 = 1.0 + z
    return jnp.sqrt(p.Om0 * zp1**3 + p.Ok0 * zp1**2 + p.Or0 * zp1**4 + p.Ode0)


def _efunc_np(z, p: CosmologyParams):
    zp1 = 1.0 + z
    return np.sqrt(p.Om0 * zp1**3 + p.Ok0 * zp1**2 + p.Or0 * zp1**4 + p.Ode0)


@dataclass(frozen=True)
class CosmoTable:
    """Immutable device-side cosmology: dense z-grid tables + closed forms.

    Registered as a JAX pytree so it can be closed over or passed through
    ``jit`` boundaries; all fields are arrays or static floats.
    """

    zgrid: jnp.ndarray        # (n,) dense redshift grid from 0
    dc_mpc: jnp.ndarray       # (n,) line-of-sight comoving distance [Mpc]
    dm_mpc: jnp.ndarray       # (n,) transverse comoving distance [Mpc]
    dl_mpc: jnp.ndarray       # (n,) luminosity distance [Mpc]
    log10_dl_cm: jnp.ndarray  # (n,) log10( dL in cm ), reference 3.086e24 cm/Mpc
    dvdz_sr: jnp.ndarray      # (n,) differential comoving volume [Mpc^3/sr]
    vc_sr: jnp.ndarray        # (n,) cumulative comoving volume [Mpc^3/sr]

    def luminosity_distance(self, z):
        """dL(z) in Mpc (astropy ``luminosity_distance`` equivalent)."""
        return jnp.interp(z, self.zgrid, self.dl_mpc)

    def log10_dl_cm_at(self, z):
        """log10 of dL in cm — the float32-safe way to form fluxes."""
        return jnp.interp(z, self.zgrid, self.log10_dl_cm)

    def differential_comoving_volume(self, z):
        """dV/dz/dOmega in Mpc^3/sr (astropy equivalent)."""
        return jnp.interp(z, self.zgrid, self.dvdz_sr)

    def comoving_volume_between(self, z_lo, z_hi):
        """int_{z_lo}^{z_hi} dV/dz dz per steradian [Mpc^3/sr]."""
        return (jnp.interp(z_hi, self.zgrid, self.vc_sr)
                - jnp.interp(z_lo, self.zgrid, self.vc_sr))

    def z_at_log10_dl_cm(self, log_dl_cm):
        """Invert the monotone log10 dL(z) table → z.

        Replaces the reference's per-source ``fsolve`` root-solve in
        ``VmaxLumFunc.getMaxz`` (``VmaxLumFunc.py:739-753``).
        """
        return jnp.interp(log_dl_cm, self.log10_dl_cm, self.zgrid)


jax.tree_util.register_pytree_node(
    CosmoTable,
    lambda t: ((t.zgrid, t.dc_mpc, t.dm_mpc, t.dl_mpc, t.log10_dl_cm,
                t.dvdz_sr, t.vc_sr), None),
    lambda aux, ch: CosmoTable(*ch),
)


def build_cosmo_arrays(zmax: float, n: int = 32768,
                       p: CosmologyParams = DEFAULT_COSMOLOGY) -> dict:
    """Host-side float64 cosmology tables (see :func:`build_cosmo_table`).

    Returned as a dict of numpy arrays for host precompute consumers
    (context building, synthetic catalogs) that must stay float64 even
    when the device backend runs float32.
    """
    zmax = float(max(zmax, 1e-3))
    ngrid = int(n) | 1  # odd count for Simpson pairs
    z = np.linspace(0.0, zmax, ngrid)
    dz = z[1] - z[0]
    inv_e = 1.0 / _efunc_np(z, p)

    # cumulative Simpson: integral up to each even node, then fill odd
    # nodes with local 3-point (Simpson 3/8-free) half-panel estimates.
    dc = np.zeros_like(z)
    # pairwise Simpson panels [2i, 2i+2]
    panel = dz / 3.0 * (inv_e[0:-2:2] + 4.0 * inv_e[1:-1:2] + inv_e[2::2])
    dc[2::2] = np.cumsum(panel)
    # odd nodes: integrate half-panel with the quadratic through the 3
    # surrounding nodes: ∫_{x0}^{x1} ≈ dz/12 (5 f0 + 8 f1 − f2)
    dc[1::2] = dc[0:-1:2] + dz / 12.0 * (
        5.0 * inv_e[0:-1:2] + 8.0 * inv_e[1::2] - inv_e[2::2])

    d_h = p.hubble_distance_mpc
    dc_mpc = d_h * dc

    ok = p.Ok0
    if abs(ok) < 1e-12:
        dm_mpc = dc_mpc
    elif ok > 0:
        sq = np.sqrt(ok)
        dm_mpc = d_h / sq * np.sinh(sq * dc_mpc / d_h)
    else:
        sq = np.sqrt(-ok)
        dm_mpc = d_h / sq * np.sin(sq * dc_mpc / d_h)

    dl_mpc = (1.0 + z) * dm_mpc
    with np.errstate(divide="ignore"):
        log10_dl_cm = np.log10(dl_mpc * MPC_CM_REF)
    log10_dl_cm[0] = log10_dl_cm[1] - (log10_dl_cm[2] - log10_dl_cm[1])
    dvdz_sr = d_h * dm_mpc**2 / _efunc_np(z, p)

    # cumulative comoving volume per steradian, Vc(z) = int_0^z dV/dz dz —
    # lets the 1/V_eff weights (VmaxLumFunc.py:235-257, scipy.quad in the
    # reference) be evaluated in closed form: the Fleming factor of a
    # source's flux is constant along the z integral.
    vc = np.zeros_like(z)
    panel_v = dz / 3.0 * (dvdz_sr[0:-2:2] + 4.0 * dvdz_sr[1:-1:2]
                          + dvdz_sr[2::2])
    vc[2::2] = np.cumsum(panel_v)
    vc[1::2] = vc[0:-1:2] + dz / 12.0 * (
        5.0 * dvdz_sr[0:-1:2] + 8.0 * dvdz_sr[1::2] - dvdz_sr[2::2])

    return {"zgrid": z, "dc_mpc": dc_mpc, "dm_mpc": dm_mpc,
            "dl_mpc": dl_mpc, "log10_dl_cm": log10_dl_cm,
            "dvdz_sr": dvdz_sr, "vc_sr": vc}


def build_cosmo_table(zmax: float, n: int = 32768,
                      p: CosmologyParams = DEFAULT_COSMOLOGY,
                      dtype=jnp.float32) -> CosmoTable:
    """Device-side cosmology table built from the float64 host arrays.

    Comoving distance via composite Simpson cumulative integration of
    1/E(z) on a uniform grid — O((Δz)^4) accurate. The default n=32768
    keeps even the *linear interpolation* error of the downstream
    ``jnp.interp`` lookups below ~3e-8 relative for z >= 0.05, well
    inside the 1e-6 likelihood-parity budget (BASELINE.md).
    """
    t = build_cosmo_arrays(zmax, n, p)
    cast = lambda a: jnp.asarray(a, dtype=dtype)
    return CosmoTable(cast(t["zgrid"]), cast(t["dc_mpc"]),
                      cast(t["dm_mpc"]), cast(t["dl_mpc"]),
                      cast(t["log10_dl_cm"]), cast(t["dvdz_sr"]),
                      cast(t["vc_sr"]))
