"""Independent NumPy/SciPy transcription of the reference math.

These are *clean-room* re-derivations of the formulas in
/root/reference (cited per function) used as test oracles for the JAX
kernels. They intentionally use scipy/mpmath (trusted, adaptive,
float64) — the exact opposite implementation strategy from the JAX
library — so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad

LN10 = np.log(10.0)
SQARCSEC = (180.0 / np.pi * 3600.0) ** 2


def ref_true_lum_func(logL, alpha, logLstar, logphistar):
    # lumfuncmcmc.py:25-44
    return (LN10 * 10.0**logphistar
            * 10.0 ** ((logL - logLstar) * (alpha + 1))
            * np.exp(-(10.0 ** (logL - logLstar))))


def ref_inverse_fleming(f50, alpha, fcmin=0.1):
    # VmaxLumFunc.py:143-167
    a = (2 * fcmin - 1) ** 2
    b = -((abs(a / (1 - a)) * alpha**-2.0) ** 0.5)
    return f50 * 10.0**b


def ref_fleming(f, Flim=3.0e-17, alpha=3.5, fcmin=0.1):
    # VmaxLumFunc.py:95-127
    f = np.asarray(f, dtype=float)
    numerator = alpha * np.log10(f / Flim)
    fc = 0.5 * (1.0 + numerator / np.sqrt(1.0 + numerator**2))
    if not fcmin:
        return fc
    f_tau = ref_inverse_fleming(Flim, alpha, fcmin)
    fc_decay = 1.0 - np.exp(-f / f_tau)
    return fc**(1.0 / fc_decay)


def ref_p(F, Flim=3.0e-17, alpha=-3.5):
    # VmaxLumFunc.py:79-81
    x = 2.5 * alpha * np.log10(F / Flim)
    return 0.5 * (1.0 - x / np.sqrt(1.0 + x**2))


def ref_omega(logL, z, dl_mpc_func, Omega_0, Flim, alpha, fcmin=0.1):
    # lumfuncmcmc.py:47-70 (dL in Mpc -> cm with the reference's 3.086e24)
    L = 10.0**np.asarray(logL, dtype=float)
    f = L / (4.0 * np.pi * (3.086e24 * dl_mpc_func(z)) ** 2)
    return Omega_0 / SQARCSEC * ref_fleming(f, Flim, alpha, fcmin)


def ref_quad_coef(y1, y2, y3, z1, z2, z3):
    # lumfuncmcmc_z.py:26-43
    a = ((y3 - y1) + (y2 - y1) * (z1 - z3) / (z2 - z1)) / (
        z3**2 - z1**2 + (z2**2 - z1**2) * (z1 - z3) / (z2 - z1))
    b = (y2 - y1 - a * (z2**2 - z1**2)) / (z2 - z1)
    c = y1 - a * z1**2 - b * z1
    return a, b, c


def ref_schechter_z(L, z, al, L1, L2, L3, p1, p2, p3, z1, z2, z3):
    # lumfuncmcmc_z.py:45-67
    aphi, bphi, cphi = ref_quad_coef(p1, p2, p3, z1, z2, z3)
    alum, blum, clum = ref_quad_coef(L1, L2, L3, z1, z2, z3)
    phistar = aphi * z**2 + bphi * z + cphi
    Lstar = alum * z**2 + blum * z + clum
    return ref_true_lum_func(L, al, Lstar, phistar)


def ref_upper_gamma(a, x):
    """mpmath-backed Gamma(a, x) (VmaxLumFunc.py:61,69 trusted value)."""
    import mpmath
    return float(mpmath.gammainc(a, x))


# --- cosmology: direct adaptive-quadrature FLRW implementation ---

class RefCosmo:
    """astropy-LambdaCDM-equivalent (H0=70, Om0=.3, Ode0=.7, Tcmb0=2.725,
    Neff=3.04 massless) with scipy adaptive integration: the test oracle
    for cosmology.build_cosmo_table (VmaxLumFunc.py:14-17)."""

    def __init__(self, H0=70.0, Om0=0.3, Ode0=0.7, Tcmb0=2.725, Neff=3.04):
        c = 2.99792458e8
        G = 6.6743e-11
        sigma = 5.670374419e-8
        mpc = 3.0856775814913673e22
        H0si = H0 * 1000.0 / mpc
        rho_crit = 3 * H0si**2 / (8 * np.pi * G)
        ogamma = (4 * sigma / c) * Tcmb0**4 / c**2 / rho_crit
        onu = Neff * 0.875 * (4.0 / 11.0) ** (4.0 / 3.0) * ogamma
        self.Or0 = ogamma + onu
        self.Om0, self.Ode0 = Om0, Ode0
        self.Ok0 = 1.0 - Om0 - Ode0 - self.Or0
        self.dh_mpc = c / H0si / mpc

    def efunc(self, z):
        zp1 = 1.0 + z
        return np.sqrt(self.Om0 * zp1**3 + self.Ok0 * zp1**2
                       + self.Or0 * zp1**4 + self.Ode0)

    def comoving_distance(self, z):
        val, _ = quad(lambda zz: 1.0 / self.efunc(zz), 0.0, z,
                      epsabs=1e-13, epsrel=1e-13)
        return self.dh_mpc * val

    def transverse_comoving_distance(self, z):
        dc = self.comoving_distance(z)
        ok = self.Ok0
        if abs(ok) < 1e-12:
            return dc
        sq = np.sqrt(abs(ok))
        x = sq * dc / self.dh_mpc
        if ok > 0:
            return self.dh_mpc / sq * np.sinh(x)
        return self.dh_mpc / sq * np.sin(x)

    def luminosity_distance(self, z):
        return (1.0 + z) * self.transverse_comoving_distance(z)

    def differential_comoving_volume(self, z):
        dm = self.transverse_comoving_distance(z)
        return self.dh_mpc * dm**2 / self.efunc(z)
