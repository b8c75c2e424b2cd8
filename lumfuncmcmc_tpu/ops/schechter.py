"""Schechter luminosity-function forms.

One shared set of jittable kernels replacing the four duplicated/variant
definitions in the reference:

- ``TrueLumFunc`` (``lumfuncmcmc.py:25-44``, duplicated verbatim at
  ``lumfuncmcmc_z.py:69-88``) → :func:`true_lum_func` /
  :func:`log_true_lum_func`.
- ``schechter`` / ``schechter_log`` / ``schechter_integ`` /
  ``schechter_integ_log`` (``VmaxLumFunc.py:50-77``) → same names here,
  with ``mpmath.gammainc`` replaced by a jittable upper incomplete gamma
  (:mod:`lumfuncmcmc_tpu.ops.gamma`) valid for the negative shape
  parameters (alpha+1 < 0) these fits produce.
- ``getQuadCoef`` / ``schechter_z`` (``lumfuncmcmc_z.py:26-67``) →
  :func:`quad_coef` / :func:`schechter_z`.

All kernels are elementwise VPU work; the log-space forms are exact in
float32 over the full dynamic range (fluxes ~1e-17, luminosities ~1e42)
because nothing ever leaves log10 space until the final exp.
"""

from __future__ import annotations

import jax.numpy as jnp

from lumfuncmcmc_tpu.ops.gamma import upper_gamma

LN10 = 2.302585092994046


def log_true_lum_func(logL, alpha, logLstar, logphistar):
    """ln of the log-space Schechter function phi(logL) [Mpc^-3 dex^-1].

    ln phi = ln(ln 10) + ln10*logphistar + ln10*(logL-logLstar)*(alpha+1)
             - 10^(logL-logLstar)

    This is the float32-safe primitive; ``true_lum_func`` is exp of it.
    """
    x = logL - logLstar
    return (jnp.log(LN10) + LN10 * logphistar + LN10 * x * (alpha + 1.0)
            - jnp.exp(LN10 * x))


def true_lum_func(logL, alpha, logLstar, logphistar):
    """Schechter phi(logL) in Mpc^-3 dex^-1 (``lumfuncmcmc.py:25-44``)."""
    return jnp.exp(log_true_lum_func(logL, alpha, logLstar, logphistar))


def schechter(L, al, phistar, Lstar):
    """Linear-space Schechter dn/d(L/L*) (``VmaxLumFunc.py:50-52``)."""
    x = L / Lstar
    return phistar * x**al * jnp.exp(-x)


def schechter_log(L, al, phistar, Lstar):
    """Log-space Schechter with log params (``VmaxLumFunc.py:54-56``)."""
    return true_lum_func(L, al, Lstar, phistar)


def schechter_integ(L, al, integ, Lstar):
    """Schechter with total integral as the amplitude parameter
    (``VmaxLumFunc.py:58-63``): integ = phistar * Gamma(al+1, 1e36/L*).
    """
    integ_nophi = upper_gamma(al + 1.0, 1.0e36 / Lstar)
    phistar = integ / integ_nophi
    return schechter(L, al, phistar, Lstar)


def schechter_integ_log(L, al, integ, Lstar):
    """Log-space integral-parameterized Schechter (``VmaxLumFunc.py:65-77``);
    integ and Lstar are log10 quantities.
    """
    integ_nophi = upper_gamma(al + 1.0, 10.0 ** (36.0 - Lstar))
    phistar = integ - jnp.log10(integ_nophi)
    return schechter_log(L, al, phistar, Lstar)


def quad_coef(y1, y2, y3, z1, z2, z3):
    """Quadratic coefficients through three pivots (``lumfuncmcmc_z.py:26-43``,
    Leja et al. 2020 style): y = a z^2 + b z + c.
    """
    a = ((y3 - y1) + (y2 - y1) * (z1 - z3) / (z2 - z1)) / (
        z3**2 - z1**2 + (z2**2 - z1**2) * (z1 - z3) / (z2 - z1))
    b = (y2 - y1 - a * (z2**2 - z1**2)) / (z2 - z1)
    c = y1 - a * z1**2 - b * z1
    return a, b, c


def log_schechter_z(logL, z, al, L1, L2, L3, phi1, phi2, phi3, z1, z2, z3):
    """ln phi(logL, z) with (logL*, logphi*) quadratic in z through three
    pivot values (``lumfuncmcmc_z.py:45-67``). Fully vectorized over
    (logL, z) arrays of any matching shape.
    """
    aphi, bphi, cphi = quad_coef(phi1, phi2, phi3, z1, z2, z3)
    alum, blum, clum = quad_coef(L1, L2, L3, z1, z2, z3)
    phistar = aphi * z**2 + bphi * z + cphi
    Lstar = alum * z**2 + blum * z + clum
    return log_true_lum_func(logL, al, Lstar, phistar)


def schechter_z(logL, z, al, L1, L2, L3, phi1, phi2, phi3, z1, z2, z3):
    """phi(logL, z) for the redshift-evolving model (``lumfuncmcmc_z.py:45-67``)."""
    return jnp.exp(log_schechter_z(logL, z, al, L1, L2, L3,
                                   phi1, phi2, phi3, z1, z2, z3))
