"""Omega(logL, z): effective fractional survey solid angle.

Replaces ``Omega`` (``lumfuncmcmc.py:47-70``, duplicated at
``lumfuncmcmc_z.py:91-116``) and the per-field 501x501
``RectBivariateSpline`` caches (``setOmegaLz``, ``lumfuncmcmc.py:204-215``).

Because Omega is closed-form given log10 dL(z) — solid-angle fraction
times the Fleming completeness of the implied flux — we evaluate it
exactly everywhere instead of through a spline: cheaper on TPU (pure VPU
elementwise work, fused into the likelihood) and more accurate than
emulating the spline (SURVEY.md §7 "hard parts").

The implied flux is formed entirely in log space:

    log10 f = logL - log10(4 pi) - 2 * log10(dL_cm)

which is float32-exact; the reference's linear ``L / (4 pi dL_cm^2)``
(``lumfuncmcmc.py:70``) overflows float32 at dL_cm ~ 1e28.
"""

from __future__ import annotations



from lumfuncmcmc_tpu.cosmology import SQARCSEC_PER_SR
from lumfuncmcmc_tpu.ops.completeness import fleming_from_logf

LOG10_4PI = 1.0992098640220963  # log10(4*pi)
_LOG10_4PI = LOG10_4PI  # module-internal alias


def logflux_from_loglum(logL, log10_dl_cm):
    """log10 flux [cgs] from log10 L [erg/s] and log10 dL [cm]."""
    return logL - _LOG10_4PI - 2.0 * log10_dl_cm


def loglum_from_logflux(logf, log10_dl_cm):
    """log10 L [erg/s] from log10 flux [cgs] and log10 dL [cm]."""
    return logf + _LOG10_4PI + 2.0 * log10_dl_cm


def omega_from_logf(logf, omega_0, logF50, alpha, fcmin=0.1):
    """Omega given the already-formed log10 flux.

    omega_0 is the survey area in arcsec^2; output is a solid angle in
    steradians times completeness (same convention as the reference:
    ``Omega_0 / sqarcsec * fleming(...)``).
    """
    return omega_0 / SQARCSEC_PER_SR * fleming_from_logf(
        logf, logF50, alpha, fcmin)


def omega(logL, z, cosmo, omega_0, logF50, alpha, fcmin=0.1):
    """Omega(logL, z) — exact counterpart of ``lumfuncmcmc.py:47-70``.

    ``cosmo`` is a :class:`~lumfuncmcmc_tpu.cosmology.CosmoTable`; the
    reference passed a scipy ``interp1d`` for dL instead.
    """
    logf = logflux_from_loglum(logL, cosmo.log10_dl_cm_at(z))
    return omega_from_logf(logf, omega_0, logF50, alpha, fcmin)


def lum_at_flux(F, z, cosmo):
    """Luminosity [erg/s] of flux ``F`` [cgs] at redshift ``z``
    (``get_L_constF``, ``VmaxLumFunc.py:722-737``)."""
    import jax.numpy as jnp
    return 10.0 ** loglum_from_logflux(jnp.log10(F),
                                       cosmo.log10_dl_cm_at(z))
