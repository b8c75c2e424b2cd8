"""1/V_eff estimator vs scipy.quad / loop-transcription oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import quad

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.cosmology import build_cosmo_table, SQARCSEC_PER_SR
from lumfuncmcmc_tpu.models.veff import (
    veff_weights, max_z_for_lum, binned_lf_bootstrap, log_bin_edges,
    mult_factor, equal_count_z_bins)
from tests.reference_impl import ref_fleming, RefCosmo

_LOG10_4PI = np.log10(4 * np.pi)


@pytest.fixture(scope="module")
def cosmo():
    return build_cosmo_table(zmax=3.0, dtype=jnp.float64)


@pytest.fixture(scope="module")
def oracle():
    return RefCosmo()


@pytest.mark.quick
def test_max_z_inversion(cosmo, oracle):
    # L at fmin from z_true must invert back to z_true
    for z_true in [0.8, 1.3, 1.9]:
        logfmin = -16.5
        dl_cm = oracle.luminosity_distance(z_true) * 3.086e24
        lum = logfmin + _LOG10_4PI + 2.0 * np.log10(dl_cm)
        z_got = float(max_z_for_lum(jnp.asarray(lum), logfmin, cosmo))
        np.testing.assert_allclose(z_got, z_true, rtol=1e-7)


def test_veff_weight_vs_scipy_quad(cosmo, oracle):
    """Oracle = direct transcription of lumfunc/lumfuncintv2
    (VmaxLumFunc.py:235-257) with adaptive quad."""
    zmin, zmax = 1.16, 1.9
    omega0 = 3.0e5
    flim, alpha, fcmin = 3.0e-17, 4.56, 0.1
    rng = np.random.default_rng(0)
    logf = rng.uniform(-16.8, -15.5, 10)
    for lf in logf:
        def integrand(z):
            return (omega0 / SQARCSEC_PER_SR
                    * ref_fleming(10.0**lf, flim, alpha, fcmin)
                    * oracle.differential_comoving_volume(z))
        val, _ = quad(integrand, zmin, zmax, epsabs=1e-10, epsrel=1e-10)
        expect = 1.0 / val
        got = float(veff_weights(
            jnp.asarray([lf]), jnp.asarray([50.0]),  # lum unused (mcf=0)
            jnp.asarray([np.log10(flim)]), jnp.asarray([-20.0]),
            omega0, zmin, zmax, alpha, cosmo, fcmin,
            min_comp_frac=0.0)[0])
        np.testing.assert_allclose(got, expect, rtol=2e-7)


def test_veff_weight_zmax_capped(cosmo):
    """A bright source keeps zmax; a faint one gets it truncated, raising
    the weight."""
    zmin, zmax = 1.16, 1.9
    logF50 = np.log10(3.0e-17)
    root = -16.2   # min log-flux from completeness
    bright = 44.0
    # faint source: pick L that hits the root before zmax
    dl_mid_log = float(cosmo.log10_dl_cm_at(1.5))
    faint = root + _LOG10_4PI + 2.0 * dl_mid_log
    lums = jnp.asarray([bright, faint])
    logfs = jnp.asarray([-15.0, -16.4])
    w = veff_weights(logfs, lums, jnp.full(2, logF50), jnp.full(2, root),
                     3e5, zmin, zmax, 4.56, cosmo, 0.1, min_comp_frac=0.5)
    zmax_faint = float(max_z_for_lum(jnp.asarray(faint), root, cosmo))
    assert 1.4 < zmax_faint < 1.6
    assert float(w[1]) > 0.0
    # truncating the volume must make the faint weight larger than the
    # same flux integrated to full zmax
    w_full = veff_weights(logfs, lums, jnp.full(2, logF50),
                          jnp.full(2, root), 3e5, zmin, zmax, 4.56, cosmo,
                          0.1, min_comp_frac=0.0)
    assert float(w[1]) > float(w_full[1])


def test_binned_bootstrap_vs_loops():
    """Oracle = direct transcription of getBootErrLog's loops
    (VmaxLumFunc.py:336-362) with the same resample indices."""
    rng = np.random.default_rng(1)
    n, nbins, nboot = 200, 12, 50
    lum = rng.uniform(41.5, 44.0, n)
    phi = 10.0 ** rng.uniform(-5, -3, n)
    edges = np.asarray(log_bin_edges(jnp.asarray(lum), nbins))
    key = jax.random.PRNGKey(0)
    lavg, lfbin, var = binned_lf_bootstrap(key, jnp.asarray(lum),
                                           jnp.asarray(phi),
                                           jnp.asarray(edges), nboot, nbins)
    # deterministic part: loop transcription
    lavg_ref = np.linspace((edges[0] + edges[1]) / 2,
                           (edges[-1] + edges[-2]) / 2, nbins)
    dl = lavg_ref[1] - lavg_ref[0]
    lf_ref = np.zeros(nbins)
    for j in range(nbins):
        cond = (lum >= edges[j]) & (lum < edges[j + 1])
        if cond.any():
            lf_ref[j] = phi[cond].sum() / dl
    np.testing.assert_allclose(np.asarray(lavg), lavg_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lfbin), lf_ref, rtol=1e-12)
    # bootstrap variance: statistical check (same algorithm, different
    # PRNG): floor applied, all positive, right order of magnitude
    assert np.all(np.asarray(var) > 0.0)
    # compare with a numpy bootstrap using many resamples
    lfb = np.zeros((400, nbins))
    for k in range(400):
        idx = rng.integers(0, n, n)
        for j in range(nbins):
            cond = (lum[idx] >= edges[j]) & (lum[idx] < edges[j + 1])
            if cond.any():
                lfb[k, j] = phi[idx][cond].sum() / dl
    var_ref = lfb.var(axis=0, ddof=1)
    ratio = np.asarray(var)[var_ref > 0] / var_ref[var_ref > 0]
    assert np.median(ratio) == pytest.approx(1.0, rel=0.6)


def test_reference_edge_exclusions():
    # reference edge rule linspace(min*1.001, max, nbin+1) with half-open
    # bins [e_j, e_{j+1}) drops BOTH the faintest source (below edge 0)
    # and a source exactly at max(L) (== last edge) — preserved semantics
    lum = jnp.asarray([41.0, 42.0, 43.0])
    phi = jnp.asarray([1.0, 1.0, 1.0])
    edges = log_bin_edges(lum, 4)
    _, lfbin, _ = binned_lf_bootstrap(jax.random.PRNGKey(0), lum, phi,
                                      edges, 10, 4)
    dl = float(edges[1] - edges[0])
    total = float(jnp.sum(lfbin)) * dl
    assert total == pytest.approx(1.0, rel=1e-6)  # only 42.0 binned


def test_mult_factor_limits(cosmo):
    zmin, zmax = 1.16, 1.9
    logfmin = -16.3
    lmin_lo = logfmin + _LOG10_4PI + 2 * float(cosmo.log10_dl_cm_at(zmin))
    lmin_hi = logfmin + _LOG10_4PI + 2 * float(cosmo.log10_dl_cm_at(zmax))
    # bin fully above the curve -> 1.0
    m = mult_factor(jnp.asarray(lmin_hi + 0.1), jnp.asarray(lmin_hi + 0.3),
                    logfmin, zmin, zmax, cosmo)
    np.testing.assert_allclose(float(m), 1.0)
    # bin fully below -> inf
    m = mult_factor(jnp.asarray(lmin_lo - 0.5), jnp.asarray(lmin_lo - 0.2),
                    logfmin, zmin, zmax, cosmo)
    assert np.isinf(float(m))
    # straddling -> > 1 and finite
    m = float(mult_factor(jnp.asarray(lmin_lo), jnp.asarray(lmin_hi),
                          logfmin, zmin, zmax, cosmo))
    assert 1.0 < m < 10.0


def test_equal_count_z_bins():
    z = np.random.default_rng(2).uniform(1, 2, 100)
    idx = equal_count_z_bins(z, 5)
    counts = np.bincount(idx, minlength=5)
    assert counts.min() >= 19 and counts.max() <= 21
    # bins ordered in z
    for b in range(4):
        assert z[idx == b].max() <= z[idx == b + 1].min()


def test_lum_at_flux_matches_reference(cosmo, oracle):
    from lumfuncmcmc_tpu.ops.omega import lum_at_flux
    for F, z in [(3e-17, 1.2), (1e-16, 1.9)]:
        ref = 4 * np.pi * (oracle.luminosity_distance(z) * 3.086e24)**2 * F
        got = float(lum_at_flux(F, z, cosmo))
        np.testing.assert_allclose(got, ref, rtol=1e-7)
