"""LM Schechter fitting vs scipy.optimize oracles."""

import numpy as np
import pytest
from scipy.optimize import least_squares

from lumfuncmcmc_tpu.models.schfit import fit_schechter
from tests.reference_impl import ref_true_lum_func


def _fake_binned_lf(rng, log=True):
    al, phistar, lstar = -1.714, -2.8, 42.6
    L = np.linspace(41.6, 43.6, 20)
    y = ref_true_lum_func(L, al, lstar, phistar)
    noise = 1.0 + 0.05 * rng.standard_normal(L.size)
    var = (0.05 * y) ** 2
    return L, y * noise, var, (al, phistar, lstar)


@pytest.mark.quick
def test_log_fit_recovers_truth(rng):
    L, y, var, (al, ps, ls) = _fake_binned_lf(rng)
    fit = fit_schechter(L, y, var, name="Ha", log=True)
    assert abs(fit.params["al"] - al) < 0.15
    assert abs(fit.params["phistar"] - ps) < 0.2
    assert abs(fit.params["Lstar"] - ls) < 0.15
    assert fit.redchi < 5.0
    assert "al" in fit.fit_report()


def test_log_fit_matches_scipy(rng):
    L, y, var, _ = _fake_binned_lf(rng)
    w = 1.0 / np.sqrt(var)

    def resid(p):
        return w * (ref_true_lum_func(L, p[0], p[2], p[1]) - y)

    sol = least_squares(resid, x0=[-1.714, -3.0, 42.5],
                        bounds=([-5, -8, 40], [0, np.inf, 45]))
    fit = fit_schechter(L, y, var, name="Ha", log=True)
    got = [fit.params["al"], fit.params["phistar"], fit.params["Lstar"]]
    np.testing.assert_allclose(got, sol.x, rtol=1e-4)


def test_fixed_alpha(rng):
    L, y, var, _ = _fake_binned_lf(rng)
    fit = fit_schechter(L, y, var, log=True, alpha_value=-1.5)
    assert fit.params["al"] == -1.5
    assert "al" not in fit.free_names


def test_linear_fit(rng):
    al, phistar, lstar = -1.6, 1.2e-3, 3.0e42
    L = np.logspace(41.8, 43.5, 18)
    y = phistar * (L / lstar) ** al * np.exp(-L / lstar)
    var = (0.05 * y) ** 2
    fit = fit_schechter(L, y, var, name="Ha", log=False)
    np.testing.assert_allclose(fit.params["Lstar"], lstar, rtol=0.15)
    np.testing.assert_allclose(fit.params["al"], al, atol=0.15)


def test_integ_forms_run(rng):
    L, y, var, _ = _fake_binned_lf(rng)
    fit = fit_schechter(L, y, var, name="Ha", log=True, integ=True)
    assert "integ" in fit.params and np.isfinite(fit.params["integ"])
    band = fit.eval_uncertainty(L, sigma=3)
    assert band.shape == L.shape and np.all(np.isfinite(band))


def test_uncertainty_band_scales(rng):
    L, y, var, _ = _fake_binned_lf(rng)
    fit = fit_schechter(L, y, var, log=True)
    b1 = fit.eval_uncertainty(L, sigma=1)
    b3 = fit.eval_uncertainty(L, sigma=3)
    np.testing.assert_allclose(b3, 3 * b1, rtol=1e-10)


def test_success_false_when_iterations_exhausted(rng):
    L, y, var, _ = _fake_binned_lf(rng)
    fit = fit_schechter(L, y, var, log=True, max_iter=1)
    assert fit.success is False
    fit2 = fit_schechter(L, y, var, log=True)
    assert fit2.success is True
