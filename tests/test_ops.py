"""Unit tests for the math kernels against NumPy/SciPy/mpmath oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.ops import (
    true_lum_func, log_true_lum_func, fleming, fleming_from_logf,
    inverse_fleming, fleming_root_logf, schechter, schechter_log,
    schechter_integ, schechter_integ_log, schechter_z, upper_gamma, p_curve,
)
from tests.reference_impl import (
    ref_true_lum_func, ref_fleming, ref_inverse_fleming, ref_schechter_z,
    ref_upper_gamma, ref_p,
)


def test_true_lum_func_matches_reference(rng):
    logL = rng.uniform(40.0, 46.0, size=256)
    for alpha, ls, ps in [(-1.6, 42.5, -3.0), (-0.2, 41.0, -2.0),
                          (0.5, 44.0, 1.0), (-2.9, 43.0, -7.5)]:
        ours = np.asarray(true_lum_func(jnp.asarray(logL), alpha, ls, ps))
        ref = ref_true_lum_func(logL, alpha, ls, ps)
        # atol floor: float64 subnormals (<1e-300) may flush differently
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-300)


def test_log_true_lum_func_is_log():
    logL = jnp.linspace(40, 46, 64)
    a = jnp.exp(log_true_lum_func(logL, -1.6, 42.5, -3.0))
    b = true_lum_func(logL, -1.6, 42.5, -3.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-14)


@pytest.mark.quick
def test_fleming_matches_reference(rng):
    f = 10.0 ** rng.uniform(-19, -14, size=512)
    for Flim, alpha, fcmin in [(3.0e-17, 3.5, 0.1), (2.72e-17, 4.56, 0.1),
                               (5.0e-17, 2.0, 0.3), (1.0e-17, 6.5, 0.05)]:
        ours = np.asarray(fleming(jnp.asarray(f), Flim, alpha, fcmin))
        ref = ref_fleming(f, Flim, alpha, fcmin)
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-300)


def test_fleming_unmodified_branch(rng):
    f = 10.0 ** rng.uniform(-19, -14, size=128)
    ours = np.asarray(fleming(jnp.asarray(f), 3.0e-17, 3.5, fcmin=0))
    ref = ref_fleming(f, 3.0e-17, 3.5, fcmin=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_fleming_properties(rng):
    # bounded in [0,1] and monotone increasing in flux
    logf = jnp.linspace(-22.0, -12.0, 2048)
    vals = np.asarray(fleming_from_logf(logf, np.log10(3e-17), 4.56, 0.1))
    assert np.all(vals >= 0.0) and np.all(vals <= 1.0)
    assert np.all(np.diff(vals) >= -1e-12)


def test_inverse_fleming_matches_reference():
    for f50, alpha, fcmin in [(3e-17, 3.5, 0.1), (2.7e-17, 4.56, 0.2)]:
        ours = float(inverse_fleming(f50, alpha, fcmin))
        ref = ref_inverse_fleming(f50, alpha, fcmin)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_p_curve_matches_reference(rng):
    F = 10.0 ** rng.uniform(-18, -15, size=64)
    np.testing.assert_allclose(np.asarray(p_curve(jnp.asarray(F), 3e-17, -3.5)),
                               ref_p(F, 3e-17, -3.5), rtol=1e-12)


def test_fleming_root_bisection():
    # the root is where the modified curve equals min_comp_frac
    for f50, alpha, mcf in [(2.72e-17, 4.56, 0.5), (3.3e-17, 4.56, 0.2),
                            (2.0e-17, 2.5, 0.8)]:
        logroot = float(fleming_root_logf(np.log10(f50), alpha, mcf, 0.1))
        val = ref_fleming(10.0**logroot, f50, alpha, 0.1)
        np.testing.assert_allclose(val, mcf, rtol=1e-10)


@pytest.mark.quick
def test_upper_gamma_vs_mpmath():
    for a in [-3.7, -2.461 + 1, -1.714 + 1, -1.0, -0.5, 0.3, 1.0, 2.5]:
        for x in [1e-7, 1e-3, 0.5, 2.0, 10.0]:
            ours = float(upper_gamma(a, x))
            ref = ref_upper_gamma(a, x)
            # large x + negative integer a amplifies jax.gammaincc's own
            # ~5e-8 error through recurrence cancellation; the Schechter
            # use case (x = 1e36/Lstar ~ 1e-7..1e-4) sits in the tight zone
            rtol = 2e-6 if x < 1.0 else 3e-5
            np.testing.assert_allclose(ours, ref, rtol=rtol,
                                       err_msg=f"a={a}, x={x}")


def test_schechter_variants(rng):
    L = 10.0 ** rng.uniform(40, 45, size=64)
    logL = np.log10(L)
    # linear
    np.testing.assert_allclose(
        np.asarray(schechter(jnp.asarray(L), -1.6, 1e-3, 1e42)),
        1e-3 * (L / 1e42) ** -1.6 * np.exp(-L / 1e42), rtol=1e-12, atol=1e-300)
    # log form equals TrueLumFunc
    np.testing.assert_allclose(
        np.asarray(schechter_log(jnp.asarray(logL), -1.6, -3.0, 42.5)),
        ref_true_lum_func(logL, -1.6, 42.5, -3.0), rtol=1e-12, atol=1e-300)
    # integral-parameterized forms: reconstruct the equivalent phistar
    al, integ, Lstar = -1.714, 0.1, 1e42
    phistar = integ / ref_upper_gamma(al + 1, 1e36 / Lstar)
    np.testing.assert_allclose(
        np.asarray(schechter_integ(jnp.asarray(L), al, integ, Lstar)),
        phistar * (L / Lstar) ** al * np.exp(-L / Lstar), rtol=1e-5, atol=1e-300)
    al, linteg, lLstar = -1.714, -1.0, 42.0
    lphistar = linteg - np.log10(ref_upper_gamma(al + 1, 10 ** (36 - lLstar)))
    np.testing.assert_allclose(
        np.asarray(schechter_integ_log(jnp.asarray(logL), al, linteg, lLstar)),
        ref_true_lum_func(logL, al, lLstar, lphistar), rtol=1e-5, atol=1e-300)


def test_schechter_z_matches_reference(rng):
    logL = rng.uniform(41, 45, size=128)
    z = rng.uniform(1.2, 1.9, size=128)
    args = (-1.6, 42.0, 42.6, 42.3, -2.5, -3.0, -2.8, 1.20, 1.53, 1.86)
    ours = np.asarray(schechter_z(jnp.asarray(logL), jnp.asarray(z), *args))
    ref = ref_schechter_z(logL, z, *args)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_min_flux_p_curve_matches_reference():
    from lumfuncmcmc_tpu.ops.completeness import min_flux_p_curve
    from scipy.optimize import fsolve
    for flim, alpha, mcf in [(3.0e-17, -3.5, 0.5), (4.0e-17, -2.12, 0.3)]:
        ref = fsolve(lambda x: ref_p(x, flim, alpha) - mcf, [flim])[0]
        got = min_flux_p_curve(mcf, flim, alpha)
        np.testing.assert_allclose(got, ref, rtol=1e-8)
    assert min_flux_p_curve(0.0, 3e-17, -3.5) == 0.0


def test_inverse_fleming_sign_both_sides():
    """The fc = fcmin crossing sits on the faint side of F50 for
    fcmin < 0.5 and the BRIGHT side for fcmin > 0.5 (previously the
    sign was forced negative)."""
    import numpy as np
    from lumfuncmcmc_tpu.ops.completeness import (
        _log10_inverse_fleming_ratio)
    alpha = 3.5
    for fcmin in (0.1, 0.35, 0.65, 0.9):
        r = float(_log10_inverse_fleming_ratio(alpha, fcmin))
        assert np.sign(r) == np.sign(2 * fcmin - 1)
        # the unmodified curve at the crossing equals fcmin
        x = alpha * r
        fc = 0.5 * (1.0 + x / np.sqrt(1.0 + x * x))
        np.testing.assert_allclose(fc, fcmin, rtol=1e-12)
