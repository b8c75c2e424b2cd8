"""Cosmology table vs adaptive-quadrature FLRW oracle."""

import numpy as np
import pytest

from lumfuncmcmc_tpu.cosmology import (
    build_cosmo_table, CosmologyParams, DEFAULT_COSMOLOGY, SQARCSEC_PER_SR)
from tests.reference_impl import RefCosmo


@pytest.fixture(scope="module")
def oracle():
    return RefCosmo()


@pytest.fixture(scope="module")
def table():
    import jax.numpy as jnp
    return build_cosmo_table(zmax=3.0, dtype=jnp.float64)


def test_density_parameters(oracle):
    p = DEFAULT_COSMOLOGY
    # photon density ~ 2.47e-5/h^2 — standard value for T=2.725
    assert abs(p.Ogamma0 * p.h**2 - 2.47e-5) < 2e-7
    np.testing.assert_allclose(p.Or0, oracle.Or0, rtol=1e-12)
    assert p.Ok0 < 0  # closed by the tiny radiation contribution


def test_luminosity_distance(oracle, table):
    for z in [0.05, 0.5, 1.0, 1.5, 1.9, 2.5]:
        ours = float(table.luminosity_distance(z))
        ref = oracle.luminosity_distance(z)
        np.testing.assert_allclose(ours, ref, rtol=1e-7, err_msg=f"z={z}")


def test_differential_comoving_volume(oracle, table):
    for z in [0.1, 0.9, 1.3, 1.86, 2.4]:
        ours = float(table.differential_comoving_volume(z))
        ref = oracle.differential_comoving_volume(z)
        np.testing.assert_allclose(ours, ref, rtol=3e-7, err_msg=f"z={z}")


@pytest.mark.quick
def test_z_inversion_roundtrip(table):
    z = np.linspace(0.2, 2.8, 31)
    logdl = np.asarray(table.log10_dl_cm_at(z))
    zback = np.asarray(table.z_at_log10_dl_cm(logdl))
    np.testing.assert_allclose(zback, z, rtol=1e-10)


def test_known_value_sanity(oracle):
    # dL(z=1) for H0=70, Om=0.3, OL=0.7 (flat, no radiation) is ~6607 Mpc;
    # the Tcmb-included cosmology differs only at the 1e-4 level.
    assert abs(oracle.luminosity_distance(1.0) - 6607.0) < 10.0


def test_sqarcsec_constant():
    np.testing.assert_allclose(SQARCSEC_PER_SR, (180 / np.pi * 3600) ** 2)
