"""Gauss-Legendre production quadrature vs the reference trapz grids."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, lnlike_single_epoch)
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut


@pytest.fixture(scope="module")
def catalog():
    cfg = LFConfig(min_comp_frac=0.5)
    return apply_completeness_cut(make_catalog(cfg, n_target=400, seed=3),
                                  cfg)


def _lnlike_with(cfg, cat, thetas):
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    return np.asarray([float(lnlike_single_epoch(jnp.asarray(t), ctx,
                                                 layout))
                       for t in thetas])


@pytest.mark.parametrize("fix_comp", [True, False])
@pytest.mark.quick
def test_gauss32_matches_dense_oracle(catalog, fix_comp):
    """Split-panel GL-32 converges spectrally (the z panel is split at
    the kink where minlum(z) crosses min(lum)); GL-192 is the oracle.
    For calibration: the reference's own trapz-101/201 grids carry
    O(0.1-1) absolute lnlike error against the same oracle."""
    rng = np.random.default_rng(0)
    n = 6
    thetas = np.column_stack([
        rng.uniform(42.0, 43.2, n), rng.uniform(-3.5, -2.0, n),
        rng.uniform(-1.9, -1.0, n),
        *( [rng.uniform(2.0, 4.5, n) for _ in range(5)]
           + [rng.uniform(3.5, 5.5, n)] if not fix_comp else []),
    ])
    base = LFConfig(min_comp_frac=0.5, fix_comp=fix_comp)
    dense = _lnlike_with(base.replace(quadrature="gauss", size_ln=192),
                         catalog, thetas)
    gauss = _lnlike_with(base.replace(quadrature="gauss"), catalog,
                         thetas)
    ref_res = _lnlike_with(base, catalog, thetas)  # reference 101/201
    err_gauss = np.abs(gauss - dense)
    err_ref = np.abs(ref_res - dense)
    # fixed-comp hits ~3e-7; free-comp thetas move the Fleming transition
    # away from the frozen panel split and land at ~3e-4 absolute — still
    # ~3e-8 relative on |lnlike| ~ 1e4
    assert np.max(err_gauss) < 1e-3, err_gauss
    # orders of magnitude better than the reference's own resolution
    assert np.max(err_gauss) < 0.01 * np.max(err_ref)


def test_gauss_default_node_count(catalog):
    cfg = LFConfig(min_comp_frac=0.5, quadrature="gauss")
    _, ctx = build_context(cfg, z=catalog["z"], flux=catalog["flux"],
                           flux_e=catalog["flux_e"],
                           field_id=catalog["field_id"])
    assert ctx.logL_grid.shape[1] == 32
