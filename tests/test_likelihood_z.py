"""Parity for the z-evolving likelihood vs a NumPy transcription of
lumfuncmcmc_z.py:364-376."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood_z import (
    ThetaLayoutZ, lnlike_z, lnprior_z, make_lnprob_z)
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut
from tests.reference_impl import ref_schechter_z


def _np(x):
    return np.asarray(jax.device_get(x), dtype=np.float64)


def oracle_lnlike_z(theta, ctx, layout):
    t = np.asarray(theta, dtype=np.float64)
    L1, L2, L3, p1, p2, p3 = t[:6]
    al = layout.sch_al0 if layout.fix_sch_al else t[6]
    zp = (layout.z1, layout.z2, layout.z3)

    lum, zsrc, zarr = _np(ctx.lum), _np(ctx.zsrc), _np(ctx.zarr)
    logL = _np(ctx.logL_grid)
    om_src = np.exp(_np(ctx.ln_om_src))
    om_grid = _np(ctx.w_fixed) / _np(ctx.w_open)
    volume = _np(ctx.volume_part)

    lnpart = np.log(ref_schechter_z(lum, zsrc, al, L1, L2, L3,
                                    p1, p2, p3, *zp) * om_src).sum()
    fullint = 0.0
    for f in range(logL.shape[0]):
        integ = (ref_schechter_z(logL[f], zarr[f][None, :], al, L1, L2, L3,
                                 p1, p2, p3, *zp)
                 * volume[f][None, :] * om_grid[f])
        fullint += np.trapezoid(np.trapezoid(integ, logL[f], axis=0),
                                zarr[f])
    return lnpart - fullint


@pytest.fixture(scope="module")
def setup():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True)  # z model: comp fixed
    cat = apply_completeness_cut(make_catalog(cfg, n_target=300, seed=5), cfg)
    data, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                              flux_e=cat["flux_e"],
                              field_id=cat["field_id"])
    layout = ThetaLayoutZ.from_config(cfg)
    return ctx, layout


def test_lnlike_z_parity(setup):
    ctx, layout = setup
    rng = np.random.default_rng(11)
    for _ in range(12):
        th = np.concatenate([
            rng.uniform(41.8, 43.5, 3),    # L pivots
            rng.uniform(-4.0, -1.5, 3),    # phi pivots
            rng.uniform(-2.0, -0.8, 1),    # sch_al
        ])
        ours = float(lnlike_z(jnp.asarray(th), ctx, layout))
        ref = oracle_lnlike_z(th, ctx, layout)
        np.testing.assert_allclose(ours, ref, rtol=1e-9, err_msg=str(th))


def test_lnprior_z_strict_bounds(setup):
    ctx, layout = setup
    lo, hi = layout.bounds_arrays()
    mid = np.asarray((lo + hi) / 2.0)
    assert float(lnprior_z(jnp.asarray(mid), layout)) == 0.0
    # exactly at a pivot bound -> rejected (strict inequality)
    edge = mid.copy(); edge[0] = float(lo[0])
    assert float(lnprior_z(jnp.asarray(edge), layout)) == -np.inf
    # exactly at the sch_al bound -> allowed (inclusive)
    edge2 = mid.copy(); edge2[6] = float(lo[6])
    assert float(lnprior_z(jnp.asarray(edge2), layout)) == 0.0


@pytest.mark.quick
def test_lnprob_z_vmap(setup):
    ctx, layout = setup
    lnprob = jax.jit(jax.vmap(make_lnprob_z(ctx, layout)))
    rng = np.random.default_rng(12)
    ths = np.column_stack([rng.uniform(41.8, 43.5, (16, 3)).reshape(16, 3),
                           rng.uniform(-4, -1.5, (16, 3)),
                           rng.uniform(-2, -0.8, (16, 1))]).reshape(16, 7)
    vals = np.asarray(lnprob(jnp.asarray(ths)))
    assert vals.shape == (16,) and np.all(np.isfinite(vals))


def test_natural_parameterization_equivalence(setup):
    """Natural (value/slope/curvature) thetas that encode the same
    quadratic must give identical lnlike to the pivot form."""
    ctx, layout = setup
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, z_param="natural")
    layout_n = ThetaLayoutZ.from_config(cfg)
    assert layout_n.natural
    # pick natural coefficients, derive the pivot values they imply
    Lm, Ls, Lc = 42.5, 0.3, -0.5
    pm, ps, pc = -2.8, -0.4, 0.6
    al = -1.5
    dz1 = layout_n.z1 - layout_n.z2
    dz3 = layout_n.z3 - layout_n.z2
    th_nat = jnp.asarray([Lm, Ls, Lc, pm, ps, pc, al])
    th_piv = jnp.asarray([Lm + Ls * dz1 + Lc * dz1**2, Lm,
                          Lm + Ls * dz3 + Lc * dz3**2,
                          pm + ps * dz1 + pc * dz1**2, pm,
                          pm + ps * dz3 + pc * dz3**2, al])
    a = float(lnlike_z(th_nat, ctx, layout_n))
    b = float(lnlike_z(th_piv, ctx, layout))
    np.testing.assert_allclose(a, b, rtol=1e-12)
