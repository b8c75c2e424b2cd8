"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ, make_lnprob_z
from lumfuncmcmc_tpu.parallel.mesh import make_mesh
from lumfuncmcmc_tpu.parallel.sharding import make_lnprob_sharded
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut


@pytest.fixture(scope="module")
def setup():
    cfg = LFConfig(min_comp_frac=0.5, size_ln=41)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=300, seed=9), cfg)
    data, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                              flux_e=cat["flux_e"],
                              field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    return cfg, ctx, layout


def _ref_vals(ctx, layout, thetas):
    return np.asarray(jax.vmap(make_lnprob(ctx, layout))(thetas))


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(setup, mesh_shape):
    cfg, ctx, layout = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(*mesh_shape)
    thetas = sample_init(jax.random.PRNGKey(0), layout, 24)
    ref = _ref_vals(ctx, layout, thetas)
    sharded = make_lnprob_sharded(ctx, layout, mesh, model="single")
    got = np.asarray(jax.jit(sharded)(thetas))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_sharded_odd_walker_count(setup):
    cfg, ctx, layout = setup
    mesh = make_mesh(8, 1)
    thetas = sample_init(jax.random.PRNGKey(1), layout, 23)  # not /8
    ref = _ref_vals(ctx, layout, thetas)
    got = np.asarray(make_lnprob_sharded(ctx, layout, mesh)(thetas))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_sharded_z_model():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=41)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=250, seed=10),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayoutZ.from_config(cfg)
    rng = np.random.default_rng(4)
    thetas = jnp.asarray(np.column_stack(
        [rng.uniform(41.8, 43.5, (16, 3)), rng.uniform(-4, -1.5, (16, 3)),
         rng.uniform(-2, -0.8, (16, 1))]))
    ref = np.asarray(jax.vmap(make_lnprob_z(ctx, layout))(thetas))
    mesh = make_mesh(2, 4)
    got = np.asarray(make_lnprob_sharded(ctx, layout, mesh, model="z")(thetas))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_full_sampler_step_sharded(setup):
    """The complete training step (stretch move on the sharded lnprob)
    compiles and runs on a 2-D mesh — the dryrun_multichip core."""
    cfg, ctx, layout = setup
    mesh = make_mesh(4, 2)
    lnprob = make_lnprob_sharded(ctx, layout, mesh)
    pos0 = sample_init(jax.random.PRNGKey(2), layout, 16)
    state, chain, lnps, acc = run_stretch(lnprob, pos0,
                                          jax.random.PRNGKey(3), 3)
    assert chain.shape == (3, 16, layout.ndim)
    assert np.all(np.isfinite(np.asarray(lnps)) |
                  (np.asarray(lnps) == -np.inf))


def test_nuts_on_mesh_matches_unsharded(setup):
    """fit_model_nuts must honor a configured device mesh: chains are
    sharded over the walker axis (it previously ran everything on one
    device silently). Per-chain math is unchanged by the partitioning,
    so the sharded run reproduces the unsharded one."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31,
                   nwalkers=16, nsteps=40)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=8),
                                 cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    m_plain = LumFuncModel(cfg, **kw)
    s_plain = m_plain.fit_model_nuts(num_warmup=50, nchains=8)
    m_mesh = LumFuncModel(cfg, mesh=make_mesh(4, 2), **kw)
    s_mesh = m_mesh.fit_model_nuts(num_warmup=50, nchains=8)
    assert s_mesh.shape == s_plain.shape
    # partitioned compilation reorders fused reductions -> float-level
    # differences (~1e-7 rel observed); the trajectories stay equal
    np.testing.assert_allclose(s_mesh, s_plain, rtol=1e-4, atol=1e-6)


def test_nuts_on_mesh_too_few_walkers_raises(setup):
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31,
                   nwalkers=4, nsteps=10)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=8),
                                 cfg)
    m = LumFuncModel(cfg, mesh=make_mesh(8, 1), z=cat["z"],
                     flux=cat["flux"], flux_e=cat["flux_e"],
                     field_id=cat["field_id"])
    with pytest.raises(ValueError, match="mesh walker axis"):
        m.fit_model_nuts(num_warmup=10, nchains=8)


def test_exact_bounds_sharded_matches_single_device(setup):
    """Regression: cfg.exact_bounds must survive the mesh path (it was
    silently dropped), including with a sharded source axis."""
    from lumfuncmcmc_tpu.models.likelihood import lnlike_exact_bounds
    cfg, ctx, layout = setup
    lum_floor = float(np.min(np.asarray(ctx.lum)))

    def ref_scalar(th):
        from lumfuncmcmc_tpu.models.likelihood import lnprior
        import jax.numpy as jnp2
        lnl = lnlike_exact_bounds(th, ctx, layout, cfg.min_comp_frac,
                                  lum_floor, cfg.Lh)
        lp = lnprior(th, layout)
        return jnp2.where(jnp2.isfinite(lp), lp + lnl, -jnp2.inf)

    thetas = sample_init(jax.random.PRNGKey(5), layout, 16)
    ref = np.asarray(jax.vmap(ref_scalar)(thetas))
    mesh = make_mesh(2, 4)  # source axis sharded — the hard case
    got = np.asarray(make_lnprob_sharded(
        ctx, layout, mesh, model="single", exact_bounds=True,
        min_comp_frac=cfg.min_comp_frac, lh=cfg.Lh)(thetas))
    np.testing.assert_allclose(got, ref, rtol=1e-9)
