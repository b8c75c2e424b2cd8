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
@pytest.mark.quick
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


# --- native tier x device mesh (round-3 composition) -------------------

@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (1, 8)])
def test_pallas_sharded_matches_unsharded_xla(setup, mesh_shape):
    """The Pallas kernels compose with the device mesh: shard_map over
    the walker axis (spread over BOTH mesh axes) runs the fused native
    kernel per device; values match the unsharded f64 XLA path at the
    kernel's f32 tolerance (tests/test_pallas.py RTOL)."""
    from lumfuncmcmc_tpu.parallel.sharding import (
        make_pallas_lnprob_sharded)
    cfg, ctx, layout = setup
    thetas = sample_init(jax.random.PRNGKey(6), layout, 24)
    ref = _ref_vals(ctx, layout, thetas)
    mesh = make_mesh(*mesh_shape)
    fn = make_pallas_lnprob_sharded(ctx, layout, mesh, interpret=True)
    assert fn is not None and fn.engine == "pallas"
    got = np.asarray(jax.jit(fn)(jnp.asarray(thetas, jnp.float32)))
    fin = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(got), fin)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=5e-4)


def test_pallas_sharded_odd_walker_count(setup):
    """Walker counts that divide neither the mesh nor the kernel block
    are padded through BOTH tilings and sliced back."""
    from lumfuncmcmc_tpu.parallel.sharding import (
        make_pallas_lnprob_sharded)
    cfg, ctx, layout = setup
    thetas = sample_init(jax.random.PRNGKey(7), layout, 13)
    ref = _ref_vals(ctx, layout, thetas)
    fn = make_pallas_lnprob_sharded(ctx, layout, make_mesh(4, 2),
                                    interpret=True)
    got = np.asarray(fn(jnp.asarray(thetas, jnp.float32)))
    assert got.shape == (13,)
    fin = np.isfinite(ref)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=5e-4)


def test_pallas_sharded_z_and_hier_models():
    """The z and hierarchical kernels shard the same way."""
    from lumfuncmcmc_tpu.models.hierarchical import (
        ThetaLayoutH, make_lnprob_h)
    from lumfuncmcmc_tpu.models.model import LumFuncModelH
    from lumfuncmcmc_tpu.parallel.sharding import (
        make_pallas_lnprob_sharded)
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=250, seed=10),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    mesh = make_mesh(4, 2)

    layout_z = ThetaLayoutZ.from_config(cfg)
    rng = np.random.default_rng(4)
    thetas = jnp.asarray(np.column_stack(
        [rng.uniform(41.8, 43.5, (16, 3)), rng.uniform(-4, -1.5, (16, 3)),
         rng.uniform(-2, -0.8, (16, 1))]))
    ref = np.asarray(jax.vmap(make_lnprob_z(ctx, layout_z))(thetas))
    fn = make_pallas_lnprob_sharded(ctx, layout_z, mesh, model="z",
                                    interpret=True)
    got = np.asarray(fn(jnp.asarray(thetas, jnp.float32)))
    fin = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(got), fin)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=5e-4)

    layout_h = ThetaLayoutH.from_config(cfg)
    mh = LumFuncModelH(cfg, z=cat["z"], flux=cat["flux"],
                       flux_e=cat["flux_e"], field_id=cat["field_id"])
    th_h = jnp.asarray(mh._initial_positions(jax.random.PRNGKey(9))[:16])
    ref_h = np.asarray(jax.vmap(make_lnprob_h(ctx, layout_h))(th_h))
    fn_h = make_pallas_lnprob_sharded(ctx, layout_h, mesh, model="hier",
                                      interpret=True)
    got_h = np.asarray(fn_h(jnp.asarray(th_h, jnp.float32)))
    fin_h = np.isfinite(ref_h)
    np.testing.assert_array_equal(np.isfinite(got_h), fin_h)
    np.testing.assert_allclose(got_h[fin_h], ref_h[fin_h], rtol=5e-4)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_pallas_stream_sharded_matches_unsharded(setup, mesh_shape):
    """2-D native parallelism: round-robin source shards streamed by
    the Pallas kernel per device + one psum reconstruct the unsharded
    lnprob (the grid integral is pre-scaled 1/nshards)."""
    from lumfuncmcmc_tpu.parallel.sharding import (
        make_pallas_lnprob_stream_sharded)
    cfg, ctx, layout = setup
    thetas = sample_init(jax.random.PRNGKey(11), layout, 16)
    ref = _ref_vals(ctx, layout, thetas)
    mesh = make_mesh(*mesh_shape)
    fn = make_pallas_lnprob_stream_sharded(ctx, layout, mesh,
                                           interpret=True)
    assert fn is not None and fn.engine == "pallas"
    got = np.asarray(jax.jit(fn)(jnp.asarray(thetas, jnp.float32)))
    fin = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(got), fin)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=5e-4)


def test_pallas_stream_sharded_gates(setup, monkeypatch):
    """fix_comp has no streamed source term (collapsed ln-term) and
    over-VMEM grids cannot stay resident: both return None. The model
    engine selection routes over-VMEM free-comp catalogs on a
    source-sharded mesh to the streaming path."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    from lumfuncmcmc_tpu.models.likelihood import ThetaLayout as TL
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    from lumfuncmcmc_tpu.parallel.sharding import (
        make_pallas_lnprob_stream_sharded)
    cfg, ctx, layout = setup
    mesh = make_mesh(2, 4)
    layout_fixed = TL.from_config(cfg.replace(fix_comp=True))
    assert make_pallas_lnprob_stream_sharded(
        ctx, layout_fixed, mesh, interpret=True) is None
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", 64)
    assert make_pallas_lnprob_stream_sharded(
        ctx, layout, mesh, interpret=True) is None

    # model-level routing: source arrays over budget, grids resident
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", ncells * 5 * 4 + 16)
    cfg2 = cfg.replace(use_pallas=True, pallas_interpret=True,
                       nwalkers=16, nsteps=4)
    cat = apply_completeness_cut(make_catalog(cfg2, n_target=300,
                                              seed=9), cfg2)
    m = LumFuncModel(cfg2, z=cat["z"], flux=cat["flux"],
                     flux_e=cat["flux_e"], field_id=cat["field_id"],
                     mesh=mesh)
    fn = m.lnprob_batch()
    assert getattr(fn, "engine", None) == "pallas"
    thetas = sample_init(jax.random.PRNGKey(12), layout, 8)
    ref = _ref_vals(m.ctx, m.layout, thetas)
    got = np.asarray(fn(jnp.asarray(thetas, jnp.float32)))
    finm = np.isfinite(ref)
    np.testing.assert_allclose(got[finm], ref[finm], rtol=5e-4)


def test_model_mesh_plus_pallas_composes(setup, monkeypatch):
    """fit_model with mesh + use_pallas runs the NATIVE engine (the
    round-2 silent XLA downgrade, models/model.py:195-200, is gone),
    and the sampled chain stays finite."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = LFConfig(min_comp_frac=0.5, size_ln=31, nwalkers=16, nsteps=6,
                   use_pallas=True, pallas_interpret=True)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=8),
                                 cfg)
    m = LumFuncModel(cfg, mesh=make_mesh(4, 2), z=cat["z"],
                     flux=cat["flux"], flux_e=cat["flux_e"],
                     field_id=cat["field_id"])
    fn = m.lnprob_batch()
    assert getattr(fn, "engine", None) == "pallas"
    samples = m.fit_model()
    assert np.all(np.isfinite(samples))

    # auto mode on a TPU backend resolves to the native tier under a
    # mesh too (no silent downgrade)
    import lumfuncmcmc_tpu.models.model as mm
    monkeypatch.setattr(mm.jax, "default_backend", lambda: "tpu")
    m2 = LumFuncModel(cfg.replace(use_pallas=None), mesh=make_mesh(4, 2),
                      z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
                      field_id=cat["field_id"])
    assert m2._resolve_use_pallas() is True


def test_nuts_native_mesh_replicas():
    """NUTS with a mesh AND the native gradient kernel runs per-device
    replicas under shard_map (jit auto-partitioning cannot partition a
    pallas_call) — each device adapts its own step size; the pooled
    posterior agrees with the meshless XLA-gradient run."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, size_ln=21,
                   nwalkers=16, nsteps=40, use_pallas=True,
                   pallas_interpret=True)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=8),
                                 cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    m = LumFuncModel(cfg, mesh=make_mesh(4, 2), **kw)
    # route check: the gradient post is the native kernel, so the
    # replica path (not auto-partitioning) must be selected
    post = m._nuts_gradient_post(m._make_scalar_lnprob())
    assert getattr(post, "engine", None) == "pallas"
    s_mesh = m.fit_model_nuts(num_warmup=60, nchains=8)
    assert np.all(np.isfinite(s_mesh))
    assert s_mesh.shape == (8 * 40, m.layout.ndim + 1)

    m_plain = LumFuncModel(cfg.replace(use_pallas=None), **kw)
    s_plain = m_plain.fit_model_nuts(num_warmup=60, nchains=8)
    # independent RNG streams and per-replica adaptation: agreement is
    # statistical, not bitwise — medians of the well-constrained
    # Schechter parameters within a posterior-width-scale tolerance
    med_m = np.median(s_mesh[:, :3], axis=0)
    med_p = np.median(s_plain[:, :3], axis=0)
    np.testing.assert_allclose(med_m, med_p, atol=0.5)


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


# --- source-sharded streaming value+grad (round-3 mega-NUTS) -----------

@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_stream_sharded_vg_matches_xla_grad(setup, mesh_shape):
    """Source-sharded streaming value+grad: one psum of the per-shard
    (wk, 1+nfeat) vg rows reconstructs the exact global value AND
    gradient (grid terms 1/nshards per shard, source terms disjoint) —
    parity vs jax.value_and_grad of the f64 XLA lnprob at the kernel's
    f32 tolerance (tests/test_pallas.py gates)."""
    from lumfuncmcmc_tpu.parallel.sharding import (
        make_pallas_vg_stream_sharded)
    cfg, ctx, layout = setup
    mesh = make_mesh(*mesh_shape)
    fn = make_pallas_vg_stream_sharded(ctx, layout, mesh, interpret=True)
    assert fn is not None and fn.engine == "pallas"
    thetas = np.asarray(sample_init(jax.random.PRNGKey(13), layout, 8))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    thetas = 0.7 * mid[None, :] + 0.3 * thetas
    vref, gref = jax.vmap(jax.value_and_grad(make_lnprob(ctx, layout)))(
        jnp.asarray(thetas, jnp.float64))
    v, g = fn(jnp.asarray(thetas, jnp.float32))
    v, g, vref, gref = map(np.asarray, (v, g, vref, gref))
    np.testing.assert_allclose(v, vref, rtol=5e-4)
    denom = np.maximum(np.abs(gref),
                       1e-3 * np.abs(gref).max(axis=-1, keepdims=True))
    np.testing.assert_array_less(np.abs(g - gref) / denom, 2e-3)


def test_stream_sharded_vg_odd_walkers_and_gates(setup):
    """Walker padding through the mesh tiling; fixed completeness and
    over-VMEM grids gate the builder off."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    from lumfuncmcmc_tpu.models.likelihood import ThetaLayout as TL
    from lumfuncmcmc_tpu.parallel.sharding import (
        make_pallas_vg_stream_sharded)
    cfg, ctx, layout = setup
    mesh = make_mesh(2, 4)
    fn = make_pallas_vg_stream_sharded(ctx, layout, mesh, interpret=True)
    thetas = np.asarray(sample_init(jax.random.PRNGKey(14), layout, 5))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    thetas = 0.7 * mid[None, :] + 0.3 * thetas
    v, g = fn(jnp.asarray(thetas, jnp.float32))
    assert v.shape == (5,) and g.shape == (5, layout.ndim)
    assert np.all(np.isfinite(np.asarray(v)))

    layout_fixed = TL.from_config(cfg.replace(fix_comp=True))
    assert make_pallas_vg_stream_sharded(
        ctx, layout_fixed, mesh, interpret=True) is None
    try:
        orig = pk._VMEM_ARRAY_LIMIT
        pk._VMEM_ARRAY_LIMIT = 64
        assert make_pallas_vg_stream_sharded(
            ctx, layout, mesh, interpret=True) is None
    finally:
        pk._VMEM_ARRAY_LIMIT = orig


def test_run_nuts_stream_sharded(setup):
    """Mega-catalog NUTS on the mesh: catalog source-sharded, chains
    walker-sharded, every source-row device an exact trajectory replica
    contributing its shard to the psum'd gradient. Pooled adaptation
    makes the per-walker-row eps IDENTICAL (the pmean feeds every row
    the same dual-averaging statistics)."""
    from lumfuncmcmc_tpu.parallel.sharding import run_nuts_stream_sharded
    from lumfuncmcmc_tpu.samplers.nuts import make_unconstrained
    cfg, ctx, layout = setup
    mesh = make_mesh(2, 4)
    lo = np.asarray(layout.lo)
    hi = np.asarray(layout.hi)
    _, to_theta, to_y = make_unconstrained(
        make_lnprob(ctx, layout), jnp.asarray(lo), jnp.asarray(hi))
    thetas = np.asarray(sample_init(jax.random.PRNGKey(15), layout, 8))
    mid = 0.5 * (lo + hi)
    y0 = jax.vmap(to_y)(jnp.asarray(
        0.8 * mid[None, :] + 0.2 * thetas, jnp.float32))
    out = run_nuts_stream_sharded(
        ctx, layout, mesh, y0, jax.random.PRNGKey(16), num_warmup=40,
        num_samples=10, pooled=True, interpret=True, max_doublings=6)
    assert out is not None
    s, lp, al, eps, dv = out
    assert np.asarray(s).shape == (10, 8, layout.ndim)
    assert np.all(np.isfinite(np.asarray(lp)))
    eps = np.asarray(eps)
    assert eps.shape == (2,)
    np.testing.assert_array_equal(eps[0], eps[1])


def test_run_nuts_sharded_pooled_shares_eps(setup):
    """run_nuts_sharded(pooled=True): dual-averaging/mass statistics
    are pmean-pooled, so every device adapts the SAME eps; the default
    keeps independent per-replica adaptation (distinct eps)."""
    from lumfuncmcmc_tpu.parallel.sharding import run_nuts_sharded
    from lumfuncmcmc_tpu.samplers.nuts import make_unconstrained
    cfg, ctx, layout = setup
    mesh = make_mesh(4, 2)
    lnp_y, to_theta, to_y = make_unconstrained(
        make_lnprob(ctx, layout), jnp.asarray(layout.lo),
        jnp.asarray(layout.hi))
    thetas = np.asarray(sample_init(jax.random.PRNGKey(17), layout, 16))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    y0 = jax.vmap(to_y)(jnp.asarray(0.8 * mid[None, :] + 0.2 * thetas))
    s, lp, al, eps, dv = run_nuts_sharded(
        lnp_y, y0, jax.random.PRNGKey(18), mesh, num_warmup=50,
        num_samples=8, pooled=True, max_doublings=6)
    eps = np.asarray(eps)
    assert eps.shape == (8,)
    np.testing.assert_array_equal(eps, eps[0])
    assert np.all(np.isfinite(np.asarray(lp)))

    _, _, _, eps_r, _ = run_nuts_sharded(
        lnp_y, y0, jax.random.PRNGKey(18), mesh, num_warmup=50,
        num_samples=8, pooled=False, max_doublings=6)
    assert np.unique(np.asarray(eps_r)).size > 1


def test_run_tempered_sharded_matches_unsharded():
    """Evidence-ladder x mesh composition: whole rungs sharded over
    the devices produce exactly the unsharded vmapped ladder (same
    per-rung keys), and model.log_evidence on a mesh equals the
    meshless result."""
    from lumfuncmcmc_tpu.parallel.sharding import run_tempered_sharded
    from lumfuncmcmc_tpu.samplers.tempering import (
        beta_ladder, run_tempered)

    def lnprior(th):
        return jnp.where(jnp.all(jnp.abs(th) < 5.0), 0.0, -jnp.inf)

    def lnlike(th):
        return -0.5 * jnp.sum(th ** 2)

    k_init, k_run = jax.random.split(jax.random.PRNGKey(11))
    pos0 = jax.random.uniform(k_init, (8, 16, 2), minval=-5.0,
                              maxval=5.0, dtype=jnp.float64)
    betas = beta_ladder(8)
    ch_p, lnl_p, acc_p = run_tempered(lnprior, lnlike, pos0, betas,
                                      k_run, 40)
    mesh = make_mesh(4, 2)
    ch_m, lnl_m, acc_m = run_tempered_sharded(
        lnprior, lnlike, pos0, betas, k_run, 40, mesh)
    np.testing.assert_array_equal(np.asarray(ch_m), np.asarray(ch_p))
    np.testing.assert_array_equal(np.asarray(lnl_m), np.asarray(lnl_p))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple of the mesh"):
        run_tempered_sharded(lnprior, lnlike, pos0[:6], betas[:6],
                             k_run, 40, mesh)


def test_run_parallel_tempering_sharded_matches_meshless():
    """DEO replica exchange across the mesh: ghost-rung boundary
    exchange + identical key streams make the sharded PT BIT-IDENTICAL
    to the meshless run — on a (4,2) mesh with ONE rung per device,
    where every DEO pair crosses a device boundary (the hardest
    case)."""
    from lumfuncmcmc_tpu.parallel.sharding import (
        run_parallel_tempering_sharded)
    from lumfuncmcmc_tpu.samplers.tempering import (
        beta_ladder, run_parallel_tempering)

    def lnprior(th):
        return jnp.where(jnp.all(jnp.abs(th) < 6.0), 0.0, -jnp.inf)

    def lnlike(th):
        lp1 = -0.5 * ((th[0] + 3.0) / 0.5) ** 2
        lp2 = -0.5 * ((th[0] - 3.0) / 0.5) ** 2
        return jnp.logaddexp(lp1, lp2)

    K, W = 8, 16
    k_init, k_run = jax.random.split(jax.random.PRNGKey(21))
    pos0 = jax.random.uniform(k_init, (K, W, 1), minval=-6.0,
                              maxval=6.0, dtype=jnp.float64)
    betas = beta_ladder(K, power=3.0)
    ch_p, lnl_p, acc_p, sw_p = run_parallel_tempering(
        lnprior, lnlike, pos0, betas, k_run, 60, swap_every=10)
    mesh = make_mesh(4, 2)
    ch_m, lnl_m, acc_m, sw_m = run_parallel_tempering_sharded(
        lnprior, lnlike, pos0, betas, k_run, 60, mesh, swap_every=10)
    np.testing.assert_array_equal(np.asarray(ch_m), np.asarray(ch_p))
    np.testing.assert_array_equal(np.asarray(lnl_m),
                                  np.asarray(lnl_p))
    np.testing.assert_array_equal(np.asarray(acc_m), np.asarray(acc_p))
    np.testing.assert_allclose(np.asarray(sw_m), np.asarray(sw_p),
                               rtol=1e-12)
    # swaps actually happened across boundaries
    assert np.asarray(sw_m).max() > 0.0


def test_log_evidence_on_mesh_matches_meshless():
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21,
                   nwalkers=16, nsteps=40)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=6),
                                 cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    ev_plain = LumFuncModel(cfg, **kw).log_evidence(nrungs=8, nsteps=40)
    m = LumFuncModel(cfg, mesh=make_mesh(4, 2), **kw)
    ev_mesh = m.log_evidence(nrungs=6, nsteps=40)   # rounds up to 8
    assert ev_mesh["nrungs"] == 8
    np.testing.assert_allclose(ev_mesh["lnz_ss"], ev_plain["lnz_ss"],
                               rtol=1e-12)
    np.testing.assert_allclose(ev_mesh["mean_lnl"],
                               ev_plain["mean_lnl"], rtol=1e-12)


def test_continue_nuts_sharded_matches_per_device(setup):
    """continue_nuts_sharded is EXACTLY per-device continue_nuts:
    requesting the state does not change the first block, and the
    sharded continuation equals the meshless continue_nuts applied to
    each device's local chain block/state with the block's GLOBAL
    chain ids (the per-global-chain key streams that make mesh
    checkpoints elastic)."""
    from lumfuncmcmc_tpu.parallel.sharding import (
        continue_nuts_sharded, run_nuts_sharded)
    from lumfuncmcmc_tpu.samplers.nuts import (
        continue_nuts, make_unconstrained)
    cfg, ctx, layout = setup
    mesh = make_mesh(2, 2)
    lnp_y, to_theta, to_y = make_unconstrained(
        make_lnprob(ctx, layout), jnp.asarray(layout.lo),
        jnp.asarray(layout.hi))
    thetas = np.asarray(sample_init(jax.random.PRNGKey(3), layout, 8))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    y0 = jax.vmap(to_y)(jnp.asarray(0.8 * mid[None, :] + 0.2 * thetas))

    plain = run_nuts_sharded(lnp_y, y0, jax.random.PRNGKey(4), mesh,
                             num_warmup=40, num_samples=6,
                             max_doublings=5)
    s, lp, al, eps, dv, state = run_nuts_sharded(
        lnp_y, y0, jax.random.PRNGKey(4), mesh, num_warmup=40,
        num_samples=6, max_doublings=5, return_state=True)
    np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(s))

    k_blk = jax.random.PRNGKey(5)
    s2, lp2, al2, df2, state2 = continue_nuts_sharded(
        lnp_y, state, k_blk, mesh, num_samples=6, max_doublings=5)
    assert np.all(np.isfinite(np.asarray(lp2)))
    y_run = np.asarray(state[0])
    eps_s = np.asarray(state[1])
    scale = np.asarray(state[2])
    ndev = 4
    blk = y0.shape[0] // ndev
    for d in range(ndev):
        sl = slice(d * blk, (d + 1) * blk)
        st_d = (jnp.asarray(y_run[sl]), jnp.asarray(eps_s[sl]),
                jnp.asarray(scale[sl]))
        sd, _, _, _, _ = continue_nuts(
            lnp_y, st_d, k_blk, num_samples=6, max_doublings=5,
            chain_ids=d * blk + jnp.arange(blk, dtype=jnp.uint32))
        np.testing.assert_array_equal(
            np.asarray(s2)[:, sl], np.asarray(sd))


def test_fit_model_nuts_min_ess_native_mesh():
    """min_ess on the per-device-replica route: the block loop extends
    the replicated chains via continue_nuts_sharded instead of warning
    the combination off (an unreachable target runs max_blocks)."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, size_ln=21,
                   nwalkers=16, nsteps=8, use_pallas=True,
                   pallas_interpret=True)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=8),
                                 cfg)
    m = LumFuncModel(cfg, mesh=make_mesh(4, 2), z=cat["z"],
                     flux=cat["flux"], flux_e=cat["flux_e"],
                     field_id=cat["field_id"])
    post = m._nuts_gradient_post(m._make_scalar_lnprob())
    assert getattr(post, "engine", None) == "pallas"
    s = m.fit_model_nuts(num_warmup=40, nchains=8, min_ess=1e5,
                         max_blocks=2)
    assert s.shape == (2 * 8 * 8, m.layout.ndim + 1)
    assert np.all(np.isfinite(s))


def test_fit_model_nuts_stream_mesh_route(setup, monkeypatch):
    """fit_model_nuts auto-routes over-VMEM free-comp catalogs on a
    source-sharded mesh to run_nuts_stream_sharded (catalog split
    across devices instead of replicated per NUTS replica)."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg, ctx, layout = setup
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    # sources over budget, grids resident -> stream route
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", ncells * 5 * 4 + 16)
    cfg2 = cfg.replace(use_pallas=True, pallas_interpret=True,
                       nwalkers=8, nsteps=8)
    cat = apply_completeness_cut(make_catalog(cfg2, n_target=300,
                                              seed=9), cfg2)
    m = LumFuncModel(cfg2, mesh=make_mesh(2, 4), z=cat["z"],
                     flux=cat["flux"], flux_e=cat["flux_e"],
                     field_id=cat["field_id"])
    assert m._nuts_stream_mesh_route() is True
    samples = m.fit_model_nuts(num_warmup=40, nchains=4)
    assert samples.shape == (4 * 8, m.layout.ndim + 1)
    assert np.all(np.isfinite(samples))

    # min_ess on the stream route: continue_nuts_stream_sharded blocks
    # (an unreachable target runs exactly max_blocks); source-axis
    # devices must stay bit-identical replicas across the continuation
    s2 = m.fit_model_nuts(num_warmup=40, nchains=4, min_ess=1e5,
                          max_blocks=2)
    assert s2.shape == (2 * 4 * 8, m.layout.ndim + 1)
    assert np.all(np.isfinite(s2))


def test_nuts_min_ess_checkpoint_resume_native_mesh(tmp_path,
                                                    monkeypatch):
    """min-ess NUTS checkpointing on the per-device-replica mesh route:
    each block saves the gathered chain + live PER-CHAIN state; a
    crash mid-loop resumes WITHOUT re-warmup (run_nuts_sharded is
    poisoned on the resume) to the identical chain — including under a
    DIFFERENT mesh shape (elastic checkpoints: the sampling keys fold
    by the global chain index and each chain carries its own adapted
    eps/mass, so a (4,2) checkpoint resumes bit-identically under
    (2,4) and (8,1))."""
    import lumfuncmcmc_tpu.parallel.sharding as sh
    from lumfuncmcmc_tpu.models.model import LumFuncModel

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, size_ln=21,
                   nwalkers=16, nsteps=8, use_pallas=True,
                   pallas_interpret=True)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=8),
                                 cfg)

    def model(mesh_shape=(4, 2)):
        return LumFuncModel(cfg, mesh=make_mesh(*mesh_shape),
                            z=cat["z"], flux=cat["flux"],
                            flux_e=cat["flux_e"],
                            field_id=cat["field_id"])

    ck = str(tmp_path / "mesh_me.npz")
    full = model().fit_model_nuts(num_warmup=40, nchains=8, min_ess=1e6,
                                  max_blocks=3, checkpoint_path=ck)
    saved = np.load(ck)
    assert int(saved["nblocks"]) == 3
    assert saved["fingerprint"].shape == (7,)   # NO mesh dims (elastic)
    assert saved["eps"].shape == (8,)           # per-CHAIN state

    ck2 = str(tmp_path / "mesh_me2.npz")
    orig = sh.continue_nuts_sharded
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    monkeypatch.setattr(sh, "continue_nuts_sharded", flaky)
    with pytest.raises(RuntimeError, match="simulated crash"):
        model().fit_model_nuts(num_warmup=40, nchains=8, min_ess=1e6,
                               max_blocks=3, checkpoint_path=ck2)
    monkeypatch.setattr(sh, "continue_nuts_sharded", orig)
    assert int(np.load(ck2)["nblocks"]) == 2

    def no_warmup(*a, **k):
        raise AssertionError("resume must skip run_nuts_sharded")

    monkeypatch.setattr(sh, "run_nuts_sharded", no_warmup)
    resumed = model().fit_model_nuts(num_warmup=40, nchains=8,
                                     min_ess=1e6, max_blocks=3,
                                     checkpoint_path=ck2, resume=True)
    np.testing.assert_array_equal(resumed, full)

    # ELASTIC: the same truncated (4,2) checkpoint resumes under
    # (2,4) and (8,1) to the bit-identical chain (same device count
    # -> same per-device chain-block width -> same compiled per-chain
    # arithmetic; the key streams and eps/mass are per global chain)
    for shp in [(2, 4), (8, 1)]:
        import shutil
        ck3 = ck2.replace(".npz", "_%d%d.npz" % shp)
        shutil.copy(ck2, ck3)
        res_e = model(mesh_shape=shp).fit_model_nuts(
            num_warmup=40, nchains=8, min_ess=1e6, max_blocks=3,
            checkpoint_path=ck3, resume=True)
        np.testing.assert_array_equal(res_e, full)
    monkeypatch.undo()


def test_nuts_min_ess_checkpoint_resume_stream_mesh(tmp_path,
                                                    monkeypatch,
                                                    setup):
    """min-ess NUTS checkpointing on the source-sharded stream route:
    the resumed run skips warmup (run_nuts_stream_sharded poisoned)
    and reproduces the uninterrupted chain exactly — the source-axis
    bit-identical-replica invariant must survive a state round-trip
    through the npz."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    import lumfuncmcmc_tpu.parallel.sharding as sh
    from lumfuncmcmc_tpu.models.model import LumFuncModel

    cfg, ctx, layout = setup
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", ncells * 5 * 4 + 16)
    cfg2 = cfg.replace(use_pallas=True, pallas_interpret=True,
                       nwalkers=8, nsteps=5, fix_comp=False)
    cat = apply_completeness_cut(make_catalog(cfg2, n_target=200,
                                              seed=9), cfg2)

    def model():
        return LumFuncModel(cfg2, mesh=make_mesh(2, 4), z=cat["z"],
                            flux=cat["flux"], flux_e=cat["flux_e"],
                            field_id=cat["field_id"])

    m = model()
    assert m._nuts_stream_mesh_route() is True
    ck = str(tmp_path / "stream_me.npz")
    full = m.fit_model_nuts(num_warmup=20, nchains=2, min_ess=1e6,
                            max_blocks=2, checkpoint_path=ck)
    saved = np.load(ck)
    assert int(saved["nblocks"]) == 2
    assert saved["eps"].shape == (2,)   # per-chain state

    # truncate to 1 block by rerunning with max_blocks=1
    ck2 = str(tmp_path / "stream_me2.npz")
    model().fit_model_nuts(num_warmup=20, nchains=2, min_ess=1e6,
                           max_blocks=1, checkpoint_path=ck2)
    assert int(np.load(ck2)["nblocks"]) == 1

    def no_warmup(*a, **k):
        raise AssertionError("resume must skip run_nuts_stream_sharded")

    monkeypatch.setattr(sh, "run_nuts_stream_sharded", no_warmup)
    resumed = model().fit_model_nuts(num_warmup=20, nchains=2,
                                     min_ess=1e6, max_blocks=2,
                                     checkpoint_path=ck2, resume=True)
    np.testing.assert_array_equal(resumed, full)


def test_continue_nuts_keys_sharded_bit_identical_blocks(setup):
    """The fixed-length checkpoint protocol on the per-device-replica
    route: run_nuts_sharded(4) + two continue_nuts_keys_sharded blocks
    over [4,8) and [8,12) equals run_nuts_sharded(12) BIT-FOR-BIT —
    each chain slices its own counter-stable PER-GLOBAL-CHAIN key
    stream, so the blocks may run under DIFFERENT mesh shapes of the
    same device count (here (2,2) -> (4,1) -> (1,4)): elastic."""
    from lumfuncmcmc_tpu.parallel.sharding import (
        continue_nuts_keys_sharded, run_nuts_sharded)
    from lumfuncmcmc_tpu.samplers.nuts import make_unconstrained
    cfg, ctx, layout = setup
    mesh = make_mesh(2, 2)
    lnp_y, to_theta, to_y = make_unconstrained(
        make_lnprob(ctx, layout), jnp.asarray(layout.lo),
        jnp.asarray(layout.hi))
    thetas = np.asarray(sample_init(jax.random.PRNGKey(13), layout, 8))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    y0 = jax.vmap(to_y)(jnp.asarray(0.8 * mid[None, :] + 0.2 * thetas))
    key = jax.random.PRNGKey(14)

    full = run_nuts_sharded(lnp_y, y0, key, mesh, num_warmup=40,
                            num_samples=12, max_doublings=5)
    s1, lp1, al1, _, _, st = run_nuts_sharded(
        lnp_y, y0, key, mesh, num_warmup=40, num_samples=4,
        max_doublings=5, return_state=True)
    # host round-trip between blocks, as a real npz resume would do
    host = tuple(jnp.asarray(np.asarray(x)) for x in st)
    s2, lp2, al2, _, st = continue_nuts_keys_sharded(
        lnp_y, host, key, make_mesh(4, 1), 4, 8, max_doublings=5)
    host = tuple(jnp.asarray(np.asarray(x)) for x in st)
    s3, lp3, al3, _, st = continue_nuts_keys_sharded(
        lnp_y, host, key, make_mesh(1, 4), 8, 12, max_doublings=5)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(s1), np.asarray(s2),
                        np.asarray(s3)]), np.asarray(full[0]))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(lp1), np.asarray(lp2),
                        np.asarray(lp3)]), np.asarray(full[1]))


def test_continue_nuts_keys_stream_sharded_bit_identical(setup,
                                                         monkeypatch):
    """Same protocol on the source-sharded streaming route (keys fold
    by the GLOBAL chain index — identical along the source axis, so
    those devices stay bit-identical replicas)."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    from lumfuncmcmc_tpu.parallel.sharding import (
        continue_nuts_keys_stream_sharded, run_nuts_stream_sharded)
    cfg, ctx, layout = setup
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", ncells * 5 * 4 + 16)
    mesh = make_mesh(2, 4)
    thetas = np.asarray(sample_init(jax.random.PRNGKey(15), layout, 4))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    start = jnp.asarray(0.8 * mid[None, :] + 0.2 * thetas)
    from lumfuncmcmc_tpu.samplers.nuts import make_unconstrained
    _, _, to_y = make_unconstrained(
        lambda th: 0.0, jnp.asarray(layout.lo, jnp.float32),
        jnp.asarray(layout.hi, jnp.float32))
    y0 = jax.vmap(to_y)(start.astype(jnp.float32))
    key = jax.random.PRNGKey(16)

    full = run_nuts_stream_sharded(
        ctx, layout, mesh, y0, key, num_warmup=30, num_samples=8,
        interpret=True, max_doublings=4)
    assert full is not None
    s1, lp1, _, _, _, st = run_nuts_stream_sharded(
        ctx, layout, mesh, y0, key, num_warmup=30, num_samples=4,
        interpret=True, max_doublings=4, return_state=True)
    out = continue_nuts_keys_stream_sharded(
        ctx, layout, mesh, st, key, 4, 8, interpret=True,
        max_doublings=4)
    assert out is not None
    s2, lp2, _, _, _ = out
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(s1), np.asarray(s2)]),
        np.asarray(full[0]))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(lp1), np.asarray(lp2)]),
        np.asarray(full[1]))


def test_fit_model_nuts_fixed_ckpt_native_mesh(tmp_path, monkeypatch):
    """Fixed-length --checkpoint-every on the per-device-replica mesh
    route: the checkpointed chain is BIT-IDENTICAL to the plain run,
    and a resume from a truncated npz (poisoned first-block runner)
    completes to the same chain."""
    import lumfuncmcmc_tpu.parallel.sharding as sh
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, size_ln=21,
                   nwalkers=16, nsteps=9, use_pallas=True,
                   pallas_interpret=True, checkpoint_every=4)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=8),
                                 cfg)

    def model(c, shp=(4, 2)):
        return LumFuncModel(c, mesh=make_mesh(*shp), z=cat["z"],
                            flux=cat["flux"], flux_e=cat["flux_e"],
                            field_id=cat["field_id"])

    plain = model(cfg.replace(checkpoint_every=0)).fit_model_nuts(
        num_warmup=40, nchains=8)
    ck = str(tmp_path / "fx.npz")
    ckpt = model(cfg).fit_model_nuts(num_warmup=40, nchains=8,
                                     checkpoint_path=ck)
    np.testing.assert_array_equal(ckpt, plain)
    saved = np.load(ck)
    assert int(saved["nblocks"]) == 3          # 4 + 4 + 1
    assert saved["fingerprint"].shape == (8,)  # NO mesh dims (elastic)

    # crash after block 2, resume without re-running the first block
    ck2 = str(tmp_path / "fx2.npz")
    orig = sh.continue_nuts_keys_sharded
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    monkeypatch.setattr(sh, "continue_nuts_keys_sharded", flaky)
    with pytest.raises(RuntimeError, match="simulated crash"):
        model(cfg).fit_model_nuts(num_warmup=40, nchains=8,
                                  checkpoint_path=ck2)
    monkeypatch.setattr(sh, "continue_nuts_keys_sharded", orig)
    assert int(np.load(ck2)["nblocks"]) == 2

    def no_first(*a, **k):
        raise AssertionError("resume must not re-run the first block")

    monkeypatch.setattr(sh, "run_nuts_sharded", no_first)
    resumed = model(cfg).fit_model_nuts(num_warmup=40, nchains=8,
                                        checkpoint_path=ck2,
                                        resume=True)
    np.testing.assert_array_equal(resumed, plain)

    # ELASTIC: the truncated (4,2) checkpoint also completes under a
    # (2,4) mesh to the bit-identical chain (same device count; keys
    # and state are per global chain, not per device)
    import shutil
    ck3 = str(tmp_path / "fx3.npz")
    shutil.copy(ck2, ck3)
    res_e = model(cfg, shp=(2, 4)).fit_model_nuts(
        num_warmup=40, nchains=8, checkpoint_path=ck3, resume=True)
    np.testing.assert_array_equal(res_e, plain)


def test_fit_model_nuts_fixed_ckpt_stream_mesh(tmp_path, monkeypatch,
                                               setup):
    """Fixed-length --checkpoint-every through fit_model_nuts on the
    SOURCE-SHARDED stream route: the blockwise chain equals the plain
    run bit-for-bit and a truncated npz resumes without re-running the
    warmup block (the crash/resume replay internals are shared with
    the native route — what this pins is the stream-specific
    first/cont wiring and fingerprint)."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    import lumfuncmcmc_tpu.parallel.sharding as sh
    from lumfuncmcmc_tpu.models.model import LumFuncModel

    cfg, ctx, layout = setup
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", ncells * 5 * 4 + 16)
    cfg2 = cfg.replace(use_pallas=True, pallas_interpret=True,
                       nwalkers=8, nsteps=5, fix_comp=False,
                       checkpoint_every=3)
    cat = apply_completeness_cut(make_catalog(cfg2, n_target=200,
                                              seed=9), cfg2)

    def model(c):
        return LumFuncModel(c, mesh=make_mesh(2, 4), z=cat["z"],
                            flux=cat["flux"], flux_e=cat["flux_e"],
                            field_id=cat["field_id"])

    assert model(cfg2)._nuts_stream_mesh_route() is True
    plain = model(cfg2.replace(checkpoint_every=0)).fit_model_nuts(
        num_warmup=20, nchains=2)
    ck = str(tmp_path / "sfx.npz")
    ckpt = model(cfg2).fit_model_nuts(num_warmup=20, nchains=2,
                                      checkpoint_path=ck)
    np.testing.assert_array_equal(ckpt, plain)
    saved = np.load(ck)
    assert int(saved["nblocks"]) == 2          # 3 + 2
    # nchains, warmup, nsteps, every, ndim, seed, rng_protocol,
    # target_accept + the PINNED source axis (psum order); the walker
    # axis is NOT pinned (elastic)
    assert saved["fingerprint"].shape == (9,)

    # truncate by poisoning the continuation of a fresh run after
    # block 1, then resume with the warmup runner poisoned instead
    ck2 = str(tmp_path / "sfx2.npz")
    orig = sh.continue_nuts_keys_stream_sharded

    def boom(*a, **k):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(sh, "continue_nuts_keys_stream_sharded", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        model(cfg2).fit_model_nuts(num_warmup=20, nchains=2,
                                   checkpoint_path=ck2)
    monkeypatch.setattr(sh, "continue_nuts_keys_stream_sharded", orig)
    assert int(np.load(ck2)["nblocks"]) == 1

    def no_first(*a, **k):
        raise AssertionError("resume must not re-run the first block")

    monkeypatch.setattr(sh, "run_nuts_stream_sharded", no_first)
    resumed = model(cfg2).fit_model_nuts(num_warmup=20, nchains=2,
                                         checkpoint_path=ck2,
                                         resume=True)
    np.testing.assert_array_equal(resumed, plain)
