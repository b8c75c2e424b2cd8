"""Pallas kernel parity vs the XLA likelihood (interpret mode on CPU).

The kernels factor exponentials differently from the XLA path (see
ops/pallas_lnlike.py), so agreement is to float32 rounding of the
reductions, not bitwise: lnL magnitudes here are ~1e3-1e4 built from
~1e4-5e4 float32 terms, giving ~1e-6..1e-5 relative error vs the float64
oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.ops.pallas_lnlike import (
    make_pallas_lnlike, make_pallas_lnprob)
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut

RTOL = 5e-4


def _setup(fix_comp=False, fix_sch_al=False, quadrature="trapz",
           size_ln=41, n_target=400, seed=3):
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=fix_comp,
                   fix_sch_al=fix_sch_al, quadrature=quadrature,
                   size_ln=size_ln)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=n_target,
                                              seed=seed), cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    return cfg, ctx, layout


def _compare(ctx, layout, thetas, rtol=RTOL):
    ref = np.asarray(jax.vmap(make_lnprob(ctx, layout))(
        jnp.asarray(thetas, jnp.float64)))
    got = np.asarray(make_pallas_lnprob(ctx, layout, interpret=True)(
        jnp.asarray(thetas, jnp.float32)))
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], ref[finite], rtol=rtol)


@pytest.mark.parametrize("quadrature", ["trapz", "gauss"])
def test_free_comp_parity(quadrature):
    cfg, ctx, layout = _setup(quadrature=quadrature)
    thetas = sample_init(jax.random.PRNGKey(0), layout, 24)
    _compare(ctx, layout, thetas)


@pytest.mark.parametrize("quadrature", ["trapz", "gauss"])
@pytest.mark.quick
def test_fixed_comp_parity(quadrature):
    cfg, ctx, layout = _setup(fix_comp=True, quadrature=quadrature)
    thetas = sample_init(jax.random.PRNGKey(1), layout, 24)
    _compare(ctx, layout, thetas)


def test_free_comp_fixed_alpha_parity():
    cfg, ctx, layout = _setup(fix_sch_al=True)
    thetas = sample_init(jax.random.PRNGKey(2), layout, 16)
    _compare(ctx, layout, thetas)


@pytest.mark.quick
def test_prior_mask_and_padding():
    """Out-of-box thetas map to -inf, and walker counts that are not a
    multiple of the 8-walker block are padded and sliced back."""
    cfg, ctx, layout = _setup(size_ln=31, n_target=250)
    thetas = np.array(sample_init(jax.random.PRNGKey(3), layout, 11))
    thetas[0, 0] = layout.hi[0] + 1.0          # Lstar out of box
    thetas[5, 3] = -1.0                        # negative Flim
    got = np.asarray(make_pallas_lnprob(ctx, layout, interpret=True)(
        jnp.asarray(thetas, jnp.float32)))
    assert got.shape == (11,)
    assert got[0] == -np.inf and got[5] == -np.inf
    assert np.all(np.isfinite(np.delete(got, [0, 5])))


@pytest.mark.parametrize("fix_comp", [False, True])
def test_slab_layout_matches_broadcast(fix_comp):
    """The big-grid slab layout (flat=False) and the small-grid
    broadcast layout (flat=True) compute the same likelihood."""
    cfg, ctx, layout = _setup(fix_comp=fix_comp, size_ln=31, n_target=300)
    thetas = jnp.asarray(sample_init(jax.random.PRNGKey(7), layout, 16),
                         jnp.float32)
    a = np.asarray(make_pallas_lnlike(ctx, layout, interpret=True,
                                      flat=True)(thetas))
    b = np.asarray(make_pallas_lnlike(ctx, layout, interpret=True,
                                      flat=False)(thetas))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    ref = np.asarray(jax.vmap(make_lnprob(ctx, layout))(
        jnp.asarray(thetas, jnp.float64)))
    fin = np.isfinite(ref)
    np.testing.assert_allclose(a[fin], ref[fin], rtol=RTOL)


def test_lnlike_matches_parts_split():
    """The kernel's lnpart - fullint split agrees with the XLA parts."""
    from lumfuncmcmc_tpu.models.likelihood import (
        lnlike_single_epoch_parts)
    cfg, ctx, layout = _setup(size_ln=31, n_target=300)
    lnlike = make_pallas_lnlike(ctx, layout, interpret=True)
    thetas = sample_init(jax.random.PRNGKey(4), layout, 8)
    got = np.asarray(lnlike(jnp.asarray(thetas, jnp.float32)))
    for i, th in enumerate(np.asarray(thetas)):
        lnp, fi = lnlike_single_epoch_parts(
            jnp.asarray(th, jnp.float64), ctx, layout)
        np.testing.assert_allclose(got[i], float(lnp - fi), rtol=RTOL)


def test_walker_block_sizes(monkeypatch):
    """Non-default walker blocks (the large-ensemble path, blk 16-64)
    compute the same likelihood as blk=8, including heavier padding
    (24 walkers pad to 64 at blk=64), and the auto heuristic switches
    to the big block above the batch threshold."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    cfg, ctx, layout = _setup(size_ln=31, n_target=250)
    thetas = jnp.asarray(sample_init(jax.random.PRNGKey(12), layout, 24),
                         jnp.float32)
    base = np.asarray(make_pallas_lnlike(ctx, layout, interpret=True,
                                         blk=8)(thetas))
    for b in (16, 64):
        got = np.asarray(make_pallas_lnlike(ctx, layout, interpret=True,
                                            blk=b)(thetas))
        np.testing.assert_allclose(got, base, rtol=1e-6)
    assert pk._choose_blk(24, None) == pk.BLK_W
    # temp-budget rule: 1024-wide chunks (gauss-32) allow the tallest
    # block; 4096-wide chunks (trapz-101) cap it at 64; the slab layout
    # keeps the default
    assert pk._choose_blk(pk._BIG_BATCH, None, True, 1024) == 256
    assert pk._choose_blk(pk._BIG_BATCH, None, True, 4096) == 64
    assert pk._choose_blk(pk._BIG_BATCH, None, False, 1024) == pk.BLK_W
    # round-up waste rule: a 300-theta half-ensemble must not pad to
    # 512 — the block halves until padding <= wk/8
    assert pk._choose_blk(300, None, True, 1024) == 64
    assert pk._choose_blk(500, None, True, 1024) == 256
    # auto path end to end: force the threshold down so 24 walkers take
    # the big block
    monkeypatch.setattr(pk, "_BIG_BATCH", 16)
    auto = np.asarray(pk.make_pallas_lnlike(ctx, layout,
                                            interpret=True)(thetas))
    np.testing.assert_allclose(auto, base, rtol=1e-6)


def _grad_close(gp, gref, rtol=2e-3):
    """Gradient gate: relative to each component, with a per-row scale
    floor (tiny components of a large gradient only need absolute
    agreement at f32 resolution of the row scale). Typical measured
    error is ~1e-4; the gate is 2e-3."""
    denom = np.maximum(np.abs(gref),
                       1e-3 * np.abs(gref).max(axis=-1, keepdims=True))
    np.testing.assert_array_less(np.abs(gp - gref) / denom, rtol)


@pytest.mark.parametrize("fix_comp", [False, True])
def test_value_and_grad_parity(fix_comp):
    """The fused value+grad kernel (NUTS gradient path) matches
    jax.value_and_grad of the float64 XLA lnprob: value to float32
    rounding, gradient per _grad_close; out-of-box thetas give -inf
    with zero gradient; the scalar composes with vmap (the chain axis
    in run_nuts)."""
    from lumfuncmcmc_tpu.ops.pallas_lnlike import (
        make_pallas_lnprob_and_grad)
    cfg, ctx, layout = _setup(fix_comp=fix_comp, size_ln=31, n_target=250)
    ref = make_lnprob(ctx, layout)
    pal = make_pallas_lnprob_and_grad(ctx, layout, interpret=True)
    assert getattr(pal, "engine", None) == "pallas"
    thetas = np.asarray(sample_init(jax.random.PRNGKey(0), layout, 5))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    thetas = 0.7 * mid[None, :] + 0.3 * thetas
    vref, gref = jax.vmap(jax.value_and_grad(ref))(
        jnp.asarray(thetas, jnp.float64))
    vp, gp = jax.vmap(jax.value_and_grad(pal))(jnp.asarray(thetas))
    vref, gref, vp, gp = map(np.asarray, (vref, gref, vp, gp))
    np.testing.assert_allclose(vp, vref, rtol=RTOL)
    _grad_close(gp, gref)
    bad = thetas[0].copy()
    bad[0] = layout.hi[0] + 1.0
    v, g = jax.value_and_grad(pal)(jnp.asarray(bad, jnp.float32))
    assert float(v) == -np.inf
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_value_and_grad_vmem_gate(monkeypatch):
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    cfg, ctx, layout = _setup(size_ln=31, n_target=250)
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", 1024)
    assert pk.make_pallas_lnprob_and_grad(ctx, layout) is None


def test_nuts_gate_exact_bounds_falls_back(monkeypatch):
    """fit_model_nuts's engine gate must fall back to the XLA scalar for
    exact-bounds free-completeness runs — not propagate the ensemble
    path's explicit-use_pallas + exact_bounds ValueError."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    import lumfuncmcmc_tpu.models.model as mm
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, exact_bounds=True,
                   use_pallas=True, size_ln=31)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=150, seed=5),
                                 cfg)
    m = LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                     flux_e=cat["flux_e"], field_id=cat["field_id"])
    monkeypatch.setattr(mm.jax, "default_backend", lambda: "tpu")
    sentinel = object()
    assert m._nuts_gradient_post(sentinel) is sentinel
    # and the winning configuration still selects the kernel
    cfg2 = cfg.replace(exact_bounds=False, use_pallas=True,
                       pallas_interpret=True)
    m2 = LumFuncModel(cfg2, z=cat["z"], flux=cat["flux"],
                      flux_e=cat["flux_e"], field_id=cat["field_id"])
    post = m2._nuts_gradient_post(sentinel)
    assert post is not sentinel and getattr(post, "engine", None) == \
        "pallas"


def test_value_and_grad_streaming_parity(monkeypatch):
    """The streaming value+grad kernel (mega free-completeness NUTS
    path) matches f64 XLA autodiff AND the resident vg kernel, and the
    VMEM gate routes over-budget catalogs to it instead of None."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    cfg, ctx, layout = _setup(size_ln=31, n_target=400)
    ref = make_lnprob(ctx, layout)
    stream = pk._make_stream_vg_scalar(ctx, layout, interpret=True)
    resident = pk.make_pallas_lnprob_and_grad(ctx, layout,
                                              interpret=True)
    thetas = np.asarray(sample_init(jax.random.PRNGKey(0), layout, 6))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    thetas = 0.7 * mid[None, :] + 0.3 * thetas
    vref, gref = jax.vmap(jax.value_and_grad(ref))(
        jnp.asarray(thetas, jnp.float64))
    vs, gs = jax.vmap(jax.value_and_grad(stream))(
        jnp.asarray(thetas, jnp.float32))
    vr, gr = jax.vmap(jax.value_and_grad(resident))(
        jnp.asarray(thetas, jnp.float32))
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vref),
                               rtol=RTOL)
    _grad_close(np.asarray(vs)[:, None], np.asarray(vr)[:, None],
                rtol=1e-4)
    _grad_close(np.asarray(gs), np.asarray(gref))
    _grad_close(np.asarray(gs), np.asarray(gr), rtol=1e-3)
    # gate: sources over budget, grids resident -> streaming vg (not
    # None); grids over budget too -> None
    nf = len(cfg.Flim)
    ncell_bytes = int(np.prod(np.asarray(ctx.logL_grid).shape)) * 5 * 4
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", ncell_bytes + 16)
    gated = pk.make_pallas_lnprob_and_grad(ctx, layout, interpret=True)
    assert gated is not None and gated.engine == "pallas"
    vg, gg = jax.value_and_grad(gated)(jnp.asarray(thetas[0],
                                                   jnp.float32))
    np.testing.assert_allclose(float(vg), float(vs[0]), rtol=1e-5)
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", 64)
    assert pk.make_pallas_lnprob_and_grad(ctx, layout,
                                          interpret=True) is None


def test_value_and_grad_parity_z():
    """z-model gradient path vs jax.value_and_grad of the float64 XLA
    lnprob (quadratic pivot features, strict pivot prior)."""
    from lumfuncmcmc_tpu.models.likelihood_z import (
        ThetaLayoutZ, make_lnprob_z)
    from lumfuncmcmc_tpu.ops.pallas_lnlike import (
        make_pallas_lnprob_and_grad)
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=300, seed=6),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayoutZ.from_config(cfg)
    ref = make_lnprob_z(ctx, layout)
    pal = make_pallas_lnprob_and_grad(ctx, layout, interpret=True,
                                      model="z")
    rng = np.random.default_rng(13)
    thetas = np.column_stack(
        [rng.uniform(42.0, 43.0, (5, 3)), rng.uniform(-3.5, -2.0, (5, 3)),
         rng.uniform(-1.8, -1.0, (5, 1))])
    vref, gref = jax.vmap(jax.value_and_grad(ref))(
        jnp.asarray(thetas, jnp.float64))
    vp, gp = jax.vmap(jax.value_and_grad(pal))(
        jnp.asarray(thetas, jnp.float32))
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vref),
                               rtol=RTOL)
    _grad_close(np.asarray(gp), np.asarray(gref))


def test_value_and_grad_parity_hier():
    """Hierarchical-model gradient path vs float64 XLA autodiff,
    including the population hyperprior inside the lnrest feature."""
    from lumfuncmcmc_tpu.models.hierarchical import (
        ThetaLayoutH, make_lnprob_h)
    from lumfuncmcmc_tpu.models.model import LumFuncModelH
    from lumfuncmcmc_tpu.ops.pallas_lnlike import (
        make_pallas_lnprob_and_grad)
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=300, seed=6),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayoutH.from_config(cfg)
    m = LumFuncModelH(cfg, z=cat["z"], flux=cat["flux"],
                      flux_e=cat["flux_e"], field_id=cat["field_id"])
    ref = make_lnprob_h(ctx, layout)
    pal = make_pallas_lnprob_and_grad(ctx, layout, interpret=True,
                                      model="hier")
    thetas = np.array(m._initial_positions(jax.random.PRNGKey(9))[:5])
    lo, hi = layout.bounds_arrays()
    mid = 0.5 * (np.asarray(lo) + np.asarray(hi))
    thetas = 0.6 * mid[None, :] + 0.4 * thetas
    vref, gref = jax.vmap(jax.value_and_grad(ref))(
        jnp.asarray(thetas, jnp.float64))
    vp, gp = jax.vmap(jax.value_and_grad(pal))(
        jnp.asarray(thetas, jnp.float32))
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vref),
                               rtol=RTOL)
    _grad_close(np.asarray(gp), np.asarray(gref))


@pytest.mark.parametrize("flat", [True, False])
def test_z_model_parity(flat):
    """z-evolving kernel (both layouts) vs the XLA lnprob, including the
    strict-inequality pivot prior mask."""
    from lumfuncmcmc_tpu.models.likelihood_z import (
        ThetaLayoutZ, make_lnprob_z)
    from lumfuncmcmc_tpu.ops.pallas_lnlike import make_pallas_lnprob_z
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=300, seed=6),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayoutZ.from_config(cfg)
    rng = np.random.default_rng(11)
    thetas = np.column_stack(
        [rng.uniform(41.8, 43.5, (20, 3)), rng.uniform(-4, -1.5, (20, 3)),
         rng.uniform(-2, -0.8, (20, 1))])
    thetas[3, 0] = 60.0  # out of the pivot box -> -inf
    ref = np.asarray(jax.vmap(make_lnprob_z(ctx, layout))(
        jnp.asarray(thetas, jnp.float64)))
    got = np.asarray(make_pallas_lnprob_z(ctx, layout, interpret=True,
                                          flat=flat)(
        jnp.asarray(thetas, jnp.float32)))
    fin = np.isfinite(ref)
    assert not fin[3]
    np.testing.assert_array_equal(np.isfinite(got), fin)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=RTOL)


@pytest.mark.parametrize("flat", [True, False])
def test_hier_model_parity(flat):
    """Hierarchical kernel (both layouts) vs the XLA lnprob, including
    the hyperprior and the prior mask."""
    from lumfuncmcmc_tpu.models.hierarchical import (
        ThetaLayoutH, make_lnprob_h)
    from lumfuncmcmc_tpu.models.model import LumFuncModelH
    from lumfuncmcmc_tpu.ops.pallas_lnlike import make_pallas_lnprob_h
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=300, seed=6),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"], field_id=cat["field_id"])
    layout = ThetaLayoutH.from_config(cfg)
    m = LumFuncModelH(cfg, z=cat["z"], flux=cat["flux"],
                      flux_e=cat["flux_e"], field_id=cat["field_id"])
    thetas = np.array(m._initial_positions(jax.random.PRNGKey(9))[:16])
    thetas[2, 0] = 60.0  # out of box -> -inf
    ref = np.asarray(jax.vmap(make_lnprob_h(ctx, layout))(
        jnp.asarray(thetas, jnp.float64)))
    got = np.asarray(make_pallas_lnprob_h(ctx, layout, interpret=True,
                                          flat=flat)(
        jnp.asarray(thetas, jnp.float32)))
    fin = np.isfinite(ref)
    assert not fin[2]
    np.testing.assert_array_equal(np.isfinite(got), fin)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=RTOL)


def test_engine_auto_selection(monkeypatch):
    """use_pallas=None resolves to the backend: native tier on TPU,
    XLA elsewhere; explicit True on CPU (no interpreter) falls back with
    a warning instead of crashing in Mosaic."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31,
                   nwalkers=8, nsteps=4)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=150, seed=5),
                                 cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])

    m = LumFuncModel(cfg, **kw)               # auto on the CPU backend
    assert m._resolve_use_pallas() is False
    m2 = LumFuncModel(cfg.replace(use_pallas=True), **kw)
    assert m2._resolve_use_pallas() is False  # loud fallback, no crash
    m3 = LumFuncModel(cfg.replace(use_pallas=True,
                                  pallas_interpret=True), **kw)
    assert m3._resolve_use_pallas() is True

    import lumfuncmcmc_tpu.models.model as mm
    monkeypatch.setattr(mm.jax, "default_backend", lambda: "tpu")
    assert m._resolve_use_pallas() is True    # auto picks the native tier
    m4 = LumFuncModel(cfg.replace(use_pallas=False), **kw)
    assert m4._resolve_use_pallas() is False  # --no-pallas respected
    m5 = LumFuncModel(cfg.replace(fix_comp=False, exact_bounds=True), **kw)
    assert m5._resolve_use_pallas() is False  # auto avoids exact-bounds
    # fixed comp, small (flat-layout) grid, large ensemble: XLA's MXU
    # matmul of the affine exponent wins there (docs/PERFORMANCE.md)
    m6 = LumFuncModel(cfg.replace(nwalkers=1024), **kw)
    assert m6._resolve_use_pallas() is False
    m7 = LumFuncModel(cfg.replace(nwalkers=1024, size_ln=161), **kw)
    assert m7._resolve_use_pallas() is True   # big grid stays Pallas
    m8 = LumFuncModel(cfg.replace(nwalkers=1024, fix_comp=False), **kw)
    assert m8._resolve_use_pallas() is True   # free comp stays Pallas


def test_oversize_workload_falls_back_to_xla(monkeypatch):
    """Workloads whose resident arrays exceed the VMEM budget (mega
    catalogs) must transparently use the XLA path instead of OOMing
    scoped vmem at compile time."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    cfg, ctx, layout = _setup(size_ln=31, n_target=250)
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", 1024)  # force the gate
    assert pk.make_pallas_lnlike(ctx, layout) is None
    lnp = pk.make_pallas_lnprob(ctx, layout)  # -> XLA fallback
    thetas = sample_init(jax.random.PRNGKey(8), layout, 8)
    ref = np.asarray(jax.vmap(make_lnprob(ctx, layout))(thetas))
    np.testing.assert_allclose(np.asarray(lnp(thetas)), ref, rtol=1e-6)


def test_streaming_source_kernel(monkeypatch):
    """Mega free-completeness catalogs (source arrays past the VMEM
    budget, grids resident) stream the source slabs from HBM: parity vs
    the resident kernel AND the float64 XLA path, field-aligned slab
    padding, walker-block padding, and the gate routing."""
    import lumfuncmcmc_tpu.ops.pallas_lnlike as pk
    cfg, ctx, layout = _setup(size_ln=31, n_target=400)
    resident = pk.make_pallas_lnlike(ctx, layout, interpret=True)
    stream = pk._make_stream_lnlike(ctx, layout, interpret=True,
                                    blk=None)
    thetas = np.asarray(sample_init(jax.random.PRNGKey(0), layout, 11))
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    thetas = np.asarray(0.7 * mid[None, :] + 0.3 * thetas,
                        dtype=np.float32)
    a = np.asarray(stream(jnp.asarray(thetas)))
    b = np.asarray(resident(jnp.asarray(thetas)))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    ref = np.asarray(jax.vmap(make_lnprob(ctx, layout))(
        jnp.asarray(thetas, jnp.float64)))
    fin = np.isfinite(ref)
    np.testing.assert_allclose(a[fin], ref[fin], rtol=RTOL)
    # gate: source arrays over budget but grids resident -> streaming
    # (engine stays "pallas"); grids over budget too -> None
    nsrc_bytes = int(np.asarray(ctx.lum).shape[0]) * 6 * 4
    ncell_bytes = int(np.prod(np.asarray(ctx.logL_grid).shape)) * 5 * 4
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", ncell_bytes + 16)
    assert ncell_bytes + 16 < ncell_bytes + nsrc_bytes
    lnl = pk.make_pallas_lnlike(ctx, layout, interpret=True)
    assert lnl is not None
    np.testing.assert_allclose(np.asarray(lnl(jnp.asarray(thetas))), b,
                               rtol=1e-5)
    monkeypatch.setattr(pk, "_VMEM_ARRAY_LIMIT", 64)
    assert pk.make_pallas_lnlike(ctx, layout, interpret=True) is None


def test_model_gate_uses_pallas_for_both_comp_modes():
    """LumFuncModel honors use_pallas for free AND fixed completeness,
    and raises loudly for the unsupported exact-bounds combination."""
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    for fix_comp in (False, True):
        cfg = LFConfig(min_comp_frac=0.5, fix_comp=fix_comp, size_ln=31,
                       use_pallas=True, pallas_interpret=True,
                       nwalkers=8, nsteps=4)
        cat = apply_completeness_cut(
            make_catalog(cfg, n_target=200, seed=5), cfg)
        m = LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                         flux_e=cat["flux_e"], field_id=cat["field_id"])
        lnp = m.lnprob_batch()
        thetas = sample_init(jax.random.PRNGKey(6), m.layout, 8)
        ref = np.asarray(jax.vmap(m._make_scalar_lnprob())(
            jnp.asarray(thetas, jnp.float64)))
        got = np.asarray(lnp(jnp.asarray(thetas, jnp.float32)))
        np.testing.assert_allclose(got, ref, rtol=RTOL)

    cfg = LFConfig(min_comp_frac=0.5, size_ln=31, use_pallas=True,
                   exact_bounds=True)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=5),
                                 cfg)
    m = LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                     flux_e=cat["flux_e"], field_id=cat["field_id"])
    with pytest.raises(ValueError, match="exact_bounds"):
        m.lnprob_batch()


def test_roofline_microbench_interpret():
    """The VPU-roofline microbench (ops/pallas_roofline.py) runs in
    interpret mode, its op chain stays inside the (0, 1) clamp (so
    iterating it on hardware cannot drift to inf/NaN), and the slope
    bookkeeping produces positive rates. The chain must be a genuine
    contraction-with-structure: applying it must CHANGE a generic
    input (a fixed-point chain would let the compiler collapse the
    iteration loop)."""
    from lumfuncmcmc_tpu.ops.pallas_roofline import (
        TRANSCENDENTALS_PER_ELEM, _chain, transcendental_peak)

    y = jnp.asarray(np.linspace(0.06, 0.94, 128), jnp.float32)
    out = _chain(y)
    assert np.all(np.asarray(out) >= 0.05)
    assert np.all(np.asarray(out) <= 0.95)
    assert not np.allclose(np.asarray(out), np.asarray(y))
    # iterated a thousand times it stays tame (no drift to the clamp
    # edges everywhere — values remain data-dependent)
    z = y
    for _ in range(1000):
        z = _chain(z)
    assert np.all(np.isfinite(np.asarray(z)))

    r = transcendental_peak(rows=8, cols=128, iters_lo=2, iters_hi=6,
                            reps=2, interpret=True)
    assert r["transcendentals_per_sec"] > 0
    assert r["elements_per_sec"] * TRANSCENDENTALS_PER_ELEM == \
        r["transcendentals_per_sec"]
    assert r["per_iter_s"] > 0
