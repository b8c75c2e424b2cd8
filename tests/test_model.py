"""Model-driver behaviors: checkpoint/resume, diff_rand, config merge,
sample selection."""

import numpy as np
import jax
import pytest

from lumfuncmcmc_tpu.config import LFConfig, merge_config, load_config_file
from lumfuncmcmc_tpu.models.likelihood import ThetaLayout, sample_init
from lumfuncmcmc_tpu.models.model import LumFuncModel, select_samples
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut


@pytest.fixture(scope="module")
def small_inputs():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31,
                   nwalkers=16, nsteps=40)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=8),
                                 cfg)
    return cfg, cat


def _model(cfg, cat):
    return LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                        flux_e=cat["flux_e"], field_id=cat["field_id"])


@pytest.mark.quick
def test_checkpoint_and_resume(small_inputs, tmp_path):
    cfg, cat = small_inputs
    cfg = cfg.replace(checkpoint_every=10)
    ck = str(tmp_path / "chain.npz")

    m1 = _model(cfg, cat)
    s_full = m1.fit_model(checkpoint_path=ck)
    full_chain = m1.chain.copy()

    # simulate a kill after 20 steps: truncate the checkpoint
    saved = np.load(ck)
    np.savez(ck, chain=saved["chain"][:20],
             lnprobability=saved["lnprobability"][:20])

    m2 = _model(cfg, cat)
    m2.fit_model(checkpoint_path=ck, resume=True)
    # key-stream replay makes the continued run identical
    np.testing.assert_allclose(m2.chain, full_chain, rtol=1e-12)


def test_resume_preserves_acceptance_fraction(small_inputs, tmp_path):
    """A resumed run must report the same acceptance fraction as an
    uninterrupted one: the per-walker accept counts are persisted in the
    checkpoint, not restarted at the resume point."""
    cfg, cat = small_inputs
    cfg = cfg.replace(checkpoint_every=10)
    ck = str(tmp_path / "chain.npz")

    m1 = _model(cfg, cat)
    m1.fit_model(checkpoint_path=ck)
    full_chain = m1.chain.copy()

    # a 20-step run with the same seed produces exactly the npz a killed
    # 40-step run would have left after its second block (same key
    # stream), including the accept counts
    m_half = _model(cfg.replace(nsteps=20), cat)
    m_half.fit_model(checkpoint_path=ck)

    m2 = _model(cfg, cat)
    m2.fit_model(checkpoint_path=ck, resume=True)
    np.testing.assert_allclose(m2.chain, full_chain, rtol=1e-12)
    assert m2.acceptance_fraction == pytest.approx(
        m1.acceptance_fraction, rel=1e-12)


def test_thin_exceeding_nsteps_raises(small_inputs):
    cfg, cat = small_inputs
    m = _model(cfg.replace(thin=100, nsteps=40), cat)
    with pytest.raises(ValueError, match="thin=100 exceeds"):
        m.fit_model()


def test_thinned_checkpointed_fit(small_inputs, tmp_path):
    """cfg.thin must not be silently ignored when checkpointing is on."""
    cfg, cat = small_inputs
    cfg = cfg.replace(thin=5, nsteps=40, checkpoint_every=20)
    ck = str(tmp_path / "chain.npz")
    m = _model(cfg, cat)
    m.fit_model(checkpoint_path=ck)
    assert m.chain.shape[0] == 8  # 40 steps / thin 5
    saved = np.load(ck)
    assert saved["chain"].shape[0] == 8
    assert "acc" in saved
    # acceptance normalized over all executed steps, not recorded rows
    assert 0.0 < m.acceptance_fraction < 1.0


def test_diff_rand_false_collapses_init():
    cfg = LFConfig(min_comp_frac=0.5)
    layout = ThetaLayout.from_config(cfg)
    pos = np.asarray(sample_init(jax.random.PRNGKey(0), layout, 8,
                                 diff_rand=False))
    # one U(0,1) per walker across dims -> same normalized coordinate
    lo = np.asarray(layout.lo); hi = np.asarray(layout.hi)
    u = (pos - lo) / (hi - lo)
    assert np.allclose(u, u[:, :1], atol=1e-12)
    pos2 = np.asarray(sample_init(jax.random.PRNGKey(0), layout, 8,
                                  diff_rand=True))
    u2 = (pos2 - lo) / (hi - lo)
    assert not np.allclose(u2, u2[:, :1], atol=1e-3)


def test_select_samples_doubling():
    rng = np.random.default_rng(0)
    lnp = np.concatenate([np.full(10, 0.0), np.full(90, -100.0)])
    samples = np.column_stack([rng.normal(size=100), lnp])
    # cut=7.5 keeps only 10 < 100//4 -> doubled until >= 25 survive
    out = select_samples(samples, lnprobcut=7.5)
    assert len(out) >= 25


def test_config_merge_precedence(tmp_path):
    f = tmp_path / "conf.py"
    f.write_text("nwalkers = 64\nnsteps = 500\nline_name = 'Ha'\n")
    over = load_config_file(str(f))
    cfg = merge_config(LFConfig(), over, {"nsteps": 77, "nbins": None})
    assert cfg.nwalkers == 64       # from file
    assert cfg.nsteps == 77         # CLI beats file
    assert cfg.nbins == 50          # None CLI -> default preserved
    assert cfg.line_name == "Ha"


def test_zero_is_a_value_not_unset():
    # the reference treated flag value 0 as unset (run_lumfuncmcmc.py:124)
    cfg = merge_config(LFConfig(), None, {"min_comp_frac": 0.0,
                                          "checkpoint_every": 0})
    assert cfg.min_comp_frac == 0.0


def test_veff_lf_from_model(small_inputs):
    cfg, cat = small_inputs
    m = _model(cfg, cat)
    lavg, lf, var = m.veff_lf()
    assert lavg.shape == (cfg.nbins,)
    assert np.all(var > 0)
    assert np.any(lf > 0)


def test_fit_model_until_reaches_ess(small_inputs):
    cfg, cat = small_inputs
    m = _model(cfg, cat)
    samples = m.fit_model_until(min_ess=150, block_steps=60,
                                max_blocks=12)
    from lumfuncmcmc_tpu.samplers.diagnostics import effective_sample_size
    burnless = m.chain  # (steps, W, D)
    # the accumulated chain must actually meet the target post-burn
    from lumfuncmcmc_tpu.samplers.diagnostics import burnin_steps
    burn, _ = burnin_steps(burnless, burnless.shape[0])
    ess = effective_sample_size(burnless[burn:]).min()
    assert ess >= 150
    assert samples.shape[1] == m.layout.ndim + 1


def test_fit_model_until_zero_target_and_bare_checkpoint(small_inputs,
                                                         tmp_path):
    """Review regressions: a min_ess <= 0 target still runs one block
    (the while refactor left `chain` unbound), and a bare checkpoint
    path gets the .npz suffix np.savez appends (a bare path silently
    restarted from 0 on resume)."""
    cfg, cat = small_inputs
    m = _model(cfg, cat)
    s = m.fit_model_until(min_ess=0.0, block_steps=20,
                          checkpoint_path=str(tmp_path / "bare"))
    assert m.chain.shape[0] == 20
    assert s.shape[1] == m.layout.ndim + 1
    assert (tmp_path / "bare.npz").exists()


def test_fit_model_until_checkpoint_resume(small_inputs, tmp_path):
    """min-ess checkpoint/resume: a truncated checkpoint resumes via
    chain-last-row repositioning + key-stream replay to the IDENTICAL
    chain and the identical block-by-block stopping decisions; a
    changed move is fingerprint-rejected."""
    cfg, cat = small_inputs
    ck = str(tmp_path / "until.npz")

    m1 = _model(cfg, cat)
    m1.fit_model_until(min_ess=220, block_steps=40, max_blocks=12,
                       checkpoint_path=ck)
    full = m1.chain.copy()
    assert full.shape[0] >= 80      # target needs >= 2 blocks

    saved = np.load(ck)
    np.savez(ck, chain=saved["chain"][:40],
             lnprobability=saved["lnprobability"][:40],
             acc=saved["acc"], fingerprint=saved["fingerprint"])
    m2 = _model(cfg, cat)
    m2.fit_model_until(min_ess=220, block_steps=40, max_blocks=12,
                       checkpoint_path=ck, resume=True)
    np.testing.assert_array_equal(m2.chain, full)

    m3 = _model(cfg.replace(move="mix"), cat)
    with pytest.raises(ValueError, match="min-ess checkpoint"):
        m3.fit_model_until(min_ess=220, block_steps=40,
                           checkpoint_path=ck, resume=True)


def test_single_field_catalog_works():
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31,
                   Flim=(2.72,), Omega_0=(300000.0,), nwalkers=16,
                   nsteps=30)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=150, seed=4),
                                 cfg)
    m = _model(cfg, cat)
    samples = m.fit_model()
    assert np.all(np.isfinite(samples[:, -1]))


def test_field_id_out_of_range_raises():
    from lumfuncmcmc_tpu.models.context import build_context
    cfg = LFConfig(Flim=(2.72, 3.61))  # 2 fields configured
    with pytest.raises(ValueError, match="field_id"):
        build_context(cfg, z=np.array([1.3, 1.4]),
                      flux=np.array([5.0, 6.0]),
                      field_id=np.array([0, 3]))  # field 3 undefined


def test_thinned_fit(small_inputs):
    cfg, cat = small_inputs
    m = LumFuncModel(cfg.replace(thin=5, nsteps=100), z=cat["z"],
                     flux=cat["flux"], flux_e=cat["flux_e"],
                     field_id=cat["field_id"])
    m.fit_model()
    assert m.chain.shape[0] == 20  # 100 steps / thin 5
    assert np.all(np.isfinite(m.samples[:, -1]))


def test_get_params_natural_z_parameterization(small_inputs):
    """get_params must cover the natural (value/slope/curvature)
    z-evolution names (previously KeyError: 'Lmid')."""
    from lumfuncmcmc_tpu.models.model import LumFuncModelZ
    cfg, cat = small_inputs
    m = LumFuncModelZ(cfg.replace(z_param="natural", fix_comp=True),
                      z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
                      field_id=cat["field_id"])
    vals = m.get_params()
    assert len(vals) == m.layout.ndim
    assert np.all(np.isfinite(vals))


def test_gelman_rubin_ensembles_statistic():
    from lumfuncmcmc_tpu.samplers.diagnostics import gelman_rubin_ensembles
    rng = np.random.default_rng(0)
    good = rng.normal(size=(4, 200, 8, 2))
    r = gelman_rubin_ensembles(good)
    assert r.shape == (2,)
    assert np.all(r < 1.05)
    bad = good.copy()
    bad[0] += 5.0  # one ensemble stuck in a different mode
    assert np.all(gelman_rubin_ensembles(bad) > 1.5)
    with pytest.raises(ValueError, match="C>=2"):
        gelman_rubin_ensembles(good[:1])


def test_fit_model_ensembles(small_inputs):
    cfg, cat = small_inputs
    m = _model(cfg.replace(nwalkers=8, nsteps=60), cat)
    s = m.fit_model_ensembles(3)
    ndim = m.layout.ndim
    assert s.shape[1] == ndim + 1
    assert m.rhat_ensembles.shape == (ndim,)
    assert np.all(np.isfinite(m.rhat_ensembles))
    # pooled chain carries all 3 ensembles' walkers
    assert m.chain.shape[1] == 3 * 8
    with pytest.raises(ValueError, match=">= 2 ensembles"):
        m.fit_model_ensembles(1)


def test_fit_model_ensembles_min_ess(small_inputs):
    """min_ess block-extends the ensembles run: an unreachable-in-one-
    block target forces >=2 blocks, the pooled chain concatenates
    block-continuously (mix move keeps its global DE schedule), and
    the acceptance fraction is normalized by the TOTAL executed steps,
    not one block's."""
    cfg, cat = small_inputs
    m = _model(cfg.replace(nwalkers=8, nsteps=20, move="mix"), cat)
    m.fit_model_ensembles(2, min_ess=150.0, max_blocks=5)
    # 2 ensembles x 8 walkers pooled; >= 2 recorded blocks of 20
    assert m.chain.shape[1] == 16
    nblocks = m.chain.shape[0] // 20
    assert m.chain.shape[0] % 20 == 0
    assert 2 <= nblocks <= 5
    assert 0.0 < m.acceptance_fraction < 1.0
    assert np.all(np.isfinite(m.rhat_ensembles))


def test_fit_model_ensembles_min_ess_checkpoint_resume(small_inputs,
                                                       tmp_path):
    """min-ess ensembles checkpoint/resume: a truncated checkpoint
    resumes to the identical pooled chain; a changed ensemble count is
    fingerprint-rejected."""
    cfg, cat = small_inputs
    cfg = cfg.replace(nwalkers=8, nsteps=20)
    ck = str(tmp_path / "ensu.npz")

    m1 = _model(cfg, cat)
    m1.fit_model_ensembles(2, min_ess=150.0, max_blocks=5,
                           checkpoint_path=ck)
    full = m1.chain.copy()
    assert full.shape[0] >= 40          # needed >= 2 blocks

    saved = np.load(ck)
    np.savez(ck, chain=saved["chain"][:, :20],
             lnprobability=saved["lnprobability"][:, :20],
             acc=saved["acc"], fingerprint=saved["fingerprint"])
    m2 = _model(cfg, cat)
    m2.fit_model_ensembles(2, min_ess=150.0, max_blocks=5,
                           checkpoint_path=ck, resume=True)
    np.testing.assert_array_equal(m2.chain, full)

    m3 = _model(cfg, cat)
    with pytest.raises(ValueError, match="ensemble-min-ess"):
        m3.fit_model_ensembles(3, min_ess=150.0,
                               checkpoint_path=ck, resume=True)


def test_fit_model_ensembles_sharded_matches_unsharded(small_inputs):
    """Ensembles x mesh composition: whole ensembles sharded over the
    devices produce exactly the chains of the single-device vmapped
    run (same per-ensemble keys), and a non-multiple count rounds up."""
    from lumfuncmcmc_tpu.parallel.mesh import make_mesh
    cfg, cat = small_inputs
    cfg = cfg.replace(nwalkers=8, nsteps=30)
    m_plain = _model(cfg, cat)
    m_plain.fit_model_ensembles(4)
    m_mesh = LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                          flux_e=cat["flux_e"], field_id=cat["field_id"],
                          mesh=make_mesh(4, 1))
    m_mesh.fit_model_ensembles(3)   # rounds up to 4
    assert m_mesh.chain.shape == m_plain.chain.shape
    np.testing.assert_allclose(m_mesh.chain, m_plain.chain, rtol=1e-12)
    np.testing.assert_allclose(m_mesh.rhat_ensembles,
                               m_plain.rhat_ensembles, rtol=1e-9)


def test_fit_model_ensembles_checkpoint_resume(small_inputs, tmp_path):
    """Ensembles checkpointing mirrors fit_model: a truncated
    checkpoint resumes via key-stream replay to the identical pooled
    chain, and a changed ensemble count is rejected."""
    cfg, cat = small_inputs
    cfg = cfg.replace(nwalkers=8, nsteps=40, checkpoint_every=10)
    ck = str(tmp_path / "ens.npz")

    m1 = _model(cfg, cat)
    m1.fit_model_ensembles(3, checkpoint_path=ck)
    full_chain = m1.chain.copy()

    saved = np.load(ck)
    assert saved["chain"].shape[0] == 3          # leading ensemble axis
    np.savez(ck, chain=saved["chain"][:, :20],
             lnprobability=saved["lnprobability"][:, :20],
             acc=saved["acc"], fingerprint=saved["fingerprint"])

    m2 = _model(cfg, cat)
    m2.fit_model_ensembles(3, checkpoint_path=ck, resume=True)
    np.testing.assert_allclose(m2.chain, full_chain, rtol=1e-12)

    m3 = _model(cfg, cat)
    with pytest.raises(ValueError, match="ensemble-checkpoint"):
        m3.fit_model_ensembles(4, checkpoint_path=ck, resume=True)


def test_checkpoint_resume_mix_move(small_inputs, tmp_path):
    """Mix-move checkpoint resume: the global DE schedule and the key
    replay keep the resumed chain identical, and the de_prob
    fingerprint rejects a changed mixing fraction."""
    cfg, cat = small_inputs
    cfg = cfg.replace(checkpoint_every=10, move="mix", de_prob=0.3)
    ck = str(tmp_path / "mix.npz")
    m1 = _model(cfg, cat)
    m1.fit_model(checkpoint_path=ck)
    full_chain = m1.chain.copy()
    saved = np.load(ck)
    np.savez(ck, chain=saved["chain"][:20],
             lnprobability=saved["lnprobability"][:20],
             acc=saved["acc"], fingerprint=saved["fingerprint"])
    m2 = _model(cfg, cat)
    m2.fit_model(checkpoint_path=ck, resume=True)
    np.testing.assert_allclose(m2.chain, full_chain, rtol=1e-12)
    m3 = _model(cfg.replace(de_prob=0.7), cat)
    with pytest.raises(ValueError, match="checkpoint config mismatch"):
        m3.fit_model(checkpoint_path=ck, resume=True)


def test_nuts_engine_batch_aware(small_inputs, monkeypatch):
    """Auto NUTS engine is batch-aware: the fused Pallas value+grad
    kernel at default chain counts, XLA autodiff once the per-device
    chain batch is large ON A SMALL GRID (measured XLA-wins regime:
    gauss-32 loses 1.5-1.6x at >=128 chains), and Pallas at any batch
    on big grids (trapz-101 wins 1.5x at 256 chains)."""
    import lumfuncmcmc_tpu.models.model as mm
    _, cat = small_inputs
    monkeypatch.setattr(mm.jax, "default_backend", lambda: "tpu")
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False, size_ln=31,
                   quadrature="gauss", nwalkers=16, nsteps=6,
                   pallas_interpret=True)
    m = _model(cfg, cat)
    scalar = m._make_scalar_lnprob()
    assert getattr(m._nuts_gradient_post(scalar, nchains=8),
                   "engine", None) == "pallas"
    assert m._nuts_gradient_post(scalar, nchains=128) is scalar
    # explicit use_pallas overrides the batch rule
    m_exp = _model(cfg.replace(use_pallas=True), cat)
    assert getattr(m_exp._nuts_gradient_post(m_exp._make_scalar_lnprob(),
                                             nchains=128),
                   "engine", None) == "pallas"
    # big grid keeps the native kernel at large batches
    m_big = _model(cfg.replace(quadrature="trapz", size_ln=101), cat)
    assert getattr(m_big._nuts_gradient_post(m_big._make_scalar_lnprob(),
                                             nchains=256),
                   "engine", None) == "pallas"
