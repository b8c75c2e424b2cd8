"""NUTS sampler correctness on known posteriors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumfuncmcmc_tpu.samplers.nuts import (
    _subtree_turn, _uturn, make_unconstrained, run_nuts)


def _leapfrog_np(y, p, eps, n, grad):
    """Plain-NumPy leapfrog; returns the n+1 (y, p) states in
    integration order (forward-convention momenta for any sign of eps)."""
    states = [(y.copy(), p.copy())]
    g = grad(y)
    for _ in range(n):
        p_half = p + 0.5 * eps * g
        y = y + eps * p_half
        g = grad(y)
        p = p_half + 0.5 * eps * g
        states.append((y.copy(), p.copy()))
    return states


def test_subtree_turn_direction_sensitivity():
    """The sub-subtree U-turn decision must be orientation-aware.

    Leapfrog with -eps is the exact inverse map, so leftward-integrated
    states keep forward-convention momenta: only dy reverses, and the
    check must swap both the position and momentum pairs when the window
    was opened going leftward. Two properties pin this down on a
    correlated-Gaussian (harmonic oscillator) target:

    1. healthy short windows are not flagged turning in EITHER direction
       (the unflipped check flagged ~all healthy leftward windows);
    2. for the same physical window the leftward decision equals the
       rightward decision (direction symmetry of the stopping rule,
       required for reversibility).
    """
    A = np.array([[1.0, 0.9], [0.9, 1.0]])
    A = np.linalg.inv(A)  # precision of a rho=0.9 Gaussian
    grad = lambda y: -A @ y

    rng = np.random.default_rng(7)
    for _ in range(200):
        y0 = 0.5 * rng.normal(size=2)
        p0 = rng.normal(size=2)
        p0 *= max(1.0, 0.8 / np.linalg.norm(p0))  # keep |p| off zero

        # -- healthy 2-step windows, eps tiny: never turning in EITHER
        # direction (dy ~ eps*p so dy.p ~ eps|p|^2 > 0; the unflipped
        # leftward check flagged ~all of these as turning) -------------
        eps = 0.01
        fwd = _leapfrog_np(y0, p0, eps, 2, grad)
        (ya, pa), (yb, pb) = fwd[1], fwd[2]  # leaves of a size-2 window
        right = bool(_subtree_turn(True, jnp.asarray(ya), jnp.asarray(yb),
                                   jnp.asarray(pa), jnp.asarray(pb)))
        assert not right
        bwd = _leapfrog_np(y0, p0, -eps, 2, grad)
        (yc, pc), (yd, pd) = bwd[1], bwd[2]  # integration order: later→earlier
        left = bool(_subtree_turn(False, jnp.asarray(yc), jnp.asarray(yd),
                                  jnp.asarray(pc), jnp.asarray(pd)))
        assert not left

        # -- direction symmetry on an arbitrary-length window ----------
        n = int(rng.integers(2, 17))
        eps = float(rng.uniform(0.05, 0.6))
        fwd = _leapfrog_np(y0, p0, eps, n, grad)
        (ya, pa), (yb, pb) = fwd[0], fwd[n]
        right = bool(_subtree_turn(True, jnp.asarray(ya), jnp.asarray(yb),
                                   jnp.asarray(pa), jnp.asarray(pb)))
        # integrate leftward from the window's right edge: exactly
        # retraces the same states back to (y0, p0)
        bwd = _leapfrog_np(yb.copy(), pb.copy(), -eps, n, grad)
        yd, pd = bwd[n]
        np.testing.assert_allclose(yd, ya, atol=1e-8)
        np.testing.assert_allclose(pd, pa, atol=1e-8)
        left = bool(_subtree_turn(False, jnp.asarray(yb), jnp.asarray(yd),
                                  jnp.asarray(pb), jnp.asarray(pd)))
        # the leftward-opened window covers the same physical segment —
        # its decision must match the rightward one
        assert left == right, (y0, p0, n, eps)


@pytest.mark.quick
def test_unconstrained_transform_roundtrip():
    lo = jnp.asarray([-1.0, 0.0])
    hi = jnp.asarray([1.0, 5.0])
    lnp, to_theta, to_y = make_unconstrained(lambda th: 0.0, lo, hi)
    th = jnp.asarray([0.3, 2.0])
    np.testing.assert_allclose(np.asarray(to_theta(to_y(th))),
                               np.asarray(th), rtol=1e-6)


@pytest.mark.quick
def test_resample_bad_starts():
    """The stuck-chain guard: starts > gap below the best are replaced
    by jittered copies of good starts (measured failure: 9/256 starts
    at lnp ~ -9e5 pinned the pooled dual-averaging eps 4x small and
    put 3.5% divergences in the bench capture); good starts pass
    through untouched, and an all-bad batch returns unchanged."""
    from lumfuncmcmc_tpu.samplers.nuts import resample_bad_starts

    def lnp(y):
        # a deep well at y0 > 5: catastrophically bad starts
        return jnp.where(y[0] > 5.0, -1.0e6, -0.5 * jnp.sum(y * y))

    y0 = jnp.asarray([[0.0, 0.0], [1.0, -1.0], [9.0, 2.0],
                      [0.5, 0.5], [7.0, 0.0]])
    y1, good = resample_bad_starts(lnp, y0, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(good),
                                  [True, True, False, True, False])
    # good rows untouched; bad rows moved into the good basin
    np.testing.assert_array_equal(np.asarray(y1[good]),
                                  np.asarray(y0[good]))
    lnp1 = np.asarray(jax.vmap(lnp)(y1))
    assert (lnp1 > lnp1.max() - 1000.0).all()
    # replacements are jittered copies, not identical clones
    assert not np.array_equal(np.asarray(y1[2]), np.asarray(y1[4]))

    # non-finite starts count as bad
    y0n = y0.at[0, 0].set(jnp.nan)
    _, good_n = resample_bad_starts(lnp, y0n, jax.random.PRNGKey(0))
    assert not bool(good_n[0])

    # all-bad (the gap criterion is relative to the max, so all-bad
    # means all non-finite): returned unchanged, nothing to copy from
    y_bad = jnp.asarray([[jnp.nan, 0.0], [jnp.nan, 1.0]])
    y2, good2 = resample_bad_starts(lnp, y_bad, jax.random.PRNGKey(0))
    assert not bool(good2.any())
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y_bad))


def test_nuts_recovers_truncated_gaussian_moments():
    # wide box, so effectively an unconstrained Gaussian
    mu = jnp.asarray([0.5, -1.0])
    sd = jnp.asarray([1.0, 0.4])
    lo = jnp.asarray([-20.0, -20.0])
    hi = jnp.asarray([20.0, 20.0])

    def lnpost(theta):
        return -0.5 * jnp.sum(((theta - mu) / sd) ** 2)

    lnp_y, to_theta, to_y = make_unconstrained(lnpost, lo, hi)
    nchains = 8
    y0 = to_y(mu + 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                           (nchains, 2)))
    samples, lnps, alphas, eps, _ = run_nuts(
        lnp_y, y0, jax.random.PRNGKey(1), num_warmup=300, num_samples=600,
        max_doublings=6)
    th = np.asarray(jax.vmap(jax.vmap(to_theta))(samples)).reshape(-1, 2)
    np.testing.assert_allclose(th.mean(axis=0), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(th.std(axis=0), np.asarray(sd), rtol=0.25)
    assert 0.4 < float(np.mean(np.asarray(alphas))) <= 1.0
    assert float(eps) > 1e-4


def test_nuts_on_lf_posterior():
    """NUTS on the actual single-epoch likelihood, short run for CI."""
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.context import build_context
    from lumfuncmcmc_tpu.models.likelihood import (
        ThetaLayout, lnlike_single_epoch)
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31,
                   Lstar=42.5, phistar=-2.6, sch_al=-1.6)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=600, seed=4),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    lo, hi = layout.bounds_arrays()

    def lnpost(th):
        return lnlike_single_epoch(th, ctx, layout)

    lnp_y, to_theta, to_y = make_unconstrained(lnpost, lo, hi)
    start = jnp.asarray([[42.5, -2.6, -1.6]] * 4) \
        + 0.01 * jax.random.normal(jax.random.PRNGKey(5), (4, 3))
    y0 = jax.vmap(to_y)(start)
    samples, lnps, alphas, eps, _ = run_nuts(
        lnp_y, y0, jax.random.PRNGKey(6), num_warmup=150, num_samples=150,
        max_doublings=6)
    th = np.asarray(jax.vmap(jax.vmap(to_theta))(samples)).reshape(-1, 3)
    assert np.all(np.isfinite(th))
    # posterior concentrated near the truth
    assert abs(np.median(th[:, 0]) - 42.5) < 0.5
    assert abs(np.median(th[:, 2]) - (-1.6)) < 0.4


def test_nuts_model_lnprob_column_is_theta_space():
    """Regression: the fitposterior Ln Prob column must be the theta-space
    lnprob, not the unconstrained-space density (which carries the logit
    Jacobian)."""
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31,
                   nwalkers=8, nsteps=40)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=250, seed=9),
                                 cfg)
    m = LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                     flux_e=cat["flux_e"], field_id=cat["field_id"])
    samples = m.fit_model_nuts(num_warmup=60, nchains=4)
    scalar = m._make_scalar_lnprob()
    recomputed = np.asarray(jax.vmap(scalar)(
        jnp.asarray(samples[:, :-1])))
    np.testing.assert_allclose(samples[:, -1], recomputed, rtol=1e-8)


def test_continue_nuts_extends_without_rewarmup():
    """continue_nuts composes with run_nuts(return_state=True): the
    frozen-adaptation continuation runs the exact post-warmup sampling
    program, the first block is unchanged by requesting the state, and
    accumulated blocks keep recovering the target moments."""
    from lumfuncmcmc_tpu.samplers.nuts import continue_nuts

    mu = jnp.asarray([0.5, -1.0])
    sd = jnp.asarray([1.0, 0.4])
    lo = jnp.asarray([-20.0, -20.0])
    hi = jnp.asarray([20.0, 20.0])

    def lnpost(theta):
        return -0.5 * jnp.sum(((theta - mu) / sd) ** 2)

    lnp_y, to_theta, to_y = make_unconstrained(lnpost, lo, hi)
    y0 = to_y(mu + 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                           (6, 2)))
    plain = run_nuts(lnp_y, y0, jax.random.PRNGKey(1), num_warmup=200,
                     num_samples=150, max_doublings=6)
    out = run_nuts(lnp_y, y0, jax.random.PRNGKey(1), num_warmup=200,
                   num_samples=150, max_doublings=6, return_state=True)
    samples, lnps, alphas, eps, dv, state = out
    # requesting the state must not change the sampled block
    np.testing.assert_array_equal(np.asarray(plain[0]),
                                  np.asarray(samples))
    blocks = [samples]
    for i in range(2):
        s2, lp2, al2, df2, state = continue_nuts(
            lnp_y, state, jax.random.PRNGKey(100 + i), num_samples=150,
            max_doublings=6)
        assert s2.shape == samples.shape
        assert np.all(np.isfinite(np.asarray(lp2)))
        blocks.append(s2)
    th = np.asarray(jax.vmap(jax.vmap(to_theta))(
        jnp.concatenate(blocks))).reshape(-1, 2)
    np.testing.assert_allclose(th.mean(axis=0), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(th.std(axis=0), np.asarray(sd), rtol=0.25)
    # continuation must differ from a replay of the first block
    assert not np.array_equal(np.asarray(blocks[1]), np.asarray(samples))


def test_nuts_checkpoint_bitexact_resume_and_fingerprint(tmp_path,
                                                         monkeypatch):
    """NUTS checkpoint/resume protocol: (a) the checkpointed chain is
    BIT-IDENTICAL to the uninterrupted run (counter-stable sampling
    keys — sampling_keys slices the same key stream run_nuts consumes);
    (b) a run killed mid-flight resumes from the npz to the identical
    chain without re-warmup; (c) a changed chain count is rejected by
    the fingerprint."""
    import lumfuncmcmc_tpu.samplers.nuts as nuts_mod
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21,
                   nwalkers=8, nsteps=24)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200, seed=7),
                                 cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    plain = LumFuncModel(cfg, **kw).fit_model_nuts(num_warmup=40,
                                                   nchains=4)

    cfg_ck = cfg.replace(checkpoint_every=10)   # blocks of 10, 10, 4
    ck = str(tmp_path / "nuts.npz")
    ckpt = LumFuncModel(cfg_ck, **kw).fit_model_nuts(
        num_warmup=40, nchains=4, checkpoint_path=ck)
    np.testing.assert_array_equal(ckpt, plain)

    # simulated crash after the second block's save
    ck2 = str(tmp_path / "nuts2.npz")
    orig = nuts_mod.continue_nuts_keys
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    monkeypatch.setattr(nuts_mod, "continue_nuts_keys", flaky)
    with pytest.raises(RuntimeError, match="simulated crash"):
        LumFuncModel(cfg_ck, **kw).fit_model_nuts(
            num_warmup=40, nchains=4, checkpoint_path=ck2)
    monkeypatch.setattr(nuts_mod, "continue_nuts_keys", orig)
    assert int(np.load(ck2)["nblocks"]) == 2

    resumed = LumFuncModel(cfg_ck, **kw).fit_model_nuts(
        num_warmup=40, nchains=4, checkpoint_path=ck2, resume=True)
    np.testing.assert_array_equal(resumed, plain)

    with pytest.raises(ValueError, match="nuts-checkpoint"):
        LumFuncModel(cfg_ck, **kw).fit_model_nuts(
            num_warmup=40, nchains=5, checkpoint_path=ck2, resume=True)


def test_nuts_min_ess_checkpoint_resume(tmp_path, monkeypatch):
    """min-ess NUTS checkpoint/resume: each block saves the chain plus
    the live continuation state; a crash mid-loop resumes WITHOUT
    re-warmup to the identical chain (same fold_in key replay), and a
    changed chain count is fingerprint-rejected."""
    import lumfuncmcmc_tpu.samplers.nuts as nuts_mod
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21,
                   nwalkers=8, nsteps=12)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200,
                                              seed=7), cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    ck = str(tmp_path / "nuts_me.npz")

    # unreachable target + max_blocks=3 -> exactly 3 deterministic
    # blocks (2 continuations)
    full = LumFuncModel(cfg, **kw).fit_model_nuts(
        num_warmup=40, nchains=4, min_ess=1e6, max_blocks=3,
        checkpoint_path=ck)
    assert int(np.load(ck)["nblocks"]) == 3

    ck2 = str(tmp_path / "nuts_me2.npz")
    orig = nuts_mod.continue_nuts
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    monkeypatch.setattr(nuts_mod, "continue_nuts", flaky)
    with pytest.raises(RuntimeError, match="simulated crash"):
        LumFuncModel(cfg, **kw).fit_model_nuts(
            num_warmup=40, nchains=4, min_ess=1e6, max_blocks=3,
            checkpoint_path=ck2)
    monkeypatch.setattr(nuts_mod, "continue_nuts", orig)
    assert int(np.load(ck2)["nblocks"]) == 2

    resumed = LumFuncModel(cfg, **kw).fit_model_nuts(
        num_warmup=40, nchains=4, min_ess=1e6, max_blocks=3,
        checkpoint_path=ck2, resume=True)
    np.testing.assert_array_equal(resumed, full)

    with pytest.raises(ValueError, match="nuts-min-ess"):
        LumFuncModel(cfg, **kw).fit_model_nuts(
            num_warmup=40, nchains=5, min_ess=1e6,
            checkpoint_path=ck2, resume=True)


def test_fit_model_nuts_min_ess_blocks():
    """fit_model_nuts(min_ess=...) extends the chain in nsteps-sized
    blocks until the target; an unreachable target stops at max_blocks."""
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=31,
                   nwalkers=8, nsteps=20)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=300, seed=4),
                                 cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    m = LumFuncModel(cfg, **kw)
    # NUTS ESS/sample ~0.2-1.0: 4 chains x 20 samples per block cannot
    # reach 200 in one block, so at least one continuation must run
    s = m.fit_model_nuts(num_warmup=60, nchains=4, min_ess=200.0,
                         max_blocks=4)
    nblocks = s.shape[0] // (4 * cfg.nsteps)
    assert s.shape[0] % (4 * cfg.nsteps) == 0
    assert 2 <= nblocks <= 4
    assert np.all(np.isfinite(s))


@pytest.mark.quick
def test_nuts_checkpoint_rejects_pre_protocol_npz(tmp_path):
    """An npz written under an OLDER sampling-key protocol — identified
    by its versionless, shorter fingerprint — must be rejected loudly
    on both jit checkpoint routes, not silently spliced with new-key
    continuations (which would void the bit-identity guarantee;
    ADVICE r4). Fails before any sampling compiles, so this is cheap."""
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21,
                   nwalkers=8, nsteps=12, checkpoint_every=5)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200,
                                              seed=7), cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    model = LumFuncModel(cfg, **kw)
    ndim = len(model.layout.names)

    # fixed-length route: the pre-v2 fingerprint was the same first 6
    # knobs WITHOUT the rng_protocol field
    ck = str(tmp_path / "old_fixed.npz")
    np.savez(ck, nblocks=1, fingerprint=np.asarray(
        [4, 40, 12, 5, ndim, cfg.seed], dtype=np.float64))
    with pytest.raises(ValueError, match="rng_protocol"):
        model.fit_model_nuts(num_warmup=40, nchains=4,
                             checkpoint_path=ck, resume=True)

    # min-ess block route: pre-v2 was (nchains, warmup, block, ndim,
    # seed) — also versionless
    ck2 = str(tmp_path / "old_miness.npz")
    np.savez(ck2, nblocks=1, fingerprint=np.asarray(
        [4, 40, 12, ndim, cfg.seed], dtype=np.float64))
    with pytest.raises(ValueError, match="rng_protocol"):
        LumFuncModel(cfg.replace(checkpoint_every=0),
                     **kw).fit_model_nuts(
            num_warmup=40, nchains=4, min_ess=1e6, max_blocks=2,
            checkpoint_path=ck2, resume=True)


def test_target_accept_range_validated():
    """Out-of-(0,1) targets don't error downstream — they silently
    wreck dual averaging (ta >= 1 drives eps to 0, ta <= 0 blows it
    up) — so both entry points fail fast: the CLI at parse time, the
    library in fit_model_nuts before anything compiles."""
    from lumfuncmcmc_tpu.cli.main import main
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    with pytest.raises(SystemExit) as ex:
        main(["fit", "--synthetic", "50", "--sampler", "nuts",
              "--nuts-target-accept", "80"])     # percent confusion
    assert ex.value.code == 2                    # argparse usage error

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21,
                   nwalkers=8, nsteps=10, nuts_target_accept=1.5)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=150,
                                              seed=7), cfg)
    model = LumFuncModel(cfg, z=cat["z"], flux=cat["flux"],
                         flux_e=cat["flux_e"],
                         field_id=cat["field_id"])
    with pytest.raises(ValueError, match="nuts_target_accept"):
        model.fit_model_nuts(num_warmup=20, nchains=4)


def test_nuts_checkpoint_rejects_changed_target_accept(tmp_path):
    """target_accept is chain-affecting (it steers the adapted step
    size, and the divergence warning tells users to change it) — a
    checkpoint written under a different value must be rejected
    loudly, not resumed into a spliced chain. Cheap: the fingerprint
    comparison fires before any sampling compiles."""
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.model import LumFuncModel
    from lumfuncmcmc_tpu.samplers.nuts import RNG_PROTOCOL
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21,
                   nwalkers=8, nsteps=12, checkpoint_every=5)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=200,
                                              seed=7), cfg)
    kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
              field_id=cat["field_id"])
    model = LumFuncModel(cfg, **kw)      # default target_accept 0.8
    ndim = len(model.layout.names)

    # same run knobs, but the npz was written under --nuts-target-
    # accept 0.9 (fixed-length route fingerprint layout)
    ck = str(tmp_path / "ta_fixed.npz")
    np.savez(ck, nblocks=1, fingerprint=np.asarray(
        [4, 40, 12, 5, ndim, cfg.seed, RNG_PROTOCOL, 0.9],
        dtype=np.float64))
    with pytest.raises(ValueError, match="target_accept"):
        model.fit_model_nuts(num_warmup=40, nchains=4,
                             checkpoint_path=ck, resume=True)

    # min-ess block route
    ck2 = str(tmp_path / "ta_miness.npz")
    np.savez(ck2, nblocks=1, fingerprint=np.asarray(
        [4, 40, 12, ndim, cfg.seed, RNG_PROTOCOL, 0.9],
        dtype=np.float64))
    with pytest.raises(ValueError, match="target_accept"):
        LumFuncModel(cfg.replace(checkpoint_every=0),
                     **kw).fit_model_nuts(
            num_warmup=40, nchains=4, min_ess=1e6, max_blocks=2,
            checkpoint_path=ck2, resume=True)


def test_nuts_fp_pins_every_route_layout():
    """The checkpoint fingerprint layouts are an on-disk protocol: a
    checkpoint written by any route must resume under the same route
    after upgrades, so the exact (field order, values) per route is
    pinned here. If this test fails, either bump RNG_PROTOCOL (key
    streams changed) or restore the layout — silently reordering or
    dropping a field would let stale checkpoints resume as spliced
    chains. All five layouts come from the ONE ``_nuts_fp``
    constructor (review r5: three hand-typed sites had to be extended
    in lockstep per knob)."""
    from types import SimpleNamespace
    from lumfuncmcmc_tpu.models.nuts_driver import _NutsDriverMixin
    from lumfuncmcmc_tpu.parallel.mesh import make_mesh
    from lumfuncmcmc_tpu.samplers.nuts import RNG_PROTOCOL

    d = _NutsDriverMixin()
    d.cfg = SimpleNamespace(nsteps=40, seed=7, nuts_target_accept=0.8)
    d.mesh = make_mesh(4, 2)
    y0 = np.zeros((16, 9))
    base = [16, 25, 40, 9, 7, RNG_PROTOCOL, 0.8]
    fixed = [16, 25, 40, 10, 9, 7, RNG_PROTOCOL, 0.8]
    expect = {
        (): (base, "(nchains, num_warmup, block_steps, ndim, seed, "
                   "rng_protocol, target_accept)"),
        (("route", "native_mesh"),): (base, None),
        (("route", "stream_mesh"),): (base + [2], None),
        (("every", 10),): (
            fixed, "(nchains, num_warmup, nsteps, checkpoint_every, "
                   "ndim, seed, rng_protocol, target_accept)"),
        (("every", 10), ("route", "stream_mesh")): (fixed + [2], None),
    }
    for kw, (vals, desc) in expect.items():
        fp, got_desc = d._nuts_fp(y0, 25, **dict(kw))
        assert fp.dtype == np.float64
        np.testing.assert_array_equal(fp, np.asarray(vals, np.float64),
                                      err_msg=str(kw))
        if desc is not None:
            assert got_desc == desc, kw
