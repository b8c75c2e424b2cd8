"""Parallel-tempering evidence estimation (new capability).

Neither the reference nor the classical 1/V_eff pipeline can compare
model families quantitatively (fixed vs free completeness, single-epoch
vs z-evolving, global vs hierarchical): that needs the marginal
likelihood Z = ∫ p(θ) L(θ) dθ. This module estimates ln Z over a
temperature ladder

    lnpost_β(θ) = lnprior(θ) + β · lnlike(θ),   β ∈ [0, 1],

with ALL rungs sampled simultaneously: the ladder is one more vmapped
axis over the same red-black stretch kernel (:func:`run_stretch`), so a
16-rung ladder costs one 16×-wider walker batch on the chip instead of
16 sequential runs — the same replication trick as
``run_stretch_ensembles``, spent on an integral over β instead of on
replicas.

Two estimators are computed from the same ladder:

- **Thermodynamic integration (TI)**: ln Z = ∫₀¹ E_β[lnlike] dβ,
  trapezoid over the ladder. The power-law ladder
  β_k = (k/(K−1))^power concentrates rungs near β = 0 where
  E_β[lnlike] changes fastest (standard practice; power 3–5).
- **Stepping-stone (SS)**: ln Z = Σ_k ln E_{β_k}[exp((β_{k+1}−β_k)
  lnlike)], each factor a logsumexp over rung-k samples. Tighter than
  TI at equal rung counts (Xie et al. 2011); reported as the primary
  estimate, with |SS − TI| a practical ladder-resolution check.

On luminosity-function posteriors the prior rung's lnlike spans an
astronomical range (box corners sit at lnlike ~ −10¹⁰), so coarse-
ladder TI is dominated by the first trapezoid panel — its reported
quadrature error correctly owns that bias (hundreds of thousands of
nats on an 8-rung ladder), and SS, whose factors exponentiate only the
tiny β increments, stays at posterior scale. Trust SS; read TI ± err
as the resolution diagnostic it is.

Normalization convention: with the prior measure e^lnprior of mass
Z₀ = ∫ e^lnprior dθ (the box volume; box × Gaussians for the
hierarchical model), the estimators return ln[Z(1)/Z(0)] =
ln ∫ (e^lnprior/Z₀) e^lnlike dθ — the evidence under the NORMALIZED
prior. Two models estimated this way compare as a direct Bayes factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lumfuncmcmc_tpu.samplers.affine import run_stretch

NEG_INF = -jnp.inf


def beta_ladder(nrungs: int, power: float = 5.0):
    """Power-law temperature ladder β_k = (k/(K−1))^power, K rungs
    from exactly 0 to exactly 1 (host numpy — ladder choice is not a
    traced decision)."""
    if nrungs < 3:
        raise ValueError("need at least 3 rungs (0, intermediate, 1)")
    k = np.arange(nrungs, dtype=np.float64) / (nrungs - 1)
    return k ** float(power)


def tune_ladder(betas, swap_frac, floor: float = 1e-3):
    """Re-space the ladder to EQUALIZE swap rejection across pairs
    (Syed et al. 2021's communication-barrier schedule).

    The round-trip rate of replica exchange is governed by the
    cumulative rejection curve Λ(β): the optimal K-rung ladder places
    rungs at equal Λ increments. Estimate Λ piecewise-linearly from
    the measured per-pair rejection ``r_k = 1 − swap_frac_k``
    (Λ(β_k) = Σ_{j<k} r_j), then invert: β'_i = Λ⁻¹(i Λ_total/(K−1)).
    Endpoints stay exactly 0 and 1; rejections are floored at
    ``floor`` so a fully-mixing pair cannot collapse two rungs onto
    one β. Host numpy — ladder choice is not a traced decision.

    Returns the tuned ``betas'`` (same length, strictly increasing).
    A couple of short tuning legs typically moves most of the benefit:
    rungs migrate toward the β region where exchange actually stalls
    (for LF posteriors, the near-prior end), which is where power-law
    spacing guesses and the real barrier disagree.
    """
    betas = np.asarray(betas, dtype=np.float64)
    r = 1.0 - np.clip(np.asarray(swap_frac, dtype=np.float64), 0.0, 1.0)
    if betas.ndim != 1 or r.shape != (betas.shape[0] - 1,):
        raise ValueError(
            f"swap_frac must have len(betas)-1 entries, got "
            f"{r.shape} for {betas.shape[0]} rungs")
    r = np.maximum(r, floor)
    lam = np.concatenate([[0.0], np.cumsum(r)])
    targets = np.linspace(0.0, lam[-1], betas.shape[0])
    out = np.interp(targets, lam, betas)
    out[0], out[-1] = 0.0, 1.0
    # np.interp on a strictly increasing lam keeps out strictly
    # increasing; guard against float ties from extreme floors anyway.
    # Repair INTERIOR rungs only, then re-pin the top and back-
    # propagate downward — a forward sweep over all indices could push
    # out[-1] past 1.0 and break evidence_from_ladder's β_{K-1} == 1
    # assumption (ADVICE r4).
    eps = 1e-12
    for i in range(1, out.shape[0] - 1):
        if out[i] <= out[i - 1]:
            out[i] = out[i - 1] + eps
    out[-1] = 1.0
    for i in range(out.shape[0] - 2, 0, -1):
        if out[i] >= out[i + 1]:
            out[i] = out[i + 1] - eps
    return out


def barrier_stats(swap_frac):
    """Communication-barrier summary from measured DEO swap rates.

    ``Λ = Σ_k (1 − s_k)`` (the cumulative rejection over adjacent
    pairs) estimates the total communication barrier of Syed et al.
    2021; their Corollary 1 gives the non-reversible DEO round-trip
    rate as ``1/(2 + 2Λ)`` in the well-tuned-schedule limit — the
    number of independent prior→posterior→prior traversals each
    replica completes per swap-round sweep pair. A rate near the
    ``1/(2K−2)`` ideal (Λ→K−1 when every pair is floored) means the
    ladder is communication-bound; raising it needs better spacing
    (:func:`tune_ladder`) before more rungs. Host numpy.
    """
    r = 1.0 - np.clip(np.asarray(swap_frac, dtype=np.float64),
                      0.0, 1.0)
    lam = float(r.sum())
    return {"lambda": lam, "roundtrip_rate": 1.0 / (2.0 + 2.0 * lam)}


def _rung_runner(lnprior_fn, lnlike_fn, nsteps: int, a: float = 2.0,
                 move: str = "stretch", de_prob: float = 0.5):
    """``one(pos (W, D), key, beta) -> (chain, lnl, acc)`` for a single
    ladder rung — shared by the vmapped :func:`run_tempered` and the
    mesh-sharded ``run_tempered_sharded`` so the two produce identical
    chains rung-for-rung (same key-per-rung handling)."""
    def lnprob_beta(theta, beta):
        lp = lnprior_fn(theta)
        lnl = lnlike_fn(theta)
        # beta * lnl is 0 * -inf = NaN on the prior rung when the
        # likelihood hits an exact zero (e.g. a completeness underflow
        # inside the box) — a NaN lnp freezes that walker forever
        tempered = jnp.where(beta > 0, beta * lnl, 0.0)
        return jnp.where(jnp.isfinite(lp), lp + tempered, NEG_INF)

    def one(p, k, beta):
        batch = jax.vmap(lambda th: lnprob_beta(th, beta))
        _, ch, _, acc = run_stretch(batch, p, k, nsteps, a=a,
                                    move=move, de_prob=de_prob)
        lnl = jax.vmap(jax.vmap(lnlike_fn))(ch)
        return ch, lnl, acc

    return one


def run_tempered(lnprior_fn, lnlike_fn, pos0, betas, key, nsteps: int,
                 a: float = 2.0, move: str = "stretch",
                 de_prob: float = 0.5):
    """Sample every ladder rung simultaneously.

    ``pos0``: (K, W, D) per-rung walker starts; ``betas``: (K,). The
    rung axis is vmapped over :func:`run_stretch` with β entering the
    tempered posterior as a per-rung traced scalar (the closure
    pattern of ``run_stretch_ensembles``; the mix move's deterministic
    DE schedule stays a host constant shared by all rungs, so the
    per-step ``lax.cond`` predicate remains unbatched).

    Returns ``(chains (K, S, W, D), lnls (K, S, W), acc (K, W))`` with
    ``lnls`` the UNtempered per-sample lnlike (recomputed on the
    recorded chain — the sampler's recorded lnp is the tempered
    posterior, useless for the β-integrals).
    """
    one = _rung_runner(lnprior_fn, lnlike_fn, nsteps, a=a, move=move,
                       de_prob=de_prob)
    keys = jax.random.split(key, pos0.shape[0])
    return jax.vmap(one)(pos0, keys, jnp.asarray(betas, pos0.dtype))


def _pair_swap_block(pos, lnl, db, u, active):
    """Adjacent-pair replica exchange over a block of n rungs.

    ``pos (n, W, D)``, ``lnl (n, W)``; pair i = (rung i, rung i+1)
    with temperature gap ``db (n-1,)``, uniforms ``u (n-1, W)`` and an
    explicit activity mask ``active (n-1,)``. Active pairs must be
    DISJOINT (DEO parity guarantees it), so every decision reads the
    pre-phase state and the update vectorizes with two shifted selects
    — no sequential sweep. The explicit mask is what lets the
    mesh-sharded variant run the same update on an extended local
    block (ghost rungs from the neighbor devices) with out-of-range
    ghost pairs masked off. Returns ``(pos', lnl', do (n-1, W))``."""
    ln_r = db[:, None] * (lnl[:-1] - lnl[1:])
    do = (jnp.log(u) < ln_r) & active[:, None]
    up = jnp.pad(do, ((0, 1), (0, 0)))   # rung k trades with k+1
    dn = jnp.pad(do, ((1, 0), (0, 0)))   # rung k trades with k-1
    pos_n = jnp.where(up[..., None], jnp.roll(pos, -1, 0), pos)
    pos_n = jnp.where(dn[..., None], jnp.roll(pos, 1, 0), pos_n)
    lnl_n = jnp.where(up, jnp.roll(lnl, -1, 0), lnl)
    lnl_n = jnp.where(dn, jnp.roll(lnl, 1, 0), lnl_n)
    return pos_n, lnl_n, do


def _deo_swap(pos, lnl, betas, u, phase):
    """One DEO (deterministic even-odd) swap phase over the whole
    ladder: pairs whose LEFT rung index has parity ``phase``
    exchange via :func:`_pair_swap_block`."""
    active = (jnp.arange(betas.shape[0] - 1) % 2) == phase
    return _pair_swap_block(pos, lnl, betas[1:] - betas[:-1], u,
                            active)


def run_parallel_tempering(lnprior_fn, lnlike_fn, pos0, betas, key,
                           nsteps: int, swap_every: int = 10,
                           a: float = 2.0, move: str = "stretch",
                           de_prob: float = 0.5):
    """True parallel tempering: the :func:`run_tempered` ladder PLUS
    replica-exchange swaps every ``swap_every`` steps.

    The swap schedule is DEO — deterministic even-odd pairing (Syed et
    al. 2019's non-reversible scheme): rounds alternate between the
    even pairs (0-1, 2-3, …) and the odd pairs (1-2, 3-4, …), so a
    state accepted upward keeps moving in one direction instead of
    random-walking on the ladder (better round-trip rates than random
    or swept pairing), and every active pair is disjoint — the whole
    phase is one vectorized exchange. Swaps let the β=1 chain inherit
    mode-hopping from the hot rungs: an ensemble whose walkers all sit
    in one mode of a multimodal posterior CANNOT leave it by stretch
    moves alone (proposals interpolate within the occupied mode), but
    the prior-like rungs traverse freely and hand modes down the
    ladder (pinned by the bimodal test in tests/test_evidence.py).

    Structured as one ``lax.scan`` over rounds (an unrolled Python
    loop over hundreds of blocks would explode compile time —
    CLAUDE.md).

    Returns ``(chains (K, nsteps', W, D), lnls (K, nsteps', W),
    acc (K, W), swap_frac (K-1,))`` with ``nsteps'`` = nsteps rounded
    down to a multiple of ``swap_every`` and ``swap_frac`` each
    adjacent pair's acceptance fraction over the rounds it was active.
    The chains/lnls layout matches :func:`run_tempered`, so
    :func:`evidence_from_ladder` consumes them unchanged.
    """
    if swap_every <= 0:
        raise ValueError("swap_every must be positive (use "
                         "run_tempered for the swapless ladder)")
    nrounds = nsteps // swap_every
    if nrounds < 1:
        raise ValueError(
            f"nsteps={nsteps} < swap_every={swap_every}: no full "
            "round would run")
    K, W, D = pos0.shape
    betas_a = jnp.asarray(betas, pos0.dtype)
    one = _rung_runner(lnprior_fn, lnlike_fn, swap_every, a=a,
                       move=move, de_prob=de_prob)

    def round_body(carry, inp):
        pos, = carry
        k_r, phase = inp
        k_blk, k_swap = jax.random.split(k_r)
        keys = jax.random.split(k_blk, K)
        ch, lnl, acc = jax.vmap(one)(pos, keys, betas_a)
        u = jax.random.uniform(k_swap, (K - 1, W), pos.dtype)
        pos, _, do = _deo_swap(ch[:, -1], lnl[:, -1], betas_a, u,
                               phase)
        return (pos,), (ch, lnl, acc, do.astype(pos.dtype))

    keys_r = jax.random.split(key, nrounds)
    phases = jnp.arange(nrounds) % 2
    (_,), (chs, lnls, accs, sw) = jax.lax.scan(
        round_body, (pos0,), (keys_r, phases))
    # (R, K, S, ...) -> (K, R*S, ...)
    chains = jnp.moveaxis(chs, 0, 1).reshape(K, nrounds * swap_every,
                                             W, D)
    lnls = jnp.moveaxis(lnls, 0, 1).reshape(K, nrounds * swap_every, W)
    acc = jnp.sum(accs, axis=0)
    # each pair is active every other round: normalize by its own
    # active count so the fraction is an acceptance RATE, not diluted
    # by the idle rounds
    active_counts = jnp.asarray(
        [(nrounds + (1 if k % 2 == 0 else 0)) // 2
         for k in range(K - 1)], sw.dtype)
    swap_frac = jnp.sum(jnp.mean(sw, axis=2), axis=0) \
        / jnp.maximum(active_counts, 1.0)
    return chains, lnls, acc, swap_frac


def evidence_from_ladder(lnls, betas, burn_frac: float = 0.5):
    """TI + stepping-stone ln Z from per-rung lnlike chains.

    ``lnls``: (K, S, W) host array of untempered lnlike values in
    ladder order; ``betas``: (K,) ascending, β₀ = 0, β_{K−1} = 1.
    ``burn_frac``: leading fraction of each rung's chain discarded.

    Returns a dict with ``lnz_ss`` (primary), ``lnz_ss_err`` (delta-
    method standard error: each stepping-stone ratio is ln of a sample
    mean of y = exp(dbeta lnl), so var(ln m) ~ var(y)/(n_eff m^2) with
    n_eff the autocorrelation-aware ESS of the y series; rung chains
    are independent, so the per-ratio variances add — Xie et al. 2011
    sec 3.2 form. A huge ``lnz_ss_err`` is the honest signal that the
    near-prior rungs are dominated by a few samples and the ladder
    needs more rungs, exactly the failure mode the 15-parameter
    hierarchical posterior hits at small K), ``lnz_ti``, ``lnz_ti_err``
    (autocorrelation-aware standard error of the TI quadrature), the
    per-rung ``mean_lnl`` curve, and the ladder.
    """
    from lumfuncmcmc_tpu.samplers.diagnostics import (
        effective_sample_size)

    lnls = np.asarray(lnls, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    K, S, W = lnls.shape
    burn = min(int(burn_frac * S), S - 2)
    post = lnls[:, burn:, :]                    # (K, S', W)
    flat = post.reshape(K, -1)
    e = flat.mean(axis=1)

    lnz_ti = float(np.trapezoid(e, betas))

    def log_mean_exp(x):
        # scipy is test-oracle-only in this repo (CLAUDE.md)
        m = np.max(x)
        if not np.isfinite(m):
            # all-(-inf) rung (or a stray inf): exp(x - m) would be
            # NaN; the mean of exp is exp(m) itself in either case
            return float(m)
        return float(m + np.log(np.mean(np.exp(x - m))))

    db = np.diff(betas)
    lnz_ss = 0.0
    var_ss = 0.0
    for k in range(K - 1):
        # ln (1/n) Σ exp(dβ_k · lnl_i) over rung-k samples
        lnz_ss += log_mean_exp(db[k] * flat[k])
        # delta-method variance of this ratio: shift by the max so the
        # exp is finite, the ratio var(y)/mean(y)^2 is shift-invariant
        x = db[k] * post[k]                       # (S', W)
        m = np.max(x)
        if np.isfinite(m):
            y = np.exp(x - m)
            ess_y = float(effective_sample_size(
                y[:, :, None]).min()) if y.std() > 0 else y.size
            mu = float(y.mean())
            var_ss += float(y.var()) / (max(ess_y, 1.0) * mu * mu)
    lnz_ss_err = float(np.sqrt(var_ss))

    # TI error: trapz is Σ w_k E_k with w from the trapezoid rule;
    # each E_k carries sem_k = std / sqrt(ESS) with the ESS of the
    # rung's scalar lnl series (naive n would ignore autocorrelation)
    w = np.zeros(K)
    w[0] = db[0] / 2.0
    w[-1] = db[-1] / 2.0
    w[1:-1] = (db[:-1] + db[1:]) / 2.0
    sem = np.empty(K)
    for k in range(K):
        ess = float(effective_sample_size(post[k][:, :, None]).min())
        sem[k] = flat[k].std() / np.sqrt(max(ess, 1.0))
    lnz_ti_err = float(np.sqrt(np.sum((w * sem) ** 2)))

    return {
        "lnz_ss": lnz_ss,
        "lnz_ss_err": lnz_ss_err,
        "lnz_ti": lnz_ti,
        "lnz_ti_err": lnz_ti_err,
        "betas": betas,
        "mean_lnl": e,
        "nrungs": K,
        "samples_per_rung": flat.shape[1],
    }
