"""Gradient-based No-U-Turn sampling of the same likelihood.

A capability the reference cannot offer (its likelihood lives behind
scipy splines and fsolve — not differentiable): because every kernel in
this framework is a pure JAX function, ``jax.grad`` of the log-posterior
is exact, and Hamiltonian Monte Carlo explores the 3-9 dim posteriors
with far shorter autocorrelation times than the stretch move.

Design:

- Box priors are removed by a logit reparameterization
  (:func:`make_unconstrained`): theta = lo + (hi-lo) * sigmoid(y) with
  the log-Jacobian added, so the Hamiltonian flow never sees a hard
  boundary.
- :func:`run_nuts` runs C independent chains (vmapped) of multinomial
  NUTS: trajectories double until a U-turn (or max doublings), with
  progressive biased multinomial selection between the old trajectory
  and each new subtree (Betancourt 2017). U-turns are checked at EVERY
  dyadic sub-subtree boundary via the iterative checkpoint scheme (as in
  Stan/numpyro) — endpoint-only checking breaks detailed balance and
  measurably inflates posterior widths (caught by the cross-sampler
  agreement test).
- Step size is adapted during warmup by dual averaging to a target
  acceptance statistic; the mass matrix is identity (the logit transform
  already brings all coordinates to O(1) scale).

Everything (warmup + sampling) runs inside ``lax.scan`` — one XLA
program per phase.  Each transition is fully iterative (nested
``lax.while_loop``): integration stops at the U-turn instead of always
running 2^max_doublings leapfrogs, which is 2.5-3x on the flagship
posterior and cuts compile time ~5x (see :func:`_nuts_step`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Version of the run-affecting RNG derivation protocol: how
# per-transition keys are derived from the run key, AND any driver-side
# seed-derived start transformation. Bumped whenever run_nuts's
# internal key split, sampling_keys's per-chain fold/split, or the
# driver's start derivation changes. Checkpoint fingerprints embed it
# so an npz written under an older protocol is rejected LOUDLY instead
# of silently spliced with new-key continuations, which would void the
# documented "checkpointed == uninterrupted bit-for-bit" guarantee
# (ADVICE r4). v2 = per-global-chain fold_in streams (the counter-
# stable protocol); v3 = the stuck-start resample guard
# (resample_bad_starts in fit_model_nuts changes y0 for the same seed).
RNG_PROTOCOL = 3


def make_unconstrained(lnpost_theta: Callable, lo, hi):
    """Wrap a box-bounded log-density into an unconstrained one.

    Returns (lnpost_y, to_theta, to_y).
    """
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    span = hi - lo

    def to_theta(y):
        return lo + span * jax.nn.sigmoid(y)

    def to_y(theta):
        p = jnp.clip((theta - lo) / span, 1e-9, 1 - 1e-9)
        return jnp.log(p) - jnp.log1p(-p)

    def lnpost_y(y):
        theta = to_theta(y)
        # log|dtheta/dy| = sum log(span * sig * (1 - sig))
        log_jac = jnp.sum(jnp.log(span) + jax.nn.log_sigmoid(y)
                          + jax.nn.log_sigmoid(-y))
        return lnpost_theta(theta) + log_jac

    return lnpost_y, to_theta, to_y


def resample_bad_starts(lnpost_y, y0, key, gap: float = 1000.0,
                        k_mad: float = 10.0, jitter: float = 0.05):
    """Replace catastrophically-bad chain starts before warmup.

    A start far enough below the typical set cannot leapfrog out:
    every transition from it trips the sampler's divergence guard
    (the ``gap``-scale energy-error threshold in :func:`_nuts_step`),
    so the chain never moves, and its alpha ~ 0 contaminates the
    POOLED dual-averaging acceptance — one stuck chain shrinks the
    step size for every chain. Measured on the flagship bench config
    (256 chains, free-comp gauss-32): 9 stuck starts at lnp ~ -9.3e5
    (vs -1.75e4 typical) pinned eps 4x too small and put 3.5%
    divergences in the recorded chains; resampling them removes all
    of it (div_frac 0, ESS/s 2,148 -> ~5,000).

    Bad = non-finite, or a ROBUST low outlier of the start-lnp
    distribution: below ``median - k_mad * MAD`` AND more than
    ``gap`` below the best. The MAD term self-calibrates to the
    model's lnp scale (a Poisson likelihood legitimately spans ~1e6
    over the prior box — a fixed absolute gap would flag 242/256
    viable starts and destroy the overdispersion R-hat needs); the
    ``gap`` conjunct keeps tight distributions (MAD ~ 0) untouched.

    Bad rows are replaced by uniformly-chosen good rows plus a small
    Gaussian jitter in the unconstrained coordinates (distinct
    starts, same basin). If no start is good the input is returned
    unchanged. jit-safe and deterministic in ``key``; returns
    ``(y0', good_mask)``.
    """
    # lax.map, not vmap: one chain at a time, so an over-VMEM catalog
    # (the stream route's scalar lnpost) never materializes a
    # (C, nsources) intermediate for this one-off screening pass
    lnp0 = jax.lax.map(lnpost_y, y0)
    med = jnp.nanmedian(jnp.where(jnp.isfinite(lnp0), lnp0, jnp.nan))
    mad = jnp.nanmedian(jnp.where(jnp.isfinite(lnp0),
                                  jnp.abs(lnp0 - med), jnp.nan))
    outlier = (lnp0 < med - k_mad * mad) & (lnp0 < jnp.max(
        jnp.where(jnp.isfinite(lnp0), lnp0, -jnp.inf)) - gap)
    good = jnp.isfinite(lnp0) & ~outlier
    k_pick, k_jit = jax.random.split(key)
    nchains = y0.shape[0]
    p = good.astype(y0.dtype)
    # categorical over good rows only (log 0 = -inf excludes bad rows)
    idx = jax.random.categorical(k_pick, jnp.log(p), shape=(nchains,))
    donors = (y0[idx]
              + jitter * jax.random.normal(k_jit, y0.shape, y0.dtype))
    any_good = jnp.any(good)
    keep = good[:, None] | ~any_good
    return jnp.where(keep, y0, donors), good


class _Traj(NamedTuple):
    y_minus: jnp.ndarray
    p_minus: jnp.ndarray
    g_minus: jnp.ndarray     # cached gradient at y_minus (Stan-style:
    y_plus: jnp.ndarray      # each doubling resumes leapfrogging from
    p_plus: jnp.ndarray      # an endpoint whose gradient the previous
    g_plus: jnp.ndarray      # subtree already computed)
    y_prop: jnp.ndarray      # current multinomial proposal
    v_prop: jnp.ndarray      # lnpost at the proposal (recorded lnp)
    lw_prop: jnp.ndarray     # its log weight (lnpost - 0.5 p^2)
    lw_sum: jnp.ndarray      # logsumexp of trajectory weights
    turning: jnp.ndarray
    diverged: jnp.ndarray
    sum_alpha: jnp.ndarray   # acceptance-statistic accumulator
    n_alpha: jnp.ndarray


def _uturn(y_minus, y_plus, p_minus, p_plus):
    dy = y_plus - y_minus
    return (jnp.dot(dy, p_minus) < 0.0) | (jnp.dot(dy, p_plus) < 0.0)


def _subtree_turn(go_right, ck_y, y_n, ck_p, p_n):
    """Trajectory-ordered U-turn decision for one sub-subtree window.

    ``ck`` is the window's opening edge in *integration* order and
    ``(y_n, p_n)`` its closing edge.  Integration order equals trajectory
    order only when integrating rightward.  Leapfrog with -eps is the
    exact inverse map, so the momenta it produces stay in the forward
    (trajectory-time) convention — reversing integration direction flips
    dy but NOT the momenta, hence ``_uturn`` is not invariant under it
    and leftward windows must swap both the position and momentum pairs.
    (An unflipped leftward check flags healthy windows as "turning" and
    misses genuine leftward U-turns, truncating leftward growth and
    breaking the reversibility of the stopping rule.)
    """
    return jnp.where(go_right,
                     _uturn(ck_y, y_n, ck_p, p_n),
                     _uturn(y_n, ck_y, p_n, ck_p))


def _nuts_step(value_and_grad, max_doublings, eps, key, y0):
    """One NUTS transition, fully iterative (nested ``lax.while_loop``).

    The doubling loop and the per-subtree leapfrog loop are both
    ``while_loop``s, so the transition stops integrating the moment the
    trajectory U-turns or diverges.  An adapted step size typically
    turns after 2^4-2^6 leapfrogs, so an unrolled always-max_doublings
    program (the previous design) wastes 75-90% of its gradient
    evaluations on frozen trajectories — measured 2.5-3x slower on the
    flagship posterior.  Under the chain ``vmap`` each while_loop runs
    until every lane is done (finished lanes are masked), so the cost
    per transition is the max tree length over chains, not the max
    possible tree.  A further win: the compiled program contains ONE
    leapfrog body instead of max_doublings unrolled copies, which cuts
    the jit time of :func:`run_nuts` by ~5x.
    """
    ndim = y0.shape[0]
    md = max_doublings
    k_mom, k_dir = jax.random.split(key)
    p0 = jax.random.normal(k_mom, (ndim,), dtype=y0.dtype)
    v0, g0 = value_and_grad(y0)
    lw0 = v0 - 0.5 * jnp.dot(p0, p0)

    init = _Traj(y0, p0, g0, y0, p0, g0, y0, v0, lw0, lw0,
                 jnp.asarray(False), jnp.asarray(False),
                 jnp.zeros((), y0.dtype), jnp.zeros((), y0.dtype))

    scales = jnp.arange(1, md + 1, dtype=jnp.int32)
    sizes = jnp.left_shift(jnp.int32(1), scales)      # 2^1 .. 2^md
    neg_inf = jnp.full((), -jnp.inf, y0.dtype)

    def doubling_body(carry):
        traj, key, j = carry
        key, k_d, k_swap, k_b = jax.random.split(key, 4)
        go_right = jax.random.bernoulli(k_d)

        # integrate up to 2^j steps from the chosen end; the
        # endpoint's gradient is cached in the trajectory (computing
        # it here cost one full value_and_grad per doubling — ~15% of
        # gradient work at typical adapted tree depths)
        nsteps = jnp.left_shift(jnp.int32(1), j)
        y_start = jnp.where(go_right, traj.y_plus, traj.y_minus)
        p_start = jnp.where(go_right, traj.p_plus, traj.p_minus)
        g_start = jnp.where(go_right, traj.g_plus, traj.g_minus)
        eps_signed = jnp.where(go_right, eps, -eps)

        # subtree: integrate step by step, accumulating multinomial
        # weight; the loop exits early on an internal U-turn or a
        # divergence (the subtree is discarded whole either way — Stan
        # semantics — so nothing after the stopping step is needed).
        # Dyadic checkpoints give the full set of sub-subtree U-turn
        # checks: leaf i is stored as the LEFT edge of every scale-k
        # sub-subtree with i % 2^k == 0, and closing edges
        # ((i+1) % 2^k == 0) are checked against the stored state.  The
        # checkpoint slots live in a fixed (md, ndim) buffer with
        # scales > j masked out (j is dynamic inside a while_loop).
        ck0 = jnp.zeros((md,) + y_start.shape, y_start.dtype)

        def sub_cond(c):
            i, div, turning = c[0], c[9], c[10]
            return (i < nsteps) & ~div & ~turning

        def sub_body(c):
            (i, y, p, g, lw_sum, y_prop, v_prop, lw_prop, key, div,
             turning, ck_y, ck_p, s_alpha) = c
            p_half = p + 0.5 * eps_signed * g
            y_n = y + eps_signed * p_half
            v_n, g_n = value_and_grad(y_n)
            p_n = p_half + 0.5 * eps_signed * g_n
            lw = v_n - 0.5 * jnp.dot(p_n, p_n)
            div = div | ~jnp.isfinite(lw) | (lw0 - lw > 1000.0)
            lw = jnp.where(div, -jnp.inf, lw)
            key, k = jax.random.split(key)
            lw_sum_new = jnp.logaddexp(lw_sum, lw)
            take = (jnp.log(jax.random.uniform(k, dtype=y.dtype))
                    < lw - lw_sum_new)
            y_prop = jnp.where(take, y_n, y_prop)
            v_prop = jnp.where(take, v_n, v_prop)
            lw_prop = jnp.where(take, lw, lw_prop)
            s_alpha = s_alpha + jnp.minimum(1.0, jnp.exp(lw - lw0))

            # sub-subtree U-turn bookkeeping, vectorized over scales
            # 1..j (incl. the new subtree's own full span at scale j)
            valid = scales <= j
            opens = valid & ((i % sizes) == 0)
            ck_y = jnp.where(opens[:, None], y_n[None, :], ck_y)
            ck_p = jnp.where(opens[:, None], p_n[None, :], ck_p)
            closes = valid & (((i + 1) % sizes) == 0)
            turn_k = jax.vmap(
                _subtree_turn, in_axes=(None, 0, None, 0, None))(
                    go_right, ck_y, y_n, ck_p, p_n)
            turning = turning | jnp.any(closes & turn_k)

            return (i + 1, y_n, p_n, g_n, lw_sum_new, y_prop, v_prop,
                    lw_prop, key, div, turning, ck_y, ck_p, s_alpha)

        c0 = (jnp.int32(0), y_start, p_start, g_start, neg_inf,
              y_start, neg_inf, neg_inf, k_swap, traj.diverged,
              jnp.asarray(False), ck0, ck0, jnp.zeros((), y0.dtype))
        (n_done, y_end, p_end, g_end, lw_sub, y_sub, v_subprop,
         lw_subprop, _, diverged, turning_sub, _, _,
         s_alpha) = jax.lax.while_loop(sub_cond, sub_body, c0)

        # a subtree that diverged or U-turned internally is invalid: it
        # is NOT merged (no proposal, no weight, no endpoint extension)
        # and the trajectory stops growing (Stan semantics)
        bad_sub = diverged | turning_sub

        # progressive biased sampling between old trajectory and subtree
        accept_sub = (jnp.log(jax.random.uniform(k_b, dtype=y0.dtype))
                      < lw_sub - traj.lw_sum)
        y_prop = jnp.where(accept_sub & ~bad_sub, y_sub, traj.y_prop)
        v_prop = jnp.where(accept_sub & ~bad_sub, v_subprop,
                           traj.v_prop)
        lw_prop = jnp.where(accept_sub & ~bad_sub, lw_subprop,
                            traj.lw_prop)

        keep = lambda old, new_: jnp.where(bad_sub, old, new_)
        y_minus = keep(traj.y_minus,
                       jnp.where(go_right, traj.y_minus, y_end))
        p_minus = keep(traj.p_minus,
                       jnp.where(go_right, traj.p_minus, p_end))
        g_minus = keep(traj.g_minus,
                       jnp.where(go_right, traj.g_minus, g_end))
        y_plus = keep(traj.y_plus,
                      jnp.where(go_right, y_end, traj.y_plus))
        p_plus = keep(traj.p_plus,
                      jnp.where(go_right, p_end, traj.p_plus))
        g_plus = keep(traj.g_plus,
                      jnp.where(go_right, g_end, traj.g_plus))

        turning = (traj.turning | turning_sub
                   | _uturn(y_minus, y_plus, p_minus, p_plus))
        new = _Traj(
            y_minus, p_minus, g_minus, y_plus, p_plus, g_plus,
            y_prop, v_prop, lw_prop,
            jnp.logaddexp(traj.lw_sum, jnp.where(bad_sub, -jnp.inf,
                                                 lw_sub)),
            turning, traj.diverged | diverged,
            # acceptance statistic over leapfrogs actually computed
            # (early exit stops at the turning/divergent step, so the
            # count is n_done, not 2^j — matching Stan's estimator)
            traj.sum_alpha + s_alpha,
            traj.n_alpha + n_done.astype(y0.dtype))
        return (new, key, j + 1)

    def doubling_cond(carry):
        traj, _key, j = carry
        return (j < md) & ~traj.turning & ~traj.diverged

    traj, _, _ = jax.lax.while_loop(doubling_cond, doubling_body,
                                    (init, k_dir, jnp.int32(0)))
    accept_stat = traj.sum_alpha / jnp.maximum(traj.n_alpha, 1.0)
    # v_prop is lnpost at y_prop, already computed inside the
    # trajectory — callers record it instead of re-evaluating
    return traj.y_prop, traj.v_prop, accept_stat, traj.diverged


@partial(jax.jit, static_argnames=("lnpost_y", "num_warmup", "num_samples",
                                   "max_doublings", "target_accept",
                                   "adapt_mass", "pool_axes",
                                   "return_state"))
def run_nuts(lnpost_y: Callable, y0, key, num_warmup: int,
             num_samples: int, max_doublings: int = 8,
             target_accept: float = 0.8, init_step: float = 0.1,
             adapt_mass: bool = True, pool_axes=None,
             return_state: bool = False, sampling_key=None,
             chain_ids=None):
    """Run NUTS chains.

    ``y0``: (C, D) initial unconstrained positions — C chains vmapped.
    Returns (samples (num_samples, C, D), lnp (num_samples, C),
    accept_stat (num_samples, C), eps, div_frac — the fraction of
    sampling-phase transitions that hit a divergence).

    ``target_accept``: dual-averaging target for the pooled acceptance
    statistic (0.8, Stan's default). Divergences on the flagship
    posterior were traced to STUCK STARTS, not step size — apply
    :func:`resample_bad_starts` to ``y0`` first (the drivers do), after
    which the measured divergence fraction is 0 at every swept target
    and 0.8 is the throughput winner (3-seed sweep, 256 chains:
    5.2-5.8k ESS/s at 0.8 vs 3.7-3.9k at 0.95; 0.9 is seed-fragile on
    this posterior — eps 0.02-0.12). Raise it only when the driver
    reports genuine-geometry divergences.

    ``adapt_mass``: two-stage warmup — stage A adapts the step size with
    identity mass, a diagonal mass matrix is estimated from the stage-A
    states, and stage B re-adapts the step size in the rescaled
    coordinates (y' = y / scale; equivalent to diag-mass HMC but needs
    no kernel changes). Handles posteriors whose unconstrained scales
    differ by orders of magnitude.

    ``pool_axes``: optional tuple of mesh axis names (static). When run
    inside ``shard_map`` with chains split over those axes, the
    dual-averaging acceptance statistic and the diag-mass moments are
    ``pmean``-pooled across them, so every device adapts the SAME step
    size and mass from the global chain population (equal local block
    sizes make the pmean-of-means the exact global mean) — the sharded
    twin of the meshless pooled adaptation, vs. the independent
    per-device replicas of ``run_nuts_sharded(pooled=False)``.

    ``return_state``: append the post-sampling ``(y_run, eps, scale)``
    tuple to the return — feed it to :func:`continue_nuts` to extend
    the chain without re-warmup (convergence-controlled sampling).

    ``sampling_key``/``chain_ids``: the sampling-phase key streams are
    PER GLOBAL CHAIN — chain ``c`` consumes
    ``split(fold_in(k_s(sampling_key), chain_ids[c]), n)`` — so the
    recorded chain depends only on (sampling_key, global chain index),
    not on how chains are grouped per device. The sharded routes pass
    the GLOBAL run key as ``sampling_key`` with a device-folded ``key``
    for warmup (warmup transitions must differ across devices) and
    their block's global indices as ``chain_ids``; defaults
    (``sampling_key=key``, ``chain_ids=arange(C)``) reproduce the
    meshless convention.
    """
    nchains = y0.shape[0]
    step = jax.vmap(_nuts_step, in_axes=(None, None, None, 0, 0))
    gamma, t0c, kappa = 0.05, 10.0, 0.75

    def _pool(x):
        return jax.lax.pmean(x, pool_axes) if pool_axes else x

    def dual_averaging_phase(vg_fn, y_init, key_w, nsteps, eps0):
        mu = jnp.log(10.0 * eps0)

        def warm_body(carry, k):
            y, log_eps, log_eps_bar, h_bar, t = carry
            keys = jax.random.split(k, nchains)
            y_new, _, alpha, _ = step(vg_fn, max_doublings,
                                      jnp.exp(log_eps), keys, y)
            a = _pool(jnp.mean(alpha))
            t = t + 1.0
            h_bar = ((1 - 1 / (t + t0c)) * h_bar
                     + (target_accept - a) / (t + t0c))
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
            return (y_new, log_eps, log_eps_bar, h_bar, t), y_new

        keys = jax.random.split(key_w, nsteps)
        (y_end, _, log_eps_bar, _, _), trace = jax.lax.scan(
            warm_body, (y_init, jnp.log(eps0), jnp.log(eps0), 0.0, 0.0),
            keys)
        return y_end, jnp.exp(log_eps_bar), trace

    vg = jax.value_and_grad(lnpost_y)
    k_a, k_b, k_s = jax.random.split(key, 3)

    if adapt_mass and num_warmup >= 40:
        n_a = num_warmup // 2
        n_b = num_warmup - n_a
        y, eps_a, trace = dual_averaging_phase(vg, y0, k_a, n_a,
                                               init_step)
        # diag mass from the second half of stage A (all chains pooled)
        pool = trace[n_a // 2:].reshape(-1, y0.shape[1])
        if pool_axes:
            # two-moment form so the cross-device pool is one pmean of
            # local means (jnp.var's centered form would need the global
            # mean first — two collectives for no accuracy gain here)
            m1 = _pool(jnp.mean(pool, axis=0))
            m2 = _pool(jnp.mean(pool * pool, axis=0))
            var = m2 - m1 * m1
        else:
            var = jnp.var(pool, axis=0)
        scale = jnp.sqrt(jnp.maximum(var, 1e-10))

        def lnpost_scaled(yp):
            return lnpost_y(yp * scale)

        vg_s = jax.value_and_grad(lnpost_scaled)
        yp = y / scale
        y_run, eps, _ = dual_averaging_phase(vg_s, yp, k_b, n_b,
                                             init_step)
    else:
        y_run, eps, _ = dual_averaging_phase(vg, y0, k_a, num_warmup,
                                             init_step)
        scale = jnp.ones(y0.shape[1], y0.dtype)

    # --- sampling ---
    # the per-chain streams come from the (possibly global) sampling
    # key; k_s from the local 3-way split is unused in that case but
    # the split stays — warmup key derivation must not change with it
    del k_s
    y_run, (samples, lnps, alphas, divs) = _sample_phase(
        lnpost_y, scale, y_run, eps,
        key if sampling_key is None else sampling_key,
        num_samples, max_doublings,
        chain_ids=_default_ids(chain_ids, nchains))
    # divergent transitions truncate trajectories and bias the
    # posterior — surface the fraction instead of discarding it
    div_frac = jnp.mean(divs.astype(samples.dtype))
    if return_state:
        return (samples, lnps, alphas, eps, div_frac,
                (y_run, eps, scale))
    return samples, lnps, alphas, eps, div_frac


def _sample_phase_keys(lnpost_y, scale, y_run, eps, keys_s,
                       max_doublings):
    """The post-warmup sampling scan over EXPLICIT per-chain,
    per-sample keys (``keys_s``: one transition key per recorded
    sample PER CHAIN, shape ``(n, C)`` — :func:`sampling_keys`).
    ``y_run`` lives in the mass-rescaled coordinates
    (``y = y_run * scale``); ``scale`` is all ones when warmup skipped
    mass adaptation.

    ``eps``/``scale`` may be shared (scalar / ``(D,)``) or PER-CHAIN
    (``(C,)`` / ``(C, D)``): a resumed elastic checkpoint regroups
    chains across devices, so each chain must carry the step size and
    mass its own warmup adapted, whatever device it lands on."""
    nchains, ndim = y_run.shape
    dt = y_run.dtype
    eps_c = jnp.broadcast_to(jnp.asarray(eps, dt), (nchains,))
    scale_c = jnp.broadcast_to(jnp.asarray(scale, dt), (nchains, ndim))

    def one(y, k, ep, sc):
        vg = jax.value_and_grad(lambda yp: lnpost_y(yp * sc))
        # v_new IS lnpost_y(y_new * sc), cached from the trajectory —
        # recording it saves one full forward pass per transition
        # (a whole catalog slab sweep + psum on the stream route)
        y_new, v_new, alpha, div = _nuts_step(vg, max_doublings, ep,
                                              k, y)
        return y_new, y_new * sc, v_new, alpha, div

    step = jax.vmap(one)

    def samp_body(yc, ks):
        y_new, ys, lnp, alpha, div = step(yc, ks, eps_c, scale_c)
        return y_new, (ys, lnp, alpha, div)

    return jax.lax.scan(samp_body, y_run, keys_s)


def _sample_phase(lnpost_y, scale, y_run, eps, key_s, num_samples,
                  max_doublings, chain_ids=None):
    """The post-warmup sampling scan, shared by :func:`run_nuts` and
    :func:`continue_nuts` so a continuation runs the exact same
    transition program as the first block. ``key_s`` is the
    PRE-3-way-split sampling key (``sampling_keys`` applies the split
    itself)."""
    keys_s = sampling_keys(key_s, 0, num_samples,
                           _default_ids(chain_ids, y_run.shape[0]))
    return _sample_phase_keys(lnpost_y, scale, y_run, eps, keys_s,
                              max_doublings)


def _default_ids(chain_ids, nchains):
    if chain_ids is None:
        return jnp.arange(nchains, dtype=jnp.uint32)
    return jnp.asarray(chain_ids)


def sampling_keys(key, start: int, stop: int, chain_ids):
    """Per-chain transition keys for samples ``[start, stop)`` of the
    :func:`run_nuts` call keyed by ``key``: shape ``(stop-start, C)``.

    Chain ``c``'s stream is ``split(fold_in(k_s, chain_ids[c]), stop)``
    — a function of the run key and the chain's GLOBAL index ONLY,
    never of how the chain batch is grouped onto devices. Split
    children are counter-stable across widths (``split(k, n)[:m] ==
    split(k, m)``), so ``run_nuts(..., num_samples=m)`` runs precisely
    the first ``m`` transitions of the ``num_samples=n`` run, and a
    :func:`continue_nuts_keys` block driven by ``sampling_keys(key, m,
    n, ids)`` replays the remainder bit-for-bit. This is the engine of
    the NUTS checkpoint/resume protocol (checkpointed ==
    uninterrupted, exactly), and the per-GLOBAL-chain fold is what
    makes mesh-route checkpoints ELASTIC: a checkpoint written under
    one mesh shape resumes bit-identically under any other grouping of
    the same chains (the sharded routes derive each device's
    ``chain_ids`` from its block offset)."""
    _, _, k_s = jax.random.split(key, 3)

    def one(c):
        return jax.random.split(jax.random.fold_in(k_s, c), stop)[start:]

    return jnp.swapaxes(jax.vmap(one)(jnp.asarray(chain_ids)), 0, 1)


@partial(jax.jit, static_argnames=("lnpost_y", "max_doublings"))
def continue_nuts_keys(lnpost_y, state, keys, max_doublings: int = 8):
    """:func:`continue_nuts` with explicit per-chain, per-sample keys
    (``(n, C)`` from :func:`sampling_keys`) instead of a block key —
    the checkpoint protocol's continuation: block i replays the same
    transitions the uninterrupted run would have made.

    Returns ``(samples, lnps, alphas, div_frac, state')``.
    """
    y_run, eps, scale = state
    y_end, (samples, lnps, alphas, divs) = _sample_phase_keys(
        lnpost_y, scale, y_run, eps, keys, max_doublings)
    div_frac = jnp.mean(divs.astype(samples.dtype))
    return samples, lnps, alphas, div_frac, (y_end, eps, scale)


@partial(jax.jit, static_argnames=("lnpost_y", "num_samples",
                                   "max_doublings"))
def continue_nuts(lnpost_y, state, key, num_samples: int,
                  max_doublings: int = 8, chain_ids=None):
    """Extend a warmed-up NUTS run without re-warmup.

    ``state`` is the ``(y_run, eps, scale)`` tuple returned by
    ``run_nuts(..., return_state=True)`` (or by a previous
    ``continue_nuts`` call); ``eps``/``scale`` may be shared or
    per-chain (elastic resumes regroup chains whose warmups adapted on
    different devices). The adapted step size and mass are frozen —
    exactly the post-warmup sampling regime — so blocks compose into
    one valid chain. This is the engine of convergence-controlled NUTS
    (``fit_model_nuts(min_ess=...)``): sample in blocks until the
    pooled ESS target is reached instead of guessing ``nsteps``.

    ``chain_ids``: global chain indices for the per-chain key streams
    (default ``arange(C)``) — the sharded continuations pass their
    block's global indices so the same block key produces the same
    chains under ANY mesh grouping.

    Returns ``(samples, lnps, alphas, div_frac, state')``.
    """
    y_run, eps, scale = state
    y_end, (samples, lnps, alphas, divs) = _sample_phase(
        lnpost_y, scale, y_run, eps, key, num_samples, max_doublings,
        chain_ids=chain_ids)
    div_frac = jnp.mean(divs.astype(samples.dtype))
    return samples, lnps, alphas, div_frac, (y_end, eps, scale)
