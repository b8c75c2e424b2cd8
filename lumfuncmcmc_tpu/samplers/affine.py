"""Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch move).

Replaces ``emcee.EnsembleSampler`` (invoked serially at
``lumfuncmcmc.py:489-491``) with a pure-JAX implementation:

- all walkers advance in parallel (the reference evaluated 100 walkers x
  1000 steps of lnprob one call at a time in Python);
- the two half-ensembles update in the standard red-black scheme — the
  second half moves against the *already-updated* first half, matching
  emcee's ``RedBlueMove`` semantics so acceptance statistics and mixing
  match;
- stretch variable z ~ g(z) ∝ 1/sqrt(z) on [1/a, a] via inverse-CDF
  z = ((a-1) u + 1)^2 / a, acceptance ln r < (ndim-1) ln z + dlnp
  (Goodman–Weare; identical to emcee's ``StretchMove``);
- the whole run is one ``lax.scan`` → a single XLA program, no host
  round-trips; chains come back as (nsteps, nwalkers, ndim).

The batch lnprob callable is injected, so the same driver runs single
-device vmap or multi-device shard_map (see ``parallel.sharding``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as _np


class EnsembleState(NamedTuple):
    pos: jnp.ndarray      # (nwalkers, ndim)
    lnp: jnp.ndarray      # (nwalkers,)


def _half_step(rand, move_pos, move_lnp, other_pos, lnprob_batch, a, ndim):
    """Move one half-ensemble against the (fixed) other half.

    ``rand = (u_z, j, ln_u)``: pre-generated per-walker stretch draw,
    partner index, and log acceptance uniform. All randomness for a run
    is generated in three bulk threefry calls *before* the scan — a dozen
    tiny per-step RNG kernels would otherwise dominate the step latency
    on TPU (measured: trivial-lnprob step went 571 us -> ~half with bulk
    RNG).
    """
    u_z, j, ln_u = rand
    z = ((a - 1.0) * u_z + 1.0) ** 2 / a
    partner = other_pos[j]                       # (nmove, ndim)
    prop = partner + z[:, None] * (move_pos - partner)
    lnp_prop = lnprob_batch(prop)
    ln_ratio = (ndim - 1.0) * jnp.log(z) + lnp_prop - move_lnp
    accept = ln_u < ln_ratio
    new_pos = jnp.where(accept[:, None], prop, move_pos)
    new_lnp = jnp.where(accept, lnp_prop, move_lnp)
    return new_pos, new_lnp, accept


def _de_half_step(rand, move_pos, move_lnp, other_pos, lnprob_batch):
    """Differential-evolution move for one half-ensemble (emcee DEMove
    analogue): proposal x' = x + g * (x_a - x_b) with a, b two distinct
    walkers of the fixed half. Symmetric proposal -> plain Metropolis
    accept. ``rand = (g, j1, j2, ln_u)`` pre-generated: g carries the
    jittered gamma_0 = 2.38/sqrt(2 ndim) (emcee's DEMove default) plus
    10% "gamma = 1" draws — full-strength mode-hopping jumps per ter
    Braak's DE-MC recommendation (NOT part of emcee's DEMove; expect
    slightly different acceptance statistics than an emcee
    composition)."""
    g, j1, j2, ln_u = rand
    diff = other_pos[j1] - other_pos[j2]          # distinct by draw
    prop = move_pos + g[:, None] * diff
    lnp_prop = lnprob_batch(prop)
    accept = ln_u < lnp_prop - move_lnp
    new_pos = jnp.where(accept[:, None], prop, move_pos)
    new_lnp = jnp.where(accept, lnp_prop, move_lnp)
    return new_pos, new_lnp, accept


def _step_de_pre(rands, state: EnsembleState, lnprob_batch: Callable):
    """One full DE step from pre-generated randoms; red-black scheme as
    in :func:`_step_pre` (second half moves against the updated first).
    ``rands = (g, j1, j2, ln_u)`` each of shape (2, nh)."""
    pos, lnp = state
    nh = pos.shape[0] // 2
    g, j1, j2, ln_u = rands
    p0, l0 = pos[:nh], lnp[:nh]
    p1, l1 = pos[nh:], lnp[nh:]
    p0, l0, a0 = _de_half_step((g[0], j1[0], j2[0], ln_u[0]), p0, l0,
                               p1, lnprob_batch)
    p1, l1, a1 = _de_half_step((g[1], j1[1], j2[1], ln_u[1]), p1, l1,
                               p0, lnprob_batch)
    return (EnsembleState(jnp.concatenate([p0, p1]),
                          jnp.concatenate([l0, l1])),
            jnp.concatenate([a0, a1]))


def _de_rands(key, nsteps, nh, ndim, dtype):
    """Bulk randoms for DE steps: jittered/jumping gamma, two distinct
    partner indices, log accept uniforms — shapes (nsteps, 2, nh)."""
    k_g, k_jump, k_j1, k_j2, k_a = jax.random.split(key, 5)
    g0 = 2.38 / jnp.sqrt(2.0 * ndim)
    g = g0 * (1.0 + 1e-5 * jax.random.normal(k_g, (nsteps, 2, nh),
                                             dtype=dtype))
    jump = jax.random.uniform(k_jump, (nsteps, 2, nh), dtype=dtype) < 0.1
    g = jnp.where(jump, jnp.asarray(1.0, dtype), g)
    j1 = jax.random.randint(k_j1, (nsteps, 2, nh), 0, nh)
    j2 = jax.random.randint(k_j2, (nsteps, 2, nh), 0, nh - 1)
    j2 = j2 + (j2 >= j1)                     # distinct partners
    ln_u = jnp.log(jax.random.uniform(k_a, (nsteps, 2, nh), dtype=dtype))
    return g, j1, j2, ln_u


def _step_pre(rands, state: EnsembleState, lnprob_batch: Callable,
              a: float):
    """One full stretch-move step from pre-generated randoms.

    ``rands = (u_z, j, ln_u)`` each of shape (2, nh): index 0 moves the
    first half against the second, index 1 the second against the
    *updated* first (emcee red-black semantics).
    """
    pos, lnp = state
    nwalkers, ndim = pos.shape
    nh = nwalkers // 2
    u_z, j, ln_u = rands

    p0, l0 = pos[:nh], lnp[:nh]
    p1, l1 = pos[nh:], lnp[nh:]
    p0, l0, a0 = _half_step((u_z[0], j[0], ln_u[0]), p0, l0, p1,
                            lnprob_batch, a, ndim)
    p1, l1, a1 = _half_step((u_z[1], j[1], ln_u[1]), p1, l1, p0,
                            lnprob_batch, a, ndim)

    new = EnsembleState(jnp.concatenate([p0, p1]),
                        jnp.concatenate([l0, l1]))
    return new, jnp.concatenate([a0, a1])


def step(key, state: EnsembleState, lnprob_batch: Callable, a: float = 2.0):
    """One full stretch-move step (both halves) from a PRNG key."""
    pos, _ = state
    nh = pos.shape[0] // 2
    k_z, k_j, k_a = jax.random.split(key, 3)
    u_z = jax.random.uniform(k_z, (2, nh), dtype=pos.dtype)
    j = jax.random.randint(k_j, (2, nh), 0, nh)
    ln_u = jnp.log(jax.random.uniform(k_a, (2, nh), dtype=pos.dtype))
    return _step_pre((u_z, j, ln_u), state, lnprob_batch, a)


def de_schedule(nsteps: int, de_prob: float, offset: int = 0):
    """Deterministic Bresenham DE-step selector for global steps
    ``[offset, offset + nsteps)`` — blocked (checkpointed) runs pass
    consecutive slices so the realized DE fraction matches the
    unblocked schedule instead of restarting (and quantizing, or for
    ``de_prob < 1/block`` silently zeroing) per block."""
    t = _np.arange(offset, offset + nsteps, dtype=_np.float64)
    return _np.floor((t + 1) * de_prob) - _np.floor(t * de_prob) >= 1.0


@partial(jax.jit, static_argnames=("lnprob_batch", "nsteps", "a", "thin",
                                   "move", "de_prob"))
def run_stretch(lnprob_batch: Callable, pos0, key, nsteps: int,
                a: float = 2.0, thin: int = 1, move: str = "stretch",
                de_prob: float = 0.5, de_sel=None):
    """Run the ensemble for ``nsteps`` full steps.

    Parameters
    ----------
    lnprob_batch : callable (m, ndim) -> (m,)
        Batched log-probability (vmap or shard_map of the scalar lnprob).
    pos0 : (nwalkers, ndim) initial positions.
    key : PRNG key (explicit — the reference had no seed control at all,
        SURVEY.md §4).
    nsteps : number of full ensemble steps. With ``thin > 1`` it must be
        a multiple of ``thin`` — a remainder would otherwise be silently
        dropped while callers normalize acceptance/timing by ``nsteps``.
    thin : record every ``thin``-th step.
    move : "stretch" (Goodman-Weare, reference semantics), "de"
        (differential evolution), or "mix" (deterministic per-step
        interleaving — stretch for local exploration, DE for
        correlated-direction jumps; the composition emcee users build
        from StretchMove + DEMove, with a fixed schedule instead of a
        random one so vmapped multi-ensemble runs execute only one
        move per step).
    de_prob : fraction of DE steps under move="mix" (Bresenham
        schedule). The 0.5 default is the emcee-style equal-weight
        composition; on the flagship posterior the optimum sits near
        0.7 (within ~15% of 0.5 — docs/PERFORMANCE.md sweep).

    Returns
    -------
    state : final EnsembleState
    chain : (nsteps//thin, nwalkers, ndim)
    lnp   : (nsteps//thin, nwalkers)
    acc_count : (nwalkers,) accepted moves per walker
    """
    nwalkers = pos0.shape[0]
    if nwalkers % 2:
        raise ValueError("nwalkers must be even for the red-black scheme")
    if move in ("de", "mix") and nwalkers < 4:
        # nh = 1 leaves no pair of distinct DE partners: the randint
        # range is empty and the proposal degenerates to x' = x
        raise ValueError(
            "the DE proposal needs nwalkers >= 4 (two distinct "
            "partners in the fixed half-ensemble)")
    if thin > 1 and nsteps % thin:
        raise ValueError(
            f"nsteps={nsteps} must be a multiple of thin={thin} "
            "(round it yourself so acceptance/timing normalization is "
            "explicit)")
    nh = nwalkers // 2
    ndim = pos0.shape[1]
    state = EnsembleState(pos0, lnprob_batch(pos0))

    # bulk-generate every random draw for the whole run: a few threefry
    # kernels total instead of ~12 tiny ones per step inside the scan
    def stretch_rands(k):
        k_z, k_j, k_a = jax.random.split(k, 3)
        u_z = jax.random.uniform(k_z, (nsteps, 2, nh), dtype=pos0.dtype)
        j = jax.random.randint(k_j, (nsteps, 2, nh), 0, nh)
        ln_u = jnp.log(jax.random.uniform(k_a, (nsteps, 2, nh),
                                          dtype=pos0.dtype))
        return u_z, j, ln_u

    if move == "stretch":
        rands = stretch_rands(key)

        def step_fn(st, r):
            return _step_pre(r, st, lnprob_batch, a)
    elif move == "de":
        rands = _de_rands(key, nsteps, nh, ndim, pos0.dtype)

        def step_fn(st, r):
            return _step_de_pre(r, st, lnprob_batch)
    elif move == "mix":
        k_s, k_d = jax.random.split(key)
        # DETERMINISTIC Bresenham schedule of DE steps (a fixed
        # composition of invariant kernels is valid MCMC): the selector
        # is a host constant (or an UNBATCHED traced input), so under
        # vmap (run_stretch_ensembles) the per-step lax.cond predicate
        # stays unbatched and only ONE branch executes — a random
        # per-ensemble selector would batch the predicate, lower cond
        # to select, and silently evaluate BOTH moves' lnprob every
        # step. Blocked runs pass de_sel (a slice of the GLOBAL
        # schedule from :func:`de_schedule`) as a traced input so
        # block boundaries don't restart the schedule — and so
        # different slices don't force per-block recompiles.
        if de_sel is None:
            sel = jnp.asarray(de_schedule(nsteps, de_prob))
        else:
            sel = jnp.asarray(de_sel)
        rands = (sel, stretch_rands(k_s),
                 _de_rands(k_d, nsteps, nh, ndim, pos0.dtype))

        def step_fn(st, r):
            sel_t, sr, dr = r
            return jax.lax.cond(
                sel_t,
                lambda s: _step_de_pre(dr, s, lnprob_batch),
                lambda s: _step_pre(sr, s, lnprob_batch, a),
                st)
    else:
        raise ValueError(f"unknown move {move!r} (stretch|de|mix)")

    def scan_body(carry, r):
        st, acc = carry
        st, accepted = step_fn(st, r)
        acc = acc + accepted
        return (st, acc), (st.pos, st.lnp)

    acc0 = jnp.zeros(nwalkers, dtype=pos0.dtype)
    if thin == 1:
        (state, acc), (chain, lnps) = jax.lax.scan(
            scan_body, (state, acc0), rands)
    else:
        def outer_body(carry, rands_block):
            (st, acc), _ = jax.lax.scan(scan_body, carry, rands_block)
            return (st, acc), (st.pos, st.lnp)
        nblocks = nsteps // thin
        reshape = lambda x: x.reshape((nblocks, thin) + x.shape[1:])
        (state, acc), (chain, lnps) = jax.lax.scan(
            outer_body, (state, acc0),
            jax.tree_util.tree_map(reshape, rands))
    return state, chain, lnps, acc


def run_stretch_ensembles(lnprob_batch: Callable, pos0, key, nsteps: int,
                          a: float = 2.0, thin: int = 1,
                          move: str = "stretch", de_prob: float = 0.5,
                          de_sel=None):
    """Run C independent ensembles in parallel (vmapped).

    ``pos0``: (C, nwalkers, ndim). Independent replicated chains saturate
    a chip when a single ensemble's batch is small, and give a true
    multi-chain Gelman-Rubin diagnostic. Returns the same tuple as
    :func:`run_stretch` with a leading C axis on every output.

    ``lnprob_batch`` must be vmap-compatible (the standard vmap-of-scalar
    construction is; the shard_map variant is not — use one ensemble per
    mesh instead).
    """
    keys = jax.random.split(key, pos0.shape[0])

    def one(p, k):
        # de_sel closes over: an unbatched tracer under vmap, so the
        # mix-schedule cond predicate stays scalar
        return run_stretch(lnprob_batch, p, k, nsteps, a, thin, move,
                           de_prob, de_sel)

    return jax.vmap(one)(pos0, keys)
