"""Ensemble-sampler fit drivers (mixin for ``_BaseModel``).

The stretch/DE/mix ensemble orchestration extracted from
``models/model.py`` (VERDICT r3 #7): the reference's ``fit_model``
semantics (``lumfuncmcmc.py:479-513``) plus the chain
checkpoint/resume protocol, convergence-controlled stopping
(``fit_model_until``), and replicated independent ensembles. The host
class provides ``cfg``/``log``/``layout``/``mesh``,
``lnprob_batch``/``_meshless_batch``/``_resolve_use_pallas``,
``_initial_positions`` and ``_log_convergence``.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from lumfuncmcmc_tpu.samplers.affine import de_schedule, run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import (
    burnin_steps, effective_sample_size, gelman_rubin)


# checkpoint-fingerprint ids for the chain-affecting proposal knob
_MOVE_IDS = {"stretch": 0, "de": 1, "mix": 2}


class _EnsembleDriverMixin:
    """Stretch-ensemble fit drivers + chain checkpoint protocol."""

    def _run_checkpointed(self, runner, pos0, k_run, nsteps_exec, thin,
                          every, checkpoint_path, resume, label,
                          fingerprint_extra=(), step_axis=0):
        """Block loop + checkpoint/resume protocol shared by
        :meth:`fit_model` (``step_axis=0``) and
        :meth:`fit_model_ensembles` (``step_axis=1``, fingerprint
        extended with ``nensembles``).

        ``runner(pos, key, nblk, sel) -> (state, chain, lnp, acc)``
        runs one block; ``sel`` is the global mix-schedule slice. The
        resume path replays the per-block key stream, verifies the
        config fingerprint, and — in multi-process runs — checks
        COLLECTIVELY that every process sees the same checkpoint state
        (process 0 is the only writer; divergent views on a non-shared
        filesystem would wedge the first collective).

        Returns ``(chains, lnps, acc, acc_steps)`` as host arrays
        concatenated on ``step_axis``; ``acc_steps`` covers legacy
        checkpoints whose accept counts span only the resumed tail.
        """
        from lumfuncmcmc_tpu.parallel.distributed import (
            is_primary, to_host)
        cfg = self.cfg
        if checkpoint_path and not checkpoint_path.endswith(".npz"):
            # np.savez appends .npz to bare paths; the resume check
            # would then miss the file and silently restart from 0
            checkpoint_path += ".npz"
        if every % thin:
            every = max(thin, every - (every % thin))
            self.log.warning(
                "checkpoint_every rounded down to %d (a multiple of "
                "thin=%d)" % (every, thin))
        # nsteps is deliberately NOT fingerprinted: extending a
        # finished run is safe (the key-stream replay depends only on
        # these). move/de_prob ARE chain-affecting knobs — resuming a
        # stretch checkpoint with --move mix would splice segments
        # from different proposals.
        move_id = _MOVE_IDS.get(cfg.move, -1)
        dp = int(round(1e4 * cfg.de_prob))
        want = np.asarray([cfg.nwalkers, thin, every, cfg.seed,
                           move_id, dp, *fingerprint_extra])
        fields = ("nwalkers, thin, every, seed, move, de_prob*1e4"
                  + (", nensembles" if fingerprint_extra else ""))
        parts_c, parts_l, acc = [], [], 0.0
        pos = pos0
        remaining, kk = nsteps_exec, k_run
        acc_steps = nsteps_exec
        have_ck = bool(resume and checkpoint_path
                       and os.path.exists(checkpoint_path))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            done_local = 0
            if have_ck:
                done_local = int(np.load(checkpoint_path)
                                 ["chain"].shape[step_axis]) * thin
            dones = np.asarray(multihost_utils.process_allgather(
                jnp.asarray([done_local]))).ravel()
            if not np.all(dones == dones[0]):
                raise RuntimeError(
                    "checkpoint resume in a multi-process run "
                    "requires the checkpoint on a SHARED filesystem:"
                    f" processes see resume steps {dones.tolist()} "
                    "— copy the checkpoint to every host (or place "
                    "it on shared storage) and rerun")
        if have_ck:
            ck = np.load(checkpoint_path)
            if "fingerprint" in ck:
                saved = np.asarray(ck["fingerprint"])
                if not fingerprint_extra:
                    if saved.shape[0] == 4:
                        # pre-move checkpoint: proposal knobs weren't
                        # recorded, can't be verified — trust them
                        saved = np.concatenate([saved, [move_id, dp]])
                    elif saved.shape[0] == 5:
                        # move recorded but not de_prob — trust it
                        saved = np.concatenate([saved, [dp]])
                if not np.array_equal(saved, want):
                    raise ValueError(
                        f"{label} config mismatch: saved ({fields}) = "
                        f"{tuple(saved)}, current = {tuple(want)} "
                        f"(move ids {_MOVE_IDS}) — resuming with "
                        "changed settings would corrupt the chain and "
                        "the RNG replay")
            done = ck["chain"].shape[step_axis] * thin  # thinned rows
            parts_c = [ck["chain"]]
            parts_l = [ck["lnprobability"]]
            if "acc" in ck:
                acc = ck["acc"]
            else:
                # legacy checkpoint without per-walker counts: the
                # fraction can only cover the resumed tail
                acc_steps = max(nsteps_exec - done, 1)
            # HOST numpy: a process-local device array would be
            # rejected by the global-mesh computation on resume
            pos = np.asarray(ck["chain"][-1] if step_axis == 0
                             else ck["chain"][:, -1])
            remaining = nsteps_exec - done
            # replay the key stream so the continued run matches
            for _ in range(-(-done // every)):
                kk, _ = jax.random.split(kk)
            self.log.info("Resumed from checkpoint at step %d" % done)
        while remaining > 0:
            kk, k_blk = jax.random.split(kk)
            nblk = min(every, remaining)
            if jax.process_count() > 1:
                k_blk = np.asarray(k_blk)
            # mix: slice the GLOBAL Bresenham schedule so block
            # boundaries don't restart it (de_schedule docstring)
            sel = (de_schedule(nblk, cfg.de_prob,
                               offset=nsteps_exec - remaining)
                   if cfg.move == "mix" else None)
            state, ch, lp, ac = runner(pos, k_blk, nblk, sel)
            pos = state.pos
            parts_c.append(to_host(ch))
            parts_l.append(to_host(lp))
            acc = acc + to_host(ac)
            remaining -= nblk
            if checkpoint_path and is_primary():
                # one writer; all processes hold the same data
                np.savez(checkpoint_path,
                         chain=np.concatenate(parts_c, axis=step_axis),
                         lnprobability=np.concatenate(parts_l,
                                                      axis=step_axis),
                         acc=np.asarray(acc), fingerprint=want)
        return (np.concatenate(parts_c, axis=step_axis),
                np.concatenate(parts_l, axis=step_axis),
                np.asarray(acc), acc_steps)

    def fit_model(self, key=None, checkpoint_path: Optional[str] = None,
                  resume: bool = False):
        """Run the ensemble sampler; mirrors the logging and burn-in
        handling of ``fit_model`` (``lumfuncmcmc.py:479-513``).

        With ``checkpoint_every`` set, the accumulated chain is written to
        ``checkpoint_path`` (npz) after each block, and ``resume=True``
        continues a previously-interrupted run from that file — the
        reference loses everything on a kill (SURVEY.md §5).
        """
        from lumfuncmcmc_tpu.parallel.distributed import (
            is_primary, to_host)
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        k_init, k_run = jax.random.split(key)
        lnprob = self.lnprob_batch()
        pos0 = self._initial_positions(k_init)
        ndim = pos0.shape[1]
        if self.mesh is not None:
            self.log.info("Device mesh: %s" % (dict(self.mesh.shape),))
        if jax.process_count() > 1:
            # multi-controller: hand jit HOST arrays (identical on every
            # process, so jax treats them as replicated global inputs);
            # a process-local committed device array would be rejected
            # by the global-mesh computation
            pos0 = np.asarray(pos0)
            k_run = np.asarray(k_run)

        self.log.info(
            "Fitting Schechter model to true luminosity function using the "
            "JAX affine-invariant ensemble sampler")
        start = time.time()

        every = cfg.checkpoint_every or 0
        thin = max(cfg.thin, 1)
        if thin > cfg.nsteps:
            raise ValueError(
                f"thin={thin} exceeds nsteps={cfg.nsteps}: no step would "
                "ever be recorded")
        nsteps_exec = cfg.nsteps - (cfg.nsteps % thin)
        if nsteps_exec != cfg.nsteps:
            self.log.warning(
                "nsteps=%d is not a multiple of thin=%d; running %d steps"
                % (cfg.nsteps, thin, nsteps_exec))
        acc_steps = nsteps_exec  # steps the acceptance counter covers
        if every and 0 < every < nsteps_exec:
            def runner(p, k, n, sel):
                return run_stretch(lnprob, p, k, n, thin=thin,
                                   move=cfg.move, de_prob=cfg.de_prob,
                                   de_sel=sel)
            chain, lnps, acc, acc_steps = self._run_checkpointed(
                runner, pos0, k_run, nsteps_exec, thin, every,
                checkpoint_path, resume, "checkpoint")
        else:
            state, chain, lnps, acc = run_stretch(lnprob, pos0, k_run,
                                                  nsteps_exec, thin=thin,
                                                  move=cfg.move,
                                                  de_prob=cfg.de_prob)
            chain, lnps, acc = (to_host(chain), to_host(lnps),
                                to_host(acc))
        jax.block_until_ready(jnp.zeros(()))
        elapsed = time.time() - start
        self.log.info("Total time taken: %0.2f s" % elapsed)
        self.log.info("Time taken per step per walker: %0.4f ms" %
                      (elapsed / nsteps_exec * 1000.0 / cfg.nwalkers))

        # with thinning, the recorded chain has nsteps//thin rows and tau
        # is measured in recorded-step units — the burn-in rule applies
        # to the recorded axis
        burn, tau = burnin_steps(chain, chain.shape[0])
        self.acceptance_fraction = float(np.mean(acc) / acc_steps)
        self.log.info("Mean acceptance fraction: %0.2f" %
                      self.acceptance_fraction)
        self.log.info("AutoCorrelation Steps: %i, Number of Burn-in "
                      "Steps: %i" % (round(tau), burn))
        ess = effective_sample_size(chain[burn:])
        rhat = gelman_rubin(chain[burn:])
        self._log_convergence(chain[burn:])
        self.log.info("min ESS: %.0f; max R-hat: %.4f; ESS/sec: %.0f"
                      % (ess.min(), rhat.max(), ess.min() / elapsed))

        # (nwalkers, nsteps, ndim+1) -> flat post-burn samples with LnProb
        # as the last column, like the reference (lumfuncmcmc.py:506-510)
        self.chain = chain            # (nsteps, W, D) step-major
        full = np.concatenate([chain, lnps[:, :, None]], axis=2)
        self.samples = full[burn:].reshape(-1, ndim + 1)
        self.log.info("Shape of self.samples")
        self.log.info(str(self.samples.shape))
        self.log.info("Median lnprob: %.5f; Max lnprob: %.5f"
                      % (np.median(lnps), np.max(lnps)))
        return self.samples

    def fit_model_until(self, min_ess: float, block_steps: int = None,
                        max_blocks: int = 50, key=None,
                        checkpoint_path: Optional[str] = None,
                        resume: bool = False):
        """Run until every parameter reaches ``min_ess`` effective
        samples (new capability — the reference runs a fixed step count
        with no convergence control).

        Repeats ``block_steps``-step blocks (default: cfg.nsteps),
        recomputing the post-burn-in min ESS after each; stops at the
        target or after ``max_blocks``. Produces the same ``samples``
        layout as :meth:`fit_model`.

        ``checkpoint_path``/``resume``: save the accumulated chain
        after every block and resume an interrupted run. The per-block
        key stream is replayed on resume (the :meth:`_run_checkpointed`
        protocol — the walker positions are the chain's last recorded
        row), so a resumed run reproduces the uninterrupted chain AND
        its block-by-block stopping decisions exactly. Single-process
        only (warned off otherwise).
        """
        from lumfuncmcmc_tpu.parallel.distributed import to_host
        cfg = self.cfg
        block_steps = int(block_steps or cfg.nsteps)
        if checkpoint_path and not checkpoint_path.endswith(".npz"):
            # np.savez appends .npz to bare paths; the resume check
            # would then miss the file and silently restart from 0
            checkpoint_path += ".npz"
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        k_init, kk = jax.random.split(key)
        lnprob = self.lnprob_batch()
        pos = self._initial_positions(k_init)
        ndim = pos.shape[1]
        if jax.process_count() > 1:
            pos = np.asarray(pos)
            if checkpoint_path:
                self.log.warning(
                    "min_ess checkpointing is single-process only; "
                    "running without checkpoints")
                checkpoint_path = None

        move_id = _MOVE_IDS.get(cfg.move, -1)
        want = np.asarray([cfg.nwalkers, block_steps, cfg.seed,
                           move_id, int(round(1e4 * cfg.de_prob))])
        chains, lnps_parts = [], []
        acc = 0.0
        start = time.time()
        ess_min, burn, tau = 0.0, 0, 0.0
        nblocks = 0
        if (resume and checkpoint_path
                and os.path.exists(checkpoint_path)):
            ck = np.load(checkpoint_path)
            if not np.array_equal(np.asarray(ck["fingerprint"]), want):
                raise ValueError(
                    "min-ess checkpoint config mismatch: saved "
                    "(nwalkers, block_steps, seed, move, de_prob*1e4) "
                    f"= {tuple(ck['fingerprint'])}, current = "
                    f"{tuple(want)} — resuming with changed settings "
                    "would corrupt the chain and the RNG replay")
            chains = [ck["chain"]]
            lnps_parts = [ck["lnprobability"]]
            acc = ck["acc"]
            pos = np.asarray(ck["chain"][-1])
            nblocks = ck["chain"].shape[0] // block_steps
            for _ in range(nblocks):
                kk, _ = jax.random.split(kk)
            chain = np.concatenate(chains)
            burn, tau = burnin_steps(chain, chain.shape[0])
            post = chain[burn:]
            if post.shape[0] >= 8:
                ess_min = float(effective_sample_size(post).min())
            self.log.info("Resumed min-ess checkpoint: %d blocks (%d "
                          "steps), min ESS=%.0f"
                          % (nblocks, chain.shape[0], ess_min))
        # `not chains` forces at least one block on a fresh run (a
        # min_ess <= 0 target would otherwise leave no chain at all)
        while not chains or (ess_min < min_ess and nblocks < max_blocks):
            nblocks += 1
            kk, k_blk = jax.random.split(kk)
            if jax.process_count() > 1:
                k_blk = np.asarray(k_blk)
            sel = (de_schedule(block_steps, self.cfg.de_prob,
                               offset=(nblocks - 1) * block_steps)
                   if self.cfg.move == "mix" else None)
            state, ch, lp, ac = run_stretch(lnprob, pos, k_blk,
                                            block_steps,
                                            move=self.cfg.move,
                                            de_prob=self.cfg.de_prob,
                                            de_sel=sel)
            pos = state.pos
            chains.append(to_host(ch))
            lnps_parts.append(to_host(lp))
            acc = acc + to_host(ac)
            chain = np.concatenate(chains)
            if checkpoint_path:
                np.savez(checkpoint_path, chain=chain,
                         lnprobability=np.concatenate(lnps_parts),
                         acc=np.asarray(acc), fingerprint=want)
            burn, tau = burnin_steps(chain, chain.shape[0])
            post = chain[burn:]
            if post.shape[0] >= 8:
                ess_min = float(effective_sample_size(post).min())
            self.log.info("Block %d: %d total steps, tau=%.1f, "
                          "min ESS=%.0f (target %.0f)"
                          % (nblocks, chain.shape[0], tau, ess_min,
                             min_ess))
        elapsed = time.time() - start
        total_steps = chain.shape[0]
        self.log.info("Total time taken: %0.2f s (%d steps, ESS/sec "
                      "%.0f)" % (elapsed, total_steps,
                                 ess_min / max(elapsed, 1e-9)))
        if chain.shape[0] - burn >= 4:
            self._log_convergence(chain[burn:])
        lnps = np.concatenate(lnps_parts)
        self.chain = chain
        full = np.concatenate([chain, lnps[:, :, None]], axis=2)
        self.samples = full[burn:].reshape(-1, ndim + 1)
        return self.samples

    def fit_model_ensembles(self, nensembles: int, key=None,
                            checkpoint_path: Optional[str] = None,
                            resume: bool = False, min_ess=None,
                            max_blocks: int = 50):
        """Run ``nensembles`` independent replicated ensembles in one
        vmapped program (``run_stretch_ensembles``) and report the TRUE
        multi-chain Gelman-Rubin across them (new capability — walkers
        within one ensemble interact, so single-ensemble split-R-hat
        understates disagreement between independent runs).

        Replicated chains also fill the chip when one ensemble's batch
        is small (docs/PERFORMANCE.md walker-scaling table). Produces
        the same ``samples`` layout as :meth:`fit_model`, pooling the
        post-burn samples of every ensemble. ``checkpoint_every`` /
        ``checkpoint_path`` / ``resume`` work as in :meth:`fit_model`
        (the chain npz carries a leading ensemble axis and the
        fingerprint additionally pins ``nensembles``).

        ``min_ess``: convergence-controlled stopping — run
        ``cfg.nsteps``-step blocks (mix-move DE schedule kept
        block-continuous via ``de_schedule(offset)``) until the pooled
        post-burn-in min ESS reaches the target or ``max_blocks``
        blocks ran. With ``checkpoint_path`` the accumulated chain is
        saved after every block and a resume replays the per-block key
        stream from the chain's last recorded positions (the
        :meth:`fit_model_until` protocol, fingerprint-guarded with
        ``nensembles``) — the resumed run reproduces the uninterrupted
        chain and its stopping decisions exactly. Single-process only.
        """
        from lumfuncmcmc_tpu.parallel.distributed import (
            is_primary, to_host)
        from lumfuncmcmc_tpu.samplers.affine import run_stretch_ensembles
        from lumfuncmcmc_tpu.samplers.diagnostics import (
            gelman_rubin_ensembles)
        cfg = self.cfg
        if nensembles < 2:
            raise ValueError("fit_model_ensembles needs >= 2 ensembles "
                             "(use fit_model for one)")
        if self.mesh is not None:
            # whole ensembles sharded over the mesh: each device runs
            # its own independent chains with the per-device engine —
            # zero hot-loop collectives
            ndev = int(self.mesh.devices.size)
            if nensembles % ndev:
                new = -(-nensembles // ndev) * ndev
                self.log.info(
                    "Rounding nensembles %d -> %d (multiple of the "
                    "%d-device mesh)" % (nensembles, new, ndev))
                nensembles = new
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        k_init, k_run = jax.random.split(key)
        pos0 = jnp.stack([
            self._initial_positions(k)
            for k in jax.random.split(k_init, nensembles)])
        ndim = pos0.shape[2]
        thin = max(cfg.thin, 1)
        nsteps_exec = cfg.nsteps - (cfg.nsteps % thin)
        self.log.info(
            "Fitting %d independent replicated ensembles x %d walkers%s"
            % (nensembles, cfg.nwalkers,
               "" if self.mesh is None
               else " (sharded over %d devices)" % self.mesh.devices.size))
        start = time.time()
        if self.mesh is not None:
            from lumfuncmcmc_tpu.parallel.sharding import (
                run_stretch_ensembles_sharded)
            # each device runs FULL nwalkers-sized ensemble batches —
            # resolve the engine for that batch size, not nwalkers/ndev
            lnprob = self._meshless_batch(
                self.cfg.replace(use_pallas=self._resolve_use_pallas(
                    per_dev_walkers=cfg.nwalkers)))
            if jax.process_count() > 1:
                pos0 = np.asarray(pos0)

            def runner(p, k, n, sel=None):
                if jax.process_count() > 1:
                    k = np.asarray(k)
                return run_stretch_ensembles_sharded(
                    lnprob, p, k, n, mesh=self.mesh, thin=thin,
                    move=cfg.move, de_prob=cfg.de_prob, de_sel=sel)
        else:
            lnprob = self.lnprob_batch()

            def runner(p, k, n, sel=None):
                return run_stretch_ensembles(lnprob, p, k, n,
                                             thin=thin, move=cfg.move,
                                             de_prob=cfg.de_prob,
                                             de_sel=sel)

        every = cfg.checkpoint_every or 0
        nsteps_run = nsteps_exec          # executed steps (acc norm)
        if min_ess:
            if checkpoint_path and jax.process_count() > 1:
                self.log.warning(
                    "min_ess ensembles checkpointing is "
                    "single-process only; running without checkpoints")
                checkpoint_path = None
            if checkpoint_path and not checkpoint_path.endswith(".npz"):
                # np.savez appends .npz; a bare path would silently
                # restart from 0 on resume
                checkpoint_path += ".npz"
            move_id = _MOVE_IDS.get(cfg.move, -1)
            want = np.asarray([cfg.nwalkers, thin, nsteps_exec,
                               cfg.seed, move_id,
                               int(round(1e4 * cfg.de_prob)),
                               nensembles])
            rows_per_block = nsteps_exec // thin
            ch_parts, lnp_parts = [], []
            acc = 0.0
            pos, kk = pos0, k_run
            done = 0

            def _pooled_ess():
                chains_now = np.concatenate(ch_parts, axis=1)
                pooled_now = np.moveaxis(chains_now, 0, 1).reshape(
                    chains_now.shape[1], -1, ndim)
                burn_now, _ = burnin_steps(pooled_now,
                                           pooled_now.shape[0])
                post = pooled_now[burn_now:]
                ess = (float(effective_sample_size(post).min())
                       if post.shape[0] >= 8 else 0.0)
                return ess, pooled_now.shape[0]

            if (resume and checkpoint_path
                    and os.path.exists(checkpoint_path)):
                ck = np.load(checkpoint_path)
                if not np.array_equal(np.asarray(ck["fingerprint"]),
                                      want):
                    raise ValueError(
                        "ensemble-min-ess checkpoint config mismatch:"
                        " saved (nwalkers, thin, block_steps, seed, "
                        "move, de_prob*1e4, nensembles) = "
                        f"{tuple(ck['fingerprint'])}, current = "
                        f"{tuple(want)} — resuming with changed "
                        "settings would corrupt the chain and the "
                        "RNG replay")
                ch_parts = [ck["chain"]]
                lnp_parts = [ck["lnprobability"]]
                acc = ck["acc"]
                pos = np.asarray(ck["chain"][:, -1])
                nblk = ck["chain"].shape[1] // rows_per_block
                done = nblk * nsteps_exec
                for _ in range(nblk):
                    kk, _ = jax.random.split(kk)
                ess_now, nrec = _pooled_ess()
                self.log.info(
                    "Resumed ensemble-min-ess checkpoint: %d blocks "
                    "(%d recorded steps), pooled min ESS=%.0f"
                    % (nblk, nrec, ess_now))
            else:
                nblk, ess_now = 0, 0.0
            while (not ch_parts
                   or (ess_now < float(min_ess)
                       and nblk < int(max_blocks))):
                nblk += 1
                kk, k_blk = jax.random.split(kk)
                sel = (de_schedule(nsteps_exec, cfg.de_prob,
                                   offset=done)
                       if cfg.move == "mix" else None)
                state, ch, lp, ac = runner(pos, k_blk, nsteps_exec,
                                           sel)
                pos = state.pos
                ch_parts.append(to_host(ch))
                lnp_parts.append(to_host(lp))
                acc = acc + to_host(ac)
                done += nsteps_exec
                if checkpoint_path:
                    np.savez(checkpoint_path,
                             chain=np.concatenate(ch_parts, axis=1),
                             lnprobability=np.concatenate(lnp_parts,
                                                          axis=1),
                             acc=np.asarray(acc), fingerprint=want)
                ess_now, nrec = _pooled_ess()
                self.log.info(
                    "Ensembles block %d: %d recorded steps, pooled "
                    "min ESS=%.0f (target %.0f)"
                    % (nblk, nrec, ess_now, float(min_ess)))
            chains = np.concatenate(ch_parts, axis=1)
            lnps = np.concatenate(lnp_parts, axis=1)
            nsteps_run = done
        elif every and 0 < every < nsteps_exec:
            chains, lnps, acc, _ = self._run_checkpointed(
                runner, pos0, k_run, nsteps_exec, thin, every,
                checkpoint_path, resume, "ensemble-checkpoint",
                fingerprint_extra=(nensembles,), step_axis=1)
        else:
            state, chains, lnps, acc = runner(pos0, k_run, nsteps_exec)
            chains = to_host(chains)      # (C, nsteps, W, D)
            lnps = to_host(lnps)
            acc = to_host(acc)
        jax.block_until_ready(jnp.zeros(()))
        elapsed = time.time() - start
        self.log.info("Total time taken: %0.2f s" % elapsed)

        # burn-in from the pooled walker view (the reference rule on the
        # recorded axis), applied uniformly to every ensemble
        pooled = np.moveaxis(chains, 0, 1).reshape(
            chains.shape[1], -1, ndim)              # (nsteps, C*W, D)
        burn, tau = burnin_steps(pooled, pooled.shape[0])
        self.acceptance_fraction = float(np.mean(np.asarray(acc))
                                         / nsteps_run)
        if chains.shape[1] - burn >= 2:
            rhat_ens = gelman_rubin_ensembles(chains[:, burn:])
        else:
            self.log.warning(
                "post-burn-in chain has <2 recorded steps — "
                "cross-ensemble R-hat undefined (run longer)")
            rhat_ens = np.full(ndim, np.nan)
        ess = effective_sample_size(pooled[burn:])
        self.log.info("Mean acceptance fraction: %0.2f" %
                      self.acceptance_fraction)
        self.log.info("AutoCorrelation Steps: %i, Number of Burn-in "
                      "Steps: %i" % (round(tau), burn))
        self.log.info("min ESS: %.0f; max cross-ensemble R-hat: %.4f "
                      "(%d ensembles); ESS/sec: %.0f"
                      % (ess.min(), rhat_ens.max(), nensembles,
                         ess.min() / elapsed))
        if chains.shape[1] - burn >= 4:
            from lumfuncmcmc_tpu.samplers.diagnostics import (
                rank_normalized_rhat_ensembles)
            self.log.info(
                "rank-normalized cross-ensemble R-hat (bulk/tail "
                "max): %.4f"
                % rank_normalized_rhat_ensembles(
                    chains[:, burn:]).max())
            self._log_convergence(pooled[burn:], rhat_line=False)
        self.rhat_ensembles = rhat_ens
        self.chain = pooled
        full = np.concatenate(
            [pooled, np.moveaxis(lnps, 0, 1).reshape(
                lnps.shape[1], -1)[:, :, None]], axis=2)
        self.samples = full[burn:].reshape(-1, ndim + 1)
        self.log.info("Shape of self.samples")
        self.log.info(str(self.samples.shape))
        return self.samples
