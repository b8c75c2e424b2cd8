"""NUTS fit driver and checkpoint/mesh-route plumbing (mixin).

Extracted from ``models/model.py`` (VERDICT r3 #7): gradient-engine
selection, the three mesh routes (XLA-sharded jit, per-device native
replicas, source-sharded streaming value+grad), the bit-identical
fixed-length checkpoint protocol, and the min-ess block loop. The host
class provides ``cfg``/``log``/``layout``/``ctx``/``mesh``,
``_make_scalar_lnprob``, ``_initial_positions``,
``_resolve_use_pallas`` and ``_log_convergence``.

NUTS itself is a new capability vs the reference (its likelihood is
not differentiable); the sampler lives in ``samplers/nuts.py`` and the
sharded twins in ``parallel/sharding.py``.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from lumfuncmcmc_tpu.samplers.diagnostics import (
    effective_sample_size, gelman_rubin)


class _NutsDriverMixin:
    """NUTS fit driver: engine/route selection + checkpointing."""

    def _nuts_gradient_post(self, scalar, nchains=None):
        """Select the NUTS posterior callable: the fused Pallas
        value+grad kernel where measured to win, else the XLA scalar.

        The fused kernel only wins where the per-element gradient work
        is transcendental-heavy — the free-completeness model (Fleming
        + decay per cell): 1.9x raw value_and_grad, 1.7-1.8x NUTS
        end-to-end on v5e at default chain counts. The fixed/z/hier
        gradients are one cheap exp per element, which XLA's fused
        forward+backward already saturates (ties at 201-grids, 1.2-1.3x
        losses at 32-grids), so those keep XLA autodiff. exact_bounds
        likewise stays on the XLA scalar (the kernel has no
        exact-bounds path; short-circuiting before _resolve_use_pallas
        also avoids its explicit-use_pallas + exact_bounds error, which
        is an ensemble-path contract).

        ``nchains``: per-run chain count for the batch-aware exception
        (the NUTS twin of _resolve_use_pallas's forward rule): at large
        per-device chain batches on a SMALL grid, XLA's fused
        forward+backward becomes throughput-bound and wins — measured
        on gauss-32 (5,120 cells): Pallas 1.2x ahead at 64 chains, XLA
        1.5x ahead at 128, 1.6x at 256. Big grids stay Pallas at every
        measured batch (trapz-101/51k cells: 1.5x ahead at 128 AND 256
        chains), so the exception gates on both batch and grid size.
        """
        free_single = (self.model_kind == "single"
                       and not self.cfg.fix_comp
                       and not self.cfg.exact_bounds)
        if not (free_single and self._resolve_use_pallas()):
            return scalar
        if nchains is not None and self.cfg.use_pallas is None:
            ndev = (self.mesh.devices.size if self.mesh is not None
                    else 1)
            per_dev = max(1, int(nchains) // int(ndev))
            ncells = int(np.prod(self.ctx.logL_grid.shape))
            if per_dev >= 96 and ncells <= 16384:
                self.log.info(
                    "NUTS gradient path: XLA autodiff (%d chains/device"
                    " on a %d-cell grid is the measured XLA-wins "
                    "regime)" % (per_dev, ncells))
                return scalar
        from lumfuncmcmc_tpu.ops.pallas_lnlike import (
            make_pallas_lnprob_and_grad)
        pal = make_pallas_lnprob_and_grad(
            self.ctx, self.layout, interpret=self.cfg.pallas_interpret,
            model=self.model_kind)
        if pal is None:
            return scalar
        self.log.info("NUTS gradient path: fused Pallas value+grad "
                      "kernel")
        return pal

    def _nuts_stream_mesh_route(self):
        """True when NUTS should take the source-sharded streaming
        value+grad route (``run_nuts_stream_sharded``): a mesh with a
        real source axis, the free-completeness single-epoch model past
        the resident-VMEM gate (the catalog no longer fits per device,
        so replicating it for per-device NUTS replicas wastes the source
        axis), the native tier resolved on, and grids small enough to
        stay resident (``make_stream_shard_vg``'s own gate — mirrored
        here so the route is decided before any data packing)."""
        from lumfuncmcmc_tpu.ops import pallas_lnlike as pk
        from lumfuncmcmc_tpu.parallel.mesh import AXIS_SOURCES
        cfg = self.cfg
        if (self.mesh is None or self.mesh.shape[AXIS_SOURCES] <= 1
                or self.model_kind != "single" or cfg.fix_comp
                or cfg.exact_bounds
                or not pk.free_comp_over_vmem(self.ctx)
                or not self._resolve_use_pallas()):
            return False
        ncells = int(np.prod(np.asarray(self.ctx.logL_grid).shape))
        return ncells * 5 * 4 <= pk._VMEM_ARRAY_LIMIT

    def _nuts_min_ess_blocks(self, first, to_theta, k_run, min_ess,
                             max_blocks, continue_fn, gather=None,
                             done_blocks=1, save_cb=None):
        """Shared min-ess block loop for every NUTS route.

        ``first``: the ``(samples_y, lnps_y, alphas, div_frac, state)``
        of the accumulated history — one fresh block, or (on a
        checkpoint resume) several already-concatenated blocks with
        ``done_blocks`` counting them, so the fold_in continuation key
        stream replays to where it left off. ``div_frac`` may be a
        scalar or the flat array of per-block[, per-device] fractions.
        ``continue_fn(k_blk, state) -> (s, lp, al, df, state)`` runs
        one frozen-adaptation continuation block on the same route.
        ``gather`` converts device arrays to host (the collective
        ``to_host`` on the sharded routes; identity on the jit
        routes). ``save_cb(samples_y, lnps_y, alphas, df_flat, state,
        nblocks)`` persists a checkpoint after every continuation.
        Returns ``(samples_y, lnps_y, alphas, div_frac)`` with blocks
        concatenated on the sample axis.
        """
        samples_y, lnps_y, alphas, div_frac, nstate = first
        gather = gather or (lambda x: x)
        # homogenize every block to HOST arrays as it arrives (gather
        # is the collective to_host on sharded routes): resumed npz
        # blocks and live global-mesh blocks would otherwise mix in
        # jnp.concatenate, which multi-process arrays cannot do
        blocks = [jnp.asarray(gather(samples_y))]
        lnp_blocks = [jnp.asarray(gather(lnps_y))]
        al_blocks = [jnp.asarray(gather(alphas))]
        df_parts = [np.atleast_1d(np.asarray(gather(div_frac)))]
        # a fresh fold_in stream: splitting k_run again would collide
        # with run_nuts's internal 3-way split (split children are
        # counter-stable across widths)
        kk = jax.random.fold_in(k_run, 0x636f6e74)
        for _ in range(int(done_blocks) - 1):   # checkpoint replay
            kk, _unused = jax.random.split(kk)
        for nblk in range(int(done_blocks), int(max_blocks) + 1):
            host = jnp.asarray(gather(jnp.concatenate(blocks)))
            ess_now = float(effective_sample_size(np.asarray(
                jax.vmap(jax.vmap(to_theta))(host))).min())
            self.log.info(
                "NUTS block %d: %d samples, min ESS=%.0f (target %.0f)"
                % (nblk, int(host.shape[0]), ess_now, float(min_ess)))
            if ess_now >= float(min_ess) or nblk >= int(max_blocks):
                break
            kk, k_blk = jax.random.split(kk)
            if jax.process_count() > 1:
                k_blk = np.asarray(k_blk)
            s2, lp2, al2, df2, nstate = continue_fn(k_blk, nstate)
            jax.block_until_ready(lp2)
            blocks.append(jnp.asarray(gather(s2)))
            lnp_blocks.append(jnp.asarray(gather(lp2)))
            al_blocks.append(jnp.asarray(gather(al2)))
            df_parts.append(np.atleast_1d(np.asarray(gather(df2))))
            if save_cb is not None:
                save_cb(jnp.concatenate(blocks),
                        jnp.concatenate(lnp_blocks),
                        jnp.concatenate(al_blocks),
                        np.concatenate(df_parts), nstate, nblk + 1)
        # equal-length blocks: the flat mean over (block[, device])
        # entries is the exact transition-weighted fraction
        return (jnp.concatenate(blocks), jnp.concatenate(lnp_blocks),
                jnp.concatenate(al_blocks),
                float(np.mean(np.concatenate(df_parts))))

    @staticmethod
    def _nuts_ckpt_consistency(done_local: int):
        """COLLECTIVE (multi-process only): verify every process sees
        the same checkpoint progress — process 0 is the only writer,
        so divergent views mean the npz is not on shared storage and
        the first collective after a resume would wedge."""
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils
        dones = np.asarray(multihost_utils.process_allgather(
            jnp.asarray([int(done_local)]))).ravel()
        if not np.all(dones == dones[0]):
            raise RuntimeError(
                "NUTS checkpoint resume in a multi-process run "
                "requires the npz on a SHARED filesystem: processes "
                f"see {dones.tolist()} completed blocks — copy the "
                "checkpoint to every host (or use shared storage)")

    def _nuts_ckpt_load(self, ck, fp, resume, desc):
        """Load a min-ess NUTS block checkpoint (any route) or None.

        Returns ``(samples_y, lnps_y, alphas, df, state, done_blocks)``
        — arrays as host-backed jnp (the shard_map continuation
        functions reshard inputs to their in_specs, so the same npz
        resumes the jit, per-device-replica, and stream routes).
        ``desc`` names the fingerprint fields in the mismatch error.
        Multi-process: every process calls this (the consistency
        check is a collective) and loads from shared storage.
        """
        have = bool(ck and resume and os.path.exists(ck))
        if ck and resume:
            self._nuts_ckpt_consistency(
                int(np.load(ck)["nblocks"]) if have else 0)
        if not have:
            return None
        saved = np.load(ck)
        if not np.array_equal(np.asarray(saved["fingerprint"]), fp):
            raise ValueError(
                "nuts-min-ess checkpoint config mismatch: saved "
                f"{desc} = {tuple(saved['fingerprint'])}, current = "
                f"{tuple(fp)} — delete the checkpoint or restore the "
                "original settings")
        return (jnp.asarray(saved["samples_y"]),
                jnp.asarray(saved["lnps_y"]),
                jnp.asarray(saved["alphas"]),
                np.asarray(saved["df"]),
                (jnp.asarray(saved["y_run"]),
                 jnp.asarray(saved["eps"]),
                 jnp.asarray(saved["scale"])),
                int(saved["nblocks"]))

    def _nuts_fp(self, y0, num_warmup, *, every=None, route="jit"):
        """THE one construction site for NUTS checkpoint fingerprints.

        Returns ``(fp, desc)`` — the float64 fingerprint array and the
        field-name string for mismatch errors. Every route (jit
        min-ess, mesh min-ess, fixed-length blockwise) builds its
        fingerprint here: the layouts used to be typed per call site,
        and adding RNG_PROTOCOL/target_accept meant extending three
        lists in lockstep — the next knob added to one but not the
        others would silently split the protocol. Field order is the
        historical per-site order (``every`` slots between nsteps and
        ndim on the fixed-length route) so checkpoints written before
        this refactor still resume. ``mesh_sources`` is appended for
        the stream route — the per-leapfrog psum's reduction order
        makes the source-axis size part of the arithmetic, so a
        resume under a different size must fail loudly.
        """
        from lumfuncmcmc_tpu.samplers.nuts import RNG_PROTOCOL
        cfg = self.cfg
        fields = [("nchains", y0.shape[0]),
                  ("num_warmup", int(num_warmup)),
                  ("block_steps" if every is None else "nsteps",
                   int(cfg.nsteps))]
        if every is not None:
            fields.append(("checkpoint_every", int(every)))
        fields += [("ndim", y0.shape[1]), ("seed", cfg.seed),
                   ("rng_protocol", RNG_PROTOCOL),
                   ("target_accept",
                    float(cfg.nuts_target_accept))]
        if route == "stream_mesh":
            from lumfuncmcmc_tpu.parallel.mesh import AXIS_SOURCES
            fields.append(
                ("mesh_sources", self.mesh.shape[AXIS_SOURCES]))
        fp = np.asarray([v for _, v in fields], dtype=np.float64)
        desc = "(" + ", ".join(n for n, _ in fields) + ")"
        return fp, desc

    def _reshard_nuts_state(self, state):
        """Put a RESUMED (host) jit-route NUTS state back onto the
        global mesh. The continuation must be partitioned exactly like
        the uninterrupted run's: host inputs would compile a local
        program whose different reduction order shifts lnp at float
        level, and NUTS accept decisions are discrete — one flip and
        the resumed chain silently diverges from the bit-identity
        guarantee (caught by the 2-process resume test)."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec
        from lumfuncmcmc_tpu.parallel.mesh import AXIS_WALKERS
        y = jax.device_put(
            state[0], NamedSharding(self.mesh,
                                    PartitionSpec(AXIS_WALKERS)))
        return (y, state[1], state[2])

    def _nuts_mesh_ckpt(self, checkpoint_path, min_ess, resume, y0,
                        num_warmup, route):
        """Checkpoint plumbing for the shard_map NUTS routes: returns
        ``(ck, fp, resumed)``. The fingerprints are ELASTIC — the
        sampling-phase keys fold by the GLOBAL chain index and the
        saved ``(y_run, eps, scale)`` state is per chain, so a
        checkpoint written under mesh (4, 2) resumes bit-identically
        under (2, 4) or (8, 1) and the mesh shape is NOT pinned. The
        one exception: the stream route pins the SOURCE axis size —
        its per-leapfrog psum's reduction order is part of the
        arithmetic, so refactoring the source axis would shift lnp at
        float level and flip accept decisions.
        """
        ck = checkpoint_path if min_ess else None
        if ck and not ck.endswith(".npz"):
            ck += ".npz"
        fp, desc = self._nuts_fp(y0, num_warmup, route=route)
        resumed = self._nuts_ckpt_load(ck, fp, resume, desc)
        return ck, fp, resumed

    def _nuts_mesh_engine(self, route, lnp_y, to_theta, y0, k_run,
                          num_warmup, pooled, min_ess, max_blocks,
                          checkpoint_path, resume, fixed_ck):
        """ONE copy of the shard_map NUTS run/checkpoint/min-ess
        plumbing for both mesh routes — the route only selects the
        (first-run, continuation) pair; everything else (fixed-length
        dispatch, warmup-block save, resume unpack, min-ess block loop
        with per-block saves, host gather) is protocol, and protocol
        duplicated per route has already drifted once.

        Returns host-side ``(samples_y, lnps_y, alphas, eps,
        div_frac)`` — eps per device (replica route) / per walker row
        (stream route).
        """
        from lumfuncmcmc_tpu.parallel.distributed import to_host
        from lumfuncmcmc_tpu.parallel import sharding as sh
        cfg = self.cfg

        ta = float(cfg.nuts_target_accept)

        if route == "native_mesh":
            def first(return_state):
                return sh.run_nuts_sharded(
                    lnp_y, y0, k_run, self.mesh,
                    num_warmup=int(num_warmup),
                    num_samples=int(cfg.nsteps), pooled=bool(pooled),
                    target_accept=ta,
                    return_state=return_state)

            def cont(k, st):
                return sh.continue_nuts_sharded(
                    lnp_y, st, k, self.mesh,
                    num_samples=int(cfg.nsteps))
        else:
            def first(return_state):
                out = sh.run_nuts_stream_sharded(
                    self.ctx, self.layout, self.mesh, y0, k_run,
                    num_warmup=int(num_warmup),
                    num_samples=int(cfg.nsteps), pooled=bool(pooled),
                    interpret=cfg.pallas_interpret,
                    target_accept=ta,
                    return_state=return_state)
                assert out is not None  # _nuts_stream_mesh_route gate
                return out

            def cont(k, st):
                return sh.continue_nuts_stream_sharded(
                    self.ctx, self.layout, self.mesh, st, k,
                    num_samples=int(cfg.nsteps),
                    interpret=cfg.pallas_interpret)

        if fixed_ck:
            samples_y, lnps_y, alphas, eps, div_frac = \
                self._nuts_checkpointed(
                    lnp_y, y0, k_run, num_warmup,
                    int(cfg.checkpoint_every), checkpoint_path,
                    resume, route=route, pooled=pooled)
        else:
            ck, fp, resumed = self._nuts_mesh_ckpt(
                checkpoint_path, min_ess, resume, y0, num_warmup,
                route)
            if resumed is None:
                out = first(bool(min_ess))
                if min_ess:
                    (samples_y, lnps_y, alphas, eps, div_frac,
                     nstate) = out
                else:
                    samples_y, lnps_y, alphas, eps, div_frac = out
                jax.block_until_ready(lnps_y)
                done_blocks = 1
                if ck:
                    self._nuts_ckpt_save(
                        ck, fp, samples_y, lnps_y, alphas,
                        np.atleast_1d(np.asarray(to_host(div_frac))),
                        nstate, 1)
            else:
                (samples_y, lnps_y, alphas, div_frac, nstate,
                 done_blocks) = resumed
                eps = nstate[1]
                self.log.info(
                    "Resumed NUTS min-ess checkpoint (%s route): "
                    "%d blocks (%d samples) — warmup skipped"
                    % (route, done_blocks, int(samples_y.shape[0])))
            if min_ess:
                samples_y, lnps_y, alphas, div_frac = \
                    self._nuts_min_ess_blocks(
                        (samples_y, lnps_y, alphas, div_frac, nstate),
                        to_theta, k_run, min_ess, max_blocks, cont,
                        gather=to_host, done_blocks=done_blocks,
                        save_cb=((lambda s, lp, al, df, st, nb:
                                  self._nuts_ckpt_save(ck, fp, s, lp,
                                                       al, df, st,
                                                       nb))
                                 if ck else None))
            else:
                div_frac = float(np.mean(np.asarray(
                    to_host(div_frac))))
        samples_y = jnp.asarray(to_host(samples_y))
        alphas = to_host(alphas)
        eps = to_host(eps)   # pooled: rows equal; else per replica
        return samples_y, lnps_y, alphas, eps, div_frac

    def _nuts_ckpt_save(self, ck, fp, s, lp, al, df, st, nb):
        """Persist one NUTS block checkpoint. The ``to_host`` gathers
        are COLLECTIVE — every process must call this (true for every
        caller: the block loops run on all processes); only process 0
        writes. Single-process, ``to_host`` is a plain ``np.asarray``
        (sharded fully-addressable arrays gather locally)."""
        from lumfuncmcmc_tpu.parallel.distributed import (
            is_primary, to_host)
        arrs = [np.asarray(to_host(x)) for x in (s, lp, al)]
        st_h = [np.asarray(to_host(x)) for x in st]
        if not is_primary():
            return
        np.savez(ck, samples_y=arrs[0], lnps_y=arrs[1],
                 alphas=arrs[2],
                 df=np.asarray(df, dtype=np.float64),
                 y_run=st_h[0], eps=st_h[1], scale=st_h[2],
                 nblocks=nb, fingerprint=fp)

    def _nuts_checkpointed(self, lnp_y, y0, k_run, num_warmup, every,
                           checkpoint_path, resume, route="jit",
                           pooled=False):
        """Blockwise NUTS with mid-run npz checkpoints.

        The per-sample transition keys are the uninterrupted run's own
        (:func:`~lumfuncmcmc_tpu.samplers.nuts.sampling_keys` — split
        children are counter-stable across widths), so the checkpointed
        chain is BIT-IDENTICAL to the plain
        ``run_nuts(num_samples=cfg.nsteps)`` chain, and a resume from a
        truncated checkpoint reproduces it exactly (the stretch
        sampler's key-stream-replay guarantee, ported to NUTS). The npz
        stores the accumulated sample blocks plus the frozen
        post-warmup ``(y_run, eps, scale)`` state; the fingerprint pins
        every knob that changes the transition program.

        ``route``: "jit" (meshless/XLA-mesh), "native_mesh"
        (per-device replicas), or "stream_mesh" (source-sharded
        streaming vg). The mesh continuations slice PER-GLOBAL-CHAIN
        counter-stable key streams and the state is per chain, so a
        truncated checkpoint resumes bit-identically under a
        DIFFERENT mesh shape (elastic) — only the stream route pins
        the SOURCE axis size (its per-leapfrog psum's reduction order
        is part of the arithmetic). ``pooled`` only shapes the first
        block's warmup (the continuation state is frozen either way).
        """
        from lumfuncmcmc_tpu.samplers.nuts import (
            RNG_PROTOCOL, continue_nuts_keys, run_nuts, sampling_keys)
        cfg = self.cfg
        if not checkpoint_path.endswith(".npz"):
            # np.savez appends .npz to bare paths; the resume check
            # would then miss the file and silently restart from 0
            checkpoint_path += ".npz"
        nsteps = int(cfg.nsteps)
        nchains = y0.shape[0]
        nblocks = -(-nsteps // every)
        sizes = [every] * (nblocks - 1) + [nsteps
                                           - every * (nblocks - 1)]
        ta = float(cfg.nuts_target_accept)
        fp, fp_desc = self._nuts_fp(y0, num_warmup, every=every,
                                    route=route)
        if route == "jit":
            def first(n):
                return run_nuts(lnp_y, y0, k_run,
                                num_warmup=int(num_warmup),
                                num_samples=n, target_accept=ta,
                                return_state=True)

            def cont(st, a, b):
                ids = jnp.arange(nchains, dtype=jnp.uint32)
                return continue_nuts_keys(
                    lnp_y, st, sampling_keys(k_run, a, b, ids))
        else:
            from lumfuncmcmc_tpu.parallel import sharding as sh
            if route == "native_mesh":
                def first(n):
                    return sh.run_nuts_sharded(
                        lnp_y, y0, k_run, self.mesh,
                        num_warmup=int(num_warmup), num_samples=n,
                        pooled=bool(pooled), target_accept=ta,
                        return_state=True)

                def cont(st, a, b):
                    return sh.continue_nuts_keys_sharded(
                        lnp_y, st, k_run, self.mesh, a, b)
            elif route == "stream_mesh":
                def first(n):
                    return sh.run_nuts_stream_sharded(
                        self.ctx, self.layout, self.mesh, y0, k_run,
                        num_warmup=int(num_warmup), num_samples=n,
                        pooled=bool(pooled), target_accept=ta,
                        interpret=cfg.pallas_interpret,
                        return_state=True)

                def cont(st, a, b):
                    return sh.continue_nuts_keys_stream_sharded(
                        self.ctx, self.layout, self.mesh, st, k_run,
                        a, b, interpret=cfg.pallas_interpret)
            else:
                raise ValueError(f"unknown NUTS checkpoint route "
                                 f"{route!r}")
        blocks, lnp_blocks, al_blocks = [], [], []
        df = []                 # per-block divergence fractions
        done = 0
        nstate = None
        have = bool(resume and os.path.exists(checkpoint_path))
        if resume:
            self._nuts_ckpt_consistency(
                int(np.load(checkpoint_path)["nblocks"]) if have
                else 0)
        if have:
            saved = np.load(checkpoint_path)
            if (saved["fingerprint"].shape != fp.shape
                    or not np.array_equal(saved["fingerprint"], fp)):
                # a length mismatch means a checkpoint from an older
                # fingerprint layout (e.g. pre-protocol-v RNG streams)
                # — same-length mismatches are just changed settings,
                # so show the values instead of guessing at protocol
                if saved["fingerprint"].shape != fp.shape:
                    hint = ("the fingerprint LENGTH differs — a "
                            "pre-protocol-v%d npz (current fields "
                            "%s), whose key streams differ"
                            % (RNG_PROTOCOL, fp_desc))
                else:
                    hint = ("saved %s = %s, current = %s"
                            % (fp_desc,
                               tuple(saved["fingerprint"]),
                               tuple(fp)))
                raise ValueError(
                    "nuts-checkpoint fingerprint mismatch: %s; "
                    "delete %s or restore the original settings"
                    % (hint, checkpoint_path))
            done = int(saved["nblocks"])
            blocks = [jnp.asarray(saved["samples_y"])]
            lnp_blocks = [jnp.asarray(saved["lnps_y"])]
            al_blocks = [jnp.asarray(saved["alphas"])]
            df = [float(x) for x in saved["df"]]
            nstate = (jnp.asarray(saved["y_run"]),
                      jnp.asarray(saved["eps"]),
                      jnp.asarray(saved["scale"]))
            if route == "jit":
                # partition the continuation like the uninterrupted
                # run (host state would compile a local program whose
                # reduction order can flip an accept decision)
                nstate = self._reshard_nuts_state(nstate)
            self.log.info(
                "Resumed NUTS checkpoint: %d/%d blocks (%d samples)"
                % (done, nblocks, int(saved["samples_y"].shape[0])))

        from lumfuncmcmc_tpu.parallel.distributed import to_host

        def save():
            # collective gathers + primary-only write (shared saver);
            # blocks are already host arrays (gathered per block)
            self._nuts_ckpt_save(
                checkpoint_path, fp, jnp.concatenate(blocks),
                jnp.concatenate(lnp_blocks),
                jnp.concatenate(al_blocks),
                np.asarray(df, dtype=np.float64), nstate, done)

        if done == 0:
            (s, lp, al, _eps, dfrac, nstate) = first(sizes[0])
            jax.block_until_ready(lp)
            # gather each block to host as it arrives (collective):
            # resumed npz blocks and global-mesh blocks cannot mix in
            # a multi-process jnp.concatenate
            blocks = [jnp.asarray(to_host(s))]
            lnp_blocks = [jnp.asarray(to_host(lp))]
            al_blocks = [jnp.asarray(to_host(al))]
            # per-device fractions average exactly (equal chains and
            # transitions per device), keeping one npz schema per route
            df = [float(np.mean(np.asarray(to_host(dfrac))))]
            done = 1
            save()
        for i in range(done, nblocks):
            start_i = sum(sizes[:i])
            s, lp, al, dfrac, nstate = cont(nstate, start_i,
                                            start_i + sizes[i])
            jax.block_until_ready(lp)
            blocks.append(jnp.asarray(to_host(s)))
            lnp_blocks.append(jnp.asarray(to_host(lp)))
            al_blocks.append(jnp.asarray(to_host(al)))
            df.append(float(np.mean(np.asarray(to_host(dfrac)))))
            done = i + 1
            save()
        samples_y = (jnp.concatenate(blocks) if len(blocks) > 1
                     else blocks[0])
        lnps_y = (jnp.concatenate(lnp_blocks) if len(lnp_blocks) > 1
                  else lnp_blocks[0])
        alphas = (jnp.concatenate(al_blocks) if len(al_blocks) > 1
                  else al_blocks[0])
        # blocks are unequal only at the tail: weight by block size
        div_frac = float(np.dot(df, sizes[:len(df)]) / nsteps)
        return samples_y, lnps_y, alphas, nstate[1], div_frac

    def fit_model_nuts(self, key=None, num_warmup=None, nchains=8,
                       pooled=None, min_ess=None, max_blocks=50,
                       checkpoint_path=None, resume=False):
        """Gradient-based NUTS fit of the same posterior (new capability;
        the reference likelihood is not differentiable). Produces the
        same ``self.samples`` layout as :meth:`fit_model`.

        ``pooled``: cross-device step-size/mass adaptation pooling for
        the shard_map NUTS routes (``None`` = each route's default:
        per-device replicas for ``run_nuts_sharded``, pooled for the
        source-sharded stream route). The XLA-gradient mesh path is
        always globally pooled (jit auto-partitioning).

        ``min_ess``: convergence-controlled stopping — after the first
        ``cfg.nsteps`` block, keep extending the chain in
        ``cfg.nsteps``-sample blocks via :func:`continue_nuts` (frozen
        post-warmup step size/mass, no re-warmup) until every
        parameter reaches ``min_ess`` effective samples or
        ``max_blocks`` blocks ran. Supported on EVERY route: the jit
        routes (meshless and XLA-gradient mesh), the per-device-replica
        mesh route (``continue_nuts_sharded``), and the source-sharded
        stream route (``continue_nuts_stream_sharded``).

        ``checkpoint_path``/``resume``: mid-run npz checkpoints. For
        fixed-length runs (with ``cfg.checkpoint_every``) via
        :meth:`_nuts_checkpointed` — checkpointed and resumed chains
        are bit-identical to the uninterrupted run. Under ``min_ess``
        the checkpoint unit is the block: each continuation saves the
        accumulated chain plus the live ``(y_run, eps, scale)`` state,
        so a resume skips warmup and replays the continuation key
        stream to the identical chain — on EVERY route (jit,
        per-device-replica mesh, source-sharded stream). The mesh
        checkpoints are ELASTIC: the sampling keys fold by the GLOBAL
        chain index and the state is per chain, so a checkpoint
        written under mesh (4, 2) resumes bit-identically under
        (2, 4) or (8, 1) — only the stream route pins the SOURCE axis
        size (psum reduction order). Fixed-length checkpointing (the
        bit-identical key-slice protocol) also runs on every route:
        the mesh twins slice the same per-global-chain streams
        (``continue_nuts_keys_sharded`` /
        ``continue_nuts_keys_stream_sharded``). Multi-process runs
        checkpoint too: saves gather COLLECTIVELY (every process) with
        process 0 the only writer, and a resume verifies all
        processes see the same npz progress (shared-filesystem
        contract, as for the stretch checkpoints)."""
        from lumfuncmcmc_tpu.parallel.distributed import to_host
        from lumfuncmcmc_tpu.samplers.nuts import (
            make_unconstrained, run_nuts)
        cfg = self.cfg
        if not 0.0 < float(cfg.nuts_target_accept) < 1.0:
            # the CLI validates at parse time (_accept_frac); this
            # guards config-file/library callers — out-of-range
            # targets don't error downstream, they silently wreck
            # dual averaging (and would be fingerprinted into
            # checkpoints)
            raise ValueError(
                "nuts_target_accept must be strictly between 0 and 1 "
                "(acceptance-statistic target, Stan default 0.8), got "
                f"{cfg.nuts_target_accept}")
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        k_init, k_run = jax.random.split(key)
        num_warmup = num_warmup or max(200, cfg.nsteps // 4)
        if cfg.move != "stretch":
            self.log.warning(
                "--move %s is an ensemble-proposal option; it is "
                "ignored under --sampler nuts" % cfg.move)
        scalar = self._make_scalar_lnprob()
        pos = self._initial_positions(k_init)
        nchains = min(nchains, pos.shape[0])
        stream_mesh = self._nuts_stream_mesh_route()
        # the stream route builds its gradient surface inside shard_map
        # (psum of per-shard vg rows), so it skips the gradient-post
        # wrapper; lnp_y below still feeds the stuck-start guard on
        # EVERY route (on stream meshes that is one extra meshless jit
        # compile + nchains sequential full-catalog lnp evals on one
        # device — a deliberate startup-only cost: ~16 ms of evals at
        # 1e6 sources x 256 chains, and lax.map keeps the memory O(1)
        # in chains; see resample_bad_starts)
        post = (scalar if stream_mesh
                else self._nuts_gradient_post(scalar, nchains=nchains))
        lo, hi = self.layout.bounds_arrays()
        lnp_y, to_theta, to_y = make_unconstrained(post, lo, hi)

        # with a mesh AND the native gradient kernel, chains run as
        # per-device NUTS replicas under shard_map (XLA cannot
        # partition a pallas_call); the XLA-gradient mesh path keeps
        # jit auto-partitioning with globally-pooled adaptation
        native_mesh = (not stream_mesh and self.mesh is not None
                       and getattr(post, "engine", None) == "pallas")
        # fixed-length blockwise checkpointing (bit-identical to the
        # uninterrupted run) — every route, multi-process included
        # (saves gather collectively; process 0 writes)
        fixed_ck = bool(checkpoint_path and not min_ess
                        and 0 < int(cfg.checkpoint_every or 0)
                        < int(cfg.nsteps))
        if stream_mesh:
            from lumfuncmcmc_tpu.parallel.mesh import AXIS_WALKERS
            nshard = self.mesh.shape[AXIS_WALKERS]
            if nshard > pos.shape[0]:
                raise ValueError(
                    f"mesh walker axis has {nshard} devices but only "
                    f"{pos.shape[0]} walkers are available to seed NUTS "
                    "chains; raise nwalkers or shrink the mesh")
            if nchains % nshard:
                new = max(nshard, nchains - nchains % nshard)
                self.log.info("Rounding nchains %d -> %d (multiple of "
                              "the %d-device mesh walker axis)"
                              % (nchains, new, nshard))
                nchains = new
        elif native_mesh:
            ndev = int(self.mesh.devices.size)
            if ndev > pos.shape[0]:
                raise ValueError(
                    f"mesh has {ndev} devices but only {pos.shape[0]} "
                    "walkers are available to seed NUTS chains; raise "
                    "nwalkers or shrink the mesh")
            if nchains % ndev:
                new = max(ndev, nchains - nchains % ndev)
                self.log.info("Rounding nchains %d -> %d (multiple of "
                              "the %d-device mesh)"
                              % (nchains, new, ndev))
                nchains = new
        elif self.mesh is not None:
            # chains are embarrassingly parallel: shard them over the
            # mesh walker axis and let SPMD partitioning do the rest
            # (the source axis is unused by NUTS — its devices replicate)
            from lumfuncmcmc_tpu.parallel.mesh import AXIS_WALKERS
            nshard = self.mesh.shape[AXIS_WALKERS]
            if nshard > pos.shape[0]:
                raise ValueError(
                    f"mesh walker axis has {nshard} devices but only "
                    f"{pos.shape[0]} walkers are available to seed NUTS "
                    "chains; raise nwalkers or shrink the mesh")
            if nchains % nshard:
                new = max(nshard, nchains - nchains % nshard)
                self.log.info("Rounding nchains %d -> %d (multiple of "
                              "the %d-device mesh walker axis)"
                              % (nchains, new, nshard))
                nchains = new
        start = pos[:nchains]
        if not getattr(self, "_init_from_map", False):
            # shrink random inits toward the box center: NUTS needs a
            # finite gradient start, and extreme corners have ~-1e6
            # lnlike. Gated on the init that ACTUALLY ran, not on
            # cfg.init_map: the Laplace init falls back to uniform
            # draws when the mode Hessian is unusable, and those
            # still need the shrink (real Laplace starts sit at the
            # mode — the shrink would drag them off it)
            mid = (lo + hi) / 2.0
            start = 0.8 * mid[None, :] + 0.2 * start
        y0 = jax.vmap(to_y)(start)
        # replace catastrophically-bad starts (robust low outliers of
        # the start-lnp distribution): a chain started there diverges
        # on EVERY transition — it never moves AND its alpha ~ 0 drags
        # the pooled dual-averaging eps down for all chains (measured:
        # 9/256 stuck starts pinned eps 4x small = 3.5% recorded
        # divergences on the flagship bench config; with the guard,
        # div_frac 0 and ESS/s ~2.3x). Skipped when resuming from an
        # existing checkpoint: the resumed run carries the post-warmup
        # state and never consumes y0, so the screening pass (a jit
        # compile + nchains full-catalog lnp evals) would be pure
        # restart overhead.
        _ck = checkpoint_path
        if _ck and not _ck.endswith(".npz"):
            _ck += ".npz"
        # checkpoints are only honored on the fixed-length and min-ess
        # routes (a plain run ignores checkpoint_path), so only those
        # may skip — anything else still consumes y0
        if (resume and _ck and os.path.exists(_ck)
                and (fixed_ck or min_ess)):
            self.log.info("NUTS start guard skipped: resuming from %s"
                          % _ck)
        else:
            from lumfuncmcmc_tpu.samplers.nuts import (
                resample_bad_starts)
            y0, good = jax.jit(
                lambda y, k: resample_bad_starts(lnp_y, y, k)
            )(y0, jax.random.fold_in(k_init, 0x73746172))
            n_bad = int(np.sum(~np.asarray(good)))
            if n_bad:
                self.log.info(
                    "Resampled %d/%d NUTS starts (robust low outliers "
                    "of the start-lnp distribution — stuck-chain "
                    "guard)" % (n_bad, y0.shape[0]))
        if stream_mesh:
            from lumfuncmcmc_tpu.parallel.mesh import (
                AXIS_SOURCES, AXIS_WALKERS)
            self.log.info(
                "NUTS: source-sharded streaming value+grad — catalog "
                "split over %d '%s' devices (psum per leapfrog), chains "
                "over %d '%s' devices, pooled step-size adaptation"
                % (self.mesh.shape[AXIS_SOURCES], AXIS_SOURCES,
                   self.mesh.shape[AXIS_WALKERS], AXIS_WALKERS))
        elif native_mesh:
            self.log.info("NUTS: per-device replicas over the %d-device"
                          " mesh, native Pallas value+grad per device"
                          % self.mesh.devices.size)
        elif self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from lumfuncmcmc_tpu.parallel.mesh import AXIS_WALKERS
            y0 = jax.device_put(
                y0, NamedSharding(self.mesh, PartitionSpec(AXIS_WALKERS)))
            self.log.info("NUTS chains sharded over mesh axis "
                          "'%s' (%d devices)"
                          % (AXIS_WALKERS, self.mesh.shape[AXIS_WALKERS]))

        self.log.info("Fitting with NUTS (%d chains, %d warmup, %d "
                      "samples)" % (nchains, num_warmup, cfg.nsteps))
        t0 = time.time()
        if stream_mesh or native_mesh:
            if jax.process_count() > 1:
                y0 = np.asarray(y0)
                k_run = np.asarray(k_run)
            route = "stream_mesh" if stream_mesh else "native_mesh"
            eff_pooled = ((True if pooled is None else bool(pooled))
                          if stream_mesh else bool(pooled))
            samples_y, lnps_y, alphas, eps, div_frac = \
                self._nuts_mesh_engine(
                    route, lnp_y, to_theta, y0, k_run, num_warmup,
                    eff_pooled, min_ess, max_blocks, checkpoint_path,
                    resume, fixed_ck)
        elif fixed_ck:
            samples_y, lnps_y, alphas, eps, div_frac = \
                self._nuts_checkpointed(
                    lnp_y, y0, k_run, num_warmup,
                    int(cfg.checkpoint_every), checkpoint_path, resume)
        else:
            # under min_ess the checkpoint unit is the BLOCK (one
            # cfg.nsteps continuation), saved with the live
            # (y_run, eps, scale) state so a resume skips warmup
            ck = checkpoint_path if min_ess else None
            if ck and not ck.endswith(".npz"):
                ck += ".npz"
            fp, fp_desc = self._nuts_fp(y0, num_warmup)
            resumed = self._nuts_ckpt_load(ck, fp, resume, fp_desc)

            def _save(path, s, lp, al, df, st, nb):
                self._nuts_ckpt_save(path, fp, s, lp, al, df, st, nb)

            if resumed is None:
                # AOT-compile so "Total time taken" is pure sampling:
                # the one-time jit (~20 s) otherwise lands inside the
                # timer and dwarfs the run for short chains (a
                # compile-included A/B once mismeasured the engine
                # margin as a tie)
                compiled = run_nuts.lower(
                    lnp_y, y0, k_run, num_warmup=int(num_warmup),
                    num_samples=int(cfg.nsteps),
                    target_accept=float(cfg.nuts_target_accept),
                    return_state=True).compile()
                self.log.info("NUTS jit compile: %.1f s"
                              % (time.time() - t0))
                t0 = time.time()
                (samples_y, lnps_y, alphas, eps, div_frac,
                 nstate) = compiled(y0, k_run)
                jax.block_until_ready(lnps_y)
                done_blocks = 1
                if ck:
                    _save(ck, samples_y, lnps_y, alphas,
                          np.atleast_1d(np.asarray(
                              to_host(div_frac), dtype=np.float64)),
                          nstate, 1)
            else:
                (samples_y, lnps_y, alphas, div_frac, nstate,
                 done_blocks) = resumed
                # partition the continuations like the uninterrupted
                # run's (see _reshard_nuts_state)
                nstate = self._reshard_nuts_state(nstate)
                eps = nstate[1]
                t0 = time.time()
                self.log.info(
                    "Resumed NUTS min-ess checkpoint: %d blocks (%d "
                    "samples) — warmup skipped"
                    % (done_blocks, int(samples_y.shape[0])))
            if min_ess:
                from lumfuncmcmc_tpu.samplers.nuts import continue_nuts
                samples_y, lnps_y, alphas, div_frac = \
                    self._nuts_min_ess_blocks(
                        (samples_y, lnps_y, alphas, div_frac, nstate),
                        to_theta, k_run, min_ess, max_blocks,
                        lambda k, st: continue_nuts(
                            lnp_y, st, k, num_samples=int(cfg.nsteps)),
                        done_blocks=done_blocks,
                        # collective gather: under a multi-process
                        # mesh the concatenated blocks are global
                        # arrays the host-side ESS check cannot read
                        gather=(to_host if jax.process_count() > 1
                                else None),
                        save_cb=((lambda s, lp, al, df, st, nb:
                                  _save(ck, s, lp, al, df, st, nb))
                                 if ck else None))
        elapsed = time.time() - t0
        if jax.process_count() > 1:
            # the XLA-mesh jit route leaves outputs sharded over the
            # GLOBAL mesh; gather (collective — every process is here)
            # so the host-side theta/lnp conversions below can read
            samples_y = jnp.asarray(to_host(samples_y))
            alphas = np.asarray(to_host(alphas))
            eps = np.asarray(to_host(eps))
            div_frac = float(np.mean(np.asarray(to_host(div_frac))))
        chain_dev = jax.vmap(jax.vmap(to_theta))(samples_y)
        chain = np.asarray(chain_dev)
        # record the THETA-space lnprob (the y-space density includes the
        # logit-transform Jacobian, which would contaminate lnprobcut
        # selection and the fitposterior "Ln Prob" column)
        lnps = np.asarray(jax.vmap(jax.vmap(scalar))(chain_dev))
        eps_arr = np.atleast_1d(np.asarray(eps, dtype=np.float64))
        self.log.info("Total time taken: %0.2f s; step size %s; mean "
                      "accept-stat %.2f; divergent transitions %.2f%%"
                      % (elapsed,
                         ("%.4g" % eps_arr[0] if eps_arr.size == 1 else
                          "%.4g..%.4g (per replica)"
                          % (eps_arr.min(), eps_arr.max())),
                         float(np.mean(alphas)),
                         100.0 * float(div_frac)))
        if float(div_frac) > 0.01:
            self.log.warning(
                "%.1f%% of NUTS transitions diverged — the posterior "
                "may be biased near high-curvature regions; consider "
                "raising --nuts-target-accept (smaller adapted steps) "
                "or more warmup" % (100.0 * float(div_frac)))
        ess = effective_sample_size(chain)
        rhat = gelman_rubin(chain)
        self._log_convergence(chain)
        self.log.info("min ESS: %.0f; max R-hat: %.4f; ESS/sec: %.0f"
                      % (ess.min(), rhat.max(), ess.min() / elapsed))
        self.chain = chain
        # NUTS warmup is discarded inside run_nuts: no further burn-in
        full = np.concatenate([chain, lnps[:, :, None]], axis=2)
        self.samples = full.reshape(-1, chain.shape[2] + 1)
        self.log.info("Shape of self.samples")
        self.log.info(str(self.samples.shape))
        return self.samples
