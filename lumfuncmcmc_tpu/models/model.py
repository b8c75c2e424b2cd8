"""High-level model orchestration: the user-facing fit driver.

``LumFuncModel`` / ``LumFuncModelZ`` carry the public surface of the
reference classes ``LumFuncMCMC`` (``lumfuncmcmc.py:72-667``) and
``LumFuncMCMCz`` (``lumfuncmcmc_z.py:118-609``) — ``fit_model``,
``VeffLF``, ``set_median_fit``, ``get_param_names``,
``add_fitinfo_to_table``, ``triangle_plot``, and the ``samples`` /
``medianLF`` / ``Lavg`` / ``lfbinorig`` / ``var`` attributes — but are
functionally pure inside: parameters travel as packed theta vectors, the
sampler is the JAX stretch-move ensemble, and all per-source loops are
vectorized device code.

New capabilities vs the reference: explicit seed control, mid-run chain
checkpointing (the reference loses everything on a kill,
SURVEY.md §5), device-mesh sharding, and a NUTS option.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ, make_lnprob_z
from lumfuncmcmc_tpu.models.veff import (
    veff_weights, binned_lf_bootstrap, log_bin_edges)
from lumfuncmcmc_tpu.ops.completeness import fleming_root_logf_np
from lumfuncmcmc_tpu.ops.schechter import true_lum_func, schechter_z
from lumfuncmcmc_tpu.samplers.affine import de_schedule, run_stretch
from lumfuncmcmc_tpu.samplers.diagnostics import (
    burnin_steps, effective_sample_size, gelman_rubin,
    rank_normalized_rhat)
from lumfuncmcmc_tpu.utils.logging import setup_logging


# checkpoint-fingerprint ids for the chain-affecting proposal knob
_MOVE_IDS = {"stretch": 0, "de": 1, "mix": 2}


def select_samples(samples: np.ndarray, lnprobcut: float = 7.5,
                   drop_lnp: bool = False):
    """Iterative lnprob-cut selection: keep samples within ``lnprobcut``
    of the maximum, doubling the cut until at least a quarter survive —
    the pattern repeated five times in the reference
    (``lumfuncmcmc.py:548-556,620-628,655-661``)."""
    lnp = samples[:, -1]
    if len(samples) < 4:
        # len//4 == 0 would skip the loop and return an empty array
        return samples[:, :-1] if drop_lnp else samples
    if not np.any(np.isfinite(lnp)):
        # all -inf/NaN: the > cut is all-False at every doubling and
        # the loop would never terminate
        raise ValueError(
            "select_samples: no sample has a finite lnprob — the "
            "chain never found a finite-posterior region")
    nsamples = np.empty((0, samples.shape[1]))
    while len(nsamples) < len(samples) // 4:
        sel = lnp > (np.nanmax(lnp) - lnprobcut)
        nsamples = samples[sel]
        lnprobcut *= 2.0
    return nsamples[:, :-1] if drop_lnp else nsamples


class _BaseModel:
    """Shared fit/diagnostics/V_eff machinery."""

    model_kind = "single"

    def __init__(self, cfg: LFConfig, z, flux=None, flux_e=None,
                 lum=None, lum_e=None, field_id=None, field_names=None,
                 mesh=None):
        self.cfg = cfg
        self.log = setup_logging()
        self.field_names = field_names
        self.mesh = mesh
        t0 = time.time()
        self.data, self.ctx = build_context(
            cfg, z=z, flux=flux, flux_e=flux_e, lum=lum, lum_e=lum_e,
            field_id=field_id)
        self.log.info("Context build: %0.2f s (%d sources, grid %s, "
                      "quadrature=%s)"
                      % (time.time() - t0, len(np.asarray(z)),
                         tuple(self.ctx.logL_grid.shape), cfg.quadrature))
        self.zmin = float(np.min(np.asarray(z)))
        self.zmax = float(np.max(np.asarray(z)))
        self.layout = self._make_layout()
        self._lnprob_batch = None
        self.samples: Optional[np.ndarray] = None
        self.chain: Optional[np.ndarray] = None
        self.table = None

    # --- subclass hooks -------------------------------------------------
    def _make_layout(self):
        raise NotImplementedError

    def _make_scalar_lnprob(self):
        raise NotImplementedError

    def _initial_positions(self, key):
        """Walker starts: uniform prior-box draws, or — with
        ``cfg.init_map`` — overdispersed Laplace draws around the MAP
        (:meth:`_map_init_positions`)."""
        if getattr(self.cfg, "init_map", False):
            return self._map_init_positions(key)
        self._init_from_map = False
        return self._default_positions(key)

    def _default_positions(self, key):
        """Uniform draws inside the prior box (shared ``sample_init``;
        layouts are duck-typed). Always used by :meth:`log_evidence` —
        tempered rungs near beta=0 sample the PRIOR and need
        prior-wide starts, not a posterior-mode ball."""
        return sample_init(key, self.layout, self.cfg.nwalkers)

    def _map_init_positions(self, key):
        """Draw walkers from N(MAP, 2^2 * Laplace cov), component-wise
        replaced by a center-shrunk box draw where the Gaussian lands
        outside the prior box (shrunk so a mode near a box edge never
        seeds raw corner starts — NUTS relies on finite gradients at
        every start). The 2x overdispersion keeps starts diverse
        enough for honest R-hat while skipping the random-box burn-in.
        Falls back to uniform draws (with a warning) when the Hessian
        at the mode is not usable; ``self._init_from_map`` records
        which path ran so callers (the NUTS center-shrink gate) can
        tell a real Laplace ball from the fallback."""
        if getattr(self, "map_fit", None) is None:
            self.fit_map()
        res = self.map_fit
        if (not res["hess_ok"]
                or np.asarray(res.get("boundary", False)).any()):
            self.log.warning(
                "init_map: Laplace covariance unavailable (%s) — "
                "using uniform box starts"
                % ("MAP pinned at a prior bound"
                   if res["hess_ok"] else
                   "Hessian not negative definite at the mode"))
            self._init_from_map = False
            return self._default_positions(key)
        lo, hi = self.layout.bounds_arrays()
        n = self.cfg.nwalkers
        d = self.layout.ndim
        chol = np.linalg.cholesky(
            np.asarray(res["cov"])
            + 1e-12 * np.eye(d) * float(np.max(np.diag(res["cov"]))))
        k_n, k_u = jax.random.split(key)
        z = jax.random.normal(k_n, (n, d), dtype=lo.dtype)
        pos = jnp.asarray(res["theta"], lo.dtype)[None, :] \
            + 2.0 * (z @ jnp.asarray(chol, lo.dtype).T)
        # replacements respect the model's own init scheme (diff_rand)
        mid = (lo + hi) / 2.0
        u = 0.8 * mid[None, :] + 0.2 * self._default_positions(k_u)
        pos = jnp.where((pos > lo) & (pos < hi), pos, u)
        self._init_from_map = True
        self.log.info("Walker init: %d Laplace draws around the MAP "
                      "(2x overdispersed)" % n)
        return pos

    # --- shared API -----------------------------------------------------
    @property
    def lum(self):
        return np.asarray(self.data.lum)

    @property
    def lum_e(self):
        return (np.asarray(self.data.lum_e)
                if self.data.lum_e is not None else np.zeros_like(self.lum))

    def get_param_names(self):
        return self.layout.plot_names()

    def get_params(self):
        """Current central parameter values in theta order
        (``get_params``, ``lumfuncmcmc.py:463-477``). Also sets
        ``self.nfreeparams``."""
        cfg = self.cfg
        defaults = {"Lstar": cfg.Lstar, "phistar": cfg.phistar,
                    "sch_al": cfg.sch_al, "alpha": cfg.alpha,
                    "L1": cfg.Lstar, "L2": cfg.Lstar, "L3": cfg.Lstar,
                    "phi1": cfg.phistar, "phi2": cfg.phistar,
                    "phi3": cfg.phistar,
                    # natural z-evolution parameterization
                    "Lmid": cfg.Lstar, "Lslope": 0.0, "Lcurv": 0.0,
                    "pmid": cfg.phistar, "pslope": 0.0, "pcurv": 0.0,
                    # hierarchical hyperparameters
                    "mu_L": cfg.Lstar, "sig_L": 0.3,
                    "mu_p": cfg.phistar, "sig_p": 0.5}
        vals = []
        for name in self.layout.names:
            if name.startswith("Flim_"):
                vals.append(cfg.Flim[int(name.split("_")[1])])
            elif name.startswith("Lstar_"):
                vals.append(cfg.Lstar)
            elif name.startswith("phistar_"):
                vals.append(cfg.phistar)
            else:
                vals.append(defaults[name])
        self.nfreeparams = len(vals)
        return vals

    def _resolve_use_pallas(self, per_dev_walkers=None):
        """cfg.use_pallas=None means auto: the native tier is the default
        engine on TPU backends (it beats XLA fusion on every measured
        grid at production walker counts — docs/PERFORMANCE.md); off
        elsewhere (Mosaic kernels don't run on CPU outside the
        interpreter). Explicit True on a non-TPU backend without
        pallas_interpret falls back loudly.

        One measured exception: fixed completeness on a SMALL grid at
        large ensembles. The fixed-comp exponent is affine in the (a, p)
        cell features, so XLA computes it as a (cells x 2) @ (2 x W)
        MXU matmul whose efficiency grows with W — at gauss-32 it ties
        Pallas by W=300 and wins 1.3x by W=1000 (big trapz grids stay
        Pallas at every W: 1.2-1.5x). Auto mode picks XLA there.
        """
        cfg = self.cfg
        if cfg.use_pallas is None:
            if jax.default_backend() != "tpu" or cfg.exact_bounds:
                return False
            # the XLA-wins exception below is a per-device ensemble-size
            # effect: under a mesh each device sees nwalkers/ndev —
            # EXCEPT the whole-ensembles-per-device path, whose callers
            # pass the full per-device batch via per_dev_walkers
            walkers_per_dev = per_dev_walkers or cfg.nwalkers
            if per_dev_walkers is None and self.mesh is not None:
                walkers_per_dev = max(1, cfg.nwalkers
                                      // self.mesh.devices.size)
            if (cfg.fix_comp and self.model_kind == "single"
                    and walkers_per_dev >= 512):
                ncells = int(np.prod(self.ctx.logL_grid.shape))
                if ncells * 3 * 4 * 8 < 11 * 2**20:  # flat-layout grids
                    return False
            return True
        if (cfg.use_pallas and cfg.exact_bounds and not cfg.fix_comp
                and self.model_kind == "single"):
            raise ValueError(
                "exact_bounds is not implemented in the Pallas kernel — "
                "drop --use-pallas (the XLA exact-bounds path is the "
                "fast path for this configuration)")
        if (cfg.use_pallas and not cfg.pallas_interpret
                and jax.default_backend() != "tpu"):
            self.log.warning(
                "use_pallas requested on a %s backend; the Mosaic kernel "
                "needs a TPU (or pallas_interpret) — using XLA"
                % jax.default_backend())
            return False
        return bool(cfg.use_pallas)

    def _log_convergence(self, chain, rhat_line=True):
        """One shared post-fit convergence report: rank-normalized
        split-R-hat (bulk/tail max) and the Monte-Carlo SE of each
        parameter's posterior median — so the percentile tables carry
        a known sampling precision. One helper instead of per-path
        copies (call-site sprawl was a review finding)."""
        from lumfuncmcmc_tpu.samplers.diagnostics import mcse_quantile
        if rhat_line:
            self.log.info(
                "rank-normalized R-hat (bulk/tail max): %.4f"
                % rank_normalized_rhat(chain).max())
        mcse = mcse_quantile(chain, 0.5)
        self.log.info("median MCSE per param: %s"
                      % np.array2string(mcse, precision=4))

    def lnprob_batch(self):
        if self._lnprob_batch is None:
            cfg = self.cfg.replace(use_pallas=self._resolve_use_pallas())
            if self.mesh is not None:
                from lumfuncmcmc_tpu.parallel.mesh import AXIS_SOURCES
                from lumfuncmcmc_tpu.parallel.sharding import (
                    make_lnprob_sharded, make_pallas_lnprob_sharded,
                    make_pallas_lnprob_stream_sharded)
                if cfg.use_pallas and not cfg.exact_bounds:
                    fn = None
                    if (self.model_kind == "single" and not cfg.fix_comp
                            and self.mesh.shape[AXIS_SOURCES] > 1):
                        # over-VMEM catalogs on a source-sharded mesh:
                        # round-robin shard the slabs so per-device HBM
                        # holds 1/ns of the catalog (capacity scaling);
                        # smaller catalogs keep joint walker sharding
                        from lumfuncmcmc_tpu.ops.pallas_lnlike import (
                            free_comp_over_vmem)
                        if free_comp_over_vmem(self.ctx):
                            fn = make_pallas_lnprob_stream_sharded(
                                self.ctx, self.layout, self.mesh,
                                interpret=cfg.pallas_interpret)
                            if fn is not None:
                                self.log.info(
                                    "Engine: Pallas streaming kernels, "
                                    "sources round-robin sharded over "
                                    "%d devices x walkers over %d"
                                    % (self.mesh.shape[AXIS_SOURCES],
                                       self.mesh.shape["walkers"]))
                    if fn is None:
                        fn = make_pallas_lnprob_sharded(
                            self.ctx, self.layout, self.mesh,
                            model=self.model_kind,
                            interpret=cfg.pallas_interpret)
                        if fn is not None:
                            self.log.info(
                                "Engine: Pallas native kernels, walker"
                                "-sharded over the %d-device mesh"
                                % self.mesh.devices.size)
                    if fn is not None:
                        self._lnprob_batch = fn
                        return self._lnprob_batch
                    self.log.info(
                        "Catalog exceeds the Pallas VMEM gate — using "
                        "the XLA sharded path (source axis sharded)")
                self._lnprob_batch = make_lnprob_sharded(
                    self.ctx, self.layout, self.mesh,
                    model=self.model_kind,
                    exact_bounds=(cfg.exact_bounds and not cfg.fix_comp
                                  and self.model_kind == "single"),
                    min_comp_frac=cfg.min_comp_frac, lh=cfg.Lh)
            else:
                self._lnprob_batch = self._meshless_batch(cfg)
        return self._lnprob_batch

    def _meshless_batch(self, cfg):
        """Single-device (W, D) -> (W,) batch evaluator for the resolved
        engine — also the per-device form the sharded-ensembles path
        replicates."""
        if cfg.use_pallas and self.model_kind == "single":
            # (exact_bounds + explicit use_pallas already raised in
            # _resolve_use_pallas; auto mode resolves to XLA there)
            from lumfuncmcmc_tpu.ops.pallas_lnlike import (
                make_pallas_lnprob)
            return make_pallas_lnprob(self.ctx, self.layout,
                                      interpret=cfg.pallas_interpret)
        if cfg.use_pallas and self.model_kind == "z":
            from lumfuncmcmc_tpu.ops.pallas_lnlike import (
                make_pallas_lnprob_z)
            return make_pallas_lnprob_z(self.ctx, self.layout,
                                        interpret=cfg.pallas_interpret)
        if cfg.use_pallas and self.model_kind == "hier":
            from lumfuncmcmc_tpu.ops.pallas_lnlike import (
                make_pallas_lnprob_h)
            return make_pallas_lnprob_h(self.ctx, self.layout,
                                        interpret=cfg.pallas_interpret)
        return jax.vmap(self._make_scalar_lnprob())

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

    def _prior_like_fns(self):
        """``(lnprior_fn, lnlike_fn)`` split for tempered-evidence
        runs: everything that is part of the prior measure (box
        bounds, population hyperpriors) vs the data terms that get
        multiplied by β. Subclasses override."""
        raise NotImplementedError

    def log_evidence(self, nrungs: int = 16, nsteps: int = None,
                     key=None, power: float = 5.0, move: str = None,
                     burn_frac: float = 0.5, swap_every: int = 0):
        """Marginal likelihood ln Z of this model under its normalized
        prior, by simultaneous parallel tempering (new capability — no
        reference counterpart; see
        :mod:`~lumfuncmcmc_tpu.samplers.tempering`).

        All ``nrungs`` ladder rungs sample at once as one vmapped
        ``run_stretch`` batch (rung × walkers — the ensembles
        replication trick spent on the β integral). Returns the
        estimator dict (``lnz_ss`` primary, ``lnz_ti`` + error as the
        ladder-resolution cross-check) and stores it as
        ``self.evidence``. Two models' ``lnz_ss`` difference is a
        Bayes factor (same normalized-prior convention).

        ``swap_every > 0`` switches to true parallel tempering
        (DEO replica-exchange swaps between adjacent rungs every that
        many steps — :func:`run_parallel_tempering`): same estimators,
        but the cold rung inherits mode-hopping from the hot ones,
        which matters for multimodal posteriors. Composes with the
        device mesh (``run_parallel_tempering_sharded``: ghost-rung
        boundary exchange, bit-identical to the meshless run).
        """
        from lumfuncmcmc_tpu.parallel.distributed import to_host
        from lumfuncmcmc_tpu.samplers.tempering import (
            beta_ladder, evidence_from_ladder, run_tempered)
        cfg = self.cfg
        nsteps = int(nsteps or cfg.nsteps)
        if self.mesh is not None:
            # whole rungs sharded one-per-device (the ensembles trick);
            # rounding UP buys extra ladder resolution for free
            ndev = int(self.mesh.devices.size)
            if nrungs % ndev:
                new = -(-nrungs // ndev) * ndev
                self.log.info(
                    "Rounding evidence rungs %d -> %d (multiple of "
                    "the %d-device mesh)" % (nrungs, new, ndev))
                nrungs = new
        if key is None:
            # off the fit_model key stream: an evidence run after a fit
            # must not replay the fit's proposals
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                     0x65766964)
        k_init, k_run = jax.random.split(key)
        # ALWAYS prior-box starts: beta~0 rungs sample the prior, and
        # an init_map posterior-mode ball would start them in a
        # measure-zero corner of their own target
        pos0 = jnp.stack([self._default_positions(k)
                          for k in jax.random.split(k_init, nrungs)])
        betas = beta_ladder(nrungs, power)
        lnprior_fn, lnlike_fn = self._prior_like_fns()
        self.log.info(
            "Evidence ladder: %d rungs x %d walkers x %d steps "
            "(power-%g spacing), move=%s%s"
            % (nrungs, cfg.nwalkers, nsteps, power, move or cfg.move,
               "" if self.mesh is None
               else ", rungs sharded over %d devices"
               % self.mesh.devices.size))
        start = time.time()
        swap_frac = None
        if self.mesh is not None:
            from lumfuncmcmc_tpu.parallel.sharding import (
                run_parallel_tempering_sharded, run_tempered_sharded)
            if jax.process_count() > 1:
                pos0 = np.asarray(pos0)
                k_run = np.asarray(k_run)
            if swap_every:
                # DEO swaps cross devices via ghost-rung exchange;
                # bit-identical to the meshless PT (parity-tested)
                _, lnls, _, sw = run_parallel_tempering_sharded(
                    lnprior_fn, lnlike_fn, pos0, betas, k_run, nsteps,
                    self.mesh, swap_every=int(swap_every),
                    move=(move or cfg.move), de_prob=cfg.de_prob)
                swap_frac = np.asarray(to_host(sw))
                self.log.info(
                    "Replica-exchange swap acceptance per pair: %s"
                    % np.round(swap_frac, 2))
            else:
                _, lnls, _ = run_tempered_sharded(
                    lnprior_fn, lnlike_fn, pos0, betas, k_run, nsteps,
                    self.mesh, move=(move or cfg.move),
                    de_prob=cfg.de_prob)
        elif swap_every:
            from lumfuncmcmc_tpu.samplers.tempering import (
                run_parallel_tempering)
            _, lnls, _, sw = run_parallel_tempering(
                lnprior_fn, lnlike_fn, pos0, betas, k_run, nsteps,
                swap_every=int(swap_every), move=(move or cfg.move),
                de_prob=cfg.de_prob)
            swap_frac = np.asarray(sw)
            self.log.info("Replica-exchange swap acceptance per pair:"
                          " %s" % np.round(swap_frac, 2))
        else:
            _, lnls, _ = run_tempered(
                lnprior_fn, lnlike_fn, pos0, betas, k_run, nsteps,
                move=(move or cfg.move), de_prob=cfg.de_prob)
        lnls = np.asarray(to_host(lnls))
        elapsed = time.time() - start
        ev = evidence_from_ladder(lnls, betas, burn_frac=burn_frac)
        if swap_frac is not None:
            ev["swap_frac"] = swap_frac
        self.log.info(
            "ln Z = %.3f (stepping-stone; TI %.3f +- %.3f; |SS-TI| "
            "%.3f is the ladder-resolution check) in %.2f s"
            % (ev["lnz_ss"], ev["lnz_ti"], ev["lnz_ti_err"],
               abs(ev["lnz_ss"] - ev["lnz_ti"]), elapsed))
        self.evidence = ev
        return ev

    def information_criteria(self, lnprobcut: float = 7.5,
                             ndraws: int = 1000, seed: int = None,
                             chunk: int = 8192):
        """WAIC + PSIS-LOO from the fitted posterior (new capability;
        see :mod:`~lumfuncmcmc_tpu.models.ic`). Uses the same
        lnprobcut-selected samples every other posterior summary uses,
        so the draws match the written artifacts. Cheap relative to
        :meth:`log_evidence` (no extra sampling: one pass over
        draws x sources) and the natural first model-comparison look;
        the evidence ladder remains the fully Bayesian answer when
        priors matter. Stored as ``self.ic``.
        """
        from lumfuncmcmc_tpu.models.ic import (
            format_ic_report, information_criteria)
        if self.samples is None:
            raise RuntimeError("fit the model before computing "
                               "information criteria")
        cfg = self.cfg
        draws = select_samples(self.samples, lnprobcut, drop_lnp=True)
        ic = information_criteria(
            draws, self.ctx, self.layout,
            exact_bounds=bool(cfg.exact_bounds),
            min_comp_frac=cfg.min_comp_frac, lh=cfg.Lh,
            ndraws=int(ndraws),
            seed=cfg.seed if seed is None else int(seed),
            chunk=int(chunk))
        for line in format_ic_report(ic).splitlines():
            self.log.info(line)
        # the decomposition is exact; anything above float noise means
        # a dispatch bug, not statistics. "Float noise" is dtype- and
        # N-dependent: f32 per-term roundoff (~1e-6 relative, CLAUDE.md
        # parity band) accumulates across the N-source resummation, so
        # the f64 threshold would false-alarm on large f32 TPU runs
        tol = (1e-5 if jnp.asarray(self.ctx.lum).dtype == jnp.float64
               else max(1e-4, 3e-7 * math.sqrt(ic["n_sources"])))
        if ic["max_abs_recon_err"] > tol:
            self.log.warning(
                "pointwise decomposition check FAILED (%.2e) — the "
                "WAIC/LOO numbers do not match this model's likelihood"
                % ic["max_abs_recon_err"])
        if ic["frac_k_gt_07"] > 0.1:
            self.log.warning(
                "PSIS tail diagnostic: %.1f%% of sources have Pareto "
                "k > 0.7 — elpd_loo is unreliable; trust elpd_waic "
                "only as far as p_waic is small"
                % (100.0 * ic["frac_k_gt_07"]))
        self.ic = ic
        return ic

    def fit_map(self, nstarts: int = 8, key=None, maxiter: int = 500):
        """MAP + Laplace quick-look fit (new capability; see
        :mod:`~lumfuncmcmc_tpu.models.mapfit`): multi-start BFGS on the
        differentiable posterior, asymptotic covariance from the
        Hessian at the mode, and — for the flat-box-prior models — a
        Laplace ``lnz_laplace`` in the SAME normalized-prior convention
        as :meth:`log_evidence`, so the two estimators cross-check
        (|Laplace − stepping-stone| grows with posterior
        non-Gaussianity). The hierarchical model reports
        ``lnz_laplace=None``: its prior measure includes box-truncated
        Gaussian hyperprior terms whose normalization over the box is
        not analytic. Stored as ``self.map_fit``.
        """
        from lumfuncmcmc_tpu.models.mapfit import laplace_fit
        cfg = self.cfg
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                     0x6d6170)
        lnpost = self._make_scalar_lnprob()
        lo, hi = self.layout.bounds_arrays()
        t0 = time.time()
        res = laplace_fit(lnpost, lo, hi, key=key, nstarts=int(nstarts),
                          maxiter=int(maxiter))
        elapsed = time.time() - t0
        if self.model_kind == "hier":
            res["lnz_laplace"] = None
        elif res["ln_int"] is not None:
            ln_v = float(np.sum(np.log(np.asarray(hi, dtype=np.float64)
                                       - np.asarray(lo,
                                                    dtype=np.float64))))
            res["lnz_laplace"] = res["ln_int"] - ln_v
        else:
            res["lnz_laplace"] = None
        se = res["se"]
        self.log.info("MAP fit: lnpost=%.4f in %.2f s (%d/%d starts "
                      "finite, |grad|=%.2e%s)"
                      % (res["lnpost"], elapsed, res["n_finite"],
                         res["nstarts"], res["grad_norm"],
                         "" if res["hess_ok"]
                         else "; Hessian NOT negative definite — no "
                              "Laplace covariance"))
        for i, name in enumerate(self.layout.names):
            if res["boundary"][i]:
                tail = "  (AT PRIOR BOUND — no Laplace error; widen " \
                       "the box if this parameter should be free)"
            elif se is not None and np.isfinite(se[i]):
                tail = " +- %.4f" % se[i]
            else:
                tail = ""
            self.log.info("  %-12s = %10.4f%s"
                          % (name, res["theta"][i], tail))
        if res["lnz_laplace"] is not None:
            self.log.info("  Laplace ln Z = %.3f (cross-check "
                          "log_evidence's stepping-stone)"
                          % res["lnz_laplace"])
        self.map_fit = res
        return res

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
                        num_warmup):
        """Checkpoint plumbing for the shard_map NUTS routes: returns
        ``(ck, fp, resumed)``. The fingerprint additionally pins the
        MESH SHAPE — both shard_map routes fold the RNG by a device/row
        index, so resuming under a different mesh would splice chains
        from different key streams (the jit route has no such axis).
        """
        from lumfuncmcmc_tpu.parallel.mesh import (
            AXIS_SOURCES, AXIS_WALKERS)
        ck = checkpoint_path if min_ess else None
        if ck and not ck.endswith(".npz"):
            ck += ".npz"
        fp = np.asarray([y0.shape[0], int(num_warmup),
                         int(self.cfg.nsteps), y0.shape[1],
                         self.cfg.seed,
                         self.mesh.shape[AXIS_WALKERS],
                         self.mesh.shape[AXIS_SOURCES]],
                        dtype=np.float64)
        resumed = self._nuts_ckpt_load(
            ck, fp, resume,
            "(nchains, num_warmup, block_steps, ndim, seed, "
            "mesh_walkers, mesh_sources)")
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

        if route == "native_mesh":
            def first(return_state):
                return sh.run_nuts_sharded(
                    lnp_y, y0, k_run, self.mesh,
                    num_warmup=int(num_warmup),
                    num_samples=int(cfg.nsteps), pooled=bool(pooled),
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
                checkpoint_path, min_ess, resume, y0, num_warmup)
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
        (per-device replicas — ``continue_nuts_keys_sharded`` slices
        each device's own fold_in key stream), or "stream_mesh"
        (source-sharded streaming vg — keys fold by the walker-row
        index only). The mesh fingerprints additionally pin the mesh
        shape, which the key folding depends on. ``pooled`` only
        shapes the first block's warmup (the continuation state is
        frozen either way).
        """
        from lumfuncmcmc_tpu.samplers.nuts import (
            continue_nuts_keys, run_nuts, sampling_keys)
        cfg = self.cfg
        if not checkpoint_path.endswith(".npz"):
            # np.savez appends .npz to bare paths; the resume check
            # would then miss the file and silently restart from 0
            checkpoint_path += ".npz"
        nsteps = int(cfg.nsteps)
        nchains, ndim = y0.shape
        nblocks = -(-nsteps // every)
        sizes = [every] * (nblocks - 1) + [nsteps
                                           - every * (nblocks - 1)]
        fp_list = [nchains, int(num_warmup), nsteps, every, ndim,
                   cfg.seed]
        if route == "jit":
            def first(n):
                return run_nuts(lnp_y, y0, k_run,
                                num_warmup=int(num_warmup),
                                num_samples=n, return_state=True)

            def cont(st, a, b):
                return continue_nuts_keys(lnp_y, st,
                                          sampling_keys(k_run, a, b))
        else:
            from lumfuncmcmc_tpu.parallel.mesh import (
                AXIS_SOURCES, AXIS_WALKERS)
            from lumfuncmcmc_tpu.parallel import sharding as sh
            fp_list += [self.mesh.shape[AXIS_WALKERS],
                        self.mesh.shape[AXIS_SOURCES]]
            if route == "native_mesh":
                def first(n):
                    return sh.run_nuts_sharded(
                        lnp_y, y0, k_run, self.mesh,
                        num_warmup=int(num_warmup), num_samples=n,
                        pooled=bool(pooled), return_state=True)

                def cont(st, a, b):
                    return sh.continue_nuts_keys_sharded(
                        lnp_y, st, k_run, self.mesh, a, b)
            elif route == "stream_mesh":
                def first(n):
                    return sh.run_nuts_stream_sharded(
                        self.ctx, self.layout, self.mesh, y0, k_run,
                        num_warmup=int(num_warmup), num_samples=n,
                        pooled=bool(pooled),
                        interpret=cfg.pallas_interpret,
                        return_state=True)

                def cont(st, a, b):
                    return sh.continue_nuts_keys_stream_sharded(
                        self.ctx, self.layout, self.mesh, st, k_run,
                        a, b, interpret=cfg.pallas_interpret)
            else:
                raise ValueError(f"unknown NUTS checkpoint route "
                                 f"{route!r}")
        fp = np.asarray(fp_list, dtype=np.float64)
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
                raise ValueError(
                    "nuts-checkpoint fingerprint mismatch: the "
                    "checkpoint was written under different (nchains, "
                    "num_warmup, nsteps, checkpoint_every, ndim, seed"
                    "[, mesh_walkers, mesh_sources]) — delete %s or "
                    "restore the original settings" % checkpoint_path)
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
        per-device-replica mesh, source-sharded stream; the mesh
        fingerprints additionally pin the mesh shape, whose device
        indices fold the RNG). Fixed-length checkpointing (the
        bit-identical key-slice protocol) also runs on every route:
        the mesh twins slice each device's own fold_in key stream
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
        # (psum of per-shard vg rows); lnp_y below is only used by the
        # other routes
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
            fp = np.asarray([y0.shape[0], int(num_warmup),
                             int(cfg.nsteps), y0.shape[1], cfg.seed],
                            dtype=np.float64)
            resumed = self._nuts_ckpt_load(
                ck, fp, resume,
                "(nchains, num_warmup, block_steps, ndim, seed)")

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
                "more warmup or a smaller target_accept step"
                % (100.0 * float(div_frac)))
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

    # --- V_eff (lumfuncmcmc.py:515-525) --------------------------------
    def veff_lf(self, flim=None, alpha=None, key=None):
        cfg = self.cfg
        flim = np.asarray(flim if flim is not None else cfg.Flim,
                          dtype=np.float64)
        alpha = float(alpha if alpha is not None else cfg.alpha)
        logF50 = np.log10(flim) - 17.0
        if cfg.min_comp_frac > 0.001:
            roots = fleming_root_logf_np(logF50, alpha, cfg.min_comp_frac,
                                         cfg.fcmin)
        else:
            roots = np.full(len(flim), -np.inf)
        fid = np.asarray(self.ctx.field_id)
        w = veff_weights(
            self.ctx.logf_src, self.ctx.lum,
            jnp.asarray(logF50)[fid], jnp.asarray(roots)[fid],
            float(np.sum(cfg.Omega_0)), self.zmin, self.zmax, alpha,
            self.ctx.cosmo, cfg.fcmin, cfg.min_comp_frac)
        edges = log_bin_edges(self.ctx.lum, cfg.nbins)
        if key is None:
            key = jax.random.PRNGKey(cfg.seed + 1)
        lavg, lfbin, var = binned_lf_bootstrap(
            key, self.ctx.lum, w, edges, cfg.nboot, cfg.nbins)
        self.phifunc = np.asarray(w)
        self.Lavg = np.asarray(lavg)
        self.lfbinorig = np.asarray(lfbin)
        self.var = np.asarray(var)
        return self.Lavg, self.lfbinorig, self.var

    # reference-compatible alias
    def VeffLF(self):
        return self.veff_lf()

    def add_fitinfo_to_table(self, percentiles, start_value=1,
                             lnprobcut=7.5):
        """Fill percentile columns of ``self.table`` row -1
        (``lumfuncmcmc.py:653-667``)."""
        nsamples = select_samples(self.samples, lnprobcut, drop_lnp=True)
        n = len(percentiles)
        for i, per in enumerate(percentiles):
            for j, v in enumerate(np.percentile(nsamples, per, axis=0)):
                self.table[-1][i + start_value + j * n] = v
        return self.table


class LumFuncModel(_BaseModel):
    """Single-epoch Schechter fit (reference ``LumFuncMCMC``)."""

    model_kind = "single"

    def _make_layout(self):
        return ThetaLayout.from_config(self.cfg)

    def _make_scalar_lnprob(self):
        return make_lnprob(self.ctx, self.layout,
                           exact_bounds=(self.cfg.exact_bounds
                                         and not self.cfg.fix_comp),
                           min_comp_frac=self.cfg.min_comp_frac,
                           lh=self.cfg.Lh)

    def _prior_like_fns(self):
        from lumfuncmcmc_tpu.models.likelihood import (
            lnlike_exact_bounds, lnlike_single_epoch, lnprior)
        ctx, layout, cfg = self.ctx, self.layout, self.cfg
        if cfg.exact_bounds and not layout.fix_comp:
            lum_floor = float(np.min(np.asarray(ctx.lum)))

            def like(th):
                return lnlike_exact_bounds(th, ctx, layout,
                                           cfg.min_comp_frac,
                                           lum_floor, cfg.Lh)
        else:
            def like(th):
                return lnlike_single_epoch(th, ctx, layout)
        return (lambda th: lnprior(th, layout)), like

    def _default_positions(self, key):
        return sample_init(key, self.layout, self.cfg.nwalkers,
                           diff_rand=self.cfg.diff_rand)

    def set_median_fit(self, rndsamples=200, lnprobcut=7.5, key=None):
        """Median model LF over posterior draws + V_eff with the median
        completeness parameters (``set_median_fit``,
        ``lumfuncmcmc.py:527-567``)."""
        cfg = self.cfg
        nsamples = select_samples(self.samples, lnprobcut)
        self.log.info("Shape of nsamples (with a lnprobcut applied)")
        self.log.info(str(nsamples.shape))
        rng = np.random.default_rng(cfg.seed + 2)
        idx = rng.integers(0, nsamples.shape[0], rndsamples)
        draws = nsamples[idx, :-1]

        lum = self.lum
        lf, flims, alphas = [], [], []
        for th in draws:
            lstar, phistar, sch_al, logf50, alpha_c = \
                self.layout.unpack(jnp.asarray(th))
            lf.append(np.asarray(true_lum_func(
                jnp.asarray(lum), sch_al, lstar, phistar)))
            flims.append(np.asarray(10.0 ** (logf50 + 17.0)))
            alphas.append(float(alpha_c))
        self.medianLF = np.median(np.asarray(lf), axis=0)
        med_flim = np.median(np.asarray(flims), axis=0)
        med_alpha = float(np.median(alphas))
        self.median_flim, self.median_alpha = med_flim, med_alpha
        self.veff_lf(flim=med_flim, alpha=med_alpha, key=key)
        return self.medianLF

    def triangle_plot(self, outname, lnprobcut=7.5, imgtype="png"):
        from lumfuncmcmc_tpu.utils.plotting import triangle_plot_single
        triangle_plot_single(self, outname, lnprobcut, imgtype)


class LumFuncModelH(_BaseModel):
    """Hierarchical multi-field joint fit (new capability; see
    ``models/hierarchical.py``). Completeness fixed, like the z model."""

    model_kind = "hier"

    def __init__(self, cfg: LFConfig, *args, **kw):
        super().__init__(cfg.replace(fix_comp=True), *args, **kw)

    def _make_layout(self):
        from lumfuncmcmc_tpu.models.hierarchical import ThetaLayoutH
        return ThetaLayoutH.from_config(self.cfg)

    def _make_scalar_lnprob(self):
        from lumfuncmcmc_tpu.models.hierarchical import make_lnprob_h
        return make_lnprob_h(self.ctx, self.layout)

    def _prior_like_fns(self):
        # the population hyperprior belongs to the PRIOR measure: only
        # the per-field Poisson terms get tempered
        from lumfuncmcmc_tpu.models.hierarchical import (
            lnlike_h_split, lnprior_h)
        ctx, layout = self.ctx, self.layout

        def prior(th):
            lp = lnprior_h(th, layout)
            _, hyper = lnlike_h_split(th, ctx, layout)
            return jnp.where(jnp.isfinite(lp), lp + hyper, lp)

        def like(th):
            data, _ = lnlike_h_split(th, ctx, layout)
            return data

        return prior, like

    def set_median_fit(self, rndsamples=200, lnprobcut=7.5, key=None):
        """Median LF at the population-mean parameters over posterior
        draws, plus the V_eff cross-check."""
        nsamples = select_samples(self.samples, lnprobcut)
        rng = np.random.default_rng(self.cfg.seed + 2)
        idx = rng.integers(0, nsamples.shape[0], rndsamples)
        lum = self.lum
        lf = []
        for th in nsamples[idx, :-1]:
            mu_l, _, mu_p, _, sch_al, _, _ = self.layout.unpack(
                jnp.asarray(th))
            lf.append(np.asarray(true_lum_func(jnp.asarray(lum), sch_al,
                                               mu_l, mu_p)))
        self.medianLF = np.median(np.asarray(lf), axis=0)
        self.veff_lf(key=key)
        return self.medianLF

    def triangle_plot(self, outname, lnprobcut=7.5, imgtype="png"):
        from lumfuncmcmc_tpu.utils.plotting import corner_plot
        import matplotlib.pyplot as plt
        self.set_median_fit(lnprobcut=lnprobcut)  # artifacts downstream
        nsamples = select_samples(self.samples, lnprobcut)
        fig = corner_plot(nsamples[:, :-1], self.get_param_names())
        fig.savefig(f"{outname}.{imgtype}", dpi=200)
        plt.close(fig)


class LumFuncModelZ(_BaseModel):
    """Redshift-evolving Schechter fit (reference ``LumFuncMCMCz``)."""

    model_kind = "z"

    def __init__(self, cfg: LFConfig, *args, **kw):
        # the z model always uses the fixed-completeness grid
        # (lumfuncmcmc_z.py:254: size_ln=201 unconditionally)
        cfg_fixed = cfg.replace(fix_comp=True)
        super().__init__(cfg_fixed, *args, **kw)

    def _make_layout(self):
        return ThetaLayoutZ.from_config(self.cfg)

    def _make_scalar_lnprob(self):
        return make_lnprob_z(self.ctx, self.layout)

    def _prior_like_fns(self):
        from lumfuncmcmc_tpu.models.likelihood_z import (
            lnlike_z, lnprior_z)
        ctx, layout = self.ctx, self.layout
        return ((lambda th: lnprior_z(th, layout)),
                (lambda th: lnlike_z(th, ctx, layout)))

    def set_median_fit(self, lnprobcut=7.5, zlen=100, Llen=100, key=None):
        """Median-theta LF *matrix* over (z, L)
        (``lumfuncmcmc_z.py:480-515``)."""
        nsamples = select_samples(self.samples, lnprobcut, drop_lnp=True)
        med = np.percentile(nsamples, 50.0, axis=0)
        L1, L2, L3, p1, p2, p3, al = self.layout.unpack(jnp.asarray(med))
        lum = self.lum
        self.Lout = np.linspace(lum.min() - 0.2, lum.max() + 0.2, Llen)
        self.zout = np.linspace(self.zmin, self.zmax, zlen)
        zz, ll = np.meshgrid(self.zout, self.Lout, indexing="ij")
        self.medianLF = np.asarray(schechter_z(
            jnp.asarray(ll), jnp.asarray(zz), al, L1, L2, L3, p1, p2, p3,
            self.layout.z1, self.layout.z2, self.layout.z3))
        self.veff_lf(key=key)
        return self.medianLF

    def triangle_plot(self, outname, lnprobcut=7.5, imgtype="png"):
        from lumfuncmcmc_tpu.utils.plotting import triangle_plot_z
        triangle_plot_z(self, outname, lnprobcut, imgtype)
