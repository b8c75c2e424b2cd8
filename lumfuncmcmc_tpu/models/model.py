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
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.ensemble_driver import _EnsembleDriverMixin
from lumfuncmcmc_tpu.models.likelihood import (
    ThetaLayout, make_lnprob, sample_init)
from lumfuncmcmc_tpu.models.likelihood_z import ThetaLayoutZ, make_lnprob_z
from lumfuncmcmc_tpu.models.nuts_driver import _NutsDriverMixin
from lumfuncmcmc_tpu.models.veff import (
    veff_weights, binned_lf_bootstrap, log_bin_edges)
from lumfuncmcmc_tpu.ops.completeness import fleming_root_logf_np
from lumfuncmcmc_tpu.ops.schechter import true_lum_func, schechter_z
from lumfuncmcmc_tpu.samplers.diagnostics import rank_normalized_rhat
from lumfuncmcmc_tpu.utils.logging import setup_logging


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


class _BaseModel(_EnsembleDriverMixin, _NutsDriverMixin):
    """Shared fit/diagnostics/V_eff machinery; the sampling drivers
    live in the two mixins (``ensemble_driver.py`` / ``nuts_driver.py``)
    so this class reads as orchestration."""

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

    def _prior_like_fns(self):
        """``(lnprior_fn, lnlike_fn)`` split for tempered-evidence
        runs: everything that is part of the prior measure (box
        bounds, population hyperpriors) vs the data terms that get
        multiplied by β. Subclasses override."""
        raise NotImplementedError

    def log_evidence(self, nrungs: int = 16, nsteps: int = None,
                     key=None, power: float = 5.0, move: str = None,
                     burn_frac: float = 0.5, swap_every: int = 0,
                     tune_rounds: int = 0, tune_steps: int = None):
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

        ``tune_rounds > 0`` (requires ``swap_every > 0``) prepends
        that many SHORT adaptation legs (``tune_steps`` each, default
        nsteps//4 rounded to whole swap rounds): after each leg the
        ladder is re-spaced to equalize the measured swap rejection
        across pairs (:func:`~lumfuncmcmc_tpu.samplers.tempering.
        tune_ladder`, the Syed et al. 2021 communication-barrier
        schedule), and walkers carry over. Fixed power-law ladders
        guess where the barrier is; the tuned ladder measures it —
        on LF posteriors rungs migrate toward the near-prior end
        where exchange actually stalls, which is also where the
        stepping-stone variance lives.
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
        multi = jax.process_count() > 1

        def _pt(pos_t, betas_t, k_t, n_t):
            """One DEO parallel-tempering leg on the right backend;
            returns ``(chains, lnls, swap_frac np)``."""
            if self.mesh is not None:
                from lumfuncmcmc_tpu.parallel.sharding import (
                    run_parallel_tempering_sharded)
                # DEO swaps cross devices via ghost-rung exchange;
                # bit-identical to the meshless PT (parity-tested)
                ch, lnl, _, sw = run_parallel_tempering_sharded(
                    lnprior_fn, lnlike_fn, pos_t, betas_t, k_t, n_t,
                    self.mesh, swap_every=int(swap_every),
                    move=(move or cfg.move), de_prob=cfg.de_prob)
            else:
                from lumfuncmcmc_tpu.samplers.tempering import (
                    run_parallel_tempering)
                ch, lnl, _, sw = run_parallel_tempering(
                    lnprior_fn, lnlike_fn, pos_t, betas_t, k_t, n_t,
                    swap_every=int(swap_every),
                    move=(move or cfg.move), de_prob=cfg.de_prob)
            # the to_host gather is COLLECTIVE: every process calls it
            return ch, lnl, np.asarray(to_host(sw))

        if self.mesh is not None and multi:
            pos0 = np.asarray(pos0)
            k_run = np.asarray(k_run)
        if tune_rounds and not swap_every:
            raise ValueError("tune_rounds needs swap_every > 0 (the "
                             "ladder is tuned from measured swap "
                             "rates)")
        if swap_every and int(tune_rounds) > 0:
            from lumfuncmcmc_tpu.samplers.tempering import tune_ladder
            n_tune = int(tune_steps or max(int(swap_every) * 4,
                                           nsteps // 4))
            n_tune = max(int(swap_every),
                         n_tune - n_tune % int(swap_every))
            for t in range(int(tune_rounds)):
                k_run, k_leg = (np.asarray(x) if multi else x
                                for x in jax.random.split(
                                    jnp.asarray(k_run)))
                ch_t, _, sw_t = _pt(pos0, betas, k_leg, n_tune)
                betas = tune_ladder(betas, sw_t)
                # walkers carry over: each rung keeps its ensemble;
                # the re-spaced beta changes its target slightly and
                # burn_frac absorbs the transient
                pos0 = ch_t[:, -1]
                if multi:
                    pos0 = np.asarray(to_host(pos0))
                self.log.info(
                    "Ladder tuning leg %d/%d (%d steps): swap "
                    "acceptance %s -> re-spaced betas (min dβ %.2e)"
                    % (t + 1, int(tune_rounds), n_tune,
                       np.round(np.asarray(sw_t), 2),
                       float(np.min(np.diff(betas)))))
        if swap_every:
            _, lnls, swap_frac = _pt(pos0, betas, k_run, nsteps)
            self.log.info("Replica-exchange swap acceptance per pair:"
                          " %s" % np.round(swap_frac, 2))
        elif self.mesh is not None:
            from lumfuncmcmc_tpu.parallel.sharding import (
                run_tempered_sharded)
            _, lnls, _ = run_tempered_sharded(
                lnprior_fn, lnlike_fn, pos0, betas, k_run, nsteps,
                self.mesh, move=(move or cfg.move),
                de_prob=cfg.de_prob)
        else:
            _, lnls, _ = run_tempered(
                lnprior_fn, lnlike_fn, pos0, betas, k_run, nsteps,
                move=(move or cfg.move), de_prob=cfg.de_prob)
        lnls = np.asarray(to_host(lnls))
        elapsed = time.time() - start
        ev = evidence_from_ladder(lnls, betas, burn_frac=burn_frac)
        if swap_frac is not None:
            from lumfuncmcmc_tpu.samplers.tempering import barrier_stats
            ev["swap_frac"] = swap_frac
            bs = barrier_stats(swap_frac)
            ev["lambda_barrier"] = bs["lambda"]
            ev["roundtrip_rate_est"] = bs["roundtrip_rate"]
            self.log.info(
                "Communication barrier Λ = %.2f -> estimated DEO "
                "round-trip rate %.3f per replica sweep-pair (Syed "
                "et al. 2021 Cor. 1; low rate with uneven swap "
                "acceptance -> tune the ladder, uniformly low -> "
                "raise nrungs)" % (bs["lambda"],
                                   bs["roundtrip_rate"]))
        self.log.info(
            "ln Z = %.3f +- %.3f (stepping-stone; TI %.3f +- %.3f; "
            "|SS-TI| %.3f is the ladder-resolution check) in %.2f s"
            % (ev["lnz_ss"], ev["lnz_ss_err"], ev["lnz_ti"],
               ev["lnz_ti_err"], abs(ev["lnz_ss"] - ev["lnz_ti"]),
               elapsed))
        gap = abs(ev["lnz_ss"] - ev["lnz_ti"])
        if gap > 3.0 * (ev["lnz_ss_err"] + ev["lnz_ti_err"]) + 2.0:
            self.log.warning(
                "evidence ladder looks UNDER-RESOLVED: |SS-TI| = %.1f "
                "nats exceeds the combined MC error band — raise "
                "nrungs (SS should move < O(1) nats between K and 2K "
                "rungs before you trust a Bayes factor); high-"
                "dimensional priors (fith) typically need several "
                "times the default ladder" % gap)
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
        non-Gaussianity). Flat-box models subtract ``ln V``; the
        hierarchical model subtracts
        :func:`~lumfuncmcmc_tpu.models.hierarchical.lnz0_prior` — the
        box-truncated Gaussian hyperprior mass by deterministic
        split-panel Gauss-Legendre over the hyper box, which is the
        exact normalization of the ladder's beta=0 measure. Stored as
        ``self.map_fit``.
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
        if res["ln_int"] is not None and self.model_kind == "hier":
            from lumfuncmcmc_tpu.models.hierarchical import lnz0_prior
            res["lnz_laplace"] = res["ln_int"] - lnz0_prior(self.layout)
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
