"""Benchmark: 100-walker ensemble on the flagship free-completeness model.

Prints ONE COMPACT JSON line (< 1,900 bytes — the round driver keeps
only the last 2,000 chars of stdout, which front-truncated BENCH_r04):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "detail": {<whitelisted headline keys>, "detail_file": ...}}
The FULL detail dict (every timing, spread, and skipped marker) goes to
the ``bench_detail.json`` sidecar next to this file (override with
``LFTPU_BENCH_DETAIL=<path>``).

- value: log-probability evaluations per second for the full MCMC run
  (10k steps x 100 walkers under one jit'd lax.scan) on the default JAX
  backend (TPU when available).
- vs_baseline: speedup over a serial float64 NumPy transcription of the
  reference's per-call lnprob (the emcee-on-CPU execution model:
  ``lumfuncmcmc.py:360-424`` evaluated one theta at a time), measured on
  the same catalog and the same 101x101x5 likelihood grid.

Details go to stderr; stdout carries only the JSON line.

Capture hardening (round 4): the axon TPU tunnel can raise UNAVAILABLE
or hang indefinitely in backend init (BENCH_r03 was lost to exactly
that). ``python bench.py`` therefore runs a SUPERVISOR that
  1. probes the backend in a bounded subprocess (retries + backoff),
  2. runs the measurement payload as a ``--_worker`` subprocess under a
     wall-clock watchdog,
  3. on any failure retries the payload with a forced-CPU backend and a
     reduced workload, and
  4. if even that fails, emits a degraded-but-valid JSON line itself.
Every emitted line carries ``detail.backend`` and
``detail.capture_error`` so a degraded artifact is self-describing, and
TPU-gated sections that did not run leave explicit ``*_skipped``
markers instead of silently vanishing.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

METRIC = "lnprob_evals_per_sec_100walker_chain"

# stdout budget: the round driver keeps only the last 2,000 chars of
# stdout — BENCH_r04's single JSON line grew to ~2.6 KB and was
# front-truncated into an unparseable artifact (VERDICT r4 #1). The
# headline line is therefore a WHITELISTED compact subset; the full
# detail dict goes to the bench_detail.json sidecar.
STDOUT_BUDGET = 1900

# keys kept on the stdout headline, in drop-last-first priority order
# (the tail is dropped first if the line ever approaches the budget)
_HEADLINE_DETAIL_KEYS = (
    "backend", "device", "engine", "capture_error", "capture_ok",
    "wall_s", "steps", "walkers",
    "gauss32_evals_per_sec", "gauss32_vs_baseline",
    "pallas_gauss32_evals_per_sec",
    "matched_ess_ratio_measured", "min_ess_per_sec",
    "pallas_gauss32_vs_xla", "pallas_trapz101_vs_xla",
    "pallas_mesh11_vs_meshless",
    "stream_fwd_pallas_vs_xla", "stream_vg_pallas_vs_xla",
    "nuts_ess_per_sec", "nuts_ess_per_sec_steady", "nuts_div_frac",
    "nuts_accept_stat",
    "evidence_lnz_ss", "evidence_lnz_ss_err",
    "vpu_occupancy_vs_measured_peak", "vpu_measured_peak_per_sec",
    "vpu_transcendentals_per_sec",
    "baseline_evals_per_sec", "matched_ess_ratio_vs_baseline",
    "mix_ess_per_sec", "stream_sources",
)


def detail_sidecar_path():
    return os.environ.get(
        "LFTPU_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_detail.json"))


def emit_result(result):
    """Print the ONE compact JSON headline line on stdout and write the
    full result to the bench_detail.json sidecar.

    The headline always fits the driver's tail buffer: whitelisted
    keys only, plus every ``*_skipped`` self-description marker, with
    a defensive drop-from-the-tail loop should the line ever approach
    ``STDOUT_BUDGET`` anyway (pinned by tests/test_bench_capture.py).
    """
    det = dict(result.get("detail") or {})
    attempts = det.get("capture_attempts")
    if attempts:
        # true when a measurement worker (primary or CPU fallback)
        # actually delivered the payload — derived BEFORE the sidecar
        # dump so the "full result" file carries it too
        det["capture_ok"] = any(
            a.get("ok") for a in attempts
            if a["stage"] in ("worker", "cpu_worker"))
        result = dict(result)
        result["detail"] = det
    sidecar = detail_sidecar_path()
    try:
        with open(sidecar, "w") as fh:
            json.dump(result, fh, indent=1)
        # basename for the default next-to-bench.py location; the full
        # path when LFTPU_BENCH_DETAIL points elsewhere (a bare
        # basename would not let a reader locate the sidecar)
        if "LFTPU_BENCH_DETAIL" in os.environ:
            sidecar_note = sidecar
        else:
            sidecar_note = os.path.basename(sidecar)
    except OSError as e:
        log(f"could not write detail sidecar {sidecar}: {e}")
        sidecar_note = None
    keys = list(_HEADLINE_DETAIL_KEYS) + sorted(
        k for k in det if k.endswith("_skipped"))
    compact = {k: result.get(k) for k in
               ("metric", "value", "unit", "vs_baseline")}
    compact["detail"] = {k: det[k] for k in keys if k in det}
    compact["detail"]["detail_file"] = sidecar_note
    line = json.dumps(compact)
    # under budget pressure drop real metrics from the tail; never the
    # sidecar pointer or the *_skipped self-description markers (the
    # pointer is how a reader finds what was dropped)
    protected = {"detail_file"} | {
        k for k in compact["detail"] if k.endswith("_skipped")}
    while len(line) > STDOUT_BUDGET:
        droppable = [k for k in compact["detail"]
                     if k not in protected]
        if not droppable:
            break
        del compact["detail"][droppable[-1]]
        line = json.dumps(compact)
    print(line, flush=True)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _inject_fail(stage):
    """Test hook: LFTPU_BENCH_FORCE_FAIL=<stage> simulates the axon
    tunnel failing at that stage (tests/test_bench_capture.py)."""
    if os.environ.get("LFTPU_BENCH_FORCE_FAIL") == stage:
        raise RuntimeError(f"injected {stage} failure "
                           "(LFTPU_BENCH_FORCE_FAIL)")


# --------------------------------------------------------------------
# supervisor: bounded probe -> watchdogged worker -> CPU retry -> JSON
# --------------------------------------------------------------------

_PROBE_SRC = """
import os, sys
if os.environ.get("LFTPU_BENCH_FORCE_FAIL") == "backend":
    sys.exit(3)
import jax
dev = jax.devices()[0]
sys.stdout.write("probe|" + jax.default_backend() + "|" + str(dev))
"""


def probe_backend(timeout_s, retries):
    """Check backend init in a subprocess so a hung axon tunnel cannot
    stall the capture (observed: 9.5 min in backend init, VERDICT r3)."""
    err = "no attempts"
    for attempt in range(max(1, retries)):
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=timeout_s)
            line = (out.stdout or "").strip().splitlines()
            line = line[-1] if line else ""
            if out.returncode == 0 and line.startswith("probe|"):
                _, backend, dev = line.split("|", 2)
                log(f"backend probe ok: {backend} ({dev})")
                return {"ok": True, "backend": backend, "device": dev}
            err = (f"rc={out.returncode}: "
                   f"{(out.stderr or '').strip()[-300:]}")
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {timeout_s}s"
        log(f"backend probe attempt {attempt + 1}/{retries} failed: "
            f"{err}")
        if attempt + 1 < retries:
            time.sleep(min(5.0 * (attempt + 1), 15.0))
    return {"ok": False, "error": err}


def run_worker(passthrough, extra, timeout_s):
    """Run the measurement payload as a subprocess; return (result,
    error). The worker's stderr streams through; its stdout is parsed
    for the JSON line."""
    cmd = ([sys.executable, os.path.abspath(__file__), "--_worker"]
           + passthrough + extra)
    try:
        out = subprocess.run(cmd, stdout=subprocess.PIPE, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, f"worker timed out after {timeout_s}s"
    for line in reversed((out.stdout or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                pass
    return None, f"worker exited rc={out.returncode} with no JSON line"


def supervise(args, passthrough):
    attempts = []
    result = None
    if not args.cpu:
        probe = probe_backend(args.probe_timeout, args.probe_retries)
        attempts.append({"stage": "probe", **probe})
        if probe["ok"]:
            result, err = run_worker(passthrough, [],
                                     args.worker_timeout)
            attempts.append({"stage": "worker",
                             "ok": result is not None, "error": err})
            if result is None:
                log(f"primary worker failed ({err}); retrying with a "
                    "forced-CPU backend")
    if result is None:
        result, err = run_worker(passthrough, ["--_force-cpu"],
                                 args.cpu_timeout)
        attempts.append({"stage": "cpu_worker",
                         "ok": result is not None, "error": err})
    if result is None:
        last_err = "; ".join(
            f"{a['stage']}: {a.get('error')}" for a in attempts
            if not a.get("ok"))
        result = {
            "metric": METRIC, "value": 0.0, "unit": "evals/s",
            "vs_baseline": 0.0,
            "detail": {"backend": "none",
                       "capture_error": f"all capture attempts failed "
                                        f"({last_err})"},
        }
    result.setdefault("detail", {})["capture_attempts"] = attempts
    return result


# --------------------------------------------------------------------
# serial reference baseline (the emcee-on-CPU execution model)
# --------------------------------------------------------------------

def numpy_reference_lnprob_factory(ctx, layout, cfg):
    """Serial float64 transcription of the reference lnprob (free-comp
    path, lumfuncmcmc.py:360-378) on the frozen grids."""
    lum = np.asarray(ctx.lum, dtype=np.float64)
    zarr = np.asarray(ctx.zarr, dtype=np.float64)
    logL = np.asarray(ctx.logL_grid, dtype=np.float64)
    logf_grid = np.asarray(ctx.logf_grid, dtype=np.float64)
    logf_src = np.asarray(ctx.logf_src, dtype=np.float64)
    volume = np.asarray(ctx.volume_part, dtype=np.float64)
    om0f = np.asarray(ctx.omega0_f, dtype=np.float64)
    fid = np.asarray(ctx.field_id)
    om0_src = om0f[fid]
    sqarc = (180.0 / np.pi * 3600.0) ** 2
    ln10 = np.log(10.0)
    nf = logL.shape[0]
    lo = np.asarray(layout.lo)
    hi = np.asarray(layout.hi)

    def fleming(logf, logF50, alpha, fcmin):
        x = alpha * (logf - logF50)
        fc = 0.5 * (1.0 + x / np.sqrt(1.0 + x * x))
        a = (2.0 * fcmin - 1.0) ** 2
        log_ftau = logF50 - np.sqrt(abs(a / (1 - a)) / alpha**2)
        ratio = np.minimum((logf - log_ftau) * ln10, 40.0)
        decay = 1.0 - np.exp(-np.exp(ratio))
        return np.where(fc > 0,
                        np.exp(np.log(np.maximum(fc, 1e-300)) / decay), 0.0)

    def tlf(lL, al, ls, ps):
        return (ln10 * 10.0**ps * 10.0 ** ((lL - ls) * (al + 1))
                * np.exp(-(10.0 ** (lL - ls))))

    def lnprob(theta):
        if np.any(theta < lo) or np.any(theta > hi):
            return -np.inf
        lstar, phistar, sch_al = theta[0], theta[1], theta[2]
        flim = theta[3:3 + nf]
        alpha_c = theta[3 + nf]
        logF50 = np.log10(flim) - 17.0
        om_src = (om0_src / sqarc
                  * fleming(logf_src, logF50[fid], alpha_c, cfg.fcmin))
        lnpart = np.log(tlf(lum, sch_al, lstar, phistar) * om_src).sum()
        fullint = 0.0
        for f in range(nf):
            om = om0f[f] / sqarc * fleming(logf_grid[f], logF50[f],
                                           alpha_c, cfg.fcmin)
            integ = tlf(logL[f], sch_al, lstar, phistar) * volume[f] * om
            fullint += np.trapezoid(
                np.trapezoid(integ, logL[f], axis=0), zarr[f])
        return lnpart - fullint

    return lnprob


def numpy_stretch_chain(lnprob, pos0, nsteps, seed=0, a=2.0):
    """Serial NumPy Goodman-Weare stretch sampler — the reference's
    emcee execution model (``lumfuncmcmc.py:489-491``): red-black
    half-ensemble updates, one lnprob call per walker per half-step.
    Returns the (nsteps, W, D) chain so the baseline's autocorrelation
    time is MEASURED, not assumed equal to ours."""
    rng = np.random.default_rng(seed)
    pos = np.array(pos0, dtype=np.float64)
    nw, ndim = pos.shape
    nh = nw // 2
    # out-of-bounds proposals legitimately produce -inf lnp (log of an
    # underflowed density) and -inf - -inf = nan in the accept test —
    # nan compares False, i.e. reject, which is the intended behavior
    with np.errstate(divide="ignore", invalid="ignore"):
        lnp = np.array([lnprob(p) for p in pos])
    chain = np.empty((nsteps, nw, ndim))
    with np.errstate(divide="ignore", invalid="ignore"):
        for t in range(nsteps):
            for (s0, s1) in ((slice(0, nh), slice(nh, nw)),
                             (slice(nh, nw), slice(0, nh))):
                other = pos[s1]
                z = ((a - 1.0) * rng.uniform(size=nh) + 1.0) ** 2 / a
                j = rng.integers(0, nh, size=nh)
                ln_u = np.log(rng.uniform(size=nh))
                prop = other[j] + z[:, None] * (pos[s0] - other[j])
                lnp_prop = np.array([lnprob(p) for p in prop])
                acc = ln_u < ((ndim - 1.0) * np.log(z)
                              + lnp_prop - lnp[s0])
                pos[s0][acc] = prop[acc]
                lnp[s0][acc] = lnp_prop[acc]
            chain[t] = pos
    return chain


# --------------------------------------------------------------------
# worker: the actual measurement payload
# --------------------------------------------------------------------

def worker_main(args):
    import jax
    try:  # persistent compile cache: repeat bench runs skip the ~3 min
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    if args._force_cpu:
        # the axon sitecustomize force-sets jax_platforms="axon,cpu"
        # and IGNORES the JAX_PLATFORMS env var; this config update is
        # the one supported way to keep the capture off the tunnel
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.context import build_context
    from lumfuncmcmc_tpu.models.likelihood import (
        ThetaLayout, make_lnprob, sample_init)
    from lumfuncmcmc_tpu.samplers.affine import run_stretch
    from lumfuncmcmc_tpu.samplers.diagnostics import (
        burnin_steps, effective_sample_size)
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    _inject_fail("backend")
    dev = jax.devices()[0]
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend: {backend}  device: {dev}")
    if not on_tpu and args.steps == 10000:
        # defensive: the full TPU workload would take ~an hour on a CPU
        # backend; shrink so the benchmark still completes and reports
        args.steps = 500
        log("cpu backend detected: reducing steps to 500")

    # flagship workload: free completeness (9-dim theta), reference grid
    # size 101, 5 fields, min_comp_frac=0.5
    cfg = LFConfig(min_comp_frac=0.5, fix_comp=False,
                   nwalkers=args.walkers, nsteps=args.steps)
    cat = apply_completeness_cut(
        make_catalog(cfg, n_target=args.nsrc, seed=7, lum_err_dex=0.0), cfg)
    log(f"catalog: {len(cat['z'])} sources over {len(cfg.Flim)} fields")
    data, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                              flux_e=cat["flux_e"],
                              field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)

    lnprob = jax.vmap(make_lnprob(ctx, layout))
    pos0 = sample_init(jax.random.PRNGKey(0), layout, args.walkers)

    def timed_once(fn, pos, steps, key, **kw):
        t0 = time.time()
        state, chain, lnps, acc = run_stretch(fn, pos, key, steps, **kw)
        jax.block_until_ready(state.pos)
        return time.time() - t0, state, chain, lnps, acc

    def timed_chain(fn, pos, steps, **kw):
        """Warm up with the full-length program (the scan trip count is
        a static jit arg), then time a pure cache-hit run."""
        out = run_stretch(fn, pos, jax.random.PRNGKey(1), steps, **kw)
        jax.block_until_ready(out[0].pos)
        return timed_once(fn, pos, steps, jax.random.PRNGKey(2), **kw)

    def ab_medians(engines, pos, steps, label):
        """Interleaved paired timings: warm every engine with the
        FULL-length program first (the scan trip count is a static jit
        arg — a short warmup would leave a fresh multi-minute compile
        inside the timed call), then alternate engines args.ab_reps
        times so shared-chip drift hits all engines equally; report the
        per-engine MEDIAN (single paired runs left the trapz margin
        inside the noise band — VERDICT r2)."""
        walls = {name: [] for name, _ in engines}
        keep = {}
        for name, fn in engines:
            t0 = time.time()
            out = run_stretch(fn, pos, jax.random.PRNGKey(1), steps)
            jax.block_until_ready(out[0].pos)
            log(f"compile+warmup [{label}:{name}] (full-length "
                f"program): {time.time() - t0:.1f}s")
        for rep in range(max(1, args.ab_reps)):
            for name, fn in engines:
                w, _, ch, lp, ac = timed_once(fn, pos, steps,
                                              jax.random.PRNGKey(2))
                walls[name].append(w)
                if name not in keep:
                    keep[name] = (ch, lp, ac)
        med = {name: float(np.median(ws)) for name, ws in walls.items()}
        spread = {name: (round(min(ws), 3), round(max(ws), 3))
                  for name, ws in walls.items()}
        nevals = steps * pos.shape[0]
        for name in med:
            log(f"{label}:{name}: median {med[name]:.3f}s over "
                f"{len(walls[name])} runs (min {spread[name][0]}, max "
                f"{spread[name][1]}) -> {nevals / med[name]:,.0f} "
                "evals/s")
        return med, spread, keep

    evals = args.steps * args.walkers

    # production quadrature mode: split-panel GL-32 (equal semantics,
    # ~1e4x tighter integral error than the reference grid, 10x fewer
    # nodes). Same sampler workload.
    _, ctx_g = build_context(cfg.replace(quadrature="gauss"),
                             z=cat["z"], flux=cat["flux"],
                             flux_e=cat["flux_e"],
                             field_id=cat["field_id"])
    lnprob_g = jax.vmap(make_lnprob(ctx_g, layout))

    # engine roster: XLA always; the fused Pallas kernels and the
    # (1,1)-mesh-composed Pallas path on TPU (Mosaic-compiled — no CPU
    # fallback here)
    engines = [("xla_trapz", lnprob), ("xla_gauss", lnprob_g)]
    pallas_detail = {}
    pal = pal_g = None
    if on_tpu:
        from lumfuncmcmc_tpu.ops.pallas_lnlike import make_pallas_lnprob
        pal = make_pallas_lnprob(ctx, layout)
        if getattr(pal, "engine", "pallas") != "pallas":
            log("pallas kernel unavailable for this workload (VMEM "
                "gate) — skipping the A/B")
            pallas_detail = {"pallas_skipped": "VMEM gate"}
            pal = None
        else:
            pal_g = make_pallas_lnprob(ctx_g, layout)
            engines += [("pallas_trapz", pal), ("pallas_gauss", pal_g)]
            # mesh composition regression check: the walker-sharded
            # native path on a (1,1) mesh must not regress vs meshless
            from lumfuncmcmc_tpu.parallel.mesh import make_mesh
            from lumfuncmcmc_tpu.parallel.sharding import (
                make_pallas_lnprob_sharded)
            pal_m = make_pallas_lnprob_sharded(
                ctx_g, layout, make_mesh(1, 1))
            if pal_m is not None:
                engines.append(("pallas_gauss_mesh11", pal_m))
    else:
        pallas_detail = {"pallas_skipped": f"no tpu backend ({backend})"}

    med, spread, keep = ab_medians(engines, pos0, args.steps, "main")
    chain, lnps, acc = keep["xla_trapz"]
    wall = med["xla_trapz"]
    wall_g = med["xla_gauss"]
    evals_per_sec = evals / wall

    wall_best, engine = wall, "xla"
    if pal is not None:
        wall_p = med["pallas_trapz"]
        wall_pg = med["pallas_gauss"]
        pallas_detail = {
            "ab_reps": max(1, args.ab_reps),
            "pallas_trapz101_evals_per_sec": round(evals / wall_p, 1),
            "pallas_trapz101_vs_xla": round(wall / wall_p, 3),
            "pallas_gauss32_evals_per_sec": round(evals / wall_pg, 1),
            "pallas_gauss32_vs_xla": round(wall_g / wall_pg, 3),
            "wall_spread_s": {k: list(v) for k, v in spread.items()},
        }
        if "pallas_gauss_mesh11" in med:
            pallas_detail["pallas_mesh11_vs_meshless"] = round(
                wall_pg / med["pallas_gauss_mesh11"], 3)
        if wall_p < wall_best:
            wall_best, engine = wall_p, "pallas"

    # better-mixing proposal (--move mix, 50/50 stretch/DE per step):
    # same posterior (cross-validated vs stretch and NUTS), lower tau —
    # recorded so the round artifact carries the best ESS/s the
    # framework offers, not just the reference-semantics default
    fn_mix = pal_g if pal is not None else lnprob_g
    wall_mx, _, chain_mx, _, _ = timed_chain(fn_mix, pos0, args.steps,
                                             move="mix")
    cmx = np.asarray(chain_mx)
    burn_mx, tau_mx = burnin_steps(cmx, cmx.shape[0])
    ess_mx = float(effective_sample_size(cmx[burn_mx:]).min())
    mix_detail = {
        "mix_tau_steps": round(float(tau_mx), 2),
        "mix_min_ess": round(ess_mx, 1),
        "mix_ess_per_sec": round(ess_mx / wall_mx, 1),
    }
    log(f"mix move (gauss-32): {wall_mx:.2f}s tau={tau_mx:.0f} "
        f"minESS={ess_mx:.0f} ({ess_mx / wall_mx:,.0f}/s)")

    # honest ESS: full-chain FFT autocorrelation after the reference
    # burn-in rule (a thinned subsample-and-scale estimate overstates
    # ESS whenever tau is at or below the thinning stride)
    chain_np = np.asarray(chain)
    burn, tau = burnin_steps(chain_np, chain_np.shape[0])
    ess = float(effective_sample_size(chain_np[burn:]).min())
    log(f"run: {wall:.2f}s for {args.steps} steps x {args.walkers} walkers"
        f" -> {evals_per_sec:,.0f} lnprob evals/s;"
        f" acc={np.mean(np.asarray(acc)) / args.steps:.2f};"
        f" tau={tau:.1f}; min ESS={ess:.0f} ({ess / wall:,.0f}/s)")

    # serial CPU baseline (reference execution model): median over
    # --baseline-reps repeated timings with the min/max spread recorded
    # — a single 30-eval sample wandered 120-380 evals/s between rounds
    # on host noise (VERDICT r3 #6)
    ref_lnprob = numpy_reference_lnprob_factory(ctx, layout, cfg)
    thetas = np.asarray(sample_init(jax.random.PRNGKey(3), layout,
                                    args.baseline_evals))
    # match the sampler's in-bounds workload: evaluate midpoint-ish thetas
    mid = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
    thetas = 0.9 * mid[None, :] + 0.1 * thetas
    base_rates = []
    sample_lnp = None
    for rep in range(max(1, args.baseline_reps)):
        t0 = time.time()
        vals = [ref_lnprob(th) for th in thetas]
        base_rates.append(len(thetas) / (time.time() - t0))
        sample_lnp = vals[0]
    base_rate = float(np.median(base_rates))
    base_spread = (round(min(base_rates), 2), round(max(base_rates), 2))
    log(f"baseline (serial numpy f64, reference lnprob): "
        f"{base_rate:,.1f} evals/s median of {len(base_rates)} reps "
        f"(min {base_spread[0]}, max {base_spread[1]}; "
        f"sample lnp {sample_lnp:.1f})")

    # measured baseline tau (VERDICT r2 #4): actually run the serial
    # stretch sampler instead of asserting ESS-per-eval equality. Both
    # tau-hats come from same-length chains through the same FFT
    # estimator, so the short-chain bias cancels in the ratio.
    base_tau_detail = {}
    if args.baseline_tau_steps > 0:
        nbt = args.baseline_tau_steps
        t0 = time.time()
        bchain = numpy_stretch_chain(ref_lnprob, np.asarray(pos0), nbt,
                                     seed=4)
        base_tau_wall = time.time() - t0
        bburn, btau = burnin_steps(bchain, bchain.shape[0])
        bess = float(effective_sample_size(bchain[bburn:]).min())
        jchain = np.asarray(chain)[:nbt]
        jburn, jtau = burnin_steps(jchain, jchain.shape[0])
        jess = float(effective_sample_size(jchain[jburn:]).min())
        jax_wall_nbt = wall_best * nbt / args.steps
        measured_ratio = ((jess / jax_wall_nbt)
                          / max(bess / base_tau_wall, 1e-12))
        base_tau_detail = {
            "baseline_tau_steps": round(float(btau), 2),
            "baseline_chain_steps": nbt,
            "baseline_chain_wall_s": round(base_tau_wall, 1),
            "baseline_min_ess": round(bess, 1),
            "jax_tau_same_length": round(float(jtau), 2),
            "matched_ess_ratio_measured": round(measured_ratio, 2),
        }
        log(f"baseline chain: {nbt} steps x {pos0.shape[0]} walkers in "
            f"{base_tau_wall:.0f}s; tau={btau:.1f} (ours at same "
            f"length: {jtau:.1f}); MEASURED matched-ESS ratio "
            f"{measured_ratio:,.0f}x")

    # mega-catalog streaming tier, default-on and budget-bounded
    # (VERDICT r3 #2: the 4.1x forward / 6.9x value+grad claims must
    # land in the driver artifact, not only in PERFORMANCE.md). One
    # over-VMEM free-completeness catalog serves both A/Bs:
    #   - forward: the HBM-streaming lnprob kernel vs XLA, in-chain
    #   - value+grad: one fused HBM pass per leapfrog vs XLA's
    #     forward+backward two
    stream_detail = {}
    if args.stream_nsrc <= 0:
        stream_detail = {"stream_skipped": "disabled by --stream-nsrc 0"}
    elif not on_tpu:
        stream_detail = {"stream_skipped": f"no tpu backend ({backend})"}
    else:
        from lumfuncmcmc_tpu.ops.pallas_lnlike import (
            free_comp_over_vmem, make_pallas_lnprob,
            make_pallas_lnprob_and_grad)
        cfg_s = cfg.replace(quadrature="gauss")
        cat_s = apply_completeness_cut(
            make_catalog(cfg_s, n_target=args.stream_nsrc, seed=7,
                         lum_err_dex=0.0), cfg_s)
        _, ctx_s = build_context(cfg_s, z=cat_s["z"], flux=cat_s["flux"],
                                 flux_e=cat_s["flux_e"],
                                 field_id=cat_s["field_id"])
        nsrc_s = len(cat_s["z"])
        if not free_comp_over_vmem(ctx_s):
            stream_detail = {
                "stream_skipped": f"{nsrc_s} sources fit in VMEM "
                                  "(raise --stream-nsrc)"}
        else:
            pal_s = make_pallas_lnprob(ctx_s, layout)
            xla_s = jax.vmap(make_lnprob(ctx_s, layout))
            SS = args.stream_steps
            med_s, spread_s, _ = ab_medians(
                [("stream_pallas", pal_s), ("stream_xla", xla_s)],
                pos0, SS, "stream")
            nevals_s = SS * args.walkers
            stream_detail = {
                "stream_sources": nsrc_s,
                "stream_fwd_steps": SS,
                "stream_fwd_pallas_evals_per_sec": round(
                    nevals_s / med_s["stream_pallas"], 1),
                "stream_fwd_xla_evals_per_sec": round(
                    nevals_s / med_s["stream_xla"], 1),
                "stream_fwd_pallas_vs_xla": round(
                    med_s["stream_xla"] / med_s["stream_pallas"], 3),
            }
            # value+grad A/B: interleaved reps of 10-call batches
            pal_vg = make_pallas_lnprob_and_grad(ctx_s, layout)
            mid_s = 0.5 * (np.asarray(layout.lo)
                           + np.asarray(layout.hi))
            th8 = np.asarray(sample_init(jax.random.PRNGKey(5),
                                         layout, 8))
            th8 = jnp.asarray(0.8 * mid_s[None, :] + 0.2 * th8,
                              jnp.float32)
            vg_engines = [("pallas", pal_vg),
                          ("xla", make_lnprob(ctx_s, layout))]
            vg_fns = {}
            for name, fn in vg_engines:
                vgf = jax.jit(jax.vmap(jax.value_and_grad(fn)))
                jax.block_until_ready(vgf(th8)[0])
                vg_fns[name] = vgf
            vg_walls = {name: [] for name, _ in vg_engines}
            for rep in range(max(1, args.ab_reps)):
                for name, _ in vg_engines:
                    t0 = time.time()
                    for _ in range(10):
                        out_vg = vg_fns[name](th8)
                    jax.block_until_ready(out_vg[0])
                    vg_walls[name].append((time.time() - t0) / 10)
            vg_med = {n: float(np.median(w)) for n, w in vg_walls.items()}
            stream_detail.update({
                "stream_vg_pallas_ms": round(1e3 * vg_med["pallas"], 3),
                "stream_vg_xla_ms": round(1e3 * vg_med["xla"], 3),
                "stream_vg_pallas_vs_xla": round(
                    vg_med["xla"] / vg_med["pallas"], 3),
            })
            log(f"stream-vg (8 chains, {nsrc_s:,} srcs): "
                f"pallas {1e3 * vg_med['pallas']:.2f} ms vs xla "
                f"{1e3 * vg_med['xla']:.2f} ms "
                f"({vg_med['xla'] / vg_med['pallas']:.2f}x)")

    # NUTS throughput (iterative while_loop transitions): large-batch
    # gradient-based sampling on the production gauss grid. At 256
    # chains the XLA-autodiff engine is the measured winner for this
    # small grid (docs/PERFORMANCE.md) and ESS/s matches the stretch
    # ensemble with far better per-sample mixing.
    nuts_detail = {}
    if args.nuts_chains <= 0:
        nuts_detail = {"nuts_skipped": "disabled by --nuts-chains 0"}
    elif not on_tpu:
        nuts_detail = {"nuts_skipped": f"no tpu backend ({backend})"}
    else:
        from lumfuncmcmc_tpu.samplers.nuts import (
            make_unconstrained, resample_bad_starts, run_nuts)
        lnp_scalar_g = make_lnprob(ctx_g, layout)
        lo_a = jnp.asarray(layout.lo)
        hi_a = jnp.asarray(layout.hi)
        lnp_y, to_theta, to_y = make_unconstrained(lnp_scalar_g, lo_a,
                                                   hi_a)
        mid_n = 0.5 * (np.asarray(layout.lo) + np.asarray(layout.hi))
        thN = np.asarray(sample_init(jax.random.PRNGKey(9), layout,
                                     args.nuts_chains))
        y0 = jax.vmap(to_y)(jnp.asarray(
            0.8 * mid_n[None, :] + 0.2 * thN))
        # stuck-chain guard (same as fit_model_nuts): robust low
        # outliers among the starts would diverge on every transition
        # and drag the pooled dual-averaging eps down for all chains
        y0, good0 = jax.jit(
            lambda y, k: resample_bad_starts(lnp_y, y, k)
        )(y0, jax.random.PRNGKey(11))
        n_bad0 = int(np.sum(~np.asarray(good0)))
        NW, NS = 100, 150
        t0 = time.time()
        compiled = run_nuts.lower(lnp_y, y0, jax.random.PRNGKey(10),
                                  num_warmup=NW, num_samples=NS,
                                  return_state=True).compile()
        log(f"NUTS compile: {time.time() - t0:.1f}s")
        out_n = compiled(y0, jax.random.PRNGKey(10))
        jax.block_until_ready(out_n[0])
        t0 = time.time()
        s_n, _, al_n, eps_n, dv_n, st_n = compiled(
            y0, jax.random.PRNGKey(10))
        jax.block_until_ready(s_n)
        # value-transfer backstop: through the axon tunnel
        # block_until_ready returns early for SHORT programs
        # (ops/pallas_roofline.py measured it A/B); these walls are
        # ~30-70 dispatch times, where the fences agree, so the
        # scalar readback costs ~1 dispatch and removes the doubt
        float(s_n[(0,) * s_n.ndim])
        wall_n = time.time() - t0
        ess_n = float(effective_sample_size(np.asarray(s_n)).min())
        # steady-state rate: warmup amortizes away on long runs, so
        # also time one frozen-adaptation continuation block (the
        # min-ess engine) — sampling-phase-only wall for NS samples
        from lumfuncmcmc_tpu.samplers.nuts import continue_nuts
        cont_n = jax.jit(lambda st, k: continue_nuts(
            lnp_y, st, k, num_samples=NS))
        out_c = cont_n(st_n, jax.random.PRNGKey(12))
        jax.block_until_ready(out_c[0])
        t0 = time.time()
        s_c, _, _, _, _ = cont_n(st_n, jax.random.PRNGKey(12))
        jax.block_until_ready(s_c)
        float(s_c[(0,) * s_c.ndim])  # same backstop as wall_n
        wall_c = time.time() - t0
        ess_c = float(effective_sample_size(np.asarray(s_c)).min())
        nuts_detail = {
            "nuts_chains": args.nuts_chains,
            "nuts_samples": NS,
            "nuts_wall_s": round(wall_n, 3),
            "nuts_min_ess": round(ess_n, 1),
            "nuts_ess_per_sec": round(ess_n / wall_n, 1),
            "nuts_accept_stat": round(
                float(np.mean(np.asarray(al_n))), 3),
            "nuts_div_frac": round(float(dv_n), 5),
            "nuts_starts_resampled": n_bad0,
            "nuts_eps": round(float(np.median(np.asarray(eps_n))), 5),
            "nuts_sampling_wall_s": round(wall_c, 3),
            "nuts_ess_per_sec_steady": round(ess_c / wall_c, 1),
        }
        log(f"NUTS steady-state (frozen adaptation, {NS} samples): "
            f"{wall_c:.2f}s minESS={ess_c:.0f} ({ess_c / wall_c:,.0f}/s)")
        log(f"NUTS ({args.nuts_chains} chains, {NW}+{NS}, gauss-32): "
            f"{wall_n:.2f}s minESS={ess_n:.0f} "
            f"({ess_n / wall_n:,.0f}/s) acc="
            f"{float(np.mean(np.asarray(al_n))):.2f}")

    # evidence ladder: all rungs sampled simultaneously as one vmapped
    # batch — the marginal-likelihood capability's TPU cost is one
    # K-fold wider run, not K sequential runs
    ev_detail = {}
    if args.evidence_rungs <= 0:
        ev_detail = {"evidence_skipped": "disabled by --evidence-rungs 0"}
    elif not on_tpu:
        ev_detail = {"evidence_skipped": f"no tpu backend ({backend})"}
    else:
        from lumfuncmcmc_tpu.models.likelihood import (
            lnlike_single_epoch, lnprior)
        from lumfuncmcmc_tpu.samplers.tempering import (
            beta_ladder, evidence_from_ladder, run_parallel_tempering,
            run_tempered, tune_ladder)
        K, ES = args.evidence_rungs, 500
        pos_t = jnp.stack([
            jnp.asarray(sample_init(jax.random.PRNGKey(30 + r), layout,
                                    args.walkers))
            for r in range(K)])
        betas_t = beta_ladder(K)

        def lnpr_t(th):
            return lnprior(th, layout)

        def lnlk_t(th):
            return lnlike_single_epoch(th, ctx_g, layout)

        run_t = jax.jit(lambda p, k: run_tempered(
            lnpr_t, lnlk_t, p, betas_t, k, ES))
        out_t = run_t(pos_t, jax.random.PRNGKey(31))
        jax.block_until_ready(out_t[1])
        t0 = time.time()
        _, lnls_t, _ = run_t(pos_t, jax.random.PRNGKey(31))
        jax.block_until_ready(lnls_t)
        wall_t = time.time() - t0
        ev = evidence_from_ladder(np.asarray(lnls_t), betas_t)
        ev_detail = {
            "evidence_rungs": K,
            "evidence_steps": ES,
            "evidence_wall_s": round(wall_t, 3),
            "evidence_lnz_ss": round(ev["lnz_ss"], 2),
            "evidence_lnz_ss_err": round(ev["lnz_ss_err"], 3),
        }
        log(f"evidence ladder ({K} rungs x {args.walkers} walkers x "
            f"{ES} steps, gauss-32): {wall_t:.2f}s "
            f"lnZ_ss={ev['lnz_ss']:.1f}")
        # ladder-adaptation A/B (the --evidence-tune capability):
        # fixed power-law spacing vs the communication-barrier
        # schedule tuned from measured swap rejections, judged by the
        # WORST pair's swap acceptance (the ladder's round-trip
        # bottleneck). betas enter TRACED so every leg reuses one
        # compiled DEO-PT program.
        run_pt = jax.jit(lambda p, b, k: run_parallel_tempering(
            lnpr_t, lnlk_t, p, b, k, ES, swap_every=10))
        out_p = run_pt(pos_t, jnp.asarray(betas_t),
                       jax.random.PRNGKey(32))
        jax.block_until_ready(out_p[3])
        t0 = time.time()
        ch_p, _, _, sw_p = run_pt(pos_t, jnp.asarray(betas_t),
                                  jax.random.PRNGKey(32))
        jax.block_until_ready(sw_p)
        wall_pt = time.time() - t0
        sw_fixed = np.asarray(sw_p)
        betas_tu, pos_tu, sw_tuned = np.asarray(betas_t), ch_p[:, -1], \
            sw_fixed
        for leg in range(2):
            betas_tu = tune_ladder(betas_tu, sw_tuned)
            ch_p, _, _, sw_p = run_pt(pos_tu, jnp.asarray(betas_tu),
                                      jax.random.PRNGKey(33 + leg))
            jax.block_until_ready(sw_p)
            sw_tuned, pos_tu = np.asarray(sw_p), ch_p[:, -1]
        ev_detail.update({
            "evidence_pt_wall_s": round(wall_pt, 3),
            "evidence_pt_min_swap_fixed": round(
                float(sw_fixed.min()), 3),
            "evidence_pt_min_swap_tuned": round(
                float(sw_tuned.min()), 3),
        })
        log(f"PT ladder tuning ({K} rungs, DEO every 10): min pair "
            f"swap {sw_fixed.min():.2f} (power-law) -> "
            f"{sw_tuned.min():.2f} (2 tuned legs); {wall_pt:.2f}s "
            "per leg")

    mega_detail = {}
    if args.mega:
        log("mega-catalog configuration (collapsed fixed-comp ln-term)")
        cfg_m = LFConfig(min_comp_frac=0.5, fix_comp=True,
                         quadrature="gauss", nwalkers=1000)
        cat_m = apply_completeness_cut(
            make_catalog(cfg_m, n_target=1_200_000, seed=7, lum_err_dex=0.0), cfg_m)
        _, ctx_m = build_context(cfg_m, z=cat_m["z"], flux=cat_m["flux"],
                                 flux_e=cat_m["flux_e"],
                                 field_id=cat_m["field_id"])
        layout_m = ThetaLayout.from_config(cfg_m)
        lnprob_m = jax.vmap(make_lnprob(ctx_m, layout_m))
        pos_m = sample_init(jax.random.PRNGKey(0), layout_m, 1000)
        wall_m, *_ = timed_chain(lnprob_m, pos_m, 2000)
        mega_detail = {
            "mega_sources": len(cat_m["z"]),
            "mega_walkers": 1000,
            "mega_steps": 2000,
            "mega_wall_s": round(wall_m, 3),
            "mega_evals_per_sec": round(2_000_000 / wall_m, 1),
        }
        log(f"mega: {wall_m:.2f}s for 2000 x 1000 "
            f"({2e6 / wall_m:,.0f} evals/s, N={len(cat_m['z']):,})")

        # mega free-completeness NUTS gradient A/B: the streaming
        # value+grad kernel (one HBM pass per leapfrog) vs XLA
        # forward+backward, 8 vmapped chains at the full catalog
        if on_tpu:
            from lumfuncmcmc_tpu.ops.pallas_lnlike import (
                make_pallas_lnprob_and_grad)
            cfg_fm = cfg_m.replace(fix_comp=False)
            _, ctx_fm = build_context(cfg_fm, z=cat_m["z"],
                                      flux=cat_m["flux"],
                                      flux_e=cat_m["flux_e"],
                                      field_id=cat_m["field_id"])
            layout_fm = ThetaLayout.from_config(cfg_fm)
            pal_vg = make_pallas_lnprob_and_grad(ctx_fm, layout_fm)
            mid_m = 0.5 * (np.asarray(layout_fm.lo)
                           + np.asarray(layout_fm.hi))
            th8 = np.asarray(sample_init(jax.random.PRNGKey(5),
                                         layout_fm, 8))
            th8 = jnp.asarray(0.8 * mid_m[None, :] + 0.2 * th8,
                              jnp.float32)
            vg_walls = {}
            reps = 20
            for name, fn in (("pallas", pal_vg),
                             ("xla", make_lnprob(ctx_fm, layout_fm))):
                if fn is None:
                    continue
                vgf = jax.jit(jax.vmap(jax.value_and_grad(fn)))
                jax.block_until_ready(vgf(th8)[0])
                t0 = time.time()
                for _ in range(reps):
                    out_vg = vgf(th8)
                jax.block_until_ready(out_vg[0])
                vg_walls[name] = (time.time() - t0) / reps
            if "pallas" in vg_walls:
                mega_detail.update({
                    "mega_vg_pallas_ms": round(
                        1e3 * vg_walls["pallas"], 3),
                    "mega_vg_xla_ms": round(1e3 * vg_walls["xla"], 3),
                    "mega_vg_pallas_vs_xla": round(
                        vg_walls["xla"] / vg_walls["pallas"], 3),
                })
                log(f"mega vg (8 chains, {len(cat_m['z']):,} srcs): "
                    f"pallas {1e3 * vg_walls['pallas']:.2f} ms vs xla "
                    f"{1e3 * vg_walls['xla']:.2f} ms "
                    f"({vg_walls['xla'] / vg_walls['pallas']:.2f}x)")

    # speed-of-light context: the likelihood is pure VPU work (no
    # matmul structure); per element the kernel executes 4
    # transcendentals (2 exp + log + rsqrt — the pinned counting
    # convention, docs/PERFORMANCE.md). Occupancy is reported against
    # the MEASURED roofline (ops/pallas_roofline.py: the same op chain
    # iterated over a resident VMEM block — the fastest any kernel
    # with this per-element math can go on the core), with the
    # conservative 1-per-lane-per-cycle issue bound kept for context
    # (VERDICT r4 #2: the roofline claim must be measured, not
    # asserted).
    vpu_detail = {}
    if pal is not None:
        from lumfuncmcmc_tpu.ops.pallas_roofline import (
            transcendental_peak)
        ncells_g = int(np.prod(np.asarray(ctx_g.logL_grid).shape))
        nsrc_b = int(np.asarray(ctx.lum).shape[0])
        trans_rate = 4.0 * (ncells_g + nsrc_b) * (
            evals / med["pallas_gauss"])
        peak_issue = 8 * 128 * 0.94e9
        peak = transcendental_peak()
        peak_meas = peak["transcendentals_per_sec"]
        vpu_detail = {
            "vpu_transcendentals_per_sec": round(trans_rate, -8),
            "vpu_measured_peak_per_sec": round(peak_meas, -8),
            "vpu_occupancy_vs_measured_peak": round(
                trans_rate / peak_meas, 3),
            "vpu_occupancy_vs_issue_limit": round(
                trans_rate / peak_issue, 3),
            "vpu_peak_per_iter_us": round(1e6 * peak["per_iter_s"],
                                          3),
            "vpu_peak_overhead_ms": round(1e3 * peak["overhead_s"],
                                          2),
        }
        log(f"VPU: {trans_rate:.3g} transcendentals/s sustained = "
            f"{trans_rate / peak_meas:.1%} of the MEASURED "
            f"{peak_meas:.3g}/s same-mix roofline "
            f"({trans_rate / peak_issue:.1%} of the 1/cycle issue "
            "bound)")

    # matched-ESS ratio (eval-rate form): the baseline runs the same
    # stretch-move sampler, so its implied ESS/s is ESS-per-eval * its
    # eval rate; the measured form above replaces this assumption with
    # data when --baseline-tau-steps > 0.
    ess_per_sec = ess / wall_best
    base_ess_per_sec = (ess / evals) * base_rate
    result = {
        "metric": METRIC,
        "value": round(evals / wall_best, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals / wall_best / base_rate, 2),
        "detail": {
            "device": str(dev),
            "backend": backend,
            "capture_error": None,
            "engine": engine,
            "wall_s": round(wall_best, 3),
            "xla_wall_s": round(wall, 3),
            "xla_evals_per_sec": round(evals_per_sec, 1),
            "steps": args.steps,
            "walkers": args.walkers,
            "baseline_evals_per_sec": round(base_rate, 2),
            "baseline_evals_per_sec_spread": list(base_spread),
            "baseline_reps": max(1, args.baseline_reps),
            "min_ess_full_chain": round(ess, 1),
            "tau_steps": round(float(tau), 2),
            "min_ess_per_sec": round(ess_per_sec, 1),
            "matched_ess_ratio_vs_baseline": round(
                ess_per_sec / base_ess_per_sec, 2),
            "gauss32_wall_s": round(wall_g, 3),
            "gauss32_evals_per_sec": round(evals / wall_g, 1),
            "gauss32_vs_baseline": round(evals / wall_g / base_rate, 2),
            **pallas_detail,
            **vpu_detail,
            **base_tau_detail,
            **mix_detail,
            **stream_detail,
            **nuts_detail,
            **ev_detail,
            **mega_detail,
        },
    }
    print(json.dumps(result), flush=True)


def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--walkers", type=int, default=100)
    ap.add_argument("--nsrc", type=int, default=1000)
    ap.add_argument("--baseline-evals", type=int, default=30)
    ap.add_argument("--baseline-reps", type=int, default=5,
                    help="repeated serial-baseline timings (median + "
                         "spread reported)")
    ap.add_argument("--baseline-tau-steps", type=int, default=300,
                    help="serial-baseline chain length for the measured "
                         "tau (0 disables; ~0.3 s/step of host time)")
    ap.add_argument("--ab-reps", type=int, default=5,
                    help="interleaved paired XLA/Pallas timings per "
                         "config (median reported)")
    ap.add_argument("--mega", action="store_true",
                    help="also run the 1.2e6-source x 1000-walker "
                         "mega-catalog configuration (BASELINE.json)")
    ap.add_argument("--stream-nsrc", type=int, default=1_200_000,
                    help="pre-cut catalog size for the default-on "
                         "streaming forward and value+grad A/Bs "
                         "(~1.02e6 sources survive the completeness "
                         "cut — the scale PERFORMANCE.md's 4.1x/6.9x "
                         "claims were measured at; 0 disables)")
    ap.add_argument("--stream-steps", type=int, default=500,
                    help="chain length for the streaming forward A/B")
    ap.add_argument("--evidence-rungs", type=int, default=16,
                    help="tempered evidence-ladder rungs for the "
                         "detail.evidence_* timing (0 disables)")
    ap.add_argument("--nuts-chains", type=int, default=256,
                    help="chain count for the NUTS throughput "
                         "measurement (0 disables)")
    # capture-hardening knobs (supervisor only)
    ap.add_argument("--cpu", action="store_true",
                    help="skip the TPU probe/attempt and capture on a "
                         "forced-CPU backend")
    ap.add_argument("--probe-timeout", type=float, default=90.0,
                    help="seconds per backend-init probe attempt")
    ap.add_argument("--probe-retries", type=int, default=3)
    ap.add_argument("--worker-timeout", type=float, default=2400.0,
                    help="wall-clock watchdog for the primary capture")
    ap.add_argument("--cpu-timeout", type=float, default=1200.0,
                    help="wall-clock watchdog for the CPU fallback")
    # internal
    ap.add_argument("--_worker", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--_force-cpu", dest="_force_cpu",
                    action="store_true", help=argparse.SUPPRESS)
    return ap


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    args = build_parser().parse_args(argv)
    if args._worker:
        worker_main(args)
        return
    passthrough = [a for a in argv
                   if a not in ("--_worker", "--_force-cpu", "--cpu")]
    try:
        result = supervise(args, passthrough)
    except Exception as e:  # the JSON line must land on EVERY path
        result = {"metric": METRIC, "value": 0.0, "unit": "evals/s",
                  "vs_baseline": 0.0,
                  "detail": {"backend": "none",
                             "capture_error": f"supervisor: {e!r}"}}
    emit_result(result)


if __name__ == "__main__":
    main()
