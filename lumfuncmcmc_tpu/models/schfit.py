"""Weighted least-squares Schechter fits to the binned V_eff LF.

Replaces ``fit_Schechter`` (``VmaxLumFunc.py:451-511``, lmfit) with a
self-contained Levenberg–Marquardt optimizer using JAX autodiff
Jacobians. All four reference parameterizations are kept (linear / log /
integral-amplitude / log-integral-amplitude), with the reference's
line-dependent alpha initialization (OIII -2.461, else -1.714), bounds,
and 1/sqrt(var) weighting. Parameter standard errors come from the
Gauss–Newton covariance (J^T W J)^-1 like lmfit's, and
:func:`eval_uncertainty` provides the delta-method confidence band used
by the reference plots (``VmaxLumFunc.py:556``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lumfuncmcmc_tpu.ops.schechter import (
    schechter, schechter_log, schechter_integ, schechter_integ_log)

_MODELS: Dict[str, Callable] = {
    ("lin", "phi"): schechter,
    ("log", "phi"): schechter_log,
    ("lin", "integ"): schechter_integ,
    ("log", "integ"): schechter_integ_log,
}


@dataclass
class SchechterFit:
    params: dict              # name -> best-fit value
    stderr: dict              # name -> standard error
    cov: np.ndarray           # (nfree, nfree) covariance of free params
    free_names: list
    chisqr: float
    redchi: float
    success: bool
    log: bool
    integ: bool
    alpha_fixed: Optional[float]

    def best_fit(self, L):
        return np.asarray(_model_eval(self, L))

    def eval_uncertainty(self, L, sigma=3.0):
        """Delta-method +-sigma band on the model curve."""
        L = jnp.asarray(L)
        names = self.free_names

        def f(free_vec):
            p = dict(self.params)
            for i, nm in enumerate(names):
                p[nm] = free_vec[i]
            return _model_eval_params(p, L, self.log, self.integ)

        free0 = jnp.asarray([self.params[nm] for nm in names])
        jac = jax.jacfwd(f)(free0)                      # (npts, nfree)
        var = jnp.einsum("pi,ij,pj->p", jac, jnp.asarray(self.cov), jac)
        return sigma * np.sqrt(np.maximum(np.asarray(var), 0.0))

    def fit_report(self) -> str:
        lines = ["[[Schechter fit]]",
                 f"    chi-square         = {self.chisqr:.6g}",
                 f"    reduced chi-square = {self.redchi:.6g}",
                 f"    success            = {self.success}"]
        for nm, v in self.params.items():
            se = self.stderr.get(nm)
            fixed = " (fixed)" if nm not in self.free_names else ""
            se_s = f" +/- {se:.4g}" if se is not None else ""
            lines.append(f"    {nm:8s} = {v:.6g}{se_s}{fixed}")
        return "\n".join(lines)


def _amp_name(integ):
    return "integ" if integ else "phistar"


def _model_eval_params(p, L, log, integ):
    fn = _MODELS[("log" if log else "lin", "integ" if integ else "phi")]
    return fn(L, p["al"], p[_amp_name(integ)], p["Lstar"])


def _model_eval(fit: SchechterFit, L):
    return _model_eval_params(fit.params, jnp.asarray(L), fit.log, fit.integ)


def _defaults(log, integ, name, alpha_value):
    """Reference initializations and bounds (``VmaxLumFunc.py:485-506``)."""
    if alpha_value is not None:
        al0, al_b = float(alpha_value), None
    else:
        al0 = -2.461 if name == "OIII" else -1.714
        al_b = (-5.0, 0.0)
    if not log:
        amp0, amp_b = ((0.1, (0.0, np.inf)) if integ
                       else (1.0e-3, (0.0, np.inf)))
        ls0, ls_b = 1.0e42, (1.0e40, 1.0e45)
    else:
        amp0, amp_b = ((-1.0, (-7.0, 5.0)) if integ
                       else (-3.0, (-8.0, np.inf)))
        ls0, ls_b = 42.5, (40.0, 45.0)
    return al0, al_b, amp0, amp_b, ls0, ls_b


def fit_schechter(Lavg, lfbinorig, var, name="OIII", alpha_value=None,
                  log=False, integ=False, max_iter=200) -> SchechterFit:
    """Levenberg–Marquardt fit of a Schechter form to the binned LF.

    API mirrors ``fit_Schechter`` (``VmaxLumFunc.py:451-511``):
    ``alpha_value`` fixes the faint-end slope; ``log``/``integ`` select
    the parameterization; weights are 1/sqrt(var).
    """
    Lavg = np.asarray(Lavg, dtype=np.float64)
    y = np.asarray(lfbinorig, dtype=np.float64)
    w = 1.0 / np.sqrt(np.asarray(var, dtype=np.float64))

    al0, al_b, amp0, amp_b, ls0, ls_b = _defaults(log, integ, name,
                                                  alpha_value)
    amp = _amp_name(integ)
    free_names = ([amp, "Lstar"] if alpha_value is not None
                  else ["al", amp, "Lstar"])
    p0 = {"al": al0, amp: amp0, "Lstar": ls0}
    bounds = {"al": al_b or (-np.inf, np.inf), amp: amp_b, "Lstar": ls_b}

    # internal scaling so LM steps are well conditioned for linear-space
    # amplitudes (phistar ~ 1e-3, Lstar ~ 1e42)
    scale = {nm: max(abs(p0[nm]), 1e-30) for nm in free_names}
    x0 = np.array([p0[nm] / scale[nm] for nm in free_names])
    lo = np.array([bounds[nm][0] / scale[nm] for nm in free_names])
    hi = np.array([bounds[nm][1] / scale[nm] for nm in free_names])
    # constants stay HOST numpy: a remote-TPU-resident closure constant
    # makes the first CPU-pinned compile fetch it through the tunnel,
    # which measured ~200 s on the axon backend (a numpy constant
    # embeds for free)
    sc = np.asarray([scale[nm] for nm in free_names])
    Lj, yj, wj = (np.asarray(Lavg), np.asarray(y), np.asarray(w))

    def residual(x):
        p = dict(p0)
        for i, nm in enumerate(free_names):
            p[nm] = x[i] * float(sc[i])
        return wj * (_model_eval_params(p, jnp.asarray(Lj), log, integ)
                     - yj)

    # the LM iteration is a HOST loop over a ~50-point problem: pin its
    # jitted residual/Jacobian to the CPU backend — on a remote TPU
    # the per-iteration device calls and tiny-program compiles
    # otherwise turn a sub-second fit into minutes
    try:
        _cpu = jax.local_devices(backend="cpu")[0]
        _dev_ctx = lambda: jax.default_device(_cpu)
    except RuntimeError:
        import contextlib
        _dev_ctx = contextlib.nullcontext

    def _on_cpu(fn):
        def wrapped(x):
            with _dev_ctx():
                return fn(jnp.asarray(x))
        return wrapped

    res_jit = _on_cpu(jax.jit(residual))
    jac_jit = _on_cpu(jax.jit(jax.jacfwd(residual)))

    x = x0.copy()
    lam = 1e-3
    cost = float(np.sum(np.asarray(res_jit(x)) ** 2))
    converged = False
    for _ in range(max_iter):
        r = np.asarray(res_jit(x), dtype=np.float64)
        J = np.asarray(jac_jit(x), dtype=np.float64)
        JtJ = J.T @ J
        g = J.T @ r
        try:
            step = np.linalg.solve(JtJ + lam * np.diag(np.diag(JtJ))
                                   + 1e-300 * np.eye(len(x)), -g)
        except np.linalg.LinAlgError:
            lam *= 10.0
            continue
        x_new = np.clip(x + step, lo, hi)
        cost_new = float(np.sum(np.asarray(res_jit(x_new)) ** 2))
        if cost_new < cost:
            rel = (cost - cost_new) / max(cost, 1e-300)
            x, cost = x_new, cost_new
            lam = max(lam / 10.0, 1e-12)
            if rel < 1e-12:
                converged = True
                break
        else:
            lam *= 10.0
            if lam > 1e12:
                # no step improves the cost anymore: a (local) optimum
                converged = True
                break

    # covariance from the Gauss-Newton approximation at the optimum
    J = np.asarray(jac_jit(x), dtype=np.float64)
    dof = max(len(y) - len(free_names), 1)
    redchi = cost / dof
    try:
        cov_scaled = np.linalg.inv(J.T @ J) * redchi
    except np.linalg.LinAlgError:
        cov_scaled = np.full((len(x), len(x)), np.nan)
    sc_np = np.asarray(sc)
    cov = cov_scaled * np.outer(sc_np, sc_np)

    params = dict(p0)
    stderr = {}
    for i, nm in enumerate(free_names):
        params[nm] = float(x[i] * sc_np[i])
        stderr[nm] = float(np.sqrt(max(cov[i, i], 0.0)))
    return SchechterFit(params=params, stderr=stderr, cov=cov,
                        free_names=free_names, chisqr=cost, redchi=redchi,
                        success=converged,  # False = max_iter exhausted
                        log=log, integ=integ, alpha_fixed=alpha_value)
