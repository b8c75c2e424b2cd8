"""Fleming completeness curve and its faint-end modification.

Replaces ``VmaxLumFunc.py:79-167`` (``fleming``, ``p``, ``inverse_fleming``,
``expdecay`` and their ``uncertainties.unumpy`` twins — error propagation
is handled by autodiff here, so no twins are needed).

The primitive form works in log-flux space: with
``x = alpha * (logf - logF50)``,

    fc      = 0.5 * (1 + x / sqrt(1 + x^2))
    f_tau   : flux where fc = fcmin  (closed form, inverse_fleming)
    fc_mod  = fc ** ( 1 / (1 - exp(-f/f_tau)) )

Working from log10 f keeps float32 exact over the 1e-17 cgs flux range and
never materializes 4*pi*dL^2 (which overflows float32).

The ``fsolve`` root-finds of the reference — min-flux at a given
completeness (``lumfuncmcmc.py:272-281``, ``run_lumfuncmcmc.py:174-176``,
``VmaxLumFunc.py:701-720``) — become :func:`fleming_root_logf`, a
fixed-iteration bisection on the monotone modified curve: jittable and
vmappable, no 201x201 spline-of-roots table needed (the root is exact at
every (F50, alpha) instead of spline-interpolated).
"""

from __future__ import annotations

import jax.numpy as jnp


def expdecay(x, tau):
    """1 - exp(-x/tau) (``VmaxLumFunc.py:136-141``)."""
    return 1.0 - jnp.exp(-x / tau)


def _log10_inverse_fleming_ratio(alpha, fcmin):
    """log10(f_tau / F50) where the unmodified curve equals fcmin
    (closed form of ``VmaxLumFunc.py:143-167``). The crossing sits on
    the faint side of F50 for fcmin < 0.5 and the bright side for
    fcmin > 0.5 — the sign follows (2 fcmin - 1)."""
    s = 2.0 * fcmin - 1.0
    a = s * s
    return jnp.sign(s) * jnp.sqrt(jnp.abs(a / (1.0 - a)) / alpha**2)


def inverse_fleming(f50, alpha, fcmin=0.1):
    """Flux where the (unmodified) Fleming completeness equals fcmin
    (``VmaxLumFunc.py:143-167``)."""
    return f50 * 10.0 ** _log10_inverse_fleming_ratio(alpha, fcmin)


def fleming_from_logf(logf, logF50, alpha, fcmin=0.1):
    """Modified Fleming completeness fraction from log10 fluxes.

    ``fcmin`` is a static (Python) value: falsy disables the faint-end
    modification, matching the reference's ``if not fcmin`` branch
    (``VmaxLumFunc.py:121-127``).
    """
    x = alpha * (logf - logF50)
    fc = 0.5 * (1.0 + x / jnp.sqrt(1.0 + x * x))
    if not fcmin:
        return fc
    log_ftau = logF50 + _log10_inverse_fleming_ratio(alpha, fcmin)
    # f / f_tau computed in log space; clamp the exponent so exp() never
    # overflows (decay saturates at 1 long before that).
    ratio = jnp.exp(jnp.minimum((logf - log_ftau) * jnp.log(10.0), 40.0))
    fc_decay = 1.0 - jnp.exp(-ratio)
    # fc**(1/fc_decay) via exp/log; fc=0 maps to 0.
    safe_fc = jnp.maximum(fc, 1e-300 if fc.dtype == jnp.float64 else 1e-30)
    out = jnp.exp(jnp.log(safe_fc) / fc_decay)
    return jnp.where(fc > 0.0, out, 0.0)


def fleming(f, Flim=3.0e-17, alpha=3.5, fcmin=0.1):
    """Linear-flux wrapper matching ``VmaxLumFunc.fleming`` (:95-127).

    Prefer :func:`fleming_from_logf` inside float32 kernels.
    """
    if alpha is None:  # reference quirk: None alpha => fully complete
        return jnp.ones_like(jnp.asarray(f, dtype=float))
    return fleming_from_logf(jnp.log10(f), jnp.log10(Flim), alpha, fcmin)


def p_curve(F, Flim=3.0e-17, alpha=-3.5):
    """Legacy completeness form with the 2.5x slope convention
    (``VmaxLumFunc.py:79-81``); used by ``get_min_flux`` in the reference.
    """
    x = 2.5 * alpha * jnp.log10(F / Flim)
    return 0.5 * (1.0 - x / jnp.sqrt(1.0 + x * x))


def fleming_from_logf_np(logf, logF50, alpha, fcmin=0.1):
    """NumPy float64 twin of :func:`fleming_from_logf` for host-side
    precompute (context building, synthetic catalogs) — avoids routing
    through jnp when x64 is disabled on the device backend."""
    import numpy as np
    logf = np.asarray(logf, dtype=np.float64)
    x = alpha * (logf - logF50)
    fc = 0.5 * (1.0 + x / np.sqrt(1.0 + x * x))
    if not fcmin:
        return fc
    s = 2.0 * fcmin - 1.0
    a = s * s
    log_ftau = logF50 + np.sign(s) * np.sqrt(abs(a / (1.0 - a))
                                             / alpha**2)
    ratio = np.minimum((logf - log_ftau) * np.log(10.0), 40.0)
    fc_decay = 1.0 - np.exp(-np.exp(ratio))
    with np.errstate(divide="ignore"):
        out = np.where(fc > 0, np.exp(np.log(np.maximum(fc, 1e-300))
                                      / fc_decay), 0.0)
    return out


def fleming_root_logf_np(logF50, alpha, min_comp_frac, fcmin=0.1, iters=80):
    """NumPy float64 twin of :func:`fleming_root_logf`."""
    import numpy as np
    logF50 = np.asarray(logF50, dtype=np.float64)
    lo = logF50 - 6.0
    hi = logF50 + 6.0
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        val = fleming_from_logf_np(mid, logF50, alpha, fcmin)
        go_right = val < min_comp_frac
        lo = np.where(go_right, mid, lo)
        hi = np.where(go_right, hi, mid)
    return 0.5 * (lo + hi)


def min_flux_p_curve(min_comp_frac, Flim, alpha, iters=80):
    """Flux where the legacy ``p`` curve reaches ``min_comp_frac``
    (``get_min_flux``, ``VmaxLumFunc.py:701-720``; note the reference's
    standalone Vmax ``main`` uses this 2.5x-slope convention while the
    MCMC drivers root-solve the modified Fleming curve). Bisection on
    the monotone-decreasing-in-alpha<0 / increasing form; returns 0 for
    min_comp_frac ~ 0 like the reference."""
    import numpy as np
    if abs(min_comp_frac) < 1.0e-6:
        return 0.0
    lo, hi = np.log10(Flim) - 6.0, np.log10(Flim) + 6.0
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        x = 2.5 * alpha * (mid - np.log10(Flim))
        val = 0.5 * (1.0 - x / np.sqrt(1.0 + x * x))
        # p is increasing in F for alpha < 0 (the reference's usage)
        if (val < min_comp_frac) == (alpha < 0):
            lo = mid
        else:
            hi = mid
    return 10.0 ** (0.5 * (lo + hi))


def fleming_root_logf(logF50, alpha, min_comp_frac, fcmin=0.1, iters=80):
    """log10 of the flux where the modified Fleming curve crosses
    ``min_comp_frac``.

    Fixed-count bisection on log10 f (the curve is monotone increasing in
    f), vmappable over (logF50, alpha) arrays. 80 iterations over a
    12-dex bracket reaches ~4e-3 ulp in float64; float32 saturates its
    precision after ~30.

    Differentiable w.r.t. ``logF50`` and ``alpha`` via the implicit
    function theorem (a raw bisection's gradients flow only through
    boolean comparisons and come out zero — which would silently drop
    the completeness-boundary term from NUTS trajectories in the
    exact-bounds likelihood).

    Replaces the fsolve grids at ``lumfuncmcmc.py:272-281`` and the
    per-field solves at ``run_lumfuncmcmc.py:174-176`` /
    ``lumfuncmcmc_z.py:292-297``.
    """
    return _fleming_root_ift(logF50, alpha, min_comp_frac, fcmin, iters)


from functools import partial as _partial  # noqa: E402
import jax as _jax  # noqa: E402


@_partial(_jax.custom_jvp, nondiff_argnums=(2, 3, 4))
def _fleming_root_ift(logF50, alpha, min_comp_frac, fcmin, iters):
    # fori_loop keeps the compiled program tiny (an unrolled 50-80 step
    # bisection under vmap/shard_map made XLA compiles take minutes);
    # the custom IFT jvp below means nothing differentiates through it.
    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        val = fleming_from_logf(mid, logF50, alpha, fcmin)
        go_right = val < min_comp_frac
        return (jnp.where(go_right, mid, lo),
                jnp.where(go_right, hi, mid))

    lo, hi = _jax.lax.fori_loop(0, iters, body,
                                (logF50 - 6.0, logF50 + 6.0))
    return 0.5 * (lo + hi)


@_fleming_root_ift.defjvp
def _fleming_root_jvp(min_comp_frac, fcmin, iters, primals, tangents):
    logF50, alpha = primals
    dlogF50, dalpha = tangents
    root = _fleming_root_ift(logF50, alpha, min_comp_frac, fcmin, iters)
    # F(root, logF50, alpha) = mcf  =>  dr = -(F_logF50 dF50 + F_a da)/F_r
    f_r = _jax.grad(fleming_from_logf, argnums=0)
    f_f50 = _jax.grad(fleming_from_logf, argnums=1)
    f_a = _jax.grad(fleming_from_logf, argnums=2)
    shape = jnp.shape(root)
    b = lambda x: jnp.broadcast_to(jnp.asarray(x, root.dtype), shape)
    logF50_b, alpha_b = b(logF50), b(alpha)
    if shape:  # vmap the scalar grads over (broadcast) array inputs
        f_r, f_f50, f_a = (_jax.vmap(g, in_axes=(0, 0, 0, None))
                           for g in (f_r, f_f50, f_a))
    denom = f_r(root, logF50_b, alpha_b, fcmin)
    num = (f_f50(root, logF50_b, alpha_b, fcmin) * b(dlogF50)
           + f_a(root, logF50_b, alpha_b, fcmin) * b(dalpha))
    return root, -num / denom
