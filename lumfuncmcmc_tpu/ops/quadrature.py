"""Fixed-order quadrature rules for jit-compiled integrals.

The reference integrates with ``scipy.integrate.trapz`` on frozen grids
(``lumfuncmcmc.py:360-393``) and adaptive ``scipy.integrate.quad``
(``VmaxLumFunc.py:235-257``). Under jit everything must be fixed-shape, so:

- :func:`trapz_weights` reproduces the trapezoid rule as a weight vector,
  letting the double integral become a single weighted reduction (and, for
  batched evaluation, a matmul that XLA places on the MXU).
- :func:`gauss_legendre` provides fixed-order Gauss–Legendre nodes and
  weights on [a, b] — the high-accuracy replacement for ``scipy.quad``
  (64 nodes reach ~1e-12 relative on these smooth integrands).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def trapz_weights(n: int, dtype=jnp.float64):
    """Trapezoid endpoint weights for n uniformly-spaced samples.

    integral = dx * sum(w * f)  with w = [0.5, 1, ..., 1, 0.5].
    """
    w = np.ones(n)
    w[0] = w[-1] = 0.5
    return jnp.asarray(w, dtype=dtype)


def gauss_legendre(n: int, a=0.0, b=1.0, dtype=jnp.float64):
    """Gauss–Legendre nodes and weights on [a, b] (host-precomputed)."""
    x, w = np.polynomial.legendre.leggauss(n)
    x = 0.5 * (x + 1.0) * (b - a) + a
    w = 0.5 * (b - a) * w
    return jnp.asarray(x, dtype=dtype), jnp.asarray(w, dtype=dtype)


def gl_nodes_unit(n: int):
    """Gauss–Legendre nodes/weights on [0, 1] as float64 numpy (for
    change-of-variables integrals with traced bounds)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


def integrate_gl_unit(f, n: int, lo, hi, dtype=None):
    """∫_lo^hi f(x) dx with traced bounds via u∈[0,1] change of variables.

    ``lo``/``hi`` may be traced arrays (broadcast against the node axis,
    which is appended as the last axis of the evaluation points).
    """
    u, w = gl_nodes_unit(n)
    u = jnp.asarray(u, dtype=dtype or jnp.result_type(lo, hi, 1.0))
    w = jnp.asarray(w, dtype=u.dtype)
    lo = jnp.asarray(lo)[..., None]
    hi = jnp.asarray(hi)[..., None]
    x = lo + u * (hi - lo)
    return jnp.sum(f(x) * w, axis=-1) * jnp.squeeze(hi - lo, -1)
