"""Upper incomplete gamma Gamma(a, x) for real a (including a <= 0).

The reference evaluates ``mpmath.gammainc(al+1, x)`` for the
integral-parameterized Schechter forms (``VmaxLumFunc.py:61,69``); the
fitted faint-end slopes put a = al+1 anywhere in roughly [-4, 1], where
``jax.scipy.special.gammaincc`` (regularized, a > 0 only) does not apply.

We lift negative shapes with the standard recurrence

    Gamma(a, x) = ( Gamma(a+1, x) - x^a e^{-x} ) / a

applied a fixed number of times (static for jit), then close with
``gammaincc(a', x) * Gamma(a')`` at a' > 0.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaincc, gammaln

_MAX_LIFTS = 9  # supports a > -8: shift = ceil(0.5 - a) reaches 9 for
                # a in (-8, -7.5], so 8 lifts silently stopped one
                # recurrence short there (reference priors keep
                # al+1 >= -4, far inside the domain)


def upper_gamma(a, x):
    """Gamma(a, x) = \\int_x^inf t^{a-1} e^{-t} dt for real a > -8, x > 0.

    Branch-free and jittable: always performs ``_MAX_LIFTS`` recurrence
    steps, masking the ones where the running shape is already positive.
    """
    a = jnp.asarray(a, dtype=jnp.result_type(a, x, 1.0))
    x = jnp.asarray(x, dtype=a.dtype)

    # The downward recurrence divides by a+k; if a is (near) a non-positive
    # integer an intermediate shape hits 0 exactly. Gamma(a, x) is smooth in
    # a, so nudge such shapes by a tiny epsilon instead of special-casing.
    # eps balances the nudge bias (~|ln x| * eps relative) against the
    # cancellation error of the near-pole recurrence step (~ulp / eps).
    eps = jnp.asarray(1e-8 if a.dtype == jnp.float64 else 3e-4, a.dtype)
    near_int = jnp.abs(a - jnp.round(a)) < eps
    a = jnp.where(near_int & (a < 0.5), jnp.round(a) + eps, a)

    # number of integer lifts needed to push a above a small positive floor
    # (avoid a' landing exactly on 0 where Gamma diverges)
    shift = jnp.maximum(0, jnp.ceil(0.5 - a)).astype(jnp.int32)
    a_top = a + shift  # in (0.5 - 1, 0.5] + integer -> >= 0.5 when lifted

    # Gamma(a_top, x) via regularized complement
    g = gammaincc(a_top, x) * jnp.exp(gammaln(a_top))

    # walk back down: Gamma(a_k, x) = (Gamma(a_k + 1, x) - x^{a_k} e^{-x}) / a_k
    # where a_k = a_top - k for k = 1..shift
    log_x = jnp.log(x)
    for k in range(1, _MAX_LIFTS + 1):
        a_k = a_top - k
        term = jnp.exp(a_k * log_x - x)
        g_next = (g - term) / a_k
        g = jnp.where(k <= shift, g_next, g)
    return g
