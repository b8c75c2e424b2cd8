"""Jittable math kernels: Schechter forms, completeness, Omega, quadrature."""

from lumfuncmcmc_tpu.ops.schechter import (  # noqa: F401
    true_lum_func,
    log_true_lum_func,
    schechter,
    schechter_log,
    schechter_integ,
    schechter_integ_log,
    quad_coef,
    schechter_z,
    log_schechter_z,
)
from lumfuncmcmc_tpu.ops.completeness import (  # noqa: F401
    fleming_from_logf,
    fleming,
    inverse_fleming,
    expdecay,
    fleming_root_logf,
    p_curve,
)
from lumfuncmcmc_tpu.ops.omega import omega, omega_from_logf  # noqa: F401
from lumfuncmcmc_tpu.ops.gamma import upper_gamma  # noqa: F401
