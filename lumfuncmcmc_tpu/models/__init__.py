"""Model layer: likelihood contexts, log-probability kernels, estimators."""

from lumfuncmcmc_tpu.models.context import (  # noqa: F401
    LFData, LFContext, build_context,
)
from lumfuncmcmc_tpu.models.likelihood import (  # noqa: F401
    ThetaLayout, make_lnprob, lnlike_single_epoch,
)
