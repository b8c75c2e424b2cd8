"""Calibration regression gate (-m slow).

A small-K smoke of the SBC/coverage harness the examples drive at
full size (``examples/coverage_check.py`` / ``sbc_check.py``,
VALIDATION.md section 7/7a): K tiny synthetic fits with truths drawn
from the fitting prior, scored for interval coverage AND SBC rank
location. The bounds are deliberately loose — this is a tripwire for
GROSS miscalibration (a width-bias or location-bias regression drives
68% coverage toward 0-0.2 and the mean rank to an extreme), not a
re-measurement of the VALIDATION.md tables.

Flake budget (binomial at nominal calibration, K=12 replicates):
 - per-param 68% coverage >= 1/3:  P(<=3 of 12 | p=.68) ~ 2.8e-3
 - per-param 95% coverage >= 7/12: P(<=6 of 12 | p=.95) ~ 2e-5
 - pooled 68% coverage <= 33/36:   P(>=34 of 36 | p=.68) ~ 1e-4
 - per-param mean SBC rank in [1.5, 5.5]: ~3 sigma of the mean of 12
   Uniform{0..7} draws (sd 0.66 around 3.5)
Total false-alarm rate well under 2% across all 3 parameters.
"""

import numpy as np
import pytest

from lumfuncmcmc_tpu.utils.calibration import PARAMS, sbc_replicate

K = 12
M = 7


@pytest.mark.slow
def test_calibration_smoke_coverage_and_sbc_ranks():
    rng = np.random.default_rng(7)
    ranks = np.empty((K, len(PARAMS)), dtype=int)
    hits68 = np.zeros(len(PARAMS), dtype=int)
    hits95 = np.zeros(len(PARAMS), dtype=int)
    for k in range(K):
        r, cover, _, _ = sbc_replicate(k, rng, nwalkers=32, nsteps=400,
                                       M=M, size_ln=41)
        ranks[k] = r
        for i, nm in enumerate(PARAMS):
            hits68[i] += cover[nm][0]
            hits95[i] += cover[nm][1]
    for i, nm in enumerate(PARAMS):
        assert hits68[i] >= 4, (
            f"{nm}: 68% interval covered the truth only {hits68[i]}/{K} "
            f"times — gross under-coverage (posterior too narrow or "
            f"biased)")
        assert hits95[i] >= 7, (
            f"{nm}: 95% interval covered only {hits95[i]}/{K}")
        mean_rank = float(ranks[:, i].mean())
        assert 1.5 <= mean_rank <= 5.5, (
            f"{nm}: mean SBC rank {mean_rank:.2f} (expect ~3.5) — "
            f"systematic location bias")
    assert hits68.sum() <= 33, (
        f"pooled 68% coverage {hits68.sum()}/36 — posteriors far too "
        f"wide")
