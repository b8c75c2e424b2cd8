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

from lumfuncmcmc_tpu.utils.calibration import (
    PARAMS, coverage_replicate_z, sbc_replicate, sbc_replicate_h)

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


@pytest.mark.slow
def test_calibration_z_model_coverage():
    """Small-K coverage gate for the redshift-evolving family (VERDICT
    r4 #5): non-evolving truths, quadratic-evolution fit, per-pivot
    interval coverage.

    Flake budget (binomial at nominal calibration, K=8, 7 params):
     - per-param 68% >= 1/8:  P(0 of 8 | p=.68) = .32^8 ~ 1.1e-4
     - per-param 95% >= 5/8:  P(<=4 of 8 | p=.95) ~ 4e-4
     - pooled 68% in [24, 55] of 56: >3.5 sigma both sides
    Total false-alarm rate < 0.5% across all params.
    """
    Kz = 8
    rng = np.random.default_rng(17)
    hits68 = hits95 = None
    for k in range(Kz):
        cover, names = coverage_replicate_z(k, rng)
        if hits68 is None:
            hits68 = {p: 0 for p in names}
            hits95 = {p: 0 for p in names}
        for p in names:
            hits68[p] += cover[p][0]
            hits95[p] += cover[p][1]
    for p in names:
        assert hits68[p] >= 1, (
            f"{p}: 68% interval NEVER covered the truth in {Kz} "
            f"replicates — gross z-model miscalibration")
        assert hits95[p] >= 5, f"{p}: 95% covered {hits95[p]}/{Kz}"
    pooled = sum(hits68.values())
    assert 24 <= pooled <= 7 * Kz - 1, (
        f"pooled 68% coverage {pooled}/{7 * Kz} — z-model posteriors "
        f"systematically mis-scaled")


@pytest.mark.slow
def test_calibration_hier_sbc_ranks_and_coverage():
    """Small-K SBC gate for the hierarchical family (VERDICT r4 #5):
    truths drawn from the EXACT hier prior (rejection through the
    box-truncated Gaussian hyperprior), per-field catalogs from each
    field's own (Lstar_f, phistar_f), joint 9-dim fit.

    Flake budget (K=10, M=7 ranks, 9 params):
     - per-param mean SBC rank in [1.0, 6.0]: ~3.5 sigma of the mean
       of 10 Uniform{0..7} draws (sd 0.72 about 3.5)
     - per-param 68% coverage >= 2/10: P(<=1 | p=.68) ~ 2.5e-4
     - per-param 95% coverage >= 6/10: P(<=5 | p=.95) ~ 7e-5
    Total false-alarm rate < 1% across all 9 params.
    """
    Kh = 10
    rng = np.random.default_rng(23)
    ranks = []
    hits68 = hits95 = None
    names = None
    for k in range(Kh):
        r, cover, _, _ = sbc_replicate_h(k, rng)
        ranks.append(r)
        if hits68 is None:
            names = list(cover)
            hits68 = {p: 0 for p in names}
            hits95 = {p: 0 for p in names}
        for p in names:
            hits68[p] += cover[p][0]
            hits95[p] += cover[p][1]
    ranks = np.asarray(ranks)
    for i, p in enumerate(names):
        mean_rank = float(ranks[:, i].mean())
        assert 1.0 <= mean_rank <= 6.0, (
            f"{p}: mean SBC rank {mean_rank:.2f} (expect ~3.5) — "
            f"systematic hier-posterior location bias")
        assert hits68[p] >= 2, (
            f"{p}: 68% interval covered only {hits68[p]}/{Kh}")
        assert hits95[p] >= 6, (
            f"{p}: 95% interval covered only {hits95[p]}/{Kh}")
