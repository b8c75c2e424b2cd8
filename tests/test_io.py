"""Catalog-reader paths: flux columns, lum columns, dust join, cuts."""

import numpy as np
import pytest

from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.utils.io import read_catalog, read_ascii_table


def _write_catalog(path, line="OIII", kind="flux", n=30, seed=0):
    rng = np.random.default_rng(seed)
    fields = rng.choice(["AEGIS", "COSMOS", "UDS"], n)
    ids = np.arange(1, n + 1)
    z = rng.uniform(1.2, 1.9, n)
    with open(path, "w") as fh:
        if kind == "flux":
            fh.write(f"Field ID z {line}_flux {line}_flux_e\n")
            flux = rng.uniform(1.0, 40.0, n)   # 1e-17 units
            for i in range(n):
                fh.write(f"{fields[i]} {ids[i]} {z[i]:.4f} "
                         f"{flux[i]:.4f} {0.1 * flux[i]:.4f}\n")
            return fields, ids, z, flux
        else:
            fh.write(f"Field ID z {line}_lum {line}_lum_e\n")
            lum = rng.uniform(41.5, 43.5, n)
            for i in range(n):
                fh.write(f"{fields[i]} {ids[i]} {z[i]:.4f} "
                         f"{lum[i]:.4f} 0.05\n")
            return fields, ids, z, lum


@pytest.mark.quick
def test_flux_catalog_with_completeness_cut(tmp_path):
    p = str(tmp_path / "cat.dat")
    fields, ids, z, flux = _write_catalog(p, kind="flux")
    cfg = LFConfig(min_comp_frac=0.5, Flim=(2.72, 3.61, 2.55))
    out = read_catalog(p, cfg)
    assert set(out["field_names"]) == {"AEGIS", "COSMOS", "UDS"}
    # every kept source is above its field's completeness root
    assert len(out["z"]) <= len(z)
    assert len(out["z"]) == len(out["flux"]) == len(out["field_id"])
    assert out["flux_e"] is not None
    # sources are grouped by field (reference concatenation order)
    assert np.all(np.diff(out["field_id"]) >= 0)


def test_more_fields_than_config_raises_clearly(tmp_path):
    """A 3-field catalog on a 2-entry config must produce one descriptive
    ValueError up front, not an IndexError from the per-field root
    indexing (and not only when min_comp_frac triggers the root solve)."""
    p = str(tmp_path / "cat.dat")
    _write_catalog(p, kind="flux")  # AEGIS/COSMOS/UDS
    for mcf in (0.5, 0.0):
        cfg = LFConfig(min_comp_frac=mcf, Flim=(2.72, 3.61),
                       Omega_0=(1e5, 1e5))
        with pytest.raises(ValueError, match="3 unique fields"):
            read_catalog(p, cfg)


def test_lum_catalog_reads_real_lum_e(tmp_path):
    """The reference re-read {line}_lum for the _lum_e column
    (run_lumfuncmcmc.py:192) — we read the actual error column."""
    p = str(tmp_path / "cat.dat")
    _write_catalog(p, kind="lum")
    cfg = LFConfig(min_comp_frac=0.0, Flim=(2.72, 3.61, 2.55))
    out = read_catalog(p, cfg)
    assert out["lum"] is not None and out["lum_e"] is not None
    np.testing.assert_allclose(out["lum_e"], 0.05)
    assert not np.allclose(out["lum"], out["lum_e"])  # bug would equate


def test_dust_join(tmp_path):
    p = str(tmp_path / "cat.dat")
    fields, ids, z, flux = _write_catalog(p, kind="flux", n=12)
    dust = tmp_path / "dust.dat"
    with open(dust, "w") as fh:
        fh.write("Field ID E(B-V) E(B-V)err SFR100 SFR100err\n")
        for f, i in zip(fields, ids):
            fh.write(f"{f} {i} 0.30 0.05 {float(i):.2f} 0.10\n")
    cfg = LFConfig(min_comp_frac=0.0, Flim=(2.72, 3.61, 2.55),
                   line_name="OIII")
    out = read_catalog(p, cfg, dust_fn=str(dust))
    n = len(out["z"])
    assert out["AHa"].shape == (n,)
    # OIII coefficient 2.07*3.46 (run_lumfuncmcmc.py:223)
    np.testing.assert_allclose(out["AHa"], 2.07 * 3.46 * 0.30)
    # join is on Field+ID: SFR equals the (selected) source id
    expect_ids = np.asarray([float(i) for f, i in zip(fields, ids)])
    np.testing.assert_allclose(out["SFR_MC"],
                               expect_ids[out["selected_rows"]])


def test_missing_line_column_raises(tmp_path):
    p = str(tmp_path / "cat.dat")
    _write_catalog(p, line="Ha", kind="flux")
    cfg = LFConfig(min_comp_frac=0.0, line_name="OIII",
                   Flim=(2.72, 3.61, 2.55))
    with pytest.raises(ValueError, match="OIII_flux"):
        read_catalog(p, cfg)


def test_read_ascii_plain_table(tmp_path):
    p = tmp_path / "t.dat"
    p.write_text("a b c\n1 2.5 x\n3 4.5 y\n")
    t = read_ascii_table(str(p))
    np.testing.assert_allclose(t["a"], [1, 3])
    assert list(t["c"]) == ["x", "y"]


def test_field_subset_matches_flim_by_name(tmp_path):
    """A catalog covering a SUBSET of the known survey fields must get
    each field's OWN flux limit, not the first entries positionally
    (COSMOS+UDS previously received AEGIS's and COSMOS's limits)."""
    from lumfuncmcmc_tpu.utils.io import align_field_params
    cfg = LFConfig(min_comp_frac=0.5)
    cfg2 = align_field_params(cfg, ["COSMOS", "UDS"])
    assert cfg2.Flim == (cfg.Flim[1], cfg.Flim[4])
    assert cfg2.Omega_0 == (cfg.Omega_0[1], cfg.Omega_0[4])
    assert cfg2.survey_fields == ("COSMOS", "UDS")
    # unknown names keep the positional truncation
    cfg3 = align_field_params(cfg, ["X", "Y", "Z"])
    assert cfg3.Flim == tuple(cfg.Flim[:3])
    # and the full known set in catalog (sorted) order is a no-op
    cfg4 = align_field_params(cfg, sorted(cfg.survey_fields))
    assert cfg4.Flim == cfg.Flim


def test_dust_join_missing_row_raises_clearly(tmp_path):
    p = str(tmp_path / "cat.dat")
    fields, ids, z, flux = _write_catalog(p, kind="flux")
    d = tmp_path / "dust.dat"
    # dust table missing every row except the first source
    d.write_text("Field ID E(B-V) E(B-V)err SFR100 SFR100err\n"
                 f"{fields[0]} {ids[0]} 0.1 0.01 1.0 0.1\n")
    cfg = LFConfig(min_comp_frac=0.0, Flim=(2.72, 3.61, 2.55))
    with pytest.raises(ValueError, match="no dust row"):
        read_catalog(p, cfg, dust_fn=str(d))


def test_zero_completeness_source_raises(tmp_path):
    """A source far below its field's F50 underflows the Fleming curve
    to exactly 0 — build_context must fail loudly instead of baking
    ln(0) = -inf into every likelihood (reachable with -mcf 0)."""
    import jax
    from lumfuncmcmc_tpu.models.context import build_context
    cfg = LFConfig(min_comp_frac=0.0, Flim=(2.72,), Omega_0=(1.0e6,),
                   survey_fields=("A",))
    z = np.array([1.3, 1.4, 1.5])
    flux = np.array([5.0, 6.0, 1.0e-3])       # last is ~3.4 dex faint
    with pytest.raises(ValueError, match="zero completeness"):
        build_context(cfg, z=z, flux=flux, flux_e=None,
                      field_id=np.zeros(3, dtype=np.int32))
