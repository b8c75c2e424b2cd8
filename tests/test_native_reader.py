"""Native C table parser: parity with the Python reader + fallbacks."""

import numpy as np
import pytest

from lumfuncmcmc_tpu.native import get_lib, read_table_fast
from lumfuncmcmc_tpu.utils.io import read_ascii_table

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C toolchain available")


def _python_reader(path):
    """The pure-Python path, bypassing the native fast path."""
    import lumfuncmcmc_tpu.utils.io as io_mod
    import lumfuncmcmc_tpu.native as native_mod
    orig = native_mod.read_table_fast
    native_mod.read_table_fast = lambda p: None
    try:
        return read_ascii_table(path)
    finally:
        native_mod.read_table_fast = orig


@pytest.mark.quick
def test_parity_with_python_reader(tmp_path):
    p = str(tmp_path / "cat.dat")
    rng = np.random.default_rng(0)
    fields = rng.choice(["AEGIS", "COSMOS", "UDS"], 200)
    with open(p, "w") as fh:
        fh.write("# a comment\nField ID z OIII_flux\n")
        for i in range(200):
            fh.write(f"{fields[i]} {i + 1} {rng.uniform(1, 2):.6f} "
                     f"{rng.uniform(1, 40):.6e}\n")
    fast = read_table_fast(p)
    slow = _python_reader(p)
    assert fast is not None
    assert set(fast) == set(slow)
    for k in slow:
        if slow[k].dtype.kind == "f":
            np.testing.assert_allclose(fast[k], slow[k], rtol=0)
        else:
            assert list(fast[k]) == list(slow[k])


def test_read_ascii_table_uses_fast_path(tmp_path):
    p = str(tmp_path / "t.dat")
    p2 = str(tmp_path / "t2.dat")
    for path in (p, p2):
        with open(path, "w") as fh:
            fh.write("a b\n1 x\n2 y\n")
    out = read_ascii_table(p)
    ref = _python_reader(p2)
    assert list(out) == list(ref)
    np.testing.assert_allclose(out["a"], ref["a"])
    assert list(out["b"]) == ["x", "y"]


def test_mixed_type_column_falls_back(tmp_path):
    """A column that starts numeric then goes string must come out with
    Python-reader semantics (all strings), via the fallback."""
    p = str(tmp_path / "m.dat")
    with open(p, "w") as fh:
        fh.write("a b\n1 2\n1 oops\n")
    assert read_table_fast(p) is None  # C parser declines cleanly
    out = read_ascii_table(p)
    assert out["b"].dtype.kind in "UO"
    assert list(out["b"]) == ["2", "oops"]


def test_header_only_table_declined(tmp_path):
    """Header with no data rows: column types are undecided on the C
    side — must defer to the Python reader (which yields empty float
    columns), not memcpy from unallocated buffers."""
    p = str(tmp_path / "h.dat")
    with open(p, "w") as fh:
        fh.write("a b\n# just a comment\n")
    assert read_table_fast(p) is None
    out = read_ascii_table(p)
    assert len(out["a"]) == 0


def test_ragged_row_declined(tmp_path):
    p = str(tmp_path / "r.dat")
    with open(p, "w") as fh:
        fh.write("a b\n1 2\n3\n")
    assert read_table_fast(p) is None
    with pytest.raises(ValueError):
        read_ascii_table(p)


def test_fixed_width_goes_to_python_reader(tmp_path):
    from lumfuncmcmc_tpu.utils.io import write_fixed_width_two_line
    p = str(tmp_path / "fw.dat")
    write_fixed_width_two_line(p, {"$\\log L_*$": [1.5, 2.5],
                                   "Ln Prob": [-3.0, -4.0]})
    out = read_ascii_table(p)
    np.testing.assert_allclose(out["$\\log L_*$"], [1.5, 2.5])


def test_catalog_pipeline_through_fast_reader(tmp_path):
    """read_catalog end to end over the native parser."""
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.utils.io import read_catalog
    p = str(tmp_path / "cat.dat")
    rng = np.random.default_rng(3)
    with open(p, "w") as fh:
        fh.write("Field ID z OIII_flux OIII_flux_e\n")
        for i in range(120):
            f = ["AEGIS", "COSMOS"][i % 2]
            fh.write(f"{f} {i} {rng.uniform(1.2, 1.9):.5f} "
                     f"{rng.uniform(1, 40):.5f} 0.5\n")
    cfg = LFConfig(min_comp_frac=0.5, Flim=(2.72, 3.61),
                   Omega_0=(1e5, 1e5))
    out = read_catalog(p, cfg)
    assert set(out["field_names"]) == {"AEGIS", "COSMOS"}
    assert len(out["z"]) == len(out["flux"]) > 0
