"""Native (C++) SMPS parser parity with the pure-Python port of record."""

import numpy as np
import pytest

from sqlp_tpu.models.native import get_lib, read_cor_native, read_sto_native
from sqlp_tpu.models.smps_cor import read_cor_py
from sqlp_tpu.models.smps_sto import read_sto_py

from conftest import require_instance


@pytest.mark.parametrize("name", ["lands", "transship", "baa99-20",
                                  "storm", "ssn"])
def test_native_cor_parity(name):
    path = require_instance(name) + f"/{name}.cor"
    if get_lib() is None:
        pytest.skip("native library unavailable")
    a = read_cor_native(path)
    b = read_cor_py(path)
    assert a.problem_name == b.problem_name
    assert a.directions == b.directions
    assert a.row_names == b.row_names
    assert a.col_names == b.col_names
    np.testing.assert_array_equal(a.template_matrix, b.template_matrix)
    np.testing.assert_array_equal(a.rhs, b.rhs)
    np.testing.assert_array_equal(a.lower_bound, b.lower_bound)
    np.testing.assert_array_equal(a.upper_bound, b.upper_bound)
    assert a.row_mapping == b.row_mapping
    assert a.col_mapping == b.col_mapping


def test_native_rejects_bad_file(tmp_path):
    if get_lib() is None:
        pytest.skip("native library unavailable")
    p = tmp_path / "bad.cor"
    p.write_text("ROWS\n L  C1\nENDATA\n")  # first row not 'N'
    with pytest.raises(AssertionError):
        read_cor_native(str(p))


def test_native_rejects_malformed_values(tmp_path):
    """Truncated BOUNDS lines and non-numeric values fail cleanly.

    These paths previously read t[3] out of bounds / let std::stod throw
    through the C ABI (undefined behavior); they must return a parse
    error, never crash or corrupt the process.
    """
    if get_lib() is None:
        pytest.skip("native library unavailable")
    head = ("NAME T\nROWS\n N  OBJ\n L  C1\nCOLUMNS\n"
            "    X1  OBJ  1.0  C1  1.0\nRHS\n    R  C1  2.0\n")
    cases = [
        head + "BOUNDS\n LO BND  X1\nENDATA\n",       # missing value
        head + "BOUNDS\n UP BND  X1  abc\nENDATA\n",  # non-numeric bound
        ("NAME T\nROWS\n N  OBJ\nCOLUMNS\n"
         "    X1  OBJ  xyz\nENDATA\n"),               # non-numeric coeff
    ]
    for i, text in enumerate(cases):
        p = tmp_path / f"bad{i}.cor"
        p.write_text(text)
        with pytest.raises(AssertionError):
            read_cor_native(str(p))


@pytest.mark.parametrize("name", ["lands", "transship", "baa99-20",
                                  "storm", "ssn"])
def test_native_sto_parity(name):
    path = require_instance(name) + f"/{name}.sto"
    if get_lib() is None:
        pytest.skip("native library unavailable")
    a = read_sto_native(path)
    b = read_sto_py(path)
    assert a.problem_name == b.problem_name
    assert list(a.indep.keys()) == list(b.indep.keys())  # order preserved
    for pos in b.indep:
        assert a.indep[pos] == b.indep[pos], pos


def test_native_sto_continuous(tmp_path):
    """NORMAL/UNIFORM marginals and later-duplicate overwrite semantics."""
    if get_lib() is None:
        pytest.skip("native library unavailable")
    p = tmp_path / "t.sto"
    p.write_text(
        "STOCH  T\n"
        "INDEP  NORMAL\n"
        "    RHS    R1    4.0   2.0\n"
        "INDEP  UNIFORM\n"
        "    RHS    R2    1.0   3.0\n"
        "    RHS    R1    0.0   9.0\n"   # overwrites R1 as uniform
        "ENDATA\n")
    a = read_sto_native(str(p))
    b = read_sto_py(str(p))
    assert list(a.indep.keys()) == list(b.indep.keys())
    for pos in b.indep:
        assert a.indep[pos] == b.indep[pos], pos


def test_native_sto_rejects_bad_section(tmp_path):
    if get_lib() is None:
        pytest.skip("native library unavailable")
    p = tmp_path / "bad.sto"
    p.write_text("STOCH X\nBLOCKS DISCRETE\nENDATA\n")
    with pytest.raises(AssertionError):
        read_sto_native(str(p))
