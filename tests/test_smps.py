"""SMPS parser golden tests.

Constants mirror the reference parser tests (test/smps_tests.jl:4-75):
lands tokenizer/rows/columns/nnz/rhs/bounds, tim periods, stage template
shapes, sto discrete values/probs, seeded sampling membership, and
instantiate error semantics.
"""

import os

import numpy as np
import pytest

from sqlp_tpu.models import (Position, read_cor, read_sto, read_tim,
                             get_smps_stage_template, instantiate,
                             sample_scenario)
from sqlp_tpu.models.smps_cor import (parse_bounds, parse_column_to_matrix,
                                      parse_rhs, parse_row_tokens,
                                      parse_unique_columns, tokenize_cor)


@pytest.fixture(scope="module")
def lands_paths(lands_dir):
    return {ext: os.path.join(lands_dir, f"lands.{ext}")
            for ext in ("cor", "tim", "sto")}


def test_tokenize_and_sections(lands_paths):
    with open(lands_paths["cor"]) as f:
        tokens = tokenize_cor(f.read())

    directions, row_names = parse_row_tokens(tokens["ROWS"])
    assert directions == list("NGLLLLLGGG")
    assert row_names == ["OBJ", "S1C1", "S1C2", "S2C1", "S2C2", "S2C3",
                         "S2C4", "S2C5", "S2C6", "S2C7"]

    col_names = parse_unique_columns(tokens["COLUMNS"])
    assert col_names == ["X1", "X2", "X3", "X4",
                         "Y11", "Y21", "Y31", "Y41",
                         "Y12", "Y22", "Y32", "Y42",
                         "Y13", "Y23", "Y33", "Y43"]

    M = parse_column_to_matrix(tokens["COLUMNS"], row_names, col_names)
    assert np.count_nonzero(M) == 52

    rhs = parse_rhs(tokens["RHS"], row_names)
    np.testing.assert_array_equal(
        rhs, [0.0, 12, 120, 0, 0, 0, 0, 0, 3, 2])

    lb, ub = parse_bounds(tokens["BOUNDS"], col_names)
    assert np.all(lb == 0.0)
    assert np.all(ub == np.inf)


def test_tim(lands_paths):
    tim = read_tim(lands_paths["tim"])
    assert tim.problem_name == "LandS"
    assert tim.periods[0].period_name == "TIME1"
    assert tim.periods[0].position == Position("X1", "OBJ")
    assert tim.periods[1].period_name == "TIME2"
    assert tim.periods[1].position == Position("Y11", "S2C1")


def test_stage_templates(lands_paths):
    cor = read_cor(lands_paths["cor"])
    tim = read_tim(lands_paths["tim"])

    sp1 = get_smps_stage_template(cor, tim, 1)
    assert sp1.n_cur == 4 and sp1.n_last == 0
    assert sp1.n_rows == 2
    np.testing.assert_array_equal(sp1.c, [10.0, 7.0, 16.0, 6.0])

    sp2 = get_smps_stage_template(cor, tim, 2)
    # reference counts 16 total vars in the stage-2 model (incl. 4 last-stage)
    assert sp2.n_cur + sp2.n_last == 16
    assert sp2.n_last == 4 and sp2.n_cur == 12
    assert sp2.n_rows == 7
    assert np.any(sp2.c != 0)


def test_sto(lands_paths):
    sto = read_sto(lands_paths["sto"])
    assert sto.problem_name == "LandS"
    pos = Position("RHS", "S2C5")
    assert sto.indep[pos].value == [3.0, 5.0, 7.0]
    assert sto.indep[pos].probability == [0.3, 0.4, 0.3]


def test_sampling_membership(lands_paths):
    sto = read_sto(lands_paths["sto"])
    rng = np.random.default_rng(1234)
    scenario = sample_scenario(rng, sto)
    assert scenario[0][1] in (3.0, 5.0, 7.0)


def test_instantiate(lands_paths):
    cor = read_cor(lands_paths["cor"])
    tim = read_tim(lands_paths["tim"])
    sp1 = get_smps_stage_template(cor, tim, 1)
    sp2 = get_smps_stage_template(cor, tim, 2)

    scenario = [(Position("RHS", "S2C5"), 4.0)]
    inst = instantiate(sp2, scenario)
    assert inst.rhs[inst.row_lookup["S2C5"]] == 4.0
    # original untouched (functional semantics)
    assert sp2.rhs[sp2.row_lookup["S2C5"]] == 0.0

    # invalid position raises AssertionError, smps_tests.jl:74-75
    with pytest.raises(AssertionError):
        instantiate(sp1, scenario)
