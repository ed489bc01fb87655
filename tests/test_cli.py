"""CLI surface tests (python -m sqlp_tpu ...), in-process on CPU.

The reference's only 'CLI' is its copy-paste driver scripts
(test/instance_test/*.jl); here the argparse surface is a first-class
component (SURVEY §5.6) and gets its own regression coverage. These
run cli.main in-process (the conftest already forces the CPU backend),
capturing stdout.
"""

import contextlib
import io

import numpy as np
import pytest

from conftest import require_instance


def _run_cli(argv):
    from sqlp_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


@pytest.mark.slow
def test_cli_solve_smoke():
    require_instance("lands")
    rc, out = _run_cli([
        "solve", "lands", "--iters", "60",
        "--max-scenarios", "64", "--max-duals", "64", "--max-cuts", "16",
        "--eval-samples", "1000", "--seed", "1"])
    assert rc == 0
    assert "lb_est=" in out and "mc_ub=" in out
    ub = float(out.split("mc_ub=")[1].split()[0])
    assert abs(ub - 381.8533) < 10.0, out


@pytest.mark.slow
def test_cli_replications_certify():
    """--replications R --certify: the full certified-gap pipeline from
    the command line (compromise decision, EF dual certificates over
    fresh LHS streams, Student-t aggregation)."""
    require_instance("lands")
    rc, out = _run_cli([
        "solve", "lands", "--iters", "60", "--replications", "2",
        "--certify", "--certify-scenarios", "128",
        "--dtype", "float64", "--sub-tol", "1e-7", "--master-tol", "1e-8",
        "--max-scenarios", "64", "--max-duals", "64", "--max-cuts", "16",
        "--eval-samples", "2048", "--seed", "2"])
    assert rc == 0
    assert "lb_cert=" in out and "cert_gap=" in out, out
    lb_cert = float(out.split("lb_cert=")[1].split()[0])
    gap = float(out.split("cert_gap=")[1].split()[0])
    # lands optimum is 381.8533; the certified bound must respect it
    # (to the t-CI's coverage) and the gap must be small and positive
    assert lb_cert <= 381.8533 + 1.0, out
    assert -0.01 < gap < 0.15, out


@pytest.mark.slow
def test_cli_cut_refresh_flag():
    require_instance("lands")
    rc, out = _run_cli([
        "solve", "lands", "--iters", "40", "--cut-refresh", "8",
        "--max-scenarios", "64", "--max-duals", "64", "--max-cuts", "16",
        "--eval-samples", "500", "--seed", "3"])
    assert rc == 0
    ub = float(out.split("mc_ub=")[1].split()[0])
    assert np.isfinite(ub)


@pytest.mark.slow
def test_cli_sharpen_flag():
    """--sharpen-every injects host-exact duals at period boundaries and
    the run completes with a sane bound."""
    require_instance("lands")
    rc, out = _run_cli([
        "solve", "lands", "--iters", "80", "--sharpen-every", "40",
        "--max-scenarios", "64", "--max-duals", "64", "--max-cuts", "16",
        "--eval-samples", "500", "--seed", "2"])
    assert rc == 0
    assert "mc_ub=" in out


@pytest.mark.slow
def test_cli_target_gap():
    """--target-gap stops on a certified gap and emits the JSON record
    with time-to-certified-gap (certified-gap-aware stopping)."""
    import json

    require_instance("lands")
    rc, out = _run_cli([
        "solve", "lands", "--iters", "240", "--replications", "3",
        "--target-gap", "0.1", "--certify-every", "120",
        "--certify-scenarios", "512", "--eval-samples", "2000",
        "--max-scenarios", "256", "--max-duals", "128",
        "--max-cuts", "24", "--seed", "0"])
    assert rc == 0
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["cert_gap"] <= 0.1 and rec["stopped"]
    assert rec["time_to_certified_gap_s"] is not None
    assert rec["rounds"][0]["route"] in ("model", "polish")
