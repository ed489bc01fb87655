"""Storm extensive-form convergence lab (round-5 item 1).

Solves a small-S storm EF with the structured PDHG solver and compares
against an exact sparse HiGHS solve: reported ef_err vs TRUE relative
objective error, per-block residual decomposition, and A/B of candidate
preconditioning changes. CPU f64 by default for a fast, precision-clean
iteration loop.

Usage: python tools/debug_storm_ef.py [S] [tol] [max_iters]
"""
import sys
import time

import numpy as np
import scipy.sparse as sp
import scipy.optimize

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from sqlp_tpu.config import PDHGConfig  # noqa: E402
from sqlp_tpu.models.instance import load_instance  # noqa: E402
from sqlp_tpu.models.scenario import sample_deltas  # noqa: E402
from sqlp_tpu.models.crash import solve_extensive_form  # noqa: E402
from sqlp_tpu.sd.algorithm import _scenario_rhs  # noqa: E402


def exact_ef(inst, deltas, probs):
    """Sparse HiGHS f64 extensive form (exact reference)."""
    a = inst.arrays
    S = deltas.shape[0]
    c = np.asarray(a.c, np.float64)
    q = np.asarray(a.q, np.float64)
    A1 = sp.csr_matrix(np.asarray(a.A1, np.float64))
    b1 = np.asarray(a.b1, np.float64)
    s1 = np.asarray(a.senses1)
    T = sp.csr_matrix(np.asarray(a.T, np.float64))
    W = sp.csr_matrix(np.asarray(a.W, np.float64))
    s2 = np.asarray(a.senses2)
    n1, n2 = c.shape[0], q.shape[0]
    m1, m2 = b1.shape[0], np.asarray(a.r).shape[0]
    r_s = np.asarray(_scenario_rhs(a, inst.scenario_model,
                                   jnp.asarray(deltas),
                                   jnp.zeros(n1)), np.float64)   # [S, m2]
    p = np.asarray(probs, np.float64)

    obj = np.concatenate([c] + [p[s] * q for s in range(S)])
    # rows: eq and ub separately, sparse blocks
    blocks_eq, rhs_eq, blocks_ub, rhs_ub = [], [], [], []

    def add(Arow_x, Arow_y, yslot, rhs, sense):
        # build one sparse row over [x, y_0..y_{S-1}]
        cols = [Arow_x] + [None] * S
        if yslot is not None:
            cols[1 + yslot] = Arow_y
        mats = [m if m is not None else sp.csr_matrix((Arow_x.shape[0],
                                                       n2 if i else n1))
                for i, m in enumerate(cols)]
        row = sp.hstack(mats, format="csr")
        if sense == 0:
            blocks_eq.append(row)
            rhs_eq.append(rhs)
        elif sense == 1:
            blocks_ub.append(-row)
            rhs_ub.append(-rhs)
        else:
            blocks_ub.append(row)
            rhs_ub.append(rhs)

    for sense in (0, 1, -1):
        pass
    # stage-1 rows, grouped by sense for speed
    for sense_val in np.unique(s1):
        idx = np.flatnonzero(s1 == sense_val)
        add(A1[idx], None, None, b1[idx], int(sense_val))
    for s in range(S):
        for sense_val in np.unique(s2):
            idx = np.flatnonzero(s2 == sense_val)
            add(sp.hstack([T[idx]], format="csr"), W[idx], s,
                r_s[s, idx], int(sense_val))

    A_eq = sp.vstack(blocks_eq, format="csr") if blocks_eq else None
    b_eq = np.concatenate(rhs_eq) if rhs_eq else None
    A_ub = sp.vstack(blocks_ub, format="csr") if blocks_ub else None
    b_ub = np.concatenate(rhs_ub) if rhs_ub else None

    def box(lo, hi):
        return [(l if np.isfinite(l) else None,
                 h if np.isfinite(h) else None) for l, h in zip(lo, hi)]

    bounds = box(np.asarray(a.lb1, np.float64),
                 np.asarray(a.ub1, np.float64))
    bounds += box(np.asarray(a.lb2, np.float64),
                  np.asarray(a.ub2, np.float64)) * S
    t0 = time.time()
    res = scipy.optimize.linprog(obj, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq,
                                 b_eq=b_eq, bounds=bounds, method="highs")
    assert res.status == 0, res.message
    print(f"HiGHS exact EF: obj={res.fun:.6f} in {time.time()-t0:.1f}s")
    return float(res.fun), res


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    inst = load_instance("storm", dtype=jnp.float64)
    print(f"storm dims: n1={inst.n1} m1={np.asarray(inst.arrays.b1).shape[0]}"
          f" n2={inst.n2} m2={inst.m2}; S={S}")
    key = jax.random.PRNGKey(7)
    deltas = sample_deltas(key, inst.scenario_model, S)
    probs = jnp.full((S,), 1.0 / S, jnp.float64)

    v_exact, _ = exact_ef(inst, np.asarray(deltas), np.asarray(probs))

    cfg = PDHGConfig(tol=tol, max_iters=iters)
    t0 = time.time()
    x, obj, stats = solve_extensive_form(
        inst.arrays, inst.scenario_model, deltas, probs, cfg)
    obj = float(obj)
    wall = time.time() - t0
    rel = abs(obj - v_exact) / (1 + abs(v_exact))
    print(f"PDHG EF: obj={obj:.6f} err_reported={float(stats['ef_err']):.3e}"
          f" iters={int(stats['ef_iters'])} wall={wall:.1f}s")
    print(f"TRUE relative objective error: {rel:.3e} "
          f"(reported {float(stats['ef_err']):.3e})")


if __name__ == "__main__":
    main()
