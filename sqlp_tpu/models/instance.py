"""Instance: an SMPS two-stage problem compiled to dense device tensors.

The reference re-instantiates a JuMP model per scenario (``instantiate!``,
src/smps/smps_routines.jl:7-20) and re-extracts matrices per epigraph
(``extract_coefficients``, src/sd_algorithm/subprob.jl:15-69). Here the
instance is compiled exactly once, host-side, into dense blocks that live in
HBM for the whole solve:

    stage 1:  min c@x   s.t. A1 x {sense} b1,  lb1 <= x <= ub1
    stage 2:  min q@y   s.t. T x + W y {sense} r,  lb2 <= y <= ub2
    randomness: ScenarioModel (RHS and/or transfer-matrix positions)

Mirrors the reference warning when second-stage variables carry nontrivial
bounds, since the dual-based cut math assumes bound duals are trivial
(src/sd_algorithm/subprob.jl:17-27).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sqlp_tpu.models.smps_cor import CorData, read_cor
from sqlp_tpu.models.smps_sto import StoData, read_sto
from sqlp_tpu.models.smps_tim import TimData, read_tim
from sqlp_tpu.models.scenario import ScenarioModel, build_scenario_model
from sqlp_tpu.models.stage import (SENSE_G, SENSE_L, StageLP,
                                   get_smps_stage_template)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InstanceArrays:
    """Device-resident dense blocks of the two-stage problem."""

    # stage 1
    c: jax.Array        # [n1]
    A1: jax.Array       # [m1, n1]
    b1: jax.Array       # [m1]
    senses1: jax.Array  # [m1] int32 (+1 '>=', -1 '<=', 0 '==')
    lb1: jax.Array      # [n1]
    ub1: jax.Array      # [n1]
    # stage 2
    q: jax.Array        # [n2]
    W: jax.Array        # [m2, n2]
    T: jax.Array        # [m2, n1]
    r: jax.Array        # [m2]
    senses2: jax.Array  # [m2] int32
    lb2: jax.Array      # [n2]
    ub2: jax.Array      # [n2]


@dataclasses.dataclass(frozen=True)
class Instance:
    """A compiled two-stage SMPS instance (host metadata + device arrays)."""

    name: str
    cor: CorData
    tim: TimData
    sto: StoData
    sp1: StageLP
    sp2: StageLP
    arrays: InstanceArrays
    scenario_model: ScenarioModel

    @property
    def n1(self) -> int:
        return self.sp1.n_cur

    @property
    def n2(self) -> int:
        return self.sp2.n_cur

    @property
    def m1(self) -> int:
        return self.sp1.n_rows

    @property
    def m2(self) -> int:
        # row count of the COMPILED system: may exceed sp2.n_rows when
        # finite stage-2 bounds were folded into explicit rows
        return int(self.arrays.W.shape[0])

    @property
    def n_rv(self) -> int:
        return self.scenario_model.n_rv


def compile_instance(cor: CorData, tim: TimData, sto: StoData,
                     name: str = "", dtype=jnp.float32,
                     fold_bounds: bool = True) -> Instance:
    """Compile parsed SMPS data into dense device tensors.

    The reference only WARNS when stage-2 vars have nontrivial bounds
    (subprob.jl:17-27) and then generates invalid cuts anyway: its cut
    math reads constraint duals only, and a binding finite bound carries
    its multiplier on the bound, invisible to pi. Here (``fold_bounds``,
    default) each finite upper bound / finite nonzero lower bound is
    FOLDED into an explicit recourse row (e_j y <= ub_j / e_j y >= lb_j,
    appended after the template rows) with the box loosened so it can
    never bind — the multiplier then lands on the row, where every
    consumer of duals (SASA cuts, crossover, argmax) sees it. A free
    lower bound (-inf) has no dual and needs no row. All six reference
    instances have trivial stage-2 bounds, so folding is a no-op there
    (zero rows appended, arrays bitwise unchanged). ``fold_bounds=False``
    restores the reference's warn-and-hope behavior.
    """
    sp1 = get_smps_stage_template(cor, tim, 1)
    sp2 = get_smps_stage_template(cor, tim, 2)

    W2, T2, r2 = sp2.W, sp2.T, sp2.rhs
    senses2 = sp2.senses
    lb2, ub2 = sp2.lb.copy(), sp2.ub.copy()
    n2 = sp2.n_cur
    extra_rows = []            # (col j, rhs, sense)
    for j, vname in enumerate(sp2.cur_names):
        if np.isfinite(ub2[j]):
            if fold_bounds:
                extra_rows.append((j, ub2[j], SENSE_L))
                ub2[j] = np.inf
            else:
                warnings.warn(f"{vname} has non-trivial upper bound.")
        if lb2[j] != 0.0 and np.isfinite(lb2[j]):
            if fold_bounds:
                extra_rows.append((j, lb2[j], SENSE_G))
                # loosen the box so only the row can bind (a box tied at
                # the same value could take the multiplier instead)
                lb2[j] = 0.0 if lb2[j] > 0.0 else -np.inf
            else:
                warnings.warn(f"{vname} has non-trivial lower bound.")
    if extra_rows:
        n_x = len(extra_rows)
        Wb = np.zeros((n_x, n2), W2.dtype)
        for i, (j, _, _) in enumerate(extra_rows):
            Wb[i, j] = 1.0
        W2 = np.concatenate([W2, Wb], axis=0)
        T2 = np.concatenate([T2, np.zeros((n_x, T2.shape[1]), T2.dtype)],
                            axis=0)
        r2 = np.concatenate([r2, np.array([b for (_, b, _) in extra_rows],
                                          r2.dtype)])
        senses2 = np.concatenate(
            [senses2, np.array([s for (_, _, s) in extra_rows],
                               senses2.dtype)])

    f = lambda a: jnp.asarray(a, dtype=dtype)
    arrays = InstanceArrays(
        c=f(sp1.c), A1=f(sp1.W), b1=f(sp1.rhs),
        senses1=jnp.asarray(sp1.senses), lb1=f(sp1.lb), ub1=f(sp1.ub),
        q=f(sp2.c), W=f(W2), T=f(T2), r=f(r2),
        senses2=jnp.asarray(senses2), lb2=f(lb2), ub2=f(ub2),
    )
    model = build_scenario_model(sto, sp2, dtype=dtype,
                                 dual_system=(W2, r2, senses2))
    return Instance(name=name or cor.problem_name, cor=cor, tim=tim, sto=sto,
                    sp1=sp1, sp2=sp2, arrays=arrays, scenario_model=model)


# Search path for SMPS instance directories. The reference repo ships its
# instances under spInput/ (SURVEY.md C20); we resolve from (in order) the
# SQLP_TPU_SPINPUT env var, the repo-local instances/ dir (generated
# fixtures), and the read-only reference mount.
_DEFAULT_SEARCH = (
    os.environ.get("SQLP_TPU_SPINPUT", ""),
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "instances"),
    "/root/reference/spInput",
)


def find_instance_dir(name: str) -> Optional[str]:
    for root in _DEFAULT_SEARCH:
        if not root:
            continue
        path = os.path.join(root, name)
        if os.path.isfile(os.path.join(path, f"{name}.cor")):
            return path
    return None


def load_instance(name_or_dir: str, dtype=jnp.float32,
                  fold_bounds: bool = True) -> Instance:
    """Load an SMPS instance by name (searched) or by directory path."""
    if os.path.isdir(name_or_dir):
        path = name_or_dir
        name = os.path.basename(os.path.normpath(path))
    else:
        name = name_or_dir
        found = find_instance_dir(name)
        if found is None:
            raise FileNotFoundError(
                f"SMPS instance {name!r} not found under any of "
                f"{[p for p in _DEFAULT_SEARCH if p]}")
        path = found
    cor = read_cor(os.path.join(path, f"{name}.cor"))
    tim = read_tim(os.path.join(path, f"{name}.tim"))
    sto = read_sto(os.path.join(path, f"{name}.sto"))
    return compile_instance(cor, tim, sto, name=name, dtype=dtype,
                            fold_bounds=fold_bounds)


def load_proposal(inst: Instance, sto_path: str,
                  dtype=None) -> ScenarioModel:
    """Compile an alternate .sto file as an importance-sampling PROPOSAL
    over the instance's stage-2 template.

    The proposal must cover the same random positions (row/col) as the
    instance's own stochastic model — the density ratio
    p_target / p_proposal is only defined position-by-position. Used by
    ``sd_step(proposal=...)`` / ``SDSolver(proposal=...)`` (the
    importance-sampling workflow the reference scopes out as TODO items
    5/8, readme.md:24-30).
    """
    sto = read_sto(sto_path)
    model = build_scenario_model(sto, inst.sp2,
                                 dtype=dtype or inst.arrays.r.dtype)
    tgt = inst.scenario_model
    if (model.n_rv != tgt.n_rv
            or not np.array_equal(np.asarray(model.rv_row),
                                  np.asarray(tgt.rv_row))
            or not np.array_equal(np.asarray(model.rv_is_rhs),
                                  np.asarray(tgt.rv_is_rhs))
            or not np.array_equal(np.asarray(model.rv_col),
                                  np.asarray(tgt.rv_col))
            or not np.array_equal(np.asarray(model.rv_is_cost),
                                  np.asarray(tgt.rv_is_cost))
            or not np.array_equal(np.asarray(model.rv_ycol),
                                  np.asarray(tgt.rv_ycol))):
        raise ValueError(
            f"proposal {sto_path} does not cover the same random "
            f"positions as instance {inst.name}'s sto file")
    return model
