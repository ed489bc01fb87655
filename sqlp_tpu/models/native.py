"""ctypes loader for the native (C++) SMPS data loader.

The shared library builds from csrc/ (``make -C csrc``); if it is missing,
this module builds it on first use with g++ into csrc/ (cached). Set
``SQLP_TPU_NATIVE=0`` to force the pure-Python parsers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libsqlp_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _CSRC, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, or None when disabled/unavailable."""
    global _lib, _tried
    if os.environ.get("SQLP_TPU_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        stale = False
        if os.path.exists(_LIB_PATH):
            lib_mtime = os.path.getmtime(_LIB_PATH)
            stale = any(
                os.path.getmtime(os.path.join(_CSRC, f)) > lib_mtime
                for f in os.listdir(_CSRC)
                if f.endswith(".cpp") or f == "Makefile")
        if (not os.path.exists(_LIB_PATH) or stale) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.smps_cor_parse.restype = ctypes.c_void_p
        lib.smps_cor_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                       ctypes.c_int]
        lib.cor_n_rows.argtypes = [ctypes.c_void_p]
        lib.cor_n_cols.argtypes = [ctypes.c_void_p]
        lib.cor_nnz.restype = ctypes.c_long
        lib.cor_nnz.argtypes = [ctypes.c_void_p]
        lib.cor_names_size.restype = ctypes.c_long
        lib.cor_names_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.cor_names.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_char_p]
        lib.cor_directions.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.cor_fill_dense.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_double)] * 4
        lib.cor_free.argtypes = [ctypes.c_void_p]
        lib.smps_sto_parse.restype = ctypes.c_void_p
        lib.smps_sto_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                       ctypes.c_int]
        lib.sto_n_positions.argtypes = [ctypes.c_void_p]
        lib.sto_name_size.restype = ctypes.c_long
        lib.sto_name_size.argtypes = [ctypes.c_void_p]
        lib.sto_problem_name.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.sto_positions_size.restype = ctypes.c_long
        lib.sto_positions_size.argtypes = [ctypes.c_void_p]
        lib.sto_positions.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.sto_kinds.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int)]
        lib.sto_offsets.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_long)]
        lib.sto_total_outcomes.restype = ctypes.c_long
        lib.sto_total_outcomes.argtypes = [ctypes.c_void_p]
        lib.sto_params.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_double)] * 2
        lib.sto_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def read_cor_native(path: str):
    """Parse a cor file with the native parser; None if unavailable.

    Returns a CorData identical to the Python parser's output.
    """
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    from sqlp_tpu.models.smps_cor import CorData, lookup_table

    err = ctypes.create_string_buffer(512)
    h = lib.smps_cor_parse(path.encode(), err, len(err))
    if not h:
        raise AssertionError(err.value.decode() or f"native parse failed: {path}")
    try:
        nr = lib.cor_n_rows(h)
        nc = lib.cor_n_cols(h)

        def names(which):
            size = lib.cor_names_size(h, which)
            buf = ctypes.create_string_buffer(int(size))
            lib.cor_names(h, which, buf)
            return buf.value.decode()

        problem_name = names(0)
        row_names = names(1).split("\n")[:nr]
        col_names = names(2).split("\n")[:nc]
        dbuf = ctypes.create_string_buffer(nr)
        lib.cor_directions(h, dbuf)
        directions = [chr(b) for b in dbuf.raw[:nr]]

        M = np.empty((nr, nc), np.float64)
        rhs = np.empty(nr, np.float64)
        lb = np.empty(nc, np.float64)
        ub = np.empty(nc, np.float64)
        pd = ctypes.POINTER(ctypes.c_double)
        lib.cor_fill_dense(h, M.ctypes.data_as(pd), rhs.ctypes.data_as(pd),
                           lb.ctypes.data_as(pd), ub.ctypes.data_as(pd))
    finally:
        lib.cor_free(h)

    return CorData(
        problem_name=problem_name,
        directions=directions,
        row_names=row_names,
        col_names=col_names,
        template_matrix=M,
        rhs=rhs,
        lower_bound=lb,
        upper_bound=ub,
        col_mapping=lookup_table(col_names),
        row_mapping=lookup_table(row_names),
    )


def read_sto_native(path: str):
    """Parse a sto file with the native parser; None if unavailable.

    Returns a StoData identical to the Python parser's output
    (tests/test_native.py asserts the parity).
    """
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    from sqlp_tpu.models.smps_sto import (DiscreteDistribution,
                                          NormalDistribution, StoData,
                                          UniformDistribution)
    from sqlp_tpu.models.smps_tim import Position

    err = ctypes.create_string_buffer(512)
    h = lib.smps_sto_parse(path.encode(), err, len(err))
    if not h:
        raise AssertionError(err.value.decode() or f"native parse failed: {path}")
    try:
        np_ = lib.sto_n_positions(h)
        nbuf = ctypes.create_string_buffer(int(lib.sto_name_size(h)))
        lib.sto_problem_name(h, nbuf)
        pbuf = ctypes.create_string_buffer(int(lib.sto_positions_size(h)))
        lib.sto_positions(h, pbuf)
        pos_lines = pbuf.value.decode().split("\n")[:np_]
        kinds = np.empty(np_, np.int32)
        offsets = np.empty(np_ + 1, np.int64)
        lib.sto_kinds(h, kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        lib.sto_offsets(h, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        total = int(lib.sto_total_outcomes(h))
        a = np.empty(total, np.float64)
        b = np.empty(total, np.float64)
        pd = ctypes.POINTER(ctypes.c_double)
        lib.sto_params(h, a.ctypes.data_as(pd), b.ctypes.data_as(pd))
    finally:
        lib.sto_free(h)

    indep = {}
    for i, line in enumerate(pos_lines):
        col, row = line.split("\t")
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        if kinds[i] == 0:
            indep[Position(col, row)] = DiscreteDistribution(
                list(a[lo:hi]), list(b[lo:hi]))
        elif kinds[i] == 1:
            indep[Position(col, row)] = NormalDistribution(a[lo], b[lo])
        else:
            indep[Position(col, row)] = UniformDistribution(a[lo], b[lo])
    return StoData(problem_name=nbuf.value.decode(), indep=indep)
