"""ctypes loader for the native host toolkit (sputnik_native.cc).

Builds ``_sputnik_native.so`` with g++ on first use (cached next to the
source); every entry point has a pure-numpy fallback so the package works
without a toolchain. See the .cc for the reference-parity notes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "row_indices",
    "transpose_metadata",
    "csr_to_bsr",
    "pack_rows",
    "read_smtx",
    "sorted_row_swizzle",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sputnik_native.cc")
_SO = os.path.join(_DIR, "_sputnik_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.sputnik_row_indices.argtypes = [_i32p, ctypes.c_int64, _i32p]
        lib.sputnik_transpose_metadata.argtypes = [
            _i32p, _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _i32p, _i32p, _i32p,
        ]
        lib.sputnik_csr_to_bsr_count.restype = ctypes.c_int64
        lib.sputnik_csr_to_bsr_count.argtypes = [
            _i32p, _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, _i32p,
        ]
        lib.sputnik_csr_to_bsr_fill.argtypes = [
            _i32p, _i32p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, _i32p, _i32p, _i32p, _f32p,
        ]
        lib.sputnik_read_smtx_header.restype = ctypes.c_int
        lib.sputnik_read_smtx_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sputnik_read_smtx.restype = ctypes.c_int
        lib.sputnik_read_smtx.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, _i32p, _i32p,
        ]
        lib.sputnik_sorted_row_swizzle.argtypes = [_i32p, ctypes.c_int64, _i32p]
        lib.sputnik_pack_rows.restype = ctypes.c_int64
        lib.sputnik_pack_rows.argtypes = [
            _i32p, _i32p, ctypes.c_int64, ctypes.c_int32, _i32p, _i32p, _i32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def row_indices(offsets: np.ndarray) -> np.ndarray:
    offsets = np.ascontiguousarray(offsets, np.int32)
    n_rows = len(offsets) - 1
    nnz = int(offsets[-1])
    lib = _load()
    out = np.empty(nnz, np.int32)
    if lib is not None:
        lib.sputnik_row_indices(offsets, n_rows, out)
        return out
    return (np.searchsorted(offsets, np.arange(nnz), side="right") - 1).astype(np.int32)


def transpose_metadata(
    offsets: np.ndarray, indices: np.ndarray, n_cols: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    offsets = np.ascontiguousarray(offsets, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    n_rows = len(offsets) - 1
    nnz = len(indices)
    lib = _load()
    offsets_t = np.empty(n_cols + 1, np.int32)
    indices_t = np.empty(nnz, np.int32)
    positions = np.empty(nnz, np.int32)
    if lib is not None:
        lib.sputnik_transpose_metadata(
            offsets, indices, n_rows, n_cols, nnz, offsets_t, indices_t, positions
        )
        return offsets_t, indices_t, positions
    rows = row_indices(offsets)
    order = np.argsort(indices, kind="stable").astype(np.int32)
    counts = np.bincount(indices, minlength=n_cols)
    return (
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32),
        rows[order],
        order,
    )


def csr_to_bsr(
    offsets: np.ndarray,
    indices: np.ndarray,
    values: Optional[np.ndarray],
    shape: Tuple[int, int],
    block: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Element-granular CSR -> BSR (offsets, indices, data). Zero elements
    inside touched blocks stay zero (the blocking densifies per block)."""
    rows, cols = shape
    offsets = np.ascontiguousarray(offsets, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    if rows % block or cols % block:
        raise ValueError(f"shape {shape} not divisible by block {block}")
    lib = _load()
    nbr = rows // block
    if lib is not None:
        counts = np.empty(nbr, np.int32)
        total = lib.sputnik_csr_to_bsr_count(offsets, indices, rows, cols, block, counts)
        bsr_offsets = np.empty(nbr + 1, np.int32)
        bsr_indices = np.empty(total, np.int32)
        data = np.zeros((total, block, block), np.float32)
        v = np.ascontiguousarray(values, np.float32) if values is not None else None
        lib.sputnik_csr_to_bsr_fill(
            offsets, indices,
            v.ctypes.data_as(ctypes.c_void_p) if v is not None else None,
            rows, cols, block, counts, bsr_offsets, bsr_indices,
            data.reshape(-1, block),
        )
        return bsr_offsets, bsr_indices, data
    # numpy fallback
    rid = row_indices(offsets)
    br = rid // block
    bc = indices // block
    keys = br.astype(np.int64) * (cols // block) + bc
    uniq, inv = np.unique(keys, return_inverse=True)
    total = len(uniq)
    bsr_indices = (uniq % (cols // block)).astype(np.int32)
    ubr = (uniq // (cols // block)).astype(np.int32)
    bsr_offsets = np.zeros(nbr + 1, np.int32)
    np.add.at(bsr_offsets[1:], ubr, 1)
    bsr_offsets = np.cumsum(bsr_offsets).astype(np.int32)
    data = np.zeros((total, block, block), np.float32)
    if values is not None:
        data[inv, rid % block, indices % block] = values
    return bsr_offsets, bsr_indices, data


def read_smtx(path: str) -> Tuple[Tuple[int, int], np.ndarray, np.ndarray]:
    """Read a DLMC .smtx topology file -> (shape, offsets, indices)."""
    lib = _load()
    if lib is not None:
        r = ctypes.c_int64()
        c = ctypes.c_int64()
        n = ctypes.c_int64()
        rc = lib.sputnik_read_smtx_header(path.encode(), r, c, n)
        if rc != 0:
            raise IOError(f"failed to read {path}: rc={rc}")
        offsets = np.empty(r.value + 1, np.int32)
        indices = np.empty(n.value, np.int32)
        rc = lib.sputnik_read_smtx(path.encode(), r.value, n.value, offsets, indices)
        if rc != 0:
            raise IOError(f"failed to parse {path}: rc={rc}")
        return (r.value, c.value), offsets, indices
    with open(path) as f:
        header = f.readline().replace(",", " ").split()
        rows, cols, nnz = (int(x) for x in header[:3])
        rest = f.read().split()
    offsets = np.asarray(rest[: rows + 1], np.int32)
    indices = np.asarray(rest[rows + 1 : rows + 1 + nnz], np.int32)
    return (rows, cols), offsets, indices


def sorted_row_swizzle(offsets: np.ndarray) -> np.ndarray:
    offsets = np.ascontiguousarray(offsets, np.int32)
    n_rows = len(offsets) - 1
    lib = _load()
    if lib is not None:
        out = np.empty(n_rows, np.int32)
        lib.sputnik_sorted_row_swizzle(offsets, n_rows, out)
        return out
    lens = offsets[1:] - offsets[:-1]
    return np.argsort(-lens, kind="stable").astype(np.int32)


def pack_rows(
    offsets: np.ndarray, indices: np.ndarray, pack: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Pack each row's nonzeros into ceil(count/pack) fixed-width steps.

    Returns ``(rows, cols, src, n_steps)``: per-step row ids, per-slot
    column ids (padding slots repeat 0), and the packed step-major slot of
    every nonzero — the shared host planner for the packed-output kernels
    (``bsr_sdd.plan_sdd_bres``, ``bsr_small.plan_sdd_smallblock``)."""
    offsets = np.ascontiguousarray(offsets, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    n_rows = len(offsets) - 1
    nnz = int(offsets[-1])
    counts = offsets[1:].astype(np.int64) - offsets[:-1]
    spr = -(-counts // pack)  # steps per row
    n_steps = int(spr.sum())
    lib = _load()
    if lib is not None:
        rows = np.empty((n_steps,), np.int32)
        cols = np.empty((n_steps * pack,), np.int32)
        src = np.zeros((max(nnz, 1),), np.int32)
        got = lib.sputnik_pack_rows(offsets, indices, n_rows, pack,
                                    rows, cols, src)
        assert got == n_steps, (got, n_steps)
        return rows, cols, src[:nnz], n_steps
    # Vectorized numpy fallback (no Python-per-row loop).
    if n_steps == 0:
        z = np.zeros((0,), np.int32)
        return z, z, np.zeros((nnz,), np.int32), 0
    rows = np.repeat(np.arange(n_rows, dtype=np.int32), spr)
    row_first_step = np.concatenate([[0], np.cumsum(spr)])
    step_in_row = np.arange(n_steps, dtype=np.int64) - np.repeat(
        row_first_step[:-1], spr
    )
    step_lo = np.repeat(offsets[:-1].astype(np.int64), spr) + step_in_row * pack
    pos = step_lo[:, None] + np.arange(pack, dtype=np.int64)
    hi = np.repeat(offsets[1:].astype(np.int64), spr)[:, None]
    valid = pos < hi
    pos_c = np.minimum(pos, max(nnz - 1, 0))
    cols = np.where(valid, indices[pos_c], 0).astype(np.int32).reshape(-1)
    slots = np.arange(n_steps, dtype=np.int64)[:, None] * pack + np.arange(pack)
    src = np.zeros((nnz,), np.int32)
    src[pos[valid]] = slots[valid].astype(np.int32)
    return rows, cols, src, n_steps
