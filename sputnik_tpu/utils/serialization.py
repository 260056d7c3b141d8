"""Save / load sparse formats (npz — the formats are pure arrays + static
metadata, so serialization is trivial; the reference leaves this to the
caller, SURVEY.md §5 "checkpoint/resume: stateless library").

For training-state checkpoints (params pytrees containing sparse
matrices), these formats ARE pytrees: `orbax` / `flax` checkpointing works
on them directly. These helpers cover the standalone-matrix case (dataset
preprocessing, kernel benchmarking).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from sputnik_tpu.formats import BlockSparseMatrix, CsrMatrix, EllMatrix, SellMatrix

__all__ = ["save_matrix", "load_matrix"]

_KINDS = {
    "bsr": BlockSparseMatrix,
    "csr": CsrMatrix,
    "ell": EllMatrix,
    "sell": SellMatrix,
}


def save_matrix(path: str, m) -> None:
    """Serialize any sparse format to a single .npz file."""
    if isinstance(m, BlockSparseMatrix):
        kind, meta = "bsr", {"shape": m.shape, "block_size": m.block_size}
        arrays = {"data": m.data, "offsets": m.offsets, "indices": m.indices}
    elif isinstance(m, SellMatrix):
        kind = "sell"
        meta = {"shape": m.shape, "chunk": m.chunk, "pad_rows": m.pad_rows}
        arrays = {"values": m.values, "indices": m.indices}
        if m.tile_widths is not None:
            arrays["tile_widths"] = m.tile_widths
        if m.row_perm is not None:
            arrays["row_perm"] = m.row_perm
        if m.slot_counts is not None:
            arrays["slot_counts"] = m.slot_counts
    elif isinstance(m, CsrMatrix):
        kind, meta = "csr", {"shape": m.shape}
        arrays = {"values": m.values, "indices": m.indices, "offsets": m.offsets}
    elif isinstance(m, EllMatrix):
        kind, meta = "ell", {"shape": m.shape}
        arrays = {"values": m.values, "indices": m.indices, "row_nnz": m.row_nnz}
    else:
        raise TypeError(f"unsupported matrix type {type(m).__name__}")
    np.savez(
        path,
        __kind__=np.asarray(kind),
        __meta__=np.asarray(json.dumps(meta)),
        **{k: np.asarray(v) for k, v in arrays.items()},
    )


def load_matrix(path: str):
    """Load a matrix saved by :func:`save_matrix`."""
    with np.load(path, allow_pickle=False) as z:
        kind = str(z["__kind__"])
        meta = json.loads(str(z["__meta__"]))
        arrays = {k: jnp.asarray(z[k]) for k in z.files if not k.startswith("__")}
    shape = tuple(meta["shape"])
    if kind == "bsr":
        return BlockSparseMatrix.create(
            arrays["data"], arrays["offsets"], arrays["indices"], shape
        )
    if kind == "csr":
        return CsrMatrix.create(
            arrays["values"], arrays["indices"], arrays["offsets"], shape
        )
    if kind == "ell":
        return EllMatrix(
            values=arrays["values"],
            indices=arrays["indices"],
            row_nnz=arrays["row_nnz"],
            shape=shape,
        )
    if kind == "sell":
        return SellMatrix(
            values=arrays["values"],
            indices=arrays["indices"],
            shape=shape,
            chunk=meta["chunk"],
            pad_rows=meta["pad_rows"],
            tile_widths=arrays.get("tile_widths"),
            row_perm=arrays.get("row_perm"),
            slot_counts=arrays.get("slot_counts"),
        )
    raise ValueError(f"unknown kind {kind!r} in {path}")
