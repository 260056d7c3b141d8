"""Custom VJPs for the six BSR matmuls.

The reference is inference-only kernels; MegaBlocks does backprop by calling
them with swapped layouts/transposes (weight-grad = DSD TN, etc. — SURVEY.md
section 3.2's "weight-gradient shape"). Here the same closure is wired into
JAX autodiff: **the six ops close under differentiation**:

    dsd:  dA = sdd(g, B, topo_A)            dB = dsd(A^T, g) / dds(g^T, A)
    dds:  dA = dds(g, B^T)                  dB = sdd(A, g, topo_B)
    sdd:  dA = dsd(g_s, B^T)                dB = dds(A^T, g_s)
    ssd:  dA = ssd(g_s, B^T, topo_A)        dB = dss(A^T, g_s)
    sds:  dA = dss(g_s, B^T)                dB = sds(A^T, g_s, topo_B)
    dss:  dA = ssd(g, B^T, topo_A)          dB = sds(A^T, g, topo_B)

so every backward pass stays sparse — no densification anywhere.

Sparse cotangents: a ``BlockSparseMatrix`` input's cotangent is the same
pytree with gradient block values and float0 metadata (JAX's convention for
integer leaves); sparse outputs receive cotangents whose metadata we restore
from the primal topology before feeding them back through the ops.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sputnik_tpu.formats import BlockSparseMatrix

__all__ = ["make_differentiable", "grad", "value_and_grad"]


def grad(fun, argnums=0, has_aux=False, **kw):
    """``jax.grad`` that accepts sparse-matrix pytree inputs.

    A :class:`BlockSparseMatrix` carries int32 metadata leaves, which plain
    ``jax.grad`` rejects; this sets ``allow_int=True`` so cotangents come
    back as the same pytree with gradient ``data`` and float0 metadata.
    """
    return jax.grad(fun, argnums=argnums, has_aux=has_aux, allow_int=True, **kw)


def value_and_grad(fun, argnums=0, has_aux=False, **kw):
    """Sparse-aware ``jax.value_and_grad`` (see :func:`grad`)."""
    return jax.value_and_grad(
        fun, argnums=argnums, has_aux=has_aux, allow_int=True, **kw
    )


def _float0(x):
    if x is None:
        return None
    return np.zeros(x.shape, jax.dtypes.float0)


def _bsr_cotangent(primal: BlockSparseMatrix, data_grad) -> BlockSparseMatrix:
    """Cotangent pytree for a BSR primal: grad in data, float0 metadata."""
    return dataclasses.replace(
        primal,
        data=data_grad.astype(primal.data.dtype),
        offsets=_float0(primal.offsets),
        indices=_float0(primal.indices),
        row_indices=_float0(primal.row_indices),
        offsets_t=_float0(primal.offsets_t),
        indices_t=_float0(primal.indices_t),
        block_offsets=_float0(primal.block_offsets),
    )


def _bsr_zero_cotangent(primal: BlockSparseMatrix) -> BlockSparseMatrix:
    return _bsr_cotangent(primal, jnp.zeros_like(primal.data))


def _restore(g: BlockSparseMatrix, topo: BlockSparseMatrix) -> BlockSparseMatrix:
    """Rebuild a usable BSR from a sparse cotangent (float0 metadata) by
    grafting the primal topology's metadata around the gradient data."""
    return topo.with_data(g.data.astype(topo.data.dtype))


def make_differentiable(ops_module):
    """Wrap the dispatching matmuls from ``ops_module`` (sputnik_tpu.ops.
    matmul) with custom VJPs. Returns dict of differentiable fns."""

    raw_dsd = ops_module.matmul_dsd
    raw_dds = ops_module.matmul_dds
    raw_sdd = ops_module.matmul_sdd
    raw_ssd = ops_module.matmul_ssd
    raw_sds = ops_module.matmul_sds
    raw_dss = ops_module.matmul_dss

    # ---------------- dsd ----------------
    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
    def dsd(a, b, ta, tb, opts):
        return raw_dsd(a, b, transpose_a=ta, transpose_b=tb, **dict(opts))

    def dsd_fwd(a, b, ta, tb, opts):
        return dsd(a, b, ta, tb, opts), (a, b)

    def dsd_bwd(ta, tb, opts, res, g):
        a, b = res
        # d op(A)[m, k] = sum_n g[m, n] op(B)[k, n]  (masked to A's topology)
        if not ta:
            da = raw_sdd(g, b, a, transpose_a=False, transpose_b=not tb)
        else:
            # stored A is (K, M): dA = op(B) @ g^T
            da = raw_sdd(b, g, a, transpose_a=tb, transpose_b=True)
        # d op(B)[k, n] = sum_m op(A)[m, k] g[m, n]
        if not tb:
            db = raw_dsd(a, g, transpose_a=not ta, transpose_b=False, out_dtype=b.dtype)
        else:
            # stored B is (N, K): dB = g^T @ op(A) -> dds
            db = raw_dds(g, a, transpose_a=True, transpose_b=ta, out_dtype=b.dtype)
        return _bsr_cotangent(a, da.data), db

    dsd.defvjp(dsd_fwd, dsd_bwd)

    # ---------------- dds ----------------
    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
    def dds(a, b, ta, tb, opts):
        return raw_dds(a, b, transpose_a=ta, transpose_b=tb, **dict(opts))

    def dds_fwd(a, b, ta, tb, opts):
        return dds(a, b, ta, tb, opts), (a, b)

    def dds_bwd(ta, tb, opts, res, g):
        a, b = res
        # d op(A)[m, k] = sum_n g[m, n] op(B)[k, n]
        if not ta:
            da = raw_dds(g, b, transpose_a=False, transpose_b=not tb, out_dtype=a.dtype)
        else:
            da = raw_dsd(b, g, transpose_a=tb, transpose_b=True, out_dtype=a.dtype)
        # d op(B)[k, n] = sum_m op(A)[m, k] g[m, n]  (masked to B's topology)
        if not tb:
            db = raw_sdd(a, g, b, transpose_a=not ta, transpose_b=False)
        else:
            db = raw_sdd(g, a, b, transpose_a=True, transpose_b=ta)
        return da, _bsr_cotangent(b, db.data)

    dds.defvjp(dds_fwd, dds_bwd)

    # ---------------- sdd ----------------
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
    def sdd(a, b, topology, ta, tb, opts):
        return raw_sdd(a, b, topology, transpose_a=ta, transpose_b=tb, **dict(opts))

    def sdd_fwd(a, b, topology, ta, tb, opts):
        return sdd(a, b, topology, ta, tb, opts), (a, b, topology)

    def sdd_bwd(ta, tb, opts, res, g):
        a, b, topology = res
        gs = _restore(g, topology)
        # d op(A) = g_s @ op(B)^T  (g_s sparse => DSD / DDS)
        if not ta:
            da = raw_dsd(gs, b, transpose_a=False, transpose_b=not tb, out_dtype=a.dtype)
        else:
            da = raw_dds(b, gs, transpose_a=tb, transpose_b=True, out_dtype=a.dtype)
        if not tb:
            db = raw_dds(a, gs, transpose_a=not ta, transpose_b=False, out_dtype=b.dtype)
        else:
            db = raw_dsd(gs, a, transpose_a=True, transpose_b=ta, out_dtype=b.dtype)
        return da, db, _bsr_zero_cotangent(topology)

    sdd.defvjp(sdd_fwd, sdd_bwd)

    # ---------------- ssd ----------------
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
    def ssd(a, b, topology, ta, tb, opts):
        return raw_ssd(a, b, topology, transpose_a=ta, transpose_b=tb, **dict(opts))

    def ssd_fwd(a, b, topology, ta, tb, opts):
        return ssd(a, b, topology, ta, tb, opts), (a, b, topology)

    def ssd_bwd(ta, tb, opts, res, g):
        a, b, topology = res
        gs = _restore(g, topology)
        # d op(A) = g_s @ op(B)^T masked to A topology -> SSD
        if not ta:
            da = raw_ssd(gs, b, a, transpose_a=False, transpose_b=not tb)
        else:
            da = raw_sds(b, gs, a, transpose_a=tb, transpose_b=True)
        # d op(B) = op(A)^T @ g_s -> DSS (sparse x sparse)
        if not tb:
            db = raw_dss(a, gs, transpose_a=not ta, transpose_b=False, out_dtype=b.dtype)
        else:
            db = raw_dss(gs, a, transpose_a=True, transpose_b=ta, out_dtype=b.dtype)
        return _bsr_cotangent(a, da.data), db, _bsr_zero_cotangent(topology)

    ssd.defvjp(ssd_fwd, ssd_bwd)

    # ---------------- sds ----------------
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
    def sds(a, b, topology, ta, tb, opts):
        return raw_sds(a, b, topology, transpose_a=ta, transpose_b=tb, **dict(opts))

    def sds_fwd(a, b, topology, ta, tb, opts):
        return sds(a, b, topology, ta, tb, opts), (a, b, topology)

    def sds_bwd(ta, tb, opts, res, g):
        a, b, topology = res
        gs = _restore(g, topology)
        # d op(A) = g_s @ op(B)^T -> DSS
        if not ta:
            da = raw_dss(gs, b, transpose_a=False, transpose_b=not tb, out_dtype=a.dtype)
        else:
            da = raw_dss(b, gs, transpose_a=tb, transpose_b=True, out_dtype=a.dtype)
        # d op(B) = op(A)^T @ g_s masked to B topology -> SDS / SSD
        if not tb:
            db = raw_sds(a, gs, b, transpose_a=not ta, transpose_b=False)
        else:
            db = raw_ssd(gs, a, b, transpose_a=True, transpose_b=ta)
        return da, _bsr_cotangent(b, db.data), _bsr_zero_cotangent(topology)

    sds.defvjp(sds_fwd, sds_bwd)

    # ---------------- dss ----------------
    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
    def dss(a, b, ta, tb, opts):
        return raw_dss(a, b, transpose_a=ta, transpose_b=tb, **dict(opts))

    def dss_fwd(a, b, ta, tb, opts):
        return dss(a, b, ta, tb, opts), (a, b)

    def dss_bwd(ta, tb, opts, res, g):
        a, b = res
        # d op(A) = g @ op(B)^T masked to A topology -> SSD
        if not ta:
            da = raw_ssd(g, b, a, transpose_a=False, transpose_b=not tb)
        else:
            da = raw_sds(b, g, a, transpose_a=tb, transpose_b=True)
        # d op(B) = op(A)^T @ g masked to B topology -> SDS / SSD
        if not tb:
            db = raw_sds(a, g, b, transpose_a=not ta, transpose_b=False)
        else:
            db = raw_ssd(g, a, b, transpose_a=True, transpose_b=ta)
        return _bsr_cotangent(a, da.data), _bsr_cotangent(b, db.data)

    dss.defvjp(dss_fwd, dss_bwd)

    # ---------------- sss (beyond the reference's six) ----------------
    # C_s = mask_T(op(A_s) op(B_s)): both cotangent products are again
    # sparse x sparse masked to the operand's own topology — SSS closes
    # under differentiation with ITSELF.
    raw_sss = ops_module.matmul_sss

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
    def sss(a, b, topology, ta, tb, opts):
        return raw_sss(a, b, topology, transpose_a=ta, transpose_b=tb, **dict(opts))

    def sss_fwd(a, b, topology, ta, tb, opts):
        return sss(a, b, topology, ta, tb, opts), (a, b, topology)

    def sss_bwd(ta, tb, opts, res, g):
        a, b, topology = res
        gs = _restore(g, topology)
        # d op(A) = g_s @ op(B)^T masked to A topology
        if not ta:
            da = raw_sss(gs, b, a, transpose_a=False, transpose_b=not tb)
        else:
            da = raw_sss(b, gs, a, transpose_a=tb, transpose_b=True)
        # d op(B) = op(A)^T @ g_s masked to B topology
        if not tb:
            db = raw_sss(a, gs, b, transpose_a=not ta, transpose_b=False)
        else:
            db = raw_sss(gs, a, b, transpose_a=True, transpose_b=ta)
        return (_bsr_cotangent(a, da.data), _bsr_cotangent(b, db.data),
                _bsr_zero_cotangent(topology))

    sss.defvjp(sss_fwd, sss_bwd)

    return {"dsd": dsd, "dds": dds, "sdd": sdd, "ssd": ssd, "sds": sds,
            "dss": dss, "sss": sss}
