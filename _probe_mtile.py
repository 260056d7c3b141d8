import functools, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sputnik_tpu.kernels.common import compiler_params
from sputnik_tpu.utils.profiling import device_time

PEAK = 197e12

def _kern(a_ref, b_ref, out_ref, acc_ref, *, k_steps, depth):
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:, pl.ds(j * depth, depth)], b_ref[pl.ds(j * depth, depth), :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    @pl.when(j == k_steps - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)

def resident(a, b, *, depth, mt):
    m, k = a.shape; _, n = b.shape
    k_steps = k // depth
    return pl.pallas_call(
        functools.partial(_kern, k_steps=k_steps, depth=depth),
        grid=(m // mt, k_steps),
        in_specs=[pl.BlockSpec((mt, k), lambda i, j: (i, 0)),
                  pl.BlockSpec((k, n), lambda i, j: (0, 0))],
        out_specs=pl.BlockSpec((mt, n), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((mt, n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        compiler_params=compiler_params(("parallel", "arbitrary"),
            vmem_limit_bytes=110 << 20),
        interpret=False)(a, b)

rng = np.random.default_rng(7)
m, k, n = 1024, 4096, 4096
a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
flops = 2.0 * m * k * n
for depth in (128, 256):
    for mt in (128, 256, 512):
        try:
            meas = device_time(lambda a_, b_: resident(a_, b_, depth=depth, mt=mt),
                               a, b, chain=4, runs=3, perturb_index=0)
            t = meas["time_s"]
            print(f"depth={depth} mt={mt}: {t*1e6:8.1f}us  {flops/t/1e12:6.1f}TF  {flops/t/PEAK:.3f} of spec", flush=True)
        except Exception as e:
            print(f"depth={depth} mt={mt}: ERROR {str(e)[:120]}", flush=True)
