"""Probe: does Mosaic lower take_along_axis along SUBLANES (axis 0), and
how fast vs the lane-axis (axis 1) form?  Decides the exact-marcher
bilinear structure (b-tap lane gather + c-tap sublane gather vs c-tap
mask-reduce)."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.random((N, N), np.float32))
idx0 = jnp.asarray(rng.integers(0, N, (N, N)), jnp.int32)

def mk(axis):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=axis)
    return jax.jit(lambda t, i: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
    )(t, i))

def timeit(f, *a, iters=100):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/iters

for axis in (1, 0):
    try:
        f = mk(axis)
        out = np.asarray(f(tab, idx0))
        ref = np.take_along_axis(np.asarray(tab), np.asarray(idx0), axis=axis)
        print(f"axis={axis}: OK allclose={np.allclose(out, ref)}  {timeit(f, tab, idx0)*1e6:.2f} us")
    except Exception as e:
        print(f"axis={axis}: FAIL {str(e).splitlines()[0][:160]}")
