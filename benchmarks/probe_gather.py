"""Probe which gather formulations compile & their speed in Pallas on TPU.

Decides the trilinear/nearest sampling strategy for the fused raycast
kernel: TPUs have no texture units, so the density fetch must be built
from whatever dynamic-indexing primitives Mosaic supports.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 1024  # rays per tile (8, 128)
N = 64 * 64 * 64  # flat brick size


def timeit(fn, *args, iters=50):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def probe(name, build):
    try:
        fn, args = build()
        out = jax.block_until_ready(fn(*args))
        dt = timeit(fn, *args)
        print(f"[OK]   {name}: {dt*1e6:.1f} us  out_sum={np.asarray(out).sum():.1f}")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


key = jax.random.PRNGKey(0)
data_flat = jax.random.normal(key, (N,), jnp.float32)
data_2d = data_flat.reshape(N // 128, 128)
idx_flat = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, N, jnp.int32)
idx_lane = jax.random.randint(jax.random.PRNGKey(2), (8, 128), 0, 128, jnp.int32)


def build_take_flat():
    def kernel(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(d_ref[:].reshape(-1), i_ref[:], axis=0)

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    return fn, (data_2d, idx_flat)


def build_take_along_lane():
    def kernel(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=1)

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    return fn, (data_2d[:8], idx_lane)


def build_take_along_sublane():
    # gather rows: data (S, 128), idx (8, 128) selecting sublanes per lane
    def kernel(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=0)

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    idx_sub = jax.random.randint(jax.random.PRNGKey(3), (8, 128), 0, 512, jnp.int32)
    return fn, (data_2d[:512], idx_sub)


def build_onehot_mxu():
    # one-hot matmul gather over 512 sublanes
    def kernel(d_ref, i_ref, o_ref):
        idx = i_ref[:]  # (8,128) in [0,512)
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        # build (8*128, 512) onehot? too big; do per-sublane trick instead:
        oh = (idx[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (8, 128, 512), 2)).astype(jnp.float32)
        # contract (8,128,512) x (512,128->lane?) — just demo cost
        o_ref[:] = jnp.einsum("abc,cb->ab", oh, d_ref[:], preferred_element_type=jnp.float32)

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    idx_sub = jax.random.randint(jax.random.PRNGKey(3), (8, 128), 0, 512, jnp.int32)
    return fn, (data_2d[:512], idx_sub)


def build_xla_gather():
    vol = data_flat.reshape(64, 64, 64)
    ii = jax.random.randint(jax.random.PRNGKey(4), (3, 1024 * 256), 0, 64, jnp.int32)

    def fn(v, i):
        return v[i[2], i[1], i[0]].sum()

    return jax.jit(fn), (vol, ii)


def build_xla_take_flat():
    ii = jax.random.randint(jax.random.PRNGKey(4), (1024 * 256,), 0, N, jnp.int32)

    def fn(v, i):
        return jnp.take(v, i).sum()

    return jax.jit(fn), (data_flat, ii)


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe("pallas take flat (2d idx from N)", build_take_flat)
    probe("pallas take_along_axis lane", build_take_along_lane)
    probe("pallas take_along_axis sublane", build_take_along_sublane)
    probe("pallas onehot mxu 512", build_onehot_mxu)
    probe("xla gather 3d 256k", build_xla_gather)
    probe("xla take flat 256k", build_xla_take_flat)
