"""Deeper gather probes: amortized in-kernel rates + XLA asymptotics."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def probe(name, build):
    try:
        fn, args, work = build()
        dt = timeit(fn, *args)
        print(f"[OK]   {name}: {dt*1e6:.1f} us -> {work/dt/1e9:.2f} G gathers/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


LOOP = 512


def build_lane_gather_loop():
    # amortized: LOOP lane-gathers of (8,128) from (8,128)
    def kernel(d_ref, i_ref, o_ref):
        def body(k, acc):
            idx = (i_ref[:] + k) % 128
            return acc + jnp.take_along_axis(d_ref[:], idx, axis=1)

        o_ref[:] = jax.lax.fori_loop(0, LOOP, body, jnp.zeros((8, 128), jnp.float32))

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    d = jax.random.normal(jax.random.PRNGKey(0), (8, 128), jnp.float32)
    i = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128, jnp.int32)
    return fn, (d, i), LOOP * 8 * 128


def build_lane_gather_wide():
    # gather from a WIDE table: (8, 1024) table, idx in [0,1024)
    def kernel(d_ref, i_ref, o_ref):
        def body(k, acc):
            idx = (i_ref[:] + k) % 1024
            return acc + jnp.take_along_axis(d_ref[:], idx, axis=1)[:, :128]

        o_ref[:] = jax.lax.fori_loop(0, LOOP, body, jnp.zeros((8, 128), jnp.float32))

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    d = jax.random.normal(jax.random.PRNGKey(0), (8, 1024), jnp.float32)
    i = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 1024, jnp.int32)
    return fn, (d, i), LOOP * 8 * 128


def build_sublane_gather_fullshape():
    def kernel(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=0)

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    d = jax.random.normal(jax.random.PRNGKey(0), (512, 128), jnp.float32)
    i = jax.random.randint(jax.random.PRNGKey(1), (512, 128), 0, 512, jnp.int32)
    return fn, (d, i), 512 * 128


def build_sublane_gather_8():
    def kernel(d_ref, i_ref, o_ref):
        def body(k, acc):
            idx = (i_ref[:] + k) % 8
            return acc + jnp.take_along_axis(d_ref[:], idx, axis=0)

        o_ref[:] = jax.lax.fori_loop(0, LOOP, body, jnp.zeros((8, 128), jnp.float32))

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    d = jax.random.normal(jax.random.PRNGKey(0), (8, 128), jnp.float32)
    i = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 8, jnp.int32)
    return fn, (d, i), LOOP * 8 * 128


def build_row_take():
    # embedding-style: take 8 rows out of (4096, 128) with a dynamic vector
    def kernel(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(d_ref[:], i_ref[0, :8], axis=0)

    fn = jax.jit(
        lambda d, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)
    )
    d = jax.random.normal(jax.random.PRNGKey(0), (4096, 128), jnp.float32)
    i = jax.random.randint(jax.random.PRNGKey(1), (1, 128), 0, 4096, jnp.int32)
    return fn, (d, i), 8


def build_xla_take_big(n_idx):
    N = 64 * 64 * 64
    data = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
    ii = jax.random.randint(jax.random.PRNGKey(4), (n_idx,), 0, N, jnp.int32)

    def fn(v, i):
        return jnp.take(v, i).sum()

    return jax.jit(fn), (data, ii), n_idx


def build_xla_trilinear(n_pts):
    vol = jax.random.normal(jax.random.PRNGKey(0), (64, 64, 64), jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (n_pts, 3), minval=0, maxval=63)

    def fn(v, p):
        i0 = jnp.floor(p).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, 63)
        w = p - jnp.floor(p)
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    ix = jnp.where(dx, i1[:, 0], i0[:, 0])
                    iy = jnp.where(dy, i1[:, 1], i0[:, 1])
                    iz = jnp.where(dz, i1[:, 2], i0[:, 2])
                    wx = jnp.where(dx, w[:, 0], 1 - w[:, 0])
                    wy = jnp.where(dy, w[:, 1], 1 - w[:, 1])
                    wz = jnp.where(dz, w[:, 2], 1 - w[:, 2])
                    out += v[iz, iy, ix] * wx * wy * wz
        return out.sum()

    return jax.jit(fn), (vol, pts), n_pts * 8


if __name__ == "__main__":
    probe("pallas lane take_along 128 (amortized)", build_lane_gather_loop)
    probe("pallas lane take_along 1024-wide (amortized)", build_lane_gather_wide)
    probe("pallas sublane take_along fullshape 512", build_sublane_gather_fullshape)
    probe("pallas sublane take_along 8 (amortized)", build_sublane_gather_8)
    probe("pallas row take 8 rows", build_row_take)
    probe("xla take 1M", lambda: build_xla_take_big(1 << 20))
    probe("xla take 16M", lambda: build_xla_take_big(1 << 24))
    probe("xla trilinear 2M pts (16M gathers)", lambda: build_xla_trilinear(1 << 21))
