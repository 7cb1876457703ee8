"""Probe which gather patterns Mosaic (Pallas TPU) supports/compiles on
this chip, and how fast — decides the fused raycast kernel design.

Patterns:
  1. jnp.take of a flat VMEM table with a 2-D index array (the trilinear
     density fetch pattern).
  2. jnp.take_along_axis of a (S, L) VMEM table along lanes.
  3. one-hot matmul "gather" (MXU fallback, viable for 256-entry TF only).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def probe(name, build):
    try:
        fn, args, check = build()
        dt, out = timed(fn, *args)
        ok = check(out)
        print(f"{name}: OK={ok}  {dt*1e6:.1f} us")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


R, C = 1024, 128
V = 32 * 32 * 32

rng = np.random.default_rng(0)
table = jnp.asarray(rng.random(V, dtype=np.float32))
idx = jnp.asarray(rng.integers(0, V, size=(R, C)), jnp.int32)


def build_take_flat():
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    fn = jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    )
    expect = np.asarray(table)[np.asarray(idx)]
    return fn, (table, idx), lambda o: np.allclose(np.asarray(o), expect)


def build_take_2d_table():
    t2 = table.reshape(V // 128, 128)

    def kernel(t_ref, r_ref, l_ref, o_ref):
        rows = jnp.take(t_ref[:], r_ref[:], axis=0)  # (R*C?, 128) — big
        o_ref[:] = jnp.take_along_axis(rows, l_ref[:][..., None], axis=-1)[..., 0]

    row_i = idx // 128
    lane_i = idx % 128

    fn = jax.jit(
        lambda t, r, l: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, r, l)
    )
    expect = np.asarray(table)[np.asarray(idx)]
    return fn, (t2, row_i, lane_i), lambda o: np.allclose(np.asarray(o), expect)


def build_take_along_lanes():
    # Table replicated per sublane row: gather within each (8,128) tile lane.
    t2 = jnp.broadcast_to(table[:128][None, :], (R, 128))
    li = idx[:, :1] % 128  # (R, 1)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=-1)

    fn = jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    )
    expect = np.asarray(table)[: 128][np.asarray(li)[:, 0]][:, None]
    return fn, (t2, li), lambda o: np.allclose(np.asarray(o), expect)


def build_onehot_tf():
    # 256-entry TF lookup as one-hot matmul on the MXU.
    tf = jnp.asarray(rng.random((256, 4), dtype=np.float32))
    d = jnp.asarray(rng.random((R, C), dtype=np.float32))

    def kernel(tf_ref, d_ref, o_ref):
        s = d_ref[:] * 255.0
        i0 = jnp.floor(s).astype(jnp.int32)
        onehot = (
            i0[..., None] == jax.lax.broadcasted_iota(jnp.int32, (R, C, 256), 2)
        ).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            onehot.reshape(R * C, 256),
            tf_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(R, C, 4)

    fn = jax.jit(
        lambda t, x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C, 4), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, x)
    )
    return fn, (tf, d), lambda o: True


def build_xla_take():
    fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    expect = np.asarray(table)[np.asarray(idx)]
    return fn, (table, idx), lambda o: np.allclose(np.asarray(o), expect)


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe("xla_take_flat      ", build_xla_take)
    probe("pallas_take_flat   ", build_take_flat)
    probe("pallas_take_2d     ", build_take_2d_table)
    probe("pallas_take_lanes  ", build_take_along_lanes)
    probe("pallas_onehot_tf   ", build_onehot_tf)
