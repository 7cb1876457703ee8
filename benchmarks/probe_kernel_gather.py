"""Probe: in-kernel TF table lookup via tpu.dynamic_gather.

Mosaic lowers lax.gather ONLY in the take_along_axis form where
operand.shape == indices.shape == out.shape (2-D, batching on the other
dim).  TF lookup: broadcast the 256-entry table to the tile shape and
take_along_axis with density-derived indices.  This is the basis for
in-kernel post-classification (VERDICT item 3).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, U, T, K = 64, 256, 256, 512
rng = np.random.default_rng(0)


def time_it(name, fn, *args, iters=20):
    r = jax.jit(fn)
    float(jnp.sum(r(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(r(*args)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f} ms/call")


# Axis-1 form: operand rows each hold the table; idx (V, T).
def k1(d_ref, t_ref, o_ref):
    d = d_ref[0]  # (V, U) with U == T here
    tab = jnp.broadcast_to(t_ref[:].reshape(1, T), (V, T))
    idx = jnp.clip((d * T).astype(jnp.int32), 0, T - 1)
    o_ref[0] = jnp.take_along_axis(tab, idx, axis=1)


def f1(d, t):
    return pl.pallas_call(
        k1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, V, U), lambda k: (k, 0, 0)),
            pl.BlockSpec((T,), lambda k: (0,)),
        ],
        out_specs=pl.BlockSpec((1, V, U), lambda k: (k, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, V, U), jnp.float32),
    )(d, t)


dens3 = jnp.asarray(rng.random((K, V, U), np.float32))
table = jnp.asarray(rng.random((T,), np.float32))
try:
    out = jax.jit(f1)(dens3, table)
    ref = np.asarray(table)[
        np.clip((np.asarray(dens3) * T).astype(np.int32), 0, T - 1)
    ]
    print("axis1 gather: OK, allclose:", np.allclose(np.asarray(out), ref))
    time_it("axis1 gather 512 planes (64,256)", f1, dens3, table)
except Exception as e:
    print("axis1 FAIL:", str(e).split("\n")[0][:200])


# Full TF lookup: two-tap linear, 4 channels (rgba), per plane.
def k2(d_ref, t_ref, o_ref):
    d = d_ref[0]  # (V, U)
    s = jnp.clip(d, 0.0, 1.0) * T - 0.5
    s = jnp.clip(s, 0.0, float(T - 1))
    i0 = jnp.floor(s)
    w = s - i0
    i0i = i0.astype(jnp.int32)
    i1i = jnp.minimum(i0i + 1, T - 1)
    for ch in range(4):
        tab = jnp.broadcast_to(t_ref[ch].reshape(1, T), (V, T))
        lo = jnp.take_along_axis(tab, i0i, axis=1)
        hi = jnp.take_along_axis(tab, i1i, axis=1)
        o_ref[0, ch] = lo * (1.0 - w) + hi * w


def f2(d, t):
    return pl.pallas_call(
        k2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, V, U), lambda k: (k, 0, 0)),
            pl.BlockSpec((4, T), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, V, U), lambda k: (k, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, 4, V, U), jnp.float32),
    )(d, t)


tf4 = jnp.asarray(rng.random((4, T), np.float32))
try:
    out = jax.jit(f2)(dens3, tf4)
    print("full rgba 2-tap lookup: OK")
    time_it("rgba 2-tap lookup 512 planes", f2, dens3, tf4)
except Exception as e:
    print("rgba FAIL:", str(e).split("\n")[0][:200])

# What if U != T (e.g. U=128 after padding)? idx shape (V, U) must match
# operand shape -> operand must be (V, U)-shaped table broadcast; only
# valid if U >= T? No: gather along axis 1 reads op[i, idx[i,j]] with
# idx < U bound... operand second dim must cover table indices, so we
# need U == T or pad table to U. Probe U=512 (table padded to 512).
V3, U3 = 64, 512


def k3(d_ref, t_ref, o_ref):
    d = d_ref[:]
    tab = jnp.broadcast_to(t_ref[:].reshape(1, U3), (V3, U3))
    idx = jnp.clip((d * T).astype(jnp.int32), 0, T - 1)
    o_ref[:] = jnp.take_along_axis(tab, idx, axis=1)


def f3(d, t):
    return pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((V3, U3), jnp.float32),
    )(d, jnp.pad(t, (0, U3 - T)))


d2 = jnp.asarray(rng.random((V3, U3), np.float32))
try:
    out = jax.jit(f3)(d2, table)
    ref = np.asarray(jnp.pad(table, (0, U3 - T)))[
        np.clip((np.asarray(d2) * T).astype(np.int32), 0, T - 1)
    ]
    print("padded-table U=512: OK, allclose:", np.allclose(np.asarray(out), ref))
except Exception as e:
    print("padded FAIL:", str(e).split("\n")[0][:200])
