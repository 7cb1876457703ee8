"""Driver benchmark: forward raymarch throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup of the production marcher over the plain
jnp reference marcher on the same chip and workload (the reference
publishes no quantitative numbers — BASELINE.md — so the framework
establishes its own baseline pair).

Workload = BASELINE config 1 scaled to a production frame: procedural
64^3 volume -> 256^2 image, 512 samples/ray, trilinear filtering,
single-brick raycast.  Diagnostics go to stderr; stdout carries only the
JSON line.
"""

import json
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, iters=5):
    """Min-of-iters with a block per call: pipelined measurement (block
    only on the last dispatch) under-reports on the remote-execution
    platform, so force each call to completion."""
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from libre_tpu.core.frustum import look_at, perspective
    from libre_tpu.ops import raycast, transfer_function as tf_ops
    from libre_tpu.ops.reference import (
        Camera,
        RenderParams,
        render_reference,
        single_brick_set,
    )

    log("devices:", jax.devices())
    img, n_vox, spr = 256, 64, 512
    near, far = 0.1, 15.0
    proj = perspective(50.0, 1.0, near, far)
    mv = look_at([0, 0, 1.0], [0, 0, 0], [0, 1, 0])
    cam = Camera(
        inv_proj=np.linalg.inv(proj.astype(np.float64)).astype(np.float32),
        inv_mv=np.linalg.inv(mv.astype(np.float64)).astype(np.float32),
        viewport=(0, 0, img, img),
        near=near,
    )
    rng = np.random.default_rng(0)
    vol = rng.random((n_vox,) * 3, dtype=np.float32)
    tf = jnp.asarray(tf_ops.default_color_map(256))
    bricks = single_brick_set(jnp.asarray(vol))
    gmin, gmax = np.float32([-0.5] * 3), np.float32([0.5] * 3)
    max_steps = int(math.ceil(math.sqrt(3.0) * spr)) + 4
    params = RenderParams(
        n_samples_per_ray=spr,
        data_source_range=(0.0, 1.0),
        filter_mode="trilinear",
        max_steps_per_brick=max_steps,
    )

    fast = jax.jit(
        lambda b, t: raycast.render(
            b, t, cam, params, gmin, gmax, chunk=64, max_steps=max_steps
        )
    )
    ref = jax.jit(
        lambda b, t: render_reference(b, t, cam, params, gmin, gmax)
    )

    rays = img * img
    dt_fast = timed(fast, bricks, tf)
    log(f"fast fwd: {dt_fast * 1e3:.2f} ms, {rays / dt_fast / 1e6:.2f} Mrays/s")
    dt_ref = timed(ref, bricks, tf, iters=5)
    log(f"ref  fwd: {dt_ref * 1e3:.2f} ms, {rays / dt_ref / 1e6:.2f} Mrays/s")

    print(
        json.dumps(
            {
                "metric": "fwd_raymarch_throughput_1chip",
                "value": round(rays / dt_fast / 1e6, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(dt_ref / dt_fast, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
