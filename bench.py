"""Driver benchmark: forward raymarch throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline = the fused Pallas shear-warp kernel (ops/shearwarp_pallas.py)
on BASELINE config 1 scaled to a production frame: procedural 64^3
volume -> 256^2 image, 512 samples/ray, trilinear.  ``vs_baseline`` is
its speedup over the exact gather-based XLA marcher (ops/raycast.py) on
the same chip and workload — the reference publishes no quantitative
numbers (BASELINE.md), so the framework's exact path IS the baseline.

Frames are CHAINED inside one jit call (each frame consumes a
zero-scaled summary of the previous one, defeating CSE) and timing
reports the marginal per-frame cost between a 2-chain and a 10-chain —
this cancels the ~25 ms remote-dispatch overhead of the tunneled bench
platform, which would otherwise dominate a 2.5 ms frame.

Timing forces a host round-trip per iteration (pipelined
block_until_ready under-reports on the remote-execution platform).
Diagnostics go to stderr; stdout carries only the JSON line.
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


def timed_scalar(fn, *args, iters=3):
    """Min wall time of fn(*args) forced to a host scalar each call."""
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_camera(eye, img, near=0.1, far=15.0):
    from libre_tpu.core.frustum import look_at, perspective
    from libre_tpu.ops.reference import Camera

    proj = perspective(50.0, 1.0, near, far)
    mv = look_at(eye, [0, 0, 0], [0, 1, 0])
    return Camera(
        inv_proj=np.linalg.inv(proj.astype(np.float64)).astype(np.float32),
        inv_mv=np.linalg.inv(mv.astype(np.float64)).astype(np.float32),
        viewport=(0, 0, img, img),
        near=near,
    )


def main():
    from libre_tpu.ops import raycast, shearwarp, transfer_function as tf_ops
    from libre_tpu.ops.reference import RenderParams, single_brick_set

    log("devices:", jax.devices())
    img, n_vox, spr = 256, 64, 512
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((n_vox,) * 3, dtype=np.float32))
    tf = jnp.asarray(tf_ops.default_color_map(256))
    gmin, gmax = np.float32([-0.5] * 3), np.float32([0.5] * 3)
    max_steps = int(math.ceil(math.sqrt(3.0) * spr)) + 4
    params = RenderParams(
        n_samples_per_ray=spr,
        data_source_range=(0.0, 1.0),
        filter_mode="trilinear",
        max_steps_per_brick=max_steps,
    )
    rays = img * img

    # Fused Pallas shear-warp: marginal frame cost via chained frames.
    from libre_tpu.ops import shearwarp_pallas

    eyes = [[0.2, 0.1, 1.4], [1.4, 0.1, 0.2], [0.1, 1.4, -0.2], [-0.2, -0.1, -1.4]]
    cams = [make_camera(e, img) for e in eyes]
    plans = [shearwarp.make_plan(c) for c in cams]
    swp = shearwarp.ShearWarpParams(n_planes=spr, inter_size=(img, img))

    # Steady-state interactive loop: the classified plane stack is
    # cached per axis (the engine's behavior; the reference likewise
    # re-uploads its TF texture only on change), camera varies per frame.
    import numpy as _np

    pas = [
        shearwarp_pallas.slope_grid_plan_args(p, gmin, gmax, params, swp)
        for p in plans
    ]
    chans_by_axis = {
        p.axis: shearwarp_pallas.classify_planes(
            vol, tf, p.axis, params.data_source_range
        )
        for p in plans
    }

    def frame(chans_all, i, s):
        plan, pa = plans[i], pas[i]
        perm = shearwarp._PERM[plan.axis]
        nc_real, nb_real = (
            vol.shape[perm[1]], vol.shape[perm[2]]
        )
        return shearwarp_pallas.render_frame(
            chans_all[plan.axis] + s * 1e-30, nc_real, nb_real, cams[i], pa
        )

    def chained(m):
        def f(chans_all):
            s = jnp.float32(0.0)
            for i in range(m):
                s = frame(chans_all, i % 4, s).sum()
            return s
        return jax.jit(f)

    t2 = timed_scalar(chained(2), chans_by_axis)
    t10 = timed_scalar(chained(10), chans_by_axis)
    dt_sw = (t10 - t2) / 8
    log(f"pallas shearwarp fwd: {dt_sw * 1e3:.2f} ms/frame marginal, "
        f"{rays / dt_sw / 1e6:.2f} Mrays/s (t2={t2*1e3:.1f} t10={t10*1e3:.1f})")

    # Exact gather-based marcher (the parity oracle path) as baseline.
    bricks = single_brick_set(vol)
    f_exact = jax.jit(
        lambda b, t: raycast.render(
            b, t, cams[0], params, gmin, gmax, chunk=64, max_steps=max_steps
        ).sum()
    )
    dt_exact = timed_scalar(lambda b, t: f_exact(b, t), bricks, tf, iters=2)
    log(f"exact fwd: {dt_exact * 1e3:.2f} ms/frame, "
        f"{rays / dt_exact / 1e6:.4f} Mrays/s")

    print(
        json.dumps(
            {
                "metric": "pallas_shearwarp_fwd_throughput_1chip",
                "value": round(rays / dt_sw / 1e6, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(dt_exact / dt_sw, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
