"""Config 5 at pod scale: slab-sharded (model-parallel) store training.

Prints (a) the per-device HBM budget table for replicated vs
slab-sharded training — the replicated flagship trainer stops at ~512³
because store + Adam moments replicate (~12 GB at 1024³ f32); the slab
trainer scales them 1/D — and (b) a FUNCTIONAL run of the slab trainer
on the mesh available to this process (8-device virtual CPU mesh under
XLA_FLAGS=--xla_force_host_platform_device_count=8, or a real slice),
verifying the loss decreases with the store sharded P(brick).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/demo_slab_train.py [--vox 32] [--steps 6]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def memory_table(d_values=(1, 4, 8, 16, 64)):
    """Per-device training HBM (GB) for an Na³ f32 store + Adam moments
    (3× store) + one halo slice pair; ray-axis terms omitted (small)."""
    rows = []
    for na in (256, 512, 1024, 2048):
        nc_pad = -(-na // 128) * 128
        store_gb = na * nc_pad * nc_pad * 4 / 2**30
        for d in d_values:
            per_dev = store_gb * 3 / d + 2 * nc_pad * nc_pad * 4 / 2**30
            rows.append(
                {
                    "na": na,
                    "devices": d,
                    "store_plus_adam_gb_per_dev": round(per_dev, 3),
                    "fits_16gb_hbm": bool(per_dev < 14.0),
                }
            )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vox", type=int, default=32)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    print(json.dumps({"memory_model": memory_table()}, indent=None))

    import jax

    if jax.device_count() < 8:
        print(json.dumps({"functional": "skipped (need 8 devices)"}))
        return

    import jax.numpy as jnp
    import optax

    from libre_tpu.ops import shearwarp as sw
    from libre_tpu.ops import shearwarp_grad as swg
    from libre_tpu.ops import transfer_function as tf_ops
    from libre_tpu.ops.shearwarp_bricked import SENTINEL
    from libre_tpu.ops.shearwarp_pallas import _round_up
    from libre_tpu.parallel.mesh import make_mesh
    from libre_tpu.train import store_trainer as st

    axis, sign = 2, -1.0
    n = args.vox
    gmin, gmax = np.float32([-0.5] * 3), np.float32([0.5] * 3)
    rng = np.random.default_rng(0)
    vol = rng.random((n, n, n)).astype(np.float32)
    real = np.transpose(vol, sw._PERM[axis])
    na, nc, nb = real.shape
    store = np.full(
        (na, _round_up(nc, 128), _round_up(nb, 128)), SENTINEL, np.float32
    )
    store[:, :nc, :nb] = real
    store = jnp.asarray(store)
    tf = jnp.asarray(np.asarray(tf_ops.default_color_map(256)))
    bounds = (-0.45, 0.45, -0.4, 0.4)
    k_planes, v_size, u_size = 2 * n, 16, 16
    views = np.stack(
        [
            swg.view_vector(
                world_min=gmin, world_max=gmax, axis=axis, eye=e,
                sign=sign, slope_bounds=bounds,
                inter_size=(v_size, u_size), max_samples_per_ray=k_planes,
            )
            for e in (
                np.float32([0.1, 0.05, 1.4]),
                np.float32([-0.15, 0.1, 1.3]),
            )
        ]
    )
    interpret = jax.devices()[0].platform != "tpu"
    problem = st.StoreProblem(
        views=views, na_store=na, na_real=na, nc_real=nc, nb_real=nb,
        k_planes=k_planes, inter_size=(v_size, u_size),
        world_min=gmin, world_max=gmax, axis=axis,
        diff_tf=False, kc=16, interpret=interpret,
    )
    mesh = make_mesh(n_brick=4, n_ray=2)
    d_k = mesh.shape["brick"]
    targets = st.render_views(problem, store, tf)

    init = np.asarray(store).copy()
    cov = init > -0.5
    init[cov] = np.clip(
        init[cov] + rng.normal(0, 0.2, cov.sum()), 0, 1
    ).astype(np.float32)

    loss_fn = st.make_slab_loss_fn(problem, mesh)
    opt = optax.adam(5e-2)
    params = {
        "store": st.shard_store_slabs_uniform(jnp.asarray(init), d_k),
        "tf": tf,
    }
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p["store"], p["tf"], targets)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        covered = params["store"] > -0.5
        params = optax.apply_updates(params, updates)
        params = {
            "store": jnp.where(
                covered, jnp.clip(params["store"], 0.0, 1.0),
                params["store"],
            ),
            "tf": params["tf"],
        }
        return params, opt_state, loss

    losses = []
    for _ in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(round(float(loss), 6))
    shard_bytes = int(np.prod(params["store"].shape[1:])) * 4 * (
        params["store"].shape[0] // d_k
    )
    print(
        json.dumps(
            {
                "functional": {
                    "mesh": dict(mesh.shape),
                    "store_shape_sharded": list(params["store"].shape),
                    "bytes_per_device_store": shard_bytes,
                    "losses": losses,
                    "converging": losses[-1] < losses[0],
                }
            }
        )
    )
    assert losses[-1] < losses[0], losses


if __name__ == "__main__":
    main()
