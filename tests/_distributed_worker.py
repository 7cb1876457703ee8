"""Worker for the 2-process jax.distributed test (run by
tests/test_distributed.py, NOT collected by pytest).

Each process owns 4 virtual CPU devices; together they form an
8-device (ray × brick) mesh spanning a process boundary — the DCN path
of the reference's multi-node deployment (livre/eq/Node.cpp:43-160):
FrameData broadcast (Collage commit/sync ≙ broadcast_frame_state), a
frame-lifecycle barrier, and a sharded render + gradient step whose
results must equal the local single-device computation on every
process.
"""

import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from libre_tpu.parallel.distributed import (  # noqa: E402
    broadcast_frame_state,
    initialize,
    is_controller,
    sync_global_devices,
)


def main():
    initialize(f"127.0.0.1:{PORT}", num_processes=2, process_id=PID)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8
    assert is_controller() == (PID == 0)

    # --- FrameData commit/sync: controller → all hosts ---------------
    if PID == 0:
        state = {
            "camera_mv": np.linspace(0, 1, 16, dtype=np.float32),
            "uri": "mem://#8,8,8,8",
            "frame": 7,
            "clip": [(1.0, 0.0, 0.0, 0.25)],
        }
    else:
        state = None
    got = broadcast_frame_state(state)
    assert got["frame"] == 7 and got["uri"] == "mem://#8,8,8,8"
    np.testing.assert_allclose(
        got["camera_mv"], np.linspace(0, 1, 16, dtype=np.float32)
    )
    sync_global_devices("framedata")

    # --- sharded render + gradient across the process boundary -------
    from libre_tpu.ops import shearwarp as sw
    from libre_tpu.ops import transfer_function as tf_ops
    from libre_tpu.ops.reference import RenderParams
    from libre_tpu.parallel.mesh import make_mesh
    from libre_tpu.parallel.shearwarp_sharded import (
        render_slope_grid_sharded,
    )

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((16,) * 3, dtype=np.float32))
    tf_np = np.asarray(tf_ops.default_color_map(256), np.float32)
    gmin, gmax = np.float32([-0.5] * 3), np.float32([0.5] * 3)
    eye = np.float32([0.1, 0.05, 1.4])
    bounds = (-0.45, 0.45, -0.4, 0.4)
    params = RenderParams(
        n_samples_per_ray=16, data_source_range=(0.0, 1.0),
        filter_mode="trilinear", early_exit=1.1,
    )
    swp = sw.ShearWarpParams(n_planes=16, inter_size=(8, 8))
    mesh = make_mesh(n_brick=2, n_ray=4)  # spans both processes

    tf_g = multihost_utils.host_local_array_to_global_array(
        tf_np, mesh, P()
    )

    def forward(tf):
        return render_slope_grid_sharded(
            mesh, vol, tf, eye, 2, -1.0, bounds, gmin, gmax, params, swp
        )

    def loss(tf):
        return jnp.mean(forward(tf) ** 2)

    img, grad = jax.jit(
        lambda t: jax.value_and_grad(
            lambda tt: loss(tt)
        )(t)
    )(tf_g)
    img_l = float(img)
    grad_l = multihost_utils.global_array_to_host_local_array(
        grad, mesh, P()
    )
    grad_l = np.asarray(grad_l)

    # Local single-device reference on this process.
    tf_local = jnp.asarray(tf_np)

    def loss_local(tf):
        out, _, _ = sw.render_slope_grid(
            vol, tf, eye, 2, -1.0, bounds, gmin, gmax, params, swp
        )
        return jnp.mean(out ** 2)

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_local))(tf_local)
    np.testing.assert_allclose(img_l, float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(grad_l, np.asarray(g_ref), atol=1e-6)

    sync_global_devices("done")
    print(f"OK pid={PID} loss={img_l:.6f}")


if __name__ == "__main__":
    main()
