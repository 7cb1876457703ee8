"""Fused Pallas shear-warp kernel vs the jnp pipeline (interpret mode).

The kernel must reproduce ops/shearwarp.render_slope_grid exactly (same
sample points, opacity correction, early-exit rule) for every major
axis and marching sign, on non-cubic volumes and non-square slope
grids; gradients flow through the jnp-recompute backward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libre_tpu.core.frustum import look_at, perspective
from libre_tpu.ops import shearwarp as sw
from libre_tpu.ops import shearwarp_pallas as swp
from libre_tpu.ops import transfer_function as tf_ops
from libre_tpu.ops.reference import Camera, RenderParams


def _camera(eye, img=32, near=0.1):
    proj = perspective(50.0, 1.0, near, 15.0)
    mv = look_at(eye, [0, 0, 0], [0, 1, 0])
    return Camera(
        inv_proj=np.linalg.inv(proj.astype(np.float64)).astype(np.float32),
        inv_mv=np.linalg.inv(mv.astype(np.float64)).astype(np.float32),
        viewport=(0, 0, img, img),
        near=near,
    )


GMIN = np.float32([-0.5, -0.4, -0.3])
GMAX = np.float32([0.5, 0.4, 0.3])
PARAMS = RenderParams(
    n_samples_per_ray=24, data_source_range=(0.0, 1.0), filter_mode="trilinear"
)
SWP = sw.ShearWarpParams(n_planes=24, inter_size=(24, 40))


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((20, 24, 28), dtype=np.float32))
    tf = jnp.asarray(tf_ops.default_color_map(64))
    return vol, tf


# Four eyes exercising every major axis and both signs.
EYES = [
    [0.2, 0.1, 1.4],
    [1.4, 0.1, 0.2],
    [0.1, 1.4, -0.2],
    [-0.2, -0.1, -1.4],
]


@pytest.mark.parametrize("eye", EYES, ids=["z-", "x-", "y-", "z+"])
def test_slope_grid_matches_jnp(scene, eye):
    vol, tf = scene
    plan = sw.make_plan(_camera(eye))
    ref, _, _ = sw.render_slope_grid(
        vol, tf, plan.eye, plan.axis, plan.sign, plan.bounds,
        GMIN, GMAX, PARAMS, SWP,
    )
    pa = swp.slope_grid_plan_args(plan, GMIN, GMAX, PARAMS, SWP)
    got = swp.render_slope_grid_pallas(vol, tf, pa, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_full_render_matches_jnp(scene):
    vol, tf = scene
    cam = _camera([0.3, 0.5, 1.2])
    ref = sw.render(vol, tf, cam, PARAMS, GMIN, GMAX, SWP)
    got = swp.render(vol, tf, cam, PARAMS, GMIN, GMAX, SWP, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_early_exit_saturated_volume(scene):
    """A near-opaque volume exercises the in-kernel termination flag and
    must still match the jnp closed-form early exit."""
    _, tf = scene
    vol = jnp.full((16, 16, 16), 0.95, jnp.float32)
    opaque_tf = jnp.concatenate(
        [jnp.asarray(tf_ops.default_color_map(64))[:, :3],
         jnp.full((64, 1), 0.9, jnp.float32)], axis=1,
    )
    plan = sw.make_plan(_camera([0.1, 0.05, 1.3]))
    ref, _, _ = sw.render_slope_grid(
        vol, opaque_tf, plan.eye, plan.axis, plan.sign, plan.bounds,
        GMIN, GMAX, PARAMS, SWP,
    )
    pa = swp.slope_grid_plan_args(plan, GMIN, GMAX, PARAMS, SWP)
    got = swp.render_slope_grid_pallas(vol, opaque_tf, pa, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("eye", EYES, ids=["z-", "x-", "y-", "z+"])
def test_empty_space_skipping_exact(eye):
    """Planes whose bracketing slices are all-zero-alpha are skipped
    in-kernel (slice_content flags) and the result is bit-exact vs the
    jnp pipeline: a zero-alpha plane composites as the identity."""
    rng = np.random.default_rng(1)
    vol = np.zeros((20, 24, 28), dtype=np.float32)
    vol[7:13, 8:16, 9:19] = rng.random((6, 8, 10), dtype=np.float32) * 0.5 + 0.5
    vol = jnp.asarray(vol)
    # alpha 0 for the lower half of the table -> empty border slabs.
    tf = np.asarray(tf_ops.default_color_map(64))
    tf[:32, 3] = 0.0
    tf = jnp.asarray(tf)

    plan = sw.make_plan(_camera(eye))
    chans = swp.classify_planes(vol, tf, plan.axis, PARAMS.data_source_range)
    content = swp.slice_content(chans)
    content_np = np.asarray(content)
    assert content_np.min() == 0 and content_np.max() == 1  # really skips

    ref, _, _ = sw.render_slope_grid(
        vol, tf, plan.eye, plan.axis, plan.sign, plan.bounds,
        GMIN, GMAX, PARAMS, SWP,
    )
    pa = swp.slope_grid_plan_args(plan, GMIN, GMAX, PARAMS, SWP)
    perm = sw._PERM[plan.axis]
    nc_real, nb_real = vol.shape[perm[1]], vol.shape[perm[2]]
    got = swp.render_classified_slope_grid(
        chans, nc_real, nb_real, pa, True, content=content
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # Skipping is exact: identical to the same kernel with skipping off.
    full = swp.render_classified_slope_grid(
        chans, nc_real, nb_real, pa, True,
        content=jnp.ones_like(content),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(full))


def test_empty_space_skipping_sharded():
    """content flags thread through the sharded fused path too."""
    from libre_tpu.parallel import make_mesh

    rng = np.random.default_rng(2)
    vol = np.zeros((20, 24, 28), dtype=np.float32)
    vol[7:13, 8:16, 9:19] = rng.random((6, 8, 10), dtype=np.float32) * 0.5 + 0.5
    vol = jnp.asarray(vol)
    tf = np.asarray(tf_ops.default_color_map(64))
    tf[:32, 3] = 0.0
    tf = jnp.asarray(tf)

    mesh = make_mesh(n_brick=2, n_ray=4)
    plan = sw.make_plan(_camera([0.3, 0.5, 1.2]))
    swp_cfg = sw.ShearWarpParams(n_planes=24, inter_size=(32, 40))
    chans = swp.classify_planes(vol, tf, plan.axis, PARAMS.data_source_range)
    content = swp.slice_content(chans)
    perm = sw._PERM[plan.axis]
    nc_real, nb_real = vol.shape[perm[1]], vol.shape[perm[2]]
    pa = swp.slope_grid_plan_args(plan, GMIN, GMAX, PARAMS, swp_cfg)
    single = swp.render_classified_slope_grid(
        chans, nc_real, nb_real, pa, True, content=content
    )
    sharded = swp.render_slope_grid_sharded(
        mesh, chans, nc_real, nb_real, pa, interpret=True, content=content
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=2e-3
    )


def test_gradients_match_jnp(scene):
    """custom_vjp backward (jnp recompute) == differentiating the jnp
    pipeline directly, for both the volume and the transfer function."""
    vol, tf = scene
    plan = sw.make_plan(_camera([0.3, 0.5, 1.2]))
    pa = swp.slope_grid_plan_args(plan, GMIN, GMAX, PARAMS, SWP)

    def loss_pl(v, t):
        return swp.render_slope_grid_pallas(v, t, pa, True).sum()

    def loss_jnp(v, t):
        img, _, _ = sw.render_slope_grid(
            v, t, plan.eye, plan.axis, plan.sign, plan.bounds,
            GMIN, GMAX, PARAMS, SWP,
        )
        return img.sum()

    gv1, gt1 = jax.grad(loss_pl, argnums=(0, 1))(vol, tf)
    gv2, gt2 = jax.grad(loss_jnp, argnums=(0, 1))(vol, tf)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), atol=1e-6)


def test_sharded_matches_single_device(scene):
    """ray × brick sharded fused kernel == single-device kernel
    (sort-first rows have no communication; sort-last plane ranges fold
    with the over operator)."""
    import jax
    from libre_tpu.parallel import make_mesh

    import dataclasses

    vol, tf = scene
    mesh = make_mesh(n_brick=2, n_ray=4)
    plan = sw.make_plan(_camera([0.3, 0.5, 1.2]))
    swp_cfg = sw.ShearWarpParams(n_planes=24, inter_size=(32, 40))
    chans = swp.classify_planes(vol, tf, plan.axis, PARAMS.data_source_range)
    perm = sw._PERM[plan.axis]
    nc_real, nb_real = vol.shape[perm[1]], vol.shape[perm[2]]

    # Exact parity with early exit disabled (as in test_parallel.py:107);
    # with it enabled the drift is device-local and bounded by
    # 1 - threshold (doc/technical-overview.md).
    for params, atol in (
        (dataclasses.replace(PARAMS, early_exit=1.1), 2e-5),
        (PARAMS, 2e-3),
    ):
        pa = swp.slope_grid_plan_args(plan, GMIN, GMAX, params, swp_cfg)
        single = swp.render_slope_grid_pallas(vol, tf, pa, True)
        sharded = swp.render_slope_grid_sharded(
            mesh, chans, nc_real, nb_real, pa, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), atol=atol
        )


def test_render_frame_matches_two_stage(scene):
    """The single-dispatch full-frame path (device-side slopes + one
    patch-gather warp) == kernel + host-planned warp_to_screen."""
    vol, tf = scene
    cam = _camera([0.3, 0.5, 1.2])
    ref = swp.render(vol, tf, cam, PARAMS, GMIN, GMAX, SWP, interpret=True)
    plan = sw.make_plan(cam, SWP.slope_margin)
    pa = swp.slope_grid_plan_args(plan, GMIN, GMAX, PARAMS, SWP)
    chans = swp.classify_planes(vol, tf, plan.axis, PARAMS.data_source_range)
    perm = sw._PERM[plan.axis]
    nc_real, nb_real = vol.shape[perm[1]], vol.shape[perm[2]]
    got = swp.render_frame(chans, nc_real, nb_real, cam, pa, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
