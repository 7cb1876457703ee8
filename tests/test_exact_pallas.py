"""Pallas exact perspective marcher vs the reference oracle.

All kernel runs use interpret mode (CPU suite); the compiled path is
exercised by bench.py on hardware.  Parity bound 1e-4 absolute: the
kernel's in-plane interpolation runs as an MXU matmul whose f32
accumulation order differs from the oracle's nested lerp (~1e-6), and
TF-discontinuity amplification is bounded by the table's bin-to-bin
steps.
"""

import math

import jax

import jax.numpy as jnp
import numpy as np
import pytest

from libre_tpu.core.frustum import look_at, perspective
from libre_tpu.ops import exact_pallas as ep
from libre_tpu.ops import transfer_function as tf_ops
from libre_tpu.ops.reference import (
    Camera,
    RenderParams,
    render_reference,
    single_brick_set,
)

ATOL = 1e-4


def make_cam(eye, img=32, near=0.1, far=15.0, fov=50.0):
    proj = perspective(fov, 1.0, near, far)
    mv = look_at(eye, [0, 0, 0], [0, 1, 0])
    return Camera(
        inv_proj=np.linalg.inv(proj.astype(np.float64)).astype(np.float32),
        inv_mv=np.linalg.inv(mv.astype(np.float64)).astype(np.float32),
        viewport=(0, 0, img, img),
        near=near,
    )


def make_scene(n=32, spr=64, filter_mode="trilinear", seed=0):
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(rng.random((n, n, n), dtype=np.float32))
    tf = jnp.asarray(tf_ops.default_color_map(256))
    params = RenderParams(
        n_samples_per_ray=spr,
        data_source_range=(0.0, 1.0),
        filter_mode=filter_mode,
        max_steps_per_brick=int(math.ceil(math.sqrt(3.0) * spr)) + 4,
    )
    return vol, tf, params


GMIN = np.float32([-0.5, -0.5, -0.5])
GMAX = np.float32([0.5, 0.5, 0.5])


def _compare(vol, tf, cam, params, clip_planes=None, atol=ATOL):
    ref = np.asarray(
        render_reference(
            single_brick_set(vol), tf, cam, params, GMIN, GMAX,
            clip_planes=clip_planes,
        )
    )
    got = np.asarray(
        ep.render_exact(
            vol, tf, cam, params, clip_planes=clip_planes, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=atol)
    return ref, got


@pytest.mark.parametrize("filter_mode", ["trilinear", "nearest"])
def test_matches_reference_head_on(filter_mode):
    vol, tf, params = make_scene(filter_mode=filter_mode)
    _compare(vol, tf, make_cam([0.2, 0.1, 1.4]), params)


@pytest.mark.parametrize(
    "eye", [[1.4, 0.1, 0.2], [0.1, 1.4, -0.2], [-0.2, -1.35, 0.3]]
)
def test_matches_reference_other_axes(eye):
    """Major axis x / y and negative-direction sign groups."""
    vol, tf, params = make_scene()
    plan = ep.plan_exact(
        make_cam(eye), params, GMIN, GMAX, vol.shape
    )
    assert plan.axis != 2 or eye == [-0.2, -1.35, 0.3]
    _compare(vol, tf, make_cam(eye), params)


def test_matches_reference_clip_planes():
    vol, tf, params = make_scene()
    clips = np.asarray(
        [[0.0, 0.0, 1.0, 0.2], [1.0, 0.0, 0.0, 0.3]], np.float32
    )
    _compare(vol, tf, make_cam([0.2, 0.1, 1.4]), params, clip_planes=clips)


def test_early_exit_saturates_like_reference():
    vol, tf, params = make_scene()
    tf_opaque = jnp.ones((256, 4), jnp.float32)
    ref, got = _compare(vol, tf_opaque, make_cam([0.2, 0.1, 1.4]), params)
    assert got[..., 3].max() > 0.999  # saturation actually reached


def test_wide_fov_uses_fallback_and_matches():
    """A 140° fov makes silhouette rays nearly orthogonal to every axis:
    the planner must route them to the XLA fallback and still match."""
    vol, tf, params = make_scene(spr=32)
    cam = make_cam([0.0, 0.05, 1.1], img=24, fov=140.0)
    plan = ep.plan_exact(
        cam, params, GMIN, GMAX, vol.shape, max_slots=24
    )
    # Not required that fallback is nonempty, but the plan must cover
    # every ray exactly once.
    covered = np.concatenate(
        [g.ray_idx for g in plan.groups] + [plan.fallback_idx]
    )
    assert len(covered) == len(set(covered.tolist()))
    _compare(vol, tf, cam, params)


def test_multi_brick_carry_composes():
    """Marching two half-volumes through the kernel brick-by-brick with
    carry equals the whole-volume reference — the multipass/multi-brick
    composition contract (GLRaycastPipeline.cpp:148-186)."""
    vol, tf, params = make_scene(n=16, spr=32)
    cam = make_cam([0.2, 0.1, 1.4], img=16)
    ref = np.asarray(
        render_reference(
            single_brick_set(vol), tf, cam, params, GMIN, GMAX
        )
    )
    vol_np = np.asarray(vol)
    halves = [vol_np[:8], vol_np[8:]]  # split along z
    boxes = [
        (np.float32([-0.5, -0.5, -0.5]), np.float32([0.5, 0.5, 0.0])),
        (np.float32([-0.5, -0.5, 0.0]), np.float32([0.5, 0.5, 0.5])),
    ]
    # Front-to-back for an eye at z=+1.4: far half is z<0 → render the
    # near (z>0) half first.
    order = [1, 0]
    carry = None
    for i in order:
        wmin, wmax = boxes[i]
        plan = ep.plan_exact(
            cam, params, wmin, wmax, halves[i].shape,
            global_min=GMIN, global_max=GMAX,
        )
        carry = ep.render_exact_rays(
            jnp.asarray(halves[i]), tf, plan,
            init_carry=carry, interpret=True,
        )
    got = np.asarray(carry).reshape(16, 16, 4)
    # The halves carry no ghost voxels, so trilinear fetches within half
    # a voxel of the internal face clamp instead of reading the
    # neighbor — a property of the decomposition, not the kernel
    # (reference datasources pad with overlap for this,
    # RawDataSource.cpp:78-88).
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_plan_reuse_is_pure():
    """Rendering twice from one plan gives identical images (plans are
    static, kernels stateless)."""
    vol, tf, params = make_scene(n=16, spr=32)
    cam = make_cam([0.2, 0.1, 1.4], img=16)
    plan = ep.plan_exact(cam, params, GMIN, GMAX, vol.shape)
    a = np.asarray(ep.render_exact(vol, tf, cam, params, plan=plan,
                                   interpret=True))
    b = np.asarray(ep.render_exact(vol, tf, cam, params, plan=plan,
                                   interpret=True))
    np.testing.assert_array_equal(a, b)


def test_multi_sample_matches_reference():
    """samples_per_pixel > 1: per-sample jittered ray plans averaged
    like the reference's multi-sample loop (fragRaycast.glsl:121-127)."""
    vol, tf, _ = make_scene(n=16, spr=32)
    params = RenderParams(
        n_samples_per_ray=32, data_source_range=(0.0, 1.0),
        filter_mode="trilinear", samples_per_pixel=2,
        max_steps_per_brick=int(math.ceil(math.sqrt(3.0) * 32)) + 4,
    )
    cam = make_cam([0.2, 0.1, 1.4], img=16)
    _compare(vol, tf, cam, params)


def test_c_window_overflow_detection():
    """check_window: a deliberately shrunken c-window must be caught by
    the in-kernel overflow flag, and the healthy bound must pass."""
    import dataclasses

    vol, tf, params = make_scene(n=32, spr=64)
    cam = make_cam([0.4, 0.45, 1.2])  # tilted: real c-motion per slab
    plan = ep.plan_exact(cam, params, GMIN, GMAX, vol.shape)
    # Healthy: no overflow.
    out = ep.render_exact_rays(
        vol, tf, plan, interpret=True, check_window=True
    )
    assert np.isfinite(np.asarray(out)).all()
    # Sabotaged: clamp the window far below the host bound.
    bad_groups = tuple(
        dataclasses.replace(g, w_c=8) if g.w_c > 8 else g
        for g in plan.groups
    )
    if all(g.w_c == o.w_c for g, o in zip(bad_groups, plan.groups)):
        pytest.skip("bound already minimal for this view")
    bad_plan = dataclasses.replace(plan, groups=bad_groups)
    with pytest.raises(RuntimeError, match="c-window overflow"):
        ep.render_exact_rays(
            vol, tf, bad_plan, interpret=True, check_window=True
        )


def test_orbit_new_camera_never_recompiles():
    """The r5 camera-agnostic contract: after the first frame of an
    orbit compiles, every subsequent NEW camera pose re-plans (numpy)
    but reuses the compiled frame function — compile_count() must not
    move — and each frame still matches the reference oracle."""
    vol, tf, params = make_scene(n=16, spr=32)
    eyes = [
        [0.2 * np.cos(a) + 0.05, 0.1, 1.35 + 0.1 * np.sin(a)]
        for a in np.linspace(0.0, 0.6, 5)
    ]
    cams = [make_cam(e, img=16) for e in eyes]
    # Warm frame: compiles the (shape x tier) signature.
    _compare(vol, tf, cams[0], params)
    warm = ep.compile_count()
    for cam in cams[1:]:
        _compare(vol, tf, cam, params)
    assert ep.compile_count() == warm, (
        f"orbit recompiled: {warm} -> {ep.compile_count()}"
    )


def test_brick_geometry_is_runtime():
    """Different brick world boxes (multi-brick placement) reuse the
    same compiled kernel: geometry is an operand, not a constant."""
    vol, tf, params = make_scene(n=16, spr=32)
    cam = make_cam([0.2, 0.1, 1.4], img=16)
    vol_np = np.asarray(vol)
    halves = [vol_np[:8], vol_np[8:]]
    boxes = [
        (np.float32([-0.5, -0.5, -0.5]), np.float32([0.5, 0.5, 0.0])),
        (np.float32([-0.5, -0.5, 0.0]), np.float32([0.5, 0.5, 0.5])),
    ]
    carry = None
    counts = []
    for i in (1, 0):
        wmin, wmax = boxes[i]
        plan = ep.plan_exact(
            cam, params, wmin, wmax, halves[i].shape,
            global_min=GMIN, global_max=GMAX,
        )
        carry = ep.render_exact_rays(
            jnp.asarray(halves[i]), tf, plan,
            init_carry=carry, interpret=True,
        )
        counts.append(ep.compile_count())
    # The two bricks share (shape x tier) signatures whenever the
    # planner lands on the same tiers; at minimum the counter must not
    # grow per-brick without bound — re-rendering the same pair is free.
    for i in (1, 0):
        wmin, wmax = boxes[i]
        plan = ep.plan_exact(
            cam, params, wmin, wmax, halves[i].shape,
            global_min=GMIN, global_max=GMAX,
        )
        carry = ep.render_exact_rays(
            jnp.asarray(halves[i]), tf, plan,
            init_carry=carry, interpret=True,
        )
    assert ep.compile_count() == counts[-1]


@pytest.mark.parametrize(
    "filter_mode,eye",
    [
        ("trilinear", [0.25, 0.12, 1.4]),
        ("nearest", [0.25, 0.12, 1.4]),
        ("trilinear", [1.4, 0.1, 0.2]),   # x-axis group
        ("trilinear", [0.1, 0.15, -1.4]),  # opposite sign
    ],
)
def test_exact_diff_grads_match_reference(filter_mode, eye):
    """render_exact_diff: density AND TF gradients from the fused
    recompute backward kernel match jax.grad of the reference oracle
    (atol 1e-4; early exit disabled — trainer semantics)."""
    n, spr, img = 16, 32, 16
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((n, n, n), dtype=np.float32))
    tf = jnp.asarray(tf_ops.default_color_map(256))
    params = RenderParams(
        n_samples_per_ray=spr, data_source_range=(0.0, 1.0),
        filter_mode=filter_mode, early_exit=1.1,
        max_steps_per_brick=int(math.ceil(math.sqrt(3.0) * spr)) + 4,
    )
    cam = make_cam(eye, img=img)
    plan = ep.plan_exact(cam, params, GMIN, GMAX, vol.shape)
    gw = jnp.asarray(rng.random((img * img, 4), dtype=np.float32))

    def loss_kernel(v, t):
        return jnp.sum(ep.render_exact_diff(v, t, plan, True) * gw)

    def loss_ref(v, t):
        out = render_reference(
            single_brick_set(v), t, cam, params, GMIN, GMAX
        )
        return jnp.sum(out.reshape(-1, 4) * gw)

    np.testing.assert_allclose(
        float(loss_kernel(vol, tf)), float(loss_ref(vol, tf)), atol=1e-3
    )
    g1v, g1t = jax.grad(loss_kernel, argnums=(0, 1))(vol, tf)
    g2v, g2t = jax.grad(loss_ref, argnums=(0, 1))(vol, tf)
    np.testing.assert_allclose(
        np.asarray(g1v), np.asarray(g2v), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g1t), np.asarray(g2t), atol=1e-3
    )


def test_exact_diff_requires_trainer_semantics():
    vol, tf, params = make_scene(n=16, spr=32)  # early_exit default on
    cam = make_cam([0.2, 0.1, 1.4], img=16)
    plan = ep.plan_exact(cam, params, GMIN, GMAX, vol.shape)
    with pytest.raises(ValueError, match="early_exit"):
        ep.render_exact_diff(vol, tf, plan, True)
