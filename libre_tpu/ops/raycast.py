"""Production forward raymarcher — TPU-structured, XLA-fused.

Semantically identical to :mod:`libre_tpu.ops.reference` (same global sample
grid, same half-open brick membership, same opacity-corrected compositing
and early termination — fragRaycast.glsl:113-215), but organized for TPU
throughput instead of per-sample clarity:

  * samples are processed in (rays × chunk) blocks so the density fetch is
    ONE large batched gather per chunk — XLA:TPU's vectorized VMEM gather
    sustains ~370G elements/s from a VMEM-resident brick (measured,
    benchmarks/probe_gather.py), vs ~50 µs fixed cost for tiny gathers;
  * per-chunk compositing uses exclusive cumulative transmittance products
    instead of a serial per-sample scan: over-compositing is associative,
    so the chunk's contribution folds into the carried (rgb, a) in closed
    form — the same structure ring/blockwise attention uses for partial
    softmax states (SURVEY.md §5.7);
  * early termination is EXACT: a sample is excluded iff the accumulated
    alpha *before* it exceeds the threshold, which is computable from the
    unmasked prefix transmittance because alpha is monotone (see
    ``_composite_chunk``);
  * per-brick work is wrapped in ``jax.checkpoint`` so reverse-mode AD
    recomputes chunks instead of saving O(rays × samples) residuals.

The brick loop is a Python loop (unrolled at trace time): brick counts per
pass are small (the multipass batching of GLRaycastPipeline.cpp:148-163
bounds the working set), and unrolling lets XLA overlap HBM→VMEM brick
moves with compute.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libre_tpu.ops import rays as ray_ops
from libre_tpu.ops import transfer_function as tf_ops
from libre_tpu.ops.reference import (
    ALPHA_CLAMP,
    BrickSet,
    Camera,
    RenderParams,
)


def _exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """prod_{j<i} x_j along ``axis`` (1 at index 0)."""
    cp = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jnp.take(cp, jnp.asarray([0]), axis=axis))
    return jnp.concatenate([one, jax.lax.slice_in_dim(cp, 0, x.shape[axis] - 1, axis=axis)], axis=axis)


def _composite_chunk(
    rgb: jnp.ndarray,  # (R, 3) carried premultiplied color
    a: jnp.ndarray,  # (R,) carried alpha
    src: jnp.ndarray,  # (R, C, 4) chunk TF samples
    alpha_corrected: jnp.ndarray,  # (R, C) opacity-corrected per-sample alpha
    valid: jnp.ndarray,  # (R, C) membership mask
    early_exit: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold one chunk of samples into the carry, in closed form.

    Equivalent to compositing the samples serially front-to-back with the
    reference's early-exit rule (skip a sample iff accumulated alpha before
    it exceeds ``early_exit``).  Monotonicity of alpha makes the exact
    early-exit mask computable from the *unmasked* prefix transmittance.
    """
    alpha_v = alpha_corrected * valid.astype(alpha_corrected.dtype)
    t_excl_u = _exclusive_cumprod(1.0 - alpha_v, axis=1)  # (R, C)
    global_before = a[:, None] + (1.0 - a[:, None]) * (1.0 - t_excl_u)
    m = global_before <= early_exit
    alpha_eff = alpha_v * m.astype(alpha_v.dtype)
    t_excl = _exclusive_cumprod(1.0 - alpha_eff, axis=1)
    w = alpha_eff * t_excl  # per-sample weight within the chunk
    chunk_rgb = jnp.einsum("rc,rcd->rd", w, src[..., :3])
    chunk_trans = jnp.prod(1.0 - alpha_eff, axis=1)
    one_minus_a = 1.0 - a
    rgb = rgb + one_minus_a[:, None] * chunk_rgb
    a = a + one_minus_a * (1.0 - chunk_trans)
    return rgb, a


def _fetch_nearest(brick_flat, tex_pos, dims_xyz):
    dims = jnp.asarray(dims_xyz, jnp.float32)
    idx = jnp.clip(
        jnp.floor(tex_pos * dims).astype(jnp.int32),
        0,
        jnp.asarray([d - 1 for d in dims_xyz], jnp.int32),
    )
    flat = (idx[..., 2] * dims_xyz[1] + idx[..., 1]) * dims_xyz[0] + idx[..., 0]
    return jnp.take(brick_flat, flat, axis=0)


def _fetch_trilinear(brick_flat, tex_pos, dims_xyz):
    dims = jnp.asarray(dims_xyz, jnp.float32)
    s = tex_pos * dims - 0.5
    s = jnp.clip(s, 0.0, dims - 1.0)
    i0 = jnp.floor(s).astype(jnp.int32)
    hi = jnp.asarray([d - 1 for d in dims_xyz], jnp.int32)
    i1 = jnp.minimum(i0 + 1, hi)
    w = s - jnp.floor(s)
    nx, ny = dims_xyz[0], dims_xyz[1]

    def flat(ix, iy, iz):
        return (iz * ny + iy) * nx + ix

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = i1[..., 0] if dx else i0[..., 0]
                iy = i1[..., 1] if dy else i0[..., 1]
                iz = i1[..., 2] if dz else i0[..., 2]
                wx = w[..., 0] if dx else 1.0 - w[..., 0]
                wy = w[..., 1] if dy else 1.0 - w[..., 1]
                wz = w[..., 2] if dz else 1.0 - w[..., 2]
                out = out + jnp.take(brick_flat, flat(ix, iy, iz), axis=0) * (
                    wx * wy * wz
                )
    return out


def _march_brick(
    carry,
    brick,  # (BZ, BY, BX)
    wmin,
    wmax,
    tmin,
    tmax,
    eye,
    dirs,
    t_near_plane,
    tn_global,
    hit_global,
    tf,
    clip_bounds,  # None or (t_clip_lo, t_clip_hi)
    params: RenderParams,
    max_steps: int,
    chunk: int,
):
    rgb, a = carry
    step = params.step_size
    lo, hi = params.data_source_range
    mult = 1.0 / (hi - lo)
    add = -lo / (hi - lo)
    bz, by, bx = brick.shape
    brick_flat = brick.reshape(-1)

    t0, t1, hit = ray_ops.intersect_box(eye, dirs, wmin, wmax)
    tnear = jnp.maximum(t0, t_near_plane)
    n0 = jnp.floor((tnear - tn_global) / step).astype(jnp.int32) - 1
    n_start = jnp.ceil(jnp.maximum(t_near_plane - tn_global, 0.0) / step).astype(
        jnp.int32
    )
    valid_ray = hit & hit_global
    tex_scale = tmax - tmin

    n_chunks = -(-max_steps // chunk)
    fetch = _fetch_nearest if params.filter_mode == "nearest" else _fetch_trilinear

    def chunk_body(carry, c):
        rgb, a = carry
        k = c * chunk + jnp.arange(chunk, dtype=jnp.int32)  # (C,)
        n = n0[:, None] + k[None, :]  # (R, C)
        t = tn_global[:, None] + n.astype(jnp.float32) * step
        pos = eye + dirs[:, None, :] * t[..., None]  # (R, C, 3)
        inside = jnp.all((pos >= wmin) & (pos < wmax), axis=-1)
        m = valid_ray[:, None] & inside & (n >= n_start[:, None])
        if clip_bounds is not None:
            t_clip_lo, t_clip_hi = clip_bounds
            m = m & (t >= t_clip_lo[:, None]) & (t < t_clip_hi[:, None])
        u = (pos - wmin) / (wmax - wmin)
        tex_pos = u * tex_scale + tmin
        raw = fetch(brick_flat, tex_pos, (bx, by, bz))
        density = jnp.clip(raw * mult + add, 0.0, 1.0)
        src = tf_ops.lookup(tf, density)  # (R, C, 4)
        alpha = 1.0 - jnp.power(
            1.0 - jnp.minimum(src[..., 3], ALPHA_CLAMP), params.alpha_correction
        )
        rgb, a = _composite_chunk(rgb, a, src, alpha, m, params.early_exit)
        return (rgb, a), None

    body = jax.checkpoint(chunk_body) if params.remat else chunk_body
    (rgb, a), _ = jax.lax.scan(
        body, (rgb, a), jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return rgb, a


def render_rays(
    bricks: BrickSet,
    tf: jnp.ndarray,
    eye: jnp.ndarray,
    dirs: jnp.ndarray,  # (R, 3)
    t_near_plane: jnp.ndarray,  # (R,)
    params: RenderParams,
    global_min,
    global_max,
    clip_planes: Optional[np.ndarray] = None,
    brick_order: Optional[np.ndarray] = None,
    max_steps: Optional[int] = None,
    chunk: int = 32,
    init_carry: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """March a flat batch of rays through a brick set → (R, 4).

    ``brick_order`` must be the host-computed front-to-back order (static);
    defaults to range(N) (i.e. bricks already sorted).  ``init_carry`` is
    the per-ray (rgb, a) accumulated by earlier memory-bounded passes
    (the accumulation texture persisting across multipass batches,
    GLRaycastPipeline.cpp:148-186 / fragRaycast.glsl:115) — passing it
    keeps early termination exact across pass boundaries.
    """
    n_bricks = bricks.num_bricks
    step = params.step_size

    tn_global, _, hit_global = ray_ops.intersect_box(
        eye, dirs, jnp.asarray(global_min), jnp.asarray(global_max)
    )

    if clip_planes is not None and len(clip_planes) > 0:
        clip_bounds = ray_ops.clip_ray(
            eye,
            dirs,
            jnp.full(dirs.shape[:-1], -3e38, jnp.float32),
            jnp.full(dirs.shape[:-1], 3e38, jnp.float32),
            clip_planes,
        )
    else:
        clip_bounds = None

    if max_steps is None:
        try:
            diag = np.linalg.norm(
                np.asarray(jax.lax.stop_gradient(bricks.world_max))
                - np.asarray(jax.lax.stop_gradient(bricks.world_min)),
                axis=-1,
            )
        except jax.errors.TracerArrayConversionError as exc:
            raise ValueError(
                "render_rays: pass max_steps explicitly when brick metadata "
                "is traced (inside jit) — the march trip count must be static"
            ) from exc
        max_steps = int(math.ceil(float(diag.max()) / step)) + 4

    order = range(n_bricks) if brick_order is None else [int(i) for i in brick_order]

    if init_carry is not None:
        rgb, a = init_carry
    else:
        rgb = jnp.zeros((dirs.shape[0], 3), jnp.float32)
        a = jnp.zeros((dirs.shape[0],), jnp.float32)
    for i in order:
        rgb, a = _march_brick(
            (rgb, a),
            bricks.data[i],
            bricks.world_min[i],
            bricks.world_max[i],
            bricks.tex_min[i],
            bricks.tex_max[i],
            eye,
            dirs,
            t_near_plane,
            tn_global,
            hit_global,
            tf,
            clip_bounds,
            params,
            max_steps,
            chunk,
        )
    return jnp.concatenate([rgb, a[:, None]], axis=-1)


def render(
    bricks: BrickSet,
    tf: jnp.ndarray,
    camera: Camera,
    params: RenderParams,
    global_min,
    global_max,
    clip_planes: Optional[np.ndarray] = None,
    brick_order: Optional[np.ndarray] = None,
    chunk: int = 32,
    max_steps: Optional[int] = None,
) -> jnp.ndarray:
    """Render to an (H, W, 4) image (bottom-up rows, like GL)."""
    vx, vy, vw, vh = camera.viewport
    images = []
    for s in range(params.samples_per_pixel):
        eye, dirs, cos_z, _ = ray_ops.make_rays(
            camera.inv_proj, camera.inv_mv, camera.viewport, sample_index=s
        )
        dirs = dirs.reshape(-1, 3)
        tnp_ = ray_ops.near_plane_t(cos_z.reshape(-1), camera.near)
        img = render_rays(
            bricks,
            tf,
            eye,
            dirs,
            tnp_,
            params,
            global_min,
            global_max,
            clip_planes,
            brick_order,
            chunk=chunk,
            max_steps=max_steps,
        )
        images.append(img)
    out = sum(images) / float(params.samples_per_pixel)
    return out.reshape(vh, vw, 4)


def sort_bricks_front_to_back(
    world_min: np.ndarray, world_max: np.ndarray, eye: np.ndarray
) -> np.ndarray:
    """Host-side front-to-back brick order by center distance
    (GLRaycastPipeline.cpp:106-126 DistanceOperator)."""
    centers = (np.asarray(world_min) + np.asarray(world_max)) * 0.5
    dist = np.linalg.norm(centers - np.asarray(eye), axis=-1)
    return np.argsort(dist, kind="stable")
