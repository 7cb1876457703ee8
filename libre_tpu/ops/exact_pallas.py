"""Pallas exact perspective marcher — reference sampling at kernel speed.

The general-camera "exact" path (ops/raycast.py, backing
``RenderEngine.render``) reproduces the reference's per-sample semantics
(fragRaycast.glsl:113-215) but leans on XLA:TPU's gather, which serializes
(~90 M elem/s measured, benchmarks/probe_pallas_gather.py) — 0.009 Mrays/s
at 64³/256²×512.  Mosaic lowers no arbitrary gather either ("Only 2D
gather is supported"), so a fast exact marcher cannot fetch 8 trilinear
corners per sample directly.  This kernel restructures the march so no
arbitrary gather exists:

* **Slab bucketing.**  Samples live on the reference's global arc-length
  grid ``t_n = tnGlobal + n·step`` (fragRaycast.glsl:152-158).  Along the
  host-chosen major axis, a sample's interpolation cell index
  ``i0 = floor(clip(tex·N − ½, 0, N−1))`` is monotone in ``n`` for every
  ray, so each ray's samples in cell (slab) ``k`` form a contiguous index
  window.  The Pallas grid iterates slabs front-to-back (per direction
  sign); the two bracketing volume slices stream HBM→VMEM via
  scalar-prefetch BlockSpecs — the same streaming structure as the
  bricked fast path, now carrying exact per-ray sampling.
* **Bounded-window trilinear.**  Within a slab, a sample needs a
  bilinear fetch at an arbitrary in-plane position.  The B (lane) axis
  taps are lane-wise ``take_along_axis`` gathers — the one 2-D gather
  form Mosaic lowers (ops/shearwarp_bricked.py, ~1 tile/cycle) — over a
  dynamic C-WINDOW of the slice pair: within one 128-ray row, a slab
  crossing touches only a narrow c-band (host-verified bound, typically
  8-16 rows of 64+), so the C-axis 2-tap mask-reduce and the axis lerp
  run on (2·Wc, 128) tiles instead of the full slice height.  Per-slot
  position math is batched over all candidate slots ((S, 128) VPU
  blocks) before a statically unrolled fetch loop.
* **Exact compositing, closed form.**  All of a slab's slots composite
  at once through the exclusive-transmittance-product formulation with
  the reference's EXACT early-exit rule (a sample is excluded iff
  accumulated alpha before it exceeds the threshold — computable from
  the unmasked prefix product because alpha is monotone; the same
  closed form as ops/raycast._composite_chunk), plus a batched
  two-half-table TF lookup.  Saturated ray rows skip their slot work;
  a fully saturated ray block skips remaining slabs via an SMEM flag.

Measured on v5e (64³ → 256²×512, chained-frame marginal): ~30 ms/frame
≈ 2.0-2.3 Mrays/s, >200× the XLA gather marcher; saturating scenes
1.3 ms (50 Mrays/s) through the early-exit skips.  Optimization ladder:
one-hot-MXU fetch + serial per-slot compositing 236 ms → gather fetch +
per-row slot budgets 119 ms → c-window + batched TF + closed-form
composite 31.5 ms.

Since r5 the marcher is CAMERA-AGNOSTIC: camera matrices, eye, brick
placement, and per-ray constants are runtime operands of frame
functions cached per (shape × tier) signature (``_compiled_group``), so
an orbiting camera re-plans in numpy (``plan_exact``, O(R)) and NEVER
recompiles — 1.8 Mrays/s streaming with a new pose every frame,
``compile_count()`` asserted flat in bench and tests.  It is also
DIFFERENTIABLE at kernel speed: :func:`render_exact_diff` pairs the
forward with a fused recompute backward sweep
(:func:`_make_exact_bwd_kernel`) whose density/TF gradients match
``jax.grad`` of the reference oracle to 1e-4 (0.85 Mrays/s fwd+bwd —
the reference has no autodiff at all, and the prior exact-diff path ran
at 0.009 Mrays/s forward-only).

Rays whose direction component along the chosen axis is too small (their
per-slab sample window would exceed ``max_slots``) are excluded on the
host and marched by the XLA fallback (ops/raycast.render_rays); mixed
direction signs split into two kernel calls with opposite slab orders.
For common perspective cameras both sets are empty/singular.

Parity: == ops/reference.render_reference (atol ~2e-5, f32 matmul
precision) for any brick whose march ``max_steps`` does not truncate the
reference (the default sizing).  Supports carry-in/out, so multi-brick
front-to-back marches compose exactly like ops/raycast.render_rays.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libre_tpu.ops import rays as ray_ops
from libre_tpu.ops.reference import ALPHA_CLAMP, Camera, RenderParams

TF_SIZE = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ------------------------------------------------------------------ planning
# Tier tables: the window sizes are COMPILE-TIME kernel constants, so a
# camera-continuous quantity (worst slot count, c-window height) must be
# bucketed for an orbiting camera to reuse compilations.  Bucketing UP
# is correctness-preserving — every slot re-tests membership exactly and
# a taller c-window still covers every tap — it only adds masked work
# (≤ the tier ratio, ≤ 1.5×).
_SLOT_TIERS = (
    2, 3, 4, 5, 6, 8, 10, 12, 14, 16, 20, 24, 32, 48, 64, 96, 128,
)
_WC_TIERS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)


def _tier_up(x: int, tiers) -> int:
    for t in tiers:
        if x <= t:
            return t
    return _round_up(x, tiers[-1])


@dataclasses.dataclass(frozen=True)
class _Group:
    """One homogeneous kernel invocation: rays sharing slab-axis sign."""

    ray_idx: np.ndarray  # (Rg,) indices into the flat ray batch
    sign: int  # +1: marching increases slab coord; -1 decreases
    smax: int  # per-slab slot-window length (interior slabs), tiered
    extra: int  # additional slots for the edge bucket (k == 0), tiered
    w_c: int  # c-window height covering any 128-ray row's slab crossing


@dataclasses.dataclass(frozen=True)
class ExactPlan:
    """Host-side plan for one (camera × brick geometry) pair.

    CONTAINS NO COMPILED CONSTANTS: the camera matrices, eye, and the
    world→texture mapping are runtime operands of a kernel cached per
    (shape, tier) signature — a new camera pose re-plans (cheap numpy)
    but does NOT recompile (GLRaycastRenderer.cpp:222-348 renders any
    pose with uniforms; this is the TPU equivalent).  The per-ray
    constants (dirs, entry t, validity) are computed INSIDE the jitted
    frame function with the same jnp ops the reference marcher uses, so
    parity-critical f32 rounding matches by construction; the numpy
    planning replica below only takes conservative decisions (grouping,
    window bounds) with explicit margins."""

    axis: int  # world axis (0=x, 1=y, 2=z) used for slabs
    b_axis: int
    c_axis: int
    groups: Tuple[_Group, ...]
    fallback_idx: np.ndarray  # rays marched by ops/raycast
    camera: Camera
    sample_index: int
    # Brick geometry (world (x, y, z) order):
    world_min: np.ndarray
    world_max: np.ndarray
    tex_min: np.ndarray
    tex_max: np.ndarray
    global_min: np.ndarray  # global sample-grid box (== world box when
    global_max: np.ndarray  # the brick IS the whole volume)
    brick_shape: Tuple[int, int, int]  # (Z, Y, X)
    params: RenderParams
    n_rays: int
    viewport: Tuple[int, int, int, int]
    clip_planes: Optional[np.ndarray] = None


@functools.lru_cache(maxsize=32)
def _jitter_frag(viewport, sample_index):
    """Jittered fragment coords for a (viewport, sample_index) pair,
    computed ON DEVICE and cached as numpy — camera-independent.

    glsl_rand's ``fract(43758·sin(·))`` amplifies the ulp-level
    disagreement between numpy's and XLA's ``sin`` into fully
    decorrelated jitter, so a numpy replica cannot stand in for the
    values the in-jit ray builder will produce; the grid depends only
    on the viewport, so one fetch serves every camera."""
    vx, vy, vw, vh = viewport
    px = jnp.arange(vw, dtype=jnp.float32) + 0.5 + vx
    py = jnp.arange(vh, dtype=jnp.float32) + 0.5 + vy
    fx, fy = jnp.meshgrid(px, py, indexing="xy")
    i = jnp.float32(sample_index)
    fx = fx + ray_ops.glsl_rand(fx * i, fy * i) * 0.5
    fy = fy + ray_ops.glsl_rand(fx * 2 * i, fy * 2 * i) * 0.5
    return np.asarray(fx, np.float32), np.asarray(fy, np.float32)


def _np_make_rays(camera: Camera, sample_index: int = 0):
    """Numpy replica of ops/rays.make_rays for PLANNING ONLY (grouping,
    window bounds) — conservative margins absorb its ulp-level
    disagreement with the in-jit jnp values the kernel actually
    consumes.  Jitter comes from the device (see :func:`_jitter_frag`)."""
    vx, vy, vw, vh = camera.viewport
    inv_proj = np.asarray(camera.inv_proj, np.float32)
    inv_mv = np.asarray(camera.inv_mv, np.float32)
    if sample_index > 0:
        fx, fy = _jitter_frag(tuple(camera.viewport), sample_index)
    else:
        px = np.arange(vw, dtype=np.float32) + np.float32(0.5) + np.float32(
            vx
        )
        py = np.arange(vh, dtype=np.float32) + np.float32(0.5) + np.float32(
            vy
        )
        fx, fy = np.meshgrid(px, py, indexing="xy")
    ndc_x = 2.0 * (fx - vx - vw / 2.0) / vw
    ndc_y = 2.0 * (fy - vy - vh / 2.0) / vh
    ones = np.ones_like(ndc_x)
    ndc = np.stack([ndc_x, ndc_y, ones, ones], axis=-1).astype(np.float32)
    eye_space = ndc @ inv_proj.T
    eye_space = eye_space / eye_space[..., 3:4]
    world = eye_space @ inv_mv.T
    eye = inv_mv[:3, 3]
    dirs = world[..., :3] - eye
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return (
        eye.astype(np.float32),
        dirs.reshape(-1, 3).astype(np.float32),
    )


def _np_intersect_box(eye, dirs, bmin, bmax, eps=1e-10):
    d = np.where(dirs == 0.0, np.float32(eps), dirs)
    inv = 1.0 / d
    tbot = inv * (np.asarray(bmin, np.float32) - eye)
    ttop = inv * (np.asarray(bmax, np.float32) - eye)
    t0 = np.minimum(ttop, tbot).max(axis=-1)
    t1 = np.maximum(ttop, tbot).min(axis=-1)
    return t0, t1


def _c_window_bound(
    idx, sign, smax, extra, *, dirs, tn, valid,
    e_a, e_c, s_a, o_a, s_c, o_c, na, nc, step, a_axis, c_axis,
) -> int:
    """Smallest safe c-window height for a group, O(R) vectorized.

    Per ray, the c-cell position of the slot window at slab k is
    ``pc + (qc/qa)·(bound_k − pa) + qc·δ`` with floor/window slack
    δ ∈ [−1, slots] — LINEAR in k (bound_k is k, or k+1 for sign < 0).
    The per-row spread max(U) − min(L) is therefore convex in k, so the
    max over interior slabs is attained at an endpoint: evaluating at
    k ∈ {edge bucket, first interior, last} bounds every slab.  The
    unclipped evaluation dominates the old clipped per-slab loop
    (clipping is 1-Lipschitz), so this bound is ≥ the r4 bound —
    conservative, +4 margin for the second tap and f32/numpy slack,
    rounded to a sublane multiple.  (The r4 implementation looped over
    all ``na`` slabs in Python — O(na·R) host time per camera, which
    made per-frame replanning the bottleneck; VERDICT r4 item 1.)"""
    r = len(idx)
    rr = _round_up(max(r, 1), 128) // 128
    pad = rr * 128 - r

    def f(x, fill):
        return np.concatenate(
            [np.asarray(x, np.float32)[idx],
             np.full(pad, fill, np.float32)]
        ).reshape(rr, 128)

    da = f(dirs[:, a_axis], 1.0)
    dc = f(dirs[:, c_axis], 0.0)
    tnp_ = f(tn, 0.0)
    v = f(valid, 0.0) > 0
    qa = da * np.float32(step * s_a * na)
    qa = np.where(np.abs(qa) < 1e-12, np.float32(1.0), qa)
    pa = ((e_a + da * tnp_) * s_a + o_a) * na - 0.5
    qc = dc * np.float32(step * s_c * nc)
    pc = ((e_c + dc * tnp_) * s_c + o_c) * nc - 0.5
    # Per-eval invariants hoisted (planning runs EVERY frame of an
    # orbit; keep it a handful of f32 passes per sample point).
    inv_qa = (1.0 / qa).astype(np.float32)
    pa_n = (pa * inv_qa).astype(np.float32)
    inval_u = np.where(v, np.float32(0.0), np.float32(-np.inf))
    inval_l = np.where(v, np.float32(0.0), np.float32(np.inf))

    def slot_deltas(slots):
        return (qc * np.float32(slots)).astype(np.float32)

    def row_bounds(bound, d_slots):
        """Per-row (min clipped L, max clipped U) of the EXACT slot
        window at one slab bound (same integer nlo as the kernel's
        guard; monotone in the slab index per ray, so adjacent-sample
        combines bound the slabs in between).  Clipping to [0, nc-1]
        matches the kernel's c_base clamp (a ray parked outside
        contributes its edge cell)."""
        nlo = np.ceil(np.float32(bound) * inv_qa - pa_n) - 1.0
        c0 = pc + qc * nlo
        c1 = c0 + d_slots
        u = np.clip(np.maximum(c0, c1), 0.0, nc - 1.0) + inval_u
        l = np.clip(np.minimum(c0, c1), 0.0, nc - 1.0) + inval_l
        return l.min(axis=1), u.max(axis=1)

    # Each per-ray clipped bound is MONOTONE in the slab index (linear,
    # then clipped), so over any k-interval the row max of U (min of L)
    # is attained at one of the interval's ends: sampling S points along
    # the interior range and combining ADJACENT samples bounds every
    # slab in between, staying per-slab-local up to one interval's
    # drift (a handful of c-cells).  The r4 implementation evaluated
    # all ``na`` slabs exactly — O(na·R) host time per camera; this is
    # O(S·R) with S = 17 and a bound at most one interval looser.
    if sign > 0:
        edge = (-0.6, smax + extra)
        k_lo, k_hi = 1.0, float(max(na - 1, 1))
    else:
        edge = (1.0, smax + extra)
        k_lo, k_hi = 2.0, float(max(na, 2))
    w = 0.0
    le, ue = row_bounds(edge[0], slot_deltas(edge[1]))
    spread = np.where(np.isfinite(le), ue - le, 0.0)
    if spread.size:
        w = max(w, float(spread.max()))
    n_samp = int(min(33, max(2, na)))
    ks = np.linspace(k_lo, k_hi, n_samp)
    d_int = slot_deltas(smax)
    bounds_k = [row_bounds(float(k), d_int) for k in ks]
    for i in range(len(bounds_k) - 1):
        l0, u0 = bounds_k[i]
        l1, u1 = bounds_k[i + 1]
        row_min = np.minimum(l0, l1)
        row_max = np.maximum(u0, u1)
        spread = np.where(
            np.isfinite(row_min), row_max - row_min, 0.0
        )
        if spread.size:
            w = max(w, float(spread.max()))
    w = min(w, float(nc))  # window never needs to exceed the slice
    # +3: second trilinear tap (+1), integer ceil of the real-valued
    # span (+1), f32/planner-vs-kernel rounding (+1).  The in-kernel
    # check_window guard verifies this bound under debug.
    return max(_round_up(int(np.ceil(w)) + 3, 8), 8)


def plan_exact(
    camera: Camera,
    params: RenderParams,
    world_min,
    world_max,
    brick_shape: Tuple[int, int, int],
    tex_min=(0.0, 0.0, 0.0),
    tex_max=(1.0, 1.0, 1.0),
    global_min=None,
    global_max=None,
    clip_planes: Optional[np.ndarray] = None,
    axis: Optional[int] = None,
    max_slots: int = 48,
    sample_index: int = 0,
) -> ExactPlan:
    """Build the static plan for one camera over one brick geometry.

    ``global_min/max`` default to the brick box (single-brick case); for
    multi-brick marches pass the global volume box so the sample grid is
    shared across bricks (fragRaycast.glsl:152-158).

    Numpy-only and O(R): no device round trips, no compiled constants —
    safe to run EVERY FRAME of an orbit.  Its decisions are
    conservative with explicit margins (a ray the replica mis-judges as
    hitting is masked by the kernel's exact in-jit validity; a ray near
    the sign/obliqueness boundary goes to the fallback)."""
    wmin = np.asarray(world_min, np.float32)
    wmax = np.asarray(world_max, np.float32)
    gmin = wmin if global_min is None else np.asarray(global_min, np.float32)
    gmax = wmax if global_max is None else np.asarray(global_max, np.float32)
    tmin = np.asarray(tex_min, np.float32)
    tmax = np.asarray(tex_max, np.float32)

    eye, dirs = _np_make_rays(camera, sample_index)
    n_rays = dirs.shape[0]
    tn_global, t1g = _np_intersect_box(eye, dirs, gmin, gmax)
    if np.array_equal(gmin, wmin) and np.array_equal(gmax, wmax):
        t0b, t1b = tn_global, t1g  # single-brick: same box
    else:
        t0b, t1b = _np_intersect_box(eye, dirs, wmin, wmax)
    # CONSERVATIVE validity: 1e-5 worth of t-margin covers numpy-vs-jnp
    # ulp disagreement; a host-valid/device-invalid ray is masked in
    # kernel, the reverse would silently drop a ray.
    eps = np.float32(1e-5)
    valid = (
        (t1g >= tn_global - eps) & (t1b >= t0b - eps) & (t1b >= -eps)
    ).astype(np.float32)

    # Axis choice: maximize the worst |d_axis| over rays that can hit.
    act = valid > 0
    if axis is None:
        if act.any():
            worst = [np.min(np.abs(dirs[act, q])) for q in range(3)]
        else:
            worst = [abs(float(d)) for d in dirs.mean(axis=0)]
        axis = int(np.argmax(worst))
    rem = [q for q in range(3) if q != axis]
    b_axis, c_axis = rem[0], rem[1]

    # Per-ray slab-coordinate velocity (cells per sample step).
    dim_a = brick_shape[2 - axis]
    s_a = (tmax[axis] - tmin[axis]) / (wmax[axis] - wmin[axis])
    q_cells = dirs[:, axis] * np.float32(params.step_size) * s_a * dim_a

    groups: List[_Group] = []
    fallback = np.zeros(n_rays, bool)
    for sign in (1, -1):
        sel = act & (np.sign(q_cells) == sign)
        if not sel.any():
            continue
        qa = np.abs(q_cells[sel])
        # Rays so oblique to the axis that their window would blow up
        # go to the XLA fallback instead of inflating every slab.  The
        # relative margin keeps a ray whose |q| the jnp path could
        # round across the threshold out of the kernel groups.
        qfloor = (1.0 / max(max_slots - 3, 1)) * 1.001 + 1e-7
        bad = qa < qfloor
        if bad.any():
            idx = np.where(sel)[0]
            fallback[idx[bad]] = True
            sel = sel & ~fallback
            qa = np.abs(q_cells[sel])
        if not sel.any():
            continue
        qmin = float(qa.min()) * 0.9999  # ulp margin before the reciprocal
        # The window bound uses the RAW slot counts (member samples
        # never exist beyond them); the kernel's tiered counts only add
        # masked slots, which the c-window need not cover.
        smax_raw = int(math.ceil(1.0 / qmin)) + 2
        extra_raw = int(math.ceil(0.6 / qmin)) + 1
        smax = _tier_up(smax_raw, _SLOT_TIERS)
        extra = _tier_up(extra_raw, _SLOT_TIERS)
        gidx = np.where(sel)[0]
        w_c = _c_window_bound(
            gidx, sign, smax_raw, extra_raw,
            dirs=dirs, tn=tn_global, valid=valid,
            e_a=float(eye[axis]), e_c=float(eye[c_axis]),
            s_a=float((tmax[axis] - tmin[axis]) / (wmax[axis] - wmin[axis])),
            o_a=float(
                tmin[axis]
                - wmin[axis]
                * (tmax[axis] - tmin[axis])
                / (wmax[axis] - wmin[axis])
            ),
            s_c=float(
                (tmax[c_axis] - tmin[c_axis]) / (wmax[c_axis] - wmin[c_axis])
            ),
            o_c=float(
                tmin[c_axis]
                - wmin[c_axis]
                * (tmax[c_axis] - tmin[c_axis])
                / (wmax[c_axis] - wmin[c_axis])
            ),
            na=brick_shape[2 - axis],
            nc=brick_shape[2 - c_axis],
            step=float(params.step_size),
            a_axis=axis,
            c_axis=c_axis,
        )
        groups.append(
            _Group(
                ray_idx=gidx.astype(np.int32),
                sign=sign,
                smax=smax,
                extra=extra,
                w_c=_tier_up(w_c, _WC_TIERS),
            )
        )

    return ExactPlan(
        axis=axis,
        b_axis=b_axis,
        c_axis=c_axis,
        groups=tuple(groups),
        fallback_idx=np.where(fallback)[0].astype(np.int32),
        camera=camera,
        sample_index=sample_index,
        world_min=wmin,
        world_max=wmax,
        tex_min=tmin,
        tex_max=tmax,
        global_min=gmin,
        global_max=gmax,
        brick_shape=tuple(int(s) for s in brick_shape),
        params=params,
        n_rays=n_rays,
        viewport=camera.viewport,
        clip_planes=None
        if clip_planes is None
        else np.asarray(clip_planes, np.float32),
    )


# ------------------------------------------------------------------- kernel
def _make_exact_kernel(
    *,
    na: int,
    nb: int,
    nc: int,
    nb_pad: int,
    nc_pad: int,
    rrb: int,
    smax: int,
    extra: int,
    w_c: int,
    step: float,
    mult: float,
    add: float,
    alpha_correction: float,
    early_exit: float,
    trilinear: bool,
    sign: int,
    check_window: bool = False,
):
    """Kernel body factory; shapes/tiers are compile-time static, but
    the CAMERA GEOMETRY is a runtime scalar-prefetch operand
    ``geom_ref`` = [e_a, e_b, e_c, s_a, s_b, s_c, o_a, o_b, o_c] (eye
    and the per-axis world→texture MAD) — a new camera pose or brick
    placement re-plans without recompiling, the TPU analog of the
    reference's per-frame uniforms (GLRaycastRenderer.cpp:222-348).

    Ray-pack rows: 0 d_a, 1 d_b, 2 d_c, 3 tn_global, 4 n_start,
    5 valid, 6 t_lo, 7 t_hi.

    Structure per (slab, ray row): slot position math is computed for
    all ``smax + extra`` candidate samples at once ((S, 128) VPU
    blocks), then a fori loop composites serially per slot.  The
    trilinear fetch is gather-based: the two b-axis taps are lane-wise
    ``take_along_axis`` over a (2·Wc, 128) c-WINDOW of the slice pair —
    within one 128-ray row, a slab crossing touches only a narrow
    c-band (host-verified bound ``w_c``), so the c-tap mask-reduce runs
    on Wc rows instead of the full slice height.  No arbitrary gather
    and no one-hot matmul anywhere.
    """
    s_tot = smax + extra
    dim_a_f = np.float32(na)
    dim_b_f = np.float32(nb)
    dim_c_f = np.float32(nc)
    qfloor = np.float32(1e-12)
    w_c = min(w_c, nc_pad)
    two_w = 2 * w_c

    def _body(
        idx0_ref,  # (A,) i32 scalar prefetch: slab index at grid step j
        idx1_ref,  # (A,) i32: hi-slice index (min(k+1, na-1))
        geom_ref,  # (16,) f32 scalar prefetch: eye + world→tex MAD
        lo_ref,  # (1, nc_pad, nb_pad) slice k
        hi_ref,  # (1, nc_pad, nb_pad) slice min(k+1, na-1)
        tf_ref,  # (8, 128) TF half-tables [2*ch + half]
        ray_ref,  # (8, rrb, 128) per-ray constants
        cin_ref,  # (4, rrb, 128) carry-in rgba
        out_ref,  # (4, rrb, 128) carry-out rgba
        vcat_ref,  # scratch (2*nc_pad, nb_pad) slice pair
        dens_ref,  # scratch (s_tot, 128) per-slot raw densities
        done_ref,  # SMEM (1,) i32: this ray block fully saturated
        any_ref,  # SMEM (1,) i32: any row still active this slab
        ovf_ref=None,  # (1, 8, 128) f32 c-window overflow flag (debug)
    ):
        j = pl.program_id(1)
        e_a, e_b, e_c = geom_ref[0], geom_ref[1], geom_ref[2]
        s_a, s_b, s_c = geom_ref[3], geom_ref[4], geom_ref[5]
        o_a, o_b, o_c = geom_ref[6], geom_ref[7], geom_ref[8]

        @pl.when(j == 0)
        def _():
            out_ref[:] = cin_ref[:]
            done_ref[0] = 0
            if check_window:
                ovf_ref[0] = jnp.zeros((8, 128), jnp.float32)

        @pl.when(done_ref[0] == 0)
        def _():
            k = idx0_ref[j]
            k_f = k.astype(jnp.float32)
            any_ref[0] = 0
            vcat_ref[:nc_pad, :] = lo_ref[0]
            vcat_ref[nc_pad:, :] = hi_ref[0]

            rows_s = jax.lax.broadcasted_iota(
                jnp.int32, (s_tot, 128), 0
            ).astype(jnp.float32)
            # Window-relative c rows, [0..Wc).
            crf_w = jax.lax.broadcasted_iota(
                jnp.int32, (w_c, 128), 0
            ).astype(jnp.float32)

            def row_body(i, _):
                d_a = ray_ref[0, pl.ds(i, 1), :]
                d_b = ray_ref[1, pl.ds(i, 1), :]
                d_c = ray_ref[2, pl.ds(i, 1), :]
                tn = ray_ref[3, pl.ds(i, 1), :]
                nstart = ray_ref[4, pl.ds(i, 1), :]
                validf = ray_ref[5, pl.ds(i, 1), :]
                cl_lo = ray_ref[6, pl.ds(i, 1), :]
                cl_hi = ray_ref[7, pl.ds(i, 1), :]

                a0 = out_ref[3, pl.ds(i, 1), :]
                row_live = (
                    jnp.max(validf * (a0 <= early_exit).astype(jnp.float32))
                    > 0.0
                )

                @pl.when(row_live)
                def _():
                    any_ref[0] = 1

                @pl.when(row_live)
                def _():
                    r0 = out_ref[0, pl.ds(i, 1), :]
                    g0 = out_ref[1, pl.ds(i, 1), :]
                    b0 = out_ref[2, pl.ds(i, 1), :]

                    # First candidate sample of each ray in slab k (1-slot
                    # guard for float rounding; membership re-tested
                    # exactly per slot).
                    q = d_a * (s_a * np.float32(step)) * dim_a_f
                    q = jnp.where(jnp.abs(q) < qfloor, 1.0, q)
                    p0 = ((e_a + d_a * tn) * s_a + o_a) * dim_a_f - 0.5
                    if trilinear:
                        if sign > 0:
                            bound = jnp.where(
                                k == 0, jnp.float32(-0.6), k_f
                            )
                        else:
                            bound = k_f + 1.0
                    else:
                        bound = k_f if sign > 0 else k_f + 1.0
                    nf0 = jnp.ceil((bound - p0) / q) - 1.0  # (1, 128)

                    # ---- batched slot position math: (s_tot, 128) ----
                    n_mat = nf0 + rows_s
                    t = tn + n_mat * np.float32(step)
                    pa = e_a + d_a * t
                    pb = e_b + d_b * t
                    pc = e_c + d_c * t
                    tex_a = pa * s_a + o_a
                    tex_b = pb * s_b + o_b
                    tex_c = pc * s_c + o_c
                    if trilinear:
                        sa = jnp.clip(
                            tex_a * dim_a_f - 0.5, 0.0, dim_a_f - 1.0
                        )
                        i0a = jnp.floor(sa)
                        wa = sa - i0a
                        sb_ = jnp.clip(
                            tex_b * dim_b_f - 0.5, 0.0, dim_b_f - 1.0
                        )
                        i0b = jnp.floor(sb_)
                        wb = sb_ - i0b
                        i1b = jnp.minimum(i0b + 1.0, dim_b_f - 1.0)
                        sc_ = jnp.clip(
                            tex_c * dim_c_f - 0.5, 0.0, dim_c_f - 1.0
                        )
                        i0c = jnp.floor(sc_)
                        wc = sc_ - i0c
                        i1c = jnp.minimum(i0c + 1.0, dim_c_f - 1.0)
                    else:
                        i0a = jnp.floor(
                            jnp.clip(tex_a * dim_a_f, 0.0, dim_a_f - 1.0)
                        )
                        wa = jnp.zeros_like(i0a)
                        i0b = jnp.floor(
                            jnp.clip(tex_b * dim_b_f, 0.0, dim_b_f - 1.0)
                        )
                        wb = jnp.zeros_like(i0b)
                        i1b = i0b
                        i0c = jnp.floor(
                            jnp.clip(tex_c * dim_c_f, 0.0, dim_c_f - 1.0)
                        )
                        wc = jnp.zeros_like(i0c)
                        i1c = i0c
                    member = (i0a == k_f).astype(jnp.float32)
                    m = (
                        validf
                        * member
                        * (n_mat >= nstart).astype(jnp.float32)
                        * ((t > cl_lo) & (t <= cl_hi)).astype(jnp.float32)
                    )
                    # Slots past ``smax`` exist only for the k == 0 edge
                    # bucket; at other slabs their scratch rows hold
                    # stale densities — zero their masks.
                    if extra:
                        edge = (k == 0).astype(jnp.float32)
                        m = jnp.concatenate(
                            [m[:smax], m[smax:] * edge], axis=0
                        )

                    # Fused per-slot weights: c-tap × axis-lerp factors
                    # (batched here so the fetch loop multiplies two
                    # masks instead of building them).
                    one_wa = 1.0 - wa
                    one_wc = 1.0 - wc
                    wl0 = one_wc * one_wa
                    wl1 = wc * one_wa
                    wh0 = one_wc * wa
                    wh1 = wc * wa

                    # c-window base: host guarantees every owned sample's
                    # c-taps fit in [c_base, c_base + Wc).
                    c_masked = jnp.where(m > 0.0, i0c, dim_c_f)
                    c_base_f = jnp.clip(
                        jnp.min(c_masked), 0.0, float(max(nc_pad - w_c, 0))
                    )
                    c_base = c_base_f.astype(jnp.int32)
                    c0_rel = i0c - c_base_f
                    c1_rel = i1c - c_base_f
                    if check_window:
                        # Belt-and-braces: a member sample whose c-taps
                        # fall outside the host-bounded window would
                        # silently contribute zero — record it loudly.
                        bad = m * (
                            (c0_rel < 0.0)
                            | (c1_rel > float(w_c - 1))
                        ).astype(jnp.float32)
                        ovf_ref[0, :1, :] = jnp.maximum(
                            ovf_ref[0, :1, :],
                            jnp.max(bad, axis=0, keepdims=True),
                        )
                    i0b_i = i0b.astype(jnp.int32)
                    i1b_i = i1b.astype(jnp.int32)

                    win = jnp.concatenate(
                        [
                            vcat_ref[pl.ds(c_base, w_c), :],
                            vcat_ref[pl.ds(nc_pad + c_base, w_c), :],
                        ],
                        axis=0,
                    )  # (2*Wc, nb_pad): lo half, hi half

                    # ---- fetch: statically unrolled, one density row
                    # per slot into scratch (edge slots only at k == 0).
                    def fetch(s):
                        b0i = jnp.broadcast_to(
                            i0b_i[s : s + 1], (two_w, 128)
                        )
                        b1i = jnp.broadcast_to(
                            i1b_i[s : s + 1], (two_w, 128)
                        )
                        v0 = jnp.take_along_axis(win, b0i, axis=1)
                        v1 = jnp.take_along_axis(win, b1i, axis=1)
                        wb_s = wb[s : s + 1]
                        bl_lo = (
                            v0[:w_c] * (1.0 - wb_s) + v1[:w_c] * wb_s
                        )
                        bl_hi = (
                            v0[w_c:] * (1.0 - wb_s) + v1[w_c:] * wb_s
                        )
                        eq0 = (crf_w == c0_rel[s : s + 1]).astype(
                            jnp.float32
                        )
                        eq1 = (crf_w == c1_rel[s : s + 1]).astype(
                            jnp.float32
                        )
                        m_lo = eq0 * wl0[s : s + 1] + eq1 * wl1[s : s + 1]
                        m_hi = eq0 * wh0[s : s + 1] + eq1 * wh1[s : s + 1]
                        dens_ref[s : s + 1, :] = jnp.sum(
                            m_lo * bl_lo + m_hi * bl_hi,
                            axis=0,
                            keepdims=True,
                        )

                    for s in range(smax):
                        fetch(s)
                    if extra:

                        @pl.when(k == 0)
                        def _():
                            for s in range(smax, s_tot):
                                fetch(s)

                    # Masked slots may hold stale (or, on the first
                    # slab, uninitialized — possibly NaN) scratch rows;
                    # zero them before the TF so alpha·m cannot become
                    # NaN·0.
                    density = jnp.clip(
                        jnp.where(m > 0.0, dens_ref[:], 0.0)
                        * np.float32(mult)
                        + np.float32(add),
                        0.0,
                        1.0,
                    )  # (s_tot, 128)

                    # ---- batched linear TF lookup over all slots.
                    s_tf = jnp.clip(density, 0.0, 1.0) * TF_SIZE - 0.5
                    s_tf = jnp.clip(s_tf, 0.0, float(TF_SIZE - 1))
                    it0 = jnp.floor(s_tf).astype(jnp.int32)
                    wt = s_tf - jnp.floor(s_tf)
                    it1 = jnp.minimum(it0 + 1, TF_SIZE - 1)
                    chans = [0.0, 0.0, 0.0, 0.0]
                    for idx, wtt in ((it0, 1.0 - wt), (it1, wt)):
                        hi_bit = idx >= 128
                        lo7 = jnp.where(hi_bit, idx - 128, idx)
                        for ch in range(4):
                            g_lo = jnp.take_along_axis(
                                jnp.broadcast_to(
                                    tf_ref[2 * ch : 2 * ch + 1, :],
                                    (s_tot, 128),
                                ),
                                lo7,
                                axis=1,
                            )
                            g_hi = jnp.take_along_axis(
                                jnp.broadcast_to(
                                    tf_ref[2 * ch + 1 : 2 * ch + 2, :],
                                    (s_tot, 128),
                                ),
                                lo7,
                                axis=1,
                            )
                            chans[ch] = chans[ch] + (
                                jnp.where(hi_bit, g_hi, g_lo) * wtt
                            )

                    # ---- closed-form masked chunk composite with EXACT
                    # early exit (raycast._composite_chunk: a sample is
                    # excluded iff accumulated alpha before it exceeds
                    # the threshold — computable from the unmasked
                    # prefix transmittance because alpha is monotone).
                    alpha = 1.0 - jnp.power(
                        1.0 - jnp.minimum(chans[3], ALPHA_CLAMP),
                        np.float32(alpha_correction),
                    )
                    alpha_v = alpha * m  # (s_tot, 128)
                    one_m = 1.0 - alpha_v
                    # Exclusive cumprod along slots (serial row chain).
                    rows_u = [jnp.ones((1, 128), jnp.float32)]
                    for s in range(s_tot - 1):
                        rows_u.append(rows_u[-1] * one_m[s : s + 1])
                    t_excl_u = jnp.concatenate(rows_u, axis=0)
                    global_before = a0 + (1.0 - a0) * (1.0 - t_excl_u)
                    mex = (global_before <= early_exit).astype(jnp.float32)
                    a_eff = alpha_v * mex
                    one_e = 1.0 - a_eff
                    rows_e = [jnp.ones((1, 128), jnp.float32)]
                    for s in range(s_tot - 1):
                        rows_e.append(rows_e[-1] * one_e[s : s + 1])
                    t_excl = jnp.concatenate(rows_e, axis=0)
                    w = a_eff * t_excl
                    chunk_trans = t_excl[s_tot - 1 : s_tot] * one_e[
                        s_tot - 1 : s_tot
                    ]
                    one_minus_a = 1.0 - a0
                    out_ref[0, pl.ds(i, 1), :] = r0 + one_minus_a * jnp.sum(
                        w * chans[0], axis=0, keepdims=True
                    )
                    out_ref[1, pl.ds(i, 1), :] = g0 + one_minus_a * jnp.sum(
                        w * chans[1], axis=0, keepdims=True
                    )
                    out_ref[2, pl.ds(i, 1), :] = b0 + one_minus_a * jnp.sum(
                        w * chans[2], axis=0, keepdims=True
                    )
                    out_ref[3, pl.ds(i, 1), :] = a0 + one_minus_a * (
                        1.0 - chunk_trans
                    )

                return 0

            jax.lax.fori_loop(0, rrb, row_body, 0)

            @pl.when(any_ref[0] == 0)
            def _():
                done_ref[0] = 1

    # Pallas passes OUTPUT refs before scratch refs: adapt the signature
    # to the one- or two-output layout.
    if check_window:

        def kernel(i0, i1, g, lo, hi, tf, ray, cin, out, ovf, vc, de, do,
                   an):
            _body(i0, i1, g, lo, hi, tf, ray, cin, out, vc, de, do, an,
                  ovf)

    else:

        def kernel(i0, i1, g, lo, hi, tf, ray, cin, out, vc, de, do, an):
            _body(i0, i1, g, lo, hi, tf, ray, cin, out, vc, de, do, an,
                  None)

    return kernel


_COMPILE_COUNT = 0


def compile_count() -> int:
    """Number of compiled frame-function builds this process has made —
    the steady-state orbit contract is that NEW CAMERA POSES DO NOT
    INCREASE IT after warmup (every per-camera quantity is a runtime
    operand; only shape/tier changes compile)."""
    return _COMPILE_COUNT


def _pow2_bucket(n: int, lo: int = 128) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@functools.lru_cache(maxsize=256)
def _compiled_group(
    *,
    axis: int,
    b_axis: int,
    c_axis: int,
    na: int,
    nb: int,
    nc: int,
    nb_pad: int,
    nc_pad: int,
    rr: int,
    rrb: int,
    r_tot: int,
    viewport: Tuple[int, int, int, int],
    near: float,
    sample_index: int,
    step: float,
    smax: int,
    extra: int,
    w_c: int,
    mult: float,
    add: float,
    alpha_correction: float,
    early_exit: float,
    trilinear: bool,
    sign: int,
    clip_key: Optional[bytes],
    n_clip: int,
    check_window: bool,
    interpret: bool,
):
    """One jitted frame function per (shape × tier) signature.

    Inside the jit: per-ray constants are built with the SAME jnp ops
    as the reference marcher (ops/rays) — parity-critical f32 rounding
    by construction — gathered into the group's ray pack by a runtime
    index operand, marched by the Pallas kernel with the camera
    geometry as a scalar-prefetch operand, and scattered back into the
    carry.  A new camera pose changes only operands."""
    global _COMPILE_COUNT
    _COMPILE_COUNT += 1
    rb = rr // rrb
    order_np = np.arange(na, dtype=np.int32)
    if sign < 0:
        order_np = order_np[::-1].copy()
    idx1_np = np.minimum(order_np + 1, na - 1).astype(np.int32)
    clip_arr = (
        None
        if clip_key is None
        else np.frombuffer(clip_key, np.float32).reshape(n_clip, 4)
    )

    kernel = _make_exact_kernel(
        check_window=check_window,
        na=na,
        nb=nb,
        nc=nc,
        nb_pad=nb_pad,
        nc_pad=nc_pad,
        rrb=rrb,
        smax=smax,
        extra=extra,
        w_c=w_c,
        step=step,
        mult=mult,
        add=add,
        alpha_correction=alpha_correction,
        early_exit=early_exit,
        trilinear=trilinear,
        sign=sign,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(rb, na),
        in_specs=[
            pl.BlockSpec(
                (1, nc_pad, nb_pad),
                lambda rbi, j, i0, i1, gm: (i0[j], 0, 0),
            ),
            pl.BlockSpec(
                (1, nc_pad, nb_pad),
                lambda rbi, j, i0, i1, gm: (i1[j], 0, 0),
            ),
            pl.BlockSpec((8, 128), lambda rbi, j, i0, i1, gm: (0, 0)),
            pl.BlockSpec(
                (8, rrb, 128), lambda rbi, j, i0, i1, gm: (0, rbi, 0)
            ),
            pl.BlockSpec(
                (4, rrb, 128), lambda rbi, j, i0, i1, gm: (0, rbi, 0)
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (4, rrb, 128), lambda rbi, j, i0, i1, gm: (0, rbi, 0)
            ),
            pl.BlockSpec(
                (1, 8, 128), lambda rbi, j, i0, i1, gm: (rbi, 0, 0)
            ),
        )
        if check_window
        else pl.BlockSpec(
            (4, rrb, 128), lambda rbi, j, i0, i1, gm: (0, rbi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * nc_pad, nb_pad), jnp.float32),
            pltpu.VMEM((smax + extra, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_shape = (
        (
            jax.ShapeDtypeStruct((4, rr, 128), jnp.float32),
            jax.ShapeDtypeStruct((rb, 8, 128), jnp.float32),
        )
        if check_window
        else jax.ShapeDtypeStruct((4, rr, 128), jnp.float32)
    )
    # NOTE: keep order/idx1 as NUMPY here — jnp.asarray in this builder
    # would capture a traced constant when the builder first runs under
    # an outer jit (bench chains) and leak it into later traces; the
    # conversion happens inside run() instead.
    # Jitter evaluated EAGERLY (runtime sin) and baked as a constant:
    # under jit, XLA would constant-fold glsl_rand with a different
    # libm than the eager reference path and decorrelate the samples.
    frag = (
        _jitter_frag(viewport, sample_index) if sample_index > 0 else None
    )

    @jax.jit
    def run(
        vol_perm, tfmat, inv_proj, inv_mv, gmin, gmax, wmin, wmax,
        tmin, tmax, idx_pad, carry,
    ):
        eye, dirs, cos_z, _ = ray_ops.make_rays(
            inv_proj, inv_mv, viewport, sample_index=sample_index,
            frag_override=frag,
        )
        dirs = dirs.reshape(-1, 3)
        tnp_ = ray_ops.near_plane_t(cos_z.reshape(-1), near)
        tng, _t1g, hitg = ray_ops.intersect_box(eye, dirs, gmin, gmax)
        t0b, t1b, hitb = ray_ops.intersect_box(eye, dirs, wmin, wmax)
        valid = (hitg & hitb).astype(jnp.float32)
        n_start = jnp.ceil(
            jnp.maximum(tnp_ - tng, 0.0) / np.float32(step)
        )
        if clip_arr is not None and len(clip_arr):
            clo, chi = ray_ops.clip_ray(
                eye, dirs,
                jnp.full(r_tot, -3e38, jnp.float32),
                jnp.full(r_tot, 3e38, jnp.float32),
                clip_arr,
            )
        else:
            clo = jnp.full(r_tot, -3e38, jnp.float32)
            chi = jnp.full(r_tot, 3e38, jnp.float32)
        t_lo = jnp.maximum(t0b, clo)
        t_hi = jnp.minimum(t1b, chi)

        mask = idx_pad < r_tot
        safe = jnp.where(mask, idx_pad, 0)

        def g(x, fill):
            return jnp.where(mask, x[safe], np.float32(fill))

        pack = jnp.stack(
            [
                g(dirs[:, axis], 1.0),  # avoid q = 0 on padding
                g(dirs[:, b_axis], 0.0),
                g(dirs[:, c_axis], 0.0),
                g(tng, 0.0),
                g(n_start, 0.0),
                g(valid, 0.0),
                g(t_lo, -3e38),
                g(t_hi, 3e38),
            ]
        ).reshape(8, rr, 128)
        cin = jnp.where(mask[:, None], carry[safe], 0.0)
        cin = jnp.transpose(cin.reshape(rr, 128, 4), (2, 0, 1))

        s_vec = (tmax - tmin) / (wmax - wmin)
        o_vec = tmin - wmin * s_vec
        geom = jnp.concatenate(
            [
                jnp.stack([eye[axis], eye[b_axis], eye[c_axis]]),
                jnp.stack([s_vec[axis], s_vec[b_axis], s_vec[c_axis]]),
                jnp.stack([o_vec[axis], o_vec[b_axis], o_vec[c_axis]]),
                jnp.zeros(7, jnp.float32),
            ]
        ).astype(jnp.float32)

        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray(order_np), jnp.asarray(idx1_np), geom, vol_perm,
          vol_perm, tfmat, pack, cin)
        if check_window:
            res, ovf = res
        flat = jnp.transpose(res, (1, 2, 0)).reshape(rr * 128, 4)
        out = carry.at[idx_pad].set(flat, mode="drop")
        return (out, ovf) if check_window else out

    return run


@functools.lru_cache(maxsize=64)
def _compiled_fallback(
    *,
    r_tot: int,
    n_pad: int,
    viewport: Tuple[int, int, int, int],
    near: float,
    sample_index: int,
    params: RenderParams,
    clip_key: Optional[bytes],
    n_clip: int,
    max_steps: int,
):
    """Jitted XLA-fallback marcher for oblique rays, index-bucketed so a
    varying fallback count re-plans without recompiling."""
    global _COMPILE_COUNT
    _COMPILE_COUNT += 1
    from libre_tpu.ops import raycast
    from libre_tpu.ops.reference import BrickSet

    clip_arr = (
        None
        if clip_key is None
        else np.frombuffer(clip_key, np.float32).reshape(n_clip, 4)
    )
    frag = (
        _jitter_frag(viewport, sample_index) if sample_index > 0 else None
    )

    @jax.jit
    def run(
        volume, tf, inv_proj, inv_mv, gmin, gmax, wmin, wmax, tmin,
        tmax, idx_pad, carry,
    ):
        eye, dirs, cos_z, _ = ray_ops.make_rays(
            inv_proj, inv_mv, viewport, sample_index=sample_index,
            frag_override=frag,
        )
        dirs = dirs.reshape(-1, 3)
        tnp_ = ray_ops.near_plane_t(cos_z.reshape(-1), near)
        mask = idx_pad < r_tot
        safe = jnp.where(mask, idx_pad, 0)
        bricks = BrickSet(
            data=volume[None].astype(jnp.float32),
            world_min=wmin[None],
            world_max=wmax[None],
            tex_min=tmin[None],
            tex_max=tmax[None],
        )
        cin = carry[safe]
        res = raycast.render_rays(
            bricks, tf, eye, dirs[safe], tnp_[safe], params,
            gmin, gmax,
            clip_planes=clip_arr,
            max_steps=max_steps,
            init_carry=(cin[:, :3], cin[:, 3]),
        )
        return carry.at[idx_pad].set(res, mode="drop")

    return run


def permute_volume(brick_zyx: jnp.ndarray, plan: ExactPlan) -> jnp.ndarray:
    """(Z, Y, X) brick → (A, nc_pad, nb_pad) padded slab stack for
    ``plan.axis`` (cacheable per (brick, axis))."""
    a, b, c = plan.axis, plan.b_axis, plan.c_axis
    pv = jnp.transpose(brick_zyx.astype(jnp.float32), (2 - a, 2 - c, 2 - b))
    na, nc, nb = pv.shape
    return jnp.pad(
        pv, ((0, 0), (0, _round_up(nc, 8) - nc), (0, _round_up(nb, 128) - nb))
    )


def tf_halves(tf: jnp.ndarray) -> jnp.ndarray:
    """(256, 4) TF → (8, 128) half-table matrix, rows [2·ch + half]."""
    t = tf.astype(jnp.float32)
    rows = [t[h * 128:(h + 1) * 128, ch] for ch in range(4) for h in (0, 1)]
    return jnp.stack(rows)


# Small device-constant cache: on the serving path every frame re-sends
# the SAME geometry boxes / gather indices / TF tables; on a tunneled
# device each host->device put costs ~ms of enqueue latency, so content-
# identical operands are reused (keyed by bytes; bounded LRU).
from collections import OrderedDict as _OD

_DEV_CACHE: "_OD[tuple, jnp.ndarray]" = _OD()
_TF_MEMO: list = [None, None]


def _dev_const(arr: np.ndarray) -> jnp.ndarray:
    if isinstance(arr, jax.Array):
        return arr
    arr = np.ascontiguousarray(arr)
    key = (arr.dtype.str, arr.shape, arr.tobytes())
    hit = _DEV_CACHE.get(key)
    if hit is not None:
        _DEV_CACHE.move_to_end(key)
        return hit
    val = jnp.asarray(arr)
    if isinstance(val, jax.core.Tracer):
        return val  # under an outer trace: never cache tracers
    while len(_DEV_CACHE) >= 64:
        _DEV_CACHE.popitem(last=False)
    _DEV_CACHE[key] = val
    return val


def _tf_halves_memo(tf: jnp.ndarray) -> jnp.ndarray:
    if _TF_MEMO[0] is tf:
        return _TF_MEMO[1]
    val = tf_halves(tf)
    if isinstance(val, jax.core.Tracer):
        return val  # under an outer trace: never cache tracers
    _TF_MEMO[0] = tf
    _TF_MEMO[1] = val
    return val


def render_exact_rays(
    volume_zyx: jnp.ndarray,
    tf: jnp.ndarray,
    plan: ExactPlan,
    *,
    init_carry: Optional[jnp.ndarray] = None,  # (R, 4)
    vol_perm: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    rrb: int = 64,
    check_window: bool = False,
) -> jnp.ndarray:
    """March the full flat ray batch of ``plan`` → (R, 4) rgba.

    ``check_window=True`` additionally verifies IN-KERNEL that every
    owned sample's c-taps landed inside the host-bounded c-window and
    raises if not — a debug belt-and-braces against a wrong window
    bound silently dropping samples (costs a host sync per group; only
    usable OUTSIDE jit).

    Every per-camera/per-brick quantity is a runtime operand of a
    frame function cached per (shape × tier) signature
    (:func:`_compiled_group`): rendering an orbit compiles on the
    first frame and never again.  Rays the kernel cannot serve
    (plan.fallback_idx) run through ops/raycast.render_rays with
    identical semantics, bucketed to power-of-two counts.
    """
    r_tot = plan.n_rays
    carry = (
        jnp.zeros((r_tot, 4), jnp.float32)
        if init_carry is None
        else jnp.asarray(init_carry, jnp.float32)
    )
    if vol_perm is None:
        vol_perm = permute_volume(volume_zyx, plan)
    tfmat = _tf_halves_memo(tf)
    p = plan.params
    lo_, hi_ = p.data_source_range
    cam = plan.camera
    operands = dict(
        inv_proj=_dev_const(np.asarray(cam.inv_proj, np.float32)),
        inv_mv=_dev_const(np.asarray(cam.inv_mv, np.float32)),
        gmin=_dev_const(np.asarray(plan.global_min, np.float32)),
        gmax=_dev_const(np.asarray(plan.global_max, np.float32)),
        wmin=_dev_const(np.asarray(plan.world_min, np.float32)),
        wmax=_dev_const(np.asarray(plan.world_max, np.float32)),
        tmin=_dev_const(np.asarray(plan.tex_min, np.float32)),
        tmax=_dev_const(np.asarray(plan.tex_max, np.float32)),
    )
    clip_key = (
        None if plan.clip_planes is None else plan.clip_planes.tobytes()
    )
    n_clip = 0 if plan.clip_planes is None else len(plan.clip_planes)

    for group in plan.groups:
        rg = len(group.ray_idx)
        rr = _round_up(max(rg, 1), 128 * rrb) // 128
        rrb_g = min(rrb, rr)
        idx_pad = np.concatenate(
            [
                group.ray_idx,
                np.full(rr * 128 - rg, r_tot, np.int32),
            ]
        ).astype(np.int32)
        run = _compiled_group(
            axis=plan.axis,
            b_axis=plan.b_axis,
            c_axis=plan.c_axis,
            na=plan.brick_shape[2 - plan.axis],
            nb=plan.brick_shape[2 - plan.b_axis],
            nc=plan.brick_shape[2 - plan.c_axis],
            nb_pad=int(vol_perm.shape[2]),
            nc_pad=int(vol_perm.shape[1]),
            rr=rr,
            rrb=rrb_g,
            r_tot=r_tot,
            viewport=tuple(plan.viewport),
            near=float(cam.near),
            sample_index=plan.sample_index,
            step=float(p.step_size),
            smax=group.smax,
            extra=group.extra,
            w_c=group.w_c,
            mult=float(1.0 / (hi_ - lo_)),
            add=float(-lo_ / (hi_ - lo_)),
            alpha_correction=float(p.alpha_correction),
            early_exit=float(p.early_exit),
            trilinear=p.filter_mode == "trilinear",
            sign=group.sign,
            clip_key=clip_key,
            n_clip=n_clip,
            check_window=check_window,
            interpret=interpret,
        )
        res = run(
            vol_perm, tfmat, operands["inv_proj"], operands["inv_mv"],
            operands["gmin"], operands["gmax"], operands["wmin"],
            operands["wmax"], operands["tmin"], operands["tmax"],
            _dev_const(idx_pad), carry,
        )
        if check_window:
            carry, ovf = res
            if float(jnp.max(ovf)) > 0.0:
                raise RuntimeError(
                    "exact_pallas: c-window overflow — an owned "
                    "sample's taps fell outside the host-bounded "
                    f"window (group sign={group.sign}, w_c={group.w_c})"
                )
        else:
            carry = res

    if len(plan.fallback_idx):
        # Fallback rays march the SAME brick on the SAME global sample
        # grid as the kernel rays: the brick's world box with its atlas
        # tex inset, and the GLOBAL volume box anchoring t_n (advisor
        # r4: anchoring the grid to the brick box broke decomposition
        # invariance for exactly the rays the kernel cannot serve).
        nf = len(plan.fallback_idx)
        n_pad = _pow2_bucket(nf)
        idx_pad = np.concatenate(
            [plan.fallback_idx, np.full(n_pad - nf, r_tot, np.int32)]
        ).astype(np.int32)
        max_steps = int(
            math.ceil(
                float(np.linalg.norm(plan.global_max - plan.global_min))
                / p.step_size
            )
        ) + 4
        run = _compiled_fallback(
            r_tot=r_tot,
            n_pad=n_pad,
            viewport=tuple(plan.viewport),
            near=float(cam.near),
            sample_index=plan.sample_index,
            params=p,
            clip_key=clip_key,
            n_clip=n_clip,
            max_steps=max_steps,
        )
        carry = run(
            jnp.asarray(volume_zyx), tf, operands["inv_proj"],
            operands["inv_mv"], operands["gmin"], operands["gmax"],
            operands["wmin"], operands["wmax"], operands["tmin"],
            operands["tmax"], _dev_const(idx_pad), carry,
        )
    return carry


def render_exact(
    volume_zyx: jnp.ndarray,
    tf: jnp.ndarray,
    camera: Camera,
    params: RenderParams,
    global_min=(-0.5, -0.5, -0.5),
    global_max=(0.5, 0.5, 0.5),
    clip_planes: Optional[np.ndarray] = None,
    *,
    axis: Optional[int] = None,
    interpret: bool = False,
    plan: Optional[ExactPlan] = None,
) -> jnp.ndarray:
    """Single-brick exact render → (H, W, 4), reference parity
    (configs 1-2).  Build the plan once per camera via ``plan_exact``
    and pass it to amortize host planning across frames."""
    plans: List[ExactPlan]
    if plan is not None:
        plans = [plan]
    else:
        # One plan per jittered subpixel sample (fragRaycast.glsl:
        # 121-127 multi-sample rendering; index 0 = zero jitter).
        plans = [
            plan_exact(
                camera,
                params,
                global_min,
                global_max,
                volume_zyx.shape,
                clip_planes=clip_planes,
                axis=axis,
                sample_index=s,
            )
            for s in range(params.samples_per_pixel)
        ]
    vx, vy, vw, vh = plans[0].viewport
    imgs = [
        render_exact_rays(volume_zyx, tf, p, interpret=interpret)
        for p in plans
    ]
    out = sum(imgs) / float(len(imgs))
    return out.reshape(vh, vw, 4)


# ===================================================== exact backward
def _make_exact_bwd_kernel(
    *,
    na: int,
    nb: int,
    nc: int,
    nb_pad: int,
    nc_pad: int,
    rrb: int,
    smax: int,
    extra: int,
    w_c: int,
    step: float,
    mult: float,
    add: float,
    alpha_correction: float,
    trilinear: bool,
    sign: int,
):
    """Fused recompute backward for the exact slab marcher.

    Re-marches the slab sweep front-to-back (same order and recompute
    math as the forward), carrying per-ray (transmittance t, inclusive
    prefix P) in VMEM, and inverts the front-to-back composite with the
    total-minus-prefix identity ∂L/∂α_j = T_j·D_j − (TOT − P_j)/(1−α_j)
    + g_a·T_fin/(1−α_j) (the ops/shearwarp_grad pattern applied to the
    exact sample set; reference semantics under grad:
    fragRaycast.glsl:104-111,183-209 with early termination disabled).

    The gather transposes are A·Bᵀ MXU matmuls (no scatter exists in
    Mosaic): the b-axis tap transpose contracts the per-slot cotangent
    rows against a one-hot ``B0t[l, r] = (l == b0[r])`` built with one
    rows-iota compare (no lane→sublane transpose anywhere), landing in
    a (2·Wc, 128) c-window accumulator; the TF-bin scatter uses the
    same trick against the half-table layout ((8, 128) rows
    [2·ch + half]).  Early exit is DISABLED by construction (trainer
    semantics — the inversion identity needs every sample composited).

    Ray-pack rows as the forward; extra operands: g4 (4, rrb, 128)
    cotangents [g_r, g_g, g_b, g_a]; aux (2, rrb, 128) [TOT, T_final].
    Outputs: d_lo/d_hi (rb, A, ncp, nbp) per-row-block slice gradients
    (summed and coverage-masked outside) and dtf (8, 128) half-tables.
    """
    s_tot = smax + extra
    dim_a_f = np.float32(na)
    dim_b_f = np.float32(nb)
    dim_c_f = np.float32(nc)
    qfloor = np.float32(1e-12)
    w_c = min(w_c, nc_pad)
    two_w = 2 * w_c
    corr = np.float32(alpha_correction)

    def kernel(
        idx0_ref,  # (A,) i32 scalar prefetch: slab index at grid step j
        idx1_ref,  # (A,) i32: hi-slice index (min(k+1, na-1))
        geom_ref,  # (16,) f32: eye + world->tex MAD
        lo_ref,  # (1, nc_pad, nb_pad) slice k
        hi_ref,  # (1, nc_pad, nb_pad)
        tf_ref,  # (8, 128)
        ray_ref,  # (8, rrb, 128)
        g4_ref,  # (4, rrb, 128) cotangents
        aux_ref,  # (2, rrb, 128) [tot, t_final]
        dlo_ref,  # out (1, 1, nc_pad, nb_pad) at (rbi, i0[j])
        dhi_ref,  # out (1, 1, nc_pad, nb_pad) at (rbi, i1[j])
        dtf_ref,  # out (8, 128) fixed block
        vcat_ref,  # scratch (2*nc_pad, nb_pad)
        dens_ref,  # scratch (s_tot, 128)
        dvc_ref,  # scratch (2*nc_pad, nb_pad) gradient accumulator
        tp_ref,  # scratch (2, rrb, 128) per-ray (t, P) carries
    ):
        rbi = pl.program_id(0)
        j = pl.program_id(1)
        e_a, e_b, e_c = geom_ref[0], geom_ref[1], geom_ref[2]
        s_a, s_b, s_c = geom_ref[3], geom_ref[4], geom_ref[5]
        o_a, o_b, o_c = geom_ref[6], geom_ref[7], geom_ref[8]

        @pl.when((rbi == 0) & (j == 0))
        def _():
            dtf_ref[:] = jnp.zeros((8, 128), jnp.float32)

        @pl.when(j == 0)
        def _():
            tp_ref[0] = jnp.ones((rrb, 128), jnp.float32)
            tp_ref[1] = jnp.zeros((rrb, 128), jnp.float32)

        k = idx0_ref[j]
        k_f = k.astype(jnp.float32)
        vcat_ref[:nc_pad, :] = lo_ref[0]
        vcat_ref[nc_pad:, :] = hi_ref[0]
        dvc_ref[:] = jnp.zeros_like(dvc_ref)

        rows_s = jax.lax.broadcasted_iota(
            jnp.int32, (s_tot, 128), 0
        ).astype(jnp.float32)
        crf_w = jax.lax.broadcasted_iota(
            jnp.int32, (w_c, 128), 0
        ).astype(jnp.float32)
        lane_rows = jax.lax.broadcasted_iota(
            jnp.int32, (128, 128), 0
        )  # B-transpose builder: row l, compare vs (1, 128) lane vec

        def row_body(i, _):
            d_a = ray_ref[0, pl.ds(i, 1), :]
            d_b = ray_ref[1, pl.ds(i, 1), :]
            d_c = ray_ref[2, pl.ds(i, 1), :]
            tn = ray_ref[3, pl.ds(i, 1), :]
            nstart = ray_ref[4, pl.ds(i, 1), :]
            validf = ray_ref[5, pl.ds(i, 1), :]
            cl_lo = ray_ref[6, pl.ds(i, 1), :]
            cl_hi = ray_ref[7, pl.ds(i, 1), :]
            g_r = g4_ref[0, pl.ds(i, 1), :]
            g_g = g4_ref[1, pl.ds(i, 1), :]
            g_b = g4_ref[2, pl.ds(i, 1), :]
            g_a = g4_ref[3, pl.ds(i, 1), :]
            tot = aux_ref[0, pl.ds(i, 1), :]
            t_fin = aux_ref[1, pl.ds(i, 1), :]
            t_carry = tp_ref[0, pl.ds(i, 1), :]
            p_carry = tp_ref[1, pl.ds(i, 1), :]

            # ---- forward recompute: positions (identical math) ----
            q = d_a * (s_a * np.float32(step)) * dim_a_f
            q = jnp.where(jnp.abs(q) < qfloor, 1.0, q)
            p0 = ((e_a + d_a * tn) * s_a + o_a) * dim_a_f - 0.5
            if trilinear:
                if sign > 0:
                    bound = jnp.where(k == 0, jnp.float32(-0.6), k_f)
                else:
                    bound = k_f + 1.0
            else:
                bound = k_f if sign > 0 else k_f + 1.0
            nf0 = jnp.ceil((bound - p0) / q) - 1.0

            n_mat = nf0 + rows_s
            t = tn + n_mat * np.float32(step)
            pa = e_a + d_a * t
            pb = e_b + d_b * t
            pc = e_c + d_c * t
            tex_a = pa * s_a + o_a
            tex_b = pb * s_b + o_b
            tex_c = pc * s_c + o_c
            if trilinear:
                sa = jnp.clip(tex_a * dim_a_f - 0.5, 0.0, dim_a_f - 1.0)
                i0a = jnp.floor(sa)
                wa = sa - i0a
                sb_ = jnp.clip(
                    tex_b * dim_b_f - 0.5, 0.0, dim_b_f - 1.0
                )
                i0b = jnp.floor(sb_)
                wb = sb_ - i0b
                i1b = jnp.minimum(i0b + 1.0, dim_b_f - 1.0)
                sc_ = jnp.clip(
                    tex_c * dim_c_f - 0.5, 0.0, dim_c_f - 1.0
                )
                i0c = jnp.floor(sc_)
                wc = sc_ - i0c
                i1c = jnp.minimum(i0c + 1.0, dim_c_f - 1.0)
            else:
                i0a = jnp.floor(
                    jnp.clip(tex_a * dim_a_f, 0.0, dim_a_f - 1.0)
                )
                wa = jnp.zeros_like(i0a)
                i0b = jnp.floor(
                    jnp.clip(tex_b * dim_b_f, 0.0, dim_b_f - 1.0)
                )
                wb = jnp.zeros_like(i0b)
                i1b = i0b
                i0c = jnp.floor(
                    jnp.clip(tex_c * dim_c_f, 0.0, dim_c_f - 1.0)
                )
                wc = jnp.zeros_like(i0c)
                i1c = i0c
            member = (i0a == k_f).astype(jnp.float32)
            m = (
                validf
                * member
                * (n_mat >= nstart).astype(jnp.float32)
                * ((t > cl_lo) & (t <= cl_hi)).astype(jnp.float32)
            )
            if extra:
                edge = (k == 0).astype(jnp.float32)
                m = jnp.concatenate(
                    [m[:smax], m[smax:] * edge], axis=0
                )

            one_wa = 1.0 - wa
            one_wc = 1.0 - wc
            wl0 = one_wc * one_wa
            wl1 = wc * one_wa
            wh0 = one_wc * wa
            wh1 = wc * wa

            c_masked = jnp.where(m > 0.0, i0c, dim_c_f)
            c_base_f = jnp.clip(
                jnp.min(c_masked), 0.0, float(max(nc_pad - w_c, 0))
            )
            c_base = c_base_f.astype(jnp.int32)
            c0_rel = i0c - c_base_f
            c1_rel = i1c - c_base_f
            i0b_i = i0b.astype(jnp.int32)
            i1b_i = i1b.astype(jnp.int32)

            win = jnp.concatenate(
                [
                    vcat_ref[pl.ds(c_base, w_c), :],
                    vcat_ref[pl.ds(nc_pad + c_base, w_c), :],
                ],
                axis=0,
            )

            def fetch(s):
                b0i = jnp.broadcast_to(i0b_i[s : s + 1], (two_w, 128))
                b1i = jnp.broadcast_to(i1b_i[s : s + 1], (two_w, 128))
                v0 = jnp.take_along_axis(win, b0i, axis=1)
                v1 = jnp.take_along_axis(win, b1i, axis=1)
                wb_s = wb[s : s + 1]
                bl_lo = v0[:w_c] * (1.0 - wb_s) + v1[:w_c] * wb_s
                bl_hi = v0[w_c:] * (1.0 - wb_s) + v1[w_c:] * wb_s
                eq0 = (crf_w == c0_rel[s : s + 1]).astype(jnp.float32)
                eq1 = (crf_w == c1_rel[s : s + 1]).astype(jnp.float32)
                m_lo = eq0 * wl0[s : s + 1] + eq1 * wl1[s : s + 1]
                m_hi = eq0 * wh0[s : s + 1] + eq1 * wh1[s : s + 1]
                dens_ref[s : s + 1, :] = jnp.sum(
                    m_lo * bl_lo + m_hi * bl_hi,
                    axis=0,
                    keepdims=True,
                )

            for s in range(smax):
                fetch(s)
            if extra:

                @pl.when(k == 0)
                def _():
                    for s in range(smax, s_tot):
                        fetch(s)

            density = jnp.clip(
                jnp.where(m > 0.0, dens_ref[:], 0.0)
                * np.float32(mult)
                + np.float32(add),
                0.0,
                1.0,
            )

            # ---- batched TF lookup WITH per-bin deltas ----
            s_tf = jnp.clip(density, 0.0, 1.0) * TF_SIZE - 0.5
            s_tf = jnp.clip(s_tf, 0.0, float(TF_SIZE - 1))
            it0 = jnp.floor(s_tf).astype(jnp.int32)
            wt = s_tf - jnp.floor(s_tf)
            it1 = jnp.minimum(it0 + 1, TF_SIZE - 1)

            def lookup(idx):
                hi_bit = idx >= 128
                lo7 = jnp.where(hi_bit, idx - 128, idx)
                out = []
                for ch in range(4):
                    g_lo = jnp.take_along_axis(
                        jnp.broadcast_to(
                            tf_ref[2 * ch : 2 * ch + 1, :],
                            (s_tot, 128),
                        ),
                        lo7,
                        axis=1,
                    )
                    g_hi = jnp.take_along_axis(
                        jnp.broadcast_to(
                            tf_ref[2 * ch + 1 : 2 * ch + 2, :],
                            (s_tot, 128),
                        ),
                        lo7,
                        axis=1,
                    )
                    out.append(jnp.where(hi_bit, g_hi, g_lo))
                return out

            sel0 = lookup(it0)
            sel1 = lookup(it1)
            chans = [
                sel0[ch] * (1.0 - wt) + sel1[ch] * wt for ch in range(4)
            ]
            tfd = [sel1[ch] - sel0[ch] for ch in range(4)]

            # ---- composite inversion (early exit disabled) ----
            a_cl = jnp.minimum(chans[3], ALPHA_CLAMP)
            alpha = 1.0 - jnp.power(1.0 - a_cl, corr)
            alpha_v = alpha * m
            one_m = 1.0 - alpha_v
            rows_u = [jnp.ones((1, 128), jnp.float32)]
            for s in range(s_tot - 1):
                rows_u.append(rows_u[-1] * one_m[s : s + 1])
            t_excl = jnp.concatenate(rows_u, axis=0)
            t_at = t_carry * t_excl  # (s_tot, 128)
            w = alpha_v * t_at
            d_k = chans[0] * g_r + chans[1] * g_g + chans[2] * g_b
            qv = w * d_k
            acc = [p_carry + qv[0:1]]
            for s in range(1, s_tot):
                acc.append(acc[-1] + qv[s : s + 1])
            p_incl = jnp.concatenate(acc, axis=0)
            denom = jnp.maximum(one_m, 1e-12)
            dalpha = (
                t_at * d_k
                - (tot - p_incl) / denom
                + g_a * t_fin / denom
            ) * m
            pw = jnp.power(jnp.maximum(1.0 - a_cl, 1e-12), corr - 1.0)
            da_cl = dalpha * corr * pw
            dchan_a = da_cl * (chans[3] < ALPHA_CLAMP).astype(
                jnp.float32
            )
            dch = [w * g_r, w * g_g, w * g_b, dchan_a]
            dwt = (
                dch[0] * tfd[0]
                + dch[1] * tfd[1]
                + dch[2] * tfd[2]
                + dch[3] * tfd[3]
            )
            ds_dd = (
                TF_SIZE
                * ((density > 0.0) & (density < 1.0)).astype(jnp.float32)
                * (
                    (s_tf > 0.0) & (s_tf < float(TF_SIZE - 1))
                ).astype(jnp.float32)
            )
            dd_raw = dwt * ds_dd * np.float32(mult) * m  # (s_tot, 128)

            # ---- scatter transposes (A·Bᵀ MXU matmuls) ----
            hi_bit0 = (it0 >= 128).astype(jnp.float32)
            lo7_0 = jnp.where(it0 >= 128, it0 - 128, it0)
            hi_bit1 = (it1 >= 128).astype(jnp.float32)
            lo7_1 = jnp.where(it1 >= 128, it1 - 128, it1)

            def scatter_slot(s):
                dd = dd_raw[s : s + 1]
                eq0 = (crf_w == c0_rel[s : s + 1]).astype(jnp.float32)
                eq1 = (crf_w == c1_rel[s : s + 1]).astype(jnp.float32)
                m_lo = eq0 * wl0[s : s + 1] + eq1 * wl1[s : s + 1]
                m_hi = eq0 * wh0[s : s + 1] + eq1 * wh1[s : s + 1]
                wb_s = wb[s : s + 1]
                d_bl_lo = m_lo * dd
                d_bl_hi = m_hi * dd
                dv0 = jnp.concatenate(
                    [d_bl_lo * (1.0 - wb_s), d_bl_hi * (1.0 - wb_s)],
                    axis=0,
                )
                dv1 = jnp.concatenate(
                    [d_bl_lo * wb_s, d_bl_hi * wb_s], axis=0
                )
                b0t = (lane_rows == i0b_i[s : s + 1]).astype(jnp.float32)
                b1t = (lane_rows == i1b_i[s : s + 1]).astype(jnp.float32)
                dwin = jax.lax.dot_general(
                    dv0, b0t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    dv1, b1t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (2*w_c, 128)
                dvc_ref[pl.ds(c_base, w_c), :128] += dwin[:w_c]
                dvc_ref[pl.ds(nc_pad + c_base, w_c), :128] += dwin[w_c:]

                # TF-bin scatter: rows [2ch+half] vs one-hot lanes.
                bt0 = (lane_rows == lo7_0[s : s + 1]).astype(jnp.float32)
                bt1 = (lane_rows == lo7_1[s : s + 1]).astype(jnp.float32)
                w0 = 1.0 - wt[s : s + 1]
                w1 = wt[s : s + 1]
                h0lo = 1.0 - hi_bit0[s : s + 1]
                h0hi = hi_bit0[s : s + 1]
                h1lo = 1.0 - hi_bit1[s : s + 1]
                h1hi = hi_bit1[s : s + 1]
                v8_0 = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [
                                dch[ch][s : s + 1] * w0 * h0lo,
                                dch[ch][s : s + 1] * w0 * h0hi,
                            ],
                            axis=0,
                        )
                        for ch in range(4)
                    ],
                    axis=0,
                )  # (8, 128)
                v8_1 = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [
                                dch[ch][s : s + 1] * w1 * h1lo,
                                dch[ch][s : s + 1] * w1 * h1hi,
                            ],
                            axis=0,
                        )
                        for ch in range(4)
                    ],
                    axis=0,
                )
                dtf_ref[:, :] += jax.lax.dot_general(
                    v8_0, bt0, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    v8_1, bt1, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            for s in range(smax):
                scatter_slot(s)
            if extra:

                @pl.when(k == 0)
                def _():
                    for s in range(smax, s_tot):
                        scatter_slot(s)

            # ---- carry updates ----
            chunk_trans = t_excl[s_tot - 1 : s_tot] * one_m[
                s_tot - 1 : s_tot
            ]
            tp_ref[0, pl.ds(i, 1), :] = t_carry * chunk_trans
            tp_ref[1, pl.ds(i, 1), :] = p_incl[s_tot - 1 : s_tot]
            return 0

        jax.lax.fori_loop(0, rrb, row_body, 0)

        # Write this slab's slice gradients (lo visited once per rbi;
        # hi revisits the clamped last slice consecutively).
        dlo_ref[0, 0] = dvc_ref[:nc_pad]
        km1 = jnp.maximum(j - 1, 0)

        @pl.when((j == 0) | (idx1_ref[j] != idx1_ref[km1]))
        def _():
            dhi_ref[0, 0] = jnp.zeros_like(dhi_ref[0, 0])

        dhi_ref[0, 0] += dvc_ref[nc_pad:]

    return kernel


@functools.lru_cache(maxsize=128)
def _compiled_group_bwd(
    *,
    axis: int,
    b_axis: int,
    c_axis: int,
    na: int,
    nb: int,
    nc: int,
    nb_pad: int,
    nc_pad: int,
    rr: int,
    rrb: int,
    r_tot: int,
    viewport: Tuple[int, int, int, int],
    near: float,
    sample_index: int,
    step: float,
    smax: int,
    extra: int,
    w_c: int,
    mult: float,
    add: float,
    alpha_correction: float,
    trilinear: bool,
    sign: int,
    clip_key: Optional[bytes],
    n_clip: int,
    interpret: bool,
):
    """Jitted backward frame function per (shape × tier) signature:
    rebuilds the ray pack in-jit (same as the forward), gathers the
    cotangents, runs the recompute backward kernel, and reduces the
    per-row-block slice gradients with hi-slice coverage masking."""
    global _COMPILE_COUNT
    _COMPILE_COUNT += 1
    rb = rr // rrb
    order_np = np.arange(na, dtype=np.int32)
    if sign < 0:
        order_np = order_np[::-1].copy()
    idx1_np = np.minimum(order_np + 1, na - 1).astype(np.int32)
    cov_hi = np.isin(
        np.arange(na, dtype=np.int32), idx1_np
    )  # hi-output slices the sweep actually writes
    clip_arr = (
        None
        if clip_key is None
        else np.frombuffer(clip_key, np.float32).reshape(n_clip, 4)
    )
    frag = (
        _jitter_frag(viewport, sample_index) if sample_index > 0 else None
    )

    kernel = _make_exact_bwd_kernel(
        na=na,
        nb=nb,
        nc=nc,
        nb_pad=nb_pad,
        nc_pad=nc_pad,
        rrb=rrb,
        smax=smax,
        extra=extra,
        w_c=w_c,
        step=step,
        mult=mult,
        add=add,
        alpha_correction=alpha_correction,
        trilinear=trilinear,
        sign=sign,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(rb, na),
        in_specs=[
            pl.BlockSpec(
                (1, nc_pad, nb_pad),
                lambda rbi, j, i0, i1, gm: (i0[j], 0, 0),
            ),
            pl.BlockSpec(
                (1, nc_pad, nb_pad),
                lambda rbi, j, i0, i1, gm: (i1[j], 0, 0),
            ),
            pl.BlockSpec((8, 128), lambda rbi, j, i0, i1, gm: (0, 0)),
            pl.BlockSpec(
                (8, rrb, 128), lambda rbi, j, i0, i1, gm: (0, rbi, 0)
            ),
            pl.BlockSpec(
                (4, rrb, 128), lambda rbi, j, i0, i1, gm: (0, rbi, 0)
            ),
            pl.BlockSpec(
                (2, rrb, 128), lambda rbi, j, i0, i1, gm: (0, rbi, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, nc_pad, nb_pad),
                lambda rbi, j, i0, i1, gm: (rbi, i0[j], 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, nc_pad, nb_pad),
                lambda rbi, j, i0, i1, gm: (rbi, i1[j], 0, 0),
            ),
            pl.BlockSpec((8, 128), lambda rbi, j, i0, i1, gm: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * nc_pad, nb_pad), jnp.float32),
            pltpu.VMEM((smax + extra, 128), jnp.float32),
            pltpu.VMEM((2 * nc_pad, nb_pad), jnp.float32),
            pltpu.VMEM((2, rrb, 128), jnp.float32),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((rb, na, nc_pad, nb_pad), jnp.float32),
        jax.ShapeDtypeStruct((rb, na, nc_pad, nb_pad), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]

    @jax.jit
    def run(
        vol_perm, tfmat, inv_proj, inv_mv, gmin, gmax, wmin, wmax,
        tmin, tmax, idx_pad, g, out,
    ):
        eye, dirs, cos_z, _ = ray_ops.make_rays(
            inv_proj, inv_mv, viewport, sample_index=sample_index,
            frag_override=frag,
        )
        dirs = dirs.reshape(-1, 3)
        tnp_ = ray_ops.near_plane_t(cos_z.reshape(-1), near)
        tng, _t1g, hitg = ray_ops.intersect_box(eye, dirs, gmin, gmax)
        t0b, t1b, hitb = ray_ops.intersect_box(eye, dirs, wmin, wmax)
        valid = (hitg & hitb).astype(jnp.float32)
        n_start = jnp.ceil(
            jnp.maximum(tnp_ - tng, 0.0) / np.float32(step)
        )
        if clip_arr is not None and len(clip_arr):
            clo, chi = ray_ops.clip_ray(
                eye, dirs,
                jnp.full(r_tot, -3e38, jnp.float32),
                jnp.full(r_tot, 3e38, jnp.float32),
                clip_arr,
            )
        else:
            clo = jnp.full(r_tot, -3e38, jnp.float32)
            chi = jnp.full(r_tot, 3e38, jnp.float32)
        t_lo = jnp.maximum(t0b, clo)
        t_hi = jnp.minimum(t1b, chi)

        mask = idx_pad < r_tot
        safe = jnp.where(mask, idx_pad, 0)

        def gg(x, fill):
            return jnp.where(mask, x[safe], np.float32(fill))

        pack = jnp.stack(
            [
                gg(dirs[:, axis], 1.0),
                gg(dirs[:, b_axis], 0.0),
                gg(dirs[:, c_axis], 0.0),
                gg(tng, 0.0),
                gg(n_start, 0.0),
                gg(valid, 0.0),
                gg(t_lo, -3e38),
                gg(t_hi, 3e38),
            ]
        ).reshape(8, rr, 128)
        g_rows = jnp.where(mask[:, None], g[safe], 0.0)  # (RR*128, 4)
        out_rows = jnp.where(mask[:, None], out[safe], 0.0)
        g4 = jnp.transpose(
            g_rows.reshape(rr, 128, 4), (2, 0, 1)
        )  # (4, rr, 128)
        tot = jnp.sum(
            g_rows[:, :3] * out_rows[:, :3], axis=-1
        ).reshape(rr, 128)
        t_fin = (1.0 - out_rows[:, 3]).reshape(rr, 128)
        aux = jnp.stack([tot, t_fin])

        s_vec = (tmax - tmin) / (wmax - wmin)
        o_vec = tmin - wmin * s_vec
        geom = jnp.concatenate(
            [
                jnp.stack([eye[axis], eye[b_axis], eye[c_axis]]),
                jnp.stack([s_vec[axis], s_vec[b_axis], s_vec[c_axis]]),
                jnp.stack([o_vec[axis], o_vec[b_axis], o_vec[c_axis]]),
                jnp.zeros(7, jnp.float32),
            ]
        ).astype(jnp.float32)

        dlo, dhi, dtf8 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray(order_np), jnp.asarray(idx1_np), geom, vol_perm,
          vol_perm, tfmat, pack, g4, aux)

        d_perm = dlo.sum(axis=0) + jnp.where(
            jnp.asarray(cov_hi)[:, None, None], dhi.sum(axis=0), 0.0
        )
        # (8, 128) half-table rows [2ch+half] -> (256, 4).
        dtf = jnp.stack(
            [
                jnp.concatenate([dtf8[2 * ch], dtf8[2 * ch + 1]])
                for ch in range(4)
            ],
            axis=-1,
        )
        return d_perm, dtf

    return run


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def render_exact_diff(
    volume_zyx, tf, plan: ExactPlan, interpret: bool = False
):
    """Differentiable reference-exact render → (R, 4) rgba.

    Forward IS :func:`render_exact_rays`; backward is the fused
    recompute Pallas sweep (:func:`_make_exact_bwd_kernel`) producing
    density and TF-table gradients at kernel speed — the capability the
    framework adds over the reference (which has no autodiff anywhere),
    now on the exact sample set rather than the shear-warp
    approximation (VERDICT r4 missing 2).  Requires
    ``plan.params.early_exit > 1`` (trainer semantics: the composite
    inversion needs every sample composited) and a plan without
    XLA-fallback rays."""
    if float(plan.params.early_exit) <= 1.0:
        raise ValueError(
            "render_exact_diff requires early_exit > 1 (disabled); "
            "the composite inversion composites every sample"
        )
    if len(plan.fallback_idx):
        raise ValueError(
            "render_exact_diff: plan routes rays to the XLA fallback "
            "(too oblique); raise max_slots or choose another axis"
        )
    return render_exact_rays(
        volume_zyx, tf, plan, interpret=interpret
    )


def _red_fwd(volume_zyx, tf, plan, interpret):
    out = render_exact_diff(volume_zyx, tf, plan, interpret)
    return out, (volume_zyx, tf, out)


def _red_bwd(plan, interpret, res, g):
    volume_zyx, tf, out = res
    vol_perm = permute_volume(volume_zyx, plan)
    tfmat = tf_halves(tf)
    p = plan.params
    lo_, hi_ = p.data_source_range
    cam = plan.camera
    na_, nc_pad_, nb_pad_ = (
        int(vol_perm.shape[0]), int(vol_perm.shape[1]),
        int(vol_perm.shape[2]),
    )
    operands = dict(
        inv_proj=jnp.asarray(cam.inv_proj, jnp.float32),
        inv_mv=jnp.asarray(cam.inv_mv, jnp.float32),
        gmin=jnp.asarray(plan.global_min, jnp.float32),
        gmax=jnp.asarray(plan.global_max, jnp.float32),
        wmin=jnp.asarray(plan.world_min, jnp.float32),
        wmax=jnp.asarray(plan.world_max, jnp.float32),
        tmin=jnp.asarray(plan.tex_min, jnp.float32),
        tmax=jnp.asarray(plan.tex_max, jnp.float32),
    )
    clip_key = (
        None if plan.clip_planes is None else plan.clip_planes.tobytes()
    )
    n_clip = 0 if plan.clip_planes is None else len(plan.clip_planes)
    d_perm = jnp.zeros((na_, nc_pad_, nb_pad_), jnp.float32)
    dtf = jnp.zeros((TF_SIZE, 4), jnp.float32)
    rrb = 64
    for group in plan.groups:
        rg = len(group.ray_idx)
        rr = _round_up(max(rg, 1), 128 * rrb) // 128
        rrb_g = min(rrb, rr)
        idx_pad = np.concatenate(
            [
                group.ray_idx,
                np.full(rr * 128 - rg, plan.n_rays, np.int32),
            ]
        ).astype(np.int32)
        run = _compiled_group_bwd(
            axis=plan.axis,
            b_axis=plan.b_axis,
            c_axis=plan.c_axis,
            na=plan.brick_shape[2 - plan.axis],
            nb=plan.brick_shape[2 - plan.b_axis],
            nc=plan.brick_shape[2 - plan.c_axis],
            nb_pad=nb_pad_,
            nc_pad=nc_pad_,
            rr=rr,
            rrb=rrb_g,
            r_tot=plan.n_rays,
            viewport=tuple(plan.viewport),
            near=float(cam.near),
            sample_index=plan.sample_index,
            step=float(p.step_size),
            smax=group.smax,
            extra=group.extra,
            w_c=group.w_c,
            mult=float(1.0 / (hi_ - lo_)),
            add=float(-lo_ / (hi_ - lo_)),
            alpha_correction=float(p.alpha_correction),
            trilinear=p.filter_mode == "trilinear",
            sign=group.sign,
            clip_key=clip_key,
            n_clip=n_clip,
            interpret=interpret,
        )
        dp, dt = run(
            vol_perm, tfmat, operands["inv_proj"], operands["inv_mv"],
            operands["gmin"], operands["gmax"], operands["wmin"],
            operands["wmax"], operands["tmin"], operands["tmax"],
            _dev_const(idx_pad), g, out,
        )
        d_perm = d_perm + dp
        dtf = dtf + dt

    # Un-permute: permute_volume did transpose(vol, (2-a, 2-c, 2-b))
    # then pad; crop the pads and invert the transpose.
    a, b, c = plan.axis, plan.b_axis, plan.c_axis
    perm = (2 - a, 2 - c, 2 - b)
    inv = tuple(int(x) for x in np.argsort(perm))
    zdim, ydim, xdim = plan.brick_shape
    dims_perm = [(zdim, ydim, xdim)[q] for q in perm]
    d_vol = jnp.transpose(
        d_perm[: dims_perm[0], : dims_perm[1], : dims_perm[2]], inv
    )
    return d_vol, dtf


render_exact_diff.defvjp(_red_fwd, _red_bwd)
