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

Measured on v5e (64³ → 256²×512, chained-frame marginal): 31.5 ms/frame
= 2.08 Mrays/s, 229× the XLA gather marcher; saturating scenes 1.3 ms
(50 Mrays/s) through the early-exit skips.  Optimization ladder:
one-hot-MXU fetch + serial per-slot compositing 236 ms → gather fetch +
per-row slot budgets 119 ms → c-window + batched TF + closed-form
composite 31.5 ms.

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
@dataclasses.dataclass(frozen=True)
class _Group:
    """One homogeneous kernel invocation: rays sharing slab-axis sign."""

    ray_idx: np.ndarray  # (Rg,) indices into the flat ray batch
    sign: int  # +1: marching increases slab coord; -1 decreases
    smax: int  # per-slab slot-window length (interior slabs)
    extra: int  # additional slots for the edge bucket (k == 0)
    w_c: int  # c-window height covering any 128-ray row's slab crossing


@dataclasses.dataclass(frozen=True)
class ExactPlan:
    """Host-side static plan for one (camera × brick geometry) pair.

    Everything per-ray is precomputed with the same jnp ops the
    reference marcher uses and embedded as constants; the kernel's only
    runtime operands are the volume and the transfer function.
    """

    axis: int  # world axis (0=x, 1=y, 2=z) used for slabs
    b_axis: int
    c_axis: int
    groups: Tuple[_Group, ...]
    fallback_idx: np.ndarray  # rays marched by ops/raycast
    # Per-ray constants for the full flat batch (f32 numpy):
    dirs: np.ndarray  # (R, 3)
    eye: np.ndarray  # (3,)
    tn_global: np.ndarray  # (R,)
    n_start: np.ndarray  # (R,)
    valid: np.ndarray  # (R,) {0, 1}
    t_lo: np.ndarray  # (R,) max(brick t0, clip_lo): sample-ownership lo
    t_hi: np.ndarray  # (R,) min(brick t1, clip_hi): sample-ownership hi
    t_near_plane: np.ndarray  # (R,)
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
    clip_planes: Optional[np.ndarray] = None  # for the XLA fallback rays


def _host_make_rays(camera: Camera, sample_index: int = 0):
    """Per-ray constants via the SAME jnp ops the reference marcher
    uses, fetched to host.  Parity requires bitwise-equal ray geometry:
    the first in-box sample of every ray lies exactly ON the global-box
    entry face (t = tnGlobal), so its half-open inside test is decided
    by f32 rounding — constants from an independent numpy replica flip
    those decisions (measured: ~1 entry sample per silhouette ray)."""
    eye, dirs, cos_z, _ = ray_ops.make_rays(
        camera.inv_proj, camera.inv_mv, camera.viewport,
        sample_index=sample_index,
    )
    return (
        np.asarray(eye, np.float32),
        np.asarray(dirs.reshape(-1, 3), np.float32),
        np.asarray(cos_z.reshape(-1), np.float32),
    )


def _host_intersect_box(eye, dirs, bmin, bmax):
    t0, t1, hit = ray_ops.intersect_box(
        jnp.asarray(eye), jnp.asarray(dirs), jnp.asarray(bmin),
        jnp.asarray(bmax)
    )
    return (
        np.asarray(t0, np.float32),
        np.asarray(t1, np.float32),
        np.asarray(hit),
    )



def _c_window_bound(
    idx, sign, smax, extra, *, dirs, tn, valid,
    e_a, e_c, s_a, o_a, s_c, o_c, na, nc, step, a_axis, c_axis,
) -> int:
    """Smallest safe c-window height for a group: the max, over every
    packed 128-ray row and every slab, of the row's c-coordinate spread
    across one slot window (float64, conservative +4 margin for the
    second tap and f32 slack; rounded up to a sublane multiple)."""
    r = len(idx)
    rr = _round_up(max(r, 1), 128) // 128
    pad = rr * 128 - r

    def f(x, fill):
        return np.concatenate(
            [np.asarray(x, np.float64)[idx], np.full(pad, fill)]
        ).reshape(rr, 128)

    da = f(dirs[:, a_axis], 1.0)
    dc = f(dirs[:, c_axis], 0.0)
    tnp_ = f(tn, 0.0)
    v = f(valid, 0.0) > 0
    qa = da * step * s_a * na
    qa = np.where(np.abs(qa) < 1e-12, 1.0, qa)
    pa = ((e_a + da * tnp_) * s_a + o_a) * na - 0.5
    qc = dc * step * s_c * nc
    pc = ((e_c + dc * tnp_) * s_c + o_c) * nc - 0.5
    w = 0.0
    for k in range(na):
        if sign > 0:
            bound = -0.6 if k == 0 else float(k)
        else:
            bound = float(k + 1)
        nlo = np.ceil((bound - pa) / qa) - 1.0
        slots = smax + (extra if k == 0 else 0)
        c0 = pc + qc * nlo
        c1 = pc + qc * (nlo + slots)
        cmin = np.where(v, np.clip(np.minimum(c0, c1), 0, nc - 1), np.inf)
        cmax = np.where(v, np.clip(np.maximum(c0, c1), 0, nc - 1), -np.inf)
        row_min = cmin.min(axis=1)
        row_max = cmax.max(axis=1)
        spread = np.where(np.isfinite(row_min), row_max - row_min, 0.0)
        if spread.size:
            w = max(w, float(spread.max()))
    return max(_round_up(int(np.ceil(w)) + 4, 8), 8)


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
    shared across bricks (fragRaycast.glsl:152-158)."""
    if isinstance(jnp.zeros(()) + 0, jax.core.Tracer):
        raise RuntimeError(
            "plan_exact must run OUTSIDE jit (it embeds per-ray "
            "constants); build the plan once per camera and pass "
            "plan= to render_exact"
        )
    wmin = np.asarray(world_min, np.float32)
    wmax = np.asarray(world_max, np.float32)
    gmin = wmin if global_min is None else np.asarray(global_min, np.float32)
    gmax = wmax if global_max is None else np.asarray(global_max, np.float32)
    tmin = np.asarray(tex_min, np.float32)
    tmax = np.asarray(tex_max, np.float32)

    eye, dirs, cos_z = _host_make_rays(camera, sample_index)
    n_rays = dirs.shape[0]
    t_near_plane = np.asarray(
        ray_ops.near_plane_t(jnp.asarray(cos_z), camera.near), np.float32
    )
    tn_global, _, hit_global = _host_intersect_box(eye, dirs, gmin, gmax)
    t0b, t1b, hit_brick = _host_intersect_box(eye, dirs, wmin, wmax)
    valid = (hit_global & hit_brick).astype(np.float32)
    n_start = np.asarray(
        jnp.ceil(
            jnp.maximum(jnp.asarray(t_near_plane - tn_global), 0.0)
            / np.float32(params.step_size)
        ),
        np.float32,
    )

    if clip_planes is not None and len(clip_planes) > 0:
        lo, hi = ray_ops.clip_ray(
            jnp.asarray(eye),
            jnp.asarray(dirs),
            jnp.full(n_rays, -3e38, jnp.float32),
            jnp.full(n_rays, 3e38, jnp.float32),
            clip_planes,
        )
        clip_lo = np.asarray(lo, np.float32)
        clip_hi = np.asarray(hi, np.float32)
    else:
        clip_lo = np.full(n_rays, -3e38, np.float32)
        clip_hi = np.full(n_rays, 3e38, np.float32)

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
        # go to the XLA fallback instead of inflating every slab.
        qfloor = 1.0 / max(max_slots - 3, 1)
        bad = qa < qfloor
        if bad.any():
            idx = np.where(sel)[0]
            fallback[idx[bad]] = True
            sel = sel & ~fallback
            qa = np.abs(q_cells[sel])
        if not sel.any():
            continue
        qmin = float(qa.min())
        smax = int(math.ceil(1.0 / qmin)) + 2
        extra = int(math.ceil(0.6 / qmin)) + 1
        gidx = np.where(sel)[0]
        w_c = _c_window_bound(
            gidx, sign, smax, extra,
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
                ray_idx=gidx,
                sign=sign,
                smax=smax,
                extra=extra,
                w_c=w_c,
            )
        )

    return ExactPlan(
        axis=axis,
        b_axis=b_axis,
        c_axis=c_axis,
        groups=tuple(groups),
        fallback_idx=np.where(fallback)[0],
        dirs=dirs,
        eye=eye,
        tn_global=tn_global,
        n_start=n_start,
        valid=valid,
        t_lo=np.maximum(t0b, clip_lo).astype(np.float32),
        t_hi=np.minimum(t1b, clip_hi).astype(np.float32),
        t_near_plane=t_near_plane,
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
    e_abc: Tuple[float, float, float],
    mad_s: Tuple[float, float, float],  # world -> tex scale per (a, b, c)
    mad_o: Tuple[float, float, float],  # world -> tex offset per (a, b, c)
    alpha_correction: float,
    early_exit: float,
    trilinear: bool,
    sign: int,
    check_window: bool = False,
):
    """Kernel body factory; all geometry is compile-time static.

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
    e_a, e_b, e_c = e_abc
    s_a, s_b, s_c = mad_s
    o_a, o_b, o_c = mad_o
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
                    q = d_a * np.float32(step * s_a) * dim_a_f
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

        def kernel(i0, i1, lo, hi, tf, ray, cin, out, ovf, vc, de, do, an):
            _body(i0, i1, lo, hi, tf, ray, cin, out, vc, de, do, an, ovf)

    else:

        def kernel(i0, i1, lo, hi, tf, ray, cin, out, vc, de, do, an):
            _body(i0, i1, lo, hi, tf, ray, cin, out, vc, de, do, an, None)

    return kernel


def _march_group(
    vol_perm: jnp.ndarray,  # (A, nc_pad, nb_pad) axis-permuted padded volume
    tfmat: jnp.ndarray,  # (8, 128)
    ray_pack: jnp.ndarray,  # (8, RR, 128)
    carry_in: jnp.ndarray,  # (4, RR, 128)
    *,
    plan: ExactPlan,
    group: _Group,
    nb: int,
    nc: int,
    rrb: int,
    interpret: bool,
    check_window: bool = False,
) -> jnp.ndarray:
    na, nc_pad, nb_pad = vol_perm.shape
    rr = ray_pack.shape[1]
    rb = rr // rrb
    a, bx, c = plan.axis, plan.b_axis, plan.c_axis
    p = plan.params

    order = np.arange(na, dtype=np.int32)
    if group.sign < 0:
        order = order[::-1].copy()
    idx1 = np.minimum(order + 1, na - 1).astype(np.int32)

    lo_, hi_ = p.data_source_range
    kernel = _make_exact_kernel(
        check_window=check_window,
        na=na,
        nb=nb,
        nc=nc,
        nb_pad=nb_pad,
        nc_pad=nc_pad,
        rrb=rrb,
        smax=group.smax,
        extra=group.extra,
        w_c=group.w_c,
        step=p.step_size,
        mult=1.0 / (hi_ - lo_),
        add=-lo_ / (hi_ - lo_),
        e_abc=tuple(float(plan.eye[q]) for q in (a, bx, c)),
        mad_s=tuple(
            float(
                (plan.tex_max[q] - plan.tex_min[q])
                / (plan.world_max[q] - plan.world_min[q])
            )
            for q in (a, bx, c)
        ),
        mad_o=tuple(
            float(
                plan.tex_min[q]
                - plan.world_min[q]
                * (plan.tex_max[q] - plan.tex_min[q])
                / (plan.world_max[q] - plan.world_min[q])
            )
            for q in (a, bx, c)
        ),
        alpha_correction=p.alpha_correction,
        early_exit=p.early_exit,
        trilinear=p.filter_mode == "trilinear",
        sign=group.sign,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rb, na),
        in_specs=[
            pl.BlockSpec(
                (1, nc_pad, nb_pad), lambda rbi, j, i0, i1: (i0[j], 0, 0)
            ),
            pl.BlockSpec(
                (1, nc_pad, nb_pad), lambda rbi, j, i0, i1: (i1[j], 0, 0)
            ),
            pl.BlockSpec((8, 128), lambda rbi, j, i0, i1: (0, 0)),
            pl.BlockSpec((8, rrb, 128), lambda rbi, j, i0, i1: (0, rbi, 0)),
            pl.BlockSpec((4, rrb, 128), lambda rbi, j, i0, i1: (0, rbi, 0)),
        ],
        out_specs=(
            pl.BlockSpec(
                (4, rrb, 128), lambda rbi, j, i0, i1: (0, rbi, 0)
            ),
            pl.BlockSpec((1, 8, 128), lambda rbi, j, i0, i1: (rbi, 0, 0)),
        )
        if check_window
        else pl.BlockSpec(
            (4, rrb, 128), lambda rbi, j, i0, i1: (0, rbi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * nc_pad, nb_pad), jnp.float32),
            pltpu.VMEM((group.smax + group.extra, 128), jnp.float32),
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
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(order), jnp.asarray(idx1), vol_perm, vol_perm, tfmat,
      ray_pack, carry_in)


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


def _pack_rays(plan: ExactPlan, idx: np.ndarray, rrb: int):
    """Gather per-ray constants for ``idx`` into the (8, RR, 128) pack
    (lane-padded with valid = 0 rays)."""
    rg = len(idx)
    rr = _round_up(max(rg, 1), 128 * rrb) // 128
    pad = rr * 128 - rg

    def f(x, fill=0.0):
        v = np.concatenate(
            [x[idx].astype(np.float32), np.full(pad, fill, np.float32)]
        )
        return v.reshape(rr, 128)

    a, b, c = plan.axis, plan.b_axis, plan.c_axis
    pack = np.stack(
        [
            f(plan.dirs[:, a], fill=1.0),  # avoid q = 0 on padding
            f(plan.dirs[:, b]),
            f(plan.dirs[:, c]),
            f(plan.tn_global),
            f(plan.n_start),
            f(plan.valid),
            f(plan.t_lo, fill=-3e38),
            f(plan.t_hi, fill=3e38),
        ]
    )
    return jnp.asarray(pack), rr


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
    bound silently dropping samples (costs a host sync per group).

    Jit-friendly: ``volume_zyx`` and ``tf`` are the only runtime
    operands (plus the optional carry); everything else is baked from
    the plan.  Rays the kernel cannot serve (plan.fallback_idx) run
    through ops/raycast.render_rays with identical semantics.
    """
    r_tot = plan.n_rays
    out = (
        jnp.zeros((r_tot, 4), jnp.float32)
        if init_carry is None
        else jnp.asarray(init_carry, jnp.float32)
    )
    if vol_perm is None:
        vol_perm = permute_volume(volume_zyx, plan)
    tfmat = tf_halves(tf)

    for group in plan.groups:
        pack, rr = _pack_rays(plan, group.ray_idx, rrb)
        rrb_g = min(rrb, rr)
        cin = out[group.ray_idx]  # (Rg, 4)
        pad = rr * 128 - len(group.ray_idx)
        cin = jnp.concatenate(
            [cin, jnp.zeros((pad, 4), jnp.float32)]
        ).reshape(rr, 128, 4)
        cin = jnp.transpose(cin, (2, 0, 1))
        res = _march_group(
            vol_perm,
            tfmat,
            pack,
            cin,
            plan=plan,
            group=group,
            nb=plan.brick_shape[2 - plan.b_axis],
            nc=plan.brick_shape[2 - plan.c_axis],
            rrb=rrb_g,
            interpret=interpret,
            check_window=check_window,
        )  # (4, RR, 128)
        if check_window:
            res, ovf = res
            if float(jnp.max(ovf)) > 0.0:
                raise RuntimeError(
                    "exact_pallas: c-window overflow — an owned "
                    "sample's taps fell outside the host-bounded "
                    f"window (group sign={group.sign}, w_c={group.w_c})"
                )
        res = jnp.transpose(res, (1, 2, 0)).reshape(rr * 128, 4)
        out = out.at[group.ray_idx].set(res[: len(group.ray_idx)])

    if len(plan.fallback_idx):
        from libre_tpu.ops import raycast
        from libre_tpu.ops.reference import BrickSet

        # Fallback rays march the SAME brick on the SAME global sample
        # grid as the kernel rays: the brick's world box with its atlas
        # tex inset, and the GLOBAL volume box anchoring t_n (advisor
        # r4: anchoring the grid to the brick box broke decomposition
        # invariance for exactly the rays the kernel cannot serve).
        idx = plan.fallback_idx
        bricks = BrickSet(
            data=jnp.asarray(volume_zyx, jnp.float32)[None],
            world_min=jnp.asarray([plan.world_min], jnp.float32),
            world_max=jnp.asarray([plan.world_max], jnp.float32),
            tex_min=jnp.asarray([plan.tex_min], jnp.float32),
            tex_max=jnp.asarray([plan.tex_max], jnp.float32),
        )
        fb_carry = out[idx]
        max_steps = int(
            math.ceil(
                float(np.linalg.norm(plan.global_max - plan.global_min))
                / plan.params.step_size
            )
        ) + 4
        res = raycast.render_rays(
            bricks,
            tf,
            jnp.asarray(plan.eye),
            jnp.asarray(plan.dirs[idx]),
            jnp.asarray(plan.t_near_plane[idx]),
            plan.params,
            plan.global_min,
            plan.global_max,
            clip_planes=plan.clip_planes,
            max_steps=max_steps,
            init_carry=(fb_carry[:, :3], fb_carry[:, 3]),
        )
        out = out.at[idx].set(res)
    return out


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
