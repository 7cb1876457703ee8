"""Fused Pallas shear-warp kernel — the single-chip speed-of-light path.

The jnp shear-warp pipeline (ops/shearwarp.render_slope_grid) is
HBM-bound: it materializes four (K, V, U) resampled slabs plus cumprod
temporaries (~1.5 GB of traffic for a 512×256² frame) before the
closed-form composite.  This kernel fuses the whole
shear → classify-carry → composite stage into ONE Pallas program:

* grid = (K,) planes, executed **sequentially** on the core — the
  front-to-back compositing carry (two transmittance buffers + the RGB
  accumulator) lives in VMEM scratch across grid steps and never
  touches HBM;
* the two volume slices that bracket virtual plane k stream HBM→VMEM
  through the automatic Pallas pipeline, indexed by a scalar-prefetch
  slice table (consecutive planes hitting the same slice pair are NOT
  re-fetched — total volume traffic ≈ one pass over the classified
  volume);
* the per-plane 1-D interpolation matrices Mb (Nb, U) and Mcᵀ (V, Nc)
  are rebuilt in-kernel from three scalars each (iota-compare on the
  VPU) instead of being streamed from HBM — that alone saves
  K·(Nb·U + V·Nc)·4 bytes (≈ 256 MB/frame at 512×256²);
* resampling runs as dense f32 matmuls on the MXU:
  (4·Nc, Nb) @ (Nb, U), then 4 × (V, Nc) @ (Nc, U);
* compositing uses the exact two-carry form of
  shearwarp._composite_planes — a raw transmittance for the early-exit
  test and a masked one for the output — so results match the jnp path
  to f32 accumulation order;
* once every slope-ray has saturated, an SMEM flag skips all remaining
  per-plane compute (the reference's early ray termination,
  fragRaycast.glsl:115-117, at plane granularity).

Semantics are identical to ops/shearwarp.render_slope_grid (same
sample points, same opacity correction, same early-exit rule); the unit
tests assert allclose in interpret mode on CPU and the benchmark runs
the compiled kernel on the chip.

Differentiability: the public entry point carries a ``jax.custom_vjp``
whose backward pass recomputes through the jnp pipeline (whole-frame
rematerialization — the Pallas forward stores no residuals, matching
the recompute strategy of SURVEY.md §7 stage 2).

Measured on v5e (256² × 512 planes, 64³ volume, marginal per-frame cost
with chained frames to cancel the ~25 ms remote-dispatch overhead),
optimization ladder:

* jnp slab pipeline                                  9.7  ms
* fused kernel, classify every frame                 2.45 ms
* + classified stack cached (classify was 1.2 ms)    2.07 ms
* + on-device view tables (one scalar upload)        1.56 ms
* + single-dispatch frame, 1-gather patch warp       1.17 ms
* + single transmittance carry, periodic exit test   0.93 ms  (70 Mrays/s)

Volume/plane scaling (kernel only, classified stack cached, 256² grid):
64³ K=512 → 1.1 ms; 128³ K=512 → 1.3 ms; 256³ K=512 → 2.4 ms;
256³ K=1024 → 4.1 ms (pre-single-carry numbers).

Kernel-stage ablation: mm2 (4 channel matmuls) ≈ 0.25 ms, the rest
(vs lerp, matrix builds, composite, grid overhead) ≈ 0.67 ms — the
kernel is VPU-bound, within ~2× of the MXU tile floor for these shapes.
Casting matmul operands to bfloat16 measured neutral here (the compile
env sets --xla_allow_excess_precision=true, which already demotes f32
matmuls to one-pass bf16); ``ShearWarpParams.compute_dtype`` keeps the
knob for deployments without that flag.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libre_tpu.ops.reference import ALPHA_CLAMP, RenderParams
from libre_tpu.ops import shearwarp as sw


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def classify_planes(
    volume_zyx: jnp.ndarray,
    tf: jnp.ndarray,
    axis: int,
    data_source_range: Tuple[float, float],
    chunk: int = 32768,
) -> jnp.ndarray:
    """Classified, permuted, padded plane stack (Na, 4·Nc_pad, Nb_pad).

    The TF lookup (two-tap linear, tf_ops.lookup semantics) runs as a
    one-hot MXU matmul in bounded chunks — ~3× faster than the XLA
    gather on v5e and O(chunk) peak memory.  View-dependent only
    through the axis permutation, so the engine caches the result per
    (volume, tf, axis) and steady-state frames skip it entirely (the
    reference re-uploads its TF texture only on change,
    GLRaycastRenderer.cpp:175-193).
    """
    lo, hi = data_source_range
    t = tf.shape[0]
    perm = sw._PERM[axis]
    vol = jnp.transpose(volume_zyx.astype(jnp.float32), perm)
    na, nc, nb = vol.shape
    nb_pad = _round_up(nb, 128)
    nc_pad = _round_up(nc, 128)

    flat = vol.reshape(-1)
    n_vox = flat.shape[0]
    pad_n = _round_up(n_vox, chunk)
    flat = jnp.pad(flat, (0, pad_n - n_vox))
    cols = jnp.arange(t, dtype=jnp.int32)

    def classify_chunk(d):
        s = jnp.clip((d - lo) / (hi - lo), 0.0, 1.0) * t - 0.5
        s = jnp.clip(s, 0.0, float(t - 1))
        i0 = jnp.floor(s)
        w = s - i0
        i0i = i0.astype(jnp.int32)
        i1i = jnp.minimum(i0i + 1, t - 1)
        e = (cols[None, :] == i0i[:, None]) * (1.0 - w)[:, None] + (
            cols[None, :] == i1i[:, None]
        ) * w[:, None]
        return jax.lax.dot_general(
            e, tf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    rgba = jax.lax.map(
        classify_chunk, flat.reshape(pad_n // chunk, chunk)
    ).reshape(pad_n, 4)[:n_vox]
    chans = jnp.moveaxis(rgba.reshape(na, nc, nb, 4), -1, 1)  # (Na, 4, Nc, Nb)
    chans = jnp.pad(
        chans, ((0, 0), (0, 0), (0, nc_pad - nc), (0, nb_pad - nb))
    )
    return chans.reshape(na, 4 * nc_pad, nb_pad)


def slice_content(chans: jnp.ndarray) -> jnp.ndarray:
    """(Na,) int32 flags: 1 where classified slice ``a`` has any nonzero
    alpha.  Feeds the kernel's empty-space skipping — the shear-warp
    analog of Lacroute-Levoy run-length opacity encoding at plane
    granularity.  Skipping is **bit-exact**: a plane whose bracketing
    slices are all-zero-alpha lerps to zero alpha, so its composite step
    is the identity (w = 0, t unchanged).  View-independent per axis;
    the engine caches it next to the classified stack."""
    nc_pad = chans.shape[1] // 4
    alpha = chans[:, 3 * nc_pad :, :]
    return (jnp.max(alpha, axis=(1, 2)) > 0.0).astype(jnp.int32)


def _plane_activity(content: jnp.ndarray, a0: jnp.ndarray, na: int) -> jnp.ndarray:
    """(K,) int32: plane k is active iff either bracketing slice has
    content."""
    a1 = jnp.minimum(a0 + 1, na - 1)
    return jnp.take(content, a0) | jnp.take(content, a1)


def hit_mask(ug, vg, *, wa0, wa1, eye_a, eb, ec, wb0, wb1, wc0, wc1):
    """(V, U) f32: 1 unless the (u, v) slope ray provably never enters
    the volume's b/c extents anywhere on the a-range (a NECESSARY
    per-axis intersection condition — xb/xc are monotone in the plane
    coordinate, so interval overlap at the endpoints bounds them).
    Conservative the safe way: 0 ⇒ a true miss (the ray samples
    nothing), so excluding it from the whole-plane early-exit test is
    exact; 1 may still miss (just less skipping).  Works in numpy or
    jnp."""
    xp = jnp if isinstance(ug, jnp.ndarray) or isinstance(wa0, jnp.ndarray) else np
    d0, d1 = wa0 - eye_a, wa1 - eye_a
    xb0, xb1 = eb + ug * d0, eb + ug * d1
    hu = (xp.minimum(xb0, xb1) <= wb1) & (xp.maximum(xb0, xb1) >= wb0)
    xc0, xc1 = ec + vg * d0, ec + vg * d1
    hv = (xp.minimum(xc0, xc1) <= wc1) & (xp.maximum(xc0, xc1) >= wc0)
    return (hv[:, None] & hu[None, :]).astype(xp.float32)


def _axis_lerp_table(z: np.ndarray, wa0: float, wa1: float, na: int):
    """Per-plane slice indices + lerp weight for the major axis — the
    scalar form of shearwarp._lerp_matrix (clamp-to-edge, half-voxel
    centers)."""
    sa = (z - wa0) / (wa1 - wa0) * na - 0.5
    s = np.clip(sa, -0.5, na - 0.5)
    i0 = np.floor(np.clip(s, 0.0, float(na - 1)))
    w = np.clip(s - i0, 0.0, 1.0)
    a0 = i0.astype(np.int32)
    a1 = np.minimum(a0 + 1, na - 1).astype(np.int32)
    return a0, a1, w.astype(np.float32)


def _interp_matrix(coord_f, n_real: int, n_pad: int, axis: int, shape):
    """In-kernel two-tap interpolation matrix: ``coord_f`` holds
    fractional voxel coords broadcast along ``axis`` of ``shape``;
    returns the (shape) matrix whose contraction along ``axis``
    performs the lerp (rows ≥ n_real stay zero)."""
    inside = coord_f["inside"]
    s = jnp.clip(coord_f["s"], -0.5, n_real - 0.5)
    i0 = jnp.floor(jnp.clip(s, 0.0, float(n_real - 1)))
    w = jnp.clip(s - i0, 0.0, 1.0)
    i1 = jnp.minimum(i0 + 1.0, float(n_real - 1))
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(jnp.float32)
    m = (rows == i0) * (1.0 - w) + (rows == i1) * w
    return m * inside


def _make_kernel(
    *,
    k_planes: int,
    na: int,
    nb_real: int,
    nc_real: int,
    nb_pad: int,
    nc_pad: int,
    v_pad: int,
    u_pad: int,
    wb0: float,
    wb1: float,
    wc0: float,
    wc1: float,
    early_exit: float,
    compute_dtype=jnp.float32,
):
    sb_scale = nb_real / (wb1 - wb0)
    sc_scale = nc_real / (wc1 - wc0)

    def kernel(
        idx_ref,  # (K,) i32 scalar prefetch: slice index a0 (a1 = a0+1)
        wa_ref,  # (K,) f32 scalar prefetch: axis lerp weight
        dl_ref,  # (K,) f32 scalar prefetch: z - eye_a
        act_ref,  # (K,) i32 scalar prefetch: 1 = plane has content
        #           (empty-space skipping; 0 planes are a bit-exact no-op)
        vw_ref,  # (6,) f32 scalar prefetch: per-VIEW scalars
        #           [ug0, du, dv, eb, ec, vg0] — runtime operands, so one
        #           compilation serves every camera (per major axis);
        #           vg0 is per-device under sort-first row sharding
        lo_ref,  # (1, 4*Nc_pad, Nb_pad) volume slice a0
        hi_ref,  # (1, 4*Nc_pad, Nb_pad) volume slice a1
        corr_ref,  # (V_pad, U_pad) per-ray opacity-correction exponent
        hit_ref,  # (V_pad, U_pad) f32: 1 = ray may intersect the volume
        #           (never-hitting rays keep t = 1 but sample nothing;
        #           excluding them lets the whole-grid early-exit flag
        #           fire on saturated scenes — skipping stays exact)
        out_ref,  # (4, V_pad, U_pad) accumulated rgb + alpha
        t_eff_ref,  # (V_pad, U_pad) transmittance carry
        done_ref,  # (1,) i32 all-rays-saturated flag
    ):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            t_eff_ref[:] = jnp.ones_like(t_eff_ref)
            done_ref[0] = 0

        @pl.when((done_ref[0] == 0) & (act_ref[k] == 1))
        def _():
            wa = wa_ref[k]
            delta = dl_ref[k]
            ug0, du = vw_ref[0], vw_ref[1]
            dv = vw_ref[2]
            eb, ec = vw_ref[3], vw_ref[4]

            # Virtual plane: axis lerp of the two bracketing slices.
            vs = lo_ref[0] * (1.0 - wa) + hi_ref[0] * wa  # (4*Ncp, Nbp)

            # Mb (Nbp, Up): resample voxel-b → slope-u at this plane.
            colf = jax.lax.broadcasted_iota(jnp.int32, (1, u_pad), 1).astype(
                jnp.float32
            )
            xb = eb + (ug0 + du * colf) * delta
            mb = _interp_matrix(
                {
                    "s": (xb - wb0) * sb_scale - 0.5,
                    "inside": ((xb >= wb0) & (xb < wb1)).astype(jnp.float32),
                },
                nb_real,
                nb_pad,
                0,
                (nb_pad, u_pad),
            )
            s1 = jax.lax.dot_general(
                vs.astype(compute_dtype),
                mb.astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (4*Ncp, Up)

            # Mcᵀ (Vp, Ncp): resample voxel-c → slope-v.
            rowf = jax.lax.broadcasted_iota(jnp.int32, (v_pad, 1), 0).astype(
                jnp.float32
            )
            xc = ec + (vw_ref[5] + dv * rowf) * delta
            mct = _interp_matrix(
                {
                    "s": (xc - wc0) * sc_scale - 0.5,
                    "inside": ((xc >= wc0) & (xc < wc1)).astype(jnp.float32),
                },
                nc_real,
                nc_pad,
                1,
                (v_pad, nc_pad),
            )
            s1c = s1.astype(compute_dtype).reshape(4, nc_pad, u_pad)
            mct = mct.astype(compute_dtype)
            plane = [
                jax.lax.dot_general(
                    mct,
                    s1c[ch],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for ch in range(4)
            ]  # 4 × (Vp, Up)

            # Front-to-back composite with exact early exit
            # (shearwarp._composite_planes, fragRaycast.glsl:104-111).
            # Single transmittance carry: the jnp form tests against the
            # UNMASKED cumulative alpha, but both are bit-identical up to
            # and including the crossing plane, and the mask stays 0 for
            # all later planes under either carry (alpha accumulation is
            # monotone), so one carry reproduces the two-carry results
            # exactly.
            a_corr = 1.0 - jnp.power(
                1.0 - jnp.minimum(plane[3], ALPHA_CLAMP), corr_ref[:]
            )
            t_eff = t_eff_ref[:]
            m = ((1.0 - t_eff) <= early_exit).astype(jnp.float32)
            a_eff = a_corr * m
            w = a_eff * t_eff
            out_ref[0] += w * plane[0]
            out_ref[1] += w * plane[1]
            out_ref[2] += w * plane[2]
            t_eff = t_eff * (1.0 - a_eff)
            out_ref[3] = 1.0 - t_eff
            t_eff_ref[:] = t_eff

            # Early ray termination at plane granularity: skip all
            # remaining compute once every ray has saturated.  The
            # full-grid max-reduction runs every 8th plane only.
            @pl.when(k % 8 == 7)
            def _():
                @pl.when(
                    jnp.max(t_eff * hit_ref[:]) < 1.0 - early_exit
                )
                def _():
                    done_ref[0] = 1

    return kernel


@functools.lru_cache(maxsize=128)
def _compiled_renderer(
    *,
    na: int,
    nc_real: int,
    nb_real: int,
    k_planes: int,
    v_size: int,
    u_size: int,
    wb0: float,
    wb1: float,
    wc0: float,
    wc1: float,
    early_exit: float,
    compute_dtype: str,
    interpret: bool,
):
    """One jitted fused render per (volume geometry, axis-projected
    bounds, grid shape) — every per-VIEW quantity (eye, slope bounds,
    plane tables, opacity correction) is a runtime operand, so moving
    the camera does NOT recompile (at most 3 compilations per scene,
    one per major axis)."""
    nb_pad = _round_up(nb_real, 128)
    nc_pad = _round_up(nc_real, 128)
    v_pad = _round_up(v_size, 8)
    u_pad = _round_up(u_size, 128)
    kernel = _make_kernel(
        k_planes=k_planes,
        na=na,
        nb_real=nb_real,
        nc_real=nc_real,
        nb_pad=nb_pad,
        nc_pad=nc_pad,
        v_pad=v_pad,
        u_pad=u_pad,
        wb0=wb0,
        wb1=wb1,
        wc0=wc0,
        wc1=wc1,
        early_exit=early_exit,
        compute_dtype=jnp.dtype(compute_dtype).type,
    )

    @jax.jit
    def run(chans, vs, content):
        # content (Na,) i32: per-slice nonzero-alpha flags (slice_content);
        # planes whose bracketing slices are both empty are skipped
        # in-kernel (bit-exact).  Pass ones to disable.
        # vs (11,) f32:
        # [wa0, wa1, eye_a, u0, du, dv, eb, ec, v0, sign, max_samples]
        # — the ONLY per-frame host→device transfer; the per-plane
        # tables and the opacity-correction map derive on device (the
        # tunneled platform pays ~25 ms per transfer, so packing the
        # view into one vector makes camera motion one dispatch).
        wa0, wa1, eye_a = vs[0], vs[1], vs[2]
        u0, du, dv = vs[3], vs[4], vs[5]
        eb, ec, v0, sign = vs[6], vs[7], vs[8], vs[9]
        msr = vs[10]
        k = jnp.arange(k_planes, dtype=jnp.float32)
        dz = (wa1 - wa0) / k_planes
        z = jnp.where(sign > 0, wa0 + (k + 0.5) * dz, wa1 - (k + 0.5) * dz)
        sa = jnp.clip((z - wa0) / (wa1 - wa0) * na - 0.5, -0.5, na - 0.5)
        i0 = jnp.floor(jnp.clip(sa, 0.0, float(na - 1)))
        wa = jnp.clip(sa - i0, 0.0, 1.0)
        a0 = i0.astype(jnp.int32)
        act = _plane_activity(content, a0, na)
        dl = z - eye_a
        view6 = jnp.stack([u0, du, dv, eb, ec, v0])
        ug = u0 + du * jnp.arange(u_pad, dtype=jnp.float32)
        vg = v0 + dv * jnp.arange(v_pad, dtype=jnp.float32)
        length = jnp.sqrt(1.0 + ug[None, :] ** 2 + vg[:, None] ** 2)
        corr = msr * dz * length
        hit = hit_mask(
            ug, vg, wa0=wa0, wa1=wa1, eye_a=eye_a, eb=eb, ec=ec,
            wb0=wb0, wb1=wb1, wc0=wc0, wc1=wc1,
        )
        out = _fused_call(
            kernel, chans, a0, wa, dl, act, view6, corr, hit,
            k_planes=k_planes,
            na=na,
            nc_pad=nc_pad,
            nb_pad=nb_pad,
            v_pad=v_pad,
            u_pad=u_pad,
            interpret=interpret,
        )
        return jnp.transpose(out, (1, 2, 0))[:v_size, :u_size]

    return run


def render_from_classified(
    chans: jnp.ndarray,  # (Na, 4*Nc_pad, Nb_pad) from classify_planes
    *,
    nc_real: int,
    nb_real: int,
    eye: Tuple[float, float, float],
    axis: int,
    sign: float,
    slope_bounds: Tuple[float, float, float, float],
    world_min: Tuple[float, float, float],
    world_max: Tuple[float, float, float],
    params: RenderParams,
    swp: sw.ShearWarpParams,
    interpret: bool = False,
    content: jnp.ndarray = None,
) -> jnp.ndarray:
    """Fused slope-space render from a prebuilt classified plane stack
    → (V, U, 4).  The engine caches ``chans`` across frames so the
    steady-state cost is the kernel alone; camera motion reuses the
    compiled kernel (view scalars are runtime operands).  ``content`` is
    the optional (Na,) slice_content vector enabling bit-exact
    empty-space skipping."""
    wmin = np.asarray(world_min, np.float32)
    wmax = np.asarray(world_max, np.float32)
    b_axis, c_axis = sw._BC_AXES[axis]
    na = chans.shape[0]
    nb_pad = _round_up(nb_real, 128)
    nc_pad = _round_up(nc_real, 128)
    assert chans.shape == (na, 4 * nc_pad, nb_pad), chans.shape

    run = _compiled_renderer(
        na=na,
        nc_real=nc_real,
        nb_real=nb_real,
        k_planes=swp.n_planes,
        v_size=swp.inter_size[0],
        u_size=swp.inter_size[1],
        wb0=float(wmin[b_axis]),
        wb1=float(wmax[b_axis]),
        wc0=float(wmin[c_axis]),
        wc1=float(wmax[c_axis]),
        early_exit=float(params.early_exit),
        compute_dtype=swp.compute_dtype,
        interpret=interpret,
    )
    eye = np.asarray(eye, np.float32)
    u0, u1, v0, v1 = slope_bounds
    u_size = swp.inter_size[1]
    v_size = swp.inter_size[0]
    vs = np.float32([
        wmin[axis], wmax[axis], eye[axis],
        u0, (u1 - u0) / (u_size - 1), (v1 - v0) / (v_size - 1),
        eye[b_axis], eye[c_axis], v0, sign,
        params.max_samples_per_ray,
    ])
    if content is None:
        content = jnp.ones((na,), jnp.int32)
    return run(chans, jnp.asarray(vs), content)


def _fused_call(
    kernel, chans, a0, wa, dl, act, view6, corr, hit, *,
    k_planes, na, nc_pad, nb_pad, v_pad, u_pad, interpret,
):
    """Invoke the fused kernel (shared by the single-device path and the
    per-device body of the sharded path)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(k_planes,),
        in_specs=[
            pl.BlockSpec(
                (1, 4 * nc_pad, nb_pad),
                lambda k, idx, _w, _d, _a, _v: (idx[k], 0, 0),
            ),
            pl.BlockSpec(
                (1, 4 * nc_pad, nb_pad),
                lambda k, idx, _w, _d, _a, _v: (
                    jnp.minimum(idx[k] + 1, na - 1), 0, 0
                ),
            ),
            pl.BlockSpec(
                (v_pad, u_pad), lambda k, idx, _w, _d, _a, _v: (0, 0)
            ),
            pl.BlockSpec(
                (v_pad, u_pad), lambda k, idx, _w, _d, _a, _v: (0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, v_pad, u_pad), lambda k, idx, _w, _d, _a, _v: (0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((v_pad, u_pad), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    flops_per_plane = 2 * (4 * nc_pad * nb_pad * u_pad + 4 * v_pad * nc_pad * u_pad)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, v_pad, u_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=k_planes * flops_per_plane,
            bytes_accessed=na * 4 * nc_pad * nb_pad * 4 + 4 * v_pad * u_pad * 4,
            transcendentals=k_planes * v_pad * u_pad,
        ),
        interpret=interpret,
    )(a0, wa, dl, act, view6, chans, chans, corr, hit)


def _jnp_slope_grid(volume_zyx, tf, plan_args):
    img, _, _ = sw.render_slope_grid(
        volume_zyx,
        tf,
        np.asarray(plan_args["eye"], np.float32),
        plan_args["axis"],
        plan_args["sign"],
        plan_args["slope_bounds"],
        np.asarray(plan_args["world_min"], np.float32),
        np.asarray(plan_args["world_max"], np.float32),
        plan_args["params"],
        plan_args["swp"],
    )
    return img


def _classified_for(volume_zyx, tf, plan_args):
    return classify_planes(
        volume_zyx,
        tf,
        plan_args["axis"],
        plan_args["params"].data_source_range,
    )


def render_classified_slope_grid(chans, nc_real, nb_real, plan_args,
                                 interpret=False, content=None):
    """Kernel-only path from a cached classified stack (inference)."""
    return render_from_classified(
        chans,
        nc_real=nc_real,
        nb_real=nb_real,
        eye=plan_args["eye"],
        axis=plan_args["axis"],
        sign=plan_args["sign"],
        slope_bounds=plan_args["slope_bounds"],
        world_min=plan_args["world_min"],
        world_max=plan_args["world_max"],
        params=plan_args["params"],
        swp=plan_args["swp"],
        interpret=interpret,
        content=content,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def render_slope_grid_pallas(volume_zyx, tf, plan_args, interpret=False):
    """Fused slope-space render → (V, U, 4).

    ``plan_args`` is a hashable dict-like of the static view plan (see
    :func:`slope_grid_plan_args`).  Backward recomputes through the jnp
    pipeline (whole-frame remat).
    """
    perm = sw._PERM[plan_args["axis"]]
    shape = volume_zyx.shape
    nc_real, nb_real = shape[perm[1]], shape[perm[2]]
    chans = _classified_for(volume_zyx, tf, plan_args)
    return render_classified_slope_grid(
        chans, nc_real, nb_real, plan_args, interpret,
        content=slice_content(chans),
    )


def _fwd(volume_zyx, tf, plan_args, interpret):
    out = render_slope_grid_pallas(volume_zyx, tf, plan_args, interpret)
    return out, (volume_zyx, tf)


def _bwd(plan_args, interpret, res, g):
    volume_zyx, tf = res
    _, vjp = jax.vjp(lambda v, t: _jnp_slope_grid(v, t, plan_args), volume_zyx, tf)
    return vjp(g)


render_slope_grid_pallas.defvjp(_fwd, _bwd)


class _HashablePlan(dict):
    """Static (hashable) view-plan bundle for custom_vjp nondiff args."""

    def __hash__(self):
        return hash(
            (
                self["eye"],
                self["axis"],
                self["sign"],
                self["slope_bounds"],
                self["world_min"],
                self["world_max"],
                self["params"],
                self["swp"],
            )
        )

    def __eq__(self, other):
        return isinstance(other, dict) and dict.__eq__(self, other)


def slope_grid_plan_args(
    plan: sw.ShearWarpPlan,
    world_min,
    world_max,
    params: RenderParams,
    swp: sw.ShearWarpParams,
) -> _HashablePlan:
    return _HashablePlan(
        eye=tuple(float(x) for x in np.asarray(plan.eye)),
        axis=plan.axis,
        sign=plan.sign,
        slope_bounds=tuple(float(x) for x in plan.bounds),
        world_min=tuple(float(x) for x in np.asarray(world_min)),
        world_max=tuple(float(x) for x in np.asarray(world_max)),
        params=params,
        swp=swp,
    )


def render(
    volume_zyx: jnp.ndarray,
    tf: jnp.ndarray,
    camera,
    params: RenderParams,
    world_min,
    world_max,
    swp: sw.ShearWarpParams = None,
    plan: sw.ShearWarpPlan = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full shear-warp render through the fused kernel → (H, W, 4).

    Drop-in for ops/shearwarp.render; the final 2-D screen warp stays in
    jnp (4-tap gather, negligible)."""
    if swp is None:
        swp = sw.ShearWarpParams(n_planes=params.n_samples_per_ray)
    if plan is None:
        plan = sw.make_plan(camera, swp.slope_margin)
    pa = slope_grid_plan_args(plan, world_min, world_max, params, swp)
    inter = render_slope_grid_pallas(volume_zyx, tf, pa, interpret)
    u0, u1, v0, v1 = plan.bounds
    ug = jnp.linspace(u0, u1, swp.inter_size[1], dtype=jnp.float32)
    vg = jnp.linspace(v0, v1, swp.inter_size[0], dtype=jnp.float32)
    return sw.warp_to_screen(
        inter,
        ug,
        vg,
        jnp.asarray(plan.u),
        jnp.asarray(plan.v),
        jnp.asarray(plan.valid),
    )


# ---------------------------------------------------------------- sharded
def render_slope_grid_sharded(
    mesh,
    chans: jnp.ndarray,
    nc_real: int,
    nb_real: int,
    plan_args,
    ray_axis: str = None,
    brick_axis: str = None,
    interpret: bool = False,
    content: jnp.ndarray = None,
) -> jnp.ndarray:
    """Multi-device fused render: slope rows × plane ranges over the mesh
    → (V, U, 4).

    Same decomposition as parallel/shearwarp_sharded.py (ray axis shards
    slope rows = sort-first; brick axis shards contiguous front-to-back
    plane ranges = sort-last/DB), but the per-device body is the fused
    Pallas kernel instead of the jnp slab pipeline.  The per-plane
    scalar tables are computed once for the full grid and sharded along
    the brick axis; the device's first-slope-row coordinate enters the
    kernel as a scalar-prefetch operand.  Partial (rgb, a) segments fold
    with the over operator in rank order (the blendFrames equivalent,
    livre/eq/Channel.cpp:444-533).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from libre_tpu.parallel.compositing import fold_over
    from libre_tpu.parallel.mesh import BRICK_AXIS, RAY_AXIS

    ray_axis = ray_axis or RAY_AXIS
    brick_axis = brick_axis or BRICK_AXIS
    pa = plan_args
    k_planes = pa["swp"].n_planes
    v_size, u_size = pa["swp"].inter_size
    d_k = mesh.shape[brick_axis]
    d_v = mesh.shape[ray_axis]
    if v_size % (8 * d_v) or k_planes % d_k:
        raise ValueError(
            f"V={v_size} must divide {d_v} devices x 8 sublanes and "
            f"K={k_planes} must divide {d_k}"
        )
    k_l, v_l = k_planes // d_k, v_size // d_v

    axis = pa["axis"]
    wmin = np.asarray(pa["world_min"], np.float32)
    wmax = np.asarray(pa["world_max"], np.float32)
    b_axis, c_axis = sw._BC_AXES[axis]
    eye = np.asarray(pa["eye"], np.float32)
    na = chans.shape[0]
    nb_pad = _round_up(nb_real, 128)
    nc_pad = _round_up(nc_real, 128)
    u_pad = _round_up(u_size, 128)

    wa0, wa1 = float(wmin[axis]), float(wmax[axis])
    dz = (wa1 - wa0) / k_planes
    j = np.arange(k_planes, dtype=np.float32)
    sign = pa["sign"]
    z = np.where(sign > 0, wa0 + (j + 0.5) * dz, wa1 - (j + 0.5) * dz)
    a0, _, w_axis = _axis_lerp_table(z, wa0, wa1, na)
    delta = (z - eye[axis]).astype(np.float32)
    if content is None:
        act = np.ones((k_planes,), np.int32)
    else:
        c = np.asarray(content, np.int32)
        act = c[a0] | c[np.minimum(a0 + 1, na - 1)]

    u0, u1, v0, v1 = pa["slope_bounds"]
    du = (u1 - u0) / (u_size - 1)
    dv = (v1 - v0) / (v_size - 1)
    ug = u0 + du * np.arange(u_pad, dtype=np.float32)

    kernel = _make_kernel(
        k_planes=k_l,
        na=na,
        nb_real=nb_real,
        nc_real=nc_real,
        nb_pad=nb_pad,
        nc_pad=nc_pad,
        v_pad=v_l,
        u_pad=u_pad,
        wb0=float(wmin[b_axis]),
        wb1=float(wmax[b_axis]),
        wc0=float(wmin[c_axis]),
        wc1=float(wmax[c_axis]),
        early_exit=float(pa["params"].early_exit),
        compute_dtype=jnp.dtype(pa["swp"].compute_dtype).type,
    )
    msr = pa["params"].max_samples_per_ray

    def body(chans_l, a0_l, wa_l, dl_l, act_l):
        vd = jax.lax.axis_index(ray_axis)
        vg0 = v0 + dv * (vd * v_l).astype(jnp.float32)
        vg = vg0 + dv * jnp.arange(v_l, dtype=jnp.float32)
        length = jnp.sqrt(1.0 + ug[None, :] ** 2 + vg[:, None] ** 2)
        corr = (msr * dz * length).astype(jnp.float32)
        view6 = jnp.concatenate([
            jnp.float32([u0, du, dv, eye[b_axis], eye[c_axis]]),
            vg0[None],
        ])
        hit = hit_mask(
            jnp.asarray(ug), vg, wa0=jnp.float32(wa0), wa1=jnp.float32(wa1),
            eye_a=jnp.float32(eye[axis]), eb=jnp.float32(eye[b_axis]),
            ec=jnp.float32(eye[c_axis]),
            wb0=float(wmin[b_axis]), wb1=float(wmax[b_axis]),
            wc0=float(wmin[c_axis]), wc1=float(wmax[c_axis]),
        )
        out = _fused_call(
            kernel,
            chans_l,
            a0_l,
            wa_l,
            dl_l,
            act_l,
            view6,
            corr,
            hit,
            k_planes=k_l,
            na=na,
            nc_pad=nc_pad,
            nb_pad=nb_pad,
            v_pad=v_l,
            u_pad=u_pad,
            interpret=interpret,
        )
        return jnp.transpose(out, (1, 2, 0))[None]  # (1, V_l, U_pad, 4)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(brick_axis), P(brick_axis), P(brick_axis), P(brick_axis),
        ),
        out_specs=P(brick_axis, ray_axis),
        # pallas_call outputs carry no varying-mesh-axes annotation yet
        check_vma=False,
    )
    parts = fn(
        chans, jnp.asarray(a0), jnp.asarray(w_axis), jnp.asarray(delta),
        jnp.asarray(act),
    )  # (d_k, V, U_pad, 4) in front-to-back rank order
    rgb, a = fold_over(parts[..., :3], parts[..., 3])
    return jnp.concatenate([rgb, a[..., None]], axis=-1)[:, :u_size]


# ----------------------------------------------------------- full frame
@functools.lru_cache(maxsize=128)
def _compiled_frame(
    *,
    axis: int,
    viewport: Tuple[int, int, int, int],
    na: int,
    nc_real: int,
    nb_real: int,
    k_planes: int,
    v_size: int,
    u_size: int,
    wb0: float,
    wb1: float,
    wc0: float,
    wc1: float,
    early_exit: float,
    compute_dtype: str,
    interpret: bool,
):
    """Whole camera→screen frame as ONE jitted call: fused kernel +
    device-side per-pixel slopes (from the 4×4 matrices) + bilinear
    screen warp as a single 2×2-patch gather.  Per-frame inputs are two
    4×4 matrices and the 11-float view vector — nothing else moves
    host→device, so interactive frames are a single dispatch."""
    run = _compiled_renderer(
        na=na,
        nc_real=nc_real,
        nb_real=nb_real,
        k_planes=k_planes,
        v_size=v_size,
        u_size=u_size,
        wb0=wb0,
        wb1=wb1,
        wc0=wc0,
        wc1=wc1,
        early_exit=early_exit,
        compute_dtype=compute_dtype,
        interpret=interpret,
    )
    @jax.jit
    def frame(chans, inv_proj, inv_mv, vs, content):
        inter = run(chans, vs, content)  # (V, U, 4)
        return sw.warp_frame_device(
            inter, inv_proj, inv_mv,
            vs[3], vs[4], vs[5], vs[8], vs[9],
            axis=axis, viewport=viewport, v_size=v_size, u_size=u_size,
        )

    return frame


def render_frame(
    chans: jnp.ndarray,
    nc_real: int,
    nb_real: int,
    camera,
    plan_args,
    interpret: bool = False,
    content: jnp.ndarray = None,
) -> jnp.ndarray:
    """Camera → (H, W, 4) screen frame, fully on device, one dispatch.

    ``plan_args`` from :func:`slope_grid_plan_args` (its eye/bounds are
    runtime values here — only the major axis and shapes key the
    compilation cache).
    """
    pa = plan_args
    axis = pa["axis"]
    wmin = np.asarray(pa["world_min"], np.float32)
    wmax = np.asarray(pa["world_max"], np.float32)
    b_axis, c_axis = sw._BC_AXES[axis]
    swp = pa["swp"]
    params = pa["params"]
    frame = _compiled_frame(
        axis=axis,
        viewport=tuple(int(x) for x in camera.viewport),
        na=chans.shape[0],
        nc_real=nc_real,
        nb_real=nb_real,
        k_planes=swp.n_planes,
        v_size=swp.inter_size[0],
        u_size=swp.inter_size[1],
        wb0=float(wmin[b_axis]),
        wb1=float(wmax[b_axis]),
        wc0=float(wmin[c_axis]),
        wc1=float(wmax[c_axis]),
        early_exit=float(params.early_exit),
        compute_dtype=swp.compute_dtype,
        interpret=interpret,
    )
    eye = np.asarray(pa["eye"], np.float32)
    u0, u1, v0, v1 = pa["slope_bounds"]
    v_size, u_size = swp.inter_size
    vs = np.float32([
        wmin[axis], wmax[axis], eye[axis],
        u0, (u1 - u0) / (u_size - 1), (v1 - v0) / (v_size - 1),
        eye[b_axis], eye[c_axis], v0, pa["sign"],
        params.max_samples_per_ray,
    ])
    if content is None:
        content = jnp.ones((chans.shape[0],), jnp.int32)
    return frame(
        chans,
        jnp.asarray(camera.inv_proj, jnp.float32),
        jnp.asarray(camera.inv_mv, jnp.float32),
        jnp.asarray(vs),
        content,
    )
