"""Brick-atlas-native fused shear-warp: the out-of-core fast path.

Round-1's fused kernel (ops/shearwarp_pallas.py) consumed one dense
PRE-classified RGBA plane stack — impossible beyond ~256³ (16 B/voxel)
and stale on every transfer-function edit.  This module is the missing
half (VERDICT items 1/3/4): it renders the mixed-LOD **rendering set**
streamed through the HBM brick atlas, the TPU equivalent of the
reference's per-brick GPU raycast over a texture atlas
(renderers/cudaRaycaster/cuda/Renderer.cu:95-230 + TexturePool.cu:
101-214, renderers/glRaycaster/GLRaycastRenderer.cpp:431-464).

Pipeline per frame (all on device):

1. **Assembly** (:func:`assemble_store`): gather the slab's resident
   bricks of each LOD level out of the atlas (one ``jnp.take`` over
   slots per level), strip ghost voxels, tile them into the
   axis-permuted render-level grid; coarser levels are upsampled to the
   render grid with two-tap interpolation expressed as MXU matmuls,
   blended seam-free by normalized convolution (value & coverage
   upsampled together), and composed under the per-level ownership
   masks of the rendering set (the RenderingSetGenerator
   ancestor-fallback result, RenderingSetGeneratorFilter.ipp:27-134).
   Output: a normalized DENSITY slab — 1 channel, 4× less HBM than the
   classified stack; native-dtype bricks are dequantized on the fly
   (the dtype switch of livre/core/render/TexturePool.cpp:42-84).
   Uncovered voxels carry a large negative sentinel.
2. **Fused kernel** (``_make_post_kernel``): sequential plane sweep
   with VMEM-resident compositing carry.  Per virtual plane: axis-lerp
   of the two bracketing density slices, two in-plane interpolation
   matmuls (MXU), then **in-kernel POST-classification** — the
   reference's classify-after-interpolation semantics
   (fragRaycast.glsl:188-205) — via ``tpu.dynamic_gather`` lane
   lookups (two 128-entry table halves + select; measured ~0.04 µs per
   (256,128) gather on v5e ⇒ ~0.8 µs/plane, free next to the matmuls).
   The transfer function is a runtime operand: TF edits re-render
   without touching the volume, matching the reference's
   re-upload-256×4-texture flow (GLRaycastRenderer.cpp:175-193).
   Clip planes are evaluated per sample as slope-affine half-space
   masks — for a convex clip set this equals the ray-interval clamp of
   fragRaycast.glsl:162-174.
3. **Multipass**: the carry (rgb, transmittance) enters and leaves the
   kernel, so memory-bounded A-slab passes compose exactly like one
   monolithic sweep (GLRaycastPipeline.cpp:148-186; the plane grid is
   global, so the step-grid-alignment property of
   fragRaycast.glsl:152-158 holds across slab boundaries by
   construction — see test_bricked seam tests).

Parity oracle: ops/shearwarp.plane_oracle(classification="post") over
the inverse-permuted assembled store — same sample set, same opacity
correction, same early exit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libre_tpu.ops.reference import ALPHA_CLAMP, RenderParams
from libre_tpu.ops import shearwarp as sw
from libre_tpu.ops.shearwarp_pallas import (
    _interp_matrix,
    _round_up,
    hit_mask,
)

SENTINEL = -1024.0  # uncovered-voxel marker (normalized density is [0,1])
TF_SIZE = 256


# ===================================================================== kernel
def _make_post_kernel(
    *,
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
    n_clip: int,
    compute_dtype=jnp.float32,
):
    """Density-slab plane-sweep kernel with in-kernel post-classification.

    Distinctions from shearwarp_pallas._make_kernel: 1-channel density
    input, per-SAMPLE TF lookup (reference post-classification
    semantics), clip-plane sample masks, and an explicit carry
    (rgb, transmittance) in/out so A-slab multipass composes exactly.
    Classification + composite run per 128-lane u-block: all lane-dim
    accesses are static ref slices (no cross-lane relayouts).
    """
    sb_scale = nb_real / (wb1 - wb0)
    sc_scale = nc_real / (wc1 - wc0)
    n_ublocks = u_pad // 128
    # HIGHEST only applies to f32 operands (it selects the 3-pass bf16
    # decomposition); on explicit bf16 operands Mosaic rejects an fp32
    # contract precision — bf16 is already the one-pass fast mode.
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def kernel(
        idx_ref,  # (K,) i32 scalar prefetch: slice index a0 within slab
        idx1_ref,  # (K,) i32: slice index a1, GLOBALLY clamped then
        #            localized — min(local+1, na_slab-1) would diverge from
        #            the global clamp at the volume edge / in padded slabs
        wa_ref,  # (K,) f32: axis lerp weight
        dl_ref,  # (K,) f32: z - eye_a
        act_ref,  # (K,) i32: 1 = plane active (inside slab)
        vw_ref,  # (8,) f32: [u0, du, dv, eb, ec, vg0, eye_a, 0]
        lo_ref,  # (1, Nc_pad, Nb_pad) density slice a0
        hi_ref,  # (1, Nc_pad, Nb_pad) density slice a0+1
        tf_ref,  # (8, v_pad, 128): [2*ch+half] broadcast TF table halves
        corr_ref,  # (v_pad, u_pad) opacity-correction exponent
        clip_ref,  # (8, 128) f32: rows 0..n_clip-1 = [n_a, n_b, n_c, d]
        rgb_in_ref,  # (4, v_pad, u_pad) carry-in (ch 3 ignored)
        t_in_ref,  # (v_pad, u_pad) carry-in transmittance
        hit_ref,  # (v_pad, u_pad) f32: 1 = ray may intersect the volume.
        #           Rays that never hit (slope-grid corners, padding)
        #           keep t = 1 forever; excluding them lets the
        #           whole-plane early-exit flag actually fire on
        #           saturated scenes (fragRaycast.glsl:115-117 at plane
        #           scale).  hit = 0 rays sample nothing, so skipping
        #           planes under the flag stays exact.
        out_ref,  # (4, v_pad, u_pad) accumulated rgb + alpha
        t_out_ref,  # (v_pad, u_pad) carry-out transmittance
        done_ref,  # SMEM (1,) i32 all-rays-saturated flag
    ):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            out_ref[0] = rgb_in_ref[0]
            out_ref[1] = rgb_in_ref[1]
            out_ref[2] = rgb_in_ref[2]
            t0 = t_in_ref[:]
            out_ref[3] = 1.0 - t0
            t_out_ref[:] = t0
            done_ref[0] = jnp.where(
                jnp.max(t0 * hit_ref[:]) < 1.0 - early_exit, 1, 0
            ).astype(jnp.int32)

        @pl.when((done_ref[0] == 0) & (act_ref[k] == 1))
        def _():
            wa = wa_ref[k]
            delta = dl_ref[k]
            u0, du, dv = vw_ref[0], vw_ref[1], vw_ref[2]
            eb, ec, vg0 = vw_ref[3], vw_ref[4], vw_ref[5]

            # Virtual plane: axis lerp of the bracketing density slices.
            vs = lo_ref[0] * (1.0 - wa) + hi_ref[0] * wa  # (Ncp, Nbp)

            # In-plane resample voxel-b → slope-u (MXU).
            colf = jax.lax.broadcasted_iota(jnp.int32, (1, u_pad), 1).astype(
                jnp.float32
            )
            xb = eb + (u0 + du * colf) * delta  # (1, Up) world b
            inside_u = ((xb >= wb0) & (xb < wb1)).astype(jnp.float32)
            mb = _interp_matrix(
                {"s": (xb - wb0) * sb_scale - 0.5, "inside": inside_u},
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
                precision=precision,
            )  # (Ncp, Up)

            # Resample voxel-c → slope-v (MXU).
            rowf = jax.lax.broadcasted_iota(jnp.int32, (v_pad, 1), 0).astype(
                jnp.float32
            )
            xc = ec + (vg0 + dv * rowf) * delta  # (Vp, 1) world c
            inside_v = ((xc >= wc0) & (xc < wc1)).astype(jnp.float32)
            mct = _interp_matrix(
                {"s": (xc - wc0) * sc_scale - 0.5, "inside": inside_v},
                nc_real,
                nc_pad,
                1,
                (v_pad, nc_pad),
            )
            # precision=HIGHEST: the post-classification table lookup
            # is discontinuous in density, so bf16 resample error (~4e-3)
            # would jump TF entries; f32 keeps kernel == oracle.  (The
            # pre-classified kernel tolerates bf16 because its TF is
            # applied before interpolation.)
            dens = jax.lax.dot_general(
                mct.astype(compute_dtype),
                s1.astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (Vp, Up) interpolated normalized density

            # Sample masks: inside the volume box, covered by a resident
            # brick (SENTINEL voxels pull interpolated density strongly
            # negative), not clipped.  Clip planes are affine in (u, v)
            # at fixed plane z — one fused VPU expression each; for a
            # convex set this equals the reference's ray-interval clamp
            # (fragRaycast.glsl:162-174).
            mask = inside_v * inside_u  # (Vp, Up) broadcast outer
            mask = mask * (dens > -0.5).astype(jnp.float32)
            if n_clip:
                z = delta + vw_ref[6]  # plane world a-coordinate
                for p in range(n_clip):
                    expr = (
                        clip_ref[p, 0] * z
                        + clip_ref[p, 1] * xb
                        + clip_ref[p, 2] * xc
                        + clip_ref[p, 3]
                    )
                    mask = mask * (expr >= 0.0).astype(jnp.float32)

            # Post-classification + composite per 128-lane u-block.
            s = jnp.clip(dens, 0.0, 1.0) * TF_SIZE - 0.5
            s = jnp.clip(s, 0.0, float(TF_SIZE - 1))
            i0f = jnp.floor(s)
            w_tap = s - i0f
            i0 = i0f.astype(jnp.int32)

            for ub in range(n_ublocks):
                sl = slice(ub * 128, (ub + 1) * 128)
                ib0 = i0[:, sl]
                ib1 = jnp.minimum(ib0 + 1, TF_SIZE - 1)
                wt = w_tap[:, sl]
                chans = []
                for ch in range(4):
                    acc = None
                    for idx, wtt in ((ib0, 1.0 - wt), (ib1, wt)):
                        hi_bit = idx >= 128
                        lo7 = jnp.where(hi_bit, idx - 128, idx)
                        g0 = jnp.take_along_axis(
                            tf_ref[2 * ch, :, :], lo7, axis=1
                        )
                        g1 = jnp.take_along_axis(
                            tf_ref[2 * ch + 1, :, :], lo7, axis=1
                        )
                        v = jnp.where(hi_bit, g1, g0) * wtt
                        acc = v if acc is None else acc + v
                    chans.append(acc)

                # Front-to-back composite, exact early exit (single-carry
                # form; equivalence proof in shearwarp_pallas._make_kernel).
                a_corr = 1.0 - jnp.power(
                    1.0 - jnp.minimum(chans[3] * mask[:, sl], ALPHA_CLAMP),
                    corr_ref[:, sl],
                )
                t_eff = t_out_ref[:, sl]
                m = ((1.0 - t_eff) <= early_exit).astype(jnp.float32)
                a_eff = a_corr * m
                w = a_eff * t_eff
                out_ref[0, :, sl] += w * chans[0]
                out_ref[1, :, sl] += w * chans[1]
                out_ref[2, :, sl] += w * chans[2]
                t_eff = t_eff * (1.0 - a_eff)
                out_ref[3, :, sl] = 1.0 - t_eff
                t_out_ref[:, sl] = t_eff

            # Early ray termination at plane granularity, tested every
            # 8th plane (fragRaycast.glsl:115-117 at plane scale);
            # never-hitting rays are excluded from the all-saturated
            # test (they keep t = 1 but sample nothing).
            @pl.when(k % 8 == 7)
            def _():
                @pl.when(
                    jnp.max(t_out_ref[:] * hit_ref[:]) < 1.0 - early_exit
                )
                def _():
                    done_ref[0] = 1

    return kernel


def _post_call(
    kernel, store, a0, a1, wa, dl, act, view8, tfmat, corr, clip, rgb_in,
    t_in, hit, *, k_planes, na, nc_pad, nb_pad, v_pad, u_pad, interpret,
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(k_planes,),
        in_specs=[
            pl.BlockSpec(
                (1, nc_pad, nb_pad),
                lambda k, idx, idx1, _w, _d, _a, _v: (idx[k], 0, 0),
            ),
            pl.BlockSpec(
                (1, nc_pad, nb_pad),
                lambda k, idx, idx1, _w, _d, _a, _v: (idx1[k], 0, 0),
            ),
            pl.BlockSpec(
                (8, v_pad, 128),
                lambda k, idx, idx1, _w, _d, _a, _v: (0, 0, 0),
            ),
            pl.BlockSpec(
                (v_pad, u_pad), lambda k, idx, idx1, _w, _d, _a, _v: (0, 0)
            ),
            pl.BlockSpec(
                (8, 128), lambda k, idx, idx1, _w, _d, _a, _v: (0, 0)
            ),
            pl.BlockSpec(
                (4, v_pad, u_pad),
                lambda k, idx, idx1, _w, _d, _a, _v: (0, 0, 0),
            ),
            pl.BlockSpec(
                (v_pad, u_pad), lambda k, idx, idx1, _w, _d, _a, _v: (0, 0)
            ),
            pl.BlockSpec(
                (v_pad, u_pad), lambda k, idx, idx1, _w, _d, _a, _v: (0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (4, v_pad, u_pad),
                lambda k, idx, idx1, _w, _d, _a, _v: (0, 0, 0),
            ),
            pl.BlockSpec(
                (v_pad, u_pad), lambda k, idx, idx1, _w, _d, _a, _v: (0, 0)
            ),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    flops_per_plane = 2 * (nc_pad * nb_pad * u_pad + v_pad * nc_pad * u_pad)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((4, v_pad, u_pad), jnp.float32),
            jax.ShapeDtypeStruct((v_pad, u_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=k_planes * flops_per_plane,
            bytes_accessed=na * nc_pad * nb_pad * 4 + 5 * v_pad * u_pad * 4,
            transcendentals=k_planes * v_pad * u_pad,
        ),
        interpret=interpret,
    )(
        a0, a1, wa, dl, act, view8, store, store, tfmat, corr, clip,
        rgb_in, t_in, hit,
    )


@functools.lru_cache(maxsize=128)
def _compiled_post_renderer(
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
    n_clip: int,
    compute_dtype: str,
    interpret: bool,
):
    """One jitted slab render per (store geometry, grid shape).

    Every per-view and per-slab quantity — plane tables, TF, clip
    planes, carry — is a runtime operand: camera motion, TF edits, and
    slab sequencing all reuse one compilation (≤3 per scene geometry,
    one per major axis)."""
    nb_pad = _round_up(nb_real, 128)
    nc_pad = _round_up(nc_real, 128)
    v_pad = _round_up(v_size, 8)
    u_pad = _round_up(u_size, 128)
    kernel = _make_post_kernel(
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
        n_clip=n_clip,
        compute_dtype=jnp.dtype(compute_dtype).type,
    )

    @jax.jit
    def run(store, a0, a1, wa, dl, act, view8, tfmat, corr, clip, rgb_in,
            t_in, hit):
        return _post_call(
            kernel, store, a0, a1, wa, dl, act, view8, tfmat, corr, clip,
            rgb_in, t_in, hit,
            k_planes=k_planes,
            na=na,
            nc_pad=nc_pad,
            nb_pad=nb_pad,
            v_pad=v_pad,
            u_pad=u_pad,
            interpret=interpret,
        )

    return run


def tf_tables(tf: jnp.ndarray, v_pad: int) -> jnp.ndarray:
    """(8, v_pad, 128) broadcast table halves for the in-kernel lookup:
    row 2·ch+half = tf[half·128:(half+1)·128, ch] tiled over v rows."""
    assert tf.shape == (TF_SIZE, 4), tf.shape
    halves = jnp.stack(
        [
            tf[half * 128 : (half + 1) * 128, ch]
            for ch in range(4)
            for half in range(2)
        ]
    )  # (8, 128)
    return jnp.broadcast_to(halves[:, None, :], (8, v_pad, 128))


def clip_matrix(
    clip_planes_world: Optional[np.ndarray], axis: int
) -> Tuple[np.ndarray, int]:
    """(8, 128) padded clip-plane rows [n_a, n_b, n_c, d] reordered for
    the major axis; returns (matrix, n_clip).  Plane convention: keep
    the half-space n·x + d ≥ 0 (core/clip_planes.py)."""
    m = np.zeros((8, 128), np.float32)
    if clip_planes_world is None or len(clip_planes_world) == 0:
        return m, 0
    b_axis, c_axis = sw._BC_AXES[axis]
    cp = np.asarray(clip_planes_world, np.float32).reshape(-1, 4)
    n = min(len(cp), 8)
    for i in range(n):
        nvec = cp[i, :3]
        m[i, 0] = nvec[axis]
        m[i, 1] = nvec[b_axis]
        m[i, 2] = nvec[c_axis]
        m[i, 3] = cp[i, 3]
    return m, n


# ================================================================= host plan
@dataclasses.dataclass(frozen=True)
class SlabPlan:
    """One A-slab pass: store slice range plus its plane sub-range."""

    a_lo: int  # first render-level slice assembled for this pass
    a_hi_incl: int  # last slice assembled (includes +1 lerp boundary)
    k_lo: int  # first global plane index of this pass
    k_hi: int  # one past the last plane


def plane_tables(
    *,
    na: int,
    k_planes: int,
    wa0: float,
    wa1: float,
    eye_a: float,
    sign: float,
):
    """Global front-to-back plane tables (numpy): bracketing slice
    indices (a0, a1 — a1 carries the GLOBAL clamp at the volume edge so
    slab-local arithmetic can't diverge from it), axis lerp weight,
    z − eye_a, plane z, and the plane spacing dz.  The grid is global —
    identical regardless of slab decomposition — which is the
    generalized step-grid alignment of fragRaycast.glsl:152-158."""
    dz = (wa1 - wa0) / k_planes
    j = np.arange(k_planes, dtype=np.float32)
    z = np.where(sign > 0, wa0 + (j + 0.5) * dz, wa1 - (j + 0.5) * dz)
    sa = np.clip((z - wa0) / (wa1 - wa0) * na - 0.5, -0.5, na - 0.5)
    i0 = np.floor(np.clip(sa, 0.0, float(na - 1)))
    wa = np.clip(sa - i0, 0.0, 1.0).astype(np.float32)
    a0 = i0.astype(np.int32)
    a1 = np.minimum(a0 + 1, na - 1).astype(np.int32)
    return a0, a1, wa, (z - eye_a).astype(np.float32), z.astype(np.float32), dz


def make_slab_plans(
    a0: np.ndarray, na: int, max_slices: int
) -> List[SlabPlan]:
    """Partition the march into A-slab passes of ≤ max_slices assembled
    slices each, covering all planes in march order.  Consecutive
    planes share slices, so slab boundaries repeat one slice — the
    assembled values are identical both times (pure function of the
    rendering set), keeping the composite bit-equal to one pass."""
    k_total = len(a0)
    if na <= max_slices:
        return [SlabPlan(0, na - 1, 0, k_total)]
    plans: List[SlabPlan] = []
    k = 0
    width = max(2, max_slices)
    while k < k_total:
        lo = int(a0[k])
        if int(a0[k_total - 1]) >= lo:  # marching toward +A
            s_lo, s_hi = lo, min(lo + width - 1, na - 1)
        else:  # marching toward -A: a0 decreasing
            s_hi, s_lo = min(lo + 1, na - 1), max(0, lo + 1 - (width - 1))
        tail = a0[k:]
        need_hi = np.minimum(tail + 1, na - 1)
        in_slab = (tail >= s_lo) & (need_hi <= s_hi)
        run = int(np.argmin(in_slab)) if not in_slab.all() else len(in_slab)
        run = max(run, 1)
        plans.append(SlabPlan(s_lo, s_hi, k, k + run))
        k += run
    return plans


# ================================================================== assembly
@dataclasses.dataclass(frozen=True)
class LevelTables:
    """Per-level assembly tables in permuted (A, C, B) tile order."""

    level: int
    factor: int  # 2^(render_level − level)
    slots: np.ndarray  # (ta, tc, tb) i32 atlas slot per tile (0 if absent)
    resident: np.ndarray  # (ta, tc, tb) f32 1 = brick resident
    own: np.ndarray  # (ta, tc, tb) f32 1 = rendering set assigns this level
    dims: Tuple[int, int, int]  # level voxel dims (A_l, C_l, B_l)


@dataclasses.dataclass(frozen=True)
class AssemblyPlan:
    """Static-per-(dataset, axis, level-set) assembly description."""

    axis: int
    render_level: int
    fine_dims: Tuple[int, int, int]  # (Na, Nc, Nb) render-level grid
    block: Tuple[int, int, int]  # interior block (ba, bc, bb) permuted
    padded_zyx: Tuple[int, int, int]  # padded brick (BZ, BY, BX) array order
    overlap: Tuple[int, int, int]  # (oa, oc, ob) permuted
    levels: Tuple[LevelTables, ...]
    lo: float  # data_source_range normalization
    hi: float


def _permute_xyz(t_xyz, perm):
    """World-axis-ordered (x, y, z) triple → permuted array order
    (a, c, b): volume arrays are (Z, Y, X), perm maps array dims."""
    zyx = (t_xyz[2], t_xyz[1], t_xyz[0])
    return tuple(zyx[p] for p in perm)


def build_assembly_plan(
    datasource,
    rendering_set: Sequence,  # NodeIds
    axis: int,
    slot_of,  # NodeId -> atlas slot (must be resident)
    data_source_range: Tuple[float, float],
    render_level: Optional[int] = None,
) -> AssemblyPlan:
    """Host-side planning: group the rendering set by level, build full
    tile-grid slot/resident/ownership tables in permuted (A, C, B)
    order.  Table shapes depend only on (dataset, levels present), so
    the jitted assembler does not retrace on camera motion."""
    info = datasource.volume_info
    perm = sw._PERM[axis]
    depth = info.root_node.depth
    by_level: Dict[int, list] = {}
    for n in rendering_set:
        by_level.setdefault(n.level, []).append(n)
    if render_level is None:
        render_level = max(by_level)

    shift = depth - 1 - render_level
    fine_xyz = tuple(max(1, d >> shift) for d in info.voxels)
    fine_dims = _permute_xyz(fine_xyz, perm)
    block = _permute_xyz(info.block_size, perm)
    overlap = _permute_xyz(info.overlap, perm)
    mbs = info.maximum_block_size  # (x, y, z)
    padded_zyx = (mbs[2], mbs[1], mbs[0])
    bx, by_, bz = info.block_size

    levels = []
    for level in sorted(by_level):
        lshift = depth - 1 - level
        lvx, lvy, lvz = (max(1, d >> lshift) for d in info.voxels)
        tx, ty, tz = (-(-lvx // bx), -(-lvy // by_), -(-lvz // bz))
        ta, tc, tb = _permute_xyz((tx, ty, tz), perm)
        slots = np.zeros((ta, tc, tb), np.int32)
        resident = np.zeros((ta, tc, tb), np.float32)
        own = np.zeros((ta, tc, tb), np.float32)
        for node in by_level[level]:
            pa, pc, pb = _permute_xyz(node.position, perm)
            slots[pa, pc, pb] = slot_of(node)
            resident[pa, pc, pb] = 1.0
            own[pa, pc, pb] = 1.0
        levels.append(
            LevelTables(
                level=level,
                factor=1 << (render_level - level),
                slots=slots,
                resident=resident,
                own=own,
                dims=_permute_xyz((lvx, lvy, lvz), perm),
            )
        )
    lo, hi = data_source_range
    return AssemblyPlan(
        axis=axis,
        render_level=render_level,
        fine_dims=fine_dims,
        block=block,
        padded_zyx=padded_zyx,
        overlap=overlap,
        levels=tuple(levels),
        lo=float(lo),
        hi=float(hi),
    )


def _upsample_matrix(
    n_fine: int,
    n_coarse: int,
    f_lo: int,
    f_hi_incl: int,
    c_base: int,
    c_count: int,
) -> np.ndarray:
    """(fine rows f_lo..f_hi_incl, c_count) two-tap matrix sampling the
    coarse grid (rows c_base..c_base+c_count of the full coarse axis) at
    fine voxel centers, clamp-to-edge against the FULL coarse axis."""
    j = np.arange(f_lo, f_hi_incl + 1, dtype=np.float64)
    s = (j + 0.5) * (n_coarse / n_fine) - 0.5
    s = np.clip(s, 0.0, n_coarse - 1.0)
    i0 = np.floor(s).astype(np.int64)
    w = s - i0
    i1 = np.minimum(i0 + 1, n_coarse - 1)
    m = np.zeros((len(j), c_count), np.float32)
    rows = np.arange(len(j))
    m[rows, np.clip(i0 - c_base, 0, c_count - 1)] += (1.0 - w).astype(
        np.float32
    )
    m[rows, np.clip(i1 - c_base, 0, c_count - 1)] += w.astype(np.float32)
    return m


@functools.lru_cache(maxsize=64)
def _compiled_assembler(
    *,
    perm: Tuple[int, int, int],
    padded_zyx: Tuple[int, int, int],
    overlap_acb: Tuple[int, int, int],
    block_acb: Tuple[int, int, int],
    level_shapes: Tuple,  # ((layers, tc, tb, factor, dc, db, s_rows), ...)
    fine_nc: int,
    fine_nb: int,
    out_slices: int,
    nc_pad: int,
    nb_pad: int,
    lo: float,
    hi: float,
):
    """Jitted multi-level slab assembler.

    All runtime operands are either device-resident (the atlas) or TINY
    (per-level tile tables of a few KB + two-tap A matrices): ownership
    and coverage masks expand to voxel granularity ON DEVICE, so a slab
    assembly moves a handful of kilobytes host→device — critical on the
    tunneled platform where every transfer costs milliseconds (the
    first cut shipped a 64 MB numpy ownership volume per call)."""
    oa, oc, ob = overlap_acb
    ba, bc, bb = block_acb
    voxels_flat = int(np.prod(padded_zyx))

    @jax.jit
    def assemble(atlas, level_ops):
        num = None
        den = None
        for (layers, tc, tb, factor, dc, db, s_rows), ops in zip(
            level_shapes, level_ops
        ):
            slots = ops["isr"][0].reshape(-1)
            rows = jnp.take(atlas, slots, axis=0)  # (n, vox_pad)
            bricks = rows[:, :voxels_flat].reshape(
                (-1,) + padded_zyx
            ).astype(jnp.float32)
            # (n, BZ, BY, BX) → (n, pa, pc, pb) permuted brick dims.
            bricks = jnp.transpose(
                bricks, (0,) + tuple(p + 1 for p in perm)
            )
            cores = bricks[:, oa : oa + ba, oc : oc + bc, ob : ob + bb]
            resident = ops["isr"][1].reshape(-1, 1, 1, 1)
            vals = cores * resident
            grid = vals.reshape(layers, tc, tb, ba, bc, bb)
            grid = jnp.transpose(grid, (0, 3, 1, 4, 2, 5)).reshape(
                layers * ba, tc * bc, tb * bb
            )[:, :dc, :db]
            cov = jnp.broadcast_to(
                ops["isr"][1][:, None, :, None, :, None],
                (layers, ba, tc, bc, tb, bb),
            ).reshape(layers * ba, tc * bc, tb * bb)[:, :dc, :db]

            if factor == 1:
                v_up = jax.lax.dynamic_slice(
                    grid, (ops["a_off"], 0, 0), (s_rows, dc, db)
                )
                c_up = jax.lax.dynamic_slice(
                    cov, (ops["a_off"], 0, 0), (s_rows, dc, db)
                )
            else:
                da = layers * ba

                def up(x):
                    # precision=HIGHEST: the default TPU matmul path
                    # demotes f32 operands to bf16 (~4e-3 error) — the
                    # upsample must be exact so mixed-LOD assembly
                    # matches the trilinear oracle.
                    hp = jax.lax.Precision.HIGHEST
                    x = jnp.dot(
                        ops["amat"], x.reshape(da, dc * db),
                        preferred_element_type=jnp.float32,
                        precision=hp,
                    ).reshape(-1, dc, db)
                    x = jnp.einsum(
                        "fc,scb->sfb", ops["cmat"], x,
                        preferred_element_type=jnp.float32,
                        precision=hp,
                    )
                    x = jnp.einsum(
                        "gb,sfb->sfg", ops["bmat"], x,
                        preferred_element_type=jnp.float32,
                        precision=hp,
                    )
                    return x

                v_up = up(grid)
                c_up = up(cov)

            # Ownership at render-level granularity, expanded on device:
            # slab row i belongs to tile layer (a_lo+i)//(ba·f) − l_lo.
            fa = factor * ba
            row_idx = (
                ops["own_row0"]
                + jax.lax.broadcasted_iota(jnp.int32, (s_rows, 1), 0)[:, 0]
            ) // fa - ops["own_l0"]
            own = jnp.take(ops["isr"][2], row_idx, axis=0)  # (S, tc, tb)
            own = jnp.repeat(own, factor * bc, axis=1)[:, :fine_nc]
            own = jnp.repeat(own, factor * bb, axis=2)[:, :, :fine_nb]
            v_up = v_up * own
            c_up = c_up * own
            num = v_up if num is None else num + v_up
            den = c_up if den is None else den + c_up

        covered = den > 0.01
        dens = jnp.where(covered, num / jnp.maximum(den, 1e-6), 0.0)
        dens = jnp.clip((dens - lo) / (hi - lo), 0.0, 1.0)
        dens = jnp.where(covered, dens, SENTINEL)
        out = jnp.full((out_slices, nc_pad, nb_pad), SENTINEL, jnp.float32)
        return jax.lax.dynamic_update_slice(out, dens, (0, 0, 0))

    return assemble


@functools.lru_cache(maxsize=512)
def _upsample_matrix_dev(n_fine, n_coarse, lo, hi, base, span):
    """Device-resident two-tap upsample matrix, cached per geometry —
    these are pure functions of static ints and identical every frame,
    so re-uploading them per slab was pure transfer latency."""
    return jnp.asarray(_upsample_matrix(n_fine, n_coarse, lo, hi, base, span))


def assemble_store(
    atlas_data: jnp.ndarray,
    plan: AssemblyPlan,
    a_lo: int = 0,
    a_hi_incl: Optional[int] = None,
    out_slices: Optional[int] = None,
) -> jnp.ndarray:
    """Assemble render-level slices [a_lo, a_hi_incl] from the atlas →
    (out_slices, Nc_pad, Nb_pad) normalized density (SENTINEL outside
    coverage).  Per-level traffic is restricted to the tile layers the
    slab touches (+1 guard layer for upsample taps)."""
    na, nc, nb = plan.fine_dims
    if a_hi_incl is None:
        a_hi_incl = na - 1
    a_hi_incl = min(a_hi_incl, na - 1)
    s_count = a_hi_incl - a_lo + 1
    if out_slices is None:
        out_slices = s_count
    nc_pad = _round_up(nc, 128)
    nb_pad = _round_up(nb, 128)
    perm = sw._PERM[plan.axis]
    ba = plan.block[0]

    level_shapes = []
    level_ops = []
    for lt in plan.levels:
        da_l, dc_l, db_l = lt.dims
        f = lt.factor
        # Tile layers of this level touched by fine rows [a_lo, a_hi_incl]
        # (+1 coarse-voxel guard for the upsample taps).
        c_lo_vox = max(0, int(np.floor((a_lo + 0.5) / f - 0.5)) - 1)
        c_hi_vox = min(
            da_l - 1, int(np.ceil((a_hi_incl + 0.5) / f - 0.5)) + 1
        )
        l_lo = c_lo_vox // ba
        l_hi = c_hi_vox // ba  # inclusive
        layers = l_hi - l_lo + 1
        c_base = l_lo * ba
        sl = slice(l_lo, l_hi + 1)
        if f == 1:
            amat = np.zeros((1, 1), np.float32)  # unused placeholder
            a_off = a_lo - c_base
        else:
            # Columns span the sliced layer range; taps are globally
            # clamped to da_l−1 by construction, so edge-partial layers
            # never contribute junk rows.
            amat = _upsample_matrix(
                na, da_l, a_lo, a_hi_incl, c_base, layers * ba
            )
            a_off = 0
        # ONE packed i32 transfer per level for the residency-varying
        # tables (slots/resident/own), instead of three small
        # device_puts — per-transfer latency dominates out-of-core
        # paging on the tunneled platform (r3 item 8).
        ops = {
            "isr": jnp.asarray(
                np.stack(
                    [
                        lt.slots[sl],
                        lt.resident[sl].astype(lt.slots.dtype),
                        lt.own[sl].astype(lt.slots.dtype),
                    ]
                )
            ),
            "amat": jnp.asarray(amat)
            if f == 1
            else _upsample_matrix_dev(
                na, da_l, a_lo, a_hi_incl, c_base, layers * ba
            ),
            "a_off": jnp.int32(a_off),
            "own_row0": jnp.int32(a_lo),
            "own_l0": jnp.int32(l_lo),
        }
        if f != 1:
            ops["cmat"] = _upsample_matrix_dev(nc, dc_l, 0, nc - 1, 0, dc_l)
            ops["bmat"] = _upsample_matrix_dev(nb, db_l, 0, nb - 1, 0, db_l)
        level_shapes.append(
            (
                layers, lt.slots.shape[1], lt.slots.shape[2], f, dc_l,
                db_l, s_count,
            )
        )
        level_ops.append(ops)

    fn = _compiled_assembler(
        perm=perm,
        padded_zyx=plan.padded_zyx,
        overlap_acb=plan.overlap,
        block_acb=plan.block,
        level_shapes=tuple(level_shapes),
        fine_nc=nc,
        fine_nb=nb,
        out_slices=int(out_slices),
        nc_pad=nc_pad,
        nb_pad=nb_pad,
        lo=plan.lo,
        hi=plan.hi,
    )
    return fn(atlas_data, level_ops)


# =================================================== single-dispatch frames
@functools.lru_cache(maxsize=128)
def _compiled_store_frame(
    *,
    na_store: int,  # store A extent (may exceed na_real with padding)
    na_real: int,  # real render-level slice count (plane-table clamp)
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
    n_clip: int,
    compute_dtype: str,
    with_content: bool,
    axis: int,
    viewport: Optional[Tuple[int, int, int, int]],  # None = slope grid out
    interpret: bool,
    emit_transmittance: bool = False,  # also return the final t carry
    k_total: int = None,  # slab mode: GLOBAL plane count (k_planes local)
    vs_len: int = 11,  # 13 in slab mode: vs appends [k0, a_base]
):
    """ONE jitted dispatch per steady-state frame: device-side plane
    tables + TF tables + opacity correction derived from an 11-float
    view vector, the fused post-classification kernel, and (with a
    viewport) the camera→screen warp.  Host→device per frame = the view
    vector and two 4×4 matrices — the bricked analog of the dense
    path's single-dispatch frame (the tunneled platform charges ~3 ms
    per transfer, so operand count IS the frame budget)."""
    nb_pad = _round_up(nb_real, 128)
    nc_pad = _round_up(nc_real, 128)
    v_pad = _round_up(v_size, 8)
    u_pad = _round_up(u_size, 128)
    kernel = _make_post_kernel(
        na=na_store,
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
        n_clip=n_clip,
        compute_dtype=jnp.dtype(compute_dtype).type,
    )

    @jax.jit
    def run(store, tf, fv, clip, content):
        # fv (43,): [vs(11) | inv_proj.ravel()(16) | inv_mv.ravel()(16)]
        # — ONE packed per-frame host→device transfer; vs =
        # [wa0, wa1, eye_a, u0, du, dv, eb, ec, v0, sign, msr].
        vs = fv[:vs_len]
        inv_proj = fv[11:27].reshape(4, 4)
        inv_mv = fv[27:43].reshape(4, 4)
        wa0, wa1, eye_a = vs[0], vs[1], vs[2]
        u0, du, dv = vs[3], vs[4], vs[5]
        eb, ec, v0, sign = vs[6], vs[7], vs[8], vs[9]
        msr = vs[10]
        # Slab mode: this dispatch sweeps GLOBAL planes [k0, k0+K_l)
        # against a local slab whose slice 0 is global slice a_base
        # (plane positions/clamps stay on the global grid, so slab
        # segments fold bit-identically to the monolithic sweep).
        k0 = vs[11] if vs_len > 11 else jnp.float32(0.0)
        ab = vs[12] if vs_len > 11 else jnp.float32(0.0)
        kt = k_total if k_total is not None else k_planes
        k = k0 + jnp.arange(k_planes, dtype=jnp.float32)
        dz = (wa1 - wa0) / kt
        z = jnp.where(sign > 0, wa0 + (k + 0.5) * dz, wa1 - (k + 0.5) * dz)
        sa = jnp.clip(
            (z - wa0) / (wa1 - wa0) * na_real - 0.5, -0.5, na_real - 0.5
        )
        i0 = jnp.floor(jnp.clip(sa, 0.0, float(na_real - 1)))
        wa = jnp.clip(sa - i0, 0.0, 1.0)
        a0 = jnp.clip(i0 - ab, 0.0, float(na_store - 1)).astype(jnp.int32)
        a1 = jnp.clip(
            jnp.minimum(i0 + 1.0, float(na_real - 1)) - ab,
            0.0,
            float(na_store - 1),
        ).astype(jnp.int32)
        if with_content:
            act = jnp.take(content, a0) | jnp.take(content, a1)
        else:
            act = jnp.ones((k_planes,), jnp.int32)
        dl = z - eye_a
        view8 = jnp.stack([u0, du, dv, eb, ec, v0, eye_a, 0.0 * u0])
        ug = u0 + du * jnp.arange(u_pad, dtype=jnp.float32)
        vg = v0 + dv * jnp.arange(v_pad, dtype=jnp.float32)
        length = jnp.sqrt(1.0 + ug[None, :] ** 2 + vg[:, None] ** 2)
        corr = msr * dz * length
        tfmat = tf_tables(tf, v_pad)
        rgb_in = jnp.zeros((4, v_pad, u_pad), jnp.float32)
        t_in = jnp.ones((v_pad, u_pad), jnp.float32)
        hit = hit_mask(
            ug, vg, wa0=wa0, wa1=wa1, eye_a=eye_a, eb=eb, ec=ec,
            wb0=wb0, wb1=wb1, wc0=wc0, wc1=wc1,
        )
        out, t_fin = _post_call(
            kernel, store, a0, a1, wa, dl, act, view8, tfmat, corr, clip,
            rgb_in, t_in, hit,
            k_planes=k_planes,
            na=na_store,
            nc_pad=nc_pad,
            nb_pad=nb_pad,
            v_pad=v_pad,
            u_pad=u_pad,
            interpret=interpret,
        )
        inter = jnp.transpose(out, (1, 2, 0))[:v_size, :u_size]
        if emit_transmittance:
            return inter, t_fin
        if viewport is None:
            return inter
        return sw.warp_frame_device(
            inter, inv_proj, inv_mv, u0, du, dv, v0, sign,
            axis=axis, viewport=viewport, v_size=v_size, u_size=u_size,
        )

    return run


def render_store_frame(
    store: jnp.ndarray,  # (Na_store, Nc_pad, Nb_pad) from assemble_store
    plan: AssemblyPlan,
    tf: jnp.ndarray,  # (256, 4) device-resident transfer function
    camera,
    *,
    params: RenderParams,
    swp: sw.ShearWarpParams,
    world_min,
    world_max,
    sw_plan: Optional[sw.ShearWarpPlan] = None,
    clip_planes_world: Optional[np.ndarray] = None,
    clip_device: Optional[jnp.ndarray] = None,
    content: Optional[jnp.ndarray] = None,
    to_screen: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Steady-state interactive frame from a cached assembled store:
    camera → (H, W, 4) screen image (or the (V, U, 4) slope grid with
    ``to_screen=False``) in ONE device dispatch.  TF edits and camera
    motion are runtime operands — no recompilation, no reassembly
    (≤3 compilations per store geometry, one per major axis).

    ``clip_device`` short-circuits the host clip-matrix build with a
    cached ``(jnp (8, 128) matrix, n_clip)`` pair (from
    :func:`clip_matrix`; pass ``clip_planes_world`` on change only)."""
    wmin = np.asarray(world_min, np.float32)
    wmax = np.asarray(world_max, np.float32)
    axis = plan.axis
    b_axis, c_axis = sw._BC_AXES[axis]
    na, nc, nb = plan.fine_dims
    if sw_plan is None:
        sw_plan = sw.make_view_plan(camera, swp.slope_margin)
    assert sw_plan.axis == axis, (sw_plan.axis, axis)
    if clip_device is not None:
        clip_j, n_clip = clip_device
    else:
        clip_m, n_clip = clip_matrix(clip_planes_world, axis)
        clip_j = jnp.asarray(clip_m)
    v_size, u_size = swp.inter_size
    run = _compiled_store_frame(
        na_store=store.shape[0],
        na_real=na,
        nc_real=nc,
        nb_real=nb,
        k_planes=swp.n_planes,
        v_size=v_size,
        u_size=u_size,
        wb0=float(wmin[b_axis]),
        wb1=float(wmax[b_axis]),
        wc0=float(wmin[c_axis]),
        wc1=float(wmax[c_axis]),
        early_exit=float(params.early_exit),
        n_clip=n_clip,
        compute_dtype=swp.compute_dtype,
        with_content=content is not None,
        axis=axis,
        viewport=tuple(int(x) for x in camera.viewport) if to_screen else None,
        interpret=interpret,
    )
    eye = np.asarray(sw_plan.eye, np.float32)
    u0, u1, v0, v1 = sw_plan.bounds
    fv = np.empty(43, np.float32)
    fv[:11] = [
        wmin[axis], wmax[axis], eye[axis],
        u0, (u1 - u0) / (u_size - 1), (v1 - v0) / (v_size - 1),
        eye[b_axis], eye[c_axis], v0, sw_plan.sign,
        params.max_samples_per_ray,
    ]
    fv[11:27] = np.asarray(camera.inv_proj, np.float32).ravel()
    fv[27:43] = np.asarray(camera.inv_mv, np.float32).ravel()
    if content is None:
        content = jnp.zeros((1,), jnp.int32)  # placeholder, unused
    return run(store, tf, jnp.asarray(fv), clip_j, content)


class StoreFrameRunner:
    """Per-frame host fast path for steady-state interactive frames.

    ``render_store_frame`` re-resolves the compiled dispatch, converts
    the clip matrix, and normalizes geometry on every call (~2-3 ms of
    host time per frame).  A runner hoists everything camera-INDEPENDENT
    out of the frame loop; per frame only the 43-float view vector is
    rebuilt (camera matrices + slope-grid params) and the single jitted
    dispatch issued — the host analog of the reference keeping its GL
    pipeline objects across frames (GLRaycastPipeline.cpp:56-90)."""

    __slots__ = (
        "run", "clip_j", "content", "axis", "b_axis", "c_axis",
        "wmin", "wmax", "u_size", "v_size", "max_spr", "slope_margin",
    )

    def __init__(
        self, store, plan, *, params, swp, world_min, world_max,
        clip_planes_world=None, content=None, viewport=None,
        interpret=False,
    ):
        wmin = np.asarray(world_min, np.float32)
        wmax = np.asarray(world_max, np.float32)
        axis = plan.axis
        self.axis = axis
        self.b_axis, self.c_axis = sw._BC_AXES[axis]
        na, nc, nb = plan.fine_dims
        clip_m, n_clip = clip_matrix(clip_planes_world, axis)
        self.clip_j = jnp.asarray(clip_m)
        self.v_size, self.u_size = swp.inter_size
        self.wmin, self.wmax = wmin, wmax
        self.max_spr = float(params.max_samples_per_ray)
        self.slope_margin = swp.slope_margin
        self.content = (
            content if content is not None else jnp.zeros((1,), jnp.int32)
        )
        self.run = _compiled_store_frame(
            na_store=store.shape[0],
            na_real=na,
            nc_real=nc,
            nb_real=nb,
            k_planes=swp.n_planes,
            v_size=self.v_size,
            u_size=self.u_size,
            wb0=float(wmin[self.b_axis]),
            wb1=float(wmax[self.b_axis]),
            wc0=float(wmin[self.c_axis]),
            wc1=float(wmax[self.c_axis]),
            early_exit=float(params.early_exit),
            n_clip=n_clip,
            compute_dtype=swp.compute_dtype,
            with_content=content is not None,
            axis=axis,
            viewport=tuple(int(x) for x in viewport)
            if viewport is not None
            else None,
            interpret=interpret,
        )

    def view_vector(self, camera, sw_plan) -> np.ndarray:
        eye = np.asarray(sw_plan.eye, np.float32)
        u0, u1, v0, v1 = sw_plan.bounds
        fv = np.empty(43, np.float32)
        fv[:11] = [
            self.wmin[self.axis], self.wmax[self.axis], eye[self.axis],
            u0, (u1 - u0) / (self.u_size - 1),
            (v1 - v0) / (self.v_size - 1),
            eye[self.b_axis], eye[self.c_axis], v0, sw_plan.sign,
            self.max_spr,
        ]
        fv[11:27] = np.asarray(camera.inv_proj, np.float32).ravel()
        fv[27:43] = np.asarray(camera.inv_mv, np.float32).ravel()
        return fv

    def __call__(self, store, tf, camera, sw_plan=None):
        if sw_plan is None:
            sw_plan = sw.make_view_plan(camera, self.slope_margin)
        assert sw_plan.axis == self.axis
        fv = self.view_vector(camera, sw_plan)
        return self.run(store, tf, jnp.asarray(fv), self.clip_j,
                        self.content)


def store_content(store: jnp.ndarray, na_real: int) -> jnp.ndarray:
    """(Na_store,) int32 per-slice coverage flags for bit-exact
    empty-space skipping: a plane whose bracketing slices are both fully
    uncovered interpolates to SENTINEL everywhere, masks to zero alpha,
    and its composite step is the identity."""
    cov = (store > -0.5).astype(jnp.int32)
    c = (jnp.max(cov, axis=(1, 2)) > 0).astype(jnp.int32)
    return c.at[na_real:].set(0)


# ==================================================================== driver
@dataclasses.dataclass
class SlabSweep:
    """Per-frame slab-pass runner: device operands (view vector, TF
    tables, opacity correction, clip rows) plus the GLOBAL plane tables;
    ``run_pass`` executes one memory-bounded A-slab against the carried
    (rgb, transmittance) — the multipass accumulation texture of
    GLRaycastPipeline.cpp:148-186.  The plane grid is global, so passes
    compose bit-identically to one sweep (fragRaycast.glsl:152-158
    generalized)."""

    nc: int
    nb: int
    k_pass: int
    v_size: int
    u_size: int
    wb0: float
    wb1: float
    wc0: float
    wc1: float
    early_exit: float
    n_clip: int
    compute_dtype: str
    interpret: bool
    a0: np.ndarray
    a1: np.ndarray
    wa: np.ndarray
    dl: np.ndarray
    view8: jnp.ndarray
    tfmat: jnp.ndarray
    corr: jnp.ndarray
    clip_j: jnp.ndarray
    hit: jnp.ndarray

    def initial_carry(self):
        v_pad = _round_up(self.v_size, 8)
        u_pad = _round_up(self.u_size, 128)
        return (
            jnp.zeros((4, v_pad, u_pad), jnp.float32),
            jnp.ones((v_pad, u_pad), jnp.float32),
        )

    def run_pass(self, slab, sp: SlabPlan, a_base: int, carry):
        rgb, t = carry
        na_k = slab.shape[0]
        run = _compiled_post_renderer(
            na=na_k,
            nc_real=self.nc,
            nb_real=self.nb,
            k_planes=self.k_pass,
            v_size=self.v_size,
            u_size=self.u_size,
            wb0=self.wb0,
            wb1=self.wb1,
            wc0=self.wc0,
            wc1=self.wc1,
            early_exit=self.early_exit,
            n_clip=self.n_clip,
            compute_dtype=self.compute_dtype,
            interpret=self.interpret,
        )
        kr = slice(sp.k_lo, sp.k_hi)
        npad = self.k_pass - (sp.k_hi - sp.k_lo)
        # Clamp only the inactive padding planes into range; real planes
        # are in-slab by construction (make_slab_plans covers a1 too).
        a0_l = np.clip(
            np.pad(self.a0[kr] - a_base, (0, npad)), 0, max(na_k - 1, 0)
        ).astype(np.int32)
        a1_l = np.clip(
            np.pad(self.a1[kr] - a_base, (0, npad)), 0, max(na_k - 1, 0)
        ).astype(np.int32)
        wa_l = np.pad(self.wa[kr], (0, npad))
        dl_l = np.pad(self.dl[kr], (0, npad))
        act_l = np.pad(np.ones(sp.k_hi - sp.k_lo, np.int32), (0, npad))
        return run(
            slab,
            jnp.asarray(a0_l),
            jnp.asarray(a1_l),
            jnp.asarray(wa_l),
            jnp.asarray(dl_l),
            jnp.asarray(act_l),
            self.view8,
            self.tfmat,
            self.corr,
            self.clip_j,
            rgb,
            t,
            self.hit,
        )

    def finish(self, carry) -> jnp.ndarray:
        rgb, _t = carry
        return jnp.transpose(rgb, (1, 2, 0))[: self.v_size, : self.u_size]


def make_slab_sweep(
    tf: jnp.ndarray,
    *,
    fine_dims: Tuple[int, int, int],
    eye,
    sign: float,
    slope_bounds: Tuple[float, float, float, float],
    axis: int,
    world_min,
    world_max,
    params: RenderParams,
    swp: sw.ShearWarpParams,
    k_pass: int,
    clip_planes_world: Optional[np.ndarray] = None,
    interpret: bool = False,
) -> SlabSweep:
    wmin = np.asarray(world_min, np.float32)
    wmax = np.asarray(world_max, np.float32)
    b_axis, c_axis = sw._BC_AXES[axis]
    na, nc, nb = fine_dims
    eye = np.asarray(eye, np.float32)
    k_planes = swp.n_planes
    v_size, u_size = swp.inter_size
    v_pad = _round_up(v_size, 8)
    u_pad = _round_up(u_size, 128)

    a0, a1, wa, dl, _z, dz = plane_tables(
        na=na,
        k_planes=k_planes,
        wa0=float(wmin[axis]),
        wa1=float(wmax[axis]),
        eye_a=float(eye[axis]),
        sign=sign,
    )
    u0, u1, v0, v1 = slope_bounds
    du = (u1 - u0) / (u_size - 1)
    dv = (v1 - v0) / (v_size - 1)
    ug = u0 + du * np.arange(u_pad, dtype=np.float32)
    vg = v0 + dv * np.arange(v_pad, dtype=np.float32)
    length = np.sqrt(1.0 + ug[None, :] ** 2 + vg[:, None] ** 2)
    corr = jnp.asarray(
        (params.max_samples_per_ray * dz * length).astype(np.float32)
    )
    hit = jnp.asarray(hit_mask(
        ug, vg, wa0=float(wmin[axis]), wa1=float(wmax[axis]),
        eye_a=float(eye[axis]), eb=float(eye[b_axis]),
        ec=float(eye[c_axis]), wb0=float(wmin[b_axis]),
        wb1=float(wmax[b_axis]), wc0=float(wmin[c_axis]),
        wc1=float(wmax[c_axis]),
    ))
    clip_m, n_clip = clip_matrix(clip_planes_world, axis)
    return SlabSweep(
        nc=nc,
        nb=nb,
        k_pass=k_pass,
        v_size=v_size,
        u_size=u_size,
        wb0=float(wmin[b_axis]),
        wb1=float(wmax[b_axis]),
        wc0=float(wmin[c_axis]),
        wc1=float(wmax[c_axis]),
        early_exit=float(params.early_exit),
        n_clip=n_clip,
        compute_dtype=swp.compute_dtype,
        interpret=interpret,
        a0=a0,
        a1=a1,
        wa=wa,
        dl=dl,
        view8=jnp.asarray(
            np.float32(
                [u0, du, dv, eye[b_axis], eye[c_axis], v0, eye[axis], 0.0]
            )
        ),
        tfmat=tf_tables(jnp.asarray(tf, jnp.float32), v_pad),
        corr=corr,
        clip_j=jnp.asarray(clip_m),
        hit=hit,
    )


def render_bricked_slope_grid(
    atlas_data: jnp.ndarray,
    plan: AssemblyPlan,
    tf: jnp.ndarray,  # (256, 4)
    *,
    eye,
    sign: float,
    slope_bounds: Tuple[float, float, float, float],
    world_min,
    world_max,
    params: RenderParams,
    swp: sw.ShearWarpParams,
    clip_planes_world: Optional[np.ndarray] = None,
    max_slab_slices: Optional[int] = None,
    store: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full slope-space render of the rendering set → (V, U, 4).

    Assembles the density store in A-slab passes (≤ ``max_slab_slices``
    assembled slices each) and sweeps the fused post-classification
    kernel over each with the compositing carry threaded through — the
    memory-bounded multipass of GLRaycastPipeline.cpp:148-186.  Pass a
    prebuilt full-range ``store`` (from :func:`assemble_store`) to skip
    assembly (the engine's steady-state cache)."""
    na = plan.fine_dims[0]
    k_planes = swp.n_planes
    if store is not None or max_slab_slices is None or na <= max_slab_slices:
        plans = [SlabPlan(0, na - 1, 0, k_planes)]
    else:
        wmin = np.asarray(world_min, np.float32)
        a0_g, _, _, _, _, _ = plane_tables(
            na=na,
            k_planes=k_planes,
            wa0=float(wmin[plan.axis]),
            wa1=float(np.asarray(world_max, np.float32)[plan.axis]),
            eye_a=float(np.asarray(eye, np.float32)[plan.axis]),
            sign=sign,
        )
        plans = make_slab_plans(a0_g, na, max_slab_slices)
    k_pass = max(p.k_hi - p.k_lo for p in plans)

    sweep = make_slab_sweep(
        tf,
        fine_dims=plan.fine_dims,
        eye=eye,
        sign=sign,
        slope_bounds=slope_bounds,
        axis=plan.axis,
        world_min=world_min,
        world_max=world_max,
        params=params,
        swp=swp,
        k_pass=k_pass,
        clip_planes_world=clip_planes_world,
        interpret=interpret,
    )
    carry = sweep.initial_carry()
    slab_na = max(p.a_hi_incl - p.a_lo + 1 for p in plans)
    for sp in plans:
        if store is None:
            slab = assemble_store(
                atlas_data, plan, sp.a_lo, sp.a_hi_incl, out_slices=slab_na
            )
            a_base = sp.a_lo
        else:
            slab = store
            a_base = 0
        carry = sweep.run_pass(slab, sp, a_base, carry)
    return sweep.finish(carry)
