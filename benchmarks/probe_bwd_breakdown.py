"""Where does the flagship fwd+bwd step spend its time? (VERDICT r4
weak 1: store_fwd_bwd_mrays flat at ~9.8 while forward paths improved.)

Times, via chained-frame marginals on the same 256³→256²×512 workload
bench.py uses:
  * forward kernel alone (emit_transmittance, the vjp's _fwd_impl);
  * fwd+bwd with diff_tf=False (density gradient only: the Pallas
    backward sweep, no TF phase);
  * fwd+bwd with diff_tf=True (adds the (K,V,U) w/dα side outputs, the
    chunked plane recompute, and the one-hot MXU TF scatter);
  * fwd+bwd with backward="jnp" (the oracle recompute path).

    python benchmarks/probe_bwd_breakdown.py [--img 256] [--vox 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, x, iters=3):
    float(fn(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make_chain, x, lo=1, hi=5):
    f_lo, f_hi = make_chain(lo), make_chain(hi)
    return (timed(f_hi, x) - timed(f_lo, x)) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--vox", type=int, default=256)
    ap.add_argument("--planes", type=int, default=512)
    ap.add_argument("--kc", type=int, default=32)
    args = ap.parse_args()

    from bench import make_camera, smooth_volume  # noqa: E402
    from libre_tpu.ops import shearwarp as sw
    from libre_tpu.ops import shearwarp_bricked as swb
    from libre_tpu.ops import shearwarp_grad as swg
    from libre_tpu.ops import transfer_function as tf_ops
    from libre_tpu.ops.shearwarp_pallas import _round_up

    img, spr = args.img, args.planes
    vol = smooth_volume(args.vox)
    axis = 2
    real = np.transpose(vol, sw._PERM[axis])
    na, nc, nb = real.shape
    store = np.full(
        (na, _round_up(nc, 128), _round_up(nb, 128)), swb.SENTINEL,
        np.float32,
    )
    store[:, :nc, :nb] = real
    store = jnp.asarray(store)
    tf = jnp.asarray(tf_ops.default_color_map(256))
    gmin, gmax = np.float32([-0.5] * 3), np.float32([0.5] * 3)
    bounds = (-0.55, 0.35, -0.45, 0.42)
    vs = jnp.asarray(swg.view_vector(
        world_min=gmin, world_max=gmax, axis=axis,
        eye=np.float32([0.1, 0.05, 1.4]), sign=-1.0, slope_bounds=bounds,
        inter_size=(img, img), max_samples_per_ray=spr,
    ))
    rays = img * img

    def static(diff_tf, backward="pallas", kc=args.kc):
        return swg.static_view(
            na_store=store.shape[0], na_real=na, nc_real=nc, nb_real=nb,
            k_planes=spr, v_size=img, u_size=img,
            world_min=gmin, world_max=gmax, axis=axis,
            early_exit=1.1, kc=kc, diff_tf=diff_tf, backward=backward,
        )

    def fwd_chain(m):
        st_v = static(True)

        def f(st):
            s = jnp.float32(0.0)
            for _ in range(m):
                out, t_fin = swg._fwd_impl(st + s * 1e-30, tf, vs, st_v)
                s = out.sum() + t_fin.sum() * 1e-30
            return s
        return jax.jit(f)

    def vjp_chain(st_v):
        def chain(m):
            def f(st):
                s = jnp.float32(0.0)
                for _ in range(m):
                    def loss(x):
                        out = swg.render_store_grid_diff(x, tf, vs, st_v)
                        return jnp.sum(out * out)
                    l, g = jax.value_and_grad(loss)(st + s * 1e-30)
                    s = l + g.sum() * 1e-30
                return s
            return jax.jit(f)
        return chain

    dt_f = marginal(fwd_chain, store)
    log(f"forward only:          {dt_f*1e3:7.2f} ms  "
        f"({rays/dt_f/1e6:6.2f} Mrays/s)")
    dt_nd = marginal(vjp_chain(static(False)), store)
    log(f"fwd+bwd diff_tf=False: {dt_nd*1e3:7.2f} ms  "
        f"({rays/dt_nd/1e6:6.2f} Mrays/s)")
    dt_d = marginal(vjp_chain(static(True)), store)
    log(f"fwd+bwd diff_tf=True:  {dt_d*1e3:7.2f} ms  "
        f"({rays/dt_d/1e6:6.2f} Mrays/s)")
    for kc in (16, 64, 128):
        dt_k = marginal(vjp_chain(static(True, kc=kc)), store)
        log(f"fwd+bwd diff_tf kc={kc:3d}: {dt_k*1e3:6.2f} ms  "
            f"({rays/dt_k/1e6:6.2f} Mrays/s)")
    log(f"=> backward-only diff_tf=False: {(dt_nd-dt_f)*1e3:.2f} ms; "
        f"TF phase adds: {(dt_d-dt_nd)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
