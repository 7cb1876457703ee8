"""Inverse rendering through the fused differentiable store core.

BASELINE config 5 ("optimize voxel densities + transfer function from
target images at pod scale") on the framework's FAST path: the forward
is the fused Pallas post-classification sweep and the backward the
batched-recompute sweeps of ops/shearwarp_grad.render_store_grid_diff —
not the 0.009 Mrays/s exact marcher (train/trainer.py, which remains
the oracle-faithful brick-sharded variant) nor the dense jnp pipeline
(train/shearwarp_trainer.py, now the reference implementation of this
module).

Sharding over the (brick × ray) mesh:

  * **views** shard over the brick axis — independent render+backward
    per view (the reference's one-Channel-per-view decomposition,
    livre/eq/Channel.cpp:259-308);
  * **slope-grid rows** shard over the ray axis — sort-first inside
    each view, expressed as a runtime ``v0`` offset per device.

The density store and transfer function are replicated; shard_map's
transpose psums their cotangents across the mesh — the gradient
all-reduce of a data-parallel training step, riding ICI.

Training constraints (same rules as InverseRenderProblem): early exit
is DISABLED under grad (a step function of the parameters), and all
views must share one major axis because the store is assembled in one
axis permutation.  Uncovered (SENTINEL) voxels receive zero gradient
through the coverage mask and are pinned by the update mask.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from libre_tpu.ops import shearwarp_grad as swg
from libre_tpu.ops.shearwarp_bricked import SENTINEL
from libre_tpu.parallel.mesh import BRICK_AXIS, RAY_AXIS


@dataclasses.dataclass(frozen=True)
class StoreProblem:
    """Static inverse-rendering problem over one store geometry.

    ``views`` is the (Nv, 11) matrix of view vectors
    (shearwarp_grad.view_vector — all on the same major axis); the
    static geometry is shared.  ``inter_size`` is the GLOBAL (V, U)
    slope grid per view.
    """

    views: np.ndarray  # (Nv, 11)
    na_store: int
    na_real: int
    nc_real: int
    nb_real: int
    k_planes: int
    inter_size: Tuple[int, int]
    world_min: np.ndarray
    world_max: np.ndarray
    axis: int
    diff_tf: bool = True
    kc: int = 32
    interpret: bool = False

    def static_for(self, v_size: int) -> swg._StaticView:
        return swg.static_view(
            na_store=self.na_store,
            na_real=self.na_real,
            nc_real=self.nc_real,
            nb_real=self.nb_real,
            k_planes=self.k_planes,
            v_size=v_size,
            u_size=self.inter_size[1],
            world_min=self.world_min,
            world_max=self.world_max,
            axis=self.axis,
            early_exit=1.1,  # disabled under grad
            kc=self.kc,
            interpret=self.interpret,
            diff_tf=self.diff_tf,
        )


def render_views(problem: StoreProblem, store, tf) -> jnp.ndarray:
    """Single-device render of every view → (Nv, V, U, 4) (target
    generation / parity oracle for the sharded step)."""
    static = problem.static_for(problem.inter_size[0])
    outs = [
        swg.render_store_grid_diff(store, tf, jnp.asarray(vs), static)
        for vs in problem.views
    ]
    return jnp.stack(outs)


def make_loss_fn(problem: StoreProblem, mesh: Optional[Mesh]):
    """(store, tf, targets (Nv, V, U, 4)) → mean-squared error, with the
    per-view forward+backward sharded views×rows over the mesh."""
    V, U = problem.inter_size
    n_views = len(problem.views)
    views_arr = jnp.asarray(problem.views, jnp.float32)

    if mesh is None:
        static = problem.static_for(V)

        def loss_fn(store, tf, targets):
            se = 0.0
            for i in range(n_views):
                img = swg.render_store_grid_diff(
                    store, tf, views_arr[i], static
                )
                se = se + jnp.sum((img - targets[i]) ** 2)
            return se / (n_views * V * U * 4)

        return loss_fn

    d_k = mesh.shape[BRICK_AXIS]
    d_v = mesh.shape[RAY_AXIS]
    if n_views % d_k or V % d_v:
        raise ValueError(
            f"views={n_views} V={V} must divide mesh axes {d_k}x{d_v}"
        )
    nv_l, v_l = n_views // d_k, V // d_v
    static_l = problem.static_for(v_l)
    denom = float(n_views * V * U * 4)

    def body(store, tf, views_l, targets_l):
        vd = jax.lax.axis_index(RAY_AXIS)
        se = 0.0
        for i in range(nv_l):
            vs = views_l[i]
            # Sort-first row offset: rows [vd·V_l, (vd+1)·V_l) of the
            # global grid start at v0 + vd·V_l·dv (dv = vs[5]).
            vs = vs.at[8].add(vd.astype(jnp.float32) * (v_l * vs[5]))
            img = swg.render_store_grid_diff(store, tf, vs, static_l)
            se = se + jnp.sum((img - targets_l[i]) ** 2)
        return jax.lax.psum(se, (BRICK_AXIS, RAY_AXIS)) / denom

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(BRICK_AXIS), P(BRICK_AXIS, RAY_AXIS)),
        out_specs=P(),
        # The body runs a pallas_call, whose outputs carry no
        # varying-mesh-axes annotation (see parallel/bricked_sharded.py).
        check_vma=False,
    )

    def loss_fn(store, tf, targets):
        return sharded(store, tf, views_arr, targets)

    return loss_fn


def make_train_step(
    problem: StoreProblem,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """jitted (params, opt_state, targets) → (params, opt_state, loss).

    params = {"store": (Na, Ncp, Nbp), "tf": (256, 4)}; gradients flow
    through the fused forward + batched-recompute backward, psum-reduced
    across the mesh by shard_map's transpose.  The update clamps
    densities/TF to [0, 1] and pins uncovered voxels at SENTINEL.
    """
    loss_fn = make_loss_fn(problem, mesh)

    @jax.jit
    def step(params, opt_state, targets):
        def f(p):
            return loss_fn(p["store"], p["tf"], targets)

        loss, grads = jax.value_and_grad(f)(params)
        if not problem.diff_tf:
            grads = dict(grads, tf=jnp.zeros_like(grads["tf"]))
        # Coverage is a property of the INITIAL store (SENTINEL marks
        # voxels no resident brick covers) — derive it from the
        # pre-update values so a large update that pushes a covered
        # voxel below the sentinel threshold cannot permanently convert
        # it to uncovered (advisor r3).
        covered = params["store"] > -0.5
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {
            "store": jnp.where(
                covered, jnp.clip(params["store"], 0.0, 1.0), SENTINEL
            ),
            "tf": jnp.clip(params["tf"], 0.0, 1.0),
        }
        return params, opt_state, loss

    return step


def fit(
    problem: StoreProblem,
    targets: jnp.ndarray,  # (Nv, V, U, 4)
    init_store: jnp.ndarray,
    init_tf: jnp.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    steps: int = 100,
) -> Tuple[dict, List[float]]:
    """Run the optimization; returns (params, losses)."""
    optimizer = optimizer or optax.adam(3e-2)
    params = {"store": jnp.asarray(init_store), "tf": jnp.asarray(init_tf)}
    opt_state = optimizer.init(params)
    step = make_train_step(problem, optimizer, mesh)
    targets = jnp.asarray(targets)
    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, targets)
        losses.append(float(loss))
    return params, losses
