"""libre_tpu — a TPU-native differentiable out-of-core volume raymarching framework.

A ground-up reimplementation of the capability surface of Libre (the Livre
fork — Large-scale Interactive Volume Rendering Engine): octree/LOD bricked
volumes, pluggable data sources, LRU brick caches, an HBM brick atlas,
sort-first/sort-last distributed rendering, histogram computation, and remote
steering — redesigned TPU-first:

  * the per-ray raycast loop (reference: renderers/glRaycaster/shaders/
    fragRaycast.glsl, renderers/cudaRaycaster/cuda/Renderer.cu) becomes fused
    Pallas forward/backward kernels over ray tiles,
  * multi-GPU sort-first / sort-last decompositions (reference: livre/eq/)
    become shardings over a jax.sharding.Mesh with XLA collectives,
  * and — beyond the reference — the whole pipeline is differentiable with
    respect to voxel densities and transfer-function weights for inverse
    rendering.

Subpackages
-----------
core      octree data model, LOD selection, frustum, caches, config
data      data sources (mem://, raw://, NRRD, bricked LOD store)
ops       compute kernels: reference jnp marcher, Pallas kernels, atlas
parallel  mesh/shardings, sort-first tiles, sort-last ordered compositing
render    camera/settings/frame state, render engine
models    differentiable scene models (density grid + transfer function)
train     inverse-rendering optimization, checkpointing
apps      CLI renderer, batch renderer, steering server
"""

__version__ = "0.1.0"

from libre_tpu.core.nodeid import NodeId, RootNode
from libre_tpu.core.volume_info import DataType, VolumeInformation, fill_regular_volume_info
from libre_tpu.core.lodnode import LODNode

__all__ = [
    "NodeId",
    "RootNode",
    "DataType",
    "VolumeInformation",
    "fill_regular_volume_info",
    "LODNode",
]
