"""UVF reader against the reference's own fixture + golden values
(tests/uvf/uvf.cpp: depth 2, uint8, overlap 2, 75×75×138 voxels, first
child voxel box 28³, padded brick 32³)."""

import os

import numpy as np
import pytest

from libre_tpu.core.nodeid import NodeId
from libre_tpu.data.datasource import DataSource, load_plugins

UVF_FILE = "/root/reference/tests/uvf/mouse_reduced.uvf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(UVF_FILE), reason="reference UVF fixture unavailable"
)

load_plugins()


@pytest.fixture(scope="module")
def source():
    return DataSource(f"uvf://{UVF_FILE}")


def test_golden_metadata(source):
    """tests/uvf/uvf.cpp:42-52 golden values."""
    info = source.volume_info
    assert info.root_node.depth == 2
    assert info.component_count == 1
    assert info.data_type.numpy_dtype == np.uint8
    assert info.voxels == (75, 75, 138)
    assert info.overlap == (2, 2, 2)
    assert info.root_node.block_count == (2, 2, 3)


def test_golden_first_child(source):
    """tests/uvf/uvf.cpp:54-75: first child of the root-grid origin has a
    28³ voxel box and a 32³ (block + 2·overlap) data brick."""
    info = source.volume_info
    parent = NodeId.from_coords(0, (0, 0, 0))
    child = parent.children()[0]
    node = source.get_node(child)
    assert node.block_size == (28, 28, 28)
    block = tuple(
        b + 2 * o for b, o in zip(node.block_size, info.overlap)
    )
    assert block == info.maximum_block_size
    data = source.get_data(child)
    assert data.nbytes == 32 * 32 * 32 * 1
    assert data.shape == (32, 32, 32)


def test_ghost_voxels_consistent(source):
    """Neighbouring bricks must agree on their shared overlap voxels —
    validates brick ordering, offsets, and decompression end to end."""
    b0 = source.get_data(NodeId.from_coords(1, (0, 0, 0)))
    b1 = source.get_data(NodeId.from_coords(1, (1, 0, 0)))
    # brick x-range [pos*28 - 2, pos*28 + 30): columns 28.. of b0 overlap
    # columns 0.. of b1
    np.testing.assert_array_equal(b0[:, :, 28:32], b1[:, :, 0:4])
    b2 = source.get_data(NodeId.from_coords(1, (0, 1, 0)))
    np.testing.assert_array_equal(b0[:, 28:32, :], b2[:, 0:4, :])


def test_edge_brick_padded_to_atlas_shape(source):
    """Edge bricks (native extent < 32) come back edge-replicated to the
    uniform atlas shape."""
    data = source.get_data(NodeId.from_coords(1, (2, 2, 4)))
    assert data.shape == (32, 32, 32)
    # x inner = 75 - 2*28 = 19 -> native 23 wide; replicated beyond
    np.testing.assert_array_equal(data[:, :, 22], data[:, :, 23])


def test_invalid_out_of_grid_child(source):
    """Children outside the UVF brick grid (the non-perfect-octree
    subset, UVFDataSource.cpp:311-318) are invalid nodes."""
    node = source.get_node(NodeId.from_coords(1, (3, 3, 5)))
    assert node.block_size == (0, 0, 0)


def test_lod_consistency(source):
    """A coarse brick downsamples the fine level approximately: means
    over the shared world region should agree."""
    coarse = source.get_data(NodeId.from_coords(0, (0, 0, 0)))
    fine = source.get_data(NodeId.from_coords(1, (0, 0, 0)))
    c = coarse[2:16, 2:16, 2:16].astype(np.float64)
    f = fine[2:30, 2:30, 2:30].astype(np.float64)
    assert abs(c.mean() - f.mean()) < 3.0


def test_world_boxes_nest(source):
    """Child world boxes lie inside the parent's, up to one coarse voxel
    — UVF LODs ceil-halve the grid (75 → 38), so fine levels can
    genuinely extend past the coarse box by the rounding slack (the same
    geometry Tuvok produces)."""
    info = source.volume_info
    parent = source.get_node(NodeId.from_coords(0, (0, 0, 0)))
    coarse_voxel = [
        ws / (v // 2) for ws, v in zip(info.world_size, info.voxels)
    ]
    for child_id in NodeId.from_coords(0, (0, 0, 0)).children():
        child = source.get_node(child_id)
        if child.block_size == (0, 0, 0):
            continue
        for d in range(3):
            tol = coarse_voxel[d] + 1e-6
            assert child.world_box_min[d] >= parent.world_box_min[d] - tol
            assert child.world_box_max[d] <= parent.world_box_max[d] + tol
