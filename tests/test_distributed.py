"""Single-process behavior of the multi-host helpers (the multi-host
paths are exercised by the driver's dryrun and on real pods)."""

import numpy as np

from libre_tpu.parallel.distributed import (
    broadcast_frame_state,
    initialize,
    is_controller,
    sync_global_devices,
)


def test_single_process_noops():
    initialize(num_processes=1)  # no-op
    assert is_controller()
    tree = {"a": np.arange(3), "uri": "mem://#8,8,8,8"}
    out = broadcast_frame_state(tree)
    assert out is tree  # single process: identity
    sync_global_devices("frame")  # no-op, must not raise
