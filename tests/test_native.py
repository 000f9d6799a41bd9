"""Native host-op tests (C++ via ctypes vs numpy oracles)."""

import numpy as np
import pytest

from cmr_agent_tpu.native import get_fast_host_ops
from cmr_agent_tpu.data.pipeline import (farthest_point_sample_np,
                                         nearest_assign_np)


def test_native_matches_numpy():
    fps, nn = get_fast_host_ops()
    if fps is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2048, 3)).astype(np.float32)
    a = fps(np.random.default_rng(1), pts, 128)
    b = farthest_point_sample_np(np.random.default_rng(1), pts, 128)
    np.testing.assert_array_equal(a, b)

    centers = pts[a]
    x = nn(pts, centers)
    y = nearest_assign_np(pts, centers, block=512)
    np.testing.assert_array_equal(x, y)
