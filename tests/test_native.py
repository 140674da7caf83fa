"""Native (C++/ctypes) host geometry vs numpy/scipy references."""
import numpy as np
import pytest
from scipy.spatial import cKDTree

from fgfusion_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_grid_subsample_matches_numpy(rng, lib_ok):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    out = native.grid_subsample(pts, 0.4)

    origin = np.floor(pts.min(0) / 0.4) * 0.4
    ijk = np.floor((pts - origin) / 0.4).astype(np.int64)
    uniq = np.unique(ijk, axis=0)
    assert out.shape[0] == uniq.shape[0]

    # every barycenter matches a voxel mean
    want = {}
    for p, key in zip(pts, map(tuple, ijk)):
        want.setdefault(key, []).append(p)
    want_means = sorted(tuple(np.round(np.mean(v, 0), 4)) for v in want.values())
    got_means = sorted(tuple(r) for r in np.round(out, 4))
    np.testing.assert_allclose(got_means, want_means, atol=1e-3)


def test_native_radius_neighbors_matches_kdtree(rng, lib_ok):
    q = rng.normal(size=(300, 3)).astype(np.float32)
    s = rng.normal(size=(400, 3)).astype(np.float32)
    radius, k = 0.5, 10
    idx = native.radius_neighbors(q, s, radius, k)
    assert idx.shape == (300, k)

    tree = cKDTree(s)
    d = np.linalg.norm(q[:, None] - s[None], axis=-1)
    for i in range(300):
        got = [j for j in idx[i] if j < 400]
        ref = set(tree.query_ball_point(q[i], radius - 1e-6))
        big_ref = set(tree.query_ball_point(q[i], radius + 1e-6))
        if len(big_ref) <= k:
            assert ref <= set(got) <= big_ref
        # sorted ascending
        dd = [d[i, j] for j in got]
        assert dd == sorted(dd)


def test_native_nearest_within_radius(rng, lib_ok):
    q = rng.normal(size=(200, 3)).astype(np.float32)
    s = rng.normal(size=(200, 3)).astype(np.float32)
    idx = native.nearest_within_radius(q, s, 0.3)
    tree = cKDTree(s)
    dist, ref = tree.query(q, k=1, distance_upper_bound=0.3)
    ref = np.where(np.isfinite(dist), ref, -1)
    np.testing.assert_array_equal(idx, ref)


def test_native_speed_sanity(rng, lib_ok):
    """The native path should handle a 3DMatch-scale search quickly."""
    import time
    q = rng.normal(size=(20000, 3)).astype(np.float32) * 3
    t0 = time.perf_counter()
    idx = native.radius_neighbors(q, q, 0.0625, 40)
    dt = time.perf_counter() - t0
    assert idx.shape == (20000, 40)
    assert dt < 2.0, f"native radius search too slow: {dt:.2f}s"
