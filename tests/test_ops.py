"""Golden-value tests for the device geometry ops against brute-force
numpy implementations of the reference C++ semantics
(grid_subsampling.cpp:5-106, neighbors.cpp:5-56)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgfusion_tpu.ops import grid_subsample, radius_knn, build_pyramid, PyramidSpec
from fgfusion_tpu.ops.neighbors import gather_neighbors


def ref_grid_subsample(points, cell):
    """Numpy mirror of the C++ barycenter voxel subsample."""
    origin = np.floor(points.min(axis=0) / cell) * cell
    ijk = np.floor((points - origin) / cell).astype(np.int64)
    voxels = {}
    for p, key in zip(points, map(tuple, ijk)):
        voxels.setdefault(key, []).append(p)
    return {k: np.mean(v, axis=0) for k, v in voxels.items()}


def ref_radius_neighbors(queries, supports, radius):
    d = np.linalg.norm(queries[:, None] - supports[None], axis=-1)
    return [set(np.nonzero(row < radius)[0]) for row in d]


def test_grid_subsample_matches_reference_semantics(rng):
    n, cap = 300, 256
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    out_p, out_m, n_vox = jax.jit(grid_subsample, static_argnums=(2, 3))(
        jnp.asarray(pts), jnp.asarray(mask), 0.5, cap)
    out_p, out_m = np.asarray(out_p), np.asarray(out_m)

    ref = ref_grid_subsample(pts, 0.5)
    assert int(n_vox) == len(ref)
    assert out_m.sum() == len(ref)

    got = sorted(map(tuple, np.round(out_p[out_m], 5)))
    want = sorted(map(tuple, np.round(np.stack(list(ref.values())), 5)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_grid_subsample_ignores_padding(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    mask = np.ones(100, bool)
    mask[60:] = False
    # padded garbage that would otherwise dominate
    pts[60:] = rng.normal(size=(40, 3)) * 100

    out_p, out_m, n_vox = grid_subsample(jnp.asarray(pts), jnp.asarray(mask), 0.5, 128)
    ref = ref_grid_subsample(pts[:60], 0.5)
    assert int(np.asarray(out_m).sum()) == len(ref)
    assert int(n_vox) == len(ref)
    # invalid slots carry the 1e6 sentinel
    assert np.all(np.asarray(out_p)[~np.asarray(out_m)] == 1e6)


def test_grid_subsample_overflow_detection(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32) * 50  # ~64 distinct voxels
    mask = np.ones(64, bool)
    _, out_m, n_vox = grid_subsample(jnp.asarray(pts), jnp.asarray(mask), 0.5, 16)
    assert int(n_vox) > 16          # true count reported
    assert np.asarray(out_m).sum() <= 16  # capacity respected


def test_grid_subsample_overflow_truncates_cleanly(rng):
    """On capacity overflow, every KEPT voxel must still be a true
    barycenter of exactly its own points (C++ parity,
    grid_subsampling.cpp:85-95) — the dropped tail must not be absorbed
    into the last kept voxel's mean."""
    n, cap, cell = 400, 16, 0.5
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 20  # >> cap voxels
    mask = np.ones(n, bool)
    out_p, out_m, n_vox = grid_subsample(
        jnp.asarray(pts), jnp.asarray(mask), cell, cap)
    out_p, out_m = np.asarray(out_p), np.asarray(out_m)
    assert int(n_vox) > cap and out_m.sum() == cap

    # reference barycenters keyed by voxel coordinate, in the same
    # (z, y, x) lexicographic emit order as the device op
    ref = ref_grid_subsample(pts, cell)
    keys = sorted(ref, key=lambda k: (k[2], k[1], k[0]))
    want = np.stack([ref[k] for k in keys[:cap]])
    np.testing.assert_allclose(out_p[out_m], want, atol=1e-4)


def test_radius_knn_matches_bruteforce(rng):
    nq, ns, k, radius = 150, 200, 12, 0.6
    q = rng.normal(size=(nq, 3)).astype(np.float32)
    s = rng.normal(size=(ns, 3)).astype(np.float32)
    qm = np.ones(nq, bool)
    sm = np.ones(ns, bool)
    idx = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(qm),
                                jnp.asarray(s), jnp.asarray(sm),
                                radius=radius, k=k, chunk=64))
    ref = ref_radius_neighbors(q, s, radius)
    d = np.linalg.norm(q[:, None] - s[None], axis=-1)
    for i in range(nq):
        got = [j for j in idx[i] if j < ns]
        # no duplicates, all within radius
        assert len(set(got)) == len(got)
        assert all(d[i, j] < radius for j in got)
        if len(ref[i]) <= k:
            assert set(got) == ref[i]
        else:
            # the k nearest of the in-radius set
            nearest = set(np.argsort(d[i])[:k])
            assert set(got) == nearest
        # sorted ascending by distance
        dist_list = [d[i, j] for j in got]
        assert dist_list == sorted(dist_list)


def test_radius_knn_masks(rng):
    q = rng.normal(size=(20, 3)).astype(np.float32)
    s = q.copy()
    qm = np.ones(20, bool); qm[10:] = False
    sm = np.ones(20, bool); sm[5:] = False
    idx = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(qm),
                                jnp.asarray(s), jnp.asarray(sm),
                                radius=10.0, k=8, chunk=16))
    assert np.all(idx[10:] == 20)          # invalid queries -> all sentinel
    real = idx[idx < 20]
    assert np.all(real < 5)                # only valid supports returned


def test_gather_neighbors_sentinel():
    vals = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    idx = jnp.array([[0, 3, 4], [4, 4, 4]], dtype=jnp.int32)  # 4 = sentinel
    out = np.asarray(gather_neighbors(vals, idx, 0.0))
    np.testing.assert_allclose(out[0, 0], [0, 1, 2])
    np.testing.assert_allclose(out[0, 2], 0.0)
    np.testing.assert_allclose(out[1], 0.0)


@pytest.fixture
def small_spec():
    return PyramidSpec(
        architecture=("simple", "resnetb", "resnetb_strided", "resnetb",
                      "resnetb_strided", "resnetb"),
        first_subsampling_dl=0.06,
        conv_radius=2.5,
        neighborhood_limits=(16, 16, 16),
        capacities=(256, 128, 64),
        need_upsamples=True,
    )


def test_pyramid_shapes_and_invariants(rng, small_spec):
    C = 4
    pts = rng.normal(size=(C, 256, 3)).astype(np.float32) * 0.5
    mask = np.ones((C, 256), bool)
    mask[:, 200:] = False
    pts[:, 200:] = 1e6

    meta = jax.jit(build_pyramid, static_argnums=2)(
        jnp.asarray(pts), jnp.asarray(mask), small_spec)

    assert len(meta["points"]) == 3
    assert len(meta["neighbors"]) == 3
    assert len(meta["pools"]) == 2

    for l in range(3):
        nl = small_spec.capacities[l]
        assert meta["points"][l].shape == (C, nl, 3)
        assert meta["neighbors"][l].shape == (C, nl, small_spec.neighborhood_limits[l])
        # index bounds: valid entries < nl, sentinel == nl
        nb = np.asarray(meta["neighbors"][l])
        assert nb.max() <= nl and nb.min() >= 0
        # masked-out queries must have all-sentinel rows
        m = np.asarray(meta["masks"][l])
        assert np.all(nb[~m] == nl)
        # each valid point is its own neighbor (distance 0 first column)
        assert np.all(nb[m][:, 0] == np.nonzero(m)[1])

    for l in range(2):
        pool = np.asarray(meta["pools"][l])
        assert pool.shape == (C, small_spec.capacities[l + 1],
                              small_spec.neighborhood_limits[l])
        assert pool.max() <= small_spec.capacities[l]

    # point counts strictly decrease
    counts = [int(np.asarray(m).sum()) for m in meta["masks"]]
    assert counts[0] > counts[1] > counts[2]


def test_pyramid_monotone_under_jit_vs_eager(rng, small_spec):
    pts = rng.normal(size=(2, 256, 3)).astype(np.float32)
    mask = np.ones((2, 256), bool)
    eager = build_pyramid(jnp.asarray(pts), jnp.asarray(mask), small_spec)
    jitted = jax.jit(build_pyramid, static_argnums=2)(
        jnp.asarray(pts), jnp.asarray(mask), small_spec)
    for a, b in zip(jax.tree.leaves(eager), jax.tree.leaves(jitted)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_compute_overlaps_pyramid(rng, small_spec):
    from fgfusion_tpu.ops.kpconv_meta import compute_overlaps
    C, n0 = 2, 256
    pts = rng.normal(size=(C, n0, 3)).astype(np.float32) * 0.5
    mask = np.ones((C, n0), bool)
    meta = build_pyramid(jnp.asarray(pts), jnp.asarray(mask), small_spec)

    # all-ones overlap stays (approximately) one everywhere
    ones = jnp.ones((C, n0), jnp.float32)
    pyr = compute_overlaps(ones, meta)
    assert len(pyr) == 3
    for lvl, ov in enumerate(pyr):
        m = np.asarray(meta["masks"][lvl])
        np.testing.assert_allclose(np.asarray(ov)[m], 1.0, atol=1e-6)
        assert np.all(np.asarray(ov)[~m] == 0.0)

    # zero overlap propagates zeros
    pyr0 = compute_overlaps(jnp.zeros((C, n0), jnp.float32), meta)
    for ov in pyr0:
        np.testing.assert_allclose(np.asarray(ov), 0.0, atol=1e-6)

    # spatially-split overlap yields intermediate values at boundaries
    half = (pts[..., 0] > 0).astype(np.float32)
    pyr_h = compute_overlaps(jnp.asarray(half), meta)
    v = np.asarray(pyr_h[-1])[np.asarray(meta["masks"][-1])]
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert 0.2 < v.mean() < 0.8


def test_radius_knn_approx_recall(rng):
    """The approx path must recover nearly all true neighbors (it is
    the production default on TPU; jax.lax.approx_max_k recall ~0.95)."""
    n, k, radius = 2048, 24, 0.25
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    m = np.ones(n, bool)
    exact = np.asarray(radius_knn(jnp.asarray(pts), jnp.asarray(m),
                                  jnp.asarray(pts), jnp.asarray(m),
                                  radius=radius, k=k, approx=False))
    approx = np.asarray(radius_knn(jnp.asarray(pts), jnp.asarray(m),
                                   jnp.asarray(pts), jnp.asarray(m),
                                   radius=radius, k=k, approx=True))
    hits = total = 0
    for i in range(n):
        e = set(j for j in exact[i] if j < n)
        a = set(j for j in approx[i] if j < n)
        total += len(e)
        hits += len(e & a)
        # approx never invents out-of-radius neighbors
        d = np.linalg.norm(pts[i] - pts[list(a)], axis=1) if a else []
        assert all(x < radius for x in d)
    recall = hits / max(total, 1)
    assert recall > 0.9, f"approx recall too low: {recall:.3f}"


def test_banded_knn_exact_when_window_covers(rng):
    """With the window wide enough to cover every true neighborhood,
    the banded search must be index-identical to the full exact
    search on the same sorted arrays."""
    from fgfusion_tpu.ops.sorting import cloud_bbox, sort_cloud_with_codes

    # 1D cloud: Morton rank distance is bounded by density * radius,
    # so a W=256 window provably covers every radius-0.02 neighborhood
    # (in 3D, Morton boundary-plane crossings make worst-case rank
    # distance unbounded — that case is the recall test below).
    n, k, radius = 1024, 12, 0.02
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(size=n).astype(np.float32)
    m = np.ones(n, bool)
    lo, ext = cloud_bbox(jnp.asarray(pts), jnp.asarray(m))
    p, mm, _, codes = sort_cloud_with_codes(
        jnp.asarray(pts), jnp.asarray(m), lo, ext)
    full = np.asarray(radius_knn(p, mm, p, mm, radius=radius, k=k))
    band = np.asarray(radius_knn(p, mm, p, mm, radius=radius, k=k,
                                 band=256, band_chunk=64,
                                 q_codes=codes, s_codes=codes))
    # compare as sets per query (top-k tie order may differ)
    for i in range(n):
        assert set(full[i].tolist()) == set(band[i].tolist())


def test_banded_knn_recall_and_validity(rng):
    """At a realistic window ratio (W = Ns/2 on a volumetric blob —
    the worst case for Morton locality) the banded search keeps nearly
    all true neighbors and never returns an out-of-radius or invalid
    support."""
    from fgfusion_tpu.ops.sorting import cloud_bbox, sort_cloud_with_codes

    n, k, radius = 2048, 16, 0.12
    pts = rng.uniform(size=(n, 3)).astype(np.float32)
    m = np.ones(n, bool)
    m[-200:] = False
    pts[-200:] = 1e6
    lo, ext = cloud_bbox(jnp.asarray(pts), jnp.asarray(m))
    p, mm, _, codes = sort_cloud_with_codes(
        jnp.asarray(pts), jnp.asarray(m), lo, ext)
    pn, mn = np.asarray(p), np.asarray(mm)
    full = np.asarray(radius_knn(p, mm, p, mm, radius=radius, k=k))
    band = np.asarray(radius_knn(p, mm, p, mm, radius=radius, k=k,
                                 band=1024, band_chunk=256,
                                 q_codes=codes, s_codes=codes))
    assert np.all(band[~mn] == n)          # invalid queries -> sentinel
    hits = tot = 0
    for i in np.nonzero(mn)[0]:
        e = set(j for j in full[i] if j < n)
        b = set(j for j in band[i] if j < n)
        tot += len(e)
        hits += len(e & b)
        for j in b:
            assert mn[j]                   # only valid supports
            assert np.linalg.norm(pn[i] - pn[j]) < radius
    assert hits / max(tot, 1) > 0.95, hits / max(tot, 1)


def test_banded_pyramid_runs_and_matches(rng):
    """build_pyramid with knn_band_frac: every level Morton-sorted
    (codes returned, ascending with padding last), and each table
    recovers nearly all of the full-width search's neighbors computed
    on the SAME sorted arrays — across levels, i.e. the cross-level
    rank alignment of the shared Morton frame works."""
    C, n0 = 2, 4096
    pts = (rng.normal(size=(C, n0, 3)) * 0.5).astype(np.float32)
    mask = np.ones((C, n0), bool)
    mask[0, -300:] = False
    pts[0, -300:] = 1e6
    spec = PyramidSpec(
        architecture=("simple", "resnetb", "resnetb_strided", "resnetb",
                      "resnetb_strided", "resnetb"),
        first_subsampling_dl=0.06, conv_radius=2.5,
        neighborhood_limits=(16, 16, 16), capacities=(n0, 1024, 256),
        knn_band_frac=0.34)
    meta = jax.jit(build_pyramid, static_argnums=2)(
        jnp.asarray(pts), jnp.asarray(mask), spec)
    assert "order" in meta and len(meta["codes"]) == 3
    radii = spec.level_radii()
    for lvl, (tbl, is_pool) in enumerate(
            [(meta["neighbors"][0], False), (meta["pools"][0], True)]):
        s, sm = meta["points"][0], meta["masks"][0]
        q, qm = (meta["points"][1], meta["masks"][1]) if is_pool else (s, sm)
        codes = np.asarray(meta["codes"][0])
        for ci in range(C):
            assert np.all(np.diff(codes[ci]) >= 0)   # sorted ascending
            full = np.asarray(radius_knn(q[ci], qm[ci], s[ci], sm[ci],
                                         radius=radii[0], k=16))
            got = np.asarray(tbl[ci])
            hits = tot = 0
            for i in range(got.shape[0]):
                e = set(j for j in full[i] if j < n0)
                b = set(j for j in got[i] if j < n0)
                tot += len(e)
                hits += len(e & b)
            # 0.93 floor: a dense volumetric blob is the worst case
            # for Morton locality (the real scan workload measures
            # higher — tools/band_recall.py, DESIGN.md §13)
            assert hits / max(tot, 1) > 0.93, (is_pool, ci, hits / tot)
