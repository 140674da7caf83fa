"""Fused Pallas kNN (ops/knn_pallas.py) vs the exact search: candidate
sheet correctness, end-to-end radius_knn(fused=True) recall, radius /
sentinel / mask / ordering invariants, vmap batching (interpret mode
on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgfusion_tpu.ops.knn_pallas import knn_candidates, seg_for
from fgfusion_tpu.ops.neighbors import radius_knn


def _cloud(n, seed, scale=0.3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * scale)


def test_candidates_contain_segment_minima():
    q, s = _cloud(64, 0), _cloud(256, 1)
    s2 = jnp.sum(s * s, axis=-1)
    d2_c, idx_c = knn_candidates(q, s, s2, seg=4)
    assert d2_c.shape == (64, 64) and idx_c.shape == (64, 64)
    # brute force check: candidate j of query i is the min of segment j
    d2_full = np.asarray(
        jnp.sum((q[:, None] - s[None]) ** 2, axis=-1))       # (64, 256)
    seg_view = d2_full.reshape(64, 64, 4)
    np.testing.assert_allclose(np.asarray(d2_c), seg_view.min(-1),
                               rtol=1e-5, atol=1e-5)
    arg = seg_view.argmin(-1) + np.arange(64)[None] * 4
    np.testing.assert_array_equal(np.asarray(idx_c), arg)


def test_fused_radius_knn_high_recall():
    n = 2048
    q = s = _cloud(n, 2)
    mask = jnp.ones((n,), bool)
    k, radius = 16, 0.08
    exact = np.asarray(radius_knn(q, mask, s, mask, radius=radius, k=k))
    fused = np.asarray(radius_knn(q, mask, s, mask, radius=radius, k=k,
                                  approx=True, fused=True))
    # recall over real (non-sentinel) neighbors
    hits = total = 0
    for i in range(n):
        e = set(exact[i][exact[i] < n])
        f = set(fused[i][fused[i] < n])
        hits += len(e & f)
        total += len(e)
    assert total > 0
    assert hits / total > 0.93


def test_fused_invariants():
    rng = np.random.default_rng(3)
    nq, ns = 512, 1024
    q, s = _cloud(nq, 4), _cloud(ns, 5)
    q_mask = jnp.asarray(np.arange(nq) < 400)
    s_mask = jnp.asarray(np.arange(ns) < 900)
    q = jnp.where(q_mask[:, None], q, 1e6)
    s = jnp.where(s_mask[:, None], s, 1e6)
    k, radius = 12, 0.1
    idx = np.asarray(radius_knn(q, q_mask, s, s_mask, radius=radius, k=k,
                                approx=True, fused=True))
    d2_full = np.asarray(jnp.sum((q[:, None] - s[None]) ** 2, axis=-1))
    for i in range(nq):
        real = idx[i][idx[i] < ns]
        if not np.asarray(q_mask)[i]:
            assert (idx[i] == ns).all()      # masked query -> sentinel
            continue
        assert (real < 900).all()            # never an invalid support
        d = d2_full[i, real]
        assert (d < radius * radius + 1e-6).all()   # radius respected
        assert (np.diff(d) >= -1e-6).all()   # ascending distance


def test_fused_under_vmap_matches_single():
    q = jnp.stack([_cloud(256, 6), _cloud(256, 7)])
    s = jnp.stack([_cloud(512, 8), _cloud(512, 9)])
    qm = jnp.ones((2, 256), bool)
    sm = jnp.ones((2, 512), bool)
    f = jax.vmap(lambda a, b, c, d: radius_knn(
        a, b, c, d, radius=0.15, k=8, approx=True, fused=True))
    batched = np.asarray(f(q, qm, s, sm))
    for c in range(2):
        single = np.asarray(radius_knn(q[c], qm[c], s[c], sm[c],
                                       radius=0.15, k=8, approx=True,
                                       fused=True))
        np.testing.assert_array_equal(batched[c], single)


def test_small_support_falls_back():
    # k exceeds the candidate budget -> exact approx path, same result
    q = s = _cloud(64, 10)
    mask = jnp.ones((64,), bool)
    out_f = np.asarray(radius_knn(q, mask, s, mask, radius=1.0, k=32,
                                  approx=True, fused=True))
    assert out_f.shape == (64, 32)
    assert (out_f < 65).all()


def test_seg_for_divides():
    for ns in (12288, 4096, 1536, 576, 200, 64):
        assert ns % seg_for(ns) == 0


def test_pyramid_with_fused_knn():
    import dataclasses
    from fgfusion_tpu.ops.pyramid import build_pyramid
    from test_model import SPEC
    spec = dataclasses.replace(SPEC, approx_knn=True, fused_knn=True)
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32) * 0.3)
    mask = jnp.asarray(np.tile(np.arange(128) < 100, (2, 1)))
    pts = jnp.where(mask[..., None], pts, 1e6)
    meta = build_pyramid(pts, mask, spec)
    for lvl, idx in enumerate(meta["neighbors"]):
        ns = meta["points"][lvl].shape[1]
        assert (np.asarray(idx) <= ns).all()


def test_tile_q_obeys_mosaic_lane_constraint():
    """Real-TPU lowering requires the query-tile (lane) block dim to be
    a multiple of 128 or the full Nq (round-2 incident: tile_q=192 at
    Nq=576 failed pallas lowering on device while interpret-mode tests
    passed)."""
    import jax
    import numpy as np
    from fgfusion_tpu.ops.knn_pallas import knn_candidates, seg_for

    for nq in (576, 768, 12288, 104, 4608):
        # reproduce the choice logic by tracing at this shape
        q = np.zeros((nq, 3), np.float32)
        s = np.zeros((1024, 3), np.float32)
        s2 = np.zeros((1024,), np.float32)
        # jit-trace only (abstract): verifies the block spec passes the
        # shape policy without running the kernel
        jax.eval_shape(lambda a, b, c: knn_candidates(a, b, c), q, s, s2)
        tile_q = next((c for c in (256, 128) if nq % c == 0), nq)
        assert tile_q % 128 == 0 or tile_q == nq
