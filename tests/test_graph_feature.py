"""Tests for ops/graph_feature.py (PoinTr kNN grouping parity,
reference models/transformer/PoinTr_knn_trans.py) and the
KPConv_MSRes block (reference kpconv_res2net.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from fgfusion_tpu.ops.graph_feature import (get_graph_feature, knn_point,
                                            square_distance)


def test_square_distance_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 7, 3)).astype(np.float32)
    b = rng.normal(size=(2, 5, 3)).astype(np.float32)
    want = np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)
    got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_knn_point_bruteforce_and_mask():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(1, 20, 3)).astype(np.float32)
    q = rng.normal(size=(1, 6, 3)).astype(np.float32)
    mask = np.ones((1, 20), bool)
    mask[0, 15:] = False
    idx = np.asarray(knn_point(4, jnp.asarray(xyz), jnp.asarray(q),
                               jnp.asarray(mask)))
    d = np.sum((q[0][:, None] - xyz[0][None]) ** 2, axis=-1)
    d[:, ~mask[0]] = np.inf
    want = np.argsort(d, axis=1)[:, :4]
    # top_k ties may reorder; compare as sets per query
    for s in range(6):
        assert set(idx[0, s]) == set(want[s])
        assert all(i < 15 for i in idx[0, s])  # masked rows never chosen


def test_get_graph_feature_values():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 10, 4)).astype(np.float32)
    q = rng.normal(size=(1, 3, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(1, 3, 5)).astype(np.int32)
    out = np.asarray(get_graph_feature(jnp.asarray(x), jnp.asarray(idx),
                                       jnp.asarray(q)))
    assert out.shape == (1, 3, 5, 8)
    for s in range(3):
        for j in range(5):
            np.testing.assert_allclose(out[0, s, j, :4],
                                       x[0, idx[0, s, j]] - q[0, s], atol=1e-6)
            np.testing.assert_allclose(out[0, s, j, 4:], q[0, s], atol=1e-6)


def _msres_setup(rng, c=2, nq=24, ns=32, cin=8, k=6):
    q = rng.normal(size=(c, nq, 3)).astype(np.float32)
    s = rng.normal(size=(c, ns, 3)).astype(np.float32)
    idx = rng.integers(0, ns + 1, size=(c, nq, k)).astype(np.int32)
    x = rng.normal(size=(c, ns, cin)).astype(np.float32)
    mask = np.ones((c, nq), bool)
    return q, s, idx, x, mask


def test_kpconv_msres_shapes_and_finite():
    from fgfusion_tpu.models.kpconv_msres import KPConvMSRes
    rng = np.random.default_rng(3)
    q, s, idx, x, mask = _msres_setup(rng)
    cfg = dict(KP_extent=1.2, conv_radius=2.5, fixed_kernel_points="center",
               KP_influence="linear", aggregation_mode="sum")
    blk = KPConvMSRes(block_name="msres", in_dim=8, out_dim=16,
                      radius=0.1, cfg=cfg)
    vars_ = blk.init(jax.random.PRNGKey(0), q, s, idx, x, mask, train=False)
    out = blk.apply(vars_, q, s, idx, x, mask, train=False)
    assert out.shape == (2, 24, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    # dead upstream params are NOT created (kpconv_res2net.py:44-48)
    names = set(vars_["params"].keys())
    assert "mini2mid_linear" not in names and "midmini_norm" not in names
    # the two kernel scales exist
    assert {"kpconv_mini", "kpconv_mid", "midmini_linear",
            "final_conv"} <= names
    p_mini = vars_["params"]["kpconv_mini"]["weights"]
    p_mid = vars_["params"]["kpconv_mid"]["weights"]
    assert p_mini.shape[0] == 7 and p_mid.shape[0] == 13
