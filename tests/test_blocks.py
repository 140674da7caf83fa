"""Unit tests for backbone blocks: KPConv op semantics, pooling
helpers, norms, Res2Net fusion, and the (RegTR-unused) decoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgfusion_tpu.models.kpconv import (KPConvOp, batched_gather, closest_pool,
                                        global_average, max_pool)
from fgfusion_tpu.models.norm import MaskedBatchNorm, MaskedInstanceNorm
from fgfusion_tpu.models.res2net import Res2NetFusion


def test_max_pool_shadow_zero():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3) - 6)
    idx = jnp.asarray(np.array([[[0, 1, 4], [4, 4, 4]]], np.int32))  # 4=sentinel
    out = np.asarray(max_pool(x, idx))
    # shadow contributes 0 (reference blocks.py:134: zeros row)
    np.testing.assert_allclose(out[0, 0], np.maximum(np.maximum(
        np.asarray(x)[0, 0], np.asarray(x)[0, 1]), 0.0))
    np.testing.assert_allclose(out[0, 1], 0.0)


def test_closest_pool_takes_first_column():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 2, 3))
    idx = jnp.asarray(np.array([[[1, 0], [2, 2]]], np.int32))
    out = np.asarray(closest_pool(x, idx))
    np.testing.assert_allclose(out[0, 0], np.asarray(x)[0, 1])
    np.testing.assert_allclose(out[0, 1], 0.0)  # sentinel


def test_global_average_masked(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    mask = np.zeros((2, 10), bool)
    mask[:, :5] = True
    out = np.asarray(global_average(x, jnp.asarray(mask)))
    np.testing.assert_allclose(out, np.asarray(x)[:, :5].mean(1), atol=1e-6)


def test_masked_instance_norm_matches_per_cloud_norm(rng):
    x = rng.normal(size=(2, 50, 8)).astype(np.float32) * 3 + 1
    mask = np.ones((2, 50), bool)
    mask[1, 30:] = False
    out = np.asarray(MaskedInstanceNorm().apply({}, jnp.asarray(x),
                                                jnp.asarray(mask)))
    # cloud 1: stats over its 30 valid points only
    v = x[1, :30]
    want = (v - v.mean(0)) / np.sqrt(v.var(0) + 1e-5)
    np.testing.assert_allclose(out[1, :30], want, atol=1e-4)
    assert np.all(out[1, 30:] == 0)


def test_masked_batch_norm_stats_and_running(rng):
    x = rng.normal(size=(2, 20, 4)).astype(np.float32) * 2 + 3
    mask = np.ones((2, 20), bool)
    bn = MaskedBatchNorm(features=4)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask))
    out, mut = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                        use_running_average=False, mutable=["batch_stats"])
    flat = x.reshape(-1, 4)
    want = (flat - flat.mean(0)) / np.sqrt(flat.var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 4), want, atol=1e-3)
    # running stats moved toward the batch stats
    rm = np.asarray(mut["batch_stats"]["mean"])
    np.testing.assert_allclose(rm, 0.1 * flat.mean(0), atol=1e-4)


def test_kpconv_zero_for_isolated_points(rng):
    """A query with only sentinel neighbors must produce zeros."""
    op = KPConvOp(num_kernel_points=15, in_dim=4, out_dim=8, extent=2.0,
                  radius=2.4)
    q = jnp.asarray(rng.normal(size=(1, 3, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    idx = jnp.asarray(np.array([[[0, 1, 2], [5, 5, 5], [1, 5, 5]]], np.int32))
    x = jnp.ones((1, 5, 4), jnp.float32)
    v = op.init(jax.random.PRNGKey(0), q, s, idx, x)
    out = np.asarray(op.apply(v, q, s, idx, x))
    assert np.all(out[0, 1] == 0.0)        # all-sentinel row
    assert np.any(out[0, 0] != 0.0)


def test_kpconv_density_normalization(rng):
    """Doubling the number of identical neighbors must not change the
    output (density normalization, reference blocks.py:396-399)."""
    op = KPConvOp(num_kernel_points=15, in_dim=4, out_dim=8, extent=1.0,
                  radius=1.2)
    q = jnp.zeros((1, 1, 3))
    s = jnp.asarray(np.tile(rng.normal(size=(1, 1, 3)).astype(np.float32) * 0.1,
                            (1, 4, 1)))
    x = jnp.ones((1, 4, 4), jnp.float32)
    idx2 = jnp.asarray(np.array([[[0, 1, 4, 4]]], np.int32))
    idx4 = jnp.asarray(np.array([[[0, 1, 2, 3]]], np.int32))
    v = op.init(jax.random.PRNGKey(0), q, s, idx2, x)
    out2 = np.asarray(op.apply(v, q, s, idx2, x))
    out4 = np.asarray(op.apply(v, q, s, idx4, x))
    np.testing.assert_allclose(out2, out4, rtol=1e-5)


def test_res2net_shapes_and_residual(rng):
    mod = Res2NetFusion(in_dim=32, out_dim=128)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
    mask = jnp.ones((2, 16), bool)
    v = mod.init(jax.random.PRNGKey(0), x, mask, train=True)
    out, _ = mod.apply(v, x, mask, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 128)
    assert np.all(np.asarray(out) >= 0)  # final ReLU
    # width = floor(128 * 14/64) = 28, scale 8 -> conv1 to 224
    assert v["params"]["conv1"]["kernel"].shape == (32, 224)
    assert v["params"]["conv_0"]["kernel"].shape == (28, 28)
    assert v["params"]["down"]["kernel"].shape == (32, 128)


def test_decoder_runs(rng):
    """KPFDecoder on a small encoder/decoder architecture."""
    from fgfusion_tpu.models.backbone import KPFDecoder, KPFEncoder
    from fgfusion_tpu.ops import PyramidSpec, build_pyramid

    cfg = dict(
        architecture=["simple", "resnetb_strided", "resnetb",
                      "nearest_upsample", "unary"],
        first_subsampling_dl=0.08, conv_radius=2.5,
        neighborhood_limits=[10, 10], num_kernel_points=15,
        KP_extent=2.0, KP_influence="linear", aggregation_mode="sum",
        fixed_kernel_points="center", in_feats_dim=1, in_points_dim=3,
        first_feats_dim=32, use_batch_norm=True, batch_norm_momentum=0.02,
        modulated=False,
    )
    spec = PyramidSpec(
        architecture=tuple(cfg["architecture"]),
        first_subsampling_dl=0.08, conv_radius=2.5,
        neighborhood_limits=(10, 10), capacities=(128, 64),
        need_upsamples=True)
    pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32) * 0.5)
    mask = jnp.ones((2, 128), bool)
    meta = build_pyramid(pts, mask, spec)

    enc = KPFEncoder(cfg)
    x0 = jnp.ones((2, 128, 1))
    v_enc = enc.init(jax.random.PRNGKey(0), x0, meta, train=False)
    feats, skips = enc.apply(v_enc, x0, meta, train=False,
                             mutable=["batch_stats"])[0]

    dec = KPFDecoder(cfg)
    v_dec = dec.init(jax.random.PRNGKey(1), feats, skips, meta, train=False)
    out, _ = dec.apply(v_dec, feats, skips, meta, train=False)
    assert out.shape[1] == 128  # back at full resolution


def test_kpconv_raw_gather_bit_exact_vs_masked_path(rng):
    """The fused path's raw clipped gather (invalid neighbors masked
    only through zeroed influence weights) must equal the
    influence-precomputed path, which still uses the masked gather —
    bit-exact, including sentinel neighbors and 1e6-padded points."""
    from fgfusion_tpu.models.kpconv import kpconv_influence

    c, ns, nq, k, cin, cout = 2, 300, 300, 17, 24, 40
    s = rng.normal(size=(c, ns, 3)).astype(np.float32)
    s[:, -20:] = 1e6                      # padded points
    q = s[:, :nq]
    x = rng.normal(size=(c, ns, cin)).astype(np.float32)
    idx = rng.integers(0, ns + 1, size=(c, nq, k)).astype(np.int32)

    op = KPConvOp(num_kernel_points=15, in_dim=cin, out_dim=cout,
                  extent=0.12, radius=0.1)
    v = op.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(s),
                jnp.asarray(idx), jnp.asarray(x))
    out_fused = op.apply(v, jnp.asarray(q), jnp.asarray(s),
                         jnp.asarray(idx), jnp.asarray(x))
    infl = kpconv_influence(jnp.asarray(q), jnp.asarray(s),
                            jnp.asarray(idx), op.bind(v).kernel_pts, 0.12)
    out_ref = op.apply(v, jnp.asarray(q), jnp.asarray(s),
                       jnp.asarray(idx), jnp.asarray(x), infl)
    assert float(jnp.max(jnp.abs(out_fused - out_ref))) == 0.0
