"""Deformable / modulated KPConv and the Lloyd disposition generator.

Reference semantics (finegrained_kpconv_blocks.py:267-343): an offset
KPConv deforms the kernel disposition per query; with zero offsets the
conv must reduce to the rigid conv (when every neighbor is within the
kernel extent, so the deformable in-range filter is inactive);
modulations at zero offset features are exactly 1.0.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgfusion_tpu.models.kernel_points import spherical_lloyd
from fgfusion_tpu.models.kpconv import KPConvOp


def _case(n=48, k=8, cin=6, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(2, n, 3)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(2, n, cin)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n + 1, size=(2, n, k)).astype(np.int32))
    return pts, x, idx


def _zero_offsets(variables):
    """Zero the offset conv weights -> offsets identically zero."""
    params = jax.tree_util.tree_map(lambda v: v, variables)  # copy
    ow = params["params"]["offset_conv"]["weights"]
    params["params"]["offset_conv"]["weights"] = jnp.zeros_like(ow)
    return params


def _conv(deformable, modulated=False, cin=6, extent=1.0):
    return KPConvOp(num_kernel_points=15, in_dim=cin, out_dim=10,
                    extent=extent, radius=0.3,
                    deformable=deformable, modulated=modulated)


def test_zero_offset_deformable_equals_rigid():
    # extent 1.0 >> cloud scale 0.05: every neighbor is in range of the
    # center kernel point, so the in-range filter never drops anything
    pts, x, idx = _case()
    rigid = _conv(False)
    deform = _conv(True)
    vr = rigid.init(jax.random.PRNGKey(0), pts, pts, idx, x)
    vd = deform.init(jax.random.PRNGKey(0), pts, pts, idx, x)
    # share the main conv weights, zero the offset weights
    vd = _zero_offsets(vd)
    vd["params"]["weights"] = vr["params"]["weights"]
    out_r = rigid.apply(vr, pts, pts, idx, x)
    out_d = deform.apply(vd, pts, pts, idx, x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_d),
                               atol=1e-6)


def test_zero_offset_modulations_are_one():
    pts, x, idx = _case()
    plain = _conv(True, modulated=False)
    mod = _conv(True, modulated=True)
    vp = plain.init(jax.random.PRNGKey(0), pts, pts, idx, x)
    vm = mod.init(jax.random.PRNGKey(0), pts, pts, idx, x)
    vp, vm = _zero_offsets(vp), _zero_offsets(vm)
    vm["params"]["weights"] = vp["params"]["weights"]
    out_p = plain.apply(vp, pts, pts, idx, x)
    out_m = mod.apply(vm, pts, pts, idx, x)
    # 2 * sigmoid(0) == 1 -> identical outputs
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_m),
                               atol=1e-6)


def test_offsets_change_output_and_get_gradients():
    pts, x, idx = _case()
    conv = _conv(True)
    v = conv.init(jax.random.PRNGKey(0), pts, pts, idx, x)
    out = conv.apply(v, pts, pts, idx, x)
    out0 = conv.apply(_zero_offsets(v), pts, pts, idx, x)
    assert float(jnp.max(jnp.abs(out - out0))) > 0  # offsets act

    def loss(params):
        return jnp.sum(conv.apply(params, pts, pts, idx, x) ** 2)

    g = jax.grad(loss)(v)
    g_off = g["params"]["offset_conv"]["weights"]
    assert float(jnp.max(jnp.abs(g_off))) > 0
    assert np.isfinite(np.asarray(g_off)).all()


def test_in_range_filter_drops_far_neighbors():
    # tiny extent: neighbors beyond every deformed kernel point's
    # extent are dropped from the density count -> output differs from
    # the rigid density (which counts any neighbor with feature sum>0)
    pts, x, idx = _case()
    x = jnp.abs(x)  # positive feature sums so rigid counts everything
    deform = _conv(True, extent=0.01)
    rigid = _conv(False, extent=0.01)
    vd = deform.init(jax.random.PRNGKey(0), pts, pts, idx, x)
    vr = rigid.init(jax.random.PRNGKey(0), pts, pts, idx, x)
    vd = _zero_offsets(vd)
    vd["params"]["weights"] = vr["params"]["weights"]
    out_d = deform.apply(vd, pts, pts, idx, x)
    out_r = rigid.apply(vr, pts, pts, idx, x)
    assert float(jnp.max(jnp.abs(out_d - out_r))) > 0


def test_min_d2_sown():
    pts, x, idx = _case()
    conv = _conv(True)
    v = conv.init(jax.random.PRNGKey(0), pts, pts, idx, x)
    out, inter = conv.apply(v, pts, pts, idx, x,
                            mutable=["intermediates"])
    (min_d2,) = inter["intermediates"]["min_d2"]
    assert min_d2.shape == (2, 48, 15)
    assert float(jnp.min(min_d2)) >= 0.0


def test_deformable_encoder_end_to_end():
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.ops import PyramidSpec
    from test_model import TINY_CFG, make_batch

    cfg = dict(TINY_CFG)
    cfg["architecture"] = ["simple", "resnetb_deformable",
                           "resnetb_deformable_strided", "resnetb"]
    spec = PyramidSpec(
        architecture=tuple(cfg["architecture"]),
        first_subsampling_dl=cfg["first_subsampling_dl"],
        conv_radius=cfg["conv_radius"],
        neighborhood_limits=tuple(cfg["neighborhood_limits"]),
        capacities=(128, 64), deform_radius=5.0)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, spec,
                           train=False)
    out = model.apply(variables, batch, spec, train=False)
    assert np.isfinite(np.asarray(out["pose"])).all()


def test_lloyd_disposition():
    pts = spherical_lloyd(45, fixed="center", max_iter=60, approx_n=2000)
    assert pts.shape == (45, 3)
    np.testing.assert_array_equal(pts[0], 0.0)      # center pinned
    r = np.linalg.norm(pts, axis=1)
    assert r.max() <= 1.0 + 1e-5
    # well spread: no two sites collapse
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    d[np.arange(45), np.arange(45)] = np.inf
    assert d.min() > 0.15


def test_lloyd_verticals():
    pts = spherical_lloyd(40, fixed="verticals", max_iter=40,
                          approx_n=1500)
    np.testing.assert_array_equal(pts[0], 0.0)
    np.testing.assert_allclose(pts[1], [0, 0, 2 / 3], atol=1e-6)
    np.testing.assert_allclose(pts[2], [0, 0, -2 / 3], atol=1e-6)
