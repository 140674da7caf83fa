"""Spatial sorting + paged-gather wiring through the full model.

1. Morton order: valid points first-by-code, padding last, permutation.
2. With identical (pre-sorted) level-0 order, the paged gather path is
   BIT-EXACT vs the take_along_axis path (only the gather mechanism
   differs; interpret-mode kernel on CPU).
3. With sorting enabled on unsorted input, forward/loss are equivalent
   within float tolerance (the pyramid reductions reassociate).
4. Page-list capacities sized per measurement never overflow.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fgfusion_tpu.models import get_model
from fgfusion_tpu.ops.sorting import morton_code, morton_order, sort_cloud

from test_model import TINY_CFG, SPEC, make_batch


def _specs():
    sorted_spec = dataclasses.replace(SPEC, spatial_sort=True)
    paged_spec = dataclasses.replace(SPEC, spatial_sort=True,
                                     paged_p_max=(4, 2))
    return sorted_spec, paged_spec


def test_morton_order_properties():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(96, 3)).astype(np.float32))
    mask = jnp.asarray(np.arange(96) < 70)
    pts = jnp.where(mask[:, None], pts, 1e6)
    order = np.asarray(morton_order(pts, mask))
    assert sorted(order.tolist()) == list(range(96))
    m = np.asarray(mask)[order]
    assert m[:70].all() and not m[70:].any()     # padding sorts last
    codes = np.asarray(morton_code(pts, mask))[order[:70]]
    assert (np.diff(codes) >= 0).all()           # ascending codes


def test_paged_path_bit_exact_given_same_order():
    sorted_spec, paged_spec = _specs()
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    model = get_model("finegrained_regtr.RegTR")(cfg=TINY_CFG)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           sorted_spec, train=False)

    out_a = model.apply(variables, batch, sorted_spec, train=False)
    out_b = model.apply(variables, batch, paged_spec, train=False)
    assert int(jnp.sum(out_b["n_page_overflow"])) == 0
    for k in ("pose", "src_feat", "src_overlap", "src_kp_warped"):
        np.testing.assert_array_equal(np.asarray(out_a[k]),
                                      np.asarray(out_b[k]), err_msg=k)


def test_sorted_forward_equivalent_to_unsorted():
    sorted_spec, _ = _specs()
    rng = np.random.default_rng(2)
    batch = make_batch(rng)
    model = get_model("finegrained_regtr.RegTR")(cfg=TINY_CFG)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           SPEC, train=False,
                           method=model.forward_with_loss)

    out_u = model.apply(variables, batch, SPEC, train=False)
    out_s = model.apply(variables, batch, sorted_spec, train=False)
    # same registration, point sets merely reordered: the pose and the
    # loss must agree to float tolerance
    np.testing.assert_allclose(np.asarray(out_u["pose"]),
                               np.asarray(out_s["pose"]), atol=2e-3)
    _, loss_u = model.apply(variables, batch, SPEC, train=False,
                            method=model.forward_with_loss)
    _, loss_s = model.apply(variables, batch, sorted_spec, train=False,
                            method=model.forward_with_loss)
    np.testing.assert_allclose(float(loss_u["total"]),
                               float(loss_s["total"]), rtol=1e-3)


def test_sort_cloud_consistency():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    mask = jnp.asarray(np.arange(64) < 50)
    sp, sm, order = sort_cloud(pts, mask)
    np.testing.assert_array_equal(np.asarray(sp),
                                  np.asarray(pts)[np.asarray(order)])
    np.testing.assert_array_equal(np.asarray(sm),
                                  np.asarray(mask)[np.asarray(order)])
