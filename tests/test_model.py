"""End-to-end model tests on a tiny ModelNet-like config: init, jitted
forward, loss, gradient flow, and pose recovery sanity on easy data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgfusion_tpu.geometry import se3_np
from fgfusion_tpu.models import get_model
from fgfusion_tpu.ops import PyramidSpec

TINY_CFG = dict(
    # kpconv
    num_layers=2,
    neighborhood_limits=[12, 12],
    aggregation_mode="sum",
    first_subsampling_dl=0.06,
    first_feats_dim=32,
    fixed_kernel_points="center",
    in_feats_dim=1,
    in_points_dim=3,
    conv_radius=2.75,
    KP_extent=2.0,
    KP_influence="linear",
    use_batch_norm=True,
    batch_norm_momentum=0.02,
    modulated=False,
    num_kernel_points=15,
    architecture=["simple", "resnetb", "resnetb_strided", "resnetb"],
    # model
    nhead=4,
    d_embed=64,
    d_feedforward=128,
    dropout=0.0,
    pre_norm=True,
    transformer_act="relu",
    num_encoder_layers=2,
    transformer_encoder_has_pos_emb=True,
    sa_val_has_pos_emb=True,
    ca_val_has_pos_emb=True,
    pos_emb_type="sine",
    corr_decoder_has_pos_emb=True,
    direct_regress_coor=True,
    # losses
    wt_overlap=1.0, overlap_loss_on=[1],
    wt_feature=0.1, wt_feature_un=0.0, r_p=0.12, r_n=0.24,
    feature_loss_on=[1], feature_loss_type="infonce",
    wt_corr=1.0, corr_loss_on=[1],
)

SPEC = PyramidSpec(
    architecture=tuple(TINY_CFG["architecture"]),
    first_subsampling_dl=TINY_CFG["first_subsampling_dl"],
    conv_radius=TINY_CFG["conv_radius"],
    neighborhood_limits=tuple(TINY_CFG["neighborhood_limits"]),
    capacities=(128, 64),
)


def make_batch(rng, b=2, n=128, n_valid=100):
    src = rng.normal(size=(b, n, 3)).astype(np.float32) * 0.3
    pose = np.stack([se3_np.sample_pose_small(rng, std=0.3) for _ in range(b)])
    tgt = se3_np.se3_transform(pose, src) + rng.normal(
        size=(b, n, 3)).astype(np.float32) * 0.005
    mask = np.zeros((b, n), bool)
    mask[:, :n_valid] = True
    src[:, n_valid:] = 1e6
    tgt[:, n_valid:] = 1e6
    return {
        "src_xyz": jnp.asarray(src), "tgt_xyz": jnp.asarray(tgt),
        "src_mask": jnp.asarray(mask), "tgt_mask": jnp.asarray(mask),
        "pose": jnp.asarray(pose),
        "src_overlap": jnp.asarray(mask.astype(np.float32)),
        "tgt_overlap": jnp.asarray(mask.astype(np.float32)),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    model = get_model("finegrained_regtr.RegTR")(cfg=TINY_CFG)
    rng_np = np.random.default_rng(0)
    batch = make_batch(rng_np)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, SPEC, train=False,
        method=model.forward_with_loss)
    return model, variables, batch


def test_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    pred = model.apply(variables, batch, SPEC, train=False,
                       mutable=False)
    L, B, Nc = TINY_CFG["num_encoder_layers"], 2, SPEC.capacities[-1]
    assert pred["pose"].shape == (L, B, 3, 4)
    assert pred["src_feat"].shape == (L, B, Nc, TINY_CFG["d_embed"])
    assert pred["src_kp_warped"].shape == (L, B, Nc, 3)
    assert pred["src_overlap"].shape == (L, B, Nc, 1)
    assert np.all(np.isfinite(np.asarray(pred["pose"])))
    # rotation block is orthonormal
    R = np.asarray(pred["pose"])[..., :3, :3]
    eye = np.einsum("lbij,lbkj->lbik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-3)


def test_forward_jits_and_loss_finite(model_and_vars):
    model, variables, batch = model_and_vars

    @jax.jit
    def fwd(variables, batch):
        return model.apply(variables, batch, SPEC, train=False,
                           method=model.forward_with_loss)

    pred, losses = fwd(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"loss {k} not finite"
    assert "overlap_1" in losses and "feature_1" in losses and "corr_1" in losses
    assert "total" in losses


def test_feature_un_gated_on_weight(model_and_vars):
    """wt_feature_un == 0 (every shipped config) skips the O(Nc^2)
    unconditioned-feature loss, reports 0.0, and STILL materializes the
    criterion's learned W so the parameter tree / checkpoints stay
    schema-identical with the wt != 0 parity path."""
    model, variables, batch = model_and_vars
    assert TINY_CFG["wt_feature_un"] == 0.0
    _, losses = model.apply(variables, batch, SPEC, train=False,
                            method=model.forward_with_loss)
    assert float(losses["feature_un"]) == 0.0

    cfg_on = dict(TINY_CFG, wt_feature_un=0.1)
    model_on = get_model("finegrained_regtr.RegTR")(cfg=cfg_on)
    vars_on = model_on.init(
        {"params": jax.random.PRNGKey(0)}, batch, SPEC, train=False,
        method=model_on.forward_with_loss)
    # identical parameter tree structure (and identical leaves: same
    # init rngs, same shapes — W is (D, D) independent of the gate)
    paths_off = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    paths_on = jax.tree_util.tree_flatten_with_path(vars_on["params"])[0]
    assert [p for p, _ in paths_off] == [p for p, _ in paths_on]
    w_off = variables["params"]["feature_criterion_un"]["W"]
    w_on = vars_on["params"]["feature_criterion_un"]["W"]
    assert w_off.shape == w_on.shape == (TINY_CFG["d_embed"],
                                         TINY_CFG["d_embed"])
    _, losses_on = model_on.apply(vars_on, batch, SPEC, train=False,
                                  method=model_on.forward_with_loss)
    assert float(losses_on["feature_un"]) != 0.0
    assert np.isfinite(float(losses_on["total"]))


def test_gradients_flow(model_and_vars):
    model, variables, batch = model_and_vars
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, mut = model.apply(
            {"params": p, **other}, batch, SPEC, train=True,
            method=model.forward_with_loss, mutable=["batch_stats"])
        _, losses = out
        return losses["total"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
    # most parameters should receive gradient
    assert nonzero / len(leaves) > 0.8, f"only {nonzero}/{len(leaves)} grads nonzero"
    # the InfoNCE W (inside the loss) must be trained
    assert "feature_criterion" in params
    w_grad = grads["feature_criterion"]["W"]
    assert float(np.abs(np.asarray(w_grad)).sum()) > 0


def test_masking_invariance(model_and_vars):
    """Changing padded-slot values must not change valid outputs."""
    model, variables, batch = model_and_vars
    batch2 = dict(batch)
    src2 = np.asarray(batch["src_xyz"]).copy()
    src2[:, 100:] = 12345.6  # different garbage in padding
    batch2["src_xyz"] = jnp.asarray(src2)

    p1 = model.apply(variables, batch, SPEC, train=False)
    p2 = model.apply(variables, batch2, SPEC, train=False)
    np.testing.assert_allclose(np.asarray(p1["pose"]), np.asarray(p2["pose"]),
                               atol=1e-4)
    m = np.asarray(p1["src_mask_c"])
    np.testing.assert_allclose(np.asarray(p1["src_feat"])[:, m],
                               np.asarray(p2["src_feat"])[:, m], atol=1e-4)


def test_remat_encoder_equivalence(model_and_vars):
    """remat_encoder=True must be semantics-preserving: identical loss
    and gradients, only the memory/recompute schedule changes
    (backbone.py remat; VERDICT round-1 item 10)."""
    model, variables, batch = model_and_vars
    model_r = get_model("finegrained_regtr.RegTR")(
        cfg={**TINY_CFG, "remat_encoder": True})
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(m, p):
        out, _ = m.apply(
            {"params": p, **other}, batch, SPEC, train=True,
            method=m.forward_with_loss, mutable=["batch_stats"])
        return out[1]["total"]

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(model, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(model_r, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
