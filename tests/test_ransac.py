"""RANSAC: recovers the pose under heavy outlier contamination; the
Gumbel sampler produces valid straight-through selections."""
import jax
import jax.numpy as jnp
import numpy as np

from fgfusion_tpu.geometry import se3_np
from fgfusion_tpu.models.ransac import (gumbel_softmax_topk, ransac_rigid,
                                        ransac_rigid_batch)


def make_contaminated_pair(rng, n=200, outlier_frac=0.6):
    src = rng.normal(size=(n, 3)).astype(np.float32)
    pose = se3_np.sample_pose_small(rng, std=0.4)
    tgt = se3_np.se3_transform(pose, src).astype(np.float32)
    n_out = int(n * outlier_frac)
    tgt[:n_out] = rng.normal(size=(n_out, 3)).astype(np.float32) * 3 + 5
    return src, tgt, pose, n_out


def test_ransac_recovers_pose_with_outliers(rng):
    src, tgt, pose, n_out = make_contaminated_pair(rng)
    est, inliers, score = jax.jit(
        lambda s, t, k: ransac_rigid(s, t, k, num_hypotheses=256,
                                     inlier_threshold=0.05))(
        jnp.asarray(src), jnp.asarray(tgt), jax.random.PRNGKey(0))
    err = se3_np.se3_compare(np.asarray(est), pose)
    assert err["rot_deg"] < 1.0, err
    assert err["trans"] < 0.02
    inl = np.asarray(inliers)
    assert inl[n_out:].mean() > 0.95    # true inliers found
    assert inl[:n_out].mean() < 0.05    # outliers rejected


def test_ransac_batch_and_mask(rng):
    pairs = [make_contaminated_pair(rng, outlier_frac=0.4) for _ in range(3)]
    src = jnp.asarray(np.stack([p[0] for p in pairs]))
    tgt = jnp.asarray(np.stack([p[1] for p in pairs]))
    mask = np.ones((3, 200), bool)
    mask[:, 190:] = False
    est, inliers, _ = ransac_rigid_batch(
        src, tgt, jax.random.PRNGKey(1), mask=jnp.asarray(mask),
        num_hypotheses=128, inlier_threshold=0.05)
    for b in range(3):
        err = se3_np.se3_compare(np.asarray(est[b]), pairs[b][2])
        assert err["rot_deg"] < 1.5
    assert not np.any(np.asarray(inliers)[:, 190:])


def test_ransac_weighted_sampling_helps(rng):
    src, tgt, pose, n_out = make_contaminated_pair(rng, outlier_frac=0.85)
    conf = np.full(200, 0.01, np.float32)
    conf[n_out:] = 0.99  # oracle confidence
    est, _, _ = ransac_rigid(jnp.asarray(src), jnp.asarray(tgt),
                             jax.random.PRNGKey(2),
                             weights=jnp.asarray(conf),
                             num_hypotheses=64, inlier_threshold=0.05)
    err = se3_np.se3_compare(np.asarray(est), pose)
    assert err["rot_deg"] < 1.0


def test_gumbel_topk_straight_through():
    logits = jnp.asarray(np.linspace(-1, 1, 16), jnp.float32)
    sel = gumbel_softmax_topk(logits, 4, jax.random.PRNGKey(0), tau=0.5)
    assert sel.shape == (16,)
    # forward value is (numerically) a hard selection of exactly 4
    hard = np.round(np.asarray(sel))
    assert hard.sum() == 4

    # gradients flow to the logits
    def f(lg):
        return jnp.sum(gumbel_softmax_topk(lg, 4, jax.random.PRNGKey(0)) * lg)
    g = jax.grad(f)(logits)
    assert np.any(np.asarray(g) != 0)


def test_clnet_learns_inliers(rng):
    """A few gradient steps on DeepRansacCLNet should separate inliers
    from outliers on a fixed contaminated problem."""
    import optax
    from fgfusion_tpu.models.cl_net import DeepRansacCLNet

    src, tgt, pose, n_out = make_contaminated_pair(rng, n=128, outlier_frac=0.5)
    src_j, tgt_j = jnp.asarray(src[None]), jnp.asarray(tgt[None])
    mask = jnp.ones((1, 128), bool)
    labels = np.zeros(128, np.float32); labels[n_out:] = 1.0
    labels = jnp.asarray(labels[None])

    model = DeepRansacCLNet(dim=32, num_blocks=2)
    params = model.init(jax.random.PRNGKey(0), src_j, tgt_j, mask)

    def loss_fn(p):
        _, logits = model.apply(p, src_j, tgt_j, mask)
        z = jnp.clip(logits, -30, 30)
        bce = jnp.maximum(z, 0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))
        return jnp.mean(bce)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    for _ in range(60):
        g = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)

    _, logits = model.apply(params, src_j, tgt_j, mask)
    probs = np.asarray(jax.nn.sigmoid(logits))[0]
    assert probs[n_out:].mean() > 0.6
    assert probs[:n_out].mean() < 0.4


def test_weighted_inlier_score_selects_better_pose(rng):
    """Selection metric: the true pose must outscore a perturbed one on
    clean correspondences, and an identity pose must outscore the true
    pose when the correspondences are (mostly) junk it happens to fit."""
    from fgfusion_tpu.models.ransac import weighted_inlier_score

    src, tgt, pose, n_out = make_contaminated_pair(rng, outlier_frac=0.3)
    w = jnp.ones(200)
    m = jnp.ones(200, bool)
    good = jnp.asarray(np.asarray(pose, np.float32))
    bad_r = se3_np.sample_pose_small(np.random.default_rng(7), std=0.5)
    bad = jnp.asarray((np.asarray(pose) @ np.vstack(
        [bad_r, [0, 0, 0, 1]]).astype(np.float32)))
    s_good = weighted_inlier_score(good, jnp.asarray(src), jnp.asarray(tgt),
                                   w, m, threshold=0.05)
    s_bad = weighted_inlier_score(bad, jnp.asarray(src), jnp.asarray(tgt),
                                  w, m, threshold=0.05)
    assert float(s_good) > float(s_bad)
    # weights gate the count: zeroing the true inliers flips the margin
    w0 = np.ones(200, np.float32)
    w0[n_out:] = 0.0
    s_goodw = weighted_inlier_score(good, jnp.asarray(src),
                                    jnp.asarray(tgt), jnp.asarray(w0), m,
                                    threshold=0.05)
    assert float(s_goodw) < float(s_good)
    # batched shape: (B,) out for (B, 3, 4) poses
    sb = weighted_inlier_score(jnp.stack([good, bad]),
                               jnp.stack([jnp.asarray(src)] * 2),
                               jnp.stack([jnp.asarray(tgt)] * 2),
                               jnp.stack([w, w]), jnp.stack([m, m]),
                               threshold=0.05)
    assert sb.shape == (2,)
    assert float(sb[0]) > float(sb[1])


def test_test_step_ransac_select_keeps_better():
    """cfg test_ransac_select: the final pose equals the plain-eval
    learned pose OR the ransac pose per pair, picked by inlier score —
    and never a third value."""
    import numpy as np
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.train.trainer import (create_train_state,
                                            make_test_step)
    from test_model import TINY_CFG, SPEC, make_batch

    base = dict(TINY_CFG, optimizer="AdamW", base_lr=1e-3,
                weight_decay=1e-4, grad_clip=0.1, scheduler="step",
                scheduler_param=[1000, 0.5])
    batch = make_batch(np.random.default_rng(0))

    poses = {}
    for name, extra in [("plain", {}),
                        ("ransac", dict(test_ransac=True,
                                        test_ransac_threshold=0.05)),
                        ("select", dict(test_ransac_select=True,
                                        test_ransac_threshold=0.05))]:
        cfg = dict(base, **extra)
        model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
        state, _ = create_train_state(model, cfg, SPEC, batch)
        slim, _, _ = make_test_step(model, SPEC)(state, batch)
        poses[name] = np.asarray(slim["pose"])[-1]  # (B, 3, 4)

    assert np.all(np.isfinite(poses["select"]))
    for b in range(poses["select"].shape[0]):
        d_plain = np.abs(poses["select"][b] - poses["plain"][b]).max()
        d_ransac = np.abs(poses["select"][b] - poses["ransac"][b]).max()
        assert min(d_plain, d_ransac) < 1e-5, (b, d_plain, d_ransac)


def test_test_step_ransac_refinement():
    """cfg test_ransac: true refits the final pose in-graph inside
    make_test_step — shapes preserved, poses finite and orthonormal."""
    import jax
    import numpy as np
    from fgfusion_tpu.models import get_model
    from fgfusion_tpu.train.trainer import (create_train_state,
                                            make_test_step)
    from test_model import TINY_CFG, SPEC, make_batch

    cfg = dict(TINY_CFG, test_ransac=True, test_ransac_threshold=0.05,
               optimizer="AdamW", base_lr=1e-3, weight_decay=1e-4,
               grad_clip=0.1, scheduler="step", scheduler_param=[1000, 0.5])
    model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
    batch = make_batch(np.random.default_rng(0))
    state, _ = create_train_state(model, cfg, SPEC, batch)
    step = make_test_step(model, SPEC)
    slim, losses, metrics = step(state, batch)
    pose = np.asarray(slim["pose"])
    assert pose.shape == (TINY_CFG["num_encoder_layers"], 2, 3, 4)
    assert np.all(np.isfinite(pose))
    R = pose[-1][..., :3]
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-3)
