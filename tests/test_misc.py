"""Config loader, LR schedules, losses (BCE/InfoNCE/circle), misc."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgfusion_tpu.train.scheduler import make_optimizer, make_schedule
from fgfusion_tpu.utils.config import Config, flatten_config


def test_flatten_config_one_level():
    raw = {
        "general": {"expt_name": "x"},
        "solver": {"base_lr": 1e-4, "scheduler": "step"},
        "toplevel": 5,
        "dataset": {"base_lr": 2e-4},  # later section overrides (reference quirk)
    }
    cfg = flatten_config(raw)
    assert cfg.expt_name == "x"
    assert cfg["toplevel"] == 5
    assert cfg.base_lr == 2e-4


def test_step_schedule():
    sched = make_schedule(Config({"scheduler": "step", "base_lr": 1.0,
                                  "scheduler_param": [100, 0.5]}))
    assert sched(0) == 1.0
    assert sched(99) == 1.0
    assert sched(100) == 0.5
    assert sched(250) == 0.25


def test_warmup_schedule():
    sched = make_schedule(Config({"scheduler": "warmup", "base_lr": 1.0,
                                  "scheduler_param": [10, 100, 0.5]}))
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    # decay: after decay_steps more, lr *= decay_factor
    assert float(sched(110)) == pytest.approx(0.5, rel=1e-3)


def test_optimizer_clips_gradients():
    import optax
    cfg = Config({"optimizer": "AdamW", "base_lr": 0.1, "weight_decay": 0.0,
                  "grad_clip": 0.1, "scheduler": "none"})
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    huge_grads = {"w": jnp.full(3, 100.0)}
    updates, _ = tx.update(huge_grads, state, params)
    # clipped global norm -> bounded update magnitude
    assert float(jnp.abs(updates["w"]).max()) < 1.0


def test_bce_with_logits_matches_definition(rng):
    from fgfusion_tpu.models.regtr import _bce_with_logits
    logits = jnp.asarray(rng.normal(size=(50,)).astype(np.float32) * 3)
    targets = jnp.asarray((rng.random(50) > 0.5).astype(np.float32))
    got = np.asarray(_bce_with_logits(logits, targets))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    want = -(np.asarray(targets) * np.log(p)
             + (1 - np.asarray(targets)) * np.log(1 - p))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _loss_inputs(rng, b=2, n=64, d=16):
    from fgfusion_tpu.geometry import se3_np
    src = rng.normal(size=(b, n, 3)).astype(np.float32) * 0.5
    tgt = src + rng.normal(size=(b, n, 3)).astype(np.float32) * 0.01
    feat_s = rng.normal(size=(b, n, d)).astype(np.float32)
    mask = np.ones((b, n), bool)
    return (jnp.asarray(feat_s), jnp.asarray(feat_s.copy()),
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))


def test_infonce_lower_for_matching_features(rng):
    from fgfusion_tpu.losses.feature_loss import InfoNCELossFull
    sf, tf, sx, tx_, m = _loss_inputs(rng)
    loss_mod = InfoNCELossFull(16, r_p=0.1, r_n=0.2)
    v = loss_mod.init(jax.random.PRNGKey(0), sf, tf, sx, tx_, m, m)
    matched = float(loss_mod.apply(v, sf, tf, sx, tx_, m, m))
    shuffled = float(loss_mod.apply(
        v, sf, jnp.asarray(np.random.default_rng(1).permutation(
            np.asarray(tf), axis=1)), sx, tx_, m, m))
    assert np.isfinite(matched)
    assert matched < shuffled


def test_circle_loss_runs_and_separates(rng):
    from fgfusion_tpu.losses.feature_loss import CircleLossFull
    sf, tf, sx, tx_, m = _loss_inputs(rng)
    mod = CircleLossFull(r_p=0.1, r_n=0.2)
    v = mod.init(jax.random.PRNGKey(0), sf, tf, sx, tx_, m, m)
    val = float(mod.apply(v, sf, tf, sx, tx_, m, m))
    assert np.isfinite(val)


def test_circle_loss_sampled(rng):
    from fgfusion_tpu.losses.feature_loss import CircleLossSampled
    sf, tf, sx, tx_, m = _loss_inputs(rng)
    n = sf.shape[1]
    corr = np.tile(np.arange(n), (2, 2, 1)).reshape(2, 2, n)
    corr_mask = np.ones((2, n), bool)
    mod = CircleLossSampled(r_p=0.1, r_n=0.2, n_sample=32)
    v = mod.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                 sf, tf, sx, tx_, jnp.asarray(corr), jnp.asarray(corr_mask))
    val = float(mod.apply(v, jax.random.PRNGKey(1), sf, tf, sx, tx_,
                          jnp.asarray(corr), jnp.asarray(corr_mask)))
    assert np.isfinite(val)


def test_stats_meter():
    from fgfusion_tpu.utils.misc import StatsMeter, metrics_to_string
    s = StatsMeter()
    s.update("a", 1.0)
    s.update("a", 3.0)
    s.update_dict({"b": 2.0})
    assert s.avgs() == {"a": 2.0, "b": 2.0}
    assert "a: 2" in metrics_to_string(s.avgs())


def test_ply_roundtrip(tmp_path, rng):
    from fgfusion_tpu.utils.ply import write_ply, read_ply_xyz
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.random((100, 3)).astype(np.float32)
    path = str(tmp_path / "test.ply")
    write_ply(path, xyz, rgb)
    back = read_ply_xyz(path)
    np.testing.assert_allclose(back, xyz, atol=1e-6)
