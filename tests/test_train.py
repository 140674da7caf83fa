"""Training-loop smoke tests: steps run, loss is finite and decreases
on an easy synthetic task, checkpoints round-trip, and the train step
compiles over the 8-device virtual mesh with the batch sharded."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgfusion_tpu.models import get_model
from fgfusion_tpu.ops import PyramidSpec
from fgfusion_tpu.parallel import make_mesh, shard_batch
from fgfusion_tpu.train.trainer import (create_train_state, make_eval_step,
                                        make_train_step)

from test_model import TINY_CFG, SPEC, make_batch


@pytest.fixture(scope="module")
def setup():
    cfg = dict(TINY_CFG)
    cfg.update(optimizer="AdamW", base_lr=1e-3, weight_decay=1e-4,
               grad_clip=0.1, scheduler="step", scheduler_param=[100000, 0.5])
    model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    state0, tx = create_train_state(model, cfg, SPEC, batch)
    host_state = jax.device_get(state0)  # immune to buffer donation

    def fresh_state():
        return jax.tree.map(jnp.asarray, host_state)

    return model, tx, fresh_state, batch


def test_train_steps_reduce_loss(setup):
    model, tx, fresh_state, batch = setup
    state = fresh_state()
    step = make_train_step(model, tx, SPEC)
    losses0 = None
    for i in range(12):
        state, losses = step(state, batch)
        assert np.isfinite(float(losses["total"]))
        if losses0 is None:
            losses0 = float(losses["total"])
    assert float(losses["total"]) < losses0, (
        f"loss did not decrease: {losses0} -> {float(losses['total'])}")
    assert int(state.step) == 12


def test_eval_step_metrics(setup):
    model, tx, fresh_state, batch = setup
    state = fresh_state()
    eval_step = make_eval_step(model, SPEC)
    _, losses, metrics = eval_step(state, batch)
    assert metrics["rot_deg"].shape == (TINY_CFG["num_encoder_layers"], 2)
    assert np.all(np.isfinite(np.asarray(metrics["rot_deg"])))


def test_checkpoint_roundtrip(setup, tmp_path):
    from fgfusion_tpu.train.checkpoint import CheckpointManager
    model, tx, fresh_state, batch = setup
    state = fresh_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    host_state = jax.device_get(state)
    assert mgr.save(1, host_state, score=0.5)
    assert not mgr.save(2, host_state, score=0.25)  # not best
    mgr.wait()
    restored, step = mgr.load(host_state)  # best tracking: step 1
    assert mgr.best_step == 1
    leaves_a = jax.tree.leaves(host_state.params)
    leaves_b = jax.tree.leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multichip_train_step(setup):
    """Full train step over an 8-device mesh with the batch sharded on
    'data' — validates the sharding story without real chips."""
    model, tx, fresh_state, _ = setup
    state = fresh_state()
    assert jax.device_count() == 8
    mesh = make_mesh()

    rng = np.random.default_rng(2)
    batch = make_batch(rng, b=8)  # divisible by 8 devices
    batch = shard_batch(batch, mesh)

    step = make_train_step(model, tx, SPEC)
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses["total"]))
    # params remain replicated
    p0 = jax.tree.leaves(new_state.params)[0]
    assert len(p0.sharding.device_set) in (1, 8)


def test_trainer_put_sharding(setup, tmp_path):
    """Batch entries divisible by the device count shard on 'data';
    others replicate."""
    from fgfusion_tpu.train.trainer import Trainer
    model, tx, fresh_state, _ = setup
    cfg = dict(TINY_CFG)
    cfg.update(reg_success_thresh_rot=10, reg_success_thresh_trans=0.1)
    trainer = Trainer(cfg, str(tmp_path / "run"))

    batch = {
        "src_xyz": np.zeros((8, 16, 3), np.float32),   # 8 % 8 == 0 -> sharded
        "pose": np.zeros((2, 3, 4), np.float32),       # 2 % 8 != 0 -> replicated
    }
    out = trainer._put(batch)
    assert len(out["src_xyz"].sharding.device_set) == 8
    assert not out["src_xyz"].sharding.is_fully_replicated
    assert out["pose"].sharding.is_fully_replicated
