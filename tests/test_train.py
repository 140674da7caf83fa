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


def test_poisoned_batch_skipped_in_graph(setup):
    """A batch that yields a non-finite loss must leave params,
    opt_state, and the step counter untouched (the skip happens inside
    the XLA program — sound under buffer donation), and training must
    proceed normally on the next good batch."""
    model, tx, fresh_state, batch = setup
    state = fresh_state()
    step = make_train_step(model, tx, SPEC)

    state, losses = step(state, batch)
    assert float(losses["skipped"]) == 0.0
    params_before = jax.device_get(state.params)

    poisoned = dict(batch)
    poisoned["src_xyz"] = np.asarray(batch["src_xyz"]).copy()
    poisoned["src_xyz"][:, 0, :] = np.nan
    state, losses = step(state, poisoned)
    assert float(losses["skipped"]) == 1.0
    assert int(state.step) == 1  # poisoned step not counted
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state, losses = step(state, batch)  # recovery
    assert float(losses["skipped"]) == 0.0
    assert np.isfinite(float(losses["total"]))
    assert int(state.step) == 2


def test_fit_survives_midtrain_exception(setup, tmp_path, monkeypatch):
    """Inject a raising train step mid-fit: training must log, recover,
    and run to completion (reference trainer.py:137-149 semantics)."""
    from fgfusion_tpu.train import trainer as trainer_mod
    from fgfusion_tpu.train.trainer import Trainer

    model, tx, fresh_state, batch = setup
    cfg = dict(TINY_CFG)
    cfg.update(optimizer="AdamW", base_lr=1e-3, weight_decay=1e-4,
               grad_clip=0.1, scheduler="step", scheduler_param=[100000, 0.5],
               reg_success_thresh_rot=10, reg_success_thresh_trans=0.1)

    calls = {"n": 0}
    real_make = trainer_mod.make_train_step

    def flaky_make(model, tx, spec):
        real_step = real_make(model, tx, spec)

        def step(state, b):
            calls["n"] += 1
            if calls["n"] == 3:
                raise RuntimeError("injected mid-train failure")
            return real_step(state, b)

        return step

    monkeypatch.setattr(trainer_mod, "make_train_step", flaky_make)

    # global-batch contract: leading dim must divide the 8-device mesh
    batch8 = make_batch(np.random.default_rng(7), b=8)
    np_batch = {k: np.asarray(v) for k, v in batch8.items()}

    class Loader:
        def __init__(self, n):
            self.batches = [np_batch] * n

        def __len__(self):
            return len(self.batches)

        def set_epoch(self, e):
            pass

        def __iter__(self):
            return iter(self.batches)

    trainer = Trainer(cfg, str(tmp_path / "run"), niter=6,
                      nb_sanity_val_steps=0)
    state = trainer.fit(model, SPEC, Loader(6), Loader(1))
    assert calls["n"] >= 6  # the failed call was retried with a new batch
    assert int(state.step) >= 5  # one batch lost, rest trained


def test_fit_graceful_stop_file(setup, tmp_path):
    """A STOP file in the log dir ends training after the current step
    with a final checkpoint + forced latest-mirror (deadline harnesses
    rely on this instead of killing the TPU process mid-step)."""
    import os

    from fgfusion_tpu.train.trainer import Trainer

    model, tx, fresh_state, batch = setup
    cfg = dict(TINY_CFG)
    cfg.update(optimizer="AdamW", base_lr=1e-3, weight_decay=1e-4,
               grad_clip=0.1, scheduler="step", scheduler_param=[100000, 0.5],
               reg_success_thresh_rot=10, reg_success_thresh_trans=0.1)

    batch8 = make_batch(np.random.default_rng(7), b=8)
    np_batch = {k: np.asarray(v) for k, v in batch8.items()}
    log_dir = str(tmp_path / "run")

    class Loader:
        def __init__(self, n, stop_after=None):
            self.n = n
            self.stop_after = stop_after

        def __len__(self):
            return self.n

        def set_epoch(self, e):
            pass

        def __iter__(self):
            for i in range(self.n):
                if self.stop_after is not None and i == self.stop_after:
                    open(os.path.join(log_dir, "STOP"), "w").close()
                yield np_batch

    trainer = Trainer(cfg, log_dir, niter=50, nb_sanity_val_steps=0)
    state = trainer.fit(model, SPEC, Loader(50, stop_after=4), Loader(1))
    assert trainer._stop_requested
    # stopped well before niter, after honoring in-flight steps
    assert 2 <= int(state.step) <= 8
    # final checkpoint was still written
    assert trainer.saver.latest_step() == int(state.step)


def test_fit_graceful_sigterm(setup, tmp_path):
    """First SIGTERM requests a clean stop (handler restored after)."""
    import os
    import signal

    from fgfusion_tpu.train.trainer import Trainer

    model, tx, fresh_state, batch = setup
    cfg = dict(TINY_CFG)
    cfg.update(optimizer="AdamW", base_lr=1e-3, weight_decay=1e-4,
               grad_clip=0.1, scheduler="step", scheduler_param=[100000, 0.5],
               reg_success_thresh_rot=10, reg_success_thresh_trans=0.1)

    batch8 = make_batch(np.random.default_rng(7), b=8)
    np_batch = {k: np.asarray(v) for k, v in batch8.items()}

    class Loader:
        def __init__(self, n, term_after=None):
            self.n = n
            self.term_after = term_after

        def __len__(self):
            return self.n

        def set_epoch(self, e):
            pass

        def __iter__(self):
            for i in range(self.n):
                if self.term_after is not None and i == self.term_after:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield np_batch

    prev = signal.getsignal(signal.SIGTERM)
    trainer = Trainer(cfg, str(tmp_path / "run"), niter=50,
                      nb_sanity_val_steps=0)
    state = trainer.fit(model, SPEC, Loader(50, term_after=4), Loader(1))
    assert trainer._stop_requested
    assert int(state.step) < 50
    # the handler (and any pending alarm) must not leak out of fit
    assert signal.getsignal(signal.SIGTERM) is prev


def test_loader_num_workers_deterministic(rng):
    """num_workers parallelism must not change the produced batches."""
    from fgfusion_tpu.data.loader import DataLoader
    from fgfusion_tpu.geometry import se3_np

    class RandomPairDataset:
        def __init__(self, n_items):
            self.n = n_items

        def __len__(self):
            return self.n

        def __getitem__(self, idx, rng=None):
            rng = rng or np.random.default_rng(idx)
            src = rng.normal(size=(80, 3)).astype(np.float32)
            pose = se3_np.sample_pose_small(rng, std=0.2)
            return {"src_xyz": src,
                    "tgt_xyz": se3_np.se3_transform(pose, src),
                    "pose": pose,
                    "src_overlap": np.ones(80, bool),
                    "tgt_overlap": np.ones(80, bool),
                    "idx": np.int32(idx)}

    ds = RandomPairDataset(n_items=7)
    batches = {}
    for nw in (1, 4):
        dl = DataLoader(ds, batch_size=2, point_capacity=64, shuffle=True,
                        seed=3, num_workers=nw)
        batches[nw] = list(dl)
    assert len(batches[1]) == len(batches[4]) == 4
    for a, b in zip(batches[1], batches[4]):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


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


def test_checkpoint_best_survives_rotation(setup, tmp_path):
    """Rotation must never delete the best-scoring checkpoint (round-2
    incident: best@40800 rotated away by LatestN-only keep, leaving
    checkpoints.txt pointing at a missing step)."""
    from fgfusion_tpu.train.checkpoint import CheckpointManager
    model, tx, fresh_state, batch = setup
    host_state = jax.device_get(fresh_state())
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for step in range(1, 9):
        score = 0.9 if step == 3 else 0.01 * step
        mgr.save(step, host_state, score=score)
    mgr.wait()
    assert mgr.best_step == 3
    assert 3 in mgr._mgr.all_steps()
    restored, step = mgr.load(host_state, best=True)
    assert step == 3
    # latest two survive as well
    assert {7, 8} <= set(mgr._mgr.all_steps())


def test_tp_train_step_matches_dp(setup):
    """Tensor-parallel (data=4, model=2) train step: transformer weights
    Megatron-split over 'model', GSPMD inserts the psums — and the step
    must agree numerically with the replicated data-parallel run."""
    from fgfusion_tpu.parallel import make_mesh_2d, shard_tree, tp_shardings

    model, tx, fresh_state, _ = setup
    rng = np.random.default_rng(3)
    batch = make_batch(rng, b=8)
    step = make_train_step(model, tx, SPEC)

    # replicated DP reference
    mesh1 = make_mesh()
    state_dp = fresh_state()
    _, losses_dp = step(state_dp, shard_batch(batch, mesh1))

    # 4x2 TP
    mesh2 = make_mesh_2d(4, 2)
    state_tp = shard_tree(fresh_state(), mesh2)
    # the transformer projections must actually be split
    sh = tp_shardings(state_tp.params, mesh2)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    split = ["/".join(str(k.key) for k in p) for p, s in flat
             if any(ax == "model" for ax in s.spec)]
    assert any("q_proj/kernel" in s for s in split), split[:5]
    assert any("linear2/kernel" in s for s in split)

    batch_tp = shard_batch(batch, mesh2)
    new_state, losses_tp = step(state_tp, batch_tp)
    np.testing.assert_allclose(float(losses_dp["total"]),
                               float(losses_tp["total"]), rtol=2e-4)
    # weights stay split after the update
    q = new_state.params["transformer_encoder"]["layer_0"]["self_attn"]["q_proj"]["kernel"]
    assert any(ax == "model" for ax in q.sharding.spec)


def test_multistep_tp_training_matches_single_device(setup):
    """Sustained DP x TP (4x2) training must also reproduce the
    single-device loss trajectory: Megatron-split weights + GSPMD
    psums have to compose with the optimizer update across MANY steps
    (split optimizer moments included), not just the one step
    test_tp_train_step_matches_dp covers."""
    from fgfusion_tpu.parallel import make_mesh_2d, shard_tree

    model, tx, fresh_state, _ = setup
    n_steps = 10
    rng = np.random.default_rng(12)
    batches = [make_batch(rng, b=8) for _ in range(n_steps)]
    step = make_train_step(model, tx, SPEC)

    mesh1 = make_mesh(jax.devices()[:1])
    state1 = fresh_state()
    traj1 = []
    for b in batches:
        state1, losses = step(state1, shard_batch(b, mesh1))
        traj1.append(float(losses["total"]))

    mesh42 = make_mesh_2d(4, 2)
    state_tp = shard_tree(fresh_state(), mesh42)
    traj_tp = []
    for b in batches:
        state_tp, losses = step(state_tp, shard_batch(b, mesh42))
        traj_tp.append(float(losses["total"]))

    np.testing.assert_allclose(traj1, traj_tp, rtol=5e-3)
    # the transformer weights are STILL model-split after N updates
    q = state_tp.params["transformer_encoder"]["layer_0"][
        "self_attn"]["q_proj"]["kernel"]
    assert any(ax == "model" for ax in q.sharding.spec)


def test_multistep_mesh_training_matches_single_device(setup):
    """A sustained multi-step DP training run over the 8-device mesh
    must reproduce the single-device loss trajectory (same batches,
    same init) within numerical tolerance — the reduction order of the
    gradient psum is the only difference. Guards the whole scaling
    story: sharded input + replicated params + XLA-inserted gradient
    all-reduce IS the same optimization process, not merely one step
    of it."""
    model, tx, fresh_state, _ = setup
    n_steps = 20
    rng = np.random.default_rng(11)
    batches = [make_batch(rng, b=8) for _ in range(n_steps)]
    step = make_train_step(model, tx, SPEC)

    mesh1 = make_mesh(jax.devices()[:1])
    state1 = fresh_state()
    traj1 = []
    for b in batches:
        state1, losses = step(state1, shard_batch(b, mesh1))
        traj1.append(float(losses["total"]))

    mesh8 = make_mesh()
    assert len(mesh8.devices) == 8
    state8 = fresh_state()
    traj8 = []
    for b in batches:
        state8, losses = step(state8, shard_batch(b, mesh8))
        traj8.append(float(losses["total"]))

    np.testing.assert_allclose(traj1, traj8, rtol=5e-3)
    assert int(state8.step) == n_steps
    # the trained MODELS are functionally equivalent on held-out data
    # (AdamW's sqrt(v) normalization makes individual near-zero weights
    # chaotically sensitive to the psum reduction order, so raw
    # parameter equality is not the right statement — held-out loss is)
    held_out = make_batch(np.random.default_rng(99), b=8)
    eval_step = make_eval_step(model, SPEC)
    s1 = jax.device_put(jax.device_get(state1))   # strip mesh shardings
    s8 = jax.device_put(jax.device_get(state8))
    _, l1, _ = eval_step(s1, held_out)
    _, l8, _ = eval_step(s8, held_out)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l8[k]), rtol=1e-2,
                                   atol=1e-3, err_msg=k)


def test_fit_refuses_indivisible_global_batch(setup, tmp_path):
    """The global-batch contract: fit() on a multi-device mesh with a
    batch size that does not divide the data axis must error loudly
    instead of silently replicating (8x redundant compute)."""
    from fgfusion_tpu.train.trainer import Trainer
    model, tx, fresh_state, batch = setup
    cfg = dict(TINY_CFG)
    cfg.update(optimizer="AdamW", base_lr=1e-3, weight_decay=1e-4,
               grad_clip=0.1, scheduler="step", scheduler_param=[100000, 0.5],
               reg_success_thresh_rot=10, reg_success_thresh_trans=0.1)
    np_batch = {k: np.asarray(v) for k, v in batch.items()}  # b=2

    class Loader:
        def __len__(self):
            return 1

        def set_epoch(self, e):
            pass

        def __iter__(self):
            return iter([np_batch])

    trainer = Trainer(cfg, str(tmp_path / "run"), niter=1,
                      nb_sanity_val_steps=0)
    with pytest.raises(ValueError, match="global-batch contract"):
        trainer.fit(model, SPEC, Loader(), Loader())


def test_trainer_tp_mesh(setup, tmp_path):
    """cfg tp_size=2 builds a (data=4, model=2) mesh; batch shards on
    the data axis only (divisibility by 4, not 8)."""
    from fgfusion_tpu.train.trainer import Trainer
    model, tx, fresh_state, _ = setup
    cfg = dict(TINY_CFG)
    cfg.update(reg_success_thresh_rot=10, reg_success_thresh_trans=0.1,
               tp_size=2)
    trainer = Trainer(cfg, str(tmp_path / "run"))
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}

    batch = {"src_xyz": np.zeros((4, 16, 3), np.float32)}  # 4 % 4 == 0
    out = trainer._put(batch)
    assert not out["src_xyz"].sharding.is_fully_replicated


def test_params_snapshot_roundtrip(setup, tmp_path):
    """npz params snapshot restores params/batch_stats/step exactly into
    an abstract template (the durability path for host resets)."""
    from fgfusion_tpu.train.snapshot import (load_params_npz,
                                             save_params_npz,
                                             snapshot_meta)
    model, tx, fresh_state, batch = setup
    state = fresh_state()
    step = make_train_step(model, tx, SPEC)
    state, _ = step(state, batch)  # non-trivial batch_stats + step=1
    host = jax.device_get(state)

    path = str(tmp_path / "snap.npz")
    save_params_npz(path, host, meta={"score": 0.75})
    meta = snapshot_meta(path)
    assert meta["step"] == 1 and meta["score"] == 0.75

    template = jax.eval_shape(lambda: host)
    restored, step_no = load_params_npz(path, template)
    assert step_no == 1 and int(restored.step) == 1
    for section in ("params", "batch_stats"):
        a_leaves = jax.tree.leaves(getattr(host, section))
        b_leaves = jax.tree.leaves(getattr(restored, section))
        assert len(a_leaves) == len(b_leaves)
        for a, b in zip(a_leaves, b_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_atomic_snapshot_write(setup, tmp_path):
    """atomic_save_params_npz leaves no tempfile behind and produces a
    loadable archive at the final path (the durability git-committer
    scans the directory concurrently)."""
    from fgfusion_tpu.train.snapshot import (atomic_save_params_npz,
                                             load_params_npz)
    model, tx, fresh_state, batch = setup
    state = fresh_state()
    host = jax.device_get(state)

    path = str(tmp_path / "snap_atomic.npz")
    atomic_save_params_npz(path, host, meta={"score": 0.5})
    leftovers = [p for p in tmp_path.iterdir() if ".tmp" in p.name]
    assert leftovers == []
    template = jax.eval_shape(lambda: host)
    restored, step_no = load_params_npz(path, template)
    assert step_no == int(host.step)

def test_full_snapshot_restores_opt_state(setup, tmp_path):
    """include_opt=True archives carry the optimizer state; loading one
    restores Adam moments + schedule counters exactly (full resume —
    a VM reset then costs zero optimizer progress), while a
    params-only archive leaves the template's fresh opt_state alone."""
    from fgfusion_tpu.train.snapshot import load_params_npz, save_params_npz
    model, tx, fresh_state, batch = setup
    state = fresh_state()
    step = make_train_step(model, tx, SPEC)
    state, _ = step(state, batch)
    state, _ = step(state, batch)  # non-trivial Adam moments, count=2
    host = jax.device_get(state)

    full = str(tmp_path / "snap_full.npz")
    save_params_npz(full, host, meta={"score": 0.1}, include_opt=True)
    slim = str(tmp_path / "snap_slim.npz")
    save_params_npz(slim, host, meta={"score": 0.1})

    template = jax.device_get(fresh_state())
    restored, _ = load_params_npz(full, template)
    a = jax.tree.leaves(host.opt_state)
    b = jax.tree.leaves(restored.opt_state)
    assert len(a) == len(b) and len(a) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # params-only archive: opt_state stays the template's (fresh)
    restored2, _ = load_params_npz(slim, template)
    f = jax.tree.leaves(template.opt_state)
    g = jax.tree.leaves(restored2.opt_state)
    for x, y in zip(f, g):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
