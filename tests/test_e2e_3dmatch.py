"""End-to-end 3DMatch-format slice on synthetic data: Predator-format
data root (+pkl infos, .pth clouds) -> ThreeDMatchDataset -> loader ->
short Trainer.fit -> Trainer.test writing est.log -> RR protocol
against synthetic gt logs."""
import os
import pickle

import numpy as np
import pytest

from fgfusion_tpu.data import get_dataloader
from fgfusion_tpu.geometry import se3_np
from fgfusion_tpu.models import get_model
from fgfusion_tpu.ops import PyramidSpec
from fgfusion_tpu.train.trainer import Trainer
from fgfusion_tpu.utils.config import Config

N_FRAGMENTS = 6


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    import torch
    root = tmp_path_factory.mktemp("threedmatch")
    scene = "synth-scene-1"
    frag_dir = root / "test" / scene
    frag_dir.mkdir(parents=True)
    (root / "train").mkdir()  # loader probes for <root>/train

    rng = np.random.default_rng(0)
    # one base surface; fragments are world-frame crops with noise
    base = rng.normal(size=(2000, 3)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)  # sphere shell

    world_poses = []
    for i in range(N_FRAGMENTS):
        pose = se3_np.sample_pose_small(rng, std=0.1)
        world_poses.append(pose)
        # fragment i = base points in frame i
        local = se3_np.se3_transform(se3_np.se3_inv(pose), base)
        local = local + rng.normal(scale=0.002, size=local.shape)
        torch.save(local.astype(np.float32),
                   str(frag_dir / f"cloud_bin_{i}.pth"))

    # pair infos: all (i, j) i<j — relative pose src->tgt
    src, tgt, rot, trans, overlap = [], [], [], [], []
    gt_lines = []
    for i in range(N_FRAGMENTS):
        for j in range(i + 1, N_FRAGMENTS):
            # est.log convention writes (tgt_idx, src_idx); reference
            # datasets pair src=cloud j, tgt=cloud i
            rel = se3_np.se3_cat(se3_np.se3_inv(world_poses[i]),
                                 world_poses[j])
            src.append(f"test/{scene}/cloud_bin_{j}.pth")
            tgt.append(f"test/{scene}/cloud_bin_{i}.pth")
            rot.append(rel[:3, :3])
            trans.append(rel[:3, 3:4])
            overlap.append(1.0)
            pose44 = np.concatenate([rel, [[0, 0, 0, 1]]], 0)
            gt_lines.append((i, j, pose44))

    infos = {"src": src, "tgt": tgt, "rot": rot, "trans": trans,
             "overlap": overlap}
    info_dir = root / "infos"
    info_dir.mkdir()
    for phase in ("train", "val"):
        with open(info_dir / f"{phase}_info.pkl", "wb") as f:
            pickle.dump(infos, f)
    with open(info_dir / "test_SynthBench_info.pkl", "wb") as f:
        pickle.dump(infos, f)

    # gt.log / gt.info for the RR protocol
    gt_dir = root / "benchmarks" / "SynthBench" / scene
    gt_dir.mkdir(parents=True)
    with open(gt_dir / "gt.log", "w") as f:
        for i, j, pose44 in gt_lines:
            f.write(f"{i}\t{j}\t{N_FRAGMENTS}\n")
            for row in pose44:
                f.write("\t".join(f"{v:.12f}" for v in row) + "\n")
    with open(gt_dir / "gt.info", "w") as f:
        for i, j, _ in gt_lines:
            f.write(f"{i}\t{j}\t{N_FRAGMENTS}\n")
            for r in np.eye(6) * 100:
                f.write("\t".join(f"{v:.6f}" for v in r) + "\n")
    return root


@pytest.fixture(scope="module")
def cfg(data_root):
    return Config({
        "dataset": "3dmatch", "root": str(data_root), "benchmark": "SynthBench",
        "augment_noise": 0.005, "perturb_pose": "small",
        "train_batch_size": 2, "val_batch_size": 2, "test_batch_size": 1,
        # single-device workflow on the 8-device test mesh
        "allow_replicated_train_batch": True,
        "overlap_radius": 0.05,
        "niter": 2,
        "optimizer": "AdamW", "base_lr": 1e-4, "weight_decay": 1e-4,
        "grad_clip": 0.1, "scheduler": "step", "scheduler_param": [1000, 0.5],
        "num_layers": 2, "neighborhood_limits": [12, 12],
        "aggregation_mode": "sum", "first_subsampling_dl": 0.08,
        "first_feats_dim": 32, "fixed_kernel_points": "center",
        "in_feats_dim": 1, "in_points_dim": 3, "conv_radius": 2.5,
        "KP_extent": 2.0, "KP_influence": "linear", "use_batch_norm": True,
        "batch_norm_momentum": 0.02, "modulated": False,
        "num_kernel_points": 15,
        "architecture": ["simple", "resnetb", "resnetb_strided", "resnetb"],
        "model": "finegrained_regtr.RegTR",
        "attention_type": "dot_prod", "nhead": 4, "d_embed": 64,
        "d_feedforward": 128, "dropout": 0.0, "pre_norm": True,
        "transformer_act": "relu", "num_encoder_layers": 2,
        "transformer_encoder_has_pos_emb": True, "sa_val_has_pos_emb": True,
        "ca_val_has_pos_emb": True, "pos_emb_type": "sine",
        "corr_decoder_has_pos_emb": True, "direct_regress_coor": True,
        "wt_overlap": 1.0, "overlap_loss_on": [1], "wt_feature": 0.1,
        "wt_feature_un": 0.0, "r_p": 0.2, "r_n": 0.4, "feature_loss_on": [1],
        "feature_loss_type": "infonce", "wt_corr": 1.0, "corr_loss_on": [1],
        "reg_success_thresh_rot": 10, "reg_success_thresh_trans": 0.1,
        "point_capacity": 512, "pyramid_capacities": [512, 192],
        "max_pts": 512,
    })


def test_3dmatch_end_to_end(cfg, data_root, tmp_path, monkeypatch):
    # the dataset reads info pkls from a relative dir; point it at ours
    from fgfusion_tpu.data import threedmatch as tdm

    def make_ds(phase):
        return tdm.ThreeDMatchDataset(cfg, phase,
                                      info_dir=str(data_root / "infos"))

    train_ds = make_ds("train")
    assert len(train_ds) == N_FRAGMENTS * (N_FRAGMENTS - 1) // 2
    sample = train_ds.__getitem__(0, rng=np.random.default_rng(0))
    # GT consistency of the synthetic pairs
    err = np.linalg.norm(
        se3_np.se3_transform(sample["pose"], sample["src_xyz"]).mean(0)
        - sample["tgt_xyz"].mean(0))
    assert np.isfinite(err)
    assert sample["src_overlap"].mean() > 0.5  # sphere crops overlap fully

    from fgfusion_tpu.data.loader import DataLoader
    train_loader = DataLoader(train_ds, 2, cfg["point_capacity"],
                              shuffle=True, num_workers=1)
    val_loader = DataLoader(make_ds("val"), 2, cfg["point_capacity"],
                            num_workers=1)

    spec = PyramidSpec.from_config(cfg, cfg["pyramid_capacities"])
    model = get_model(cfg["model"])(cfg=dict(cfg))
    trainer = Trainer(cfg, str(tmp_path / "run"), niter=2,
                      nb_sanity_val_steps=1, validate_every=2)
    trainer.fit(model, spec, train_loader, val_loader)

    results = trainer.test(
        model, spec, make_ds("test"), resume=str(tmp_path / "run" / "ckpt"),
        benchmark_name="SynthBench",
        gt_root=str(data_root / "benchmarks"))
    assert "registration_recall" in results
    assert 0.0 <= results["registration_recall"] <= 1.0
    # est.log was written in Redwood format and parsed back
    est = tmp_path / "run" / "SynthBench" / "synth-scene-1" / "est.log"
    assert est.exists()
    from fgfusion_tpu.benchmark.benchmark_3dmatch_rr import read_trajectory
    pairs, traj = read_trajectory(str(est))
    assert traj.shape == (len(make_ds("test")), 4, 4)

    # --- graceful-stop partial salvage: a STOP file appearing
    # mid-sweep ends the eval after in-flight work and reports
    # partial results instead of crashing (the budget-capped eval
    # path; see GracefulStop)
    run2 = tmp_path / "run2"
    test_ds = make_ds("test")

    class StopTouching:
        """Dataset proxy that drops a STOP file while serving idx k."""

        def __init__(self, ds, k):
            self.ds, self.k = ds, k
            self.infos = getattr(ds, "infos", None)

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, idx):
            if idx == self.k:
                os.makedirs(run2, exist_ok=True)
                open(run2 / "STOP", "w").close()
            return self.ds.__getitem__(idx)

    trainer2 = Trainer(cfg, str(run2))
    results2 = trainer2.test(
        model, spec, StopTouching(test_ds, 8),
        resume=str(tmp_path / "run" / "ckpt"),
        benchmark_name="SynthBench",
        gt_root=str(data_root / "benchmarks"))
    assert results2["partial"] is True
    assert results2["n_done"] < len(test_ds)
    # scoring only over what was reached; n_done==0 must not crash
    assert ("registration_recall" in results2) == (results2["n_done"] > 0)
