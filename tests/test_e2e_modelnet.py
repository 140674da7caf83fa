"""End-to-end ModelNet slice: synthetic HDF5 -> get_dataloader ->
Trainer.fit (few steps) -> Trainer.test with the RPMNet protocol.
Exercises the same path as `python train.py --config conf/modelnet.yaml`
on a miniature config."""
import os

import h5py
import numpy as np
import pytest

from fgfusion_tpu.data import get_dataloader
from fgfusion_tpu.models import get_model
from fgfusion_tpu.ops import PyramidSpec
from fgfusion_tpu.train.trainer import Trainer
from fgfusion_tpu.utils.config import Config


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("modelnet")
    rng = np.random.default_rng(0)
    n_shapes, n_pts = 12, 512

    # unit-sphere shells with normals
    data = rng.normal(size=(n_shapes, n_pts, 3))
    data /= np.linalg.norm(data, axis=-1, keepdims=True)
    data *= rng.uniform(0.5, 1.0, size=(n_shapes, 1, 1))
    normals = data / np.linalg.norm(data, axis=-1, keepdims=True)
    labels = np.arange(n_shapes) % 2

    with h5py.File(root / "ply_data_train0.h5", "w") as f:
        f["data"] = data.astype(np.float32)
        f["normal"] = normals.astype(np.float32)
        f["label"] = labels.astype(np.int64)[:, None]
    with h5py.File(root / "ply_data_test0.h5", "w") as f:
        f["data"] = data.astype(np.float32)
        f["normal"] = normals.astype(np.float32)
        f["label"] = labels.astype(np.int64)[:, None]

    (root / "shape_names.txt").write_text("airplane\nbed\n")
    (root / "train_files.txt").write_text("ply_data_train0.h5\n")
    (root / "test_files.txt").write_text("ply_data_test0.h5\n")
    (root / "half1.txt").write_text("airplane\nbed\n")
    return str(root)


@pytest.fixture(scope="module")
def cfg(modelnet_root):
    return Config({
        "dataset": "modelnet", "root": modelnet_root,
        "train_categoryfile": os.path.join(modelnet_root, "half1.txt"),
        "val_categoryfile": os.path.join(modelnet_root, "half1.txt"),
        "test_categoryfile": os.path.join(modelnet_root, "half1.txt"),
        "augment_noise": 0.005, "perturb_pose": "small",
        "train_batch_size": 2, "val_batch_size": 2, "test_batch_size": 1,
        # single-device workflow on the 8-device test mesh
        "allow_replicated_train_batch": True,
        "overlap_radius": 0.15, "partial": [0.7, 0.7], "num_points": 256,
        "noise_type": "crop", "rot_mag": 45.0, "trans_mag": 0.5,
        "niter": 4,  # 4 steps only
        "optimizer": "AdamW", "base_lr": 1e-4, "weight_decay": 1e-4,
        "grad_clip": 0.1, "scheduler": "step", "scheduler_param": [1000, 0.5],
        "num_layers": 2, "neighborhood_limits": [12, 12],
        "aggregation_mode": "sum", "first_subsampling_dl": 0.1,
        "first_feats_dim": 32, "fixed_kernel_points": "center",
        "in_feats_dim": 1, "in_points_dim": 3, "conv_radius": 2.75,
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
        "point_capacity": 512, "pyramid_capacities": [512, 128],
    })


def test_modelnet_end_to_end(cfg, tmp_path):
    train_loader = get_dataloader(cfg, "train", num_workers=1)
    val_loader = get_dataloader(cfg, "val", num_workers=1)
    assert train_loader.n0 == 512

    batch = next(iter(train_loader))
    assert batch["src_xyz"].shape == (2, 512, 3)
    assert batch["src_mask"].sum() > 0

    spec = PyramidSpec.from_config(cfg, cfg["pyramid_capacities"])
    model = get_model(cfg["model"])(cfg=dict(cfg))
    trainer = Trainer(cfg, str(tmp_path / "run"), niter=4,
                      nb_sanity_val_steps=1, validate_every=4)
    state = trainer.fit(model, spec, train_loader, val_loader)
    assert int(state.step) == 4

    # checkpoint written + best tracked
    assert trainer.saver.latest_step() == 4

    # protocol evaluation over the (tiny) test set
    from fgfusion_tpu.data.loader import make_dataset
    dataset = make_dataset(cfg, "test")
    results = trainer.test(model, spec, dataset,
                           resume=str(tmp_path / "run" / "ckpt"),
                           benchmark_name="ModelNet")
    assert "summary" in results
    s = results["summary"]
    for key in ("r_rmse", "r_mae", "t_rmse", "err_r_deg_mean", "chamfer_dist"):
        assert np.isfinite(s[key])
    assert os.path.exists(tmp_path / "run" / "pred_transforms.npy")
    poses = np.load(tmp_path / "run" / "pred_transforms.npy")
    assert poses.shape == (len(dataset), 3, 4)


class _VariedSizeDataset:
    """Wraps a dataset, inflating some samples past the base bucket to
    exercise the eval bucket ladder."""

    def __init__(self, dataset, inflate_idx, n_target):
        self.dataset = dataset
        self.inflate_idx = inflate_idx
        self.n_target = n_target

    def __len__(self):
        return min(len(self.dataset), 3)

    def __getitem__(self, idx, rng=None):
        s = dict(self.dataset.__getitem__(idx))
        if idx == self.inflate_idx:
            for key in ("src_xyz", "tgt_xyz"):
                pts = s[key]
                reps = int(np.ceil(self.n_target / len(pts)))
                s[key] = (np.tile(pts, (reps, 1))[: self.n_target]
                          + np.random.default_rng(0).normal(
                              scale=1e-3, size=(self.n_target, 3))
                          ).astype(np.float32)
            for key in ("src_overlap", "tgt_overlap"):
                if key in s:
                    ov = np.asarray(s[key])
                    reps = int(np.ceil(self.n_target / len(ov)))
                    s[key] = np.tile(ov, reps)[: self.n_target]
        return s


def test_scale_spec_proportional():
    from fgfusion_tpu.ops.pyramid import scale_spec
    spec = PyramidSpec(
        architecture=("simple", "resnetb_strided", "resnetb"),
        first_subsampling_dl=0.1, conv_radius=2.75,
        neighborhood_limits=(12, 12), capacities=(512, 128))
    s2 = scale_spec(spec, 1024)
    assert s2.capacities == (1024, 256)
    assert scale_spec(spec, 512) is spec
    # eval headroom widens only the deeper levels (rounded up to 64)
    s3 = scale_spec(spec, 1024, headroom=1.35)
    assert s3.capacities == (1024, 384)   # ceil64(128*2*1.35=345.6)
    s4 = scale_spec(spec, 512, headroom=1.35)
    assert s4.capacities == (512, 192)    # same bucket, wider levels


def test_multibucket_eval(cfg, tmp_path):
    """Pairs exceeding the base bucket pick a larger bucket instead of
    being subsampled; pairs exceeding the largest bucket are counted."""
    cfg = Config(dict(cfg))
    train_loader = get_dataloader(cfg, "train", num_workers=1)
    val_loader = get_dataloader(cfg, "val", num_workers=1)
    spec = PyramidSpec.from_config(cfg, cfg["pyramid_capacities"])
    model = get_model(cfg["model"])(cfg=dict(cfg))
    trainer = Trainer(cfg, str(tmp_path / "run"), niter=1,
                      nb_sanity_val_steps=0, validate_every=1)
    trainer.fit(model, spec, train_loader, val_loader)

    from fgfusion_tpu.data.loader import make_dataset
    # base samples are 717 points (the Predator resample quirk);
    # sample 1 is inflated past the 768 bucket
    dataset = _VariedSizeDataset(make_dataset(cfg, "test"),
                                 inflate_idx=1, n_target=1000)

    cfg["eval_buckets"] = [768, 1280]
    results = trainer.test(model, spec, dataset,
                           resume=str(tmp_path / "run" / "ckpt"),
                           benchmark_name="ModelNet")
    assert results["n_subsampled"] == 0
    assert np.isfinite(results["summary"]["err_r_deg_mean"])

    cfg["eval_buckets"] = [768]
    results = trainer.test(model, spec, dataset,
                           resume=str(tmp_path / "run" / "ckpt"),
                           benchmark_name="ModelNet")
    assert results["n_subsampled"] == 1
