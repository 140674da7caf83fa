"""RegTR: end-to-end registration network with fine-grained (Res2Net)
feature fusion in the KPConv backbone.

Reference: models/finegrained_regtr.py. Pipeline (forward):
  stacked (src+tgt) padded clouds
  -> on-device pyramid (ops.build_pyramid; the reference preprocesses
     with MinkowskiEngine/PyTorch3D *outside* the compiled graph every
     step)
  -> KPConv+Res2Net encoder (coarsest-level features)
  -> Dense projection to d_embed (feat_proj)
  -> sine/learned position embedding
  -> self/cross transformer (per-layer intermediates)
  -> correspondence regressor or attention decoder (per-layer warped
     keypoints + overlap logits)
  -> confidence-gated weighted Kabsch pose per (layer, pair), batched

Everything is fixed-shape and jit-compiles end-to-end, including the
pose SVD. The ragged List[Tensor] interfaces of the reference become
(B, N, .) arrays + masks; `stack_lengths` bookkeeping disappears.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import register_model
from ..geometry.se3 import (compute_rigid_transform,
                            fast_compute_rigid_transform, se3_inv,
                            se3_transform)
from ..losses.corr_loss import corr_criterion
from ..losses.feature_loss import CircleLossFull, InfoNCELossFull
from ..ops.kpconv_meta import compute_overlaps
from ..ops.pyramid import PyramidSpec, build_pyramid
from .backbone import KPFEncoder
from .position_embedding import (PositionEmbeddingCoordsSine,
                                 PositionEmbeddingLearned)
from .res2net import torch_linear_init
from .transformer import TransformerCrossEncoder


class CorrespondenceRegressor(nn.Module):
    """3-layer MLP -> 3 coords; Dense -> 1 overlap logit
    (reference finegrained_regtr.py:411-455)."""

    d_embed: int

    @nn.compact
    def __call__(self, feats):
        """feats (L, B, N, D) -> corr (L, B, N, 3), overlap (L, B, N, 1)."""
        h = feats
        h = nn.relu(nn.Dense(self.d_embed, kernel_init=torch_linear_init)(h))
        h = nn.relu(nn.Dense(self.d_embed, kernel_init=torch_linear_init)(h))
        corr = nn.Dense(3, kernel_init=torch_linear_init)(h)
        overlap = nn.Dense(1, kernel_init=torch_linear_init,
                           name="conf_logits_decoder")(feats)
        return corr, overlap


class CorrespondenceDecoder(nn.Module):
    """Attention-based coordinate decoder (direct_regress_coor: False;
    reference finegrained_regtr.py:312-408): a single-head attention
    where only q/k are projected and the value is the *other cloud's
    coordinates*."""

    d_embed: int
    use_pos_emb: bool = True

    @nn.compact
    def __call__(self, src_feats, tgt_feats, src_xyz, tgt_xyz,
                 src_mask, tgt_mask, src_pe=None, tgt_pe=None):
        q_proj = nn.Dense(self.d_embed, kernel_init=torch_linear_init,
                          name="q_proj")
        k_proj = nn.Dense(self.d_embed, kernel_init=torch_linear_init,
                          name="k_proj")
        conf = nn.Dense(1, kernel_init=torch_linear_init,
                        name="conf_logits_decoder")

        def simple_attention(query, key, value, key_mask):
            q = q_proj(query) / jnp.sqrt(query.shape[-1]).astype(query.dtype)
            k = k_proj(key)
            attn = jnp.einsum("lbqd,lbsd->lbqs", q, k)
            attn = attn + jnp.where(key_mask[None, :, None, :], 0.0, -1e9)
            attn = jax.nn.softmax(attn, axis=-1)
            return jnp.einsum("lbqs,bsd->lbqd", attn, value)

        src_in = src_feats + src_pe[None] if self.use_pos_emb else src_feats
        tgt_in = tgt_feats + tgt_pe[None] if self.use_pos_emb else tgt_feats

        src_corr = simple_attention(src_in, tgt_in, tgt_xyz, tgt_mask)
        tgt_corr = simple_attention(tgt_in, src_in, src_xyz, src_mask)
        return src_corr, tgt_corr, conf(src_feats), conf(tgt_feats)


@register_model("finegrained_regtr.RegTR")
@register_model("regtr.RegTR")
class RegTR(nn.Module):
    """Flagship model. `cfg` is the flat config dict (see conf/*.yaml —
    schema kept identical to the reference's)."""

    cfg: Any

    def setup(self):
        cfg = dict(self.cfg)
        if cfg.get("dropout", 0.0):
            # every reference config uses dropout 0.0 (and notes it is
            # "not compatible", conf/modelnet.yaml:69); fail loudly
            # rather than silently ignoring a nonzero setting
            raise NotImplementedError(
                "dropout > 0 is not supported (reference configs all use 0.0)")
        self.kpf_encoder = KPFEncoder(cfg, name="kpf_encoder")
        self.feat_proj = nn.Dense(cfg["d_embed"], use_bias=True,
                                  kernel_init=torch_linear_init,
                                  name="feat_proj")
        if cfg.get("pos_emb_type", "sine") == "sine":
            self.pos_embed = PositionEmbeddingCoordsSine(
                3, cfg["d_embed"], scale=cfg.get("pos_emb_scaling", 1.0),
                name="pos_embed")
        else:
            self.pos_embed = PositionEmbeddingLearned(3, cfg["d_embed"],
                                                      name="pos_embed")

        self.transformer_encoder = TransformerCrossEncoder(
            d_model=cfg["d_embed"], nhead=cfg["nhead"],
            num_layers=cfg["num_encoder_layers"],
            dim_feedforward=cfg["d_feedforward"],
            pre_norm=cfg["pre_norm"],
            sa_val_has_pos_emb=cfg["sa_val_has_pos_emb"],
            ca_val_has_pos_emb=cfg["ca_val_has_pos_emb"],
            activation=cfg.get("transformer_act", "relu"),
            dtype=cfg.get("compute_dtype", "float32"),
            scan_layers=cfg.get("scan_layers", False),
            name="transformer_encoder")

        if cfg.get("direct_regress_coor", False):
            self.correspondence_decoder = CorrespondenceRegressor(
                cfg["d_embed"], name="correspondence_decoder")
        else:
            self.correspondence_decoder = CorrespondenceDecoder(
                cfg["d_embed"], use_pos_emb=cfg["corr_decoder_has_pos_emb"],
                name="correspondence_decoder")

        if cfg.get("feature_loss_type", "infonce") == "infonce":
            # the InfoNCE bilinear W is a *trained* parameter of the model
            # (reference feature_loss.py:261)
            self.feature_criterion = InfoNCELossFull(
                cfg["d_embed"], r_p=cfg["r_p"], r_n=cfg["r_n"],
                name="feature_criterion")
            self.feature_criterion_un = InfoNCELossFull(
                cfg["d_embed"], r_p=cfg["r_p"], r_n=cfg["r_n"],
                name="feature_criterion_un")
        else:
            self.feature_criterion = CircleLossFull(
                r_p=cfg["r_p"], r_n=cfg["r_n"], name="feature_criterion")
            self.feature_criterion_un = self.feature_criterion

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jax.Array], spec: PyramidSpec,
                 train: bool = True) -> Dict[str, jax.Array]:
        cfg = dict(self.cfg)
        b = batch["src_xyz"].shape[0]

        # ---- stack src+tgt on the cloud axis & build the pyramid -----
        points = jnp.concatenate([batch["src_xyz"], batch["tgt_xyz"]], axis=0)
        masks = jnp.concatenate([batch["src_mask"], batch["tgt_mask"]], axis=0)
        meta = build_pyramid(points, masks, spec)

        feats0 = jnp.ones(points.shape[:2] + (cfg["in_feats_dim"],),
                          dtype=points.dtype)

        # ---- KPConv + Res2Net encoder --------------------------------
        feats_un, _ = self.kpf_encoder(feats0, meta, train=train)
        both_feats_un = self.feat_proj(feats_un)

        xyz_c = meta["points"][-1]
        mask_c = meta["masks"][-1]
        pe = self.pos_embed(jnp.where(mask_c[..., None], xyz_c, 0.0))

        src_feats, tgt_feats = both_feats_un[:b], both_feats_un[b:]
        src_xyz_c, tgt_xyz_c = xyz_c[:b], xyz_c[b:]
        src_mask_c, tgt_mask_c = mask_c[:b], mask_c[b:]
        src_pe, tgt_pe = pe[:b], pe[b:]

        # ---- cross transformer ----------------------------------------
        use_pe = cfg.get("transformer_encoder_has_pos_emb", True)
        src_cond, tgt_cond = self.transformer_encoder(
            src_feats, tgt_feats, src_mask_c, tgt_mask_c,
            src_pe if use_pe else None, tgt_pe if use_pe else None)
        # (L, B, Nc, D) each

        # ---- correspondence decoding ----------------------------------
        if cfg.get("direct_regress_coor", False):
            src_corr, src_overlap = self.correspondence_decoder(src_cond)
            tgt_corr, tgt_overlap = self.correspondence_decoder(tgt_cond)
        else:
            src_corr, tgt_corr, src_overlap, tgt_overlap = \
                self.correspondence_decoder(
                    src_cond, tgt_cond, src_xyz_c, tgt_xyz_c,
                    src_mask_c, tgt_mask_c, src_pe, tgt_pe)

        # ---- confidence-gated pose (batched over layers x pairs) ------
        num_pred = src_corr.shape[0]
        src_xyz_t = jnp.broadcast_to(src_xyz_c[None], src_corr.shape)
        tgt_xyz_t = jnp.broadcast_to(tgt_xyz_c[None], tgt_corr.shape)
        pts_a = jnp.concatenate([src_xyz_t, tgt_corr], axis=2)   # (L,B,Ns+Nt,3)
        pts_b = jnp.concatenate([src_corr, tgt_xyz_t], axis=2)
        overlap_prob = jnp.concatenate([
            jax.nn.sigmoid(src_overlap[..., 0]),
            jax.nn.sigmoid(tgt_overlap[..., 0]),
        ], axis=2)
        both_mask = jnp.concatenate([src_mask_c, tgt_mask_c], axis=1)  # (B, Ns+Nt)
        weights = overlap_prob * both_mask[None].astype(overlap_prob.dtype)
        # padded correspondence coords carry the 1e6 sentinel; zero them
        # so 0-weighted points cannot poison the weighted centroids
        pts_a = jnp.where(both_mask[None, :, :, None], pts_a, 0.0)
        pts_b = jnp.where(both_mask[None, :, :, None], pts_b, 0.0)

        weight_th = cfg.get("test_weight_th", None)
        if cfg.get("use_fast_pose_solver", True):
            pose = fast_compute_rigid_transform(
                pts_a, pts_b, weights,
                weights_threshold=0.85 if weight_th is None else float(weight_th))
        else:
            pose = compute_rigid_transform(pts_a, pts_b, weights)

        return {
            "src_feat_un": src_feats,        # (B, Nc, D)
            "tgt_feat_un": tgt_feats,
            "src_feat": src_cond,            # (L, B, Nc, D)
            "tgt_feat": tgt_cond,
            "src_kp": src_xyz_c,             # (B, Nc, 3)
            "tgt_kp": tgt_xyz_c,
            "src_kp_warped": src_corr,       # (L, B, Nc, 3)
            "tgt_kp_warped": tgt_corr,
            "src_overlap": src_overlap,      # (L, B, Nc, 1) logits
            "tgt_overlap": tgt_overlap,
            "src_mask_c": src_mask_c,        # (B, Nc)
            "tgt_mask_c": tgt_mask_c,
            "pose": pose,                    # (L, B, 3, 4)
            "num_pred": num_pred,
            # occupancy counters for capacity-overflow monitoring
            # (levels>=1, 2B); compare against spec.capacities[1:]
            "n_voxels": jnp.stack(meta["n_voxels"]) if meta["n_voxels"]
                        else jnp.zeros((0, 2 * b), jnp.int32),
            # paged-gather page-list truncation counters (must stay 0;
            # see ops/paged_gather.py)
            "n_page_overflow": (jnp.stack(meta["n_page_overflow"])
                                if meta.get("n_page_overflow")
                                else jnp.zeros((0, 2 * b), jnp.int32)),
        }

    # ------------------------------------------------------------------
    def compute_loss(self, pred: Dict, batch: Dict, spec: PyramidSpec,
                     train: bool = True) -> Dict[str, jax.Array]:
        """Weighted multi-task loss (reference finegrained_regtr.py:252-309)."""
        cfg = dict(self.cfg)
        losses: Dict[str, jax.Array] = {}
        b = batch["src_xyz"].shape[0]
        pose_gt = batch["pose"]

        # GT overlap pyramid at the coarsest level
        points = jnp.concatenate([batch["src_xyz"], batch["tgt_xyz"]], axis=0)
        masks = jnp.concatenate([batch["src_mask"], batch["tgt_mask"]], axis=0)
        overlaps0 = jnp.concatenate([batch["src_overlap"], batch["tgt_overlap"]],
                                    axis=0).astype(jnp.float32)
        meta = build_pyramid(points, masks, spec)
        if "order" in meta:
            # level 0 was Morton-sorted inside build_pyramid; the
            # per-point GT overlap labels must follow the same order
            overlaps0 = jnp.take_along_axis(overlaps0, meta["order"], axis=1)
        overlap_pyr = compute_overlaps(overlaps0, meta)
        ov_c = overlap_pyr[-1]                         # (2B, Nc)
        src_ov_c, tgt_ov_c = ov_c[:b], ov_c[b:]

        # ---- overlap BCE (masked mean over all coarse points) ---------
        all_logits = jnp.concatenate(
            [pred["src_overlap"][..., 0], pred["tgt_overlap"][..., 0]], axis=-1)
        all_gt = jnp.concatenate([src_ov_c, tgt_ov_c], axis=-1)   # (B, Ns+Nt)
        all_m = jnp.concatenate([pred["src_mask_c"], pred["tgt_mask_c"]],
                                axis=-1).astype(jnp.float32)
        for i in cfg["overlap_loss_on"]:
            bce = _bce_with_logits(all_logits[i], all_gt)
            losses[f"overlap_{i}"] = (jnp.sum(bce * all_m)
                                      / jnp.clip(jnp.sum(all_m), 1.0, None))

        # ---- feature InfoNCE / circle ---------------------------------
        src_kp_gt = se3_transform(pose_gt, pred["src_kp"])
        for i in cfg["feature_loss_on"]:
            losses[f"feature_{i}"] = self.feature_criterion(
                pred["src_feat"][i], pred["tgt_feat"][i],
                src_kp_gt, pred["tgt_kp"],
                pred["src_mask_c"], pred["tgt_mask_c"])
        if cfg["wt_feature_un"] != 0.0:
            losses["feature_un"] = self.feature_criterion_un(
                pred["src_feat_un"], pred["tgt_feat_un"],
                src_kp_gt, pred["tgt_kp"],
                pred["src_mask_c"], pred["tgt_mask_c"])
        else:
            # The reference computes this unconditionally even though
            # every shipped config weights it 0 (finegrained_regtr.py
            # loss block) — a full masked Nc x Nc cdist + bilinear +
            # logsumexp and its backward for nothing. Gate it on the
            # weight, but still call the criterion on an 8-point slice
            # so its learned W is materialized and the parameter tree /
            # checkpoints stay schema-identical (XLA dead-code
            # eliminates the discarded compute).
            _ = self.feature_criterion_un(
                pred["src_feat_un"][:, :8], pred["tgt_feat_un"][:, :8],
                src_kp_gt[:, :8], pred["tgt_kp"][:, :8],
                pred["src_mask_c"][:, :8], pred["tgt_mask_c"][:, :8])
            losses["feature_un"] = jnp.zeros((), jnp.float32)

        # ---- correspondence loss --------------------------------------
        src_w = src_ov_c * pred["src_mask_c"]
        tgt_w = tgt_ov_c * pred["tgt_mask_c"]
        pose_gt_inv = se3_inv(pose_gt)
        for i in cfg["corr_loss_on"]:
            src_l = corr_criterion(pred["src_kp"], pred["src_kp_warped"][i],
                                   pose_gt, src_w)
            tgt_l = corr_criterion(pred["tgt_kp"], pred["tgt_kp_warped"][i],
                                   pose_gt_inv, tgt_w)
            losses[f"corr_{i}"] = src_l + tgt_l

        # ---- weighted total -------------------------------------------
        weights = {}
        for k in ("overlap", "feature", "corr"):
            for i in cfg.get(f"{k}_loss_on", [cfg["num_encoder_layers"] - 1]):
                weights[f"{k}_{i}"] = cfg.get(f"wt_{k}")
        weights["feature_un"] = cfg["wt_feature_un"]

        losses["total"] = sum(losses[k] * weights[k] for k in weights)
        return losses

    def forward_with_loss(self, batch, spec: PyramidSpec, train: bool = True):
        pred = self(batch, spec, train=train)
        losses = self.compute_loss(pred, batch, spec, train=train)
        return pred, losses

    # ------------------------------------------------------------------
    # Cumulative stage prefixes for the stage-latency breakdown
    # (parity with the reference's _TIMEIT instrumentation,
    # finegrained_regtr.py:112-231: preprocess / encoder / attention /
    # pose). Each is independently jittable; tools/profile_stages.py
    # times them and reports the per-stage deltas.
    # ------------------------------------------------------------------
    def run_preprocess(self, batch, spec: PyramidSpec):
        points = jnp.concatenate([batch["src_xyz"], batch["tgt_xyz"]], axis=0)
        masks = jnp.concatenate([batch["src_mask"], batch["tgt_mask"]], axis=0)
        return build_pyramid(points, masks, spec)

    def run_encoder(self, batch, spec: PyramidSpec):
        cfg = dict(self.cfg)
        meta = self.run_preprocess(batch, spec)
        feats0 = jnp.ones(meta["points"][0].shape[:2] + (cfg["in_feats_dim"],),
                          dtype=meta["points"][0].dtype)
        feats_un, _ = self.kpf_encoder(feats0, meta, train=False)
        return self.feat_proj(feats_un), meta

    def run_attention(self, batch, spec: PyramidSpec):
        cfg = dict(self.cfg)
        b = batch["src_xyz"].shape[0]
        both, meta = self.run_encoder(batch, spec)
        xyz_c, mask_c = meta["points"][-1], meta["masks"][-1]
        pe = self.pos_embed(jnp.where(mask_c[..., None], xyz_c, 0.0))
        use_pe = cfg.get("transformer_encoder_has_pos_emb", True)
        return self.transformer_encoder(
            both[:b], both[b:], mask_c[:b], mask_c[b:],
            pe[:b] if use_pe else None, pe[b:] if use_pe else None)


def _bce_with_logits(logits, targets):
    """Elementwise binary cross entropy on logits (torch
    BCEWithLogitsLoss semantics, numerically stable)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
