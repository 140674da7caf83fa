"""Feature-space losses: InfoNCE with a learned bilinear metric, and
circle loss — batched, masked, fixed-shape.

Reference: models/losses/feature_loss.py. Both losses there loop
python-level over the batch on ragged tensors; here everything is one
(B, N, ...) masked computation. The InfoNCE `W` is a trained parameter
*inside the loss* (reference feature_loss.py:261) — it therefore lives
in the model's param tree (the RegTR module instantiates these).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-6
_INF = 1e9


def masked_cdist2(a, b, a_mask, b_mask):
    """Squared pairwise distances (..., Na, Nb); invalid rows/cols = +inf.

    Uses a full-precision cross term: boundary classification against
    r_p/r_n must not wobble with the TPU's default bf16 matmul pass.
    """
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    cross = jnp.einsum("...nc,...mc->...nm", a, b,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = a2[..., :, None] - 2 * cross + b2[..., None, :]
    d2 = jnp.maximum(d2, 0.0)
    invalid = ~(a_mask[..., :, None] & b_mask[..., None, :])
    return jnp.where(invalid, _INF, d2)


class InfoNCELossFull(nn.Module):
    """InfoNCE over all coarse points (reference feature_loss.py:246-314).

    logit(i, j) = f_i^T (triu(W) + triu(W)^T) g_j
    positive(i) = nearest j if dist < r_p; candidates within r_n of i
    (other than the positive) are excluded from the logsumexp.
    """

    d_embed: int
    r_p: float
    r_n: float

    @nn.compact
    def __call__(self, anchor_feat, positive_feat, anchor_xyz, positive_xyz,
                 anchor_mask, positive_mask):
        """All inputs (B, N, .): returns the scalar mean loss over valid
        anchors with a positive match, averaged like the reference
        (per-cloud mean over anchors, then mean over batch)."""
        W = self.param("W", nn.initializers.normal(stddev=0.1),
                       (self.d_embed, self.d_embed))
        W_triu = jnp.triu(W)
        W_sym = W_triu + W_triu.T

        logits = jnp.einsum("bic,cd,bjd->bij", anchor_feat, W_sym, positive_feat)

        d2 = masked_cdist2(anchor_xyz, positive_xyz, anchor_mask, positive_mask)
        d2 = jax.lax.stop_gradient(d2)
        nearest = jnp.argmin(d2, axis=-1)                         # (B, Na)
        d_min = jnp.take_along_axis(d2, nearest[..., None], axis=-1)[..., 0]
        has_pos = (d_min < self.r_p ** 2) & anchor_mask            # (B, Na)

        ignore = d2 < self.r_n ** 2                                # (B, Na, Np)
        onehot = jax.nn.one_hot(nearest, d2.shape[-1], dtype=bool)
        ignore = ignore & ~onehot
        ignore = ignore | ~positive_mask[:, None, :]               # mask padding

        masked_logits = jnp.where(ignore, -_INF, logits)
        pos_logit = jnp.take_along_axis(masked_logits, nearest[..., None],
                                        axis=-1)[..., 0]
        loss_i = -pos_logit + jax.scipy.special.logsumexp(masked_logits, axis=-1)

        w = has_pos.astype(loss_i.dtype)
        per_cloud = jnp.sum(loss_i * w, axis=-1) / jnp.clip(jnp.sum(w, axis=-1),
                                                            1.0, None)
        return jnp.mean(per_cloud)


class CircleLossSampled(nn.Module):
    """Circle loss on `n_sample` randomly drawn GT correspondences per
    pair (reference feature_loss.py:52-157 CircleLoss — whose sampled
    path calls an undefined `radius_search` at :133 and is therefore a
    latent bug upstream; this is the working fixed-shape version).

    Correspondence sampling happens on device from a precomputed
    correspondence table (B, 2, K) with -1 padding.
    """

    log_scale: float = 10.0
    r_p: float = 0.125
    r_n: float = 0.25
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    n_sample: int = 256
    dist_type: str = "euclidean"

    @nn.compact
    def __call__(self, key, src_feat, tgt_feat, src_xyz, tgt_xyz,
                 correspondences, corr_mask):
        """correspondences (B, 2, K) int32 (-1 pad), corr_mask (B, K)."""
        import jax.random as jr
        b, _, kmax = correspondences.shape

        def pick(key_b, corr, m):
            logits = jnp.where(m, 0.0, -1e9)
            # sample with replacement proportional to validity
            idx = jr.categorical(key_b, logits, shape=(self.n_sample,))
            return corr[0][idx], corr[1][idx]

        keys = jr.split(key, b)
        src_idx, tgt_idx = jax.vmap(pick)(keys, correspondences, corr_mask)

        sf = jnp.take_along_axis(src_feat, src_idx[..., None], axis=1)
        tf = jnp.take_along_axis(tgt_feat, tgt_idx[..., None], axis=1)
        sx = jnp.take_along_axis(src_xyz, src_idx[..., None], axis=1)
        tx = jnp.take_along_axis(tgt_xyz, tgt_idx[..., None], axis=1)
        full = CircleLossFull(log_scale=self.log_scale, r_p=self.r_p,
                              r_n=self.r_n, pos_margin=self.pos_margin,
                              neg_margin=self.neg_margin,
                              dist_type=self.dist_type, name="full")
        ones = jnp.ones(sf.shape[:2], bool)
        return full(sf, tf, sx, tx, ones, ones)


class CircleLossFull(nn.Module):
    """Full-matrix circle loss (reference feature_loss.py:160-243),
    selectable via feature_loss_type: circle."""

    log_scale: float = 10.0
    r_p: float = 0.125
    r_n: float = 0.25
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    dist_type: str = "euclidean"

    def _feat_dist(self, a, b):
        if self.dist_type == "euclidean":
            d2 = (jnp.sum(a * a, -1)[..., :, None]
                  - 2 * jnp.einsum("...nc,...mc->...nm", a, b,
                                   precision=jax.lax.Precision.HIGHEST)
                  + jnp.sum(b * b, -1)[..., None, :])
            return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)
        if self.dist_type == "cosine":
            num = jnp.einsum("...nc,...mc->...nm", a, b)
            den = jnp.clip(jnp.linalg.norm(a, axis=-1)[..., :, None]
                           * jnp.linalg.norm(b, axis=-1)[..., None, :], 1e-8, None)
            return 1.0 - num / den
        raise ValueError(self.dist_type)

    @nn.compact
    def __call__(self, anchor_feat, positive_feat, anchor_xyz, positive_xyz,
                 anchor_mask, positive_mask):
        coords_d2 = masked_cdist2(anchor_xyz, positive_xyz, anchor_mask,
                                  positive_mask)
        pos_mask = coords_d2 < self.r_p ** 2
        neg_mask = (coords_d2 > self.r_n ** 2) & (coords_d2 < _INF / 2)

        fd = self._feat_dist(anchor_feat, positive_feat)

        row_sel = (jnp.any(pos_mask, -1) & jnp.any(neg_mask, -1)) & anchor_mask
        col_sel = (jnp.any(pos_mask, -2) & jnp.any(neg_mask, -2)) & positive_mask

        pos = fd - 1e5 * (~pos_mask)
        pos_w = jax.lax.stop_gradient(jnp.clip(pos - self.pos_margin, 0.0, None))
        lse_pos_row = jax.scipy.special.logsumexp(
            self.log_scale * (pos - self.pos_margin) * pos_w, axis=-1)
        lse_pos_col = jax.scipy.special.logsumexp(
            self.log_scale * (pos - self.pos_margin) * pos_w, axis=-2)

        neg = fd + 1e5 * (~neg_mask)
        neg_w = jax.lax.stop_gradient(jnp.clip(self.neg_margin - neg, 0.0, None))
        lse_neg_row = jax.scipy.special.logsumexp(
            self.log_scale * (self.neg_margin - neg) * neg_w, axis=-1)
        lse_neg_col = jax.scipy.special.logsumexp(
            self.log_scale * (self.neg_margin - neg) * neg_w, axis=-2)

        loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / self.log_scale
        loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / self.log_scale

        def masked_mean(x, sel):
            s = sel.astype(x.dtype)
            return jnp.sum(x * s, -1) / jnp.clip(jnp.sum(s, -1), 1.0, None)

        per_cloud = (masked_mean(loss_row, row_sel)
                     + masked_mean(loss_col, col_sel)) / 2.0
        return jnp.mean(per_cloud)
