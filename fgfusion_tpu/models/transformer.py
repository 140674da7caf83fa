"""Cross-attention transformer encoder (DETR-style, both clouds updated
per layer).

Reference: models/transformer/transformers.py. TPU-first differences:
- batch-first (B, N, D) padded tensors with boolean key masks — no
  ragged pad/unpad churn;
- attention is one fused dot_product_attention per (self, cross) pair,
  masked via additive -1e9 bias on invalid keys;
- the per-layer intermediates are stacked into (L, B, N, D), the
  fixed-shape analogue of the reference's return_intermediate stacks.

Weight-sharing parity: within a layer, the SAME self-attention module
processes src and tgt, the SAME cross-attention module handles both
directions, and the FFN is shared (reference transformers.py:134-163).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .res2net import torch_linear_init

xavier_uniform = nn.initializers.xavier_uniform()


class MultiheadAttention(nn.Module):
    """torch-style MHA: packed qkv projections + out projection, all
    with bias; softmax over keys with key-padding mask. `dtype` is the
    computation dtype (params stay f32); the attention softmax always
    accumulates in f32."""

    d_model: int
    nhead: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, query, key, value, key_mask: Optional[jnp.ndarray] = None):
        """query (B, Nq, D), key/value (B, Nk, D), key_mask (B, Nk) True=valid."""
        d_head = self.d_model // self.nhead
        b, nq, _ = query.shape
        nk = key.shape[1]
        cdt = jnp.dtype(self.dtype)

        q = nn.Dense(self.d_model, kernel_init=xavier_uniform, dtype=cdt,
                     name="q_proj")(query)
        k = nn.Dense(self.d_model, kernel_init=xavier_uniform, dtype=cdt,
                     name="k_proj")(key)
        v = nn.Dense(self.d_model, kernel_init=xavier_uniform, dtype=cdt,
                     name="v_proj")(value)

        q = q.reshape(b, nq, self.nhead, d_head)
        k = k.reshape(b, nk, self.nhead, d_head)
        v = v.reshape(b, nk, self.nhead, d_head)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(d_head).astype(logits.dtype)
        if key_mask is not None:
            bias = jnp.where(key_mask[:, None, None, :], 0.0, -1e9)
            logits = logits + bias
        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(cdt), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, nq, self.d_model)
        return nn.Dense(self.d_model, kernel_init=torch_linear_init, dtype=cdt,
                        name="out_proj")(out).astype(jnp.float32)


class TransformerCrossEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = True
    sa_val_has_pos_emb: bool = False
    ca_val_has_pos_emb: bool = False
    activation: str = "relu"
    dtype: str = "float32"

    def _act(self, x):
        return nn.relu(x) if self.activation == "relu" else nn.gelu(x)

    @nn.compact
    def __call__(self, src, tgt, src_mask, tgt_mask, src_pos=None, tgt_pos=None):
        sa = MultiheadAttention(self.d_model, self.nhead, dtype=self.dtype,
                                name="self_attn")
        ca = MultiheadAttention(self.d_model, self.nhead, dtype=self.dtype,
                                name="cross_attn")
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        norm3 = nn.LayerNorm(name="norm3")
        cdt = jnp.dtype(self.dtype)
        ffn1 = nn.Dense(self.dim_feedforward, kernel_init=torch_linear_init,
                        dtype=cdt, name="linear1")
        ffn2 = nn.Dense(self.d_model, kernel_init=torch_linear_init,
                        dtype=cdt, name="linear2")

        def with_pos(x, pos):
            return x if pos is None else x + pos

        if self.pre_norm:
            # reference forward_pre (transformers.py:183-244)
            src2 = norm1(src)
            src2p = with_pos(src2, src_pos)
            src = src + sa(src2p, src2p,
                           src2p if self.sa_val_has_pos_emb else src2, src_mask)
            tgt2 = norm1(tgt)
            tgt2p = with_pos(tgt2, tgt_pos)
            tgt = tgt + sa(tgt2p, tgt2p,
                           tgt2p if self.sa_val_has_pos_emb else tgt2, tgt_mask)

            src2, tgt2 = norm2(src), norm2(tgt)
            src2p, tgt2p = with_pos(src2, src_pos), with_pos(tgt2, tgt_pos)
            src3 = ca(src2p, tgt2p,
                      tgt2p if self.ca_val_has_pos_emb else tgt2, tgt_mask)
            tgt3 = ca(tgt2p, src2p,
                      src2p if self.ca_val_has_pos_emb else src2, src_mask)
            src, tgt = src + src3, tgt + tgt3

            src = src + ffn2(self._act(ffn1(norm3(src))))
            tgt = tgt + ffn2(self._act(ffn1(norm3(tgt))))
        else:
            # reference forward_post (transformers.py:121-181)
            srcp = with_pos(src, src_pos)
            src = norm1(src + sa(srcp, srcp,
                                 srcp if self.sa_val_has_pos_emb else src, src_mask))
            tgtp = with_pos(tgt, tgt_pos)
            tgt = norm1(tgt + sa(tgtp, tgtp,
                                 tgtp if self.sa_val_has_pos_emb else tgt, tgt_mask))

            srcp, tgtp = with_pos(src, src_pos), with_pos(tgt, tgt_pos)
            src2 = ca(srcp, tgtp, tgtp if self.ca_val_has_pos_emb else tgt, tgt_mask)
            tgt2 = ca(tgtp, srcp, srcp if self.ca_val_has_pos_emb else src, src_mask)
            src, tgt = norm2(src + src2), norm2(tgt + tgt2)

            src = norm3(src + ffn2(self._act(ffn1(src))))
            tgt = norm3(tgt + ffn2(self._act(ffn1(tgt))))

        return src, tgt


class _ScanBody(nn.Module):
    """One cross-encoder layer in nn.scan form: carry = (src, tgt),
    per-step output = the post-layer features (the intermediates)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    pre_norm: bool
    sa_val_has_pos_emb: bool
    ca_val_has_pos_emb: bool
    activation: str
    dtype: str

    @nn.compact
    def __call__(self, carry, broadcast_args):
        src, tgt = carry
        src_mask, tgt_mask, src_pos, tgt_pos = broadcast_args
        src, tgt = TransformerCrossEncoderLayer(
            self.d_model, self.nhead, self.dim_feedforward,
            pre_norm=self.pre_norm,
            sa_val_has_pos_emb=self.sa_val_has_pos_emb,
            ca_val_has_pos_emb=self.ca_val_has_pos_emb,
            activation=self.activation, dtype=self.dtype,
            name="layer")(src, tgt, src_mask, tgt_mask, src_pos, tgt_pos)
        return (src, tgt), (src, tgt)


class TransformerCrossEncoder(nn.Module):
    """N layers; returns per-layer normalized intermediates stacked as
    (L, B, N, D) for src and tgt (reference transformers.py:27-59 with
    return_intermediate=True).

    scan_layers=True runs the stack as a lax.scan with stacked params
    (L, ...) — identical math, ~L-times smaller HLO, much faster XLA
    compiles. Checkpoints are not interchangeable between the two
    layouts, so pick one per experiment.
    """

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 2048
    pre_norm: bool = True
    sa_val_has_pos_emb: bool = False
    ca_val_has_pos_emb: bool = False
    activation: str = "relu"
    dtype: str = "float32"
    scan_layers: bool = False

    @nn.compact
    def __call__(self, src, tgt, src_mask, tgt_mask, src_pos=None, tgt_pos=None):
        final_norm = nn.LayerNorm(name="norm") if self.pre_norm else None

        if self.scan_layers:
            scanned = nn.scan(
                _ScanBody,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                out_axes=0,
                length=self.num_layers,
            )(self.d_model, self.nhead, self.dim_feedforward, self.pre_norm,
              self.sa_val_has_pos_emb, self.ca_val_has_pos_emb,
              self.activation, self.dtype, name="layers")
            (_, _), (src_stack, tgt_stack) = scanned(
                (src, tgt), (src_mask, tgt_mask, src_pos, tgt_pos))
            if final_norm is not None:
                src_stack = final_norm(src_stack)
                tgt_stack = final_norm(tgt_stack)
            return src_stack, tgt_stack

        src_inter, tgt_inter = [], []
        for i in range(self.num_layers):
            src, tgt = TransformerCrossEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                pre_norm=self.pre_norm,
                sa_val_has_pos_emb=self.sa_val_has_pos_emb,
                ca_val_has_pos_emb=self.ca_val_has_pos_emb,
                activation=self.activation,
                dtype=self.dtype,
                name=f"layer_{i}")(src, tgt, src_mask, tgt_mask, src_pos, tgt_pos)
            if final_norm is not None:
                src_inter.append(final_norm(src))
                tgt_inter.append(final_norm(tgt))
            else:
                src_inter.append(src)
                tgt_inter.append(tgt)
        return jnp.stack(src_inter), jnp.stack(tgt_inter)
