"""Multi-scale residual KPConv block (KPConv_MSRes).

Reference: models/backbone_kpconv/kpconv_res2net.py:9-66 — present in
the reference tree but never imported by any model (verified dead
upstream); implemented here for inventory completeness in the masked
fixed-shape idiom.

Two kernel-point convolutions over the SAME neighbor table at two
kernel scales — a 7-point kernel laid out at radius*1.5 and a 13-point
kernel at radius — each producing out_dim/2 channels, cross-mixed and
concatenated:

    x1 = IN(KPConv_p7@1.5r(x));  x2 = IN(KPConv_p13@r(x))
    x2 = mix(x1 + x2)            # Dense out/2 -> out/2, no bias
    out = relu(BN(Dense(concat(x1, x2))))

Reference quirks preserved / documented:
- `mini2mid_linear`/`mini2mid_norm` AND `midmini_norm` are constructed
  upstream but never used in forward (kpconv_res2net.py:44-48; the
  forward at :55-66 applies only `midmini_linear`) — dead parameters;
  we do not create them (a flax module that never runs would only
  distort param-count parity).
- the final `self.relu(out)` (kpconv_res2net.py:64) is an
  nn.ReLU(inplace=True) whose return value is discarded — inplace
  mutation means the ReLU IS applied to `out`; we apply it explicitly.
- there is no residual shortcut despite the block's name.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .kpconv import KPConvOp
from .norm import MaskedBatchNorm, MaskedInstanceNorm
from .res2net import torch_linear_init

__all__ = ["KPConvMSRes"]


class KPConvMSRes(nn.Module):
    """Args mirror the reference ctor: feature dims, the level's conv
    radius, and the shared config dict (KP influence/aggregation/BN
    settings)."""

    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    cfg: dict

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_idx, x, mask_post,
                 train: bool = True):
        """q_pts (C,Nq,3), s_pts (C,Ns,3), neighb_idx (C,Nq,K),
        x (C,Ns,Cin), mask_post (C,Nq) -> (C,Nq,out_dim)."""
        cfg = self.cfg
        half = self.out_dim // 2
        deform = "deform" in self.block_name

        def conv(p, r, name):
            extent = r * cfg["KP_extent"] / cfg["conv_radius"]
            return KPConvOp(
                num_kernel_points=p, in_dim=self.in_dim, out_dim=half,
                extent=extent, radius=r,
                fixed_kernel_points=cfg["fixed_kernel_points"],
                influence=cfg["KP_influence"],
                aggregation=cfg["aggregation_mode"],
                deformable=deform, modulated=cfg.get("modulated", False),
                compute_dtype=cfg.get("compute_dtype", "float32"),
                name=name)

        # 7-point kernel at 1.5x radius (kpconv_res2net.py:18-29)
        x1 = conv(7, self.radius * 1.5, "kpconv_mini")(
            q_pts, s_pts, neighb_idx, x)
        x1 = MaskedInstanceNorm(name="norm_mini")(x1, mask_post)
        # 13-point kernel at the level radius (kpconv_res2net.py:31-41)
        x2 = conv(13, self.radius, "kpconv_mid")(
            q_pts, s_pts, neighb_idx, x)
        x2 = MaskedInstanceNorm(name="norm_mid")(x2, mask_post)

        # cross-scale mix (kpconv_res2net.py:47,59; midmini_norm is
        # dead upstream — not applied)
        x2 = nn.Dense(half, use_bias=False, kernel_init=torch_linear_init,
                      name="midmini_linear")(x1 + x2)

        out = jnp.concatenate([x1, x2], axis=-1)
        out = nn.Dense(self.out_dim, use_bias=False,
                       kernel_init=torch_linear_init,
                       name="final_conv")(out)
        out = MaskedBatchNorm(features=self.out_dim, name="final_norm")(
            out, mask_post, use_running_average=not train)
        return nn.relu(out)
