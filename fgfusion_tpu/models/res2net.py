"""Fine-grained (Res2Net) feature-fusion module.

This is the reference's architectural novelty: inside every KPConv
ResNet bottleneck, the second up-projection MLP is replaced by a
Res2Net multi-scale fusion block (reference: res2net.py:84-159 /
my_res2Net :231-265, wired at finegrained_kpconv_blocks.py:679,714).

Semantics (stype='normal', scale=s, baseWidth=w):
  1. project in_dim -> width*s (width = floor(out_dim * w / 64)), BN, ReLU
  2. split into s groups; for group i in [0, s-2]:
         h_i = ReLU(BN(Dense(h_{i-1} + group_i)))   (h_{-1} + g_0 = g_0)
     group s-1 passes through unchanged
  3. concat -> Dense(out_dim), BN
  4. residual: += Dense+BN downsample of the input (in_dim != out_dim)
  5. ReLU

TPU notes: the s-1 group MLPs are tiny (width x width); the sequential
hierarchy is inherent to Res2Net, but each step is a (C*N, width)
matmul which XLA fuses with the BN/ReLU epilogue. BatchNorm runs over
all valid points jointly (masked), matching the reference's
torch.nn.BatchNorm1d on the packed stack.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from .norm import MaskedBatchNorm

# torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class Res2NetFusion(nn.Module):
    in_dim: int
    out_dim: int
    base_width: int = 14
    scale: int = 8
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        width = int(math.floor(self.out_dim * (self.base_width / 64.0)))
        s = self.scale
        nums = 1 if s == 1 else s - 1

        out = nn.Dense(width * s, use_bias=False, kernel_init=torch_linear_init,
                       name="conv1")(x)
        out = MaskedBatchNorm(features=width * s, name="bn1")(
            out, mask, use_running_average=not train)
        out = nn.relu(out)

        groups = jnp.split(out, s, axis=-1)
        outs = []
        sp = None
        for i in range(nums):
            sp = groups[i] if i == 0 else sp + groups[i]
            sp = nn.Dense(width, use_bias=False, kernel_init=torch_linear_init,
                          name=f"conv_{i}")(sp)
            sp = MaskedBatchNorm(features=width, name=f"bn_{i}")(
                sp, mask, use_running_average=not train)
            sp = nn.relu(sp)
            outs.append(sp)
        if s != 1:
            outs.append(groups[-1])  # 'normal' stype: last split passes through
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Dense(self.out_dim, use_bias=False, kernel_init=torch_linear_init,
                       name="conv3")(out)
        out = MaskedBatchNorm(features=self.out_dim, name="bn3")(
            out, mask, use_running_average=not train)

        if self.in_dim != self.out_dim:
            res = nn.Dense(self.out_dim, use_bias=False,
                           kernel_init=torch_linear_init, name="down")(x)
            res = MaskedBatchNorm(features=self.out_dim, name="down_bn")(
                res, mask, use_running_average=not train)
        else:
            res = x

        return nn.relu(out + res)
