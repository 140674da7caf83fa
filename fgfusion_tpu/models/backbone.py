"""KPConv encoder: builds the block stack from the architecture string
list with the radius/channel doubling schedule.

Reference: KPFEncoder (finegrained_kpconv.py:22-95). Differences by
design: features are (C, N, D) masked arrays; the block list is
unrolled statically under jit (the architecture is config, not data).
The Res2Net fusion is always enabled in bottleneck blocks, matching the
reference's flag=True wiring (finegrained_kpconv.py:57-63).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn

from .kpconv import ResnetBottleneckBlock, SimpleBlock, UnaryBlock


def encoder_plan(cfg) -> Tuple[List[dict], List[int]]:
    """Static plan: one entry per encoder block, plus skip dims.

    Mirrors the construction loop at finegrained_kpconv.py:42-84."""
    r = cfg["first_subsampling_dl"] * cfg["conv_radius"]
    in_dim = cfg["in_feats_dim"]
    out_dim = cfg["first_feats_dim"]
    octave = 0

    plan, skip_dims = [], []
    blocks = list(cfg["architecture"])
    for block_i, block in enumerate(blocks):
        if any(tok in block for tok in ("pool", "strided", "upsample", "global")):
            skip_dims.append(in_dim)
        if "upsample" in block:
            break
        plan.append(dict(name=block, in_dim=in_dim, out_dim=out_dim,
                         radius=r, layer_ind=octave))
        in_dim = out_dim // 2 if "simple" in block else out_dim
        if "pool" in block or "strided" in block:
            octave += 1
            r *= 2
            out_dim *= 2
    else:
        skip_dims.append(in_dim)
    return plan, skip_dims


class KPFEncoder(nn.Module):
    """Stack of simple/resnetb/resnetb_strided blocks."""

    cfg: Any  # flat config dict

    @nn.compact
    def __call__(self, x, meta, train: bool = True):
        """x: (C, N0, in_feats_dim) features, meta: pyramid dict.
        Returns (features at coarsest level (C, N_L, D_out), skips)."""
        cfg = dict(self.cfg)
        plan, _ = encoder_plan(cfg)
        skips = []
        prev_layer = 0
        for i, p in enumerate(plan):
            if "strided" in p["name"] or "pool" in p["name"]:
                skips.append(x)
            if p["name"].startswith("simple"):
                x = SimpleBlock(p["name"], p["in_dim"], p["out_dim"], p["radius"],
                                p["layer_ind"], cfg, name=f"block_{i}")(x, meta)
            elif p["name"].startswith("resnetb"):
                x = ResnetBottleneckBlock(
                    p["name"], p["in_dim"], p["out_dim"], p["radius"],
                    p["layer_ind"], cfg, name=f"block_{i}")(x, meta, train=train)
            elif p["name"] == "unary":
                x = UnaryBlock(p["out_dim"], name=f"block_{i}")(
                    x, meta["masks"][p["layer_ind"]])
            else:
                raise ValueError(f"unsupported encoder block {p['name']!r}")
            prev_layer = p["layer_ind"]
        del prev_layer
        return x, skips

    @staticmethod
    def out_dim(cfg) -> int:
        plan, skip_dims = encoder_plan(dict(cfg))
        return skip_dims[-1]
