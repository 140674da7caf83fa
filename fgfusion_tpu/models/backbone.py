"""KPConv encoder: builds the block stack from the architecture string
list with the radius/channel doubling schedule.

Reference: KPFEncoder (finegrained_kpconv.py:22-95). Differences by
design: features are (C, N, D) masked arrays; the block list is
unrolled statically under jit (the architecture is config, not data).
The Res2Net fusion is always enabled in bottleneck blocks, matching the
reference's flag=True wiring (finegrained_kpconv.py:57-63).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

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
        # NOTE: a shared-per-level influence precomputation was tried
        # here and measured SLOWER on TPU (13.8 vs 15.4 pairs/s @12k):
        # materializing the (C,N,P,K) influence tensors to HBM and
        # re-reading them per block costs more than letting XLA fuse
        # the per-block geometry chain into each conv. Blocks therefore
        # compute influence inline (kpconv.kpconv_influence).
        # rematerialization trades recompute for activation memory —
        # the gathered (C,N,K,Cin) tensors dominate training HBM at
        # large buckets (config: remat_encoder: true). `train` is closed
        # over (it must stay a static python bool inside the blocks).
        remat = cfg.get("remat_encoder", False)

        def run_simple(block, *args):
            if remat:
                return nn.remat(lambda m, a, b: m(a, b))(block, *args)
            return block(*args)

        def run_resnetb(block, *args):
            if remat:
                return nn.remat(lambda m, a, b: m(a, b, train))(block, *args)
            return block(*args, train)

        skips = []
        for i, p in enumerate(plan):
            if "strided" in p["name"] or "pool" in p["name"]:
                skips.append(x)
            if p["name"].startswith("simple"):
                x = run_simple(SimpleBlock(
                    p["name"], p["in_dim"], p["out_dim"], p["radius"],
                    p["layer_ind"], cfg, name=f"block_{i}"), x, meta)
            elif p["name"].startswith("resnetb"):
                x = run_resnetb(ResnetBottleneckBlock(
                    p["name"], p["in_dim"], p["out_dim"], p["radius"],
                    p["layer_ind"], cfg, name=f"block_{i}"), x, meta)
            elif p["name"] == "unary":
                x = UnaryBlock(p["out_dim"], name=f"block_{i}")(
                    x, meta["masks"][p["layer_ind"]])
            elif p["name"] in ("max_pool", "max_pool_wide"):
                from .kpconv import max_pool
                x = max_pool(x, meta["pools"][p["layer_ind"]])
            elif p["name"] == "global_average":
                from .kpconv import global_average
                x = global_average(x, meta["masks"][p["layer_ind"]])
            else:
                raise ValueError(f"unsupported encoder block {p['name']!r}")
        return x, skips

    @staticmethod
    def out_dim(cfg) -> int:
        plan, skip_dims = encoder_plan(dict(cfg))
        return skip_dims[-1]


class KPFDecoder(nn.Module):
    """Upsampling decoder: nearest-upsample + skip-concat + unary
    blocks. Unused by RegTR (it runs attention on the coarsest level)
    but part of the backbone surface (reference
    finegrained_kpconv.py:97-170); useful for dense per-point heads.
    """

    cfg: Any

    @nn.compact
    def __call__(self, x, skips, meta, train: bool = True):
        from .kpconv import closest_pool
        cfg = dict(self.cfg)
        arch = list(cfg["architecture"])

        # locate the first upsample block and the octave there
        octave = 0
        start_i = 0
        for i, block in enumerate(arch):
            if "upsample" in block:
                start_i = i
                break
            if "pool" in block or "strided" in block:
                octave += 1

        skips = list(skips)
        in_dim = x.shape[-1]
        out_dim = in_dim
        x_all = []
        for j, block in enumerate(arch[start_i:]):
            concat_skip = j > 0 and "upsample" in arch[start_i + j - 1]
            if concat_skip:
                octave -= 1
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            mask = meta["masks"][octave]
            if block == "unary":
                x = UnaryBlock(out_dim, name=f"dec_{j}")(x, mask)
                if concat_skip:
                    x_all.append(x)
            elif block == "unary2":
                h = nn.Dense(x.shape[-1], name=f"dec_{j}_fc1")(x)
                h = nn.relu(h)
                x = x + nn.Dense(out_dim, name=f"dec_{j}_fc2")(h) \
                    if x.shape[-1] == out_dim else nn.Dense(out_dim,
                                                            name=f"dec_{j}_fc2")(h)
            elif block == "nearest_upsample":
                x = closest_pool(x, meta["upsamples"][octave - 1])
                out_dim = out_dim // 2
            else:
                raise ValueError(f"unsupported decoder block {block!r}")
        return x, x_all
