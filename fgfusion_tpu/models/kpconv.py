"""KPConv operator and backbone blocks (fixed-shape, masked, batched).

TPU-native re-design of the reference blocks
(models/backbone_kpconv/finegrained_kpconv_blocks.py). All features are
(C, N, D) with validity masks; neighbor tables are (C, Nq, K) with
sentinel = Ns. There is no packed ragged stack, no python loop over
clouds, and no shadow-row concat: gathers clip + mask instead.

KPConv math (reference KPConv.forward, blocks.py:265-401, rigid path):
  d2[n,k,p]   = || (s_pts[nb[n,k]] - q_pts[n]) - kp[p] ||^2
  w[n,p,k]    = influence(d2)          (linear: clamp(1 - d/extent, 0))
  f[n,p,c]    = sum_k w[n,p,k] * x[nb[n,k], c]
  out[n,e]    = sum_p f[n,p,c] @ W[p,c,e]
  out        /= max(1, #neighbors with positive feature-sum)   (density)

The two contractions are einsums the MXU eats directly; the density
normalization replicates the reference's quirk of counting neighbors by
`sum_c x > 0` (blocks.py:396-399).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.paged_gather import paged_gather
from .kernel_points import load_kernel_points
from .norm import MaskedInstanceNorm
from .res2net import Res2NetFusion, torch_linear_init

# Dispatch ceiling for the paged one-hot MXU gather. MXU lane
# quantization prices the selection at rows x window x max(D, 128)
# regardless of how thin the row is, so the kernel loses to XLA's
# latency-bound gather at every level of the shipped configs (see
# ops/paged_gather.py's cost-model note) — no shipped config builds
# page tables, so this path is dormant unless a spec opts in via
# paged_p_max.
PAGED_GATHER_MAX_D = 134


def batched_gather(values: jax.Array, idx: jax.Array, fill) -> jax.Array:
    """values (C, Ns, D), idx (C, Nq, K) with sentinel Ns -> (C, Nq, K, D)."""
    c, ns, d = values.shape
    nq, k = idx.shape[1], idx.shape[2]
    safe = jnp.clip(idx, 0, ns - 1).reshape(c, nq * k, 1)
    out = jnp.take_along_axis(values, safe, axis=1).reshape(c, nq, k, d)
    valid = (idx < ns)[..., None]
    return jnp.where(valid, out, jnp.asarray(fill, dtype=values.dtype))


def max_pool(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Max over gathered neighbors, shadow = 0 (reference blocks.py:125-141)."""
    gathered = batched_gather(x, idx, 0.0)
    return jnp.max(gathered, axis=2)


def closest_pool(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Pool from the nearest neighbor — column 0 of our distance-sorted
    tables (reference blocks.py:110-122 assumes the same ordering)."""
    return batched_gather(x, idx[:, :, :1], 0.0)[:, :, 0]


def global_average(x: jax.Array, mask: jax.Array) -> jax.Array:
    """(C, N, D) masked mean over points (reference blocks.py:144-163)."""
    m = mask[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1.0, None)


def kpconv_influence(q_pts, s_pts, neighb_idx, kernel_pts, extent,
                     influence_type: str = "linear",
                     aggregation: str = "sum"):
    """Kernel-point influence weights (C,Nq,P,K) for one neighbor table.

    Factored out of the conv so it can be computed ONCE per pyramid
    level and shared by every block at that level (all blocks at a
    level share the same neighbor table, radius, extent and kernel
    disposition) — the device trace showed the per-block coordinate
    gathers + influence chains dominating the encoder.
    """
    # Neighbor coordinates relative to the query; missing neighbors
    # land at 1e6 so their influence is exactly 0.
    nb_pts = batched_gather(s_pts, neighb_idx, 1e6)      # (C,Nq,K,3)
    rel = nb_pts - q_pts[:, :, None, :]

    # ||rel - kp||^2 expanded so the cross term is one MXU matmul over
    # the tiny 3-axis instead of materializing a (C,Nq,K,P,3) tensor.
    rel2 = jnp.sum(rel * rel, axis=-1)                    # (C,Nq,K)
    kp2 = jnp.sum(kernel_pts * kernel_pts, axis=-1)       # (P,)
    cross = jnp.einsum("cnkx,px->cnkp", rel, kernel_pts,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(rel2[..., None] - 2.0 * cross + kp2, 0.0)  # (C,Nq,K,P)

    if influence_type == "linear":
        w = jnp.clip(1.0 - jnp.sqrt(d2) / extent, 0.0, None)
    elif influence_type == "constant":
        w = jnp.ones_like(d2)
    elif influence_type == "gaussian":
        sigma = extent * 0.3
        w = jnp.exp(-d2 / (2 * sigma * sigma + 1e-9))
    else:
        raise ValueError(influence_type)

    if aggregation == "closest":
        closest = jnp.argmin(d2, axis=-1)                 # (C,Nq,K)
        w = w * jax.nn.one_hot(closest, kernel_pts.shape[0], dtype=w.dtype)
    elif aggregation != "sum":
        raise ValueError(aggregation)

    return jnp.swapaxes(w, 2, 3)                          # (C,Nq,P,K)


class KPConvOp(nn.Module):
    """Kernel-point convolution: rigid, deformable, and modulated.

    Deformable path (reference finegrained_kpconv_blocks.py:267-343):
    a rigid offset KPConv predicts per-query kernel-point offsets
    (plus sigmoid modulations when `modulated`); influence distances
    are taken against the deformed dispositions, and neighbors outside
    KP_extent of every deformed kernel point are dropped from both the
    sum and the density count (the reference implements the drop as a
    dynamic re-gather — here it is a static mask, numerically the
    same). `min_d2` and the deformed dispositions are sown into the
    'intermediates' collection (the reference keeps them as module
    attributes for an external regularizer it never defines)."""

    num_kernel_points: int
    in_dim: int
    out_dim: int
    extent: float          # current_extent = radius * KP_extent / conv_radius
    radius: float          # kernel disposition scale
    fixed_kernel_points: str = "center"
    influence: str = "linear"
    aggregation: str = "sum"
    deformable: bool = False
    modulated: bool = False
    kp_seed: int = 0
    compute_dtype: str = "float32"   # 'bfloat16' halves HBM traffic on
                                     # the two big contractions; the
                                     # influence geometry stays f32
    gather_barrier: bool = False     # keep the fused coords+feats
                                     # gather as ONE gather (see below)

    def setup(self):
        kp = load_kernel_points(self.radius, self.num_kernel_points,
                                fixed=self.fixed_kernel_points, seed=self.kp_seed)
        self.kernel_pts = jnp.asarray(kp)  # (P, 3) fixed, not trained
        # torch kaiming_uniform(a=sqrt(5)) ~ U(-1/sqrt(fan), 1/sqrt(fan));
        # we take fan_in = P * in_dim (the true receptive fan-in).
        fan = self.num_kernel_points * self.in_dim
        bound = 1.0 / np.sqrt(fan)
        self.weights = self.param(
            "weights",
            lambda key: jax.random.uniform(
                key, (self.num_kernel_points, self.in_dim, self.out_dim),
                minval=-bound, maxval=bound),
        )
        if self.deformable:
            # rigid offset conv + zero-init bias
            # (finegrained_kpconv_blocks.py:215-230)
            p3 = 3 if not self.modulated else 4
            self.offset_conv = KPConvOp(
                num_kernel_points=self.num_kernel_points,
                in_dim=self.in_dim,
                out_dim=p3 * self.num_kernel_points,
                extent=self.extent, radius=self.radius,
                fixed_kernel_points=self.fixed_kernel_points,
                influence=self.influence, aggregation=self.aggregation,
                compute_dtype=self.compute_dtype,
                gather_barrier=self.gather_barrier, name="offset_conv")
            self.offset_bias = self.param(
                "offset_bias", nn.initializers.zeros,
                (p3 * self.num_kernel_points,))

    def __call__(self, q_pts, s_pts, neighb_idx, x, influence=None,
                 pages=None):
        """q_pts (C,Nq,3), s_pts (C,Ns,3), neighb_idx (C,Nq,K),
        x (C,Ns,Cin) -> (C,Nq,Cout). `influence` (C,Nq,P,K), if given,
        skips the per-block geometry (shared-per-level fast path).
        `pages` (C,T,P_max), if given, serves the fused coords+features
        gather from the paged one-hot MXU kernel (bit-exact)."""
        cdt = jnp.dtype(self.compute_dtype)

        valid = None
        modulations = None
        nb_sum = None
        if influence is not None:
            assert not self.deformable, (
                "shared-influence fast path is rigid-only")
            w = influence
            nb_x = batched_gather(x.astype(cdt), neighb_idx, 0.0)
        else:
            # ONE fused gather for coordinates + features: TPU gathers
            # are row-latency-bound (device trace: ~350 MB/s effective),
            # so fewer, wider rows beat two separate gathers. Missing
            # neighbors are handled by masking the influence weights
            # (numerically identical to the reference's far-away shadow
            # point: both yield exactly zero influence).
            #
            # The gather is RAW (clipped index, no where): zeroing the
            # gathered tensor would cost a full extra HBM round trip
            # (HLO select fusions, ~3 ms/fwd @12k). Invalid neighbors
            # contribute exactly 0 to the weighted sum because their
            # influence row is zeroed below (0 * finite == 0), and the
            # density count uses `valid` directly — bit-exact.
            valid = neighb_idx < s_pts.shape[1]                 # (C,Nq,K)
            # One extra gathered lane: the per-support feature sum. The
            # density count below needs "feature-row-sum > 0" per
            # neighbor; computing it from the gathered (C,Nq,K,Cin)
            # tensor costs XLA a full select+reduce pass over ~276 MB
            # (device trace: broadcast_select_fusion + slice_reduce +
            # the layout copy they force, ~3.7 ms @12k). The gather is
            # lane-padded to 128 anyway, so carrying the sum as lane
            # 3+Cin is free — and the count becomes a thin slice read.
            s_sum = jnp.sum(x, axis=-1, keepdims=True)          # (C,Ns,1)
            both = jnp.concatenate(
                [s_pts, x.astype(jnp.float32), s_sum], axis=-1)  # (C,Ns,4+Cin)
            c, ns = both.shape[0], both.shape[1]
            nq, k = neighb_idx.shape[1], neighb_idx.shape[2]
            if pages is not None:
                # paged one-hot MXU gather (sentinel rows come out
                # zero; influence masking below handles them the same
                # way it handles the raw clipped gather's garbage)
                nb = paged_gather(both, neighb_idx, pages,
                                  tile_q=nq // pages.shape[1])
            else:
                if self.gather_barrier:
                    # keep the concat materialized so XLA cannot split
                    # the single wide (lane-padded) gather into one
                    # narrow gather per operand (measured: the split
                    # pays the 128-lane row cost twice)
                    both = jax.lax.optimization_barrier(both)
                safe = jnp.clip(neighb_idx, 0, ns - 1).reshape(c, nq * k, 1)
                nb = jnp.take_along_axis(both, safe, axis=1).reshape(
                    c, nq, k, both.shape[-1])                   # (C,Nq,K,4+Cin)
            nb_pts = nb[..., :3]
            nb_x = nb[..., 3:-1].astype(cdt)
            nb_sum = nb[..., -1]                                # (C,Nq,K)

            rel = nb_pts - q_pts[:, :, None, :]
            rel2 = jnp.sum(rel * rel, axis=-1)                  # (C,Nq,K)
            if self.deformable:
                # per-query deformed dispositions from the rigid
                # offset conv (blocks.py:270-290)
                p = self.num_kernel_points
                off = self.offset_conv(q_pts, s_pts, neighb_idx, x,
                                       pages=pages) + self.offset_bias
                unscaled = off[..., :3 * p].reshape(
                    off.shape[0], off.shape[1], p, 3)
                kp_def = self.kernel_pts + unscaled * self.extent  # (C,Nq,P,3)
                modulations = (2.0 * jax.nn.sigmoid(off[..., 3 * p:])
                               if self.modulated else None)
                kp2 = jnp.sum(kp_def * kp_def, axis=-1)          # (C,Nq,P)
                cross = jnp.einsum("cnkx,cnpx->cnkp", rel, kp_def,
                                   precision=jax.lax.Precision.HIGHEST)
                d2 = jnp.maximum(
                    rel2[..., None] - 2.0 * cross + kp2[:, :, None, :], 0.0)
                # kept by the reference for an (undefined) external
                # regularizer (blocks.py:205-207, 322-325)
                self.sow("intermediates", "min_d2", jnp.min(d2, axis=2))
                self.sow("intermediates", "deformed_kp", kp_def)
                # drop neighbors outside every deformed kernel point's
                # extent from the sum AND the density count — the
                # reference's dynamic re-gather (blocks.py:327-343) as
                # a static mask
                in_range = jnp.any(d2 < self.extent ** 2, axis=-1)
                valid = jnp.logical_and(valid, in_range)
            else:
                kp2 = jnp.sum(self.kernel_pts * self.kernel_pts, axis=-1)
                cross = jnp.einsum("cnkx,px->cnkp", rel, self.kernel_pts,
                                   precision=jax.lax.Precision.HIGHEST)
                d2 = jnp.maximum(rel2[..., None] - 2.0 * cross + kp2, 0.0)

            if self.influence == "linear":
                w = jnp.clip(1.0 - jnp.sqrt(d2) / self.extent, 0.0, None)
            elif self.influence == "constant":
                w = jnp.ones_like(d2)
            elif self.influence == "gaussian":
                sigma = self.extent * 0.3
                w = jnp.exp(-d2 / (2 * sigma * sigma + 1e-9))
            else:
                raise ValueError(self.influence)
            if self.aggregation == "closest":
                closest = jnp.argmin(d2, axis=-1)
                w = w * jax.nn.one_hot(closest, self.num_kernel_points,
                                       dtype=w.dtype)
            elif self.aggregation != "sum":
                raise ValueError(self.aggregation)
            w = jnp.where(valid[..., None], w, 0.0)             # mask shadows
            w = jnp.swapaxes(w, 2, 3)                           # (C,Nq,P,K)

        weighted = jnp.einsum("cnpk,cnkd->cnpd", w.astype(cdt), nb_x,
                              preferred_element_type=jnp.float32)
        if modulations is not None:
            # modulations scale per (query, kernel point)
            # (blocks.py:384-385)
            weighted = weighted * modulations[..., None]
        out = jnp.einsum("cnpd,pde->cne", weighted.astype(cdt),
                         self.weights.astype(cdt),
                         preferred_element_type=jnp.float32)

        # density normalization (reference blocks.py:396-399): count
        # neighbors whose feature-sum is positive. With the raw gather,
        # invalid slots may hold a real row's values — AND with `valid`
        # reproduces the shadow-row-is-zero semantics exactly. The sum
        # comes from the extra gathered lane when available (same
        # values, same f32 reduction order — identical sign).
        nonzero = (nb_sum > 0.0) if nb_sum is not None \
            else jnp.sum(nb_x, axis=-1) > 0.0                        # (C,Nq,K)
        if valid is not None:
            nonzero = jnp.logical_and(nonzero, valid)
        nb_count = jnp.sum(nonzero, axis=-1)                         # (C,Nq)
        nb_count = jnp.clip(nb_count, 1, None).astype(out.dtype)
        return out / nb_count[..., None]


class UnaryBlock(nn.Module):
    """Dense (no bias) + per-cloud InstanceNorm + LeakyReLU(0.1)
    (reference blocks.py:521-555)."""

    out_dim: int
    use_norm: bool = True
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, mask):
        x = nn.Dense(self.out_dim, use_bias=False,
                     kernel_init=torch_linear_init, name="mlp")(x)
        if self.use_norm:
            x = MaskedInstanceNorm(name="norm")(x, mask)
        else:
            bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
            x = x + bias
        if not self.no_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class SimpleBlock(nn.Module):
    """KPConv -> InstanceNorm -> LeakyReLU with out_dim//2 channels
    (reference blocks.py:578-634)."""

    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    cfg: dict

    @nn.compact
    def __call__(self, x, meta):
        cfg = self.cfg
        extent = self.radius * cfg["KP_extent"] / cfg["conv_radius"]
        q, s, idx, mask = _select_level_io(self.block_name, self.layer_ind, meta)
        infl = _select_influence(self.block_name, self.layer_ind, meta)
        pages = _select_pages(self.block_name, self.layer_ind, meta,
                              4 + self.in_dim)
        x = KPConvOp(
            num_kernel_points=cfg["num_kernel_points"], in_dim=self.in_dim,
            out_dim=self.out_dim // 2, extent=extent, radius=self.radius,
            fixed_kernel_points=cfg["fixed_kernel_points"],
            influence=cfg["KP_influence"], aggregation=cfg["aggregation_mode"],
            deformable="deformable" in self.block_name,
            modulated=cfg.get("modulated", False),
            compute_dtype=cfg.get("compute_dtype", "float32"),
            gather_barrier=cfg.get("gather_barrier", False),
            name="kpconv")(q, s, idx, x, influence=infl, pages=pages)
        x = MaskedInstanceNorm(name="norm")(x, mask)
        return nn.leaky_relu(x, 0.1)


class ResnetBottleneckBlock(nn.Module):
    """Bottleneck with the Res2Net fine-grained fusion as the
    up-projection (reference blocks.py:637-727):

        unary1(in -> out/4) -> KPConv(out/4 -> out/4) -> InstanceNorm
        -> Res2NetFusion(out/4 -> out) -> LeakyReLU
        + shortcut (max-pool if strided; unary if in != out)
        -> LeakyReLU
    """

    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    cfg: dict

    @nn.compact
    def __call__(self, x, meta, train: bool = True):
        cfg = self.cfg
        extent = self.radius * cfg["KP_extent"] / cfg["conv_radius"]
        strided = "strided" in self.block_name
        mask_pre = meta["masks"][self.layer_ind]
        q, s, idx, mask_post = _select_level_io(self.block_name, self.layer_ind, meta)
        infl = _select_influence(self.block_name, self.layer_ind, meta)
        pages = _select_pages(self.block_name, self.layer_ind, meta,
                              4 + self.out_dim // 4)

        h = x
        if self.in_dim != self.out_dim // 4:
            h = UnaryBlock(self.out_dim // 4, name="unary1")(h, mask_pre)

        h = KPConvOp(
            num_kernel_points=cfg["num_kernel_points"], in_dim=self.out_dim // 4,
            out_dim=self.out_dim // 4, extent=extent, radius=self.radius,
            fixed_kernel_points=cfg["fixed_kernel_points"],
            influence=cfg["KP_influence"], aggregation=cfg["aggregation_mode"],
            deformable="deformable" in self.block_name,
            modulated=cfg.get("modulated", False),
            compute_dtype=cfg.get("compute_dtype", "float32"),
            gather_barrier=cfg.get("gather_barrier", False),
            name="kpconv")(q, s, idx, h, influence=infl, pages=pages)
        h = MaskedInstanceNorm(name="norm_conv")(h, mask_post)
        h = Res2NetFusion(self.out_dim // 4, self.out_dim, base_width=14, scale=8,
                          name="res2net")(h, mask_post, train=train)
        h = nn.leaky_relu(h, 0.1)

        shortcut = max_pool(x, idx) if strided else x
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, no_relu=True,
                                  name="unary_shortcut")(shortcut, mask_post)
        return nn.leaky_relu(h + shortcut, 0.1)


def _select_pages(block_name: str, layer_ind: int, meta, d: int):
    """Per-level page table for the paged one-hot gather — only for
    non-strided conv tables (pools have different query sets) and only
    when the gathered row is thin enough for the MXU path to win."""
    if "strided" in block_name or d > PAGED_GATHER_MAX_D:
        return None
    return meta.get("pages", {}).get(layer_ind)


def _select_influence(block_name: str, layer_ind: int, meta):
    """Shared per-level influence tables (set by KPFEncoder); None when
    the encoder runs without precomputation (e.g. standalone blocks)."""
    key = "influence_pool" if "strided" in block_name else "influence"
    table = meta.get(key)
    return None if table is None else table.get(layer_ind)


def _select_level_io(block_name: str, layer_ind: int, meta):
    """Pick query/support points + neighbor table for a block, mirroring
    the strided/non-strided selection at blocks.py:620-631 / 694-705."""
    if "strided" in block_name:
        q = meta["points"][layer_ind + 1]
        idx = meta["pools"][layer_ind]
        mask = meta["masks"][layer_ind + 1]
    else:
        q = meta["points"][layer_ind]
        idx = meta["neighbors"][layer_ind]
        mask = meta["masks"][layer_ind]
    s = meta["points"][layer_ind]
    return q, s, idx, mask
