"""Fixed-K radius neighbor search, on device, static shapes.

TPU-native replacement for the reference's C++ `radius_neighbors`
extension (cpp_wrappers/.../neighbors.cpp) and the PyTorch3D
`ball_query` GPU path (finegrained_kpconv.py:266-293).

Semantics:
- for each query, up to K support indices within `radius`; missing
  slots carry the sentinel index `n_supports` ("shadow neighbor",
  matching neighbors.cpp:199-203 / finegrained_kpconv.py:291).
- neighbors are returned sorted by ascending distance, so column 0 is
  the nearest support — this makes `closest_pool` (upsampling) exact
  and is strictly more stable than the reference's
  first-K-in-index-order GPU path.

Implemented as tiled pairwise distances (the q·sᵀ term rides the MXU)
with top-k per tile, mapped over query chunks to bound memory at
O(chunk * N_support) instead of O(N_query * N_support).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit,
                   static_argnames=("radius", "k", "chunk", "approx",
                                    "fused", "band", "band_chunk"))
def radius_knn(
    queries: jax.Array,
    q_mask: jax.Array,
    supports: jax.Array,
    s_mask: jax.Array,
    *,
    radius: float,
    k: int,
    chunk: int = 2048,
    approx: bool = False,
    fused: bool = False,
    band: int = 0,
    band_chunk: int = 512,
    q_codes: jax.Array | None = None,
    s_codes: jax.Array | None = None,
):
    """Nearest-K-within-radius for one padded cloud pair.

    Args:
        queries: (Nq, 3) float32 padded.
        q_mask: (Nq,) bool.
        supports: (Ns, 3) float32 padded.
        s_mask: (Ns,) bool.
        radius: search radius (static).
        k: neighbor cap (static) — the reference's `neighborhood_limits`.
        chunk: query tile size (static).
        approx: use jax.lax.approx_min_k (TPU-native partial reduction,
            much faster than the sort-based exact top_k; recall ~0.95).
            The reference's own GPU path keeps an *arbitrary* first-K
            subset of in-radius neighbors (pytorch3d ball_query,
            finegrained_kpconv.py:285-293), so approximate nearest-K is
            no less faithful — but tests and default configs stay exact.
        band: banded search window width W (0 = off). Requires BOTH
            clouds Morton-sorted in a shared frame with their sorted
            codes passed as q_codes/s_codes: each tile of `band_chunk`
            consecutive queries only scores the W supports centered (by
            code rank) on the tile — an extra approximation on top of
            `approx` (a true neighbor outside the window is lost), but
            it cuts the (Nq, Ns) distance matrix to (Nq, W): 3x less
            MXU work, d² HBM traffic, and top-k width at W = Ns/3, and
            the chunk loop becomes one batched einsum (no lax.map
            serialization). Window-recall on the bench workload is
            measured in tools/band_recall.py; DESIGN.md §13.

    Returns:
        idx: (Nq, k) int32 — support indices, sentinel = Ns.
    """
    nq, ns = queries.shape[0], supports.shape[0]
    sentinel = jnp.int32(ns)

    if band and band < ns:
        assert q_codes is not None and s_codes is not None, (
            "banded radius_knn needs Morton codes for both clouds")
        return _banded_knn(queries, q_mask, supports, s_mask,
                           q_codes, s_codes, radius=radius, k=k,
                           band=band, band_chunk=band_chunk,
                           approx=approx)

    if approx and fused:
        from .knn_pallas import knn_candidates, seg_for
        if ns // seg_for(ns) >= k:
            s2 = jnp.sum(supports * supports, axis=-1)
            s2 = jnp.where(s_mask, s2, jnp.float32(1e18))
            d2_c, idx_c = knn_candidates(queries, supports, s2)
            neg, a = jax.lax.top_k(-d2_c, k)
            d2_k = -neg
            idx = jnp.take_along_axis(idx_c, a, axis=1)
            within = (d2_k < radius * radius) & q_mask[:, None]
            return jnp.where(within, idx.astype(jnp.int32), sentinel)
        # too few candidates for k at this size: fall through

    # Invalid supports are excluded through the (Ns,) norm vector — a
    # huge additive term makes their d2 dominate everything real — NOT
    # through a (chunk, Ns)-wide where: that select is a full extra HBM
    # round trip over the distance tiles (same trap as the gather
    # select fusions, DESIGN.md §10 step 3).
    s_norm2 = jnp.sum(supports * supports, axis=-1)  # (Ns,)
    s_norm2 = jnp.where(s_mask, s_norm2, jnp.float32(1e18))

    def one_chunk(args):
        q, qm = args  # (chunk, 3), (chunk,)
        q_norm2 = jnp.sum(q * q, axis=-1, keepdims=True)  # (chunk, 1)
        # Squared distances; the cross term uses the MXU. Full f32
        # precision is required: the default TPU bf16 matmul pass
        # misclassifies points near the radius boundary.
        cross = jnp.matmul(q, supports.T, precision=jax.lax.Precision.HIGHEST)
        d2 = q_norm2 - 2.0 * cross + s_norm2[None, :]
        if approx:
            neg, idx = jax.lax.approx_max_k(-d2, k)
        else:
            neg, idx = jax.lax.top_k(-d2, k)  # ascending distance
        d2_k = -neg
        within = (d2_k < radius * radius) & qm[:, None]
        return jnp.where(within, idx.astype(jnp.int32), sentinel)

    if nq <= chunk:
        # single tile: no lax.map (a while loop serializing dispatch)
        return one_chunk((queries, q_mask))

    nq_pad = _round_up(nq, chunk)
    q_padded = jnp.pad(queries, ((0, nq_pad - nq), (0, 0)))
    qm_padded = jnp.pad(q_mask, (0, nq_pad - nq))
    chunks = (
        q_padded.reshape(nq_pad // chunk, chunk, 3),
        qm_padded.reshape(nq_pad // chunk, chunk),
    )
    idx = jax.lax.map(one_chunk, chunks)
    return idx.reshape(nq_pad, k)[:nq]


def _banded_knn(queries, q_mask, supports, s_mask, q_codes, s_codes,
                *, radius: float, k: int, band: int, band_chunk: int,
                approx: bool):
    """Windowed kNN over Morton-sorted clouds (see radius_knn docs).

    Both clouds are sorted ascending by Morton code in a shared
    quantization frame (ops/sorting.py), so spatially-near points have
    near code *ranks* even across pyramid levels. Each tile of
    `band_chunk` consecutive queries reads one support window of width
    `band` whose center is the code rank of the tile's median query —
    density-adaptive by construction (rank matching, not code
    arithmetic). Invalid points carry the max code, sort last, and are
    excluded via the +1e18 norm trick, so windows that overrun into
    padding self-mask."""
    nq, ns = queries.shape[0], supports.shape[0]
    sentinel = jnp.int32(ns)
    w, bc = band, band_chunk

    nq_pad = _round_up(nq, bc)
    q = jnp.pad(queries, ((0, nq_pad - nq), (0, 0)))
    qm = jnp.pad(q_mask, (0, nq_pad - nq))
    qc = jnp.pad(q_codes, (0, nq_pad - nq),
                 constant_values=jnp.int32(0x7FFFFFFF))
    nc = nq_pad // bc

    s_norm2 = jnp.sum(supports * supports, axis=-1)
    s_norm2 = jnp.where(s_mask, s_norm2, jnp.float32(1e18))

    # Window start per tile: the code rank (in the support ordering) of
    # the tile's median query code, centered. One (nc, Ns) compare —
    # trivial next to the distance work it replaces.
    center_codes = qc.reshape(nc, bc)[:, bc // 2]                 # (nc,)
    rank = jnp.sum(s_codes[None, :] < center_codes[:, None],
                   axis=1).astype(jnp.int32)                      # (nc,)
    start = jnp.clip(rank - w // 2, 0, ns - w)                    # (nc,)

    win = start[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]  # (nc, W)
    s_win = supports[win]                                         # (nc, W, 3)
    n_win = s_norm2[win]                                          # (nc, W)

    qr = q.reshape(nc, bc, 3)
    q_norm2 = jnp.sum(qr * qr, axis=-1, keepdims=True)            # (nc, bc, 1)
    cross = jnp.einsum("ncd,nwd->ncw", qr, s_win,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = q_norm2 - 2.0 * cross + n_win[:, None, :]                # (nc, bc, W)
    if approx:
        neg, li = jax.lax.approx_max_k(-d2, k)
    else:
        neg, li = jax.lax.top_k(-d2, k)
    d2_k = -neg
    idx = start[:, None, None] + li.astype(jnp.int32)             # global
    within = (d2_k < radius * radius) & qm.reshape(nc, bc)[:, :, None]
    out = jnp.where(within, idx, sentinel)
    return out.reshape(nq_pad, k)[:nq]


def gather_neighbors(values: jax.Array, idx: jax.Array, fill):
    """Gather rows of `values` (Ns, D) at idx (..., K), sentinel -> fill.

    Mirrors the reference's shadow-row trick (append a fill row, then
    index) without the concat: clips the index and masks.
    """
    ns = values.shape[0]
    safe = jnp.clip(idx, 0, ns - 1)
    out = values[safe]
    valid = (idx < ns)[..., None]
    return jnp.where(valid, out, jnp.asarray(fill, dtype=values.dtype))
