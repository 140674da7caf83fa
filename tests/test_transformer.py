"""Transformer correctness: masking behaviour, weight sharing, and
scan-vs-unrolled equivalence (same math, different param layout)."""
import jax
import jax.numpy as jnp
import numpy as np

from fgfusion_tpu.models.transformer import TransformerCrossEncoder


def _inputs(rng, b=2, n=24, d=32):
    src = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    src_mask = np.ones((b, n), bool); src_mask[0, 16:] = False
    tgt_mask = np.ones((b, n), bool); tgt_mask[1, 20:] = False
    pos = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    return src, tgt, jnp.asarray(src_mask), jnp.asarray(tgt_mask), pos


def make_encoder(scan, layers=3, d=32):
    return TransformerCrossEncoder(
        d_model=d, nhead=4, num_layers=layers, dim_feedforward=64,
        pre_norm=True, sa_val_has_pos_emb=True, ca_val_has_pos_emb=True,
        scan_layers=scan)


def test_scan_matches_unrolled(rng):
    src, tgt, sm, tm, pos = _inputs(rng)
    unrolled = make_encoder(False)
    v_u = unrolled.init(jax.random.PRNGKey(0), src, tgt, sm, tm, pos, pos)
    out_u = unrolled.apply(v_u, src, tgt, sm, tm, pos, pos)

    # restack the unrolled per-layer params into the scan layout
    params_u = v_u["params"]
    layer_names = sorted([k for k in params_u if k.startswith("layer_")],
                         key=lambda s: int(s.split("_")[1]))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[params_u[k] for k in layer_names])
    v_s = {"params": {"layers": {"layer": stacked}, "norm": params_u["norm"]}}

    scanned = make_encoder(True)
    out_s = scanned.apply(v_s, src, tgt, sm, tm, pos, pos)

    np.testing.assert_allclose(np.asarray(out_u[0]), np.asarray(out_s[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_u[1]), np.asarray(out_s[1]),
                               atol=1e-5)


def test_masked_keys_do_not_influence(rng):
    """Changing the features at masked key positions must not change
    the outputs at valid positions."""
    src, tgt, sm, tm, pos = _inputs(rng)
    enc = make_encoder(False)
    v = enc.init(jax.random.PRNGKey(0), src, tgt, sm, tm, pos, pos)
    out1 = enc.apply(v, src, tgt, sm, tm, pos, pos)

    tgt2 = np.asarray(tgt).copy()
    tgt2[1, 20:] = 99.0  # masked region of tgt
    out2 = enc.apply(v, src, jnp.asarray(tgt2), sm, tm, pos, pos)

    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-5)
    # valid tgt positions unchanged
    np.testing.assert_allclose(
        np.asarray(out1[1])[:, 1, :20], np.asarray(out2[1])[:, 1, :20],
        atol=1e-5)


def test_weight_sharing_src_tgt(rng):
    """Within a layer src and tgt go through the SAME modules
    (reference transformers.py:134-163): swapping src/tgt swaps outputs
    when masks/pos are swapped too."""
    src, tgt, sm, tm, pos = _inputs(rng)
    enc = make_encoder(False, layers=1)
    v = enc.init(jax.random.PRNGKey(0), src, tgt, sm, tm, pos, pos)
    a_src, a_tgt = enc.apply(v, src, tgt, sm, tm, pos, pos)
    b_tgt, b_src = enc.apply(v, tgt, src, tm, sm, pos, pos)
    np.testing.assert_allclose(np.asarray(a_src), np.asarray(b_src), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_tgt), np.asarray(b_tgt), atol=1e-5)


def test_intermediates_shape(rng):
    src, tgt, sm, tm, pos = _inputs(rng)
    for scan in (False, True):
        enc = make_encoder(scan, layers=4)
        v = enc.init(jax.random.PRNGKey(0), src, tgt, sm, tm, pos, pos)
        out = enc.apply(v, src, tgt, sm, tm, pos, pos)
        assert out[0].shape == (4,) + src.shape
