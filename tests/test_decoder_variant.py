"""The attention-based correspondence decoder path
(direct_regress_coor: False) — reference finegrained_regtr.py:312-408."""
import jax
import jax.numpy as jnp
import numpy as np

from fgfusion_tpu.models import get_model
from test_model import TINY_CFG, SPEC, make_batch


def test_attention_decoder_forward():
    cfg = dict(TINY_CFG)
    cfg["direct_regress_coor"] = False
    model = get_model("finegrained_regtr.RegTR")(cfg=cfg)
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, SPEC,
                           train=False)
    pred = model.apply(variables, batch, SPEC, train=False)

    L, B, Nc = cfg["num_encoder_layers"], 2, SPEC.capacities[-1]
    assert pred["src_kp_warped"].shape == (L, B, Nc, 3)
    assert pred["pose"].shape == (L, B, 3, 4)
    assert np.all(np.isfinite(np.asarray(pred["pose"])))

    # the attention decoder's warped points are convex combinations of
    # the *other* cloud's coordinates -> they live inside its bbox
    tgt = np.asarray(batch["tgt_xyz"])
    m = np.asarray(batch["tgt_mask"])
    src_corr = np.asarray(pred["src_kp_warped"])
    for b in range(B):
        lo, hi = tgt[b][m[b]].min(0) - 1e-3, tgt[b][m[b]].max(0) + 1e-3
        sm = np.asarray(pred["src_mask_c"])[b]
        pts = src_corr[-1, b][sm]
        assert np.all(pts >= lo) and np.all(pts <= hi)


def test_registry_rejects_unknown():
    import pytest
    from fgfusion_tpu.models import get_model as gm
    with pytest.raises(ValueError):
        gm("nope.Nope")
