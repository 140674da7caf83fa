"""One-hot matmul gather kernel (ops/gather_pallas.py) vs the XLA
reference gather — exactness of the f32 path, bf16 tolerance, sentinel
handling, and non-divisible shape padding (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fgfusion_tpu.models.kpconv import batched_gather
from fgfusion_tpu.ops.gather_pallas import onehot_gather


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    c, ns, d, nq, k = 2, 600, 37, 500, 24
    table = jnp.asarray(rng.normal(size=(c, ns, d)).astype(np.float32))
    # include sentinel (== ns) entries, like real neighbor tables
    idx = jnp.asarray(rng.integers(0, ns + 1, size=(c, nq, k)).astype(np.int32))
    ref = batched_gather(table, idx, 0.0)
    return table, idx, ref


def test_f32_bit_exact(case):
    table, idx, ref = case
    out = onehot_gather(table, idx, tile_q=64, tile_s=128)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) == 0.0


def test_bf16_close(case):
    table, idx, ref = case
    out = onehot_gather(table, idx, tile_q=64, tile_s=128,
                        eq_dtype="bfloat16")
    # bf16 rounding of the table rows only (selection itself is exact)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05


def test_sentinel_rows_zero(case):
    table, idx, ref = case
    out = onehot_gather(table, idx, tile_q=64, tile_s=128)
    sent = np.asarray(idx) == table.shape[1]
    assert float(jnp.max(jnp.abs(out[sent]))) == 0.0


def test_all_sentinel_column():
    table = jnp.ones((1, 64, 5), jnp.float32)
    idx = jnp.full((1, 70, 3), 64, jnp.int32)   # every neighbor missing
    out = onehot_gather(table, idx, tile_q=32, tile_s=64)
    assert float(jnp.max(jnp.abs(out))) == 0.0
