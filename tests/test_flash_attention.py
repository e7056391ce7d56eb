"""Pallas flash attention vs the jnp softmax reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualdiffusion_tpu.ops.pallas.flash_attention import flash_attention


def sdpa_ref(q, k, v, scale=None, window=None, causal=False):
    b, h, l, d = q.shape
    scale = scale if scale is not None else 1.0 / np.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    qi = np.arange(l)[:, None]
    ki = np.arange(l)[None, :]
    mask = np.ones((l, l), bool)
    if window is not None:
        mask &= np.abs(qi - ki) <= window
    if causal:
        mask &= qi >= ki
    s = jnp.where(jnp.asarray(mask), s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("l,d,window,causal,bq", [
    (256, 64, None, False, 128),     # multi-block dense
    (256, 64, None, True, 128),      # causal
    (384, 64, 64, False, 128),       # banded, multi k-block
    (100, 48, None, False, 256),     # unpadded L and D
    (300, 64, 40, False, 64),        # banded with L padding
    (64, 128, 16, True, 32),         # banded + causal
])
def test_flash_matches_reference(l, d, window, causal, bq):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h = 2, 3
    q = jax.random.normal(kq, (b, h, l, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, d), jnp.float32)
    got = flash_attention(q, k, v, window=window, causal=causal,
                          block_q=bq, block_k=bq, interpret=True)
    want = sdpa_ref(q, k, v, window=window, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16_io():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 2, 128, 64), jnp.bfloat16)
    got = flash_attention(q, q, q, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = sdpa_ref(q.astype(jnp.float32), q.astype(jnp.float32),
                    q.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_flash_banded_matches_sliding_window_attention():
    """Drop-in parity with attention.sliding_window_attention."""
    from dualdiffusion_tpu.models.attention import sliding_window_attention
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 200, 32))
    k = jax.random.normal(kk, (1, 2, 200, 32))
    v = jax.random.normal(kv, (1, 2, 200, 32))
    got = flash_attention(q, k, v, window=24, block_q=64, block_k=64,
                          interpret=True)
    want = sliding_window_attention(q, k, v, window_size=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
