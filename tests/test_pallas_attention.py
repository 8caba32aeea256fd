"""Flash attention kernel correctness vs the XLA reference (interpret mode
on CPU; the real-TPU path is exercised by bench_kernels.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invertible_cd_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


@pytest.mark.parametrize(
    "sq,sk,h,d",
    [
        (256, 256, 2, 40),   # SD1.5 self-attention shape family
        (64, 77, 2, 40),     # cross-attention (padded Sk)
        (128, 128, 1, 64),
    ],
)
def test_matches_xla(sq, sk, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, sk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, sk, h, d)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_non_divisible_seq():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 77, 1, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 77, 1, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 77, 1, 32)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_sk_not_divisible_by_block():
    """sk > block_k with a ragged tail: the clamped pl.ds read must not
    double-count or drop keys."""
    from invertible_cd_tpu.ops.flash_attention import flash_attention_bhsd

    rng = np.random.default_rng(2)
    g, sq, sk, d = 2, 64, 300, 32  # sk=300, block_k=128 -> tiles 0..2, tail 44
    q = jnp.asarray(rng.normal(size=(g, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(g, sk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(g, sk, d)), jnp.float32)
    out = flash_attention_bhsd(q, k, v, block_q=64, block_k=128, interpret=True)
    ref = jax.nn.dot_product_attention(
        q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
    )[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
