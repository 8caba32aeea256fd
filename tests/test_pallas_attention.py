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
        (128, 128, 2, 80),   # SD1.5 32x32 head dim (pads 80 -> 128)
        (64, 64, 1, 160),    # SD1.5 16x16 head dim (pads 160 -> 192)
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


# ---------------------------------------------------------------------------
# streamed kernel (large head dims: K/V tiles DMA'd via a sequential grid dim)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "g,sq,sk,d,bq,bk",
    [
        (2, 256, 256, 512, 128, 128),  # SD1.5 VAE head shape family (d=512)
        (1, 300, 300, 512, 128, 128),  # ragged tail on BOTH axes
        (1, 256, 200, 64, 128, 128),   # ragged key tail only
        (2, 256, 256, 40, 128, 128),   # d-pad path (40 -> 64) through streamed
    ],
)
def test_streamed_matches_xla(g, sq, sk, d, bq, bk):
    from invertible_cd_tpu.ops.flash_attention import flash_attention_bhsd

    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(g, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(g, sk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(g, sk, d)), jnp.float32)
    out = flash_attention_bhsd(
        q, k, v, block_q=bq, block_k=bk, interpret=True, streamed=True
    )
    ref = jax.nn.dot_product_attention(
        q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
    )[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_streamed_auto_routing():
    """The VMEM-budget heuristic: the VAE's d=512 single head over 4096
    tokens must route to the streamed kernel, while UNet head dims stay
    on the resident-K/V kernel."""
    from invertible_cd_tpu.ops import flash_attention as fa

    itemsize = 2  # bf16
    assert 4096 * 512 * 2 * itemsize > 4 * 1024 * 1024  # VAE decode -> streamed
    assert 4096 * 64 * 2 * itemsize <= 4 * 1024 * 1024  # SD1.5 64x64 head -> resident
    assert fa is not None


def test_streamed_fp32_auto_blocks():
    """Regression: SDXL's fp32 VAE encode (16k tokens, d=512) overflowed
    the 16 MB scoped-vmem stack with the bf16-tuned 512/1024 streamed
    blocks. fp32 inputs must auto-pick the halved 256/512 blocks — and
    still match XLA attention."""
    from invertible_cd_tpu.ops.flash_attention import flash_attention_bhsd

    rng = np.random.default_rng(8)
    g, sq, sk, d = 1, 512, 1024, 512
    q = jnp.asarray(rng.normal(size=(g, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(g, sk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(g, sk, d)), jnp.float32)
    # no explicit blocks: exercises the dtype-aware default choice
    out = flash_attention_bhsd(q, k, v, interpret=True, streamed=True)
    ref = jax.nn.dot_product_attention(
        q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
    )[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_streamed_grad_matches_xla():
    """The streamed path's backward is a chunked XLA recompute from the
    saved logsumexp — check it against autodiff through plain attention,
    including a ragged key tail."""
    from invertible_cd_tpu.ops.flash_attention import flash_attention_bhsd

    rng = np.random.default_rng(7)
    g, sq, sk, d = 1, 200, 300, 128
    q = jnp.asarray(rng.normal(size=(g, sq, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.normal(size=(g, sk, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.normal(size=(g, sk, d)) * 0.5, jnp.float32)

    def fn(q, k, v):
        return flash_attention_bhsd(
            q, k, v, block_q=128, block_k=128, interpret=True, streamed=True
        )

    def ref(q, k, v):
        return jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]

    dq, dk, dv = _grads(fn, q, k, v)
    rq, rk, rv = _grads(ref, q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# gradients (custom_vjp backward kernels)
# ---------------------------------------------------------------------------


def _grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        # non-trivial cotangent: weight each element differently
        w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape) / out.size
        return jnp.sum(out * w)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize(
    "sq,sk,h,d",
    [
        (512, 512, 2, 64),  # SDXL self-attention shape family (d=64)
        (128, 77, 2, 64),   # SDXL cross-attention (ragged Sk=77)
        (256, 256, 1, 40),  # SD1.5 head_dim (pad path: 40 -> 64)
        (128, 128, 1, 80),  # SD1.5 32x32 head dim (pad path: 80 -> 128)
    ],
)
def test_grad_matches_xla(sq, sk, h, d):
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, sq, h, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, sk, h, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, sk, h, d)) * 0.5, jnp.float32)

    dq, dk, dv = _grads(lambda q, k, v: flash_attention(q, k, v, interpret=True), q, k, v)
    rq, rk, rv = _grads(_ref, q, k, v)

    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=2e-4, rtol=1e-3)


def test_grad_ragged_both_axes():
    """sq and sk both non-divisible by the block sizes: masking in the dq
    streaming loop and Pallas' own ragged k-tile handling in dkdv."""
    from invertible_cd_tpu.ops.flash_attention import flash_attention_bhsd

    rng = np.random.default_rng(4)
    g, sq, sk, d = 1, 200, 300, 32
    q = jnp.asarray(rng.normal(size=(g, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(g, sk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(g, sk, d)), jnp.float32)

    def fn(q, k, v):
        return flash_attention_bhsd(q, k, v, block_q=128, block_k=128, interpret=True)

    def ref(q, k, v):
        return jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]

    dq, dk, dv = _grads(fn, q, k, v)
    rq, rk, rv = _grads(ref, q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=2e-4, rtol=1e-3)


def test_grad_through_sdxl_shaped_attention():
    """VERDICT item 2: jax.grad through an SDXL-shaped attention (d=64,
    long sequence) on the kernel path must produce finite, correct grads."""
    rng = np.random.default_rng(5)
    b, sq, h, d = 1, 1024, 2, 64
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, sq, h, d)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, sq, h, d)) * 0.3, jnp.bfloat16)

    dq, dk, dv = _grads(lambda q, k, v: flash_attention(q, k, v, interpret=True), q, k, v)
    rq, rk, rv = _grads(_ref, q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))

    for got, want in [(dq, rq), (dk, rk), (dv, rv)]:
        got = np.asarray(got, np.float32)
        assert np.isfinite(got).all()
        # bf16 storage: loose tolerance, but correlation must be ~1
        want = np.asarray(want)
        denom = np.linalg.norm(got) * np.linalg.norm(want)
        cos = float((got * want).sum() / max(denom, 1e-30))
        assert cos > 0.99, cos
