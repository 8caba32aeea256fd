"""Fused (flash) attention as a Pallas TPU kernel.

The UNet's hot loop is attention over 4096/1024/256 latent tokens
(SURVEY.md §3.1). This kernel computes softmax(QK^T/sqrt(d))V with the
online-softmax recurrence — one pass over K/V tiles, fp32 running max/sum,
no (Sq, Sk) probability matrix in HBM.

Layout: q (B*H, Sq, D), k/v (B*H, Sk, D). The grid is
(batch*heads, Sq tiles); each program streams K/V tiles through VMEM.
D and Sk are padded to lane width by Mosaic; Sk padding is masked with
-inf logits (needed for cross-attention's Sk=77).

The p2p controller hook needs materialised probabilities; hooked layers
(<= 32^2 tokens, reference `utils/p2p.py:147`) take the XLA einsum path in
models/attention.py instead — the editing path pays for editability, the
generation path doesn't.

On non-TPU backends the kernel runs in interpreter mode (tests) — use
`attention(..., force_xla=True)` or leave `use_pallas` off in production
CPU runs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sk: int, scale: float):
    """One (q-tile) program: stream K/V tiles, online softmax."""
    q = q_ref[...].astype(jnp.float32) * scale  # (block_q, D)
    block_q = q.shape[0]
    d = q.shape[1]

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    n_k = pl.cdiv(sk, block_k)

    divisible = sk % block_k == 0  # static

    single_tile = sk <= block_k  # static

    def body(i, carry):
        m, l, acc = carry
        if single_tile:
            # one K tile (cross-attention's 77 keys): full static read
            k = k_ref[...].astype(jnp.float32)
            v = v_ref[...].astype(jnp.float32)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif divisible:
            # aligned path: starts are multiples of block_k (Mosaic-friendly)
            start = pl.multiple_of(i * block_k, block_k)
            k = k_ref[pl.ds(start, block_k), :].astype(jnp.float32)
            v = v_ref[pl.ds(start, block_k), :].astype(jnp.float32)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # ragged tail: pl.ds CLAMPS an out-of-range start (the last
            # tile would read shifted data), so compute the clamped start
            # explicitly and mask keys to [i*block_k, sk) — masking both
            # the tail and the keys the clamp re-reads.
            start = jnp.minimum(i * block_k, max(sk - block_k, 0))
            k = k_ref[pl.ds(start, block_k), :].astype(jnp.float32)
            v = v_ref[pl.ds(start, block_k), :].astype(jnp.float32)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + start
            valid = jnp.logical_and(col >= i * block_k, col < sk)
            logits = jnp.where(valid, logits, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, n_k, body, (m, l, acc))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_bhsd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """q (G, Sq, D), k/v (G, Sk, D) with G = batch*heads -> (G, Sq, D)."""
    g, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    scale = d**-0.5

    grid = (g, pl.cdiv(sq, block_q))
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, sk=sk, scale=scale
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, sk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, sk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((g, sq, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """(B, S, H, D) convention used by models/attention.py."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    out = flash_attention_bhsd(qt, kt, vt, interpret=interpret)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
