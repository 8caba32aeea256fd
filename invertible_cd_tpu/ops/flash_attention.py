"""Fused (flash) attention as a Pallas TPU kernel — forward AND backward.

The UNet's hot loop is attention over 4096/1024/256 latent tokens
(SURVEY.md §3.1). The forward kernel computes softmax(QK^T/sqrt(d))V with
the online-softmax recurrence — one pass over K/V tiles, fp32 running
max/sum, no (Sq, Sk) probability matrix in HBM.

Training differentiates through attention (reference `training/src/train.py`
runs the student UNet under grad), so the kernel carries a `jax.custom_vjp`:
the forward saves a per-row logsumexp residual and the backward runs two
Pallas kernels (dQ tiled over query rows, dK/dV tiled over key rows) that
recompute probabilities flash-style instead of materialising them.

Layouts (all chosen so no kernel ever transposes on-chip):
  - q/k/v/o/do: (G, S, D) with G = batch*heads; rows on sublanes, D on lanes.
  - lse residual: (G, Sq, 128) fp32, the row value replicated across 128
    lanes (same trick as jax's splash-attention residuals) — each backward
    tile reads `lse[:, :1]` and broadcasts it along the key axis for free.
  - delta = rowsum(dO * O) is recomputed inside each backward kernel from
    the o/do tiles (D <= 160, one VPU reduction) instead of being stored.
  - cross-tile matmuls are NT / TN `dot_general`s (MXU-native, no
    explicit transposition of p/ds tiles).

The p2p controller hook needs materialised probabilities; hooked layers
(<= 32^2 tokens, reference `utils/p2p.py:147`) take the XLA einsum path in
models/attention.py instead — the editing path pays for editability, the
generation path doesn't.

On non-TPU backends the kernel runs in interpreter mode (tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LSE_LANES = 128  # lane replication width of the logsumexp residual


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref=None, *, block_k: int, sk: int, scale: float
):
    """One (q-tile) program: stream K/V tiles, online softmax.

    `lse_ref` is only present when the call is being differentiated —
    the inference path skips the residual write entirely.

    Matmuls run in the INPUT dtype with fp32 accumulation
    (preferred_element_type): bf16 inputs hit the MXU at full bf16 rate
    (casting operands to fp32 first halves it — measured 0.62x vs XLA on
    the batch-16 4096-token shape before this); the softmax recurrence
    itself stays fp32."""
    q = q_ref[...]  # (block_q, D), input dtype
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
            k = k_ref[...]
            v = v_ref[...]
            logits = scale * jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif divisible:
            # aligned path: starts are multiples of block_k (Mosaic-friendly)
            start = pl.multiple_of(i * block_k, block_k)
            k = k_ref[pl.ds(start, block_k), :]
            v = v_ref[pl.ds(start, block_k), :]
            logits = scale * jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # ragged tail: pl.ds CLAMPS an out-of-range start (the last
            # tile would read shifted data), so compute the clamped start
            # explicitly and mask keys to [i*block_k, sk) — masking both
            # the tail and the keys the clamp re-reads.
            start = jnp.minimum(i * block_k, max(sk - block_k, 0))
            k = k_ref[pl.ds(start, block_k), :]
            v = v_ref[pl.ds(start, block_k), :]
            logits = scale * jax.lax.dot_general(
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
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, n_k, body, (m, l, acc))
    l = jnp.maximum(l, 1e-30)
    o_ref[...] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        # (block_q, 1) -> (block_q, LSE_LANES): lane broadcast, no transpose.
        lse_ref[...] = jnp.broadcast_to(m + jnp.log(l), (block_q, LSE_LANES))


def _flash_forward(q, k, v, block_q, block_k, scale, interpret, with_lse=True):
    g, sq, d = q.shape
    sk = k.shape[1]

    grid = (g, pl.cdiv(sq, block_q))
    kernel = functools.partial(_fwd_kernel, block_k=block_k, sk=sk, scale=scale)
    out_specs = [pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((g, sq, d), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((None, block_q, LSE_LANES), lambda b, i: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((g, sq, LSE_LANES), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, sk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, sk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v)
    return out if with_lse else (out[0], None)


# ---------------------------------------------------------------------------
# streamed forward (large head dims: K/V tiles DMA'd via a third grid dim)
# ---------------------------------------------------------------------------


def _fwd_kernel_streamed(
    q_ref, k_ref, v_ref, *refs, block_k: int, sk: int, scale: float, with_lse: bool
):
    """One (q-tile, k-tile) program of the streamed forward.

    The resident-K/V kernel (`_fwd_kernel`) holds all of K and V in VMEM,
    which caps it at sk*d*4B ~ 4 MB — fine for the UNet's heads (d <= 160)
    but impossible for the VAE's single d=512 head over 4096+ tokens
    (reference gets this layer from diffusers `AttnProcessor`; XLA's
    fallback materialises the fp32 (Sq, Sk) probabilities — ~1 GB at the
    SD1.5 batch-16 decode, ~8 ms of the measured VAE stage). Here the key
    axis is a third, sequential ("arbitrary") grid dimension: each step
    DMAs one (block_k, d) K/V tile and folds it into the online-softmax
    state held in VMEM scratch (m/l lane-replicated, acc fp32); the output
    tile is written once, on the last key step."""
    if with_lse:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        o_ref, m_scr, l_scr, acc_scr = refs
        lse_ref = None
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    logits = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if sk % block_k != 0:
        # ragged tail: Pallas pads the OOB k/v tile rows with UNDEFINED
        # data (NaN in interpret mode), so (a) mask the logits of padded
        # key columns to -inf by global column index, and (b) zero the
        # padded v rows — their p weights are exp(-inf)=0, but 0*NaN
        # would still poison the P@V accumulation.
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * block_k
        logits = jnp.where(col < sk, logits, NEG_INF)
        vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + j * block_k
        v = jnp.where(vrow < sk, v, jnp.zeros_like(v))

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        l = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[...] = (acc_scr[...] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[...] = jnp.broadcast_to(
                m_scr[:, :1] + jnp.log(l), lse_ref.shape
            )


def _flash_forward_streamed(
    q, k, v, block_q, block_k, scale, interpret, with_lse=True
):
    g, sq, d = q.shape
    sk = k.shape[1]
    grid = (g, pl.cdiv(sq, block_q), pl.cdiv(sk, block_k))
    kernel = functools.partial(
        _fwd_kernel_streamed, block_k=block_k, sk=sk, scale=scale,
        with_lse=with_lse,
    )
    out_specs = [pl.BlockSpec((None, block_q, d), lambda b, i, j: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((g, sq, d), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((None, block_q, LSE_LANES), lambda b, i, j: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((g, sq, LSE_LANES), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, LSE_LANES), jnp.float32),
            pltpu.VMEM((block_q, LSE_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(q, k, v)
    return out if with_lse else (out[0], None)


def _streamed_backward_xla(q, k, v, o, lse, do, block_k, scale):
    """Backward for the streamed path: flash-style recompute from the saved
    logsumexp, chunked over key tiles in plain XLA (lax.scan).

    The large-d shapes are never under grad on the hot paths (the VAE is
    frozen in reference training, `training/src/train.py`), so this
    prioritises memory-bounded correctness over kernel speed: per tile it
    materialises only (G, Sq, block_k) fp32 intermediates instead of the
    full (Sq, Sk) square."""
    g, sq, d = q.shape
    sk = k.shape[1]
    n_k = pl.cdiv(sk, block_k)
    pad = n_k * block_k - sk
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    lse1 = lse[..., :1]  # (G, Sq, 1)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), -1, keepdims=True
    )

    def body(dq_acc, idx):
        start = idx * block_k
        k_t = jax.lax.dynamic_slice_in_dim(kp, start, block_k, 1)
        v_t = jax.lax.dynamic_slice_in_dim(vp, start, block_k, 1)
        logits = scale * jnp.einsum(
            "gqd,gkd->gqk", q, k_t, preferred_element_type=jnp.float32
        )
        p = jnp.exp(logits - lse1)
        if pad:
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 2) + start
            p = jnp.where(col < sk, p, 0.0)
        dp = jnp.einsum(
            "gqd,gkd->gqk", do, v_t, preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq_acc = dq_acc + jnp.einsum(
            "gqk,gkd->gqd", ds, k_t, preferred_element_type=jnp.float32
        )
        dk_t = jnp.einsum(
            "gqk,gqd->gkd", ds, q, preferred_element_type=jnp.float32
        )
        dv_t = jnp.einsum(
            "gqk,gqd->gkd", p.astype(do.dtype), do,
            preferred_element_type=jnp.float32,
        )
        return dq_acc, (dk_t.astype(k.dtype), dv_t.astype(v.dtype))

    dq, (dks, dvs) = jax.lax.scan(
        body, jnp.zeros(q.shape, jnp.float32), jnp.arange(n_k)
    )
    dk = jnp.moveaxis(dks, 0, 1).reshape(g, n_k * block_k, d)[:, :sk]
    dv = jnp.moveaxis(dvs, 0, 1).reshape(g, n_k * block_k, d)[:, :sk]
    return dq.astype(q.dtype), dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_op_streamed(q, k, v, block_q, block_k, scale, interpret):
    o, _ = _flash_forward_streamed(
        q, k, v, block_q, block_k, scale, interpret, with_lse=False
    )
    return o


def _flash_op_streamed_fwd(q, k, v, block_q, block_k, scale, interpret):
    o, lse = _flash_forward_streamed(
        q, k, v, block_q, block_k, scale, interpret, with_lse=True
    )
    return o, (q, k, v, o, lse)


def _flash_op_streamed_bwd(block_q, block_k, scale, interpret, res, do):
    q, k, v, o, lse = res
    return _streamed_backward_xla(
        q, k, v, o, lse, do.astype(q.dtype), block_k, scale
    )


_flash_op_streamed.defvjp(_flash_op_streamed_fwd, _flash_op_streamed_bwd)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref,
    *, block_k: int, sk: int, scale: float,
):
    """One (q-tile) program: dQ = scale * ds @ K, streaming K/V tiles.

    ds = p * (dp - delta); p recomputed from the saved logsumexp.

    Matmuls run in the input dtype with fp32 accumulation (same rationale
    as _fwd_kernel: bf16 operands keep the MXU at full rate)."""
    q = q_ref[...]  # (bq, D), input dtype
    o = o_ref[...].astype(jnp.float32)
    do = do_ref[...]
    lse = lse_ref[..., :1]  # (bq, 1) — broadcasts along the key axis
    delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)

    block_q = q.shape[0]
    d = q.shape[1]
    acc = jnp.zeros((block_q, d), jnp.float32)

    n_k = pl.cdiv(sk, block_k)
    divisible = sk % block_k == 0
    single_tile = sk <= block_k

    def body(i, acc):
        if single_tile:
            k = k_ref[...]
            v = v_ref[...]
            mask = None
        elif divisible:
            start = pl.multiple_of(i * block_k, block_k)
            k = k_ref[pl.ds(start, block_k), :]
            v = v_ref[pl.ds(start, block_k), :]
            mask = None
        else:
            start = jnp.minimum(i * block_k, max(sk - block_k, 0))
            k = k_ref[pl.ds(start, block_k), :]
            v = v_ref[pl.ds(start, block_k), :]
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, k.shape[0]), 1)
                + start
            )
            mask = jnp.logical_and(col >= i * block_k, col < sk)

        # logits (bq, bk): NT matmul
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(logits - lse)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        # dp (bq, bk): NT matmul
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        # acc += ds @ k: NN matmul
        return acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, n_k, body, acc)
    dq_ref[...] = (acc * scale).astype(dq_ref.dtype)


def _dkdv_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dk_ref, dv_ref,
    *, block_q: int, sq: int, scale: float,
):
    """One (k-tile) program: dK/dV for block_k keys, streaming Q tiles.

    The k tile arrives via a blocked BlockSpec, so a ragged Sk tail is
    padded on read and masked on write by Pallas itself; garbage in padded
    k rows only ever lands in discarded dk/dv rows (p columns touch only
    their own key's gradient row).
    """
    k = k_ref[...]  # (bk, D), input dtype
    v = v_ref[...]
    block_k = k.shape[0]
    d = k.shape[1]

    dk = jnp.zeros((block_k, d), jnp.float32)
    dv = jnp.zeros((block_k, d), jnp.float32)

    n_q = pl.cdiv(sq, block_q)
    divisible = sq % block_q == 0
    single_tile = sq <= block_q

    def body(i, carry):
        dk, dv = carry
        if single_tile:
            q = q_ref[...]
            o = o_ref[...].astype(jnp.float32)
            do = do_ref[...]
            lse = lse_ref[..., :1]
            row_mask = None
        elif divisible:
            start = pl.multiple_of(i * block_q, block_q)
            q = q_ref[pl.ds(start, block_q), :]
            o = o_ref[pl.ds(start, block_q), :].astype(jnp.float32)
            do = do_ref[pl.ds(start, block_q), :]
            lse = lse_ref[pl.ds(start, block_q), :1]
            row_mask = None
        else:
            start = jnp.minimum(i * block_q, max(sq - block_q, 0))
            q = q_ref[pl.ds(start, block_q), :]
            o = o_ref[pl.ds(start, block_q), :].astype(jnp.float32)
            do = do_ref[pl.ds(start, block_q), :]
            lse = lse_ref[pl.ds(start, block_q), :1]
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], block_k), 0)
                + start
            )
            row_mask = jnp.logical_and(row >= i * block_q, row < sq)

        # logits (bq, bk): NT matmul
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(logits - lse)
        if row_mask is not None:
            p = jnp.where(row_mask, p, 0.0)
        delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        # dv += p^T @ do, dk += ds^T @ q: TN matmuls
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, n_q, body, (dk, dv))
    dk_ref[...] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, block_q, block_k, scale, interpret):
    g, sq, d = q.shape
    sk = k.shape[1]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_k=block_k, sk=sk, scale=scale),
        grid=(g, pl.cdiv(sq, block_q)),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, sk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, sk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, LSE_LANES), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((g, sq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, o, do, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel, block_q=block_q, sq=sq, scale=scale),
        grid=(g, pl.cdiv(sk, block_k)),
        in_specs=[
            pl.BlockSpec((None, sq, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, sq, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, sq, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, sq, LSE_LANES), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, sk, d), k.dtype),
            jax.ShapeDtypeStruct((g, sk, d), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, o, do, lse)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_op(q, k, v, block_q, block_k, scale, interpret):
    # primal (inference) path: no residual write — only the vjp forward
    # (taken when the call is differentiated) pays for the lse output
    o, _ = _flash_forward(
        q, k, v, block_q, block_k, scale, interpret, with_lse=False
    )
    return o


def _flash_op_fwd(q, k, v, block_q, block_k, scale, interpret):
    o, lse = _flash_forward(q, k, v, block_q, block_k, scale, interpret)
    return o, (q, k, v, o, lse)


def _flash_op_bwd(block_q, block_k, scale, interpret, res, do):
    q, k, v, o, lse = res
    return _flash_backward(
        q, k, v, o, lse, do.astype(q.dtype), block_q, block_k, scale, interpret
    )


_flash_op.defvjp(_flash_op_fwd, _flash_op_bwd)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "streamed")
)
def flash_attention_bhsd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
    streamed: bool | None = None,
) -> jax.Array:
    """q (G, Sq, D), k/v (G, Sk, D) with G = batch*heads -> (G, Sq, D).

    Differentiable: carries a flash backward pass (custom_vjp), so it is
    safe inside the training losses (reference `training/src/train.py`
    differentiates the student UNet through every attention layer).

    Head dims off the 64-lane grid (SD1.5's 40/80/160) are zero-padded to
    the next multiple of 64 before the kernel and sliced after: zero pad
    columns contribute nothing to QK^T, produce zero output columns in
    P@V, and carry zero gradients through the backward kernels — while the
    softmax scale stays the TRUE head dim's 1/sqrt(d).

    Routing: the resident-K/V kernel needs all of K and V in VMEM
    (~sk*d*2dtypes); past ~4 MB (the VAE's d=512 single head, SDXL-VAE's
    16k tokens) the streamed kernel takes over — K/V tiles arrive via a
    sequential grid dimension, so VMEM holds only one tile at a time.
    """
    sq = q.shape[1]
    sk = k.shape[1]
    d = q.shape[2]
    scale = float(d) ** -0.5
    d_pad = ((d + 63) // 64) * 64
    if streamed is None:
        streamed = sk * d_pad * 2 * q.dtype.itemsize > 4 * 1024 * 1024
    if streamed:
        # bigger tiles amortise the per-tile DMA + state update; q-tile
        # count drops, cutting repeated K/V streaming traffic (measured
        # 3.4 ms vs XLA's 8.7 on the SD1.5 batch-16 VAE decode shape).
        # fp32 inputs (SDXL's fp32 VAE at 16k tokens) double every VMEM
        # tile, and 512/1024 blocks overflow the 16 MB scoped-vmem stack
        # once d=512 — halve the blocks past bf16 to stay under it.
        wide = q.dtype.itemsize > 2
        block_q = block_q or (256 if wide else 512)
        block_k = block_k or (512 if wide else 1024)
    else:
        block_q = block_q or 256
        block_k = block_k or 512
    op = _flash_op_streamed if streamed else _flash_op

    # Blocks must DIVIDE the sequence on real hardware: the masked-tail
    # branches below pass interpret mode, but Mosaic rejects their
    # unaligned tile loads when compiling for the chip (seen at SDXL
    # 96x96-latent training: sk=2304 with block 1024 -> vector.load of a
    # misaligned tile). Fit each block to the largest power-of-two
    # divisor <= the preferred size...
    def _fit(pref: int, s: int) -> int:
        b = min(pref, s)
        while b > 1 and s % b:
            b //= 2
        return b

    block_q = _fit(block_q, sq)
    block_k = _fit(block_k, sk)
    if block_q < 128 or block_k < 128:
        # ...and when no MXU-friendly divisor exists (e.g. s=576), hand
        # the shape to XLA's fused attention instead of running the
        # kernel at a tiny block size.
        logits = jnp.einsum(
            "bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bqk,bkd->bqd", probs, v)
    if d != d_pad:
        pad = ((0, 0), (0, 0), (0, d_pad - d))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        out = op(q, k, v, block_q, block_k, scale, interpret)
        return out[..., :d]
    return op(q, k, v, block_q, block_k, scale, interpret)


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
