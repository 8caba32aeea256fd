"""Attention blocks with functional controller hook points.

The reference implements prompt-to-prompt by monkey-patching every diffusers
`Attention.forward` and passing attention probabilities through a stateful
Python controller (`utils/p2p.py:291-386`). That design is hostile to jit.

Here the hook is a *trace-time closure*: the UNet threads an optional
`attn_hook(probs, meta) -> probs` callable into every attention layer. The
pipeline builds the closure per step; any arrays it captures or records flow
through the surrounding jit as regular traced values, so editing remains a
single compiled program. `meta` is static layer metadata (place in the UNet,
cross/self, resolution, store index) mirroring what `register_attention_control`
derived dynamically.

When no hook is installed the layer uses the fused attention path (no probs
materialisation) — the generation hot loop never pays for editability.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FeedForward, GroupNorm32, QConv, QDense


@dataclasses.dataclass(frozen=True)
class AttnMeta:
    """Static metadata identifying one attention layer (hook dispatch key).

    `store_key`/`store_index` address the layer in the p2p attention store:
    the reference stores only layers whose query length is <= 32^2
    (`utils/p2p.py:147`), in model traversal order per `{place}_{kind}` list.
    """

    place: str  # "down" | "mid" | "up"
    is_cross: bool
    layer_index: int  # global attention layer index in traversal order
    query_len: int
    key_len: int
    heads: int

    @property
    def kind(self) -> str:
        return "cross" if self.is_cross else "self"

    @property
    def store_key(self) -> str:
        return f"{self.place}_{self.kind}"


AttnHook = Callable[[jax.Array, AttnMeta], jax.Array]


def _ambient_tp() -> int:
    """Size of the ambient mesh's "tp" axis at trace time (1 when tracing
    outside any `with mesh:` context)."""
    try:
        # jax.interpreters.pxla.thread_resources is deprecated since
        # JAX 0.8.2; the home module keeps the live object
        from jax._src import mesh as mesh_lib

        tr = mesh_lib.thread_resources
    except Exception:
        try:
            from jax.interpreters import pxla

            tr = pxla.thread_resources
        except Exception:
            return 1
    try:
        mesh = tr.env.physical_mesh
        if not mesh.empty:
            return int(mesh.shape.get("tp", 1))
    except Exception:
        pass
    return 1


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Fused softmax attention; q/k/v are (B, S, H, D).

    Backend selection (measured on v5e, see bench_kernels.py): the Pallas
    flash kernel wins on long-sequence MXU-aligned heads (SDXL's 4096
    tokens x D=64: ~2.6x); XLA's fused attention is at parity or better on
    the short/ragged-head shapes. ICD_TPU_PALLAS_ATTENTION=1 forces the
    kernel everywhere, =0 disables it, unset -> auto heuristic.

    The kernel is grad-safe: it carries a custom_vjp with Pallas backward
    kernels (tests/test_pallas_attention.py::test_grad_*), so the SDXL
    training losses may differentiate through this path.
    """
    import os

    mode = os.environ.get("ICD_TPU_PALLAS_ATTENTION", "auto")
    on_tpu = jax.default_backend() not in ("cpu",)
    d = q.shape[-1]
    sq = q.shape[1]
    sk = k.shape[1]
    g = q.shape[0] * q.shape[2]  # batch * heads
    # Long SELF-attention only (all measured, bench_kernels.py on v5e):
    #   - sq=sk>=1024 aligned dims (SDXL d=64): kernel wins 2.0-2.9x.
    #   - padded dims (SD1.5 d=80 -> 128) win 2.3x at 1024 tokens, but at
    #     4096 tokens the pad waste (d=40 -> 64) loses to XLA's fused
    #     attention (9.1 vs 7.1 ms at batch 16) -> stay on XLA there.
    #   - cross-attention (77 keys): per-tile overhead loses 10x to XLA's
    #     single fused matmul -> always XLA.
    # d <= 256 keeps the full K/V block within VMEM; LARGER aligned head
    # dims (the VAE's single d=512 head) take the streamed kernel, which
    # DMAs K/V tiles instead — XLA's fallback there materialises the fp32
    # (Sq, Sk) probabilities (measured: 8.7 -> 3.4 ms at the SD1.5
    # batch-16 decode shape, 5.0 -> 2.8 ms at SDXL-VAE's 16k tokens;
    # bench_kernels.py).
    # The only XLA win left is the BIG-batch unaligned 4096-token shape:
    # XLA's cost there is strangely non-monotonic in G = batch*heads
    # (measured ms at (b,4096,8,40), xla vs kernel: b1 1.5/0.05, b2
    # 3.1/0.8, b4 5.8/2.4, b8 11.7/5.4, b16 6.7/11.6 — XLA switches to a
    # better strategy exactly at b16, the kernel scales linearly). So the
    # kernel takes every small-G instance (the batch-1/2 latency, invert
    # and edit paths, up to 33x there) and XLA keeps G>64 (the batch-16
    # headline, where the 40->64 lane pad + d<128 MXU contraction waste
    # lose 0.58x — forcing the kernel there made the UNet call
    # 104 -> 140 ms; do not retry).
    aligned = d % 64 == 0
    use = (
        mode == "1"
        or (
            mode == "auto" and on_tpu
            and sq >= 1024 and sk >= 1024
            and (
                (d <= 256 and (aligned or sq < 4096 or g <= 64))
                or (d > 256 and aligned)
            )
        )
    )
    if use and _ambient_tp() > 1:
        # Megatron head sharding (parallel/mesh.py) splits q/k/v on the
        # head axis; pallas_call is a custom call with no partitioning
        # rule, so under tp>1 XLA would all-gather the heads and defeat
        # the sharding. XLA's fused attention partitions the (B,S,H,D)
        # einsums natively — the head-parallel path stays head-parallel.
        use = False
    if use:
        from ..ops.flash_attention import flash_attention

        return flash_attention(q, k, v, interpret=not on_tpu)
    # The XLA fallback's P@V dot lowers to a 'convolution-base-dilated'
    # op (the (16,8,40,4096) fusions in the UNet HLO, ~7 ms each at 64^2).
    # Rewriting it as explicit einsums, or pre-transposing q/k/v to BHSD
    # so every dot is a plain batched matmul, both produced the IDENTICAL
    # optimized program (XLA folds the transposes back; unet call 119.5 ms
    # either way) — and the true limiter at S=4096 is the ~2.1e9 softmax
    # exps per layer on the VPU (~40x weaker than the MXU), a floor the
    # Pallas kernel hits too (block-size sweep: flat ~10 ms/layer across
    # bq 256-1024 x bk 512-2048). Cheaper exponent forms don't move it
    # either: fenced compute-bound chains on the chip put exp ≈ one fused
    # multiply (196 vs 225 Gop/s), with exp2(x·log2e), raw exp2 and bf16
    # exp all within ±6% — the VPU's transcendental is already one-pass,
    # so the floor is total elementwise throughput, not exp specifically
    # (round 4). Round 5 confirmed with IN-KERNEL variants
    # (tools/exp_softmax.py, 32-iter chained timing x3 runs): exp2-folded
    # softmax +0.6 ms/layer, bf16-exp probabilities +0.6 ms (the VPU
    # upcasts), and an unsafe no-running-max bound at -0.8 ms caps the
    # online-softmax bookkeeping at ~8%. Keep the simple call; do not
    # retry — the shipped lever past the floor is int8 (ops/quant.py).
    return jax.nn.dot_product_attention(q, k, v)


def routes_to_explicit(hook: Optional[AttnHook], meta: Optional[AttnMeta]) -> bool:
    """True when this layer must materialise probabilities for the hook.

    A hook may carry a static `applies(meta)` predicate saying it is an
    identity on this layer (e.g. self-attention >32^2 tokens, reference
    p2p.py:178-183) — such layers keep the fused path instead of paying
    for a (B, H, Sq, Sk) probability tensor. Shared by `CrossAttention`
    and tests/test_hook_routing.py so the routing condition is pinned in
    exactly one place.
    """
    if hook is None:
        return False
    applies = getattr(hook, "applies", None)
    return applies is None or bool(applies(meta))


def explicit_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, hook: AttnHook, meta: AttnMeta
) -> jax.Array:
    """Attention with materialised probabilities fed through the controller.

    q/k/v are (B, S, H, D); probs exposed to the hook as (B, H, Sq, Sk) —
    the reference's (batch*heads, Sq, Sk) with batch and heads unflattened.
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    probs = hook(probs, meta)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


class CrossAttention(nn.Module):
    """Multi-head attention (self when no context is given)."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        hook: Optional[AttnHook] = None,
        meta: Optional[AttnMeta] = None,
    ) -> jax.Array:
        inner_dim = x.shape[-1]
        head_dim = inner_dim // self.heads
        ctx = x if context is None else context

        q = QDense(inner_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = QDense(inner_dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = QDense(inner_dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, head_dim)
        k = k.reshape(b, sk, self.heads, head_dim)
        v = v.reshape(b, sk, self.heads, head_dim)

        if routes_to_explicit(hook, meta):
            out = explicit_attention(q, k, v, hook, meta)
        else:
            out = fused_attention(q, k, v)

        out = out.reshape(b, sq, inner_dim)
        return QDense(inner_dim, dtype=self.dtype, name="to_out_0")(out)


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF, all residual."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, place, layer_counter, hook):
        meta_self = _next_meta(layer_counter, place, False, x.shape[1], x.shape[1], self.heads)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.heads, dtype=self.dtype, name="attn1")(
            h, None, hook, meta_self
        )
        meta_cross = _next_meta(
            layer_counter, place, True, x.shape[1], context.shape[1], self.heads
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.heads, dtype=self.dtype, name="attn2")(
            h, context, hook, meta_cross
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


def _next_meta(counter: list, place: str, is_cross: bool, sq: int, sk: int, heads: int):
    meta = AttnMeta(
        place=place, is_cross=is_cross, layer_index=counter[0],
        query_len=sq, key_len=sk, heads=heads,
    )
    counter[0] += 1
    return meta


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> depth x transformer block -> proj_out."""

    heads: int
    depth: int = 1
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, place, layer_counter, hook):
        b, h, w, c = x.shape
        residual = x
        hidden = GroupNorm32(32, epsilon=1e-6, name="norm", dtype=self.dtype)(x)
        if self.use_linear_projection:
            hidden = hidden.reshape(b, h * w, c)
            hidden = QDense(c, dtype=self.dtype, name="proj_in")(hidden)
        else:
            hidden = QConv(c, (1, 1), dtype=self.dtype, name="proj_in")(hidden)
            hidden = hidden.reshape(b, h * w, c)
        for i in range(self.depth):
            hidden = BasicTransformerBlock(
                self.heads, dtype=self.dtype, name=f"transformer_blocks_{i}"
            )(hidden, context, place, layer_counter, hook)
        if self.use_linear_projection:
            hidden = QDense(c, dtype=self.dtype, name="proj_out")(hidden)
            hidden = hidden.reshape(b, h, w, c)
        else:
            hidden = hidden.reshape(b, h, w, c)
            hidden = QConv(c, (1, 1), dtype=self.dtype, name="proj_out")(hidden)
        return hidden + residual
