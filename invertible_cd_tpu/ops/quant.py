"""Int8 inference quantization for the MXU's double-rate int8 path.

TPU v5e executes int8 x int8 -> int32 matmuls/convs at 394 TOPS — 2x the
bf16 peak (197 TFLOP/s). Since the generation pipeline's two hot stages
(UNet calls, VAE decode) are both *compute*-bound in bf16 (measured 53%
and 75% MFU, tools/speed_of_light.py), quantizing their matmul/conv
inputs to int8 raises the speed-of-light itself rather than chasing the
last few percent of the bf16 ceiling.

This module has no analogue in the reference (torch fp16 end to end) —
it is an opt-in capability of the TPU port:

  * weights: symmetric per-output-channel int8 (scale = amax / 127 over
    the input dims), quantized inside the jit program each call — the
    weight tensors are tiny next to the activation traffic they unlock
    (quantizing all 860M UNet params costs ~3 ms/call of HBM traffic vs
    a ~25+ ms MXU win), and keeping the stored params in bf16 means the
    checkpoint format, the torch converters, and LoRA fusion are all
    untouched.
  * activations: symmetric DYNAMIC int8 (scales computed from the live
    tensor's amax inside the program) — per-TOKEN for dense layers
    (the scale factors out of the feature-axis contraction exactly),
    per-tensor for convs. No calibration pass, no recorded statistics,
    no extra state.
  * accumulation: int32 on the MXU, dequantized by the product of the
    two scales straight into the layer's compute dtype; bias adds and
    everything around the matmul stay bf16/fp32.

Enablement is a trace-time scope, NOT a parameter transform:

    with quant_scope("int8"):
        y = model.apply(params, x)       # QConv/QDense lower to int8

`models.layers.QConv` / `QDense` check `current_quant_mode()` when they
trace; outside a scope they are exactly `nn.Conv` / `nn.Dense`. The
pipeline keys its jit cache on the mode so bf16 and int8 programs
coexist (pipelines/pipeline.py `_get_jit`).

Accuracy: per-tensor dynamic activation quant is the standard W8A8
recipe; for diffusion UNets the literature (Q-Diffusion et al.) shows
it costs some fidelity, which is why the mode is opt-in and the
benchmarks report bf16 numbers as the headline. tests/test_quant.py
pins the mechanics (int8 vs fp reference error bounds, param-tree
equality, scope hygiene); tests/test_parallel_inference.py pins that
the quantized programs partition over dp/tp meshes without changing
numerics.

INFERENCE ONLY: the round() in the quantizers has zero gradient, so an
int8 scope around a differentiated apply would train nothing. The
trainer never enters a scope; training stays bf16.

The dynamic per-tensor conv amax is an extra reduction pass over each
conv input (XLA fuses it into the producer, but it still serializes
against the quantize pass). The production answer is the "int8_static"
mode: `pipeline.collect_quant_stats()` calibrates per-conv activation
scales into a 'quant_stats' collection (running amax keyed by module
path, gathered through flax `intercept_methods` — zero model-code
changes), and static inference reads them instead of recomputing. Dense
layers keep dynamic per-token scales in every mode (higher fidelity,
and their amax rides the row reduction for free); convs without stats
fall back to dynamic bit-exactly.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_QUANT_MODE: contextvars.ContextVar[str] = contextvars.ContextVar(
    "icd_tpu_quant_mode", default="off"
)
# Per-call stash for a calibrated conv-input amax: the static-scale
# interceptor (module level — knows WHICH conv is tracing) sets it right
# before the conv body runs; quant_conv_general_dilated (lax level — has
# no module identity) consumes it. Tracing is single-threaded, and the
# interceptor resets the var in a finally, so calls cannot leak into
# each other.
_STATIC_AMAX: contextvars.ContextVar = contextvars.ContextVar(
    "icd_tpu_static_amax", default=None
)

#: Modes understood by quant_scope / the Q-layers:
#:   off         — bit-identical to stock flax layers.
#:   int8        — dynamic scales (per-token dense, per-tensor conv).
#:   int8_static — like int8, but convs use CALIBRATED per-layer scales
#:                 from a 'quant_stats' collection (collect_quant_stats),
#:                 removing the dynamic amax pass over each conv input;
#:                 convs without stats gracefully stay dynamic. Dense
#:                 layers keep dynamic per-token scales (strictly higher
#:                 fidelity; their amax rides the row reduction).
#:   calibrate   — FLOAT math; conv-input amaxes are sown into
#:                 'quant_stats' (apply with mutable=['quant_stats']).
MODES = ("off", "int8", "int8_static", "calibrate")


def current_quant_mode() -> str:
    """The quantization mode active for code tracing right now."""
    return _QUANT_MODE.get()


def _is_quant_conv(module) -> bool:
    return (
        getattr(module, "conv_general_dilated", None)
        is quant_conv_general_dilated
    )


def _calibration_interceptor(next_fun, args, kwargs, context):
    """Sow each quantized conv's input amax (running max across calls)
    into the 'quant_stats' collection, keyed by the module's own path —
    no call-order bookkeeping. Active inside quant_scope('calibrate')."""
    m = context.module
    if _is_quant_conv(m) and args and hasattr(args[0], "astype"):
        amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
        m.sow(
            "quant_stats", "act_amax", amax,
            init_fn=lambda: jnp.zeros((), jnp.float32),
            reduce_fn=jnp.maximum,
        )
    return next_fun(*args, **kwargs)


def _static_scale_interceptor(next_fun, args, kwargs, context):
    """Hand each quantized conv its calibrated amax (if present in the
    'quant_stats' collection passed to apply). Active inside
    quant_scope('int8_static')."""
    m = context.module
    if _is_quant_conv(m) and m.has_variable("quant_stats", "act_amax"):
        token = _STATIC_AMAX.set(m.get_variable("quant_stats", "act_amax"))
        try:
            return next_fun(*args, **kwargs)
        finally:
            _STATIC_AMAX.reset(token)
    return next_fun(*args, **kwargs)


@contextlib.contextmanager
def quant_scope(mode: str):
    """Activate a quantization mode while tracing model code.

    The scope is consulted at TRACE time (flax module __call__), so it
    must wrap the `.apply(...)` call — including when that call happens
    inside a function being traced by `jax.jit`."""
    if mode not in MODES:
        raise ValueError(f"unknown quant mode {mode!r}; expected one of {MODES}")
    import flax.linen as nn

    with contextlib.ExitStack() as stack:
        stack.enter_context(_scope_token(mode))
        if mode == "calibrate":
            stack.enter_context(nn.intercept_methods(_calibration_interceptor))
        elif mode == "int8_static":
            stack.enter_context(nn.intercept_methods(_static_scale_interceptor))
        yield


@contextlib.contextmanager
def _scope_token(mode: str):
    token = _QUANT_MODE.set(mode)
    try:
        yield
    finally:
        _QUANT_MODE.reset(token)


def _amax(x: jax.Array, axes: Optional[Sequence[int]] = None) -> jax.Array:
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=False)
    # Guard all-zero tensors (zero-init benchmark params): scale 0 would
    # produce inf/nan on dequant; 1.0 keeps q = 0 -> y = 0.
    return jnp.where(a > 0, a, 1.0)


def quantize_int8(
    x: jax.Array, axes: Optional[Sequence[int]] = None
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization.

    Args:
      x: float tensor.
      axes: reduction axes for the amax. None -> per-tensor (one scalar
        scale); a tuple -> one scale per remaining axis combination
        (e.g. axes=(0,1,2) on an HWIO conv kernel gives per-output-
        channel scales).
    Returns:
      (q int8, scale float32) with x ~= q * scale.
    """
    amax = _amax(x, axes)
    scale = amax / 127.0
    # Quantize with a PRECOMPUTED reciprocal multiply, not a divide: a
    # divide invites XLA to substitute reciprocal-multiply in some fusion
    # variants and not others, and a 1-ulp difference at a round()
    # boundary flips an int8 bucket — which a multi-step sampler then
    # amplifies into visibly different pixels between otherwise
    # equivalent programs (observed sharded-vs-unsharded on the CPU
    # mesh). An explicit multiply is already canonical.
    r = 127.0 / amax
    shape = [1] * x.ndim
    if axes is not None:
        kept = [d for d in range(x.ndim) if d not in axes]
        for d in kept:
            shape[d] = x.shape[d]
    q = jnp.round(x.astype(jnp.float32) * r.reshape(shape))
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q, scale


def quant_dot_general(
    lhs: jax.Array,
    rhs: jax.Array,
    dimension_numbers,
    precision=None,
    preferred_element_type=None,
):
    """Drop-in `lax.dot_general` for `nn.Dense(dot_general=...)`.

    Outside an int8 scope (or for any contraction pattern other than the
    dense layer's last-dim @ first-dim, or non-float operands) this IS
    `lax.dot_general` — bit-identical programs. Inside the scope: lhs
    gets one dynamic scale per row (token), rhs (the kernel, (K, N))
    one per output column, and the MXU runs int8 x int8 -> int32."""
    dense_dims = (((lhs.ndim - 1,), (0,)), ((), ()))
    if (
        current_quant_mode() not in ("int8", "int8_static")
        or dimension_numbers != dense_dims
        or rhs.ndim != 2
        or not jnp.issubdtype(lhs.dtype, jnp.floating)
        or not jnp.issubdtype(rhs.dtype, jnp.floating)
    ):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    # Per-ROW (per-token) activation scales: the contraction axis is the
    # only reduced dim, so the scale factors out per row exactly like the
    # kernel's per-column scale — strictly tighter than per-tensor (token
    # outliers stop clipping everyone else) at identical MXU cost, just a
    # rank-1 dequant multiply. (Convs can't do this: the window couples
    # neighbouring pixels into one contraction, so they stay per-tensor.)
    lq, sl = quantize_int8(lhs, axes=(lhs.ndim - 1,))  # (...,) per row
    rq, sr = quantize_int8(rhs, axes=(0,))  # (N,) per out column
    acc = jax.lax.dot_general(
        lq, rq, dense_dims, preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * (sl[..., None] * sr)).astype(out_dtype)


def quant_conv_general_dilated(
    lhs: jax.Array,
    rhs: jax.Array,
    window_strides,
    padding,
    lhs_dilation=None,
    rhs_dilation=None,
    dimension_numbers=None,
    feature_group_count=1,
    precision=None,
    preferred_element_type=None,
):
    """Drop-in `lax.conv_general_dilated` for
    `nn.Conv(conv_general_dilated=...)`.

    Quantizes only the plain case the SD models use (no dilation, no
    feature groups, float operands); everything else — and every call
    outside an int8 scope — falls through to `lax.conv_general_dilated`
    unchanged."""
    def _trivial(dil):
        return dil is None or all(int(d) == 1 for d in dil)

    def _channels_last():
        # the scale layout below assumes batch-first/feature-last lhs
        # (NHWC) and out-feature-last rhs (HWIO) — flax's convention
        dn = jax.lax.conv_dimension_numbers(
            lhs.shape, rhs.shape, dimension_numbers
        )
        return (
            dn.lhs_spec[0] == 0
            and dn.lhs_spec[1] == lhs.ndim - 1
            and dn.rhs_spec[0] == rhs.ndim - 1
            and dn.out_spec[0] == 0
            and dn.out_spec[1] == lhs.ndim - 1
        )

    if (
        current_quant_mode() not in ("int8", "int8_static")
        or feature_group_count != 1
        or not _trivial(lhs_dilation)
        or not _trivial(rhs_dilation)
        or not jnp.issubdtype(lhs.dtype, jnp.floating)
        or not jnp.issubdtype(rhs.dtype, jnp.floating)
        or not _channels_last()
    ):
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    # Kernel layout is HWIO under flax's NHWC convention: per-output-
    # channel scales reduce over every dim but the last. The activation
    # stays per-TENSOR: per-pixel scales are unsound (the window mixes
    # neighbouring pixels into one contraction), and per-batch-element
    # (B,) scales — though mathematically exact — were measured to buy
    # nothing while costing determinism: GroupNorm precedes nearly every
    # SD conv, so per-sample ranges are already equalised, and the (B,)
    # dequant broadcast made GSPMD reassociate the scale multiply
    # differently per sharding layout (1-ulp drift -> int8 bucket flips
    # between the sharded and unsharded programs, breaking the bitwise
    # per-apply guarantee tests/test_parallel_inference.py pins).
    static_amax = _STATIC_AMAX.get()
    if current_quant_mode() == "int8_static" and static_amax is not None:
        # calibrated scale (collect_quant_stats): skip the dynamic amax
        # pass over this conv's input; clip() below bounds anything the
        # calibration set did not cover.
        amax = jnp.maximum(jnp.asarray(static_amax, jnp.float32), 1e-12)
        sl = amax / 127.0
        q = jnp.round(lhs.astype(jnp.float32) * (127.0 / amax))
        lq = jnp.clip(q, -127, 127).astype(jnp.int8)
    else:
        lq, sl = quantize_int8(lhs)  # scalar, dynamic
    rq, sr = quantize_int8(rhs, axes=tuple(range(rhs.ndim - 1)))  # (O,)
    acc = jax.lax.conv_general_dilated(
        lq, rq, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sl * sr)).astype(out_dtype)
