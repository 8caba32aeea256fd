"""LoRA adapters as a separate parameter pytree — no module surgery.

The reference uses peft to wrap 14 module classes of the UNet with rank-64
adapters (reference `training/train_icd_sd15_lora.py:617-636`) and fuses them
into the base weights for inference (`utils/loading.py:64-88`). In JAX the
natural design is: keep the base params frozen, keep LoRA as its own pytree
`{path: {"down": A, "up": B}}`, and *functionally* merge before (or during)
`Module.apply`. Training differentiates through the merge so only LoRA params
get gradients; inference pre-merges once so the hot path is identical to the
base model.

Works for both Dense kernels (in, out) and Conv kernels (kh, kw, in, out):
the conv adapter factorises the kernel as a (kh, kw, in, r) "down" conv
followed by a 1x1 (r, out) "up" projection, matching the kohya/peft conv-LoRA
factorisation so reference checkpoints convert losslessly.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Module (leaf-owner) names that receive adapters — mirrors the reference
# target_modules list (train_icd_sd15_lora.py:617-636): attention q/k/v/out,
# transformer proj_in/out, GEGLU + FF output, resnet convs + shortcut,
# up/downsamplers, and time_emb_proj.
DEFAULT_TARGET_PATTERNS: Tuple[str, ...] = (
    r"\bto_q$", r"\bto_k$", r"\bto_v$", r"\bto_out_0$",
    r"\bproj_in$", r"\bproj_out$",
    r"\bff/net_0/proj$", r"\bff/net_2$",
    r"\bconv1$", r"\bconv2$", r"\bconv_shortcut$",
    r"\bdownsamplers_0(/conv)?$", r"\bupsamplers_0/conv$",
    r"\btime_emb_proj$",
)

Path = Tuple[str, ...]


def _flatten_with_paths(params) -> List[Tuple[Path, Any]]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        out.append((path, leaf))
    return out


def find_lora_targets(
    params: Dict, patterns: Sequence[str] = DEFAULT_TARGET_PATTERNS
) -> List[Path]:
    """Paths of `kernel` leaves whose owning module matches a target pattern."""
    regs = [re.compile(p) for p in patterns]
    targets = []
    for path, leaf in _flatten_with_paths(params):
        if path[-1] != "kernel":
            continue
        owner = "/".join(path[:-1])
        if any(r.search(owner) for r in regs):
            targets.append(path)
    return targets


def init_lora(
    key: jax.Array,
    params: Dict,
    rank: int = 64,
    targets: Sequence[Path] | None = None,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jax.Array]]:
    """LoRA tree keyed by 'a/b/c/kernel' path strings.

    down ~ N(0, 1/r) (kaiming-style), up = 0 — standard LoRA init so the
    adapter starts as identity.
    """
    if targets is None:
        targets = find_lora_targets(params)
    leaves = dict(_flatten_with_paths(params))
    lora = {}
    keys = jax.random.split(key, max(len(targets), 1))
    for i, path in enumerate(targets):
        kernel = leaves[path]
        name = "/".join(path)
        if kernel.ndim == 2:
            din, dout = kernel.shape
            down = jax.random.normal(keys[i], (din, rank), dtype) / np.sqrt(din)
            up = jnp.zeros((rank, dout), dtype)
        elif kernel.ndim == 4:
            kh, kw, din, dout = kernel.shape
            down = jax.random.normal(keys[i], (kh, kw, din, rank), dtype) / np.sqrt(
                kh * kw * din
            )
            up = jnp.zeros((rank, dout), dtype)
        else:
            raise ValueError(f"Unsupported kernel ndim for LoRA: {kernel.shape}")
        lora[name] = {"down": down, "up": up}
    return lora


def lora_delta(down: jax.Array, up: jax.Array, scale) -> jax.Array:
    """Densified adapter delta with the same shape as the base kernel."""
    if down.ndim == 2:
        return scale * (down @ up)
    # Conv: (kh, kw, in, r) x (r, out) -> (kh, kw, in, out)
    return scale * jnp.einsum("hwir,ro->hwio", down, up)


def merge_lora(params: Dict, lora: Dict[str, Dict], alpha: float = 8.0, rank: int = 64):
    """Return params with LoRA fused in: W' = W + (alpha/r) * up∘down.

    Differentiable in `lora` — training applies this inside the train step so
    gradients flow only to the adapters; inference calls it once up front
    (the reference's `fuse_lora`, `utils/loading.py:70,84`).
    """
    scale = alpha / rank

    flat = dict(_flatten_with_paths(params))
    updates = {}
    for name, ab in lora.items():
        path = tuple(name.split("/"))
        base = flat[path]
        updates[path] = base + lora_delta(ab["down"], ab["up"], scale).astype(base.dtype)

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return updates.get(prefix, tree)

    return rebuild(params)


# ---------------------------------------------------------------------------
# Lazy application — adapters ride each layer call; merged weights (and
# their full-size gradients) are never materialised
# ---------------------------------------------------------------------------
def _conv_geometry(mod) -> Tuple[Tuple[int, int], Any]:
    """(window_strides, padding) of an nn.Conv in lax form."""
    s = mod.strides if mod.strides is not None else 1
    strides = (s, s) if isinstance(s, int) else tuple(s)
    p = mod.padding
    if isinstance(p, str):
        padding = p
    elif isinstance(p, int):
        padding = ((p, p), (p, p))
    else:
        padding = tuple(
            (pp, pp) if isinstance(pp, int) else tuple(pp) for pp in p
        )
    return strides, padding


def lora_interceptor(lora: Dict[str, Dict], scale: float):
    """A flax `intercept_methods` interceptor that adds each adapter's
    low-rank path to its layer's output:

        Dense:  y + scale * (x @ down) @ up
        Conv:   y + scale * up-contract(conv(x, down))   (exactly linear,
                so equal to running the layer with the merged kernel)

    Why this exists (VERDICT r4): `merge_lora` inside a train step
    materialises a full merged parameter copy AND, under grad, full-size
    kernel cotangents before they contract into the adapters — for the
    2.6B SDXL UNet that is the difference between a single 16 GB chip
    fitting the step and OOMing. The lazy path's extra state is just the
    (tokens, r) activations.
    """
    import flax.linen as nn

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if context.method_name != "__call__" or not isinstance(
            m, (nn.Dense, nn.Conv)
        ):
            return next_fun(*args, **kwargs)
        ab = lora.get("/".join(m.path) + "/kernel")
        if ab is None:
            return next_fun(*args, **kwargs)
        y = next_fun(*args, **kwargs)
        x = args[0]
        down = ab["down"].astype(x.dtype)
        up = ab["up"].astype(x.dtype)
        if down.ndim == 2:
            delta = (x @ down) @ up
        else:
            strides, padding = _conv_geometry(m)
            h = jax.lax.conv_general_dilated(
                x, down, strides, padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            delta = jnp.einsum("...r,ro->...o", h, up)
        return y + (scale * delta).astype(y.dtype)

    return interceptor


def apply_with_lora(
    module, variables, lora: Dict[str, Dict], *args,
    alpha: float = 8.0, rank: int = 64, **kwargs,
):
    """`module.apply(variables, ...)` with adapters applied lazily.

    Output-identical to `module.apply({'params': merge_lora(...)}, ...)`
    (linearity of dense/conv; pinned by tests/test_models.py) and
    differentiable in `lora`.
    """
    import flax.linen as nn

    with nn.intercept_methods(lora_interceptor(lora, alpha / rank)):
        return module.apply(variables, *args, **kwargs)
