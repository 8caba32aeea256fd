"""Synthetic full-shape SD1.5 parity artifacts (VERDICT r3 item 1).

The real reference weights cannot enter this zero-egress container, so the
13 recorded-reference parity tests always skipped. This tool closes the
largest closable part of that gap: it manufactures a *synthetic* SD1.5
bundle at the real architecture (860M UNet, 64x64 latents, full VAE, ViT-L
CLIP text encoder, r=64 kohya LoRAs) with deterministic random weights,
then records a parity pack by running the reference's inference semantics
in torch over the `tests/_torch_blocks.py` oracle models — the exact npz
layout `tools/record_reference.py` produces from the real reference
(reference call sites cited inline below). `tests/test_reference_parity.py`
then exercises its full replay path, un-skipped, at real scale:
converter -> full-graph UNet/VAE/CLIP -> 4-hop generation -> forward-CD
inversion -> p2p-controlled edit.

Two artifacts:
  * weights dir (default tests/golden/synth_sd15/): teacher.safetensors,
    vae.safetensors, text_encoder.safetensors, reverse.safetensors,
    forward.safetensors (kohya LoRA) + MANIFEST.json. ~3.4 GB — NOT
    committed; regenerated on demand (`ensure_weights`, ~1 min) because
    every tensor is a pure function of numpy's stable PCG64 stream.
  * pack npz (default tests/golden/synth_pack_sd15.npz): ~25 MB,
    committed. Recording costs ~40 min of 1-core torch (17 full-size
    batch-2 UNet calls + a 512^2 VAE round trip), hence recorded once
    and shipped.

Usage:
  python tools/make_synthetic_pack.py                 # weights + pack
  python tools/make_synthetic_pack.py --weights_only  # just the weights
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import zlib

import numpy as np

SEED = 20260819
# Bump when weight-generation rules change: the pack stores it and
# ensure_weights() refuses a stale directory.
WEIGHTS_VERSION = 1

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
DEFAULT_WEIGHTS_DIR = os.path.join(_REPO, "tests", "golden", "synth_sd15")
DEFAULT_PACK = os.path.join(_REPO, "tests", "golden", "synth_pack_sd15.npz")

PROMPT = "a photo of a corgi on the beach"
EDIT_PROMPT = "a photo of a cat on the beach"


# ---------------------------------------------------------------------------
# Deterministic weight synthesis
# ---------------------------------------------------------------------------
def _rng_for(tag: str, key: str) -> np.random.Generator:
    """Per-tensor PCG64 stream keyed by (seed, file tag, tensor name) so a
    new/removed tensor never shifts any other tensor's values."""
    return np.random.default_rng(
        [SEED, zlib.crc32(tag.encode()), zlib.crc32(key.encode())]
    )


def _synth_tensor(tag: str, key: str, shape, is_bias: bool) -> np.ndarray:
    rng = _rng_for(tag, key)
    if len(shape) == 1:
        base = 1.0 if (not is_bias) else 0.0  # norm scales ~1, biases ~0
        return (base + 0.05 * rng.standard_normal(shape)).astype(np.float32)
    fan_in = int(np.prod(shape[1:]))
    std = 1.0 / math.sqrt(max(fan_in, 1))
    return (std * rng.standard_normal(shape)).astype(np.float32)


def _fill_module(module, tag: str):
    """Overwrite every float parameter of a torch module deterministically."""
    import torch

    sd = module.state_dict()
    new = {}
    for key, value in sd.items():
        if not torch.is_floating_point(value):
            new[key] = value
            continue
        is_bias = key.endswith("bias")
        new[key] = torch.tensor(
            _synth_tensor(tag, key, tuple(value.shape), is_bias)
        )
    module.load_state_dict(new)


def _build_torch_models():
    """(unet, vae, clip) torch modules at full SD1.5 shapes, synthetic weights."""
    import torch

    sys.path.insert(0, os.path.join(_REPO, "tests"))
    from _torch_blocks import AutoencoderKL as TorchVAE
    from _torch_blocks import UNet2DConditionModel as TorchUNet
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel as HFCLIPTextModel

    from invertible_cd_tpu.models import UNetConfig, VAEConfig

    torch.manual_seed(0)  # module init values are overwritten anyway
    unet = TorchUNet(UNetConfig.sd15()).eval()
    _fill_module(unet, "unet")
    vae = TorchVAE(VAEConfig.sd()).eval()
    _fill_module(vae, "vae")
    clip = HFCLIPTextModel(
        HFCLIPTextConfig(
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77, hidden_act="quick_gelu",
        )
    ).eval()
    _fill_module(clip, "clip")
    return unet, vae, clip


# LoRA targets: the reference trains r=64 adapters on attention qkv/out,
# ff, transformer proj_in/out, resnet convs + shortcut, samplers and
# time_emb_proj (reference train_icd_sd15_lora.py:617-636).
_LORA_SUFFIXES = (
    "to_q", "to_k", "to_v", "to_out.0", "ff.net.0.proj", "ff.net.2",
    "proj_in", "proj_out", "conv1", "conv2", "conv_shortcut",
    "time_emb_proj", "downsamplers.0.conv", "upsamplers.0.conv",
)


def _synth_kohya_lora(unet, tag: str, rank: int = 64, alpha: float = 8.0):
    """Kohya-format LoRA dict over the torch UNet's target modules.

    Keys follow kohya's flattening of the diffusers module path
    (reference `utils/loading.py:10-23`): lora_unet_<path with _>.
    """
    import torch

    out = {}
    for name, module in unet.named_modules():
        if not any(name.endswith(s) for s in _LORA_SUFFIXES):
            continue
        w = module.weight
        flat = "lora_unet_" + name.replace(".", "_")
        if w.ndim == 2:  # Linear (out, in)
            o, i = w.shape
            down = _synth_tensor(tag, f"{name}.down", (rank, i), False)
            up = 0.25 * _synth_tensor(tag, f"{name}.up", (o, rank), False)
        else:  # Conv2d (out, in, kh, kw)
            o, i, kh, kw = w.shape
            down = _synth_tensor(tag, f"{name}.down", (rank, i, kh, kw), False)
            up = 0.25 * _synth_tensor(tag, f"{name}.up", (o, rank, 1, 1), False)
        out[f"{flat}.lora_down.weight"] = down.astype(np.float32)
        out[f"{flat}.lora_up.weight"] = up.astype(np.float32)
        out[f"{flat}.alpha"] = np.asarray(alpha, np.float32)
    return out


def _fuse_kohya_into(unet, kohya: dict):
    """Fuse ΔW = (alpha/r)·up@down into a torch UNet *in place* — the
    reference's `fuse_lora` semantics (`utils/loading.py:64-88`)."""
    import torch

    modules = dict(unet.named_modules())
    seen = set()
    for key in kohya:
        if not key.endswith("lora_down.weight"):
            continue
        flat = key[len("lora_unet_"):-len(".lora_down.weight")]
        # Recover the dotted path: try progressively converting _N_ to .N.
        name = _unflatten_module_name(flat, modules)
        assert name is not None, f"cannot locate module for {flat}"
        seen.add(name)
        down = torch.tensor(kohya[f"lora_unet_{flat}.lora_down.weight"])
        up = torch.tensor(kohya[f"lora_unet_{flat}.lora_up.weight"])
        alpha = float(kohya[f"lora_unet_{flat}.alpha"])
        rank = down.shape[0]
        scale = alpha / rank
        w = modules[name].weight
        if w.ndim == 2:
            delta = up @ down
        else:
            o = up.shape[0]
            delta = (up[:, :, 0, 0] @ down.reshape(rank, -1)).reshape(w.shape)
        with torch.no_grad():
            w += scale * delta.to(w.dtype)
    return seen


def _unflatten_module_name(flat: str, modules: dict):
    """kohya flat name (underscores) -> dotted torch module path, resolved
    against the actual module dict (handles to_out_0, ff_net_0_proj, ...)."""
    parts = flat.split("_")

    def rec(i, acc):
        if i == len(parts):
            name = ".".join(acc)
            return name if name in modules else None
        # try extending the previous token with '_' or starting a new one
        if acc:
            merged = rec(i + 1, acc[:-1] + [acc[-1] + "_" + parts[i]])
            if merged:
                return merged
        started = rec(i + 1, acc + [parts[i]])
        return started

    return rec(1, [parts[0]]) if parts else None


# ---------------------------------------------------------------------------
# Weights directory
# ---------------------------------------------------------------------------
def write_weights(out_dir: str = DEFAULT_WEIGHTS_DIR, verbose: bool = True):
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    unet, vae, clip = _build_torch_models()

    def dump(module, fname, prefix=""):
        sd = {
            prefix + k: v.detach().numpy().astype(np.float32)
            for k, v in module.state_dict().items()
            if v.is_floating_point()
        }
        save_file(sd, os.path.join(out_dir, fname))
        if verbose:
            n = sum(v.size for v in sd.values())
            print(f"  {fname}: {len(sd)} tensors, {n / 1e6:.0f}M params")

    dump(unet, "teacher.safetensors")
    dump(vae, "vae.safetensors")
    # transformers state dicts carry the text_model. prefix the converter
    # expects (models/convert.py convert_clip_text_from_transformers).
    dump(clip, "text_encoder.safetensors")

    rev = _synth_kohya_lora(unet, "lora_reverse")
    fwd = _synth_kohya_lora(unet, "lora_forward")
    save_file(rev, os.path.join(out_dir, "reverse.safetensors"))
    save_file(fwd, os.path.join(out_dir, "forward.safetensors"))
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump({"seed": SEED, "weights_version": WEIGHTS_VERSION}, f)
    if verbose:
        print(f"wrote synthetic SD1.5 weights to {out_dir}")
    return unet, vae, clip, rev, fwd


def ensure_weights(out_dir: str = DEFAULT_WEIGHTS_DIR) -> str:
    """Regenerate the weights dir if absent or stale. Safe to call from
    tests: deterministic, ~1 min, no network."""
    manifest = os.path.join(out_dir, "MANIFEST.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            meta = json.load(f)
        if meta.get("seed") == SEED and meta.get("weights_version") == WEIGHTS_VERSION:
            return out_dir
    write_weights(out_dir, verbose=False)
    return out_dir


# ---------------------------------------------------------------------------
# Reference inference semantics in torch (transcribed, cited)
# ---------------------------------------------------------------------------
def _alphas_cumprod() -> np.ndarray:
    # diffusers DDIMScheduler scaled_linear betas (reference loading.py:39-40)
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def _guidance_scale_embedding(w, dim=512):
    # reference utils/generation.py:96-122
    import torch

    w = w * 1000.0
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
    emb = w.float()[:, None] * emb[None, :]
    return torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)


def _linear_schedule_old(t, guidance_scale, tau1, tau2):
    # reference utils/generation.py:74-81
    t = t / 1000.0
    if t <= tau1:
        gamma = 1.0
    elif t >= tau2:
        gamma = 0.0
    else:
        gamma = (tau2 - t) / (tau2 - tau1)
    return gamma * guidance_scale


def _predicted_origin(eps, t, s, sample, alphas, sigmas):
    # reference utils/generation.py:136-155 (epsilon branch)
    import torch

    a_s = alphas[s].reshape(-1, 1, 1, 1).clone()
    s_s = sigmas[s].reshape(-1, 1, 1, 1).clone()
    a_t = alphas[t].reshape(-1, 1, 1, 1)
    s_t = sigmas[t].reshape(-1, 1, 1, 1)
    a_s[s == 0] = 1.0
    s_s[s == 0] = 0.0
    x0 = (sample - s_t * eps) / a_t
    return a_s * x0 + s_s * eps


def _get_noise_pred(unet, latent, t, context, guidance_scale, w_embed_dim,
                    dynamic_guidance=False, tau1=0.4, tau2=0.6):
    # reference utils/generation.py:211-253 (w-embedded branch; CFG batch
    # doubling kept, cond half consumed)
    import torch

    latents_input = torch.cat([latent] * 2)
    if w_embed_dim > 0:
        g = guidance_scale
        if dynamic_guidance:
            g = _linear_schedule_old(int(t), guidance_scale, tau1, tau2)
        if len(latents_input) == 4:
            w = torch.tensor([0.0, 0.0, 0.0, g])
        else:
            w = torch.tensor([g] * len(latents_input))
        w_embedding = _guidance_scale_embedding(w, w_embed_dim)
    else:
        w_embedding = None
    with torch.no_grad():
        eps = unet(latents_input, torch.full((len(latents_input),), int(t)),
                   context, w_embedding)
    _, cond = eps.chunk(2)
    return cond


class _HookedAttention:
    """register_attention_control twin for the _torch_blocks UNet
    (reference utils/p2p.py:291-386): every Attention.forward computes
    probabilities explicitly, hands them to the controller, then applies
    them to V."""

    def __init__(self, unet, controller):
        self.handles = []
        self.count = 0
        self._patch(unet, controller)
        controller.num_att_layers = self.count

    def _patch(self, unet, controller):
        import torch

        from _torch_blocks import Attention

        def wrap(module, place):
            def forward(x, context=None):
                ctx = x if context is None else context
                is_cross = context is not None
                b, sq, dim = x.shape
                h = module.heads
                d = dim // h
                q = module.to_q(x).view(b, sq, h, d).transpose(1, 2)
                k = module.to_k(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
                v = module.to_v(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
                attn = torch.softmax(
                    q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1
                )
                # controller sees (b*h, sq, sk), batch-major — reference
                # p2p.py:299-352 via head_to_batch_dim
                probs = attn.reshape(b * h, sq, ctx.shape[1])
                probs = controller(probs, is_cross, place)
                attn = probs.reshape(b, h, sq, ctx.shape[1])
                out = (attn @ v).transpose(1, 2).reshape(b, sq, dim)
                return module.to_out[0](out)

            module.forward = forward
            self.count += 1

        def walk(net, place):
            for child in net.children():
                if isinstance(child, Attention):
                    wrap(child, place)
                else:
                    walk(child, place)

        walk(unet.down_blocks, "down")
        walk(unet.mid_block, "mid")
        walk(unet.up_blocks, "up")


def record_pack(weights_dir: str, pack_path: str = DEFAULT_PACK,
                verbose: bool = True):
    import torch

    sys.path.insert(0, os.path.join(_REPO, "tests"))
    from invertible_cd_tpu.utils.tokenizer import default_tokenizer

    def log(*a):
        if verbose:
            print(*a, flush=True)

    unet, vae, clip, rev_lora, fwd_lora = write_weights_or_load(weights_dir)
    reverse_unet = _clone_unet(unet)
    _fuse_kohya_into(reverse_unet, rev_lora)
    forward_unet = _clone_unet(unet)
    _fuse_kohya_into(forward_unet, fwd_lora)

    tokenizer = default_tokenizer()
    ac = _alphas_cumprod()
    alphas = torch.tensor(np.sqrt(ac), dtype=torch.float32)
    sigmas = torch.tensor(np.sqrt(1.0 - ac), dtype=torch.float32)
    # released grid (reference README.md:55-62, record_reference.py defaults)
    reverse_ts = [999, 779, 519, 259]
    reverse_bd = [779, 519, 259, 0]
    forward_ts = [19, 259, 519, 779]
    forward_bd = [259, 519, 779, 999]

    pack = {
        "meta/synthetic": np.array(1),
        "meta/seed": np.array(SEED),
        "meta/weights_version": np.array(WEIGHTS_VERSION),
    }
    rng = np.random.default_rng(0)

    def encode_prompts(prompts):
        tokens = tokenizer(prompts)
        with torch.no_grad():
            hidden = clip(torch.tensor(tokens, dtype=torch.long)).last_hidden_state
        return tokens, hidden

    def init_prompt(prompt):
        # reference generation.py:286-303: context = [uncond; cond]
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        _, cond = encode_prompts(prompts)
        _, uncond = encode_prompts([""] * len(prompts))
        return torch.cat([uncond, cond])

    # ------------------------------------------------------------------
    # 1. UNet single-call parity with per-stage activations
    # ------------------------------------------------------------------
    log("[pack] 1/5 UNet single call ...")
    latent = rng.normal(size=(2, 4, 64, 64)).astype(np.float32)
    t = np.array([999, 19], np.int64)
    tokens = tokenizer([PROMPT, ""])
    with torch.no_grad():
        context = clip(torch.tensor(tokens, dtype=torch.long)).last_hidden_state
    pack["clip/tokens"] = np.asarray(tokens)
    pack["clip/last_hidden"] = context.numpy()

    w_emb = _guidance_scale_embedding(torch.full((2,), 19.0), 512)
    pack["inputs/latent"] = latent
    pack["inputs/t"] = t
    pack["inputs/w"] = np.full((2,), 19.0, np.float32)
    pack["inputs/w_emb"] = w_emb.numpy()

    stages = {}

    def hook(name):
        def fn(_m, _i, out):
            o = out[0] if isinstance(out, tuple) else out
            stages[name] = o.detach().numpy().astype(np.float16)
        return fn

    handles = [reverse_unet.conv_in.register_forward_hook(hook("conv_in"))]
    for i, blk in enumerate(reverse_unet.down_blocks):
        handles.append(blk.register_forward_hook(hook(f"down_{i}")))
    handles.append(reverse_unet.mid_block.register_forward_hook(hook("mid")))
    for i, blk in enumerate(reverse_unet.up_blocks):
        handles.append(blk.register_forward_hook(hook(f"up_{i}")))
    with torch.no_grad():
        eps = reverse_unet(
            torch.tensor(latent), torch.tensor(t), context, w_emb
        )
    for h in handles:
        h.remove()
    pack["unet/out"] = eps.numpy()
    for name, act in stages.items():
        pack[f"unet/{name}"] = act
    assert np.isfinite(pack["unet/out"]).all()

    # ------------------------------------------------------------------
    # 2. VAE parity
    # ------------------------------------------------------------------
    log("[pack] 2/5 VAE ...")
    # Round to fp16 up front: the pack stores pixels as fp16, and both
    # sides (this torch oracle and the JAX replay) must consume the exact
    # same values.
    pixels = (rng.uniform(size=(1, 3, 512, 512)).astype(np.float32) * 2 - 1)
    pixels = pixels.astype(np.float16).astype(np.float32)
    with torch.no_grad():
        mean, _ = vae.encode_moments(torch.tensor(pixels))
        dec = vae.decode(mean)
    pack["inputs/pixels"] = pixels.astype(np.float16)
    pack["vae/mean"] = mean.numpy()
    pack["vae/decode"] = dec.numpy().astype(np.float16)

    # ------------------------------------------------------------------
    # 3. 4-hop reverse-CD generation (reference generation.py:373-412)
    # ------------------------------------------------------------------
    log("[pack] 3/5 generation trajectory ...")
    noise = rng.normal(size=(1, 4, 64, 64)).astype(np.float32)
    pack["gen/noise"] = noise
    ctx = init_prompt(PROMPT)
    z = torch.tensor(noise)
    pack["gen/latents_0"] = z.numpy()
    for i, (tt, ss) in enumerate(zip(reverse_ts, reverse_bd)):
        eps = _get_noise_pred(reverse_unet, z, tt, ctx, 19.0, 512)
        z = _predicted_origin(
            eps, torch.tensor([tt]), torch.tensor([ss]), z, alphas, sigmas
        )
        pack[f"gen/latents_{i + 1}"] = z.numpy()
        log(f"    hop {tt}->{ss}: |z|max={float(z.abs().max()):.3f}")
    assert np.isfinite(pack[f"gen/latents_{len(reverse_ts)}"]).all()

    # ------------------------------------------------------------------
    # 4. Forward-CD inversion (reference generation.py:414-449)
    # ------------------------------------------------------------------
    log("[pack] 4/5 inversion trajectory ...")
    image01 = pixels[0].transpose(1, 2, 0) * 0.5 + 0.5
    image_uint8 = (image01 * 255).astype(np.uint8)
    # image2latent: uint8 -> [-1,1] -> encode mean * 0.18215
    # (reference generation.py:255-284)
    px = torch.tensor(
        (image_uint8.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
    )
    with torch.no_grad():
        z0, _ = vae.encode_moments(px)
    z0 = z0 * 0.18215
    inv_noise = rng.normal(size=tuple(z0.shape)).astype(np.float32)
    pack["inv/noise"] = inv_noise
    start_t = 19
    a19 = float(np.sqrt(ac[start_t]))
    s19 = float(np.sqrt(1 - ac[start_t]))
    z = a19 * z0 + s19 * torch.tensor(inv_noise)
    ctx = init_prompt(PROMPT)
    for tt, ss in zip(forward_ts, forward_bd):
        eps = _get_noise_pred(forward_unet, z, tt, ctx, 0.0, 512)
        z = _predicted_origin(
            eps, torch.tensor([tt]), torch.tensor([ss]), z, alphas, sigmas
        )
        log(f"    hop {tt}->{ss}: |z|max={float(z.abs().max()):.3f}")
    pack["inv/latents_final"] = z.numpy()
    assert np.isfinite(pack["inv/latents_final"]).all()

    # ------------------------------------------------------------------
    # 5. p2p-controlled edit (reference edit.py:369-458, p2p.py:176-265)
    # ------------------------------------------------------------------
    log("[pack] 5/5 controlled edit ...")
    from _torch_p2p_ref import make_controller

    src, tgt = PROMPT, EDIT_PROMPT
    sw = [a for a, b in zip(src.split(), tgt.split()) if a != b]
    tw = [b for a, b in zip(src.split(), tgt.split()) if a != b]
    cross_replace, self_replace = 0.6, 0.4
    controller = make_controller(
        [src, tgt], True, {"default_": cross_replace}, self_replace,
        tokenizer, 4,
        blend_words=(tuple(sw), tuple(tw)) if sw else None,
        equilizer_params={"words": tuple(tw), "values": (4.0,) * len(tw)}
        if tw else None,
    )
    captured = {}
    orig_forward = controller.forward

    def capturing_forward(attn, is_cross, place):
        out = orig_forward(attn, is_cross, place)
        if (is_cross and place == "down" and controller.cur_step == 0
                and attn.shape[1] == 256 and "map" not in captured):
            captured["map"] = out.detach().numpy().copy()
        return out

    controller.forward = capturing_forward
    edit_unet = _clone_unet(reverse_unet)
    _HookedAttention(edit_unet, controller)
    ctx = init_prompt([src, tgt])
    inv = torch.tensor(pack["inv/latents_final"])
    z = inv.expand(2, -1, -1, -1).clone()
    pack["edit/source"] = np.array(src)
    pack["edit/target"] = np.array(tgt)
    pack["edit/cross_replace_steps"] = np.array(cross_replace)
    pack["edit/self_replace_steps"] = np.array(self_replace)
    pack["edit/blend_src"] = np.array(" ".join(sw))
    pack["edit/blend_tgt"] = np.array(" ".join(tw))
    pack["edit/latents_0"] = z.numpy()
    for i, (tt, ss) in enumerate(zip(reverse_ts, reverse_bd)):
        eps = _get_noise_pred(
            edit_unet, z, tt, ctx, 19.0, 512,
            dynamic_guidance=True, tau1=0.8, tau2=0.8,
        )
        z = _predicted_origin(
            eps, torch.tensor([tt, tt]), torch.tensor([ss, ss]), z,
            alphas, sigmas,
        )
        z = controller.step_callback(z)
        pack[f"edit/latents_{i + 1}"] = z.numpy()
        log(f"    hop {tt}->{ss}: |z|max={float(z.abs().max()):.3f}")
    if "map" in captured:
        pack["edit/attn_down16_step0"] = captured["map"].astype(np.float32)
    assert np.isfinite(pack[f"edit/latents_{len(reverse_ts)}"]).all()

    np.savez_compressed(pack_path, **pack)
    size = os.path.getsize(pack_path) / 1e6
    log(f"wrote {pack_path} ({size:.1f} MB): {len(pack)} keys")
    return pack_path


def _clone_unet(unet):
    import copy

    return copy.deepcopy(unet)


def write_weights_or_load(weights_dir: str):
    """Build torch models matching an existing weights dir (or create it)."""
    ensure_weights(weights_dir)
    # Weights are a pure function of the seed: rebuilding reproduces the
    # exact tensors that were saved, so no file reads are needed.
    unet, vae, clip = _build_torch_models()
    rev = _synth_kohya_lora(unet, "lora_reverse")
    fwd = _synth_kohya_lora(unet, "lora_forward")
    return unet, vae, clip, rev, fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights_dir", default=DEFAULT_WEIGHTS_DIR)
    ap.add_argument("--pack", default=DEFAULT_PACK)
    ap.add_argument("--weights_only", action="store_true")
    args = ap.parse_args()
    if args.weights_only:
        write_weights(args.weights_dir)
        return
    record_pack(args.weights_dir, args.pack)


if __name__ == "__main__":
    main()
