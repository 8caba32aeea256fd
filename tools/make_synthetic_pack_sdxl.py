"""Synthetic full-architecture SDXL parity artifacts (VERDICT r3 item 1, XL).

SDXL twin of tools/make_synthetic_pack.py: manufactures a deterministic
synthetic SDXL bundle (2.6B UNet with added-cond pathway, fp32 VAE, dual
text encoders ViT-L + OpenCLIP bigG, r=64 kohya LoRAs) and records the
parity pack `tests/test_reference_parity_sdxl.py` replays — the exact npz
layout of tools/record_reference_sdxl.py.

Resolution: recorded at 512x512 (64x64 latents) instead of the reference's
1024 — every replayed shape flows from the pack, the micro-conditioning
time_ids keep the reference's literal (1024,1024,0,0,1024,1024) values
(they are conditioning *inputs*, not measurements), and 512 keeps the
1-core torch recording tractable (~2.6B params/call). The architecture is
the real one at full width/depth.

Artifacts:
  * weights dir (tests/golden/synth_sdxl/): teacher/vae/text_encoder/
    text_encoder_2 safetensors + reverse/forward kohya LoRAs — ~14 GB,
    NOT committed, regenerated deterministically (`ensure_weights_sdxl`).
  * pack npz (tests/golden/synth_pack_sdxl.npz): committed.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
_TOOLS = os.path.dirname(os.path.abspath(__file__))
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)

from make_synthetic_pack import (  # noqa: E402
    SEED,
    WEIGHTS_VERSION,
    _alphas_cumprod,
    _fill_module,
    _fuse_kohya_into,
    _guidance_scale_embedding,
    _linear_schedule_old,
    _predicted_origin,
    _synth_kohya_lora,
)

DEFAULT_WEIGHTS_DIR = os.path.join(_REPO, "tests", "golden", "synth_sdxl")
DEFAULT_PACK = os.path.join(_REPO, "tests", "golden", "synth_pack_sdxl.npz")

PROMPT = "a photo of a corgi on the beach"
EDIT_PROMPT = "a photo of a cat on the beach"

REVERSE_TS = [999, 699, 499, 249]   # running/sdxl/README.md:4 grid, reversed
REVERSE_BD = [699, 499, 249, 0]
FORWARD_TS = [19, 249, 499, 699]
FORWARD_BD = [249, 499, 699, 999]

LATENT = 64  # 512x512 pixels; see module docstring


def _build_torch_models():
    import torch

    sys.path.insert(0, os.path.join(_REPO, "tests"))
    from _torch_blocks import AutoencoderKL as TorchVAE
    from _torch_blocks import UNet2DConditionModel as TorchUNet
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel as HFCLIPTextModel
    from transformers import CLIPTextModelWithProjection as HFCLIPProj

    from invertible_cd_tpu.models import UNetConfig, VAEConfig

    torch.manual_seed(0)
    unet = TorchUNet(UNetConfig.sdxl()).eval()
    _fill_module(unet, "unet_xl")
    vae = TorchVAE(VAEConfig.sdxl()).eval()
    _fill_module(vae, "vae_xl")
    clip = HFCLIPTextModel(
        HFCLIPTextConfig(
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77, hidden_act="quick_gelu",
            eos_token_id=49407,
        )
    ).eval()
    _fill_module(clip, "clip_xl_1")
    # OpenCLIP bigG text tower (reference utils/loading.py:93-147 loads it
    # as CLIPTextModelWithProjection): gelu act, 1280 wide, 32 layers,
    # projected pooled output.
    clip2 = HFCLIPProj(
        HFCLIPTextConfig(
            vocab_size=49408, hidden_size=1280, intermediate_size=5120,
            num_hidden_layers=32, num_attention_heads=20,
            max_position_embeddings=77, hidden_act="gelu",
            projection_dim=1280, eos_token_id=49407,
        )
    ).eval()
    _fill_module(clip2, "clip_xl_2")
    return unet, vae, clip, clip2


def write_weights(out_dir: str = DEFAULT_WEIGHTS_DIR, verbose: bool = True):
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    unet, vae, clip, clip2 = _build_torch_models()

    def dump(module, fname):
        sd = {
            k: v.detach().numpy().astype(np.float32)
            for k, v in module.state_dict().items()
            if v.is_floating_point()
        }
        save_file(sd, os.path.join(out_dir, fname))
        if verbose:
            n = sum(v.size for v in sd.values())
            print(f"  {fname}: {len(sd)} tensors, {n / 1e6:.0f}M params",
                  flush=True)

    dump(unet, "teacher.safetensors")
    dump(vae, "vae.safetensors")
    dump(clip, "text_encoder.safetensors")
    dump(clip2, "text_encoder_2.safetensors")
    rev = _synth_kohya_lora(unet, "lora_reverse_xl")
    fwd = _synth_kohya_lora(unet, "lora_forward_xl")
    save_file(rev, os.path.join(out_dir, "reverse.safetensors"))
    save_file(fwd, os.path.join(out_dir, "forward.safetensors"))
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump({"seed": SEED, "weights_version": WEIGHTS_VERSION}, f)
    if verbose:
        print(f"wrote synthetic SDXL weights to {out_dir}", flush=True)
    return unet, vae, clip, clip2, rev, fwd


def ensure_weights_sdxl(out_dir: str = DEFAULT_WEIGHTS_DIR) -> str:
    manifest = os.path.join(out_dir, "MANIFEST.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            meta = json.load(f)
        if meta.get("seed") == SEED and meta.get("weights_version") == WEIGHTS_VERSION:
            return out_dir
    write_weights(out_dir, verbose=False)
    return out_dir


def record_pack(weights_dir: str, pack_path: str = DEFAULT_PACK,
                verbose: bool = True):
    import torch

    from invertible_cd_tpu.utils.tokenizer import default_tokenizer

    def log(*a):
        if verbose:
            print(*a, flush=True)

    unet, vae, clip, clip2, rev_lora, fwd_lora = write_weights(
        weights_dir, verbose=False
    )
    import copy

    reverse_unet = copy.deepcopy(unet)
    _fuse_kohya_into(reverse_unet, rev_lora)
    forward_unet = unet  # reuse storage: fuse the forward LoRA in place
    _fuse_kohya_into(forward_unet, fwd_lora)

    tok = default_tokenizer()
    tok2 = default_tokenizer(pad_token_id=0)
    ac = _alphas_cumprod()
    alphas = torch.tensor(np.sqrt(ac), dtype=torch.float32)
    sigmas = torch.tensor(np.sqrt(1.0 - ac), dtype=torch.float32)

    pack = {
        "meta/dtype": np.array("fp32"),
        "meta/synthetic": np.array(1),
        "meta/seed": np.array(SEED),
        "meta/weights_version": np.array(WEIGHTS_VERSION),
    }
    rng = np.random.default_rng(0)
    prompts = [PROMPT, EDIT_PROMPT]

    def encode(prompt_list):
        """(context (B,77,2048), pooled (B,1280)) — reference
        generation_sdxl.py:9-44: penultimate hidden states of BOTH
        encoders concatenated; pooled = projected pooled of encoder 2."""
        ids1 = torch.tensor(tok(prompt_list), dtype=torch.long)
        ids2 = torch.tensor(tok2(prompt_list), dtype=torch.long)
        with torch.no_grad():
            out1 = clip(ids1, output_hidden_states=True)
            out2 = clip2(ids2, output_hidden_states=True)
        ctx = torch.cat([out1.hidden_states[-2], out2.hidden_states[-2]], dim=-1)
        return ids1, ids2, ctx, out2.text_embeds

    def time_ids(b):
        # reference compute_embeddings (generation_sdxl.py:47-76) with the
        # protocol's (1024,1024)/(0,0) micro-conditioning values
        row = torch.tensor([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0])
        return row.expand(b, 6).contiguous()

    def unet_step(model, z, t, ctx, pooled, w):
        w_emb = _guidance_scale_embedding(
            torch.full((len(z),), float(w)), 512
        )
        with torch.no_grad():
            return model(
                z, torch.full((len(z),), int(t)), ctx, w_emb,
                {"text_embeds": pooled, "time_ids": time_ids(len(z))},
            )

    # ------------------------------------------------------------------
    # 1. Dual-encoder embeddings
    # ------------------------------------------------------------------
    log("[xl] 1/6 dual encoders ...")
    ids1, ids2, ctx_pair, pooled_pair = encode(prompts)
    pack["clip/tokens"] = ids1.numpy()
    pack["clip/tokens2"] = ids2.numpy()
    pack["clip/context"] = ctx_pair.numpy()
    pack["clip/pooled"] = pooled_pair.numpy()
    pack["inputs/time_ids"] = time_ids(2).numpy()

    # ------------------------------------------------------------------
    # 2. UNet single call with per-stage hooks
    # ------------------------------------------------------------------
    log("[xl] 2/6 UNet single call ...")
    latent = rng.normal(size=(2, 4, LATENT, LATENT)).astype(np.float32)
    t = np.array([999, 19], np.int64)
    w_emb = _guidance_scale_embedding(torch.full((2,), 7.0), 512)
    pack["inputs/latent"] = latent
    pack["inputs/t"] = t
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
            torch.tensor(latent), torch.tensor(t), ctx_pair, w_emb,
            {"text_embeds": pooled_pair, "time_ids": time_ids(2)},
        )
    for h in handles:
        h.remove()
    pack["unet/out"] = eps.numpy()
    for name, act in stages.items():
        pack[f"unet/{name}"] = act
    assert np.isfinite(pack["unet/out"]).all()

    # ------------------------------------------------------------------
    # 3. VAE (fp32, generation_sdxl.py:465-466)
    # ------------------------------------------------------------------
    log("[xl] 3/6 VAE ...")
    pixels = (rng.uniform(size=(1, 3, 8 * LATENT, 8 * LATENT)).astype(np.float32)
              * 2 - 1)
    pixels = pixels.astype(np.float16).astype(np.float32)
    with torch.no_grad():
        mean, _ = vae.encode_moments(torch.tensor(pixels))
        dec = vae.decode(mean)
    pack["inputs/pixels"] = pixels.astype(np.float16)
    pack["vae/mean"] = mean.numpy()
    pack["vae/decode"] = dec.numpy().astype(np.float16)

    # ------------------------------------------------------------------
    # 4. Seeded 4-hop generation (sample_deterministic, static guidance
    #    7.0 — launch_generation_iCD_sdxl.sh; no CFG doubling: guidance
    #    rides the w-embedding, generation_sdxl.py:426-431)
    # ------------------------------------------------------------------
    log("[xl] 4/6 generation trajectory ...")
    init = rng.normal(size=(1, 4, LATENT, LATENT)).astype(np.float32)
    pack["gen/init"] = init
    _, _, ctx_src, pooled_src = encode([PROMPT])
    z = torch.tensor(init)
    for tt, ss in zip(REVERSE_TS, REVERSE_BD):
        eps = unet_step(reverse_unet, z, tt, ctx_src, pooled_src, 7.0)
        z = _predicted_origin(
            eps, torch.tensor([tt]), torch.tensor([ss]), z, alphas, sigmas
        )
        log(f"    hop {tt}->{ss}: |z|max={float(z.abs().max()):.3f}")
    pack["gen/latents_final"] = z.numpy()
    assert np.isfinite(pack["gen/latents_final"]).all()

    # ------------------------------------------------------------------
    # 5. Inversion (inverse_sample_deterministic at guidance 0,
    #    generation_sdxl.py:205-305): start latent recorded so the replay
    #    derives its exact start noise from its own VAE mean
    # ------------------------------------------------------------------
    log("[xl] 5/6 inversion trajectory ...")
    img_u8 = ((pixels[0].transpose(1, 2, 0) * 0.5 + 0.5) * 255).round().astype(
        np.uint8
    )
    pack["inputs/image_u8"] = img_u8
    px = torch.tensor(
        (img_u8.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
    )
    with torch.no_grad():
        z0, _ = vae.encode_moments(px)
    z0 = z0 * 0.13025  # SDXL scaling factor
    start_t = 19
    a19 = float(np.sqrt(ac[start_t]))
    s19 = float(np.sqrt(1 - ac[start_t]))
    inv_noise = rng.normal(size=tuple(z0.shape)).astype(np.float32)
    z = a19 * z0 + s19 * torch.tensor(inv_noise)
    pack["inv/start"] = z.numpy()
    for tt, ss in zip(FORWARD_TS, FORWARD_BD):
        eps = unet_step(forward_unet, z, tt, ctx_src, pooled_src, 0.0)
        z = _predicted_origin(
            eps, torch.tensor([tt]), torch.tensor([ss]), z, alphas, sigmas
        )
        log(f"    hop {tt}->{ss}: |z|max={float(z.abs().max()):.3f}")
    pack["inv/latents_final"] = z.numpy()
    assert np.isfinite(pack["inv/latents_final"]).all()

    # ------------------------------------------------------------------
    # 6. Amplify-prompt edit (running/sdxl/edit.py:221-234): TARGET prompt
    #    from the inverted latent, dynamic guidance 19/tau 0.7, source
    #    context while t > tau1*1000. NB the reference swaps ONLY the
    #    context — pooled/time_ids stay the target's
    #    (generation_sdxl.py:436-440 pops prompt_embeds alone).
    # ------------------------------------------------------------------
    log("[xl] 6/6 amplify edit ...")
    _, _, ctx_tgt, pooled_tgt = encode([EDIT_PROMPT])
    z = torch.tensor(pack["inv/latents_final"])
    tau1 = tau2 = 0.7
    for tt, ss in zip(REVERSE_TS, REVERSE_BD):
        ctx = ctx_src if tt > tau1 * 1000 else ctx_tgt
        w = _linear_schedule_old(tt, 19.0, tau1, tau2)
        eps = unet_step(reverse_unet, z, tt, ctx, pooled_tgt, w)
        z = _predicted_origin(
            eps, torch.tensor([tt]), torch.tensor([ss]), z, alphas, sigmas
        )
        log(f"    hop {tt}->{ss}: |z|max={float(z.abs().max()):.3f}")
    pack["edit/latents_final"] = z.numpy()
    pack["edit/source"] = np.array(PROMPT)
    pack["edit/target"] = np.array(EDIT_PROMPT)
    assert np.isfinite(pack["edit/latents_final"]).all()

    np.savez_compressed(pack_path, **pack)
    log(f"wrote {pack_path} ({os.path.getsize(pack_path) / 1e6:.1f} MB): "
        f"{len(pack)} keys")
    return pack_path


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
