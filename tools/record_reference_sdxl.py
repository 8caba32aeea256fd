"""Record reference SDXL activations + trajectories (parity pack, XL).

SDXL twin of `tools/record_reference.py`: run it in a *weights-capable*
environment (torch + diffusers + the published iCD-SDXL checkpoints) to
produce `reference_pack_xl.npz`, which `tests/test_reference_parity_sdxl.py`
replays through the JAX pipeline. This container is zero-egress, so the
pack cannot be produced here.

What it records (fp32 numpy unless noted):
  clip/tokens, clip/tokens2     both tokenizers' ids for the fixed prompts
  clip/context                  (B,77,2048) penultimate-concat prompt embeds
  clip/pooled                   (B,1280) projected pooled embeds
                                (reference utils/generation_sdxl.py:9-76)
  inputs/latent,t,w_emb,time_ids  fixed seeded UNet inputs
  unet/out + unet/<stage>       reference SDXL UNet epsilon + per-stage
                                activations (forward hooks)
  vae/mean, vae/decode          fp32 VAE encode mean / decode
                                (generation_sdxl.py:465-466 decodes fp32)
  gen/init, gen/latents_final, gen/image
                                seeded 4-step sample_deterministic
                                (generation_sdxl.py:324-473), guidance 7.0
                                static (launch_generation_iCD_sdxl.sh)
  inv/start, inv/latents_final  inverse_sample_deterministic at guidance 0
                                (generation_sdxl.py:205-305); `start` is the
                                prepare_latents output (z0 posterior sample
                                noised at t=19) so the replay can derive the
                                exact start noise from its own VAE mean
  edit/latents_final, edit/image
                                amplify-prompt edit from inv/latents_final:
                                dynamic guidance 19.0, tau 0.7, target
                                prompt with amplify_prompt=[source]
                                (running/sdxl/edit.py:201-234)

Usage (in the weights environment):
  python tools/record_reference_sdxl.py \
      --reference /path/to/invertible-cd \
      --teacher_checkpoint sdxl_cfg_distill.pt \
      --reverse_checkpoint iCD-SDXL_reverse_249_499_699_999.safetensors \
      --forward_checkpoint iCD-SDXL_forward_19_249_499_699.safetensors \
      --out tests/golden/reference_pack_xl.npz
"""
from __future__ import annotations

import argparse
import functools
import sys

import numpy as np

REVERSE_TS = [249, 499, 699, 999]  # running/sdxl/README.md:4
FORWARD_TS = [19, 249, 499, 699]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True, help="path to the reference repo")
    ap.add_argument("--model_id", default="stabilityai/stable-diffusion-xl-base-1.0")
    ap.add_argument("--teacher_checkpoint", required=True)
    ap.add_argument("--reverse_checkpoint", required=True)
    ap.add_argument("--forward_checkpoint", required=True)
    ap.add_argument("--out", default="reference_pack_xl.npz")
    ap.add_argument("--prompt", default="a photo of a corgi on the beach")
    ap.add_argument("--edit_prompt", default="a photo of a cat on the beach")
    ap.add_argument("--seed", type=int, default=0)  # running/sdxl/README.md seeds
    ap.add_argument(
        "--dtype", default="fp32", choices=["fp32", "fp16"],
        help="fp32 (default) upcasts the loaded fp16 pipes for tight "
        "tolerances; fp16 records the deployment precision (the replay "
        "test widens its tolerances when pack['meta/dtype']==fp16)",
    )
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import torch
    from utils import generation_sdxl  # reference utils/generation_sdxl.py
    from utils.loading import load_models_xl  # reference utils/loading.py:93

    device = "cuda" if torch.cuda.is_available() else "cpu"
    stable_pipe, pipe, forw_pipe = load_models_xl(
        model_id=args.model_id,
        reverse_checkpoint=args.reverse_checkpoint,
        forward_checkpoint=args.forward_checkpoint,
        teacher_checkpoint=args.teacher_checkpoint,
    )
    if args.dtype == "fp32":
        for p in (pipe, forw_pipe):
            p.to(torch.float32)

    text_encoders = [pipe.text_encoder, pipe.text_encoder_2]
    tokenizers = [pipe.tokenizer, pipe.tokenizer_2]
    compute_embeddings_fn = functools.partial(
        generation_sdxl.compute_embeddings,
        proportion_empty_prompts=0,
        text_encoders=text_encoders,
        tokenizers=tokenizers,
        device=device,
    )

    pack = {"meta/dtype": np.array(args.dtype)}
    rng = np.random.default_rng(0)
    prompts = [args.prompt, args.edit_prompt]

    # ------------------------------------------------------------------
    # 1. Dual-encoder embedding parity (generation_sdxl.py:9-76)
    # ------------------------------------------------------------------
    for i, tok in enumerate(tokenizers):
        ids = tok(
            prompts, padding="max_length", max_length=tok.model_max_length,
            truncation=True, return_tensors="pt",
        ).input_ids
        pack[f"clip/tokens{'2' if i else ''}"] = ids.numpy()
    encoded = compute_embeddings_fn(
        prompts, [(1024, 1024)] * 2, [(0, 0)] * 2
    )
    context = encoded["prompt_embeds"]
    pack["clip/context"] = context.float().cpu().numpy()
    pack["clip/pooled"] = encoded["text_embeds"].float().cpu().numpy()
    pack["inputs/time_ids"] = encoded["time_ids"].float().cpu().numpy()

    # ------------------------------------------------------------------
    # 2. UNet single-call parity with per-stage hooks
    # ------------------------------------------------------------------
    latent = rng.normal(size=(2, 4, 128, 128)).astype(np.float32)
    t = np.array([999, 19], np.int64)
    w = torch.full((2,), 7.0)
    w_emb = generation_sdxl.guidance_scale_embedding(w, embedding_dim=512)
    pack["inputs/latent"] = latent
    pack["inputs/t"] = t
    pack["inputs/w_emb"] = w_emb.float().cpu().numpy()

    unet = pipe.unet
    dt = unet.dtype
    stages = {}

    def hook(name):
        def fn(_m, _i, out):
            o = out[0] if isinstance(out, tuple) else out
            stages[name] = o.detach().float().cpu().numpy()
        return fn

    handles = [unet.conv_in.register_forward_hook(hook("conv_in"))]
    for i, blk in enumerate(unet.down_blocks):
        handles.append(blk.register_forward_hook(hook(f"down_{i}")))
    handles.append(unet.mid_block.register_forward_hook(hook("mid")))
    for i, blk in enumerate(unet.up_blocks):
        handles.append(blk.register_forward_hook(hook(f"up_{i}")))
    with torch.no_grad():
        eps = unet(
            torch.tensor(latent, device=device, dtype=dt),
            torch.tensor(t, device=device),
            encoder_hidden_states=context.to(dt),
            timestep_cond=w_emb.to(device, dt),
            added_cond_kwargs={
                "text_embeds": encoded["text_embeds"].to(dt),
                "time_ids": encoded["time_ids"].to(dt),
            },
        ).sample
    for h in handles:
        h.remove()
    pack["unet/out"] = eps.float().cpu().numpy()
    for name, act in stages.items():
        pack[f"unet/{name}"] = act

    # ------------------------------------------------------------------
    # 3. VAE parity (fp32 decode — generation_sdxl.py:465-466)
    # ------------------------------------------------------------------
    pixels = (rng.uniform(size=(1, 3, 1024, 1024)).astype(np.float32) * 2 - 1)
    pipe.vae.to(torch.float32)
    with torch.no_grad():
        mean = pipe.vae.encode(torch.tensor(pixels, device=device)).latent_dist.mean
        dec = pipe.vae.decode(mean).sample
    pack["inputs/pixels"] = pixels
    pack["vae/mean"] = mean.float().cpu().numpy()
    pack["vae/decode"] = dec.float().cpu().numpy()

    # ------------------------------------------------------------------
    # 4. Seeded 4-step generation (sample_deterministic, static guidance
    #    7.0 — launch_generation_iCD_sdxl.sh)
    # ------------------------------------------------------------------
    gen = torch.Generator().manual_seed(args.seed)
    init = pipe.prepare_latents(
        1, unet.config.in_channels, 1024, 1024, dt, device, gen, None
    )
    pack["gen/init"] = init.float().cpu().numpy()
    image, final = generation_sdxl.sample_deterministic(
        pipe, [args.prompt], latents=init.clone(),
        num_inference_steps=4, timesteps=list(REVERSE_TS),
        guidance_scale=7.0, is_sdxl=True,
        compute_embeddings_fn=compute_embeddings_fn,
        use_dynamic_guidance=False, return_latent=True,
    )
    pack["gen/latents_final"] = final.float().cpu().numpy()
    pack["gen/image"] = np.asarray(image[0])

    # ------------------------------------------------------------------
    # 5. Inversion (inverse_sample_deterministic at guidance 0,
    #    running/sdxl/edit.py:207-219)
    # ------------------------------------------------------------------
    # Same flow as running/sdxl/edit.py:203-205: a uint8 image through the
    # image processor (the replay passes the identical uint8 array).
    from PIL import Image

    img_u8 = ((pixels[0].transpose(1, 2, 0) * 0.5 + 0.5) * 255).round().astype(
        np.uint8
    )
    pack["inputs/image_u8"] = img_u8
    init_image = forw_pipe.image_processor.preprocess(
        Image.fromarray(img_u8)
    ).to(device, forw_pipe.unet.dtype)
    inv_final, inv_start = generation_sdxl.inverse_sample_deterministic(
        forw_pipe, init_image, [args.prompt],
        num_inference_steps=4, timesteps=list(FORWARD_TS),
        generator=torch.Generator(device=device).manual_seed(args.seed),
        guidance_scale=0.0, is_sdxl=True,
        compute_embeddings_fn=compute_embeddings_fn,
        seed=args.seed, return_start_latent=True,
    )
    pack["inv/start"] = inv_start.float().cpu().numpy()
    pack["inv/latents_final"] = inv_final.float().cpu().numpy()

    # ------------------------------------------------------------------
    # 6. Amplify-prompt edit (running/sdxl/edit.py:221-234): sample the
    #    TARGET prompt from the inverted latent with dynamic guidance and
    #    amplify_prompt=[source]
    # ------------------------------------------------------------------
    image, final = generation_sdxl.sample_deterministic(
        pipe, [args.edit_prompt], latents=inv_final.to(dt),
        num_inference_steps=4, timesteps=list(REVERSE_TS),
        guidance_scale=19.0, is_sdxl=True,
        compute_embeddings_fn=compute_embeddings_fn,
        use_dynamic_guidance=True, tau1=0.7, tau2=0.7,
        amplify_prompt=[args.prompt], return_latent=True,
    )
    pack["edit/latents_final"] = final.float().cpu().numpy()
    pack["edit/image"] = np.asarray(image[0])
    pack["edit/source"] = np.array(args.prompt)
    pack["edit/target"] = np.array(args.edit_prompt)

    np.savez_compressed(args.out, **pack)
    print(f"wrote {args.out}: {sorted(pack)}")


if __name__ == "__main__":
    main()
