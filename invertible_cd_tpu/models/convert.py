"""Torch checkpoint -> Flax parameter converters.

The reference consumes three artifact families (SURVEY.md C1-C3):
  * diffusers UNet / VAE state dicts (incl. the guidance-distilled teacher
    `.pt`, reference `utils/loading.py:46-58`),
  * transformers CLIP text encoder state dicts,
  * kohya-format LoRA safetensors (converted from peft at save time,
    reference `utils/loading.py:10-23`, C2).

These converters are pure key/layout mappers (torch OIHW / (out,in) ->
Flax HWIO / (in,out)); they accept any mapping of name -> numpy/torch
tensor, so they work with `torch.load` state dicts and with safetensors
readers alike. No torch import is required unless tensors are torch.

Naming: the Flax modules in this package deliberately mirror diffusers'
module tree with '.' -> '_' on indices ("down_blocks.0" -> "down_blocks_0"),
so conversion is a mechanical path rewrite plus transposes — auditable
leaf by leaf.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))  # (out,in) -> (in,out)


# ---------------------------------------------------------------------------
# Generic torch-module-path -> flax-path rules
# ---------------------------------------------------------------------------
def _flaxify_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """diffusers/transformers dotted key -> (flax path, leaf kind).

    Returns (path tuple without the trailing weight/bias token, one of
    "conv_w" | "dense_w" | "norm_w" | "bias" | "embed" | "plain").
    """
    parts = key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]

    out = []
    i = 0
    while i < len(mods):
        m = mods[i]
        # collapse numeric indices into the previous name: a.0 -> a_0
        if i + 1 < len(mods) and mods[i + 1].isdigit():
            out.append(f"{m}_{mods[i + 1]}")
            i += 2
        else:
            out.append(m)
            i += 1
    return tuple(out), leaf


_NORM_HINTS = re.compile(
    r"(^|/)((conv_)?norm(\d|_out|_cross)?|layer_norm\d?|final_layer_norm|"
    r"group_norm|bn)$"
)


def convert_torch_tree(
    state_dict: Dict[str, np.ndarray],
    rename=lambda p: p,
) -> Dict:
    """Best-effort structural conversion of a torch state dict into a Flax
    params tree. `rename` post-processes each flax path tuple (for
    model-specific quirks like diffusers' `to_out.0`)."""
    tree: Dict = {}
    for key, value in state_dict.items():
        value = _np(value)
        path, leaf = _flaxify_path(key)
        path = rename(path)
        if path is None:
            continue
        owner = "/".join(path)
        if leaf == "weight":
            if value.ndim == 4:
                _set(tree, path + ("kernel",), _conv_kernel(value))
            elif value.ndim == 2:
                if path[-1] in ("token_embedding",):
                    _set(tree, path + ("embedding",), value)
                else:
                    _set(tree, path + ("kernel",), _dense_kernel(value))
            else:  # 1-D: norm scale
                _set(tree, path + ("scale",), value)
        elif leaf == "bias":
            _set(tree, path + ("bias",), value)
        elif leaf in ("running_mean",):
            _set(tree, path + ("mean",), value)
        elif leaf in ("running_var",):
            _set(tree, path + ("var",), value)
        elif leaf in ("num_batches_tracked",):
            continue
        else:
            _set(tree, path + (leaf,), value)
        del owner
    return tree


# ---------------------------------------------------------------------------
# UNet (diffusers UNet2DConditionModel -> models.unet2d.UNet2DCondition)
# ---------------------------------------------------------------------------
def _unet_rename(path: Tuple[str, ...]):
    p = list(path)
    # diffusers attention output is a ModuleList: to_out.0 -> to_out_0
    for i, name in enumerate(p):
        if name == "to_out_0":
            continue
        if name == "to_out":
            p[i] = "to_out_0"
    # ff.net.0.proj -> ff/net_0/proj ; ff.net.2 -> ff/net_2  (handled by the
    # generic index collapse: net.0 -> net_0, net.2 -> net_2)
    # GroupNorm wrappers in this package sit inside GroupNorm32 -> GroupNorm_0
    joined = "/".join(p)
    if _NORM_HINTS.search(joined) and p[-1].startswith(("norm", "conv_norm")):
        # UNet/VAE GroupNorms: norm1/norm2/norm/conv_norm_out are GroupNorm32
        # wrappers whose inner module is GroupNorm_0.
        if p[-1] not in ("norm_cross",):
            p = p + ["GroupNorm_0"]
    return tuple(p)


def convert_unet_from_diffusers(state_dict: Dict) -> Dict:
    """diffusers UNet2DConditionModel state dict (incl. teacher `.pt`,
    reference `loading.py:54`) -> {'params': ...} for UNet2DCondition.

    Skips torch-only buffers and the unused `conv_norm_out.num_batches...`;
    LayerNorms in transformer blocks (norm1/2/3) are true LayerNorms in
    both frameworks, but inside Transformer2D `norm` is a GroupNorm wrapper
    — the rename hook adds the wrapper level only for GroupNorms.
    """
    def rename(path: Tuple[str, ...]):
        p = list(_unet_rename(path))
        joined = "/".join(p)
        # transformer-block LayerNorms are plain flax LayerNorms (no wrapper)
        if re.search(r"transformer_blocks_\d+/norm[123]/GroupNorm_0$", joined):
            p = p[:-1]
        return tuple(p)

    return {"params": convert_torch_tree(state_dict, rename)}


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL -> models.vae.AutoencoderKL)
# ---------------------------------------------------------------------------
def _vae_rename(path: Tuple[str, ...]):
    p = list(path)
    for i, name in enumerate(p):
        if name == "to_out":
            p[i] = "to_out_0"
    joined = "/".join(p)
    # VAE downsampler conv: diffusers 'downsamplers.0.conv' -> our single
    # conv module named 'downsamplers_0'.
    if joined.endswith("downsamplers_0/conv"):
        p = p[:-1]
    if p[-1] in ("norm1", "norm2", "conv_norm_out", "group_norm"):
        p = p + ["GroupNorm_0"]
    return tuple(p)


def convert_vae_from_diffusers(state_dict: Dict) -> Dict:
    return {"params": convert_torch_tree(state_dict, _vae_rename)}


# ---------------------------------------------------------------------------
# CLIP text encoder (transformers CLIPTextModel -> models.clip.CLIPTextModel)
# ---------------------------------------------------------------------------
def convert_clip_text_from_transformers(state_dict: Dict) -> Dict:
    """transformers CLIPTextModel(.WithProjection) state dict -> flax params.

    HF layout: text_model.embeddings.token_embedding.weight,
    text_model.embeddings.position_embedding.weight,
    text_model.encoder.layers.N.{self_attn.{q,k,v,out}_proj, layer_norm1,
    layer_norm2, mlp.fc1, mlp.fc2}, text_model.final_layer_norm,
    [text_projection.weight].
    """
    tree: Dict = {}
    for key, value in state_dict.items():
        value = _np(value)
        if "position_ids" in key:
            continue
        k = key.replace("text_model.", "")
        if k == "embeddings.token_embedding.weight":
            _set(tree, ("token_embedding", "embedding"), value)
        elif k == "embeddings.position_embedding.weight":
            tree["position_embedding"] = value
        elif k == "text_projection.weight":
            _set(tree, ("text_projection", "kernel"), _dense_kernel(value))
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            layer = f"layers_{parts[2]}"
            sub = parts[3:]
            leaf = sub[-1]
            if sub[0] == "self_attn":
                path = (layer, "self_attn", sub[1])
            elif sub[0] == "mlp":
                path = (layer, sub[1])
            else:  # layer_norm1/2
                path = (layer, sub[0])
            if leaf == "weight":
                if value.ndim == 2:
                    _set(tree, path + ("kernel",), _dense_kernel(value))
                else:
                    _set(tree, path + ("scale",), value)
            else:
                _set(tree, path + ("bias",), value)
        elif k.startswith("final_layer_norm"):
            leaf = "scale" if k.endswith("weight") else "bias"
            _set(tree, ("final_layer_norm", leaf), value)
    return {"params": tree}


# ---------------------------------------------------------------------------
# Kohya / peft LoRA (reference C2, `utils/loading.py:10-23`)
# ---------------------------------------------------------------------------
_KOHYA_RE = re.compile(r"^lora_unet_(.+?)\.(lora_down|lora_up|alpha)(?:\.weight)?$")


def _kohya_module_to_flax(module: str) -> str:
    """kohya flat module name (underscores) -> flax '/'-joined path.

    kohya joins the diffusers path with underscores:
      down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q
    We re-split on known structural tokens.
    """
    tokens = [
        "down_blocks", "up_blocks", "mid_block", "attentions",
        "transformer_blocks", "resnets", "downsamplers", "upsamplers",
        "attn1", "attn2", "to_q", "to_k", "to_v", "to_out_0",
        "proj_in", "proj_out", "ff_net_0_proj", "ff_net_2",
        "conv1", "conv2", "conv_shortcut", "conv", "time_emb_proj",
        "time_embedding", "linear_1", "linear_2", "cond_proj",
    ]
    s = module
    # normalise kohya's to_out_0 spelling variants
    s = s.replace("to_out_0", "to_out_0").replace("ff_net", "ff_net")
    out = []
    while s:
        matched = False
        for tok in tokens:
            if s == tok:
                if tok == "ff_net_0_proj":
                    out.extend(["ff", "net_0", "proj"])
                elif tok == "ff_net_2":
                    out.extend(["ff", "net_2"])
                else:
                    out.append(tok)
                s = ""
                matched = True
                break
            if s.startswith(tok + "_"):
                rest = s[len(tok) + 1:]
                if tok in ("down_blocks", "up_blocks", "attentions",
                           "transformer_blocks", "resnets", "downsamplers",
                           "upsamplers"):
                    m = re.match(r"^(\d+)(?:_(.*))?$", rest)
                    if m:
                        out.append(f"{tok}_{m.group(1)}")
                        s = m.group(2) or ""
                        matched = True
                        break
                if tok == "ff_net_0_proj":
                    out.extend(["ff", "net_0", "proj"])
                    s = rest
                    matched = True
                    break
                if tok == "ff_net_2":
                    out.extend(["ff", "net_2"])
                    s = rest
                    matched = True
                    break
                out.append(tok)
                s = rest
                matched = True
                break
        if not matched:
            # unknown token: consume one underscore-delimited word
            head, _, s = s.partition("_")
            out.append(head)
    return "/".join(out)


def convert_lora_from_kohya(state_dict: Dict) -> Tuple[Dict, Dict[str, float]]:
    """kohya LoRA safetensors -> ({flax_path: {down, up}}, {flax_path: alpha}).

    kohya stores `lora_down.weight` (r, in[, kh, kw]) and `lora_up.weight`
    (out, r[, 1, 1]); our convention is down: (in, r) / (kh, kw, in, r) and
    up: (r, out) so `merge_lora` densifies with plain matmuls
    (models/lora.py). The per-module `alpha` (8 in the reference,
    `loading.py:19-21`) is returned for scale = alpha / rank.
    """
    adapters: Dict[str, Dict[str, np.ndarray]] = {}
    alphas: Dict[str, float] = {}
    for key, value in state_dict.items():
        m = _KOHYA_RE.match(key)
        if not m:
            continue
        module, kind = m.group(1), m.group(2)
        path = _kohya_module_to_flax(module) + "/kernel"
        value = _np(value)
        if kind == "alpha":
            alphas[path] = float(np.asarray(value).reshape(-1)[0])
            continue
        entry = adapters.setdefault(path, {})
        if kind == "lora_down":
            if value.ndim == 4:  # (r, in, kh, kw) -> (kh, kw, in, r)
                entry["down"] = np.transpose(value, (2, 3, 1, 0))
            else:  # (r, in) -> (in, r)
                entry["down"] = np.transpose(value, (1, 0))
        else:  # lora_up
            if value.ndim == 4:  # (out, r, 1, 1) -> (r, out)
                entry["up"] = np.transpose(value[:, :, 0, 0], (1, 0))
            else:  # (out, r) -> (r, out)
                entry["up"] = np.transpose(value, (1, 0))
    return adapters, alphas


def export_lora_to_kohya(lora: Dict, alpha: float = 8.0) -> Dict[str, np.ndarray]:
    """Inverse of `convert_lora_from_kohya` — lets checkpoints trained here
    be consumed by the reference's loaders (C2 round-trip)."""
    out: Dict[str, np.ndarray] = {}
    for path, ab in lora.items():
        module = path[: -len("/kernel")] if path.endswith("/kernel") else path
        flat = module.replace("/", "_")
        down, up = _np(ab["down"]), _np(ab["up"])
        if down.ndim == 4:  # (kh, kw, in, r) -> (r, in, kh, kw)
            out[f"lora_unet_{flat}.lora_down.weight"] = np.transpose(down, (3, 2, 0, 1))
            out[f"lora_unet_{flat}.lora_up.weight"] = np.transpose(up, (1, 0))[:, :, None, None]
        else:
            out[f"lora_unet_{flat}.lora_down.weight"] = np.transpose(down, (1, 0))
            out[f"lora_unet_{flat}.lora_up.weight"] = np.transpose(up, (1, 0))
        out[f"lora_unet_{flat}.alpha"] = np.asarray(alpha, np.float32)
    return out


def load_torch_file(path: str) -> Dict:
    """Load a `.pt`/`.bin` (torch.load) or `.safetensors` file to a flat
    name->numpy dict."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# CLIP vision tower (transformers CLIPVisionModel[WithProjection] -> metrics.vit)
# ---------------------------------------------------------------------------
def convert_clip_vision_from_transformers(state_dict: Dict) -> Dict:
    """transformers CLIPVisionModel(.WithProjection) -> metrics.vit.ViTEncoder
    params (used by the CLIP image scorer, reference `utils/metrics.py:215`).

    HF layout: vision_model.embeddings.{class_embedding,
    patch_embedding.weight, position_embedding.weight}, pre_layrnorm (sic),
    encoder.layers.N.{self_attn.{q,k,v,out}_proj, layer_norm1/2, mlp.fc1/2},
    post_layernorm, [visual_projection.weight].
    """
    tree: Dict = {}
    for key, value in state_dict.items():
        value = _np(value)
        if "position_ids" in key:
            continue
        k = key.replace("vision_model.", "")
        if k == "embeddings.class_embedding":
            tree["class_embedding"] = value
        elif k == "embeddings.patch_embedding.weight":
            _set(tree, ("patch_embed", "kernel"), _conv_kernel(value))
        elif k == "embeddings.patch_embedding.bias":
            _set(tree, ("patch_embed", "bias"), value)
        elif k == "embeddings.position_embedding.weight":
            tree["position_embedding"] = value
        elif k.startswith("pre_layrnorm") or k.startswith("pre_layernorm"):
            leaf = "scale" if k.endswith("weight") else "bias"
            _set(tree, ("pre_layernorm", leaf), value)
        elif k.startswith("post_layernorm"):
            leaf = "scale" if k.endswith("weight") else "bias"
            _set(tree, ("post_layernorm", leaf), value)
        elif k == "visual_projection.weight":
            _set(tree, ("projection", "kernel"), _dense_kernel(value))
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            layer = f"blocks_{parts[2]}"
            sub, leaf = parts[3:-1], parts[-1]
            if sub[0] == "self_attn":
                path = (layer, sub[1])
            elif sub[0] == "mlp":
                path = (layer, sub[1])
            else:  # layer_norm1/2 -> norm1/2
                path = (layer, sub[0].replace("layer_norm", "norm"))
            if leaf == "weight":
                if value.ndim == 2:
                    _set(tree, path + ("kernel",), _dense_kernel(value))
                else:
                    _set(tree, path + ("scale",), value)
            else:
                _set(tree, path + ("bias",), value)
    return {"params": tree}


# ---------------------------------------------------------------------------
# FID InceptionV3 (pytorch-fid pt_inception weights -> metrics.inception)
# ---------------------------------------------------------------------------
def convert_inception_weights(state_dict: Dict) -> Dict:
    """pytorch-fid `pt_inception-2015-12-05` state dict ->
    {"params": ..., "batch_stats": ...} for metrics.inception.

    torchvision naming (Conv2d_1a_3x3.conv.weight, .bn.{weight,bias,
    running_mean,running_var}, Mixed_5b.branch1x1...) maps 1:1 onto our
    module names; BatchNorm statistics go to the flax `batch_stats`
    collection. The classifier head (fc.*) is dropped — FID uses pool3.
    """
    params: Dict = {}
    stats: Dict = {}
    for key, value in state_dict.items():
        if key.startswith("fc.") or "AuxLogits" in key:
            continue
        value = _np(value)
        path, leaf = _flaxify_path(key)
        if leaf == "weight":
            if value.ndim == 4:
                _set(params, path + ("kernel",), _conv_kernel(value))
            else:
                _set(params, path + ("scale",), value)
        elif leaf == "bias":
            _set(params, path + ("bias",), value)
        elif leaf == "running_mean":
            _set(stats, path + ("mean",), value)
        elif leaf == "running_var":
            _set(stats, path + ("var",), value)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# DINOv2 (torch-hub dinov2_vitb14 -> metrics.vit.ViTEncoder)
# ---------------------------------------------------------------------------
def convert_dinov2_weights(state_dict: Dict) -> Dict:
    """torch-hub DINOv2 ViT state dict -> ViTEncoder params
    (reference scores DINOv2 similarity, `utils/metrics.py:176-207`).

    hub layout: cls_token (1,1,D), pos_embed (1,N+1,D), patch_embed.proj,
    blocks.N.{norm1, attn.qkv (fused), attn.proj, ls1.gamma, norm2,
    mlp.fc1, mlp.fc2, ls2.gamma}, norm. The fused qkv splits into thirds.
    """
    tree: Dict = {}
    for key, value in state_dict.items():
        value = _np(value)
        if key == "cls_token":
            tree["class_embedding"] = value.reshape(-1)
        elif key == "pos_embed":
            tree["position_embedding"] = value[0]
        elif key.startswith("patch_embed.proj."):
            leaf = "kernel" if key.endswith("weight") else "bias"
            v = _conv_kernel(value) if value.ndim == 4 else value
            _set(tree, ("patch_embed", leaf), v)
        elif key.startswith("norm."):
            leaf = "scale" if key.endswith("weight") else "bias"
            _set(tree, ("post_layernorm", leaf), value)
        elif key.startswith("blocks."):
            parts = key.split(".")
            layer = f"blocks_{parts[1]}"
            sub = parts[2:]
            if sub[0] == "attn" and sub[1] == "qkv":
                d = value.shape[0] // 3
                qs, ks, vs = value[:d], value[d:2 * d], value[2 * d:]
                for name, chunk in (("q_proj", qs), ("k_proj", ks), ("v_proj", vs)):
                    if key.endswith("weight"):
                        _set(tree, (layer, name, "kernel"), _dense_kernel(chunk))
                    else:
                        _set(tree, (layer, name, "bias"), chunk)
            elif sub[0] == "attn" and sub[1] == "proj":
                leaf = "kernel" if key.endswith("weight") else "bias"
                v = _dense_kernel(value) if value.ndim == 2 else value
                _set(tree, (layer, "out_proj", leaf), v)
            elif sub[0] in ("ls1", "ls2"):
                _set(tree, (layer, sub[0]), value)
            elif sub[0] in ("norm1", "norm2"):
                leaf = "scale" if key.endswith("weight") else "bias"
                _set(tree, (layer, sub[0], leaf), value)
            elif sub[0] == "mlp":
                leaf = "kernel" if key.endswith("weight") else "bias"
                v = _dense_kernel(value) if value.ndim == 2 else value
                _set(tree, (layer, sub[1], leaf), v)
    return {"params": tree}


# ---------------------------------------------------------------------------
# ImageReward-v1.0 (BLIP ViT-L/16 + BERT cross-attn + reward MLP
#   -> metrics.image_reward.ImageReward)
# ---------------------------------------------------------------------------
def convert_image_reward_weights(state_dict: Dict) -> Dict:
    """ImageReward-v1.0 `ImageReward.pt` state dict -> ImageReward params
    (reference scores with the image_reward package, `utils/metrics.py:283-293`).

    Checkpoint layout (BLIP_Pretrain + reward head):
      blip.visual_encoder.*  timm-style ViT-L/16: cls_token, pos_embed,
                             patch_embed.proj, blocks.N.{norm1, attn.qkv
                             (fused), attn.proj, norm2, mlp.fc1/fc2}, norm
      blip.text_encoder.*    BLIP med BertModel: embeddings.{word_embeddings,
                             position_embeddings, LayerNorm}, encoder.layer.N.
                             {attention.self.query/key/value,
                             attention.output.{dense,LayerNorm},
                             crossattention.self.*, crossattention.output.*,
                             intermediate.dense, output.{dense,LayerNorm}}
      mlp.layers.{0,2,4,6,7} the five reward Linears (dropouts between)
    Projection heads / itm head / text decoder of BLIP_Pretrain are unused
    by scoring and skipped.
    """
    vis: Dict = {}
    txt: Dict = {}
    mlp: Dict = {}
    _MLP_FC = {"0": "fc1", "2": "fc2", "4": "fc3", "6": "fc4", "7": "fc5"}
    for key, value in state_dict.items():
        value = _np(value)
        k = key[5:] if key.startswith("blip.") else key
        if k.startswith("visual_encoder."):
            k = k[len("visual_encoder."):]
            if k == "cls_token":
                vis["class_embedding"] = value.reshape(-1)
            elif k == "pos_embed":
                vis["position_embedding"] = value[0]
            elif k.startswith("patch_embed.proj."):
                leaf = "kernel" if k.endswith("weight") else "bias"
                v = _conv_kernel(value) if value.ndim == 4 else value
                _set(vis, ("patch_embed", leaf), v)
            elif k.startswith("norm."):
                leaf = "scale" if k.endswith("weight") else "bias"
                _set(vis, ("post_layernorm", leaf), value)
            elif k.startswith("blocks."):
                parts = k.split(".")
                layer = f"blocks_{parts[1]}"
                sub, leaf = parts[2:-1], parts[-1]
                if sub[0] == "attn" and sub[1] == "qkv":
                    d = value.shape[0] // 3
                    for name, chunk in (
                        ("q_proj", value[:d]), ("k_proj", value[d:2 * d]),
                        ("v_proj", value[2 * d:]),
                    ):
                        if leaf == "weight":
                            _set(vis, (layer, name, "kernel"), _dense_kernel(chunk))
                        else:
                            _set(vis, (layer, name, "bias"), chunk)
                elif sub[0] == "attn" and sub[1] == "proj":
                    v = _dense_kernel(value) if value.ndim == 2 else value
                    _set(vis, (layer, "out_proj",
                               "kernel" if leaf == "weight" else "bias"), v)
                elif sub[0] in ("norm1", "norm2"):
                    _set(vis, (layer, sub[0],
                               "scale" if leaf == "weight" else "bias"), value)
                elif sub[0] == "mlp":
                    v = _dense_kernel(value) if value.ndim == 2 else value
                    _set(vis, (layer, sub[1],
                               "kernel" if leaf == "weight" else "bias"), v)
        elif k.startswith("text_encoder."):
            k = k[len("text_encoder."):]
            if "position_ids" in k:
                continue
            if k == "embeddings.word_embeddings.weight":
                _set(txt, ("word_embeddings", "embedding"), value)
            elif k == "embeddings.position_embeddings.weight":
                txt["position_embeddings"] = value
            elif k.startswith("embeddings.LayerNorm."):
                _set(txt, ("embed_norm",
                           "scale" if k.endswith("weight") else "bias"), value)
            elif k.startswith("encoder.layer."):
                parts = k.split(".")
                layer = f"layer_{parts[2]}"
                sub, leaf = parts[3:-1], parts[-1]
                is_w = leaf == "weight"
                if sub[0] in ("attention", "crossattention"):
                    attn = sub[0]
                    if sub[1] == "self":
                        _set(txt, (layer, attn, sub[2],
                                   "kernel" if is_w else "bias"),
                             _dense_kernel(value) if is_w else value)
                    elif sub[1] == "output" and sub[2] == "dense":
                        _set(txt, (layer, attn, "output",
                                   "kernel" if is_w else "bias"),
                             _dense_kernel(value) if is_w else value)
                    elif sub[1] == "output" and sub[2] == "LayerNorm":
                        _set(txt, (layer, attn, "norm",
                                   "scale" if is_w else "bias"), value)
                elif sub[0] == "intermediate":
                    _set(txt, (layer, "intermediate",
                               "kernel" if is_w else "bias"),
                         _dense_kernel(value) if is_w else value)
                elif sub[0] == "output" and sub[1] == "dense":
                    _set(txt, (layer, "output", "kernel" if is_w else "bias"),
                         _dense_kernel(value) if is_w else value)
                elif sub[0] == "output" and sub[1] == "LayerNorm":
                    _set(txt, (layer, "norm", "scale" if is_w else "bias"), value)
        elif k.startswith("mlp.layers."):
            parts = k.split(".")
            if parts[2] in _MLP_FC:
                is_w = parts[-1] == "weight"
                _set(mlp, (_MLP_FC[parts[2]], "kernel" if is_w else "bias"),
                     _dense_kernel(value) if is_w else value)
    return {"params": {"visual_encoder": vis, "text_encoder": txt, "mlp": mlp}}


# ---------------------------------------------------------------------------
# LPIPS (torchvision VGG16 features + LPIPS linear heads -> metrics.lpips)
# ---------------------------------------------------------------------------
_VGG_FEATURE_INDEX = {
    0: ("vgg", "conv0_0"), 2: ("vgg", "conv0_1"),
    5: ("vgg", "conv1_0"), 7: ("vgg", "conv1_1"),
    10: ("vgg", "conv2_0"), 12: ("vgg", "conv2_1"), 14: ("vgg", "conv2_2"),
    17: ("vgg", "conv3_0"), 19: ("vgg", "conv3_1"), 21: ("vgg", "conv3_2"),
    24: ("vgg", "conv4_0"), 26: ("vgg", "conv4_1"), 28: ("vgg", "conv4_2"),
}


def convert_lpips_weights(
    vgg_state_dict: Dict, lpips_state_dict: Dict
) -> Dict:
    """torchvision `vgg16().features` + LPIPS `lin{i}.model.1.weight`
    heads -> metrics.lpips.LPIPS params (reference uses piq's LPIPS,
    `utils/metrics.py:310-324`)."""
    tree: Dict = {}
    for key, value in vgg_state_dict.items():
        parts = key.split(".")
        # accept "features.N.weight" or bare "N.weight"
        idx = int(parts[1] if parts[0] == "features" else parts[0])
        if idx not in _VGG_FEATURE_INDEX:
            continue
        path = _VGG_FEATURE_INDEX[idx]
        leaf = "kernel" if key.endswith("weight") else "bias"
        v = _np(value)
        _set(tree, path + (leaf,), _conv_kernel(v) if v.ndim == 4 else v)
    for key, value in lpips_state_dict.items():
        m = re.match(r"^lin(\d)\.model\.1\.weight$", key)
        if not m:
            continue
        _set(tree, (f"lin{m.group(1)}", "kernel"), _conv_kernel(_np(value)))
    return {"params": tree}
