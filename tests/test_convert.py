"""Converter parity tests.

The strongest check available in this container: build a *random-weight*
HF transformers CLIPTextModel, convert its state dict with our converter,
and require our Flax CLIP to reproduce its outputs to fp32 tolerance.
(diffusers isn't installed here, so UNet/VAE converters are covered by
structural tests + the kohya round-trip.)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from invertible_cd_tpu.models import CLIPTextConfig, CLIPTextModel
from invertible_cd_tpu.models.convert import (
    _kohya_module_to_flax,
    convert_clip_text_from_transformers,
    convert_lora_from_kohya,
    export_lora_to_kohya,
)


class TestClipParity:
    @pytest.fixture(scope="class")
    def hf_pair(self):
        import torch
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModel as HFModel

        hf_cfg = HFConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, eos_token_id=999, bos_token_id=998,
        )
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()
        cfg = CLIPTextConfig(
            vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, eos_token_id=999,
        )
        model = CLIPTextModel(cfg)
        params = convert_clip_text_from_transformers(hf.state_dict())
        return hf, model, params

    def test_last_hidden_state_matches(self, hf_pair):
        import torch

        hf, model, params = hf_pair
        ids = np.random.default_rng(0).integers(0, 997, (2, 77))
        ids[:, 0] = 998
        ids[:, 10] = 999  # eos
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
        out = model.apply(params, jnp.asarray(ids))["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)

    def test_pooled_output_matches(self, hf_pair):
        import torch

        hf, model, params = hf_pair
        ids = np.random.default_rng(1).integers(0, 997, (1, 77))
        ids[:, 0] = 998
        ids[:, 5] = 999
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).pooler_output.numpy()
        out = model.apply(params, jnp.asarray(ids))["pooled_output"]
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


class TestKohyaRoundTrip:
    def test_module_name_mapping(self):
        assert (
            _kohya_module_to_flax(
                "down_blocks_0_attentions_1_transformer_blocks_0_attn1_to_q"
            )
            == "down_blocks_0/attentions_1/transformer_blocks_0/attn1/to_q"
        )
        assert (
            _kohya_module_to_flax(
                "up_blocks_1_attentions_0_transformer_blocks_0_ff_net_0_proj"
            )
            == "up_blocks_1/attentions_0/transformer_blocks_0/ff/net_0/proj"
        )
        assert (
            _kohya_module_to_flax("mid_block_resnets_0_time_emb_proj")
            == "mid_block/resnets_0/time_emb_proj"
        )
        assert (
            _kohya_module_to_flax("down_blocks_1_downsamplers_0_conv")
            == "down_blocks_1/downsamplers_0/conv"
        )

    def test_dense_and_conv_roundtrip(self):
        rng = np.random.default_rng(0)
        lora = {
            "down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q/kernel": {
                "down": rng.normal(size=(32, 4)).astype(np.float32),
                "up": rng.normal(size=(4, 32)).astype(np.float32),
            },
            "down_blocks_0/resnets_0/conv1/kernel": {
                "down": rng.normal(size=(3, 3, 16, 4)).astype(np.float32),
                "up": rng.normal(size=(4, 16)).astype(np.float32),
            },
        }
        kohya = export_lora_to_kohya(lora, alpha=8.0)
        back, alphas = convert_lora_from_kohya(kohya)
        assert set(back) == set(lora)
        for path in lora:
            np.testing.assert_allclose(back[path]["down"], lora[path]["down"])
            np.testing.assert_allclose(back[path]["up"], lora[path]["up"])
            assert alphas[path] == 8.0


class TestClipVisionParity:
    def test_vision_tower_matches_hf(self):
        import torch
        from transformers import CLIPVisionConfig as HFVC
        from transformers import CLIPVisionModelWithProjection as HFVM

        from invertible_cd_tpu.metrics.vit import ViTConfig, ViTEncoder
        from invertible_cd_tpu.models.convert import (
            convert_clip_vision_from_transformers,
        )

        hf_cfg = HFVC(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            projection_dim=16, attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf = HFVM(hf_cfg).eval()
        cfg = ViTConfig(
            image_size=28, patch_size=14, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, projection_dim=16,
        )
        vit = ViTEncoder(cfg)
        params = convert_clip_vision_from_transformers(hf.state_dict())

        rng = np.random.default_rng(0)
        imgs = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.tensor(imgs.transpose(0, 3, 1, 2))).image_embeds.numpy()
        out = vit.apply(params, jnp.asarray(imgs))
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


class TestInceptionConverter:
    def test_structure_matches_flax_init(self):
        """Build a torch-style state dict from the flax shapes (inverse
        transposes), convert it, and require identical tree structure +
        shapes — catches any naming/collection mapping drift."""
        import jax
        import jax.numpy as jnp

        from invertible_cd_tpu.metrics.inception import InceptionV3Features
        from invertible_cd_tpu.models.convert import convert_inception_weights

        mod = InceptionV3Features(resize_input=False)
        variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))

        # flax tree -> synthetic torch state dict
        sd = {}
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        for keypath, leaf in flat:
            keys = [k.key for k in keypath]
            coll, path = keys[0], keys[1:]
            torch_name = ".".join(path[:-1])
            last = path[-1]
            arr = np.asarray(leaf)
            if last == "kernel":
                sd[f"{torch_name}.weight"] = arr.transpose(3, 2, 0, 1)
            elif last == "scale":
                sd[f"{torch_name}.weight"] = arr
            elif last == "bias":
                sd[f"{torch_name}.bias"] = arr
            elif last == "mean":
                sd[f"{torch_name}.running_mean"] = arr
            elif last == "var":
                sd[f"{torch_name}.running_var"] = arr

        converted = convert_inception_weights(sd)
        ref_struct = jax.tree_util.tree_structure(variables)
        conv_struct = jax.tree_util.tree_structure(converted)
        assert ref_struct == conv_struct
        for (kp1, a), (kp2, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables)[0],
            jax.tree_util.tree_flatten_with_path(converted)[0],
        ):
            assert a.shape == b.shape, (kp1, a.shape, b.shape)
        # and the converted tree actually runs
        out = mod.apply(converted, jnp.zeros((1, 299, 299, 3)))
        assert out.shape == (1, 2048)


class TestDinoConverter:
    def test_structure_matches_flax_init(self):
        import dataclasses as dc

        from invertible_cd_tpu.metrics.vit import ViTConfig, ViTEncoder
        from invertible_cd_tpu.models.convert import convert_dinov2_weights

        cfg = dc.replace(
            ViTConfig.tiny(), projection_dim=None, layer_scale_init=1e-5,
            pre_ln=False,
        )
        vit = ViTEncoder(cfg)
        variables = vit.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3))
        )
        d = cfg.hidden_size

        # synthesize a hub-style state dict with matching shapes
        rng = np.random.default_rng(0)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        sd = {
            "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
            "pos_embed": rng.normal(size=(1, n_pos, d)).astype(np.float32),
            "patch_embed.proj.weight": rng.normal(
                size=(d, 3, cfg.patch_size, cfg.patch_size)
            ).astype(np.float32),
            "patch_embed.proj.bias": rng.normal(size=(d,)).astype(np.float32),
            "norm.weight": np.ones(d, np.float32),
            "norm.bias": np.zeros(d, np.float32),
        }
        for i in range(cfg.num_layers):
            sd.update({
                f"blocks.{i}.norm1.weight": np.ones(d, np.float32),
                f"blocks.{i}.norm1.bias": np.zeros(d, np.float32),
                f"blocks.{i}.attn.qkv.weight": rng.normal(size=(3 * d, d)).astype(np.float32),
                f"blocks.{i}.attn.qkv.bias": rng.normal(size=(3 * d,)).astype(np.float32),
                f"blocks.{i}.attn.proj.weight": rng.normal(size=(d, d)).astype(np.float32),
                f"blocks.{i}.attn.proj.bias": rng.normal(size=(d,)).astype(np.float32),
                f"blocks.{i}.ls1.gamma": np.full(d, 1e-5, np.float32),
                f"blocks.{i}.ls2.gamma": np.full(d, 1e-5, np.float32),
                f"blocks.{i}.norm2.weight": np.ones(d, np.float32),
                f"blocks.{i}.norm2.bias": np.zeros(d, np.float32),
                f"blocks.{i}.mlp.fc1.weight": rng.normal(size=(cfg.intermediate_size, d)).astype(np.float32),
                f"blocks.{i}.mlp.fc1.bias": rng.normal(size=(cfg.intermediate_size,)).astype(np.float32),
                f"blocks.{i}.mlp.fc2.weight": rng.normal(size=(d, cfg.intermediate_size)).astype(np.float32),
                f"blocks.{i}.mlp.fc2.bias": rng.normal(size=(d,)).astype(np.float32),
            })
        converted = convert_dinov2_weights(sd)
        assert (
            jax.tree_util.tree_structure(converted)
            == jax.tree_util.tree_structure(variables)
        )
        out = vit.apply(converted, jnp.zeros((1, 28, 28, 3)))
        assert out.shape == (1, cfg.hidden_size)
        assert np.isfinite(np.asarray(out)).all()


class TestLpipsConverter:
    def test_structure_matches_flax_init(self):
        from invertible_cd_tpu.metrics.lpips import LPIPS
        from invertible_cd_tpu.models.convert import (
            _VGG_FEATURE_INDEX, convert_lpips_weights,
        )

        mod = LPIPS()
        variables = mod.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
        )
        rng = np.random.default_rng(0)
        # synthesize torchvision-style VGG features dict from flax shapes
        flax_vgg = variables["params"]["vgg"]
        sd_vgg = {}
        inv = {v[1]: k for k, v in _VGG_FEATURE_INDEX.items()}
        for name, leafs in flax_vgg.items():
            idx = inv[name]
            k = np.asarray(leafs["kernel"])
            sd_vgg[f"features.{idx}.weight"] = k.transpose(3, 2, 0, 1)
            sd_vgg[f"features.{idx}.bias"] = np.asarray(leafs["bias"])
        sd_lin = {}
        for i in range(5):
            k = np.asarray(variables["params"][f"lin{i}"]["kernel"])
            sd_lin[f"lin{i}.model.1.weight"] = k.transpose(3, 2, 0, 1)
        converted = convert_lpips_weights(sd_vgg, sd_lin)
        assert (
            jax.tree_util.tree_structure(converted)
            == jax.tree_util.tree_structure(variables)
        )
        a = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
        d = mod.apply(converted, a, a)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
