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


class TestImageRewardConverter:
    def test_structure_matches_flax_init(self):
        """Synthesize a tiny ImageReward-v1.0-style state dict (BLIP ViT
        fused-qkv naming + BERT med naming + mlp.layers.{0,2,4,6,7}) and
        check the converter reproduces the flax init structure exactly
        (VERDICT round-1 item 8)."""
        import dataclasses as dc

        from invertible_cd_tpu.metrics.image_reward import BertConfig, ImageReward
        from invertible_cd_tpu.metrics.vit import ViTConfig
        from invertible_cd_tpu.models.convert import convert_image_reward_weights

        vcfg = dc.replace(ViTConfig.tiny(), projection_dim=None, pre_ln=False,
                          norm_eps=1e-6)
        bcfg = BertConfig.tiny(encoder_width=vcfg.hidden_size)
        model = ImageReward(vcfg, bcfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 28, 28, 3)),
            jnp.zeros((1, 10), jnp.int32),
        )

        rng = np.random.default_rng(1)
        d = vcfg.hidden_size
        h = bcfg.hidden_size
        n_pos = (vcfg.image_size // vcfg.patch_size) ** 2 + 1
        sd = {
            "blip.visual_encoder.cls_token": rng.normal(size=(1, 1, d)),
            "blip.visual_encoder.pos_embed": rng.normal(size=(1, n_pos, d)),
            "blip.visual_encoder.patch_embed.proj.weight": rng.normal(
                size=(d, 3, vcfg.patch_size, vcfg.patch_size)),
            "blip.visual_encoder.patch_embed.proj.bias": rng.normal(size=(d,)),
            "blip.visual_encoder.norm.weight": np.ones(d),
            "blip.visual_encoder.norm.bias": np.zeros(d),
            "blip.text_encoder.embeddings.word_embeddings.weight": rng.normal(
                size=(bcfg.vocab_size, h)),
            "blip.text_encoder.embeddings.position_embeddings.weight": rng.normal(
                size=(bcfg.max_position_embeddings, h)),
            "blip.text_encoder.embeddings.LayerNorm.weight": np.ones(h),
            "blip.text_encoder.embeddings.LayerNorm.bias": np.zeros(h),
            # unused BLIP_Pretrain heads must be skipped
            "blip.vision_proj.weight": rng.normal(size=(8, d)),
            "blip.itm_head.weight": rng.normal(size=(2, h)),
            "blip.temp": np.asarray(0.07),
        }
        for i in range(vcfg.num_layers):
            p = f"blip.visual_encoder.blocks.{i}"
            sd.update({
                f"{p}.norm1.weight": np.ones(d), f"{p}.norm1.bias": np.zeros(d),
                f"{p}.attn.qkv.weight": rng.normal(size=(3 * d, d)),
                f"{p}.attn.qkv.bias": rng.normal(size=(3 * d,)),
                f"{p}.attn.proj.weight": rng.normal(size=(d, d)),
                f"{p}.attn.proj.bias": rng.normal(size=(d,)),
                f"{p}.norm2.weight": np.ones(d), f"{p}.norm2.bias": np.zeros(d),
                f"{p}.mlp.fc1.weight": rng.normal(size=(vcfg.intermediate_size, d)),
                f"{p}.mlp.fc1.bias": rng.normal(size=(vcfg.intermediate_size,)),
                f"{p}.mlp.fc2.weight": rng.normal(size=(d, vcfg.intermediate_size)),
                f"{p}.mlp.fc2.bias": rng.normal(size=(d,)),
            })
        for i in range(bcfg.num_layers):
            p = f"blip.text_encoder.encoder.layer.{i}"
            for attn, kvdim in (("attention", h), ("crossattention", d)):
                sd.update({
                    f"{p}.{attn}.self.query.weight": rng.normal(size=(h, h)),
                    f"{p}.{attn}.self.query.bias": rng.normal(size=(h,)),
                    f"{p}.{attn}.self.key.weight": rng.normal(size=(h, kvdim)),
                    f"{p}.{attn}.self.key.bias": rng.normal(size=(h,)),
                    f"{p}.{attn}.self.value.weight": rng.normal(size=(h, kvdim)),
                    f"{p}.{attn}.self.value.bias": rng.normal(size=(h,)),
                    f"{p}.{attn}.output.dense.weight": rng.normal(size=(h, h)),
                    f"{p}.{attn}.output.dense.bias": rng.normal(size=(h,)),
                    f"{p}.{attn}.output.LayerNorm.weight": np.ones(h),
                    f"{p}.{attn}.output.LayerNorm.bias": np.zeros(h),
                })
            sd.update({
                f"{p}.intermediate.dense.weight": rng.normal(
                    size=(bcfg.intermediate_size, h)),
                f"{p}.intermediate.dense.bias": rng.normal(
                    size=(bcfg.intermediate_size,)),
                f"{p}.output.dense.weight": rng.normal(
                    size=(h, bcfg.intermediate_size)),
                f"{p}.output.dense.bias": rng.normal(size=(h,)),
                f"{p}.output.LayerNorm.weight": np.ones(h),
                f"{p}.output.LayerNorm.bias": np.zeros(h),
            })
        dims = [(h, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
        for idx, (i_d, o_d) in zip(("0", "2", "4", "6", "7"), dims):
            sd[f"mlp.layers.{idx}.weight"] = rng.normal(size=(o_d, i_d))
            sd[f"mlp.layers.{idx}.bias"] = rng.normal(size=(o_d,))

        sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
        converted = convert_image_reward_weights(sd)
        got = {jax.tree_util.keystr(p)
               for p, _ in jax.tree_util.tree_leaves_with_path(converted)}
        want = {jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
        assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])
        shapes_got = jax.tree.map(lambda x: x.shape, converted)
        shapes_want = jax.tree.map(lambda x: x.shape, variables)
        assert shapes_got == shapes_want
        imgs = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 28, 28, 3)), jnp.float32)
        ids = jnp.zeros((1, 10), jnp.int32)
        out = model.apply(converted, imgs, ids)
        assert out.shape == (1,) and np.isfinite(np.asarray(out)).all()


class TestBertWordPieceTokenizer:
    def test_greedy_wordpiece(self):
        from invertible_cd_tpu.utils.tokenizer import BertWordPieceTokenizer

        vocab = {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##believ", "##able",
             "cat", ",", "a"]
        )}
        tok = BertWordPieceTokenizer(vocab, max_len=10)
        ids = tok(["a unbelievable cat, zzz"])
        v = vocab
        expect = [v["[CLS]"], v["a"], v["un"], v["##believ"], v["##able"],
                  v["cat"], v[","], 1, v["[SEP]"], v["[PAD]"]]
        assert ids.tolist()[0] == expect

    def test_accent_stripping_and_cjk(self):
        """BERT-uncased basic tokenization: NFD accent stripping and
        single-char CJK tokens (the HF tokenizer the reference's
        image_reward package uses does both)."""
        from invertible_cd_tpu.utils.tokenizer import BertWordPieceTokenizer

        vocab = {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "cafe", "au", "lait",
             "猫", "犬", "$", "5"]
        )}
        tok = BertWordPieceTokenizer(vocab, max_len=12)
        v = vocab
        # café → cafe (composed and decomposed accents both strip)
        ids = tok(["café au lait", "café"])
        assert ids.tolist()[0][:5] == [
            v["[CLS]"], v["cafe"], v["au"], v["lait"], v["[SEP]"]
        ]
        assert ids.tolist()[1][:3] == [v["[CLS]"], v["cafe"], v["[SEP]"]]
        # adjacent CJK chars split into single-char tokens
        ids = tok(["猫犬"])
        assert ids.tolist()[0][:4] == [
            v["[CLS]"], v["猫"], v["犬"], v["[SEP]"]
        ]
        # '$' is BERT range-punctuation -> its own token even glued to digits
        ids = tok(["$5"])
        assert ids.tolist()[0][:4] == [v["[CLS]"], v["$"], v["5"], v["[SEP]"]]
