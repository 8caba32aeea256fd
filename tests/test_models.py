"""Shape/semantics tests for the Flax model family (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invertible_cd_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
    count_attention_layers,
    find_lora_targets,
    init_lora,
    merge_lora,
)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, cfg.cross_attention_dim))
    w = jnp.zeros((1, cfg.time_cond_proj_dim))
    params = model.init(rng, sample, jnp.array([10]), ctx, w)
    return cfg, model, params


class TestUNet:
    def test_forward_shape(self, tiny_unet):
        cfg, model, params = tiny_unet
        x = jnp.ones((2, 16, 16, 4))
        ctx = jnp.ones((2, 8, cfg.cross_attention_dim))
        w = jnp.ones((2, cfg.time_cond_proj_dim))
        out = model.apply(params, x, jnp.array([999, 19]), ctx, w)
        assert out.shape == (2, 16, 16, 4)
        assert out.dtype == jnp.float32

    def test_w_embedding_changes_output(self, tiny_unet):
        cfg, model, params = tiny_unet
        x = jnp.ones((1, 16, 16, 4))
        ctx = jnp.ones((1, 8, cfg.cross_attention_dim))
        out0 = model.apply(params, x, jnp.array([10]), ctx, jnp.zeros((1, cfg.time_cond_proj_dim)))
        out1 = model.apply(params, x, jnp.array([10]), ctx, jnp.ones((1, cfg.time_cond_proj_dim)))
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_attention_hook_called_on_every_layer(self, tiny_unet):
        cfg, model, params = tiny_unet
        calls = []

        def hook(probs, meta):
            calls.append((meta.place, meta.kind, probs.shape))
            return probs

        x = jnp.ones((1, 16, 16, 4))
        ctx = jnp.ones((1, 8, cfg.cross_attention_dim))
        w = jnp.zeros((1, cfg.time_cond_proj_dim))
        out_hooked = model.apply(params, x, jnp.array([10]), ctx, w, attn_hook=hook)
        assert len(calls) == count_attention_layers(cfg)
        # tiny cfg: level0 cross-attn, 1 layer/block -> down 2, mid 2, up 4
        places = [c[0] for c in calls]
        assert places == ["down"] * 2 + ["mid"] * 2 + ["up"] * 4
        kinds = [c[1] for c in calls]
        assert kinds == ["self", "cross"] * 4
        # Hooked (explicit) and fused attention must agree numerically.
        out_fused = model.apply(params, x, jnp.array([10]), ctx, w)
        np.testing.assert_allclose(
            np.asarray(out_hooked), np.asarray(out_fused), atol=1e-4
        )

    def test_hook_can_modify_attention(self, tiny_unet):
        cfg, model, params = tiny_unet

        def hook(probs, meta):
            if meta.is_cross:
                # Force all attention onto token 0.
                z = jnp.zeros_like(probs)
                return z.at[..., 0].set(1.0)
            return probs

        x = jnp.ones((1, 16, 16, 4))
        ctx = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, cfg.cross_attention_dim)), jnp.float32)
        w = jnp.zeros((1, cfg.time_cond_proj_dim))
        out_hooked = model.apply(params, x, jnp.array([10]), ctx, w, attn_hook=hook)
        out_plain = model.apply(params, x, jnp.array([10]), ctx, w)
        assert not np.allclose(np.asarray(out_hooked), np.asarray(out_plain), atol=1e-5)

    def test_sdxl_config_forward(self):
        cfg = UNetConfig(
            block_out_channels=(16, 32),
            cross_attn_blocks=(False, True),
            layers_per_block=1,
            num_heads=(2, 2),
            transformer_depth=(1, 2),
            cross_attention_dim=32,
            use_linear_projection=True,
            time_cond_proj_dim=8,
            addition_embed_dim=64,
            addition_time_embed_dim=8,
        )
        model = UNet2DCondition(cfg)
        x = jnp.zeros((1, 16, 16, 4))
        ctx = jnp.zeros((1, 8, 32))
        w = jnp.zeros((1, 8))
        added = {
            "text_embeds": jnp.zeros((1, 16)),
            "time_ids": jnp.zeros((1, 6)),
        }
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([10]), ctx, w, added)
        out = model.apply(params, x, jnp.array([10]), ctx, w, added)
        assert out.shape == (1, 16, 16, 4)


class TestVAE:
    def test_roundtrip_shapes(self):
        cfg = VAEConfig.tiny()
        model = AutoencoderKL(cfg)
        px = jnp.zeros((1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), px)
        mean = model.apply(params, px, method=model.encode_mean)
        assert mean.shape == (1, 16, 16, 4)  # one downsample in tiny cfg
        dec = model.apply(params, mean, method=model.decode)
        assert dec.shape == (1, 32, 32, 3)


class TestCLIP:
    def test_text_encoder_outputs(self):
        cfg = CLIPTextConfig.tiny()
        model = CLIPTextModel(cfg)
        ids = jnp.zeros((2, 77), jnp.int32)
        ids = ids.at[:, 0].set(1).at[:, 5].set(cfg.eos_token_id)
        params = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(params, ids)
        assert out["last_hidden_state"].shape == (2, 77, cfg.hidden_size)
        assert out["penultimate_hidden_state"].shape == (2, 77, cfg.hidden_size)
        assert out["pooled_output"].shape == (2, cfg.hidden_size)

    def test_causality(self):
        """Changing a later token must not affect earlier positions."""
        cfg = CLIPTextConfig.tiny()
        model = CLIPTextModel(cfg)
        ids = jnp.ones((1, 10), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        out1 = model.apply(params, ids)["last_hidden_state"]
        ids2 = ids.at[0, 9].set(5)
        out2 = model.apply(params, ids2)["last_hidden_state"]
        np.testing.assert_allclose(
            np.asarray(out1[:, :9]), np.asarray(out2[:, :9]), atol=1e-5
        )
        assert not np.allclose(np.asarray(out1[:, 9]), np.asarray(out2[:, 9]))

    def test_projection(self):
        cfg = CLIPTextConfig.tiny()
        cfg = CLIPTextConfig(**{**cfg.__dict__, "projection_dim": 16})
        model = CLIPTextModel(cfg)
        ids = jnp.ones((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(params, ids)
        assert out["projected_pooled"].shape == (1, 16)


class TestLoRA:
    def test_targets_and_identity_merge(self, tiny_unet):
        cfg, model, params = tiny_unet
        targets = find_lora_targets(params)
        names = {"/".join(t) for t in targets}
        assert any("to_q" in n for n in names)
        assert any("conv1" in n for n in names)
        assert any("time_emb_proj" in n for n in names)
        assert any("ff/net_0/proj" in n for n in names)
        # GroupNorm/LayerNorm scales must never be targeted.
        assert not any("norm" in n.split("/")[-2] for n in names if len(n.split("/")) > 1)

        lora = init_lora(jax.random.PRNGKey(1), params, rank=4, targets=targets)
        merged = merge_lora(params, lora, alpha=8.0, rank=4)
        # up == 0 at init -> merge is identity.
        x = jnp.ones((1, 16, 16, 4))
        ctx = jnp.ones((1, 8, cfg.cross_attention_dim))
        w = jnp.zeros((1, cfg.time_cond_proj_dim))
        out0 = model.apply(params, x, jnp.array([10]), ctx, w)
        out1 = model.apply(merged, x, jnp.array([10]), ctx, w)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)

    def test_nonzero_lora_changes_output(self, tiny_unet):
        cfg, model, params = tiny_unet
        lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
        lora = jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, lora)
        merged = merge_lora(params, lora, alpha=8.0, rank=4)
        x = jnp.ones((1, 16, 16, 4))
        ctx = jnp.ones((1, 8, cfg.cross_attention_dim))
        w = jnp.zeros((1, cfg.time_cond_proj_dim))
        out0 = model.apply(params, x, jnp.array([10]), ctx, w)
        out1 = model.apply(merged, x, jnp.array([10]), ctx, w)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_merge_math(self):
        """W' == W + (alpha/r) * down @ up for dense kernels."""
        params = {"params": {"to_q": {"kernel": jnp.eye(4)}}}
        down = jnp.full((4, 2), 0.5)
        up = jnp.full((2, 4), 1.0)
        lora = {"params/to_q/kernel": {"down": down, "up": up}}
        merged = merge_lora(params, lora, alpha=8.0, rank=2)
        expected = np.eye(4) + 4.0 * np.asarray(down @ up)
        np.testing.assert_allclose(
            np.asarray(merged["params"]["to_q"]["kernel"]), expected, rtol=1e-6
        )
