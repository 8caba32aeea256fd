"""SDXL pipeline tests (tiny dual-encoder bundle, CPU)."""
import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipe(tiny_pipe_xl):
    return tiny_pipe_xl


class TestSDXL:
    def test_encode_prompt_xl_shapes(self, pipe):
        ctx, pooled = pipe.encode_prompt_xl(["a cat"])
        assert ctx.shape == (1, 77, 64)  # 32 + 32 concat
        assert pooled.shape == (1, 16)

    def test_generate(self, pipe):
        imgs, lat = pipe.generate(["a cat"], key=jax.random.PRNGKey(1))
        assert imgs.shape == (1, 32, 32, 3)
        assert lat.shape == (1, 16, 16, 4)
        assert np.isfinite(np.asarray(imgs)).all()

    def test_generate_int8(self, pipe):
        """quantize='int8' on the XL pipeline (dual encoders stay bf16;
        the fp32 VAE quantizes too — per-channel scales adapt to its
        range, unlike a blanket dtype cut)."""
        ref, _ = pipe.generate(["a cat"], key=jax.random.PRNGKey(1))
        pipe.quantize = "int8"
        try:
            imgs, _ = pipe.generate(["a cat"], key=jax.random.PRNGKey(1))
        finally:
            pipe.quantize = "off"
        assert np.isfinite(np.asarray(imgs)).all()
        diff = np.abs(np.asarray(imgs) - np.asarray(ref))
        assert 0 < diff.max() and diff.mean() < 0.2

    def test_added_cond_changes_output(self, pipe):
        """Pooled-text conditioning must reach the UNet."""
        imgs_a, _ = pipe.generate(["a cat"], key=jax.random.PRNGKey(2))
        # tamper with the pooled path: different prompt -> different pooled
        imgs_b, _ = pipe.generate(["a dog"], key=jax.random.PRNGKey(2))
        assert not np.array_equal(np.asarray(imgs_a), np.asarray(imgs_b))

    def test_invert(self, pipe):
        img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        inv, clean = pipe.invert(img, "a cat")
        assert inv.shape == (1, 16, 16, 4)
        assert np.isfinite(np.asarray(inv)).all()

    def test_time_ids(self, pipe):
        ids = pipe.add_time_ids(2)
        np.testing.assert_array_equal(
            np.asarray(ids), [[32, 32, 0, 0, 32, 32]] * 2
        )

    def test_capture_intermediates_stage_names(self, pipe):
        """Drift guard for tests/test_reference_parity_sdxl.py: the
        per-stage replay captures activations by module name
        (conv_in / down_blocks_i / mid_block / up_blocks_i); renaming a
        block would silently skip its parity comparison."""
        import jax.numpy as jnp

        cfg = pipe.unet.cfg
        n = len(cfg.block_out_channels)
        stages = (
            ["conv_in"]
            + [f"down_blocks_{i}" for i in range(n)]
            + ["mid_block"]
            + [f"up_blocks_{i}" for i in range(n)]
        )

        def flt(mdl, method_name):
            return mdl.name in stages and method_name == "__call__"

        h, w = pipe.latent_size
        latent = jnp.zeros((1, h, w, 4), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.float32)
        w_emb = jnp.zeros((1, cfg.time_cond_proj_dim), jnp.float32)
        pooled_dim = cfg.addition_embed_dim - 6 * cfg.addition_time_embed_dim
        added = {
            "text_embeds": jnp.zeros((1, pooled_dim), jnp.float32),
            "time_ids": pipe.add_time_ids(1),
        }
        _, state = pipe.unet.apply(
            pipe.params["reverse"], latent, t, ctx, w_cond=w_emb,
            added_cond=added, capture_intermediates=flt,
        )
        got = set(state["intermediates"])
        missing = [s for s in stages if s not in got]
        assert not missing, f"stage names drifted: {missing}"

    def test_uncond_context_is_zeros(self, pipe):
        """SDXL zeroes the uncond context (force_zeros_for_empty_prompt;
        reference train_icd_xl_lora.py:900-903)."""
        ctx_u, ctx_c, _ = pipe._encode_all(["a cat"])
        assert np.all(np.asarray(ctx_u) == 0)
        assert not np.all(np.asarray(ctx_c) == 0)


class TestAmplifyPrompt:
    """SDXL editing prompt swap (reference generation_sdxl.py:426-442)."""

    def test_swap_schedule(self):
        """With dynamic guidance and tau1, steps with t > tau1*1000 must see
        the amplify context; the rest the target context. Pin against the
        [999, 779, 519, 259] grid."""
        import jax.numpy as jnp

        from invertible_cd_tpu.diffusion.schedule import make_schedule
        from invertible_cd_tpu.diffusion.solver import make_solver_grid
        from invertible_cd_tpu.pipelines import sampler as S

        grid = make_solver_grid(
            reverse_timesteps=[259, 519, 779, 999],
            forward_timesteps=[19, 259, 519, 779],
        )
        schedule = make_schedule()
        g = S.GuidanceConfig(
            guidance_scale=8.0, w_embed_dim=8, dynamic_guidance=True,
            tau1=0.7, tau2=0.7,
        )
        ctx_target = jnp.full((1, 7, 4), 1.0)
        ctx_amp = jnp.full((1, 7, 4), 2.0)
        seen = []

        def noise_model(latent, t, context, w_emb, hook):
            seen.append((t, float(context[0, 0, 0])))
            return jnp.zeros_like(latent)

        S.cons_generation(
            noise_model, jnp.zeros((1, 4, 4, 4)), ctx_target, ctx_target,
            grid, schedule, g, context_amplify=ctx_amp,
        )
        # reverse grid is [999, 779, 519, 259]; t > 700 -> amplify
        assert [t for t, _ in seen] == [999, 779, 519, 259]
        assert [v for _, v in seen] == [2.0, 2.0, 1.0, 1.0]

    def test_pipeline_amplify_changes_output(self, pipe):
        g = pipe.default_guidance(
            guidance_scale=8.0, dynamic_guidance=True, tau1=0.7, tau2=0.7
        )
        key = jax.random.PRNGKey(3)
        base, _ = pipe.generate(["a dog"], key=key, guidance=g)
        amp, _ = pipe.generate(
            ["a dog"], key=key, guidance=g, amplify_prompt=["a cat"]
        )
        assert not np.array_equal(np.asarray(base), np.asarray(amp))

    def test_amplify_inactive_when_tau_covers_grid(self, pipe):
        """tau1 = 1.0 -> no step satisfies t > 1000; amplify must be a
        no-op (program output identical to the plain run)."""
        g = pipe.default_guidance(
            guidance_scale=8.0, dynamic_guidance=True, tau1=1.0, tau2=1.0
        )
        key = jax.random.PRNGKey(4)
        base, _ = pipe.generate(["a dog"], key=key, guidance=g)
        amp, _ = pipe.generate(
            ["a dog"], key=key, guidance=g, amplify_prompt=["a cat"]
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(amp))


class TestSDXLEdit:
    def test_edit_without_controller_uses_amplify_protocol(self, pipe):
        """InvertibleCDXL.edit with no controller = the reference SDXL
        protocol: invert + amplified dynamic-guidance sampling
        (running/sdxl/edit.py:201-234)."""
        img = np.random.default_rng(1).integers(0, 255, (32, 32, 3), np.uint8)
        imgs, lat = pipe.edit(img, "a red cat", "a blue cat")
        assert imgs.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(imgs)).all()
        # rows differ: row 0 reconstructs the source, row 1 is the edit
        assert not np.array_equal(np.asarray(imgs[0]), np.asarray(imgs[1]))
