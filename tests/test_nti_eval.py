"""Null-text inversion + training-eval loop tests (tiny bundle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invertible_cd_tpu.pipelines import GuidanceConfig
from invertible_cd_tpu.pipelines.nti import (
    negative_prompt_inversion,
    null_text_inversion,
)
from invertible_cd_tpu.testing import tiny_bundle
from invertible_cd_tpu.training.eval import (
    eval_inversion,
    grid_from_train_solver,
    sample_for_fid,
)


@pytest.fixture(scope="module")
def pipe(tiny_pipe):
    return tiny_pipe


@pytest.fixture(scope="module")
def pipe10():
    """Tiny bundle on a 10-step DDIM grid — NTI unrolls the full grid, so
    the default 50 steps makes the test pathologically slow on CPU."""
    import dataclasses

    from invertible_cd_tpu.diffusion.solver import make_solver_grid

    p = tiny_bundle()
    return dataclasses.replace(p, grid=make_solver_grid(n_steps=10))


class TestNTI:
    def test_null_text_inversion_improves_reconstruction(self, pipe10):
        pipe = pipe10
        img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        per_step, inv_latent = null_text_inversion(
            pipe, img, "a cat", num_inner_steps=3, guidance_scale=7.5
        )
        n = pipe.grid.n_steps
        assert per_step.shape[0] == n
        assert np.isfinite(np.asarray(per_step)).all()

        g = GuidanceConfig(guidance_scale=7.5, w_embed_dim=0)
        latent0 = jnp.broadcast_to(inv_latent, inv_latent.shape)
        # reconstruct with and without the optimised uncond embeddings
        _, lat_plain = pipe.ddim_generate(["a cat"], latent=latent0, guidance=g)
        _, lat_nti = pipe.ddim_generate(
            ["a cat"], latent=latent0, guidance=g, nti_uncond=per_step
        )
        _, clean = pipe.ddim_invert(img, "a cat")
        target = pipe._encode_image(pipe.params["vae"],
                                    jnp.asarray(img[None], jnp.float32) / 127.5 - 1)
        err_plain = float(jnp.mean((lat_plain - target) ** 2))
        err_nti = float(jnp.mean((lat_nti - target) ** 2))
        assert err_nti <= err_plain * 1.05  # NTI must not be worse

    def test_npi_shape(self, pipe):
        u = negative_prompt_inversion(pipe, "a cat")
        assert u.shape[0] == pipe.grid.n_steps
        assert u.shape[2] == 77


class TestTrainingEval:
    def test_grid_from_train_solver(self):
        from invertible_cd_tpu.diffusion.schedule import make_schedule
        from invertible_cd_tpu.diffusion.solver import make_train_solver

        schedule = make_schedule()
        solver = make_train_solver(
            np.asarray(schedule.alphas_cumprod),
            num_endpoints=4, num_forward_endpoints=4,
            endpoints="0,259,519,779", forward_endpoints="259,519,779,999",
        )
        grid = grid_from_train_solver(solver)
        np.testing.assert_array_equal(grid.reverse_timesteps, [999, 779, 519, 259])
        np.testing.assert_array_equal(grid.reverse_boundaries, [779, 519, 259, 0])
        np.testing.assert_array_equal(grid.forward_timesteps, [19, 259, 519, 779])
        np.testing.assert_array_equal(grid.forward_boundaries, [259, 519, 779, 999])

    def test_sample_for_fid(self, pipe):
        def gen(batch, key):
            imgs, _ = pipe.generate(list(batch), key=key)
            return imgs

        images = sample_for_fid(gen, [f"p{i}" for i in range(5)], batch_size=2)
        assert len(images) == 5
        assert images[0].dtype == np.uint8

    def test_eval_inversion_roundtrip(self, pipe):
        g0 = GuidanceConfig(guidance_scale=0.0, w_embed_dim=0)

        def invert(lat, key):
            import invertible_cd_tpu.pipelines.sampler as S

            ctx_u, ctx_c = pipe.encode_prompt(["x"] * lat.shape[0])
            noise = jax.random.normal(key, lat.shape)
            return S.cons_inversion(
                pipe._noise_model(pipe.params["forward"]), lat, noise,
                ctx_u, ctx_c, pipe.grid, pipe.schedule, g0,
            )

        def reconstruct(lat, key):
            import invertible_cd_tpu.pipelines.sampler as S

            ctx_u, ctx_c = pipe.encode_prompt(["x"] * lat.shape[0])
            return S.cons_generation(
                pipe._noise_model(pipe.params["reverse"]), lat, ctx_u, ctx_c,
                pipe.grid, pipe.schedule, pipe.default_guidance(),
            )

        lat = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
        out = eval_inversion(invert, reconstruct, lat, batch_size=2)
        assert np.isfinite(out["inversion_latent_mse"])

    def test_eval_inversion_recon_fid(self, pipe):
        """Recon-FID of the round trip (reference `fid_score_cm`,
        forward_eval.py:296-341): decoded reconstructions scored against
        reference images."""
        from invertible_cd_tpu.metrics import FIDScorer

        def invert(lat, key):
            return lat + 0.01 * jax.random.normal(key, lat.shape)

        def reconstruct(lat, key):
            return lat

        def decode(lat):
            return pipe._decode_latents(pipe.params["vae"], lat)

        scorer = FIDScorer.random_init()
        lat = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 4))
        ref_imgs = list(
            np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3), np.uint8)
        )
        out = eval_inversion(
            invert, reconstruct, lat, batch_size=2,
            decode_fn=decode, scorer=scorer, reference_images=ref_imgs,
        )
        assert np.isfinite(out["inversion_latent_mse"])
        assert "inversion_fid" in out and np.isfinite(out["inversion_fid"])


class TestFidOfStudent:
    def test_fid_eval_pipeline(self, pipe, tmp_path):
        """End-to-end in-training FID: merge tiny LoRA, sweep prompts,
        score against self-stats (random-init Inception)."""
        from invertible_cd_tpu.metrics import FIDScorer
        from invertible_cd_tpu.models.lora import init_lora
        from invertible_cd_tpu.training.eval import fid_of_student, sample_for_fid

        scorer = FIDScorer.random_init()
        lora = init_lora(
            jax.random.PRNGKey(0), pipe.params["teacher"]["params"], rank=2
        )
        prompts = [f"prompt {i}" for i in range(4)]

        def gen(batch, key):
            imgs, _ = pipe.generate(list(batch), key=key)
            return imgs

        ref_images = sample_for_fid(gen, prompts, batch_size=2)
        fid = fid_of_student(
            pipe, lora, scorer, prompts, batch_size=2,
            reference_images=ref_images,
        )
        # identity LoRA (up=0) -> identical images -> FID ~ 0
        assert abs(fid) < 1e-2, fid
