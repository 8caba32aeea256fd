"""Data-parallel inference over the virtual mesh: sharded batch in, same
pixels out (the reference's multi-GPU batch striding, `generate.py:29-39`,
done the XLA way — computation follows sharded inputs)."""
import jax
import jax.numpy as jnp
import numpy as np

from invertible_cd_tpu.parallel import batch_sharding, make_mesh
from invertible_cd_tpu.testing import tiny_bundle


class TestShardedGenerate:
    def test_dp_sharded_matches_single_device(self, tiny_pipe):
        pipe = tiny_pipe
        prompts = [f"prompt number {i}" for i in range(8)]
        key = jax.random.PRNGKey(3)

        imgs_ref, _ = pipe.generate(prompts, key=key)

        mesh = make_mesh(dp=8, fsdp=1)
        latent = pipe.init_latent(key, len(prompts))
        ctx_u, ctx_c, added = pipe._encode_all(prompts)
        sh = batch_sharding(mesh)
        latent = jax.device_put(latent, sh)
        ctx_u = jax.device_put(ctx_u, sh)
        ctx_c = jax.device_put(ctx_c, sh)
        from invertible_cd_tpu.edit.controllers import empty_arrays

        arrays = empty_arrays(pipe.grid.num_reverse_steps, len(prompts))
        fn = pipe._get_jit("cons_generate", pipe.default_guidance(), None, False)
        imgs_sharded, _, _ = fn(
            pipe.params["reverse"], pipe.params["vae"], latent, ctx_u, ctx_c,
            ctx_c, arrays, added,
        )
        # sharded result spans 8 devices; same math, same pixels
        np.testing.assert_allclose(
            np.asarray(imgs_sharded), np.asarray(imgs_ref), atol=2e-5, rtol=1e-4
        )
        assert len(imgs_sharded.sharding.device_set) == 8
