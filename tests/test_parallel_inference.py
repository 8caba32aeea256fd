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


class TestTensorParallel:
    def test_tp_sharded_matches_replicated(self, tiny_pipe):
        """tp=2 shards attention q/k/v kernels on out-features (heads) and
        the out projection on in-features; XLA inserts the psum. Pixels
        must match the unsharded run."""
        from invertible_cd_tpu.parallel import replicated, shard_params
        from invertible_cd_tpu.parallel.mesh import param_sharding
        from jax.sharding import PartitionSpec as P

        pipe = tiny_pipe
        prompts = ["a cat", "a dog"]
        key = jax.random.PRNGKey(5)
        imgs_ref, _ = pipe.generate(prompts, key=key)

        mesh = make_mesh(dp=1, fsdp=1, tp=2, devices=jax.devices()[:2])
        specs = param_sharding(pipe.params["reverse"], mesh)
        # the tp rules must actually fire on the attention AND FF kernels
        flat = jax.tree_util.tree_leaves_with_path(specs)

        def specs_for(*owners):
            return [
                s.spec for p, s in flat
                if any(getattr(k, "key", "") in owners for k in p)
            ]

        assert any(
            s in (P(None, "tp"), P("tp", None))
            for s in specs_for("to_q", "to_out_0")
        )
        # FF pair (VERDICT r2 item 8): GEGLU up-proj column-, net_2 row-sharded
        assert P(None, "tp") in specs_for("proj")
        assert P("tp", None) in specs_for("net_2")

        sharded = jax.tree.map(
            jax.device_put, pipe.params["reverse"], specs
        )
        vae_rep = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), pipe.params["vae"]
        )
        old_rev, old_vae = pipe.params["reverse"], pipe.params["vae"]
        pipe.params["reverse"], pipe.params["vae"] = sharded, vae_rep
        pipe._jit_cache.clear()
        try:
            with mesh:
                imgs_tp, _ = pipe.generate(prompts, key=key)
        finally:
            pipe.params["reverse"], pipe.params["vae"] = old_rev, old_vae
            pipe._jit_cache.clear()
        np.testing.assert_allclose(
            np.asarray(imgs_tp), np.asarray(imgs_ref), atol=2e-5, rtol=1e-4
        )


class TestQuantizedParallel:
    """int8 inference (ops/quant.py) under the mesh. The dynamic
    activation scales are amax reductions over (possibly sharded)
    tensors and the int32 accumulators of row-sharded kernels need a
    psum before dequant — both must come out bit-compatible with the
    single-device int8 program, or the quantized path would silently
    change numerics the moment a mesh is present (the round-2 tp-x-
    pallas lesson, ADVICE.md item 2, applied to quant).

    Two-level contract: each model APPLY must be bitwise identical
    sharded vs unsharded (that is what proves the partitioning is
    sound), while the multi-step CASCADE only gets a loose bound —
    GSPMD fuses the whole-pipeline program differently per layout, a
    1-ulp difference at a round() boundary flips an int8 bucket, and
    four chained hops amplify the flip (measured mean ~4e-3 on random
    tiny weights, the adversarial case for chaos amplification)."""

    def test_dp_sharded_int8_applies_bitwise_identical(self, tiny_pipe):
        from invertible_cd_tpu.models import AutoencoderKL
        from invertible_cd_tpu.ops.quant import quant_scope

        pipe = tiny_pipe
        mesh = make_mesh(dp=8, fsdp=1)
        b = 8
        cad = pipe.unet.cfg.cross_attention_dim
        rng = np.random.default_rng(0)
        latent = jnp.asarray(rng.normal(size=(b, 16, 16, 4)).astype(np.float32))
        ctx = jnp.asarray(rng.normal(size=(b, 77, cad)).astype(np.float32))
        w = jnp.zeros((b, pipe.unet.cfg.time_cond_proj_dim), jnp.float32)

        def unet(params, lat, c, wv):
            with quant_scope("int8"):
                return pipe.unet.apply(
                    params, lat, jnp.full((b,), 519, jnp.int32), c, w_cond=wv
                )

        def decode(params, z):
            with quant_scope("int8"):
                return pipe.vae.apply(params, z, method=AutoencoderKL.decode)

        sh = batch_sharding(mesh)
        f = jax.jit(unet)
        y_ref = f(pipe.params["reverse"], latent, ctx, w)
        y_dp = f(
            pipe.params["reverse"], jax.device_put(latent, sh),
            jax.device_put(ctx, sh), jax.device_put(w, sh),
        )
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_dp))

        g = jax.jit(decode)
        v_ref = g(pipe.params["vae"], latent)
        v_dp = g(pipe.params["vae"], jax.device_put(latent, sh))
        np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_dp))

    def test_dp_sharded_int8_cascade_within_flip_noise(self, tiny_pipe):
        pipe = tiny_pipe
        prompts = [f"prompt number {i}" for i in range(8)]
        key = jax.random.PRNGKey(7)
        pipe.quantize = "int8"
        try:
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
            fn = pipe._get_jit(
                "cons_generate", pipe.default_guidance(), None, False
            )
            imgs_sharded, _, _ = fn(
                pipe.params["reverse"], pipe.params["vae"], latent, ctx_u,
                ctx_c, ctx_c, arrays, added,
            )
        finally:
            pipe.quantize = "off"
        diff = np.abs(np.asarray(imgs_sharded) - np.asarray(imgs_ref))
        assert diff.mean() < 2e-2, f"mean {diff.mean()} exceeds flip noise"
        assert diff.max() < 2e-1, f"max {diff.max()} exceeds flip noise"

    def test_tp_sharded_int8_matches_replicated(self, tiny_pipe):
        from invertible_cd_tpu.parallel import replicated
        from invertible_cd_tpu.parallel.mesh import param_sharding

        pipe = tiny_pipe
        prompts = ["a cat", "a dog"]
        key = jax.random.PRNGKey(9)
        pipe.quantize = "int8"
        try:
            imgs_ref, _ = pipe.generate(prompts, key=key)

            mesh = make_mesh(dp=1, fsdp=1, tp=2, devices=jax.devices()[:2])
            specs = param_sharding(pipe.params["reverse"], mesh)
            sharded = jax.tree.map(
                jax.device_put, pipe.params["reverse"], specs
            )
            vae_rep = jax.tree.map(
                lambda x: jax.device_put(x, replicated(mesh)),
                pipe.params["vae"],
            )
            old_rev, old_vae = pipe.params["reverse"], pipe.params["vae"]
            pipe.params["reverse"], pipe.params["vae"] = sharded, vae_rep
            pipe._jit_cache.clear()
            try:
                with mesh:
                    imgs_tp, _ = pipe.generate(prompts, key=key)
            finally:
                pipe.params["reverse"], pipe.params["vae"] = old_rev, old_vae
                pipe._jit_cache.clear()
        finally:
            pipe.quantize = "off"
        # flip-noise bound, not bitwise (see class docstring); a missing
        # psum on the row-sharded int32 accumulators would be O(1) wrong
        diff = np.abs(np.asarray(imgs_tp) - np.asarray(imgs_ref))
        assert diff.mean() < 2e-2, f"mean {diff.mean()} exceeds flip noise"
        assert diff.max() < 2e-1, f"max {diff.max()} exceeds flip noise"


class TestSpatialParallel:
    """sp shards the latent HEIGHT axis (`latent_sharding`), so GSPMD
    spatially partitions the whole UNet: convolutions exchange halos via
    collective-permute, per-token ops run shard-local, and self-attention
    resolves its seq x seq contraction with ICI all-gathers. This is the
    batch-1 latency axis dp cannot provide (one SDXL 1024^2 image
    cooperatively across chips); the reference has no analog (SURVEY.md
    §2 "TP/PP/SP/EP: ABSENT")."""

    def test_unet_sp_partitioned_matches_replicated(self, tiny_pipe):
        """The UNet-only program must (a) KEEP the sp sharding on its
        output — proof the interior stayed partitioned rather than
        all-gathering at entry — (b) contain conv-halo collective
        permutes, and (c) match the replicated run to reassociation
        noise (GroupNorm's spatial mean becomes partial sums + an
        all-reduce under sp, a different summation order — ~1 ulp,
        measured max 2e-6 on the tiny UNet)."""
        import jax.numpy as jnp
        from invertible_cd_tpu.parallel import latent_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        pipe = tiny_pipe
        mesh = make_mesh(dp=1, fsdp=1, sp=4, tp=1, devices=jax.devices()[:4])
        b = 2
        cad = pipe.unet.cfg.cross_attention_dim
        rng = np.random.default_rng(11)
        lat_host = jnp.asarray(rng.normal(size=(b, 16, 16, 4)).astype(np.float32))
        ctx_host = jnp.asarray(rng.normal(size=(b, 77, cad)).astype(np.float32))
        w_host = jnp.zeros((b, pipe.unet.cfg.time_cond_proj_dim), jnp.float32)
        rep = NamedSharding(mesh, P())
        lat = jax.device_put(lat_host, latent_sharding(mesh))
        ctx = jax.device_put(ctx_host, rep)
        w = jax.device_put(w_host, rep)

        def unet(params, l, c, wv):
            return pipe.unet.apply(
                params, l, jnp.full((b,), 519, jnp.int32), c, w_cond=wv
            )

        compiled = jax.jit(unet).lower(
            pipe.params["reverse"], lat, ctx, w
        ).compile()
        y_sp = compiled(pipe.params["reverse"], lat, ctx, w)
        assert y_sp.sharding.spec == P(None, "sp"), y_sp.sharding
        assert "collective-permute" in compiled.as_text()

        y_rep = jax.jit(unet)(pipe.params["reverse"], lat_host, ctx_host, w_host)
        np.testing.assert_allclose(
            np.asarray(y_sp), np.asarray(y_rep), atol=1e-5, rtol=1e-4
        )

    def test_unet_dp2_x_sp4_keeps_height_sharded(self, tiny_pipe):
        """The DRIVER's dryrun mesh shape (dp2 x sp4 over 8 devices;
        round 4 regression — the sp output contract had only ever been
        tested at dp=1, and at dp>1 the batch axis legitimately comes
        out dp-sharded, i.e. P('dp','sp') not P(None,'sp'). Pin: height
        stays sp-sharded, halos are collective-permuted, numerics match
        the replicated run."""
        import jax.numpy as jnp
        from invertible_cd_tpu.parallel import latent_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        pipe = tiny_pipe
        mesh = make_mesh(dp=2, fsdp=1, sp=4, tp=1, devices=jax.devices()[:8])
        b = 2
        cad = pipe.unet.cfg.cross_attention_dim
        rng = np.random.default_rng(17)
        lat_host = jnp.asarray(rng.normal(size=(b, 16, 16, 4)).astype(np.float32))
        ctx_host = jnp.asarray(rng.normal(size=(b, 77, cad)).astype(np.float32))
        w_host = jnp.zeros((b, pipe.unet.cfg.time_cond_proj_dim), jnp.float32)
        rep = NamedSharding(mesh, P())
        lat = jax.device_put(lat_host, latent_sharding(mesh))
        ctx = jax.device_put(ctx_host, rep)
        w = jax.device_put(w_host, rep)

        def unet(params, l, c, wv):
            return pipe.unet.apply(
                params, l, jnp.full((b,), 519, jnp.int32), c, w_cond=wv
            )

        compiled = jax.jit(unet).lower(
            pipe.params["reverse"], lat, ctx, w
        ).compile()
        y_sp = compiled(pipe.params["reverse"], lat, ctx, w)
        spec = tuple(y_sp.sharding.spec)
        assert len(spec) >= 2 and spec[1] == "sp", y_sp.sharding
        assert "collective-permute" in compiled.as_text()

        y_rep = jax.jit(unet)(pipe.params["reverse"], lat_host, ctx_host, w_host)
        np.testing.assert_allclose(
            np.asarray(y_sp), np.asarray(y_rep), atol=1e-5, rtol=1e-4
        )

    def test_dp_x_sp_generate_matches_single_device(self, tiny_pipe):
        """Full 4-hop generate on a dp2 x sp2 mesh: same pixels as the
        single-device run (the dp test's contract, extended to the
        spatial axis)."""
        from invertible_cd_tpu.edit.controllers import empty_arrays
        from invertible_cd_tpu.parallel import latent_sharding

        pipe = tiny_pipe
        prompts = ["a cat", "a dog"]
        key = jax.random.PRNGKey(13)
        imgs_ref, _ = pipe.generate(prompts, key=key)

        mesh = make_mesh(dp=2, fsdp=1, sp=2, tp=1, devices=jax.devices()[:4])
        latent = jax.device_put(
            pipe.init_latent(key, len(prompts)), latent_sharding(mesh)
        )
        ctx_u, ctx_c, added = pipe._encode_all(prompts)
        bs = batch_sharding(mesh)
        ctx_u = jax.device_put(ctx_u, bs)
        ctx_c = jax.device_put(ctx_c, bs)
        arrays = empty_arrays(pipe.grid.num_reverse_steps, len(prompts))
        fn = pipe._get_jit("cons_generate", pipe.default_guidance(), None, False)
        imgs_sp, _, _ = fn(
            pipe.params["reverse"], pipe.params["vae"], latent, ctx_u, ctx_c,
            ctx_c, arrays, added,
        )
        np.testing.assert_allclose(
            np.asarray(imgs_sp), np.asarray(imgs_ref), atol=3e-5, rtol=1e-4
        )
        assert len(imgs_sp.sharding.device_set) == 4
