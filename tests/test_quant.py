"""Int8 inference quantization (ops/quant.py + models.layers.QDense/QConv).

The reference is torch fp16 end to end — int8 is a capability of the TPU
port (v5e's MXU runs int8 at 2x the bf16 peak), so there is no reference
oracle here. These tests pin the mechanics:

  * symmetric quantization round-trips within the 1/127 step bound,
  * OUTSIDE a quant scope the Q-layers produce bit-identical results to
    stock nn.Dense / nn.Conv (the off path IS lax.dot_general /
    lax.conv_general_dilated),
  * inside the scope, int8 outputs track the float reference within the
    expected error envelope,
  * the pipeline runs end-to-end with quantize="int8"/"int8_vae" and its
    jit cache keeps bf16 and int8 programs separate,
  * the scope is exception-safe and rejects unknown modes.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invertible_cd_tpu.models.layers import QConv, QDense
from invertible_cd_tpu.ops.quant import (
    current_quant_mode,
    quant_conv_general_dilated,
    quant_dot_general,
    quant_scope,
    quantize_int8,
)


def _rng(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


class TestQuantizeInt8:
    def test_round_trip_error_bound(self):
        x = _rng(64, 32)
        q, s = quantize_int8(x)
        assert q.dtype == jnp.int8
        # symmetric quant error is at most half a step (s = amax/127)
        err = jnp.max(jnp.abs(q.astype(jnp.float32) * s - x))
        assert float(err) <= float(s) * 0.5 + 1e-7

    def test_per_channel_scales(self):
        w = _rng(3, 3, 8, 16)
        q, s = quantize_int8(w, axes=(0, 1, 2))
        assert s.shape == (16,)
        # each output channel's max hits exactly +-127
        assert int(jnp.max(jnp.abs(q.reshape(-1, 16)), axis=0).min()) == 127

    def test_zero_tensor_safe(self):
        # all-zero tensors (zero-init benchmark params) must not produce
        # a zero scale (-> inf/nan on dequant)
        q, s = quantize_int8(jnp.zeros((4, 4)))
        assert np.isfinite(float(s)) and float(s) > 0
        assert int(jnp.abs(q).max()) == 0


class TestDropInOps:
    def test_dot_off_is_lax(self):
        x, w = _rng(5, 16), _rng(16, 8, seed=1)
        dims = (((1,), (0,)), ((), ()))
        got = quant_dot_general(x, w, dims)
        want = jax.lax.dot_general(x, w, dims)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_conv_off_is_lax(self):
        x, k = _rng(2, 8, 8, 4), _rng(3, 3, 4, 6, seed=1)
        args = dict(
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = quant_conv_general_dilated(x, k, **args)
        want = jax.lax.conv_general_dilated(x, k, **args)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_dot_int8_error_envelope(self):
        x, w = _rng(32, 128), _rng(128, 64, seed=1)
        dims = (((1,), (0,)), ((), ()))
        with quant_scope("int8"):
            got = quant_dot_general(x, w, dims)
        want = x @ w
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert rel < 0.05

    def test_conv_int8_error_envelope(self):
        x, k = _rng(2, 16, 16, 8), _rng(3, 3, 8, 12, seed=1)
        args = dict(
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        with quant_scope("int8"):
            got = quant_conv_general_dilated(x, k, **args)
        want = jax.lax.conv_general_dilated(x, k, **args)
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert rel < 0.05

    def test_int8_under_jit(self):
        # the contextvar is read at TRACE time — a jit traced inside the
        # scope bakes the int8 program in.
        x, w = _rng(8, 64), _rng(64, 32, seed=1)
        dims = (((1,), (0,)), ((), ()))
        with quant_scope("int8"):
            got = jax.jit(lambda a, b: quant_dot_general(a, b, dims))(x, w)
        want = x @ w
        assert float(jnp.max(jnp.abs(got - want))) > 0  # actually quantized
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert rel < 0.05

    def test_grouped_conv_falls_through(self):
        # feature_group_count != 1 is outside the quantized envelope —
        # must produce the exact lax result even inside the scope.
        x, k = _rng(1, 8, 8, 4), _rng(3, 3, 2, 4, seed=1)
        args = dict(
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=2,
        )
        with quant_scope("int8"):
            got = quant_conv_general_dilated(x, k, **args)
        want = jax.lax.conv_general_dilated(x, k, **args)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestScope:
    def test_nesting_and_reset(self):
        assert current_quant_mode() == "off"
        with quant_scope("int8"):
            assert current_quant_mode() == "int8"
            with quant_scope("off"):
                assert current_quant_mode() == "off"
            assert current_quant_mode() == "int8"
        assert current_quant_mode() == "off"

    def test_exception_safe(self):
        with pytest.raises(RuntimeError):
            with quant_scope("int8"):
                raise RuntimeError("boom")
        assert current_quant_mode() == "off"

    def test_unknown_mode(self):
        with pytest.raises(ValueError, match="unknown quant mode"):
            with quant_scope("fp4"):
                pass


class TestQLayers:
    def test_qdense_matches_dense_off(self):
        x = _rng(4, 24)
        q = QDense(16)
        d = nn.Dense(16)
        pq = q.init(jax.random.PRNGKey(0), x)
        pd = d.init(jax.random.PRNGKey(0), x)
        # identical param trees (same class, same init stream)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            pq, pd,
        )
        np.testing.assert_array_equal(
            np.asarray(q.apply(pq, x)), np.asarray(d.apply(pd, x))
        )

    def test_qconv_matches_conv_off(self):
        x = _rng(2, 8, 8, 4)
        q = QConv(6, (3, 3), padding=((1, 1), (1, 1)))
        c = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)))
        pq = q.init(jax.random.PRNGKey(0), x)
        pc = c.init(jax.random.PRNGKey(0), x)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            pq, pc,
        )
        np.testing.assert_array_equal(
            np.asarray(q.apply(pq, x)), np.asarray(c.apply(pc, x))
        )

    def test_qdense_int8_close(self):
        x = _rng(4, 24)
        q = QDense(16)
        p = q.init(jax.random.PRNGKey(0), x)
        ref = q.apply(p, x)
        with quant_scope("int8"):
            got = q.apply(p, x)
        rel = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert 0 < rel < 0.1


class TestPipelineInt8:
    @pytest.fixture(scope="class")
    def bundle(self):
        from invertible_cd_tpu.testing import tiny_bundle

        return tiny_bundle()

    def test_generate_int8_runs_and_tracks_bf16(self, bundle):
        key = jax.random.PRNGKey(0)
        ref_imgs, _ = bundle.generate(["a cat"], key=key)
        n_off = len(bundle._jit_cache)
        bundle.quantize = "int8"
        try:
            imgs, _ = bundle.generate(["a cat"], key=key)
        finally:
            bundle.quantize = "off"
        assert np.all(np.isfinite(np.asarray(imgs)))
        # separate cache entries: the int8 program did not evict bf16
        assert len(bundle._jit_cache) > n_off
        # int8 must actually change the math...
        assert float(jnp.max(jnp.abs(imgs - ref_imgs))) > 0
        # ...but stay in the same image (tiny random-weight model: loose)
        assert float(jnp.mean(jnp.abs(imgs - ref_imgs))) < 0.2

    def test_int8_vae_only_touches_decode(self, bundle):
        key = jax.random.PRNGKey(1)
        ref_imgs, ref_lat = bundle.generate(["a dog"], key=key)
        bundle.quantize = "int8_vae"
        try:
            imgs, lat = bundle.generate(["a dog"], key=key)
        finally:
            bundle.quantize = "off"
        # UNet stays bf16: latents identical; only the decode quantizes
        np.testing.assert_array_equal(np.asarray(lat), np.asarray(ref_lat))
        assert float(jnp.max(jnp.abs(imgs - ref_imgs))) > 0

    def test_edit_int8_runs(self, bundle):
        from invertible_cd_tpu.edit import make_controller

        img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        ctrl = make_controller(
            ["a cat", "a dog"], bundle.tokenizer, num_steps=4
        )
        bundle.quantize = "int8"
        try:
            out, _ = bundle.edit(img, "a cat", "a dog", ctrl)
        finally:
            bundle.quantize = "off"
        assert out.shape[0] == 2 and np.all(np.isfinite(np.asarray(out)))

    def test_int8_static_calibration_flow(self, bundle):
        """collect_quant_stats -> int8_static: stats keyed by module
        path land in the params trees, the static program runs within a
        bounded envelope of bf16, and the off path stays bit-identical
        with the extra collection present."""
        key = jax.random.PRNGKey(3)
        ref, _ = bundle.generate(["a calico cat"], key=key)
        bundle.collect_quant_stats(["a calico cat"], key=key)
        try:
            for model in ("reverse", "forward", "vae"):
                stats = bundle.params[model].get("quant_stats")
                assert stats, f"no quant_stats for {model}"
                leaves = jax.tree.leaves(stats)
                assert all(np.asarray(v).shape == () for v in leaves)
                assert all(np.asarray(v) >= 0 for v in leaves)
            bundle.quantize = "int8_static"
            st, _ = bundle.generate(["a calico cat"], key=key)
            bundle.quantize = "off"
            assert np.isfinite(np.asarray(st)).all()
            diff = np.abs(np.asarray(st) - np.asarray(ref))
            assert 0 < diff.mean() < 0.1  # random weights: worst case
            # off path is untouched by the merged collection
            off, _ = bundle.generate(["a calico cat"], key=key)
            np.testing.assert_array_equal(np.asarray(off), np.asarray(ref))
        finally:
            bundle.quantize = "off"
            for model in ("teacher", "reverse", "forward", "vae"):
                bundle.params[model] = {
                    k: v for k, v in bundle.params[model].items()
                    if k != "quant_stats"
                }
            bundle._jit_cache.clear()

    def test_int8_static_without_stats_is_dynamic(self, bundle):
        """No calibration -> every conv falls back to dynamic scales:
        bitwise the int8 program."""
        key = jax.random.PRNGKey(4)
        bundle.quantize = "int8"
        try:
            dyn, _ = bundle.generate(["a dalmatian"], key=key)
            bundle.quantize = "int8_static"
            st, _ = bundle.generate(["a dalmatian"], key=key)
        finally:
            bundle.quantize = "off"
        np.testing.assert_array_equal(np.asarray(st), np.asarray(dyn))

    def test_rejects_unknown_mode(self):
        from invertible_cd_tpu.testing import tiny_bundle

        with pytest.raises(ValueError, match="quantize"):
            import dataclasses

            b = tiny_bundle()
            dataclasses.replace(b, quantize="fp4")
