"""Static hook routing: layers where the controller is an identity must
keep the FUSED attention path (no probability materialisation).

The reference edits cross-attention at every resolution but passes
self-attention >32^2 tokens through untouched
(`utils/p2p.py:178-183 replace_self_attention`); its AttentionStore also
only keeps <=32^2 maps (`p2p.py:147`). Our hook carries a trace-time
`applies(meta)` predicate encoding exactly that, and
models/attention.py routes applies()==False layers to fused attention —
at a 64^2 self layer the explicit path would otherwise write a
(B, H, 4096, 4096) fp32 probability tensor to HBM for nothing.
"""
import jax.numpy as jnp
import numpy as np

from invertible_cd_tpu.edit.controllers import (
    ControllerRuntime,
    ControllerSpec,
    edit_attention,
    make_controller,
)
from invertible_cd_tpu.models.attention import AttnMeta
from invertible_cd_tpu.utils.tokenizer import HashTokenizer

PROMPTS = ["a photo of a corgi", "a photo of a cat"]
NUM_STEPS = 4


def _meta(is_cross, sq, place="down", idx=0):
    return AttnMeta(
        place=place, is_cross=is_cross, layer_index=idx,
        query_len=sq, key_len=77 if is_cross else sq, heads=2,
    )


def _controller(**kw):
    spec, arrays = make_controller(
        PROMPTS, HashTokenizer(), NUM_STEPS,
        is_replace_controller=True,
        cross_replace_steps=0.8, self_replace_steps=0.4, **kw,
    )
    return spec, arrays


def test_applies_predicate_matches_reference_semantics():
    spec, arrays = _controller()
    rt = ControllerRuntime(spec, arrays)
    # self_replace_steps=0.4 over 4 steps -> self replaced on steps [0, 1)
    hook0 = rt.hook_factory(0)
    hook2 = rt.hook_factory(2)

    # cross-attention is edited at EVERY resolution (p2p.py:199-206)
    assert hook0.applies(_meta(True, 4096))
    assert hook2.applies(_meta(True, 256))
    # self <=32^2 only inside the replace range
    assert hook0.applies(_meta(False, 1024))
    assert not hook2.applies(_meta(False, 1024))
    # self >32^2 never edited (replace_self_attention pass-through)
    assert not hook0.applies(_meta(False, 4096))


def test_applies_local_blend_keeps_16sq_cross_maps():
    spec, arrays = _controller(blend_words=[("corgi",), ("cat",)])
    rt = ControllerRuntime(spec, arrays)
    hook = rt.hook_factory(3)  # outside the self-replace range
    # LocalBlend must still see the 16^2 cross maps on every step
    assert hook.applies(_meta(True, 256))
    assert not hook.applies(_meta(False, 4096))


def test_applies_store_kinds():
    spec = ControllerSpec(kind="store", store_all=True, num_steps=NUM_STEPS)
    _, arrays = _controller()
    rt = ControllerRuntime(spec, arrays)
    hook = rt.hook_factory(0)
    # AttentionStore keeps <=32^2 maps only (p2p.py:147)
    assert hook.applies(_meta(True, 1024))
    assert hook.applies(_meta(False, 256))
    assert not hook.applies(_meta(False, 4096))
    assert not hook.applies(_meta(True, 4096))

    empty = ControllerSpec(kind="empty", num_steps=NUM_STEPS)
    rt = ControllerRuntime(empty, arrays)
    assert not rt.hook_factory(0).applies(_meta(True, 256))


def test_edit_attention_passes_large_self_through():
    spec, arrays = _controller()
    # meta.query_len drives the static branch; the array itself can be
    # small (the branch never inspects probs.shape)
    probs = jnp.asarray(
        np.random.default_rng(0).random((2, 2, 8, 8)).astype(np.float32)
    )
    out = edit_attention(spec, arrays, probs, _meta(False, 4096), step=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(probs))


def test_cfg_wrapper_propagates_applies():
    """predict_noise's CFG cond-half wrapper (the DDIM/NTI baseline path)
    must keep the identity-layer predicate visible to the routing."""
    from invertible_cd_tpu.pipelines import sampler as S

    spec, arrays = _controller()
    rt = ControllerRuntime(spec, arrays)
    hook = rt.hook_factory(0)
    captured = {}

    def nm(latent, t, ctx, w_emb, h):
        captured["hook"] = h
        return latent

    g = S.GuidanceConfig(guidance_scale=8.0, w_embed_dim=0)
    lat = jnp.zeros((2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, 8), jnp.float32)
    S.predict_noise(nm, lat, 999, ctx, ctx, g, hook)
    wrapped = captured["hook"]
    assert wrapped is not hook
    assert wrapped.applies is hook.applies


def test_identity_layers_route_to_fused_attention(monkeypatch):
    """CrossAttention itself (not a copy of its branch) must take the
    fused path when applies() is False — pinned by monkeypatching both
    attention backends and driving the real module (ADVICE r3)."""
    import jax

    import invertible_cd_tpu.models.attention as A

    spec, arrays = _controller()
    rt = ControllerRuntime(spec, arrays)
    hook = rt.hook_factory(2)  # outside self-replace range

    calls = []

    def spy_explicit(q, k, v, hook_, meta):
        calls.append(("explicit", meta.is_cross, meta.query_len))
        return jnp.zeros_like(q)

    def spy_fused(q, k, v):
        calls.append(("fused", None, q.shape[1]))
        return jnp.zeros_like(q)

    monkeypatch.setattr(A, "explicit_attention", spy_explicit)
    monkeypatch.setattr(A, "fused_attention", spy_fused)

    rng = np.random.default_rng(1)
    module = A.CrossAttention(heads=2)

    def run(meta):
        x = jnp.asarray(rng.random((2, meta.query_len, 16)).astype(np.float32))
        ctx = (
            jnp.asarray(rng.random((2, 77, 16)).astype(np.float32))
            if meta.is_cross else None
        )
        # init params with no hook, then drive the real forward eagerly
        # (no jit) so the monkeypatched backends observe the routing
        params = module.init(jax.random.PRNGKey(0), x, ctx, None, meta)
        calls.clear()
        module.apply(params, x, ctx, hook, meta)
        return list(calls)

    self_calls = run(_meta(False, 4096))  # identity self layer -> fused
    cross_calls = run(_meta(True, 256))  # edited cross layer -> explicit
    assert self_calls == [("fused", None, 4096)], self_calls
    assert cross_calls == [("explicit", True, 256)], cross_calls


def test_routes_to_explicit_helper():
    """The shared predicate (used by CrossAttention) matches the hook's
    applies() verdict and handles hookless / predicate-less hooks."""
    from invertible_cd_tpu.models.attention import routes_to_explicit

    spec, arrays = _controller()
    rt = ControllerRuntime(spec, arrays)
    hook = rt.hook_factory(2)

    assert not routes_to_explicit(None, _meta(True, 256))
    assert routes_to_explicit(hook, _meta(True, 256))
    assert not routes_to_explicit(hook, _meta(False, 4096))
    # a bare callable without .applies is assumed to apply everywhere
    assert routes_to_explicit(lambda p, m: p, _meta(False, 4096))
