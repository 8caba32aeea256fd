"""InvertibleCD — the user-facing pipeline bundling UNet students, CLIP, VAE.

Capability surface of the reference's L5 entry points (`utils/generation.py:12-66
runner`, `utils/inversion.py:51-100 invert`, `running/sd1.5/edit.py` editing
flow), re-architected so that every hot path is ONE jit-compiled XLA program:

  generate():   CLIP encode -> 3/4 consistency hops -> VAE decode
  invert():     VAE encode -> start-step noising -> 3/4 forward hops
  edit():       invert() -> controller-hooked generate() on [src, tgt]
  ddim_*():     50-step DDIM baselines (same program shape, scanned/unrolled)
  null_text_inversion(): per-step optax Adam on the uncond embedding

Jit programs are cached per (function, guidance config, controller spec,
batch/resolution). Editing different prompt pairs reuses one compiled
program because controller data (mappers, alphas, equalizers) are traced
inputs — see edit/controllers.py.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedule import NoiseSchedule, make_schedule
from ..diffusion.solver import SolverGrid, make_solver_grid
from ..ops.quant import quant_scope
from ..edit.controllers import (
    ControllerArrays,
    ControllerRuntime,
    ControllerSpec,
    empty_arrays,
)
from ..models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from ..utils.tokenizer import default_tokenizer
from . import sampler as S


@dataclasses.dataclass
class InvertibleCD:
    """Three-model bundle: guidance-distilled teacher + reverse/forward
    consistency students sharing one architecture (reference `load_models`,
    `utils/loading.py:27-90` returns the same triple)."""

    unet: UNet2DCondition
    text_encoder: CLIPTextModel
    vae: AutoencoderKL
    params: Dict[str, dict]  # keys: teacher, reverse, forward, text, vae
    tokenizer: object
    schedule: NoiseSchedule
    grid: SolverGrid
    scaling_factor: float = 0.18215
    latent_size: Tuple[int, int] = (64, 64)
    #: Opt-in int8 inference (ops/quant.py): "off" keeps everything bf16;
    #: "int8" runs every UNet *and* VAE matmul/conv as int8 on the MXU
    #: (2x bf16 peak on v5e); "int8_vae" quantizes only the VAE decode/
    #: encode (the most conservative trade: the decode is 1/3 of a
    #: batch-16 generate and images tolerate int8 well); "int8_static"
    #: is int8 with CALIBRATED per-conv activation scales — run
    #: collect_quant_stats() once first (convs without stats stay
    #: dynamic). CLIP always stays bf16. The jit cache keys on this, so
    #: flipping it after construction retraces cleanly.
    quantize: str = "off"

    _QUANT_MODES = ("off", "int8", "int8_vae", "int8_static")

    def __post_init__(self):
        if self.quantize not in self._QUANT_MODES:
            raise ValueError(
                f"quantize={self.quantize!r}; expected one of "
                f"{self._QUANT_MODES}"
            )
        self._jit_cache: Dict = {}

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @staticmethod
    def sd15(
        params: Optional[Dict[str, dict]] = None,
        tokenizer=None,
        grid: Optional[SolverGrid] = None,
        dtype=jnp.bfloat16,
        rng: Optional[jax.Array] = None,
        unet_cfg: Optional[UNetConfig] = None,
        clip_cfg: Optional[CLIPTextConfig] = None,
        vae_cfg: Optional[VAEConfig] = None,
        latent_size: Tuple[int, int] = (64, 64),
        quantize: str = "off",
    ) -> "InvertibleCD":
        """SD1.5 bundle. Without `params`, zero-initialised weights are
        created (for benchmarks / smoke tests; real use loads converted
        checkpoints via models.convert)."""
        unet_cfg = unet_cfg or UNetConfig.sd15()
        clip_cfg = clip_cfg or CLIPTextConfig.vit_l()
        vae_cfg = vae_cfg or VAEConfig.sd()
        unet = UNet2DCondition(unet_cfg, dtype=dtype)
        text = CLIPTextModel(clip_cfg, dtype=dtype)
        vae = AutoencoderKL(vae_cfg, dtype=dtype)
        tok = tokenizer or default_tokenizer()
        if params is None:
            params = init_zero_params(
                unet, text, vae, unet_cfg, clip_cfg, latent_size
            )
        return InvertibleCD(
            unet=unet,
            text_encoder=text,
            vae=vae,
            params=params,
            tokenizer=tok,
            schedule=make_schedule(),
            grid=grid or make_solver_grid(
                reverse_timesteps=[259, 519, 779, 999],
                forward_timesteps=[19, 259, 519, 779],
            ),
            scaling_factor=vae_cfg.scaling_factor,
            latent_size=latent_size,
            quantize=quantize,
        )

    @property
    def w_embed_dim(self) -> int:
        """The UNet's guidance-embedding width (0 if not w-conditioned)."""
        return self.unet.cfg.time_cond_proj_dim or 0

    def default_guidance(self, **kw) -> "S.GuidanceConfig":
        kw.setdefault("w_embed_dim", self.w_embed_dim)
        return S.GuidanceConfig(**kw)

    # ------------------------------------------------------------------
    # Text encoding
    # ------------------------------------------------------------------
    def encode_prompt(self, prompts: Sequence[str]) -> Tuple[jax.Array, jax.Array]:
        """(uncond_context, cond_context), each (B, 77, D) — the reference's
        `init_prompt` (`utils/generation.py:286-303`)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        tokens = jnp.asarray(self.tokenizer(list(prompts)))
        uncond = jnp.asarray(self.tokenizer([""] * len(prompts)))
        fn = self._get_jit("encode_text")
        return fn(self.params["text"], uncond), fn(self.params["text"], tokens)

    def _encode_all(self, prompts: Sequence[str], need_uncond: bool = True):
        """(ctx_uncond, ctx_cond, added_cond) — overridden by the SDXL
        pipeline to supply pooled-text + time-id added conditioning.

        `need_uncond=False` skips the "" CLIP pass: the w-conditioned
        sampler never reads context_uncond (predict_noise runs cond rows
        only), and on the tunneled chip one CLIP call is ~36 ms of the
        ~845 ms batch-16 generate — measured by tools/profile_gen.py."""
        if need_uncond:
            ctx_u, ctx_c = self.encode_prompt(prompts)
            return ctx_u, ctx_c, {}
        tokens = jnp.asarray(self.tokenizer(list(prompts)))
        ctx_c = self._get_jit("encode_text")(self.params["text"], tokens)
        return ctx_c, ctx_c, {}

    # ------------------------------------------------------------------
    # Jit program factory
    # ------------------------------------------------------------------
    def _get_jit(self, name: str, *static):
        from ..models.attention import _ambient_tp

        # The ambient mesh's tp size changes attention routing at TRACE
        # time (models/attention.py: the Pallas custom call has no
        # partitioning rule, so tp>1 must take the XLA path). Key the
        # cache on it, or a program traced outside `with mesh:` would be
        # silently reused inside it with the kernel baked in.
        key = (name, self.quantize, _ambient_tp()) + static
        if key in self._jit_cache:
            return self._jit_cache[key]
        fn = getattr(self, "_build_" + name)(*static)
        self._jit_cache[key] = fn
        return fn

    def _build_encode_text(self):
        def encode(params, tokens):
            return self.text_encoder.apply(params, tokens)["last_hidden_state"]
        return jax.jit(encode)

    def _noise_model(self, params, added=None):
        def nm(latent, t, context, w_emb, hook):
            b = latent.shape[0]
            added_b = None
            if added:
                # Broadcast SDXL added conditioning to the (possibly
                # CFG-doubled) batch. The CFG batch order is [uncond, cond]
                # (sampler.predict_noise); the reference zeroes the uncond
                # pooled embeds (`train_icd_xl_lora.py:900-903` and SDXL's
                # force_zeros_for_empty_prompt), so the uncond half gets
                # zero text_embeds, not a copy of the cond ones.
                rep = b // added["text_embeds"].shape[0]
                if rep > 1:
                    te = added["text_embeds"]
                    added_b = {
                        "text_embeds": jnp.concatenate(
                            [jnp.zeros_like(te)] * (rep - 1) + [te], axis=0
                        ),
                        "time_ids": jnp.concatenate(
                            [added["time_ids"]] * rep, axis=0
                        ),
                    }
                else:
                    added_b = added
            with quant_scope(self._unet_quant_mode()):
                return self.unet.apply(
                    params, latent, jnp.full((b,), t, jnp.int32), context,
                    w_cond=w_emb, added_cond=added_b, attn_hook=hook,
                )
        return nm

    def _unet_quant_mode(self) -> str:
        if self.quantize in ("int8", "int8_static"):
            return self.quantize
        return "off"

    def _vae_quant_mode(self) -> str:
        if self.quantize == "int8_static":
            return "int8_static"
        return "int8" if self.quantize in ("int8", "int8_vae") else "off"

    def _decode_latents(self, params, latents):
        with quant_scope(self._vae_quant_mode()):
            img = self.vae.apply(
                params, latents / self.scaling_factor, method=AutoencoderKL.decode
            )
        return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    def _encode_image(self, params, pixels):
        with quant_scope(self._vae_quant_mode()):
            mean = self.vae.apply(params, pixels, method=AutoencoderKL.encode_mean)
        return mean.astype(jnp.float32) * self.scaling_factor

    def _build_cons_generate(
        self, g: S.GuidanceConfig, spec: Optional[ControllerSpec],
        has_amplify: bool = False, return_traj: bool = False,
    ):
        def run(unet_params, vae_params, latent, ctx_u, ctx_c, ctx_amp, arrays, added):
            rt = ControllerRuntime(spec, arrays) if spec is not None else None
            latent = S.cons_generation(
                self._noise_model(unet_params, added), latent, ctx_u, ctx_c,
                self.grid, self.schedule, g,
                hook_factory=rt.hook_factory if rt else None,
                step_callback=rt.step_callback if rt else None,
                context_amplify=ctx_amp if has_amplify else None,
                return_all=return_traj,
            )
            final = latent[-1] if return_traj else latent
            # store_all specs surface the recorded attention maps as a jit
            # output (trace-time-collected tracers become real arrays).
            store = rt.store if (rt is not None and spec.store_all) else {}
            return self._decode_latents(vae_params, final), latent, store
        return jax.jit(run)

    def _build_cons_invert(self, g: S.GuidanceConfig, return_traj: bool = False):
        def run(unet_params, vae_params, pixels, noise, ctx_u, ctx_c, added):
            latent = self._encode_image(vae_params, pixels)
            inv = S.cons_inversion(
                self._noise_model(unet_params, added), latent, noise, ctx_u, ctx_c,
                self.grid, self.schedule, g, return_all=return_traj,
            )
            return inv, latent
        return jax.jit(run)

    def _build_ddim_generate(self, g: S.GuidanceConfig, spec, has_nti: bool):
        def run(unet_params, vae_params, latent, ctx_u, ctx_c, arrays, nti_u, added):
            rt = ControllerRuntime(spec, arrays) if spec is not None else None
            latent = S.ddim_loop(
                self._noise_model(unet_params, added), latent, ctx_u, ctx_c,
                self.grid, self.schedule, g, is_forward=False,
                per_step_uncond=nti_u if has_nti else None,
                hook_factory=rt.hook_factory if rt else None,
                step_callback=rt.step_callback if rt else None,
            )
            # store_all: surface the (step-averaged, scan form) maps just
            # like the cons path does
            store = rt.store if (rt is not None and spec.store_all) else {}
            return self._decode_latents(vae_params, latent), latent, store
        return jax.jit(run)

    def _build_ddim_invert(self, g: S.GuidanceConfig):
        def run(unet_params, vae_params, pixels, ctx_u, ctx_c, added):
            latent = self._encode_image(vae_params, pixels)
            traj = S.ddim_loop(
                self._noise_model(unet_params, added), latent, ctx_u, ctx_c,
                self.grid, self.schedule, g, is_forward=True, return_all=True,
            )
            return traj, latent
        return jax.jit(run)

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def init_latent(
        self, key: jax.Array, batch: int, dtype=jnp.float32
    ) -> jax.Array:
        """One shared latent expanded across the batch (the reference shares
        the seed latent between prompts, `generation.py:536-543`)."""
        h, w = self.latent_size
        z = jax.random.normal(key, (1, h, w, 4), dtype)
        return jnp.broadcast_to(z, (batch, h, w, 4))

    def generate(
        self,
        prompts: Sequence[str],
        key: Optional[jax.Array] = None,
        latent: Optional[jax.Array] = None,
        guidance: Optional[S.GuidanceConfig] = None,
        controller: Optional[Tuple[ControllerSpec, ControllerArrays]] = None,
        model: str = "reverse",
        amplify_prompt: Optional[Sequence[str]] = None,
        return_trajectory: bool = False,
    ):
        """Few-step consistency generation (reference `runner` with
        `is_cons_forward=True`, `utils/generation.py:12-66`).

        `amplify_prompt` (SDXL editing protocol, reference
        `generation_sdxl.py:426-442`): the prompt(s) whose context replaces
        the main prompts' while `t > tau1 * 1000` under dynamic guidance.

        Returns (images float32 [0,1] NHWC, final latents) — or, with
        `return_trajectory=True`, (images, (n_hops+1, B, H, W, C) latent
        trajectory; row i is hop i's input, the reference's `all_latent`).
        """
        if isinstance(prompts, str):
            prompts = [prompts]
        g = guidance or self.default_guidance()
        ctx_u, ctx_c, added = self._encode_all(
            prompts, need_uncond=g.w_embed_dim <= 0
        )
        ctx_amp = ctx_c
        if amplify_prompt is not None:
            if isinstance(amplify_prompt, str):
                amplify_prompt = [amplify_prompt]
            amplify_prompt = list(amplify_prompt)
            if len(amplify_prompt) == 1 and len(prompts) > 1:
                amplify_prompt = amplify_prompt * len(prompts)
            _, ctx_amp, _ = self._encode_all(amplify_prompt, need_uncond=False)
        if latent is None:
            latent = self.init_latent((key if key is not None else jax.random.PRNGKey(0)), len(prompts))
        spec, arrays = controller if controller else (None, None)
        if spec is None:
            arrays = empty_arrays(self.grid.num_reverse_steps, len(prompts))
        fn = self._get_jit(
            "cons_generate", g, spec, amplify_prompt is not None,
            return_trajectory,
        )
        images, latents, store = fn(
            self.params[model], self.params["vae"], latent, ctx_u, ctx_c, ctx_amp,
            arrays, added,
        )
        if spec is not None and spec.store_all:
            return images, latents, store
        return images, latents

    def invert(
        self,
        image: np.ndarray,
        prompt: str = "",
        key: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
        guidance: Optional[S.GuidanceConfig] = None,
        return_trajectory: bool = False,
    ):
        """Forward-CD inversion of a real image (reference `invert` cons path,
        `utils/inversion.py:51-100`). `image`: (H, W, 3) or (B, H, W, 3)
        uint8/float in [0, 255]. `prompt`: one string shared by the batch,
        or a sequence of per-image prompts (len == B).
        Returns (noise latent, clean latent); `return_trajectory=True`
        replaces the noise latent with the full (n_hops+1, ...) forward
        trajectory (row i = hop i's input)."""
        pixels = to_model_pixels(image)
        # The forward student trains at w == 0 but IS w-conditioned: it
        # always sees guidance_scale_embedding(0) through cond_proj
        # (reference train.py:227 + edit.py passes w_embed_dim=512 into
        # cons_inversion), so inversion must keep the w-embedding pathway
        # active with w = 0 — not drop it.
        g = guidance or self.default_guidance(guidance_scale=0.0)
        prompts = (
            [prompt] * pixels.shape[0] if isinstance(prompt, str) else list(prompt)
        )
        ctx_u, ctx_c, added = self._encode_all(
            prompts, need_uncond=g.w_embed_dim <= 0
        )
        if noise is None:
            h, w = self.latent_size
            noise = jax.random.normal(
                (key if key is not None else jax.random.PRNGKey(0)), (pixels.shape[0], h, w, 4)
            )
        fn = self._get_jit("cons_invert", g, return_trajectory)
        return fn(
            self.params["forward"], self.params["vae"], pixels, noise, ctx_u, ctx_c,
            added,
        )

    def edit(
        self,
        image: np.ndarray,
        source_prompt: str,
        target_prompt: str,
        controller: Tuple[ControllerSpec, ControllerArrays],
        key: Optional[jax.Array] = None,
        guidance: Optional[S.GuidanceConfig] = None,
        invert_guidance: Optional[S.GuidanceConfig] = None,
    ):
        """Invert-then-edit (reference `running/sd1.5/edit.py:353-458`):
        forward-CD encodes the image under the source prompt, then reverse-CD
        decodes a [source, target] pair with the p2p controller mixing
        attention; row 1 is the edited image.

        Returns (images (2, H, W, 3) float [0,1], edited latents)."""
        inv_latent, _ = self.invert(image, source_prompt, key=key, guidance=invert_guidance)
        latent = jnp.broadcast_to(inv_latent[:1], (2,) + inv_latent.shape[1:])
        g = guidance or self.default_guidance(
            guidance_scale=19.0, dynamic_guidance=True, tau1=0.8, tau2=0.8,
            edit_pair=True,
        )
        return self.generate(
            [source_prompt, target_prompt], latent=latent, guidance=g,
            controller=controller,
        )

    def ddim_generate(
        self,
        prompts: Sequence[str],
        key: Optional[jax.Array] = None,
        latent: Optional[jax.Array] = None,
        guidance: Optional[S.GuidanceConfig] = None,
        controller: Optional[Tuple[ControllerSpec, ControllerArrays]] = None,
        nti_uncond: Optional[jax.Array] = None,
        model: str = "teacher",
    ):
        """50-step DDIM baseline generation (reference `runner` default path)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        g = guidance or S.GuidanceConfig(guidance_scale=7.5, w_embed_dim=0)
        ctx_u, ctx_c, added = self._encode_all(prompts)
        if latent is None:
            latent = self.init_latent((key if key is not None else jax.random.PRNGKey(0)), len(prompts))
        spec, arrays = controller if controller else (None, None)
        if spec is None:
            arrays = empty_arrays(self.grid.n_steps, len(prompts))
        fn = self._get_jit("ddim_generate", g, spec, nti_uncond is not None)
        if nti_uncond is None:
            nti_uncond = jnp.zeros((0,))
        images, latents, store = fn(
            self.params[model], self.params["vae"], latent, ctx_u, ctx_c,
            arrays, nti_uncond, added,
        )
        if spec is not None and spec.store_all:
            return images, latents, store
        return images, latents

    def ddim_invert(
        self,
        image: np.ndarray,
        prompt: str = "",
        guidance: Optional[S.GuidanceConfig] = None,
    ):
        """50-step DDIM inversion; returns the full latent trajectory
        (needed as NTI targets — reference `ddim_inversion`,
        `utils/generation.py:349-371`). `prompt`: one string or per-image
        prompts (len == B)."""
        pixels = to_model_pixels(image)
        g = guidance or S.GuidanceConfig(guidance_scale=1.0, w_embed_dim=0)
        prompts = (
            [prompt] * pixels.shape[0] if isinstance(prompt, str) else list(prompt)
        )
        ctx_u, ctx_c, added = self._encode_all(prompts)
        fn = self._get_jit("ddim_invert", g)
        return fn(
            self.params["teacher"], self.params["vae"], pixels, ctx_u, ctx_c, added
        )

    def collect_quant_stats(
        self,
        prompts: Sequence[str] = ("a photo of a corgi on the beach",),
        key: Optional[jax.Array] = None,
        models: Sequence[str] = ("reverse", "forward"),
        guidance: Optional["S.GuidanceConfig"] = None,
    ) -> None:
        """Calibrate the int8_static conv scales (ops/quant.py).

        Runs each student's UNet at every grid timestep and the VAE
        decoder/encoder once, under quant_scope('calibrate') — conv
        input amaxes accumulate (running max, keyed by module path) into
        a 'quant_stats' collection that is merged into `self.params`, so
        every later apply under quantize='int8_static' reads it with no
        pipeline plumbing.

        Calibration inputs are the TRUE per-hop latents: a bf16 reference
        run records the reverse trajectory (`generate(...,
        return_trajectory=True)`), its output image is then forward-CD
        inverted to record the forward trajectory, and each student
        calibrates hop-by-hop on exactly the tensors it will see at
        inference. The VAE calibrates on the true final latent (decode)
        and its decoded pixels (encode). Statistics come from the
        caller's prompt set; int8_static clips anything the calibration
        missed — for maximum fidelity use quantize='int8' (fully
        dynamic) instead."""
        from ..diffusion.guidance import guidance_scale_embedding
        from ..ops.quant import quant_scope

        prompts = list(prompts)
        b = len(prompts)
        g = guidance or self.default_guidance()
        key = key if key is not None else jax.random.PRNGKey(0)
        _, ctx_c, added = self._encode_all(prompts, need_uncond=False)
        latent = self.init_latent(key, b, dtype=jnp.bfloat16)

        # bf16 reference run records the true trajectories
        old_quantize = self.quantize
        self.quantize = "off"
        try:
            images, traj = self.generate(
                prompts, key=key, guidance=g, return_trajectory=True
            )
            inv_traj = None
            if "forward" in models:
                inv_traj, _ = self.invert(
                    np.asarray(images, np.float32) * 255.0, prompts,
                    key=jax.random.fold_in(key, 1),
                    guidance=self.default_guidance(guidance_scale=0.0),
                    return_trajectory=True,
                )
        finally:
            self.quantize = old_quantize
        final_lat = traj[-1]
        w_emb = None
        if g.w_embed_dim:
            w_emb = guidance_scale_embedding(
                jnp.full((b,), g.guidance_scale, jnp.float32),
                g.w_embed_dim, dtype=latent.dtype,
            )

        def unet_calib(params, lat, t, ctx, w):
            with quant_scope("calibrate"):
                return self.unet.apply(
                    params, lat, t, ctx,
                    w_cond=w, added_cond=added or None,
                    mutable=["quant_stats"],
                )

        def merge(old, new):
            if old is None:
                return new
            return jax.tree.map(jnp.maximum, old, new)

        for model in models:
            stats = None
            if model == "forward":
                grid_ts = self.grid.forward_timesteps
                hop_inputs = inv_traj
                w = (
                    guidance_scale_embedding(
                        jnp.zeros((b,), jnp.float32), g.w_embed_dim,
                        dtype=latent.dtype,
                    ) if g.w_embed_dim else None
                )
            else:
                grid_ts = self.grid.reverse_timesteps
                hop_inputs = traj
                w = w_emb
            fn = jax.jit(unet_calib)  # t is traced: ONE compile per model
            for i, t in enumerate(grid_ts):
                t_arr = jnp.full((b,), int(t), jnp.int32)
                lat = hop_inputs[i].astype(latent.dtype)
                _, muts = fn(self.params[model], lat, t_arr, ctx_c, w)
                stats = merge(stats, muts["quant_stats"])
            self.params[model] = {**self.params[model], "quant_stats": stats}

        # VAE: decode a representative latent, encode the result. The
        # decode and encode stats cover DISJOINT submodules (decoder/
        # post_quant_conv vs encoder/quant_conv), so union-merge them.
        def vae_calib(params, z):
            with quant_scope("calibrate"):
                img, muts = self.vae.apply(
                    params, z / self.scaling_factor,
                    method=AutoencoderKL.decode, mutable=["quant_stats"],
                )
                pix = jnp.clip(img.astype(jnp.float32), -1, 1)
                _, muts2 = self.vae.apply(
                    params, pix, method=AutoencoderKL.encode_mean,
                    mutable=["quant_stats"],
                )
            return {**dict(muts["quant_stats"]), **dict(muts2["quant_stats"])}

        stats = jax.jit(vae_calib)(
            self.params["vae"], final_lat.astype(jnp.float32)
        )
        self.params["vae"] = {**self.params["vae"], "quant_stats": stats}
        # new collection in the params pytree -> existing programs retrace
        self._jit_cache.clear()

    def decode(self, latents: jax.Array) -> np.ndarray:
        fn = self._get_jit("decode")
        return np.asarray(fn(self.params["vae"], latents))

    def _build_decode(self):
        return jax.jit(lambda p, z: self._decode_latents(p, z))


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------
def to_model_pixels(image: np.ndarray) -> jax.Array:
    """uint8/float [0,255] (B,H,W,3) or (H,W,3) -> float32 [-1,1] NHWC."""
    arr = np.asarray(image)
    if arr.ndim == 3:
        arr = arr[None]
    return jnp.asarray(arr, jnp.float32) / 127.5 - 1.0


def load_512(image, left=0, right=0, top=0, bottom=0, size=512) -> np.ndarray:
    """Reference `load_512` twin (`utils/generation.py:546-566`): load an
    image (path, PIL image, or HWC array), apply optional edge-crop
    offsets plus a center square crop, and resize to (size, size) uint8
    RGB.

    The reference snapshot ships the offset/center-crop block commented
    out (`generation.py:547-562`), so with default offsets this matches
    its active behaviour exactly (plain resize). Nonzero offsets
    implement the canonical prompt-to-prompt semantics that the comment
    preserves, with the same clamping rules.
    """
    from PIL import Image

    if isinstance(image, str):
        arr = np.array(Image.open(image).convert("RGB"))[:, :, :3]
    elif Image is not None and isinstance(image, Image.Image):
        arr = np.array(image.convert("RGB"))[:, :, :3]
    else:
        arr = np.asarray(image)[:, :, :3]
    if left or right or top or bottom:
        h, w, _ = arr.shape
        left = min(left, w - 1)
        right = min(right, w - left - 1)
        top = min(top, h - left - 1)  # reference clamps top against LEFT
        bottom = min(bottom, h - top - 1)
        arr = arr[top:h - bottom, left:w - right]
        h, w, _ = arr.shape
        if h < w:
            offset = (w - h) // 2
            arr = arr[:, offset:offset + h]
        elif w < h:
            offset = (h - w) // 2
            arr = arr[offset:offset + w]
    out = Image.fromarray(arr.astype(np.uint8)).resize((size, size), Image.BICUBIC)
    return np.array(out)


def to_uint8(images: jax.Array) -> np.ndarray:
    """float [0,1] -> uint8 numpy. Pure host-side numpy: the input is
    being exported anyway, and jnp ops here would commit an
    already-fetched image back to the (possibly remote) device for a
    trivial elementwise pass."""
    arr = np.asarray(images)
    return np.round(np.clip(arr, 0, 1) * 255).astype(np.uint8)


def init_zero_params(unet, text, vae, unet_cfg, clip_cfg, latent_size,
                     param_dtype=None):
    """Zero-cost parameter trees (shape-correct, zero-filled) for smoke tests
    and benchmarks when no checkpoint is available. `param_dtype` overrides
    float leaf dtypes (bf16 storage halves HBM — needed to fit SDXL's 2.6B
    params plus both text encoders on one 16GB chip)."""
    h, w = latent_size
    pixel_factor = 2 ** (len(vae.cfg.block_out_channels) - 1)
    def zeros_like_tree(shapes):
        def mk(s):
            dt = s.dtype
            if param_dtype is not None and jnp.issubdtype(dt, jnp.floating):
                dt = param_dtype
            return jnp.zeros(s.shape, dt)
        return jax.tree.map(mk, shapes)

    sample = jnp.zeros((1, h, w, 4))
    ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
    wv = (
        jnp.zeros((1, unet_cfg.time_cond_proj_dim))
        if unet_cfg.time_cond_proj_dim
        else None
    )
    added = None
    if unet_cfg.addition_embed_dim is not None:
        added = {
            "text_embeds": jnp.zeros((1, unet_cfg.addition_embed_dim - 6 * unet_cfg.addition_time_embed_dim)),
            "time_ids": jnp.zeros((1, 6)),
        }
    u_shapes = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), sample, jnp.zeros((1,), jnp.int32), ctx, wv, added)
    )
    t_shapes = jax.eval_shape(
        lambda: text.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    )
    v_shapes = jax.eval_shape(
        lambda: vae.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, pixel_factor * h, pixel_factor * w, 3)),
        )
    )
    u = zeros_like_tree(u_shapes)
    return {
        "teacher": u,
        "reverse": u,
        "forward": u,
        "text": zeros_like_tree(t_shapes),
        "vae": zeros_like_tree(v_shapes),
    }
