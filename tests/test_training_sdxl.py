"""SDXL-config training step: added-cond threading through all four losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invertible_cd_tpu.diffusion.schedule import make_schedule
from invertible_cd_tpu.diffusion.solver import make_train_solver
from invertible_cd_tpu.models import UNet2DCondition, UNetConfig
from invertible_cd_tpu.training import (
    LossConfig,
    TrainConfig,
    init_train_state,
    make_train_step,
)


class TestSDXLTrainStep:
    def test_step_with_added_cond(self):
        cfg = UNetConfig(
            block_out_channels=(16, 32),
            cross_attn_blocks=(False, True),
            layers_per_block=1,
            num_heads=(2, 2),
            transformer_depth=(1, 1),
            cross_attention_dim=32,
            use_linear_projection=True,
            time_cond_proj_dim=8,
            addition_embed_dim=16 + 6 * 8,
            addition_time_embed_dim=8,
        )
        unet = UNet2DCondition(cfg)
        b = 4
        added = {
            "text_embeds": jnp.zeros((1, 16)),
            "time_ids": jnp.zeros((1, 6)),
        }
        base = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 32)), jnp.zeros((1, 8)), added,
        )
        schedule = make_schedule()
        solver = make_train_solver(
            np.asarray(schedule.alphas_cumprod),
            num_endpoints=4, num_forward_endpoints=4,
            endpoints="0,259,519,779", forward_endpoints="259,519,779,999",
        )
        tcfg = TrainConfig(
            lora_rank=2, remat=True, loss=LossConfig(w_embed_dim=8)
        )
        state = init_train_state(jax.random.PRNGKey(1), base, tcfg)
        step = make_train_step(unet, base, base, solver, schedule, tcfg)
        k = jax.random.PRNGKey(2)
        batch = {
            "latents": jax.random.normal(k, (b, 8, 8, 4)),
            "context": 0.1 * jax.random.normal(k, (b, 77, 32)),
            "added_cond": {
                "text_embeds": jax.random.normal(k, (b, 16)),
                "time_ids": jnp.tile(
                    jnp.asarray([[32.0, 32, 0, 0, 32, 32]]), (b, 1)
                ),
            },
        }
        new_state, metrics = step(state, base, base, batch, jax.random.PRNGKey(3))
        for name, v in metrics.items():
            assert np.isfinite(float(v)), (name, v)
        assert int(new_state.step) == 1
