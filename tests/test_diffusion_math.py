"""Golden tests for the diffusion math core (Phase 0 of SURVEY.md §7).

Cross-checks the jnp implementations against independent torch/numpy
recomputations of the same math (torch runs CPU-only here), plus the concrete
timestep grids published in the reference README.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from invertible_cd_tpu.diffusion import (
    add_noise,
    cfg_combine,
    ddim_next_step,
    ddim_prev_step,
    ddim_timestep_grid,
    guidance_scale_embedding,
    linear_schedule,
    linear_schedule_old,
    make_schedule,
    make_solver_grid,
    make_train_solver,
    predicted_origin,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule()


def torch_alphas_cumprod():
    betas = torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64) ** 2
    return torch.cumprod(1.0 - betas, dim=0)


class TestSchedule:
    def test_betas_match_torch(self, sched):
        acp = torch_alphas_cumprod().numpy()
        np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-6)
        assert float(sched.final_alpha_cumprod) == pytest.approx(acp[0])

    def test_ddim_grid_50(self):
        ts = ddim_timestep_grid(50)
        assert ts[0] == 19 and ts[-1] == 999 and len(ts) == 50
        np.testing.assert_array_equal(np.diff(ts), 20)

    def test_add_noise(self, sched):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
        n = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
        t = np.array([19, 999])
        out = add_noise(sched, jnp.asarray(x), jnp.asarray(n), jnp.asarray(t))
        acp = torch_alphas_cumprod().numpy()
        for b, tb in enumerate(t):
            expected = np.sqrt(acp[tb]) * x[b] + np.sqrt(1 - acp[tb]) * n[b]
            np.testing.assert_allclose(np.asarray(out[b]), expected, atol=1e-5)


class TestPredictedOrigin:
    def test_epsilon_hop(self, sched):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 4, 8, 8)).astype(np.float32)
        eps = rng.normal(size=(3, 4, 8, 8)).astype(np.float32)
        t = np.array([999, 519, 259])
        s = np.array([779, 259, 0])
        out = predicted_origin(
            jnp.asarray(eps),
            jnp.asarray(t),
            jnp.asarray(s),
            jnp.asarray(x),
            sched.sqrt_alphas_cumprod,
            sched.sqrt_one_minus_alphas_cumprod,
        )
        acp = torch_alphas_cumprod().numpy()
        alpha = np.sqrt(acp)
        sigma = np.sqrt(1 - acp)
        for b in range(3):
            x0 = (x[b] - sigma[t[b]] * eps[b]) / alpha[t[b]]
            a_s, s_s = (1.0, 0.0) if s[b] == 0 else (alpha[s[b]], sigma[s[b]])
            expected = a_s * x0 + s_s * eps[b]
            np.testing.assert_allclose(np.asarray(out[b]), expected, atol=1e-4)

    def test_boundary_zero_equals_x0(self, sched):
        """At s == 0 the hop must be exactly the x0 prediction (hard boundary)."""
        x = jnp.ones((1, 4, 4, 4))
        eps = jnp.full((1, 4, 4, 4), 0.5)
        t = jnp.array([999])
        out = predicted_origin(
            eps, t, jnp.array([0]), x,
            sched.sqrt_alphas_cumprod, sched.sqrt_one_minus_alphas_cumprod,
        )
        alpha = float(sched.sqrt_alphas_cumprod[999])
        sigma = float(sched.sqrt_one_minus_alphas_cumprod[999])
        np.testing.assert_allclose(
            np.asarray(out), (1.0 - sigma * 0.5) / alpha, rtol=1e-5
        )

    def test_v_prediction(self, sched):
        x = jnp.ones((1, 4, 4, 4))
        v = jnp.full((1, 4, 4, 4), 0.5)
        t = jnp.array([100])
        out = predicted_origin(
            v, t, jnp.array([0]), x,
            sched.sqrt_alphas_cumprod, sched.sqrt_one_minus_alphas_cumprod,
            prediction_type="v_prediction",
        )
        a = float(sched.sqrt_alphas_cumprod[100])
        s = float(sched.sqrt_one_minus_alphas_cumprod[100])
        np.testing.assert_allclose(np.asarray(out), a * 1.0 - s * 0.5, rtol=1e-5)


class TestDDIMSteps:
    def test_prev_then_next_roundtrip(self, sched):
        """next_step(eps, t, prev_step(eps, t, x)) == x for matching eps."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 4, 8, 8)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(1, 4, 8, 8)).astype(np.float32))
        t = jnp.array([499])
        prev = ddim_prev_step(eps, t, x, sched, 20)
        back = ddim_next_step(eps, jnp.array([499]), prev, sched, 20)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)

    def test_prev_step_at_first_uses_final_alpha(self, sched):
        """t=19 -> prev_t=-1 must use final_alpha_cumprod (set_alpha_to_one=False)."""
        x = jnp.ones((1, 4, 4, 4))
        eps = jnp.zeros((1, 4, 4, 4))
        out = ddim_prev_step(eps, jnp.array([19]), x, sched, 20)
        acp = torch_alphas_cumprod().numpy()
        expected = np.sqrt(acp[0]) * (1.0 / np.sqrt(acp[19]))
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], expected, rtol=1e-5)


class TestSolverGrid:
    def test_explicit_readme_grids(self):
        g = make_solver_grid(
            reverse_timesteps=[259, 519, 779, 999],
            forward_timesteps=[19, 259, 519, 779],
        )
        np.testing.assert_array_equal(g.reverse_timesteps, [999, 779, 519, 259])
        np.testing.assert_array_equal(g.reverse_boundaries, [779, 519, 259, 0])
        np.testing.assert_array_equal(g.forward_timesteps, [19, 259, 519, 779])
        np.testing.assert_array_equal(g.forward_boundaries, [259, 519, 779, 999])

    def test_explicit_3step_grid(self):
        g = make_solver_grid(
            reverse_timesteps=[339, 699, 999], forward_timesteps=[19, 339, 699]
        )
        np.testing.assert_array_equal(g.reverse_timesteps, [999, 699, 339])
        np.testing.assert_array_equal(g.reverse_boundaries, [699, 339, 0])
        np.testing.assert_array_equal(g.forward_boundaries, [339, 699, 999])

    def test_auto_endpoints_4(self):
        """Auto derivation with 4 endpoints reproduces the reference spread
        (interval ceil(50/4)=13 -> idxs [12,25,38] -> ts [259,519,779])."""
        g = make_solver_grid(num_endpoints=4, num_forward_endpoints=4)
        np.testing.assert_array_equal(g.reverse_timesteps, [999, 779, 519, 259])
        np.testing.assert_array_equal(g.reverse_boundaries, [779, 519, 259, 0])
        np.testing.assert_array_equal(g.forward_timesteps, [19, 259, 519, 779])
        np.testing.assert_array_equal(g.forward_boundaries, [259, 519, 779, 999])

    def test_auto_single_endpoint(self):
        g = make_solver_grid(num_endpoints=1, num_forward_endpoints=1)
        np.testing.assert_array_equal(g.reverse_timesteps, [999])
        np.testing.assert_array_equal(g.reverse_boundaries, [0])
        np.testing.assert_array_equal(g.forward_timesteps, [19])
        np.testing.assert_array_equal(g.forward_boundaries, [999])


class TestTrainSolver:
    @pytest.fixture(scope="class")
    def solver(self):
        acp = torch_alphas_cumprod().numpy()
        return make_train_solver(
            acp, endpoints="0,259,519,779", forward_endpoints="259,519,779,999",
            num_endpoints=4, num_forward_endpoints=4,
        )

    def test_tables(self, solver):
        acp = torch_alphas_cumprod().numpy()
        ts = ddim_timestep_grid(50)
        np.testing.assert_allclose(
            np.asarray(solver.ddim_alpha_cumprods), acp[ts], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(solver.ddim_alpha_cumprods_prev),
            np.concatenate([[acp[0]], acp[ts[:-1]]]),
            rtol=1e-6,
        )
        assert float(solver.ddim_alpha_cumprods_next[-1]) == 0.0

    def test_reverse_boundary_mask(self, solver):
        """Largest endpoint <= t, matching the reference mask construction
        (train.py:42-44)."""
        t = jnp.array([0, 100, 259, 300, 519, 700, 779, 999])
        s = solver.reverse_boundaries_for(t)
        np.testing.assert_array_equal(
            np.asarray(s), [0, 0, 259, 259, 519, 519, 779, 779]
        )

    def test_forward_boundary_mask(self, solver):
        """Smallest forward endpoint >= t (train.py:217-219)."""
        t = jnp.array([39, 259, 260, 519, 520, 779, 780, 999])
        s = solver.forward_boundaries_for(t)
        np.testing.assert_array_equal(
            np.asarray(s), [259, 259, 519, 519, 779, 779, 999, 999]
        )

    def test_ddim_step(self, solver):
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
        idx = jnp.array([0, 10])
        out = solver.ddim_step(x0, eps, idx)
        acp_prev = np.asarray(solver.ddim_alpha_cumprods_prev)
        for b, i in enumerate([0, 10]):
            expected = np.sqrt(acp_prev[i]) * np.asarray(x0[b]) + np.sqrt(
                1 - acp_prev[i]
            ) * np.asarray(eps[b])
            np.testing.assert_allclose(np.asarray(out[b]), expected, atol=1e-5)

    def test_auto_endpoint_defaults(self):
        acp = torch_alphas_cumprod().numpy()
        s = make_train_solver(acp, num_endpoints=4, num_forward_endpoints=4)
        np.testing.assert_array_equal(np.asarray(s.endpoints), [0, 259, 519, 779])
        np.testing.assert_array_equal(
            np.asarray(s.forward_endpoints), [259, 519, 779, 999]
        )


class TestGuidance:
    def test_w_embedding_matches_torch(self):
        w = np.array([0.0, 7.0, 19.0], dtype=np.float32)
        got = np.asarray(guidance_scale_embedding(jnp.asarray(w), 512))
        # Independent torch recomputation of the sin/cos features.
        tw = torch.tensor(w) * 1000.0
        half = 256
        freq = torch.exp(torch.arange(half, dtype=torch.float32) * (-np.log(10000.0) / (half - 1)))
        emb = tw[:, None] * freq[None, :]
        expected = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1).numpy()
        # Large phases (w*1000*freq up to 1.9e4 rad) round differently in
        # float32 between XLA and torch before sin() — compare the low
        # frequencies tightly and the whole embedding loosely.
        np.testing.assert_allclose(got, expected, atol=5e-2)
        np.testing.assert_allclose(got[:, 128:256], expected[:, 128:256], atol=1e-4)
        np.testing.assert_allclose(got[:, 384:], expected[:, 384:], atol=1e-4)
        assert got.shape == (3, 512)

    def test_w_embedding_odd_dim_pads(self):
        got = guidance_scale_embedding(jnp.array([1.0]), 7)
        assert got.shape == (1, 7)
        assert float(got[0, -1]) == 0.0

    def test_linear_schedule_old_regions(self):
        assert float(linear_schedule_old(300, 8.0, 0.4, 0.6)) == pytest.approx(8.0)
        assert float(linear_schedule_old(700, 8.0, 0.4, 0.6)) == pytest.approx(0.0)
        assert float(linear_schedule_old(500, 8.0, 0.4, 0.6)) == pytest.approx(4.0)

    def test_linear_schedule_old_step_function(self):
        """tau1 == tau2 degenerates to a step (used by SDXL dynamic guidance)."""
        assert float(linear_schedule_old(699, 8.0, 0.7, 0.7)) == pytest.approx(8.0)
        assert float(linear_schedule_old(701, 8.0, 0.7, 0.7)) == pytest.approx(0.0)

    def test_linear_schedule_regions(self):
        assert float(linear_schedule(300, 8.0, 0.4, 0.8)) == pytest.approx(8.0)
        assert float(linear_schedule(900, 8.0, 0.4, 0.8)) == pytest.approx(1.0)
        assert float(linear_schedule(600, 8.0, 0.4, 0.8)) == pytest.approx(4.5)

    def test_cfg_combine(self):
        text = jnp.full((1, 4), 2.0)
        uncond = jnp.full((1, 4), 1.0)
        out = cfg_combine(text, uncond, 500, 7.5)
        np.testing.assert_allclose(np.asarray(out), 1.0 + 7.5 * 1.0)
        out_dyn = cfg_combine(text, uncond, 600, 8.0, dynamic_guidance=True,
                              tau1=0.4, tau2=0.8)
        np.testing.assert_allclose(np.asarray(out_dyn), 1.0 + 4.5, rtol=1e-6)
