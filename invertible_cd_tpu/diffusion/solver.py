"""Multi-boundary consistency solver math (pure jnp) + timestep-grid logic.

Unifies the reference's three copies of the solver math
(`utils/generation.py:136-205`, `utils/generation_sdxl.py:112-199`,
`training/src/lcm.py:45-170`) into one module.

All timestep *grids* are computed host-side as numpy int arrays: they are
static under jit (scan constants / unrolled python loops), so the compiled
samplers contain no data-dependent control flow.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import NoiseSchedule, ddim_timestep_grid, extract


# ---------------------------------------------------------------------------
# Consistency hop
# ---------------------------------------------------------------------------
def predicted_origin(
    model_output: jax.Array,
    timesteps: jax.Array,
    boundary_timesteps: jax.Array,
    sample: jax.Array,
    alpha_schedule: jax.Array,
    sigma_schedule: jax.Array,
    prediction_type: str = "epsilon",
) -> jax.Array:
    """The consistency hop t -> s: x0-prediction followed by an Euler step to s.

    With the hard boundary alpha_s=1, sigma_s=0 wherever s == 0 so the
    multi-boundary model is exactly equivalent to direct CD at the last hop
    (reference `utils/generation.py:136-155`).

    Args:
      model_output: epsilon (or v) prediction, shape like `sample`.
      timesteps / boundary_timesteps: int arrays, shape (B,) or scalar.
      alpha_schedule / sigma_schedule: (T,) sqrt(acp) and sqrt(1-acp) tables.
    """
    ndim = sample.ndim
    sigma_s = extract(sigma_schedule, boundary_timesteps, ndim)
    alpha_s = extract(alpha_schedule, boundary_timesteps, ndim)
    sigma_t = extract(sigma_schedule, timesteps, ndim)
    alpha_t = extract(alpha_schedule, timesteps, ndim)

    is_zero = jnp.asarray(boundary_timesteps) == 0
    if is_zero.ndim > 0:
        is_zero = is_zero.reshape(is_zero.shape[0], *((1,) * (ndim - 1)))
    alpha_s = jnp.where(is_zero, 1.0, alpha_s)
    sigma_s = jnp.where(is_zero, 0.0, sigma_s)

    if prediction_type == "epsilon":
        pred_x0 = (sample - sigma_t * model_output) / alpha_t
        return alpha_s * pred_x0 + sigma_s * model_output
    elif prediction_type == "v_prediction":
        # Generalised to arbitrary boundaries (the reference only supports
        # s == 0 here and asserts otherwise, `generation.py:151-152`):
        # x0 = alpha_t x - sigma_t v ; eps = sigma_t x + alpha_t v.
        pred_x0 = alpha_t * sample - sigma_t * model_output
        pred_eps = sigma_t * sample + alpha_t * model_output
        return alpha_s * pred_x0 + sigma_s * pred_eps
    raise ValueError(f"Prediction type {prediction_type} not supported.")


# ---------------------------------------------------------------------------
# One-hop DDIM steps (50-step baseline loops; reference Generator.prev/next_step)
# ---------------------------------------------------------------------------
def ddim_prev_step(
    model_output: jax.Array,
    timestep: jax.Array,
    sample: jax.Array,
    schedule: NoiseSchedule,
    step_ratio: int,
) -> jax.Array:
    """One reverse DDIM step t -> t - step_ratio (reference `generation.py:183-193`)."""
    prev_t = timestep - step_ratio
    acp = schedule.alphas_cumprod
    alpha_prod_t = extract(acp, timestep, sample.ndim)
    alpha_prod_prev = jnp.where(
        _ge0(prev_t, sample.ndim),
        extract(acp, jnp.clip(prev_t, 0, None), sample.ndim),
        schedule.final_alpha_cumprod,
    )
    beta_prod_t = 1.0 - alpha_prod_t
    pred_x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
    direction = (1.0 - alpha_prod_prev) ** 0.5 * model_output
    return alpha_prod_prev**0.5 * pred_x0 + direction


def ddim_next_step(
    model_output: jax.Array,
    timestep: jax.Array,
    sample: jax.Array,
    schedule: NoiseSchedule,
    step_ratio: int,
) -> jax.Array:
    """One forward (inversion) DDIM step t -> t + step_ratio (`generation.py:195-205`)."""
    cur_t = jnp.minimum(timestep - step_ratio, schedule.num_train_timesteps - 1)
    next_t = timestep
    acp = schedule.alphas_cumprod
    alpha_prod_t = jnp.where(
        _ge0(cur_t, sample.ndim),
        extract(acp, jnp.clip(cur_t, 0, None), sample.ndim),
        schedule.final_alpha_cumprod,
    )
    alpha_prod_next = extract(acp, next_t, sample.ndim)
    beta_prod_t = 1.0 - alpha_prod_t
    next_x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
    direction = (1.0 - alpha_prod_next) ** 0.5 * model_output
    return alpha_prod_next**0.5 * next_x0 + direction


def _ge0(t: jax.Array, ndim: int) -> jax.Array:
    t = jnp.asarray(t)
    cond = t >= 0
    if t.ndim == 0:
        return cond
    return cond.reshape(cond.shape[0], *((1,) * (ndim - 1)))


# ---------------------------------------------------------------------------
# Inference timestep/boundary grids (reference Generator.__init__ / lines 453-518)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SolverGrid:
    """Static (timestep, boundary) pairs for the reverse and forward CD loops.

    reverse: noise -> image, iterate (t_i, s_i) with t descending.
    forward: image -> noise, iterate (t_i, s_i) with t ascending.
    All entries are host numpy int64 — static under jit.
    """

    reverse_timesteps: np.ndarray
    reverse_boundaries: np.ndarray
    forward_timesteps: np.ndarray
    forward_boundaries: np.ndarray
    ddim_timesteps: np.ndarray
    n_steps: int = 50
    start_timestep: int = 19

    @property
    def num_reverse_steps(self) -> int:
        return len(self.reverse_timesteps)

    @property
    def num_forward_steps(self) -> int:
        return len(self.forward_timesteps)


def _auto_endpoints(
    ddim_ts: np.ndarray, num_endpoints: int, n_steps: int, max_inverse_index: int
):
    """Evenly spread endpoints (reference `generation.py:453-465`)."""
    interval = n_steps // num_endpoints + int(n_steps % num_endpoints > 0)
    idxs = np.arange(interval, n_steps, interval) - 1
    inverse_idxs = np.concatenate([idxs, [max_inverse_index]])
    endpoints = np.concatenate([[0], ddim_ts[idxs]])
    inverse_endpoints = ddim_ts[inverse_idxs]
    return endpoints.astype(np.int64), inverse_endpoints.astype(np.int64)


def make_solver_grid(
    n_steps: int = 50,
    num_endpoints: int = 4,
    num_forward_endpoints: int = 4,
    reverse_timesteps: Sequence[int] | None = None,
    forward_timesteps: Sequence[int] | None = None,
    max_forward_timestep_index: int | None = None,
    start_timestep: int = 19,
    num_train_timesteps: int = 1000,
) -> SolverGrid:
    """Build the (t, s) pairs for both CD directions.

    Mirrors reference `utils/generation.py:467-521`: either evenly-spread
    endpoints or explicit timestep lists (README grids, e.g. reverse
    [259,519,779,999] -> pairs t=[999,779,519,259], s=[779,519,259,0];
    forward [19,259,519,779] -> s=[259,519,779,999]).
    """
    ddim_ts = ddim_timestep_grid(n_steps, num_train_timesteps)
    if max_forward_timestep_index is None:
        # the reference hardcodes 49 for its 50-step grid
        # (`generate.py` flag default); generalise to the last index
        max_forward_timestep_index = n_steps - 1

    if reverse_timesteps is None or forward_timesteps is None:
        endpoints, inverse_endpoints = _auto_endpoints(
            ddim_ts, num_endpoints, n_steps, max_forward_timestep_index
        )
        rev_t, rev_s = inverse_endpoints[::-1].copy(), endpoints[::-1].copy()

        f_endpoints, f_inverse = _auto_endpoints(
            ddim_ts, num_forward_endpoints, n_steps, max_forward_timestep_index
        )
        fwd_t, fwd_s = f_endpoints.copy(), f_inverse.copy()
        fwd_t[0] = start_timestep
    else:
        rev_t = np.asarray(list(reverse_timesteps)[::-1], dtype=np.int64)
        rev_s = np.concatenate([rev_t[1:], [0]]).astype(np.int64)
        fwd_t = np.asarray(list(forward_timesteps), dtype=np.int64)
        fwd_s = np.concatenate([fwd_t[1:], [num_train_timesteps - 1]]).astype(np.int64)

    return SolverGrid(
        reverse_timesteps=rev_t,
        reverse_boundaries=rev_s,
        forward_timesteps=fwd_t,
        forward_boundaries=fwd_s,
        ddim_timesteps=ddim_ts,
        n_steps=n_steps,
        start_timestep=start_timestep,
    )


# ---------------------------------------------------------------------------
# Training-side solver (reference `training/src/lcm.py:80-170`)
# ---------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainSolver:
    """DDIM solver tables + CD endpoints for the four training losses.

    Device-array twin of the reference `lcm.DDIMSolver`: precomputed
    `ddim_timesteps` with prev/next alpha-cumprod tables, and the reverse /
    forward endpoint lists that define the multi-boundary targets.
    """

    ddim_timesteps: jax.Array  # (N,) int32
    ddim_alpha_cumprods: jax.Array  # (N,)
    ddim_alpha_cumprods_prev: jax.Array  # (N,)
    ddim_alpha_cumprods_next: jax.Array  # (N,)  (last entry 0.0)
    endpoints: jax.Array  # (E,) int32, ascending, endpoints[0] == 0
    forward_endpoints: jax.Array  # (F,) int32, ascending, last == T-1

    def ddim_step(self, pred_x0, pred_noise, timestep_index):
        """x_{t-1} from (x0, eps) at ddim index (reference `lcm.py:156-162`)."""
        acp_prev = extract(self.ddim_alpha_cumprods_prev, timestep_index, pred_x0.ndim)
        return jnp.sqrt(acp_prev) * pred_x0 + jnp.sqrt(1.0 - acp_prev) * pred_noise

    def forward_ddim_step(self, pred_x0, pred_noise, timestep_index):
        """x_{t+1} from (x0, eps) at ddim index (reference `lcm.py:164-170`)."""
        acp_next = extract(self.ddim_alpha_cumprods_next, timestep_index, pred_x0.ndim)
        return jnp.sqrt(acp_next) * pred_x0 + jnp.sqrt(1.0 - acp_next) * pred_noise

    def reverse_boundaries_for(self, timesteps: jax.Array) -> jax.Array:
        """Boundary s for each t: the largest endpoint <= t (reference
        `training/src/train.py:42-44` mask trick, vectorised)."""
        le = timesteps[None, :] >= self.endpoints[:, None]  # (E, B)
        idx = jnp.sum(le.astype(jnp.int32), axis=0) - 1
        return self.endpoints[jnp.clip(idx, 0, None)]

    def forward_boundaries_for(self, timesteps: jax.Array) -> jax.Array:
        """Boundary s for each t: the smallest forward endpoint >= t
        (reference `training/src/train.py:217-219`)."""
        ge = timesteps[None, :] <= self.forward_endpoints[:, None]  # (F, B)
        nge = jnp.sum(ge.astype(jnp.int32), axis=0)
        idx = self.forward_endpoints.shape[0] - nge
        return self.forward_endpoints[jnp.clip(idx, 0, self.forward_endpoints.shape[0] - 1)]


def parse_endpoints(spec: str | Sequence[int]) -> np.ndarray:
    """Parse "0,259,519,779"-style endpoint strings (reference `lcm.py:121-124`)."""
    if isinstance(spec, str):
        return np.asarray([int(e) for e in spec.split(",")], dtype=np.int64)
    return np.asarray(list(spec), dtype=np.int64)


def make_train_solver(
    alphas_cumprod: np.ndarray | jax.Array,
    num_train_timesteps: int = 1000,
    num_ddim_timesteps: int = 50,
    num_endpoints: int = 1,
    num_forward_endpoints: int = 1,
    endpoints: str | Sequence[int] | None = None,
    forward_endpoints: str | Sequence[int] | None = None,
) -> TrainSolver:
    """Build a TrainSolver (reference `lcm.DDIMSolver.__init__`, `lcm.py:80-144`)."""
    acp = np.asarray(alphas_cumprod, dtype=np.float64)
    ddim_ts = ddim_timestep_grid(num_ddim_timesteps, num_train_timesteps)
    acp_at = acp[ddim_ts]
    acp_prev = np.concatenate([[acp[0]], acp_at[:-1]])
    acp_next = np.concatenate([acp_at[1:], [0.0]])

    if endpoints is None:
        interval = num_ddim_timesteps // num_endpoints + int(
            num_ddim_timesteps % num_endpoints > 0
        )
        idxs = np.arange(interval, num_ddim_timesteps, interval) - 1
        ep = np.concatenate([[0], ddim_ts[idxs]]).astype(np.int64)
    else:
        ep = parse_endpoints(endpoints)
        assert len(ep) == num_endpoints, (len(ep), num_endpoints)

    if forward_endpoints is None:
        interval = num_ddim_timesteps // num_forward_endpoints + int(
            num_ddim_timesteps % num_forward_endpoints > 0
        )
        idxs = np.arange(interval, num_ddim_timesteps, interval) - 1
        fep = ddim_ts[np.concatenate([idxs, [num_ddim_timesteps - 1]])].astype(np.int64)
    else:
        fep = parse_endpoints(forward_endpoints)
        assert len(fep) == num_forward_endpoints, (len(fep), num_forward_endpoints)

    return TrainSolver(
        ddim_timesteps=jnp.asarray(ddim_ts, jnp.int32),
        ddim_alpha_cumprods=jnp.asarray(acp_at, jnp.float32),
        ddim_alpha_cumprods_prev=jnp.asarray(acp_prev, jnp.float32),
        ddim_alpha_cumprods_next=jnp.asarray(acp_next, jnp.float32),
        endpoints=jnp.asarray(ep, jnp.int32),
        forward_endpoints=jnp.asarray(fep, jnp.int32),
    )
