from .schedule import (
    NoiseSchedule,
    add_noise,
    ddim_timestep_grid,
    extract,
    make_schedule,
)
from .solver import (
    SolverGrid,
    TrainSolver,
    ddim_next_step,
    ddim_prev_step,
    make_solver_grid,
    make_train_solver,
    parse_endpoints,
    predicted_origin,
)
from .guidance import (
    cfg_combine,
    guidance_scale_embedding,
    linear_schedule,
    linear_schedule_old,
)

__all__ = [
    "NoiseSchedule",
    "add_noise",
    "ddim_timestep_grid",
    "extract",
    "make_schedule",
    "SolverGrid",
    "TrainSolver",
    "ddim_next_step",
    "ddim_prev_step",
    "make_solver_grid",
    "make_train_solver",
    "parse_endpoints",
    "predicted_origin",
    "cfg_combine",
    "guidance_scale_embedding",
    "linear_schedule",
    "linear_schedule_old",
]
