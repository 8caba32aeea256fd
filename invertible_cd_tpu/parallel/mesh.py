"""Device mesh + sharding helpers (the TPU replacement for C14).

The reference's distributed layer is `torch.distributed` NCCL init plus
manual rank-strided batching and `all_gather` (reference
`utils/dist_utils.py:8-22`, `running/sd1.5/generate.py:29-39,372-383`). On
TPU none of that exists as user code: we lay out a `jax.sharding.Mesh`,
annotate array shardings, and XLA inserts the ICI collectives (gradient
psum, eval all-gather) inside the compiled program.

Axes:
  dp   — data parallel (the reference's only strategy: DDP/batch striding)
  fsdp — optional parameter sharding (ZeRO-style; a TPU-idiomatic extension
         needed for SDXL-scale training on small-HBM chips, SURVEY.md §2)

Multi-host: `initialize_distributed` wraps `jax.distributed.initialize`,
the analog of the reference's `dist_utils.init()` env-var plumbing.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op on a single host, mirroring the
    reference's single-process defaulting, `dist_utils.py:9-18`)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A (dp, fsdp) mesh over all (or the given) devices.

    With fsdp == 1 this degenerates to pure data parallelism — the
    reference's semantics. dp defaults to n_devices // fsdp.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % fsdp == 0, (n, fsdp)
        dp = n // fsdp
    assert dp * fsdp == n, f"mesh {dp}x{fsdp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, ("dp", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate elsewhere."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(params, mesh: Mesh, min_size: int = 2**16):
    """FSDP-style parameter layout: shard each large leaf over the "fsdp"
    axis along its largest divisible dimension; small leaves replicate.

    Returns a pytree of NamedShardings matching `params` (usable as
    jit in_shardings / device_put targets).
    """
    n_shard = mesh.shape["fsdp"]

    def spec_for(leaf) -> NamedSharding:
        if n_shard == 1 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        dims = list(leaf.shape)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if dims[i] % n_shard == 0:
                spec = [None] * len(dims)
                spec[i] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def shard_params(params, mesh: Mesh):
    """device_put params according to `param_sharding`."""
    shardings = param_sharding(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(batch, mesh: Mesh):
    """device_put a batch pytree with the leading axis over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def process_local_batch_slice(global_batch: int, mesh: Mesh) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch —
    the analog of the reference's rank-strided prompt split
    (`generate.py:29-39`), but contiguous per host as jax expects."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    return jax.process_index() * per, per
