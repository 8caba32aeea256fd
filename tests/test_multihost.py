"""Multi-host path: two real jax.distributed processes on localhost CPU
(VERDICT round-1 item 10) — `initialize_distributed` plus the
`process_allgather` branches of `sample_for_fid` (training/eval.py) that
single-process tests can never reach.

Each worker gets 2 virtual CPU devices (4 global); rank-strided prompt
sweeps must gather to the full image set on every process, mirroring the
reference's `dist.all_gather` eval gathering (`reverse_eval.py:261-282`).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json
idx = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from invertible_cd_tpu.parallel import initialize_distributed, make_mesh
from invertible_cd_tpu.training.eval import sample_for_fid

initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=idx
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

# global mesh over both processes' devices
mesh = make_mesh()
assert mesh.devices.size == 4

# deterministic stub generator: encodes the prompt id into the pixel value
def gen(batch, key):
    import jax.numpy as jnp
    vals = jnp.asarray([float(p.split()[-1]) / 255.0 for p in batch])
    return jnp.broadcast_to(vals[:, None, None, None], (len(batch), 4, 4, 3))

prompts = [f"prompt {i}" for i in range(10)]
images = sample_for_fid(gen, prompts, batch_size=2, seed=0)

# every process must hold ALL images after the allgather
assert len(images) == 10, len(images)
got = sorted(int(im[0, 0, 0]) for im in images)
assert got == list(range(10)), got

print(json.dumps({"rank": idx, "n_images": len(images), "ok": True}))
"""


@pytest.mark.slow
def test_two_process_allgather(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\nstdout={out}\nstderr={err[-2000:]}"
        assert '"ok": true' in out.lower(), out
