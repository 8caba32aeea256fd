"""Request-batching executor: production serving on one compiled program.

The reference has no serving story (its entry points are batch CLIs);
this is the TPU-idiomatic one. Because every pipeline program here has
STATIC shapes (pipelines/pipeline.py), a server should compile exactly
one generate program at a fixed batch size and push every request
through it — recompiles are the failure mode, not throughput. The
executor makes that shape discipline operational:

  * concurrent `submit()` calls enqueue (prompt, seed) requests;
  * a single worker thread coalesces up to `batch_size` requests
    (waiting at most `max_delay` for stragglers once it has one),
    PADS the tail batch up to `batch_size` with repeats, and runs ONE
    `pipe.generate` call — same program every time, asserted by the
    zero-retrace stats;
  * each request gets its own latent (drawn from its own seed), so
    padding never changes a real request's output: row i of the batch
    is a pure function of (prompt_i, latent_i) — batch-invariance is
    pinned by tests/test_serving.py against direct pipeline calls.

One worker thread owns all device dispatch; JAX's async dispatch means
the host-side padding/unpadding of batch k overlaps the device compute
of batch k-1. `stats()` reports batches, padded slots and the jit-cache
size (which must stay flat after warmup).

Usage:
    pipe = InvertibleCD.sd15(...)
    ex = BatchingExecutor(pipe, batch_size=8)
    fut = ex.submit("a corgi", seed=7)
    image = fut.result()          # (H, W, 3) float32 [0, 1]
    ex.shutdown()

`cli/serve.py` wraps this in an HTTP endpoint.
"""
from __future__ import annotations

import contextlib
import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from typing import Optional, Sequence

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def _seed_latents(lo: jax.Array, hi: jax.Array, h: int, w: int) -> jax.Array:
    """(N,) uint32 seed halves -> (N, h, w, 4) float32 latents.

    Seeds arrive split into 32-bit halves (computed host-side) because
    x64 is disabled under jit — a traced int64 seed would silently
    truncate, while `fold_in(PRNGKey(lo), hi)` keeps the full 64-bit
    seed space with uint32 arithmetic only."""
    def one(l, hh):
        key = jax.random.fold_in(jax.random.PRNGKey(l), hh)
        return jax.random.normal(key, (h, w, 4), jnp.float32)

    return jax.vmap(one)(lo, hi)


def _resolve(fut: Future, value=None, error: Exception | None = None) -> None:
    """set_result/set_exception tolerant of a client cancel() racing the
    done() check — a just-cancelled future raises InvalidStateError on
    set, which must not fail the REST of the batch's futures."""
    try:
        if fut.done():
            return
        if error is not None:
            fut.set_exception(error)
        else:
            fut.set_result(value)
    except InvalidStateError:
        pass


class BatchingExecutor:
    """Coalesce concurrent generation requests into fixed-size batches.

    Args:
      pipe: an InvertibleCD / InvertibleCDXL bundle.
      batch_size: the largest static batch the program compiles at.
      batch_sizes: optional FULL program set, e.g. (1, 4, 8): the worker
        dispatches each coalesced batch at the smallest compiled size
        that fits it, so a lone low-traffic request pays a batch-1
        program instead of 7 padded slots. Exactly len(batch_sizes)
        programs ever compile (still zero steady-state retraces).
        Defaults to (batch_size,) — the single-program executor.
      max_delay: seconds the worker waits for more requests after the
        first of a batch arrives (latency/throughput knob).
      guidance: optional GuidanceConfig shared by every request (one
        program per guidance config — vary it per-request and you pay a
        compile per distinct config, so the executor fixes it).
      model: student to sample from ("reverse" by default).
    """

    def __init__(
        self,
        pipe,
        batch_size: int = 8,
        max_delay: float = 0.01,
        guidance=None,
        model: str = "reverse",
        mesh=None,
        batch_sizes: Optional[Sequence[int]] = None,
    ):
        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        self.pipe = pipe
        self.batch_sizes = tuple(sorted(set(batch_sizes or (batch_size,))))
        if any(b < 1 for b in self.batch_sizes):
            raise ValueError("batch_sizes must all be >= 1")
        self.batch_size = self.batch_sizes[-1]
        self.max_delay = max_delay
        self.guidance = guidance or pipe.default_guidance()
        self.model = model
        # Multi-chip serving: a jax.sharding.Mesh with a "dp" axis
        # shards each batch's latents over the chips (computation
        # follows its inputs — XLA splits the whole program). Params are
        # read as stored (replicate or fsdp-shard them beforehand via
        # parallel.shard_params).
        self.mesh = mesh
        if mesh is not None:
            # batch_sharding shards the leading axis over "dp" ONLY
            # (fsdp shards params, not the batch) — validate against that
            dp = int(mesh.shape.get("dp", 1))
            bad = [b for b in self.batch_sizes if dp > 1 and b % dp != 0]
            if bad:
                raise ValueError(
                    f"batch sizes {bad} must divide over the mesh's "
                    f"dp={dp} batch shards"
                )
        self._queue: queue.Queue = queue.Queue()
        # Pipelining: the worker hands each batch's DEVICE array to a
        # completion thread and immediately collects/dispatches the next
        # batch, so the host fetch (≈25 MB of float32 through the TPU
        # tunnel at batch 8 — about as long as the batch's compute)
        # overlaps the next batch's on-chip execution instead of
        # serializing with it (measured: 5.2 → ~8 req/s at batch 8).
        # maxsize bounds in-flight batches (device HBM backpressure).
        self._completion: queue.Queue = queue.Queue(maxsize=2)
        self._stats = {
            "requests": 0, "batches": 0, "padded_slots": 0, "expired": 0,
        }
        self._stats_lock = threading.Lock()
        self._shutdown = threading.Event()
        # serializes submit()'s check-then-put against shutdown()'s
        # set-then-drain (without it a submit could pass the check, lose
        # the CPU, and enqueue after the drain — its future would hang)
        self._submit_lock = threading.Lock()
        self._completer = threading.Thread(
            target=self._complete, name="icd-serving-completer", daemon=True
        )
        self._completer.start()
        self._worker = threading.Thread(
            target=self._run, name="icd-serving-worker", daemon=True
        )
        self._worker.start()

    # ------------------------------------------------------------------
    def submit(
        self, prompt: str, seed: Optional[int] = None,
        timeout: Optional[float] = None,
    ) -> Future:
        """Enqueue one request; the Future resolves to an (H, W, 3)
        float32 [0, 1] numpy image.

        `timeout` (seconds) bounds the time a request may wait for
        DISPATCH: if the worker picks it up after the deadline (deep
        queue, slow device), its future fails with TimeoutError instead
        of occupying a batch slot — the client has given up; don't spend
        chip time on it. A request that makes it into a batch before the
        deadline completes normally.

        Raises ValueError for an out-of-range seed HERE rather than
        letting PRNGKey blow up in the worker — one bad request must not
        poison the whole coalesced batch."""
        if seed is not None and not (-(2**63) <= seed < 2**63):
            raise ValueError("seed must fit in int64")
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._submit_lock:
            if self._shutdown.is_set():
                raise RuntimeError("executor is shut down")
            fut: Future = Future()
            self._queue.put((prompt, seed, fut, deadline))
        with self._stats_lock:
            self._stats["requests"] += 1
        return fut

    def generate(self, prompt: str, seed: Optional[int] = None) -> np.ndarray:
        """Synchronous convenience wrapper around submit()."""
        return self.submit(prompt, seed).result()

    def stats(self) -> dict:
        with self._stats_lock:
            out = dict(self._stats)
        out["jit_programs"] = len(self.pipe._jit_cache)
        return out

    def shutdown(self, wait: bool = True):
        with self._submit_lock:
            # under the lock: no submit can be mid check-then-put, so
            # after this point every submit() raises instead of enqueuing
            self._shutdown.set()
            # unblock the worker's queue.get
            self._queue.put(None)
        if wait:
            self._worker.join(timeout=600)
            # worker's finally-block sentinel stops the completer after
            # the last in-flight batch resolves
            self._completer.join(timeout=600)
        # Fail whatever is still queued (enqueued before the sentinel but
        # never collected). If the worker is STILL alive (join timed out
        # mid-batch, or wait=False), the drain may have consumed its
        # sentinel — put one back so the worker exits instead of blocking
        # forever in queue.get().
        drained_sentinel = False
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is None:
                drained_sentinel = True
            else:
                fut = item[2]
                _resolve(fut, error=RuntimeError("executor is shut down"))
        if drained_sentinel and self._worker.is_alive():
            self._queue.put(None)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    # ------------------------------------------------------------------
    def _collect(self):
        """Block for the first request, then soak up to batch_size until
        a DEADLINE of max_delay after the first arrival (a per-get
        timeout would restart the clock on every straggler and stretch
        the wait to (batch_size-1)*max_delay). Returns a list of
        (prompt, seed, future), or None on shutdown."""
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_delay
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                # propagate shutdown after serving what we have
                self._queue.put(None)
                break
            batch.append(item)
        return batch

    def _latents(self, seeds: Sequence[int]) -> jax.Array:
        h, w = self.pipe.latent_size
        # one independent latent per request, ONE device dispatch per
        # batch: PRNGKey construction and the vmapped normal live inside
        # a single jitted program. The eager form (a PRNGKey device op
        # per seed + a separate vmap call) cost ~9 tunnel round trips
        # per batch on the remote-TPU backend — comparable to the
        # batch's entire compute.
        s = np.asarray(seeds, dtype=np.int64).astype(np.uint64)
        lo = jnp.asarray((s & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        hi = jnp.asarray((s >> np.uint64(32)).astype(np.uint32))
        latent = _seed_latents(lo, hi, h, w)
        if self.mesh is not None:
            from .parallel import batch_sharding, latent_sharding

            # A mesh with sp > 1 additionally shards latent HEIGHT, so
            # GSPMD runs each image spatially partitioned across the sp
            # group — the batch-1 latency axis (one request served
            # cooperatively by sp chips). dp-only meshes keep the plain
            # batch sharding.
            if int(self.mesh.shape.get("sp", 1)) > 1:
                latent = jax.device_put(latent, latent_sharding(self.mesh))
            else:
                latent = jax.device_put(latent, batch_sharding(self.mesh))
        return latent

    def _complete(self):
        """Resolve futures from fetched results — the pipeline stage that
        pays the device→host transfer (and surfaces async execution
        errors) without stalling the dispatch loop."""
        while True:
            item = self._completion.get()
            if item is None:
                return
            batch, images, n = item
            try:
                host = np.asarray(images[:n])
                for (_, _, fut, _), img in zip(batch, host):
                    _resolve(fut, img)  # client may have cancel()ed
            except Exception as e:  # noqa: BLE001 — futures carry the error
                for _, _, fut, _ in batch:
                    _resolve(fut, error=e)

    def _run(self):
        rng = np.random.default_rng(0)
        try:
            self._run_loop(rng)
        finally:
            # stop the completion thread after the last in-flight batch
            self._completion.put(None)

    def _run_loop(self, rng):
        while True:
            batch = self._collect()
            if batch is None:
                break
            # expire requests whose dispatch deadline passed while queued
            # (and skip client-cancelled futures) before they cost a slot
            now = time.monotonic()
            live = []
            for item in batch:
                _, _, fut, deadline = item
                if fut.cancelled():
                    continue
                if deadline is not None and now > deadline:
                    _resolve(fut, error=TimeoutError(
                        "request expired before dispatch"
                    ))
                    with self._stats_lock:
                        self._stats["expired"] += 1
                    continue
                live.append(item)
            if not live:
                continue
            batch = live
            prompts = [p for p, _, _, _ in batch]
            seeds = [
                s if s is not None else int(rng.integers(0, 2**31 - 1))
                for _, s, _, _ in batch
            ]
            n = len(batch)
            # smallest compiled program that fits — low-traffic batches
            # skip most of the padding (and its FLOPs)
            size = next(b for b in self.batch_sizes if b >= n)
            pad = size - n
            if pad:
                prompts = prompts + [prompts[-1]] * pad
                seeds = seeds + [seeds[-1]] * pad
            try:
                latent = self._latents(seeds)
                scope = self.mesh if self.mesh is not None else (
                    contextlib.nullcontext()
                )
                with scope:
                    images, _ = self.pipe.generate(
                        prompts,
                        latent=latent,
                        guidance=self.guidance,
                        model=self.model,
                    )
                # async dispatch done — hand the DEVICE array to the
                # completion thread and move on to the next batch; the
                # host fetch overlaps this batch's (and the next's)
                # on-chip execution. Execution errors surface at the
                # fetch, so the completion thread owns set_exception too.
                self._completion.put((batch, images, n))
            except Exception as e:  # noqa: BLE001 — futures carry the error
                for _, _, fut, _ in batch:
                    _resolve(fut, error=e)
            with self._stats_lock:
                self._stats["batches"] += 1
                self._stats["padded_slots"] += pad
                self._stats[f"batches_b{size}"] = (
                    self._stats.get(f"batches_b{size}", 0) + 1
                )
