"""Serving layer: request batching, batch invariance, zero retrace, HTTP.

The executor's whole contract is that serving rides ONE compiled
program: requests coalesce into fixed-size batches, tails get padded,
and a request's image is a pure function of (prompt, seed) — the batch
around it must not matter.
"""
import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from invertible_cd_tpu.serving import BatchingExecutor


@pytest.fixture(scope="module")
def served_pipe(tiny_pipe):
    return tiny_pipe


class TestBatchingExecutor:
    def test_batch_invariance_and_padding(self, served_pipe):
        pipe = served_pipe
        bs = 4
        with BatchingExecutor(pipe, batch_size=bs, max_delay=0.5) as ex:
            img = ex.generate("a red fox", seed=11)
            stats = ex.stats()
        # a single request rides a padded full batch
        assert stats["batches"] == 1 and stats["padded_slots"] == bs - 1

        # direct call through the same program with the same row-0 inputs
        latent = BatchingExecutor._latents(
            type("E", (), {"pipe": pipe, "mesh": None})(), [11] * bs
        )
        ref, _ = pipe.generate(
            ["a red fox"] * bs, latent=latent,
            guidance=pipe.default_guidance(),
        )
        np.testing.assert_array_equal(img, np.asarray(ref[0]))

    def test_coalescing_and_zero_retrace(self, served_pipe):
        pipe = served_pipe
        bs = 4
        with BatchingExecutor(pipe, batch_size=bs, max_delay=1.0) as ex:
            # warmup compile
            ex.generate("warmup", seed=0)
            programs = len(pipe._jit_cache)
            futs = [
                ex.submit(f"prompt variant {i}", seed=i) for i in range(bs)
            ]
            imgs = [f.result(timeout=300) for f in futs]
            stats = ex.stats()
        assert all(np.isfinite(i).all() for i in imgs)
        # the bs submissions landed in at most 2 device batches (the
        # worker soaks max_delay=1s for stragglers), and nothing recompiled
        assert stats["batches"] - 1 <= 2
        assert len(pipe._jit_cache) == programs
        # distinct seeds -> distinct latents -> distinct images
        assert np.abs(imgs[0] - imgs[1]).max() > 0

    def test_large_seeds_distinct_latents(self, served_pipe):
        """Seeds beyond int32 must keep their high bits: the latent
        program receives the seed as 32-bit halves (x64 is disabled
        under jit), so seeds differing ONLY above bit 31 must still
        produce different images — and stay reproducible."""
        big = 2**40 + 123
        with BatchingExecutor(served_pipe, batch_size=2, max_delay=0.05) as ex:
            a = ex.generate("hi-bit seed", seed=big)
            b = ex.generate("hi-bit seed", seed=big + 2**32)  # same low half
            a2 = ex.generate("hi-bit seed", seed=big)
        assert np.abs(a - b).max() > 0, "high seed bits were dropped"
        np.testing.assert_array_equal(a, a2)

    def test_independent_seeds_reproducible(self, served_pipe):
        pipe = served_pipe
        with BatchingExecutor(pipe, batch_size=2, max_delay=0.05) as ex:
            a = ex.generate("a lighthouse", seed=123)
            b = ex.generate("a lighthouse", seed=123)
        np.testing.assert_array_equal(a, b)

    def test_mesh_sharded_serving_matches_single_device(self, served_pipe):
        """mesh= shards each batch's latents over dp chips; a request's
        image must match the single-device executor for the same seed
        (to sharded-program tolerance)."""
        from invertible_cd_tpu.parallel import make_mesh

        pipe = served_pipe
        with BatchingExecutor(pipe, batch_size=4, max_delay=0.3) as ex:
            ref = [ex.submit(f"mesh prompt {i}", seed=100 + i) for i in range(4)]
            ref = [f.result(timeout=300) for f in ref]
        mesh = make_mesh(dp=4, fsdp=1, devices=jax.devices()[:4])
        with BatchingExecutor(
            pipe, batch_size=4, max_delay=0.3, mesh=mesh
        ) as ex:
            got = [ex.submit(f"mesh prompt {i}", seed=100 + i) for i in range(4)]
            got = [f.result(timeout=300) for f in got]
        for a, b in zip(ref, got):
            np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)

    def test_sp_mesh_serving_matches_single_device(self, served_pipe):
        """A mesh with sp > 1 serves each request spatially partitioned
        (latent HEIGHT sharded over sp chips — the batch-1 latency axis);
        pixels must match the single-device executor for the same seed."""
        from invertible_cd_tpu.parallel import make_mesh

        pipe = served_pipe
        with BatchingExecutor(pipe, batch_size=2, max_delay=0.3) as ex:
            ref = [ex.submit(f"sp prompt {i}", seed=200 + i) for i in range(2)]
            ref = [f.result(timeout=300) for f in ref]
        mesh = make_mesh(dp=2, fsdp=1, sp=2, tp=1, devices=jax.devices()[:4])
        with BatchingExecutor(
            pipe, batch_size=2, max_delay=0.3, mesh=mesh
        ) as ex:
            got = [ex.submit(f"sp prompt {i}", seed=200 + i) for i in range(2)]
            got = [f.result(timeout=300) for f in got]
        for a, b in zip(ref, got):
            np.testing.assert_allclose(a, b, atol=3e-5, rtol=1e-4)

    def test_mesh_batch_divisibility_validated(self, served_pipe):
        from invertible_cd_tpu.parallel import make_mesh

        mesh = make_mesh(dp=4, fsdp=1, devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="must divide"):
            BatchingExecutor(served_pipe, batch_size=3, mesh=mesh)

    def test_sdxl_pipeline_serves(self, tiny_pipe_xl):
        """The executor is pipeline-agnostic: the SDXL bundle's added
        conditioning rides inside generate()."""
        with BatchingExecutor(tiny_pipe_xl, batch_size=2, max_delay=0.05) as ex:
            img = ex.generate("an sdxl prompt", seed=3)
        assert np.isfinite(img).all() and img.ndim == 3

    def test_out_of_range_seed_rejected_at_submit(self, served_pipe):
        """A bad seed must fail ITS request, not poison the batch."""
        with BatchingExecutor(served_pipe, batch_size=2, max_delay=0.3) as ex:
            with pytest.raises(ValueError, match="int64"):
                ex.submit("x", seed=2**80)
            # neighbours are unaffected
            img = ex.generate("a fine request", seed=1)
        assert np.isfinite(img).all()

    def test_cancelled_future_does_not_poison_batch(self, served_pipe):
        with BatchingExecutor(served_pipe, batch_size=2, max_delay=0.5) as ex:
            ex.generate("warmup", seed=0)  # compile so the batch is fast
            f1 = ex.submit("to be cancelled", seed=1)
            cancelled = f1.cancel()
            f2 = ex.submit("still wants an image", seed=2)
            img = f2.result(timeout=300)
        assert cancelled and np.isfinite(img).all()

    def test_submit_after_shutdown_raises(self, served_pipe):
        ex = BatchingExecutor(served_pipe, batch_size=2)
        ex.shutdown()
        with pytest.raises(RuntimeError, match="shut down"):
            ex.submit("too late")

    def test_worker_failure_propagates_to_futures(self, served_pipe):
        ex = BatchingExecutor(served_pipe, batch_size=2, max_delay=0.05)
        original = ex.pipe.generate
        try:
            ex.pipe = type(ex.pipe)  # not a pipeline: generate will blow up
            fut = ex.submit("boom")
            with pytest.raises(Exception):
                fut.result(timeout=60)
        finally:
            ex.pipe = None
            ex.shutdown()
            del original


class TestHTTPServer:
    @pytest.fixture()
    def server(self, served_pipe):
        from cli.serve import make_server, parse_args

        args = parse_args(
            ["--model", "tiny", "--port", "0", "--batch_size", "2",
             "--max_delay_ms", "20"]
        )
        srv, ex = make_server(args, pipe=served_pipe)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv
        srv.shutdown()
        ex.shutdown()
        srv.server_close()

    def test_sp_only_flag_creates_mesh(self, served_pipe):
        """--sp without --dp must still serve spatially partitioned
        (ADVICE r4: it used to be silently ignored unless --dp was set)."""
        from cli.serve import make_server, parse_args

        args = parse_args(
            ["--model", "tiny", "--port", "0", "--batch_size", "4",
             "--sp", "2"]
        )
        srv, ex = make_server(args, pipe=served_pipe)
        try:
            assert ex.mesh is not None
            assert int(ex.mesh.shape["sp"]) == 2
            # dp auto-fills over the remaining devices (8 cpu / sp2)
            assert int(ex.mesh.shape["dp"]) == len(jax.devices()) // 2
        finally:
            ex.shutdown()
            srv.server_close()

    def test_explicit_dp_with_sp_uses_device_subset(self, served_pipe):
        """`--dp 1 --sp 2 --batch_size 1` — the small-batch latency
        shape sp exists for — must build a 2-device mesh on a host with
        more chips instead of tripping make_mesh's all-devices assert
        (round-5 review finding)."""
        from cli.serve import make_server, parse_args

        args = parse_args(
            ["--model", "tiny", "--port", "0", "--batch_size", "1",
             "--dp", "1", "--sp", "2"]
        )
        srv, ex = make_server(args, pipe=served_pipe)
        try:
            assert dict(ex.mesh.shape) == {
                "dp": 1, "fsdp": 1, "sp": 2, "tp": 1
            }
            img = ex.generate("a subset cat", seed=5)
            assert np.isfinite(img).all()
        finally:
            ex.shutdown()
            srv.server_close()

    def test_generate_and_healthz(self, server):
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "a cat", "seed": 5}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["requests"] >= 1

    @pytest.mark.parametrize(
        "body",
        [b"{not json", b'["a cat"]', b'"a cat"', b'{"prompt": 5}',
         b'{"prompt": "a cat", "seed": "x"}',
         b'{"prompt": "a cat", "seed": 1208925819614629174706176}'],
    )
    def test_bad_request_400(self, server, body):
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=60)
        assert err.value.code == 400


class TestMultiSizePrograms:
    """batch_sizes=(1, N): low-traffic requests ride the small program
    (VERDICT r3 item 8 — a second compiled batch size)."""

    def test_single_request_uses_small_program(self, served_pipe):
        with BatchingExecutor(
            served_pipe, batch_sizes=(1, 4), max_delay=0.05
        ) as ex:
            img = ex.generate("a red fox", seed=11)
            stats = ex.stats()
        assert stats["batches_b1"] == 1
        assert stats["padded_slots"] == 0
        # output identical to the batch-4 program's row 0 (batch
        # invariance ACROSS program sizes)
        latent = BatchingExecutor._latents(
            type("E", (), {"pipe": served_pipe, "mesh": None})(), [11] * 4
        )
        ref, _ = served_pipe.generate(
            ["a red fox"] * 4, latent=latent,
            guidance=served_pipe.default_guidance(),
        )
        np.testing.assert_allclose(img, np.asarray(ref[0]), atol=2e-2)

    def test_burst_uses_large_program(self, served_pipe):
        with BatchingExecutor(
            served_pipe, batch_sizes=(1, 4), max_delay=0.5
        ) as ex:
            futs = [ex.submit(f"prompt {i}", seed=i) for i in range(4)]
            for f in futs:
                f.result()
            stats = ex.stats()
        assert stats.get("batches_b4", 0) >= 1

    def test_invalid_sizes_rejected(self, served_pipe):
        with pytest.raises(ValueError):
            BatchingExecutor(served_pipe, batch_sizes=(0, 4))


class TestRequestTimeout:
    def test_expired_request_fails_with_timeout(self, served_pipe):
        """A request whose dispatch deadline passed while queued must get
        TimeoutError, not chip time."""
        with BatchingExecutor(served_pipe, batch_size=2, max_delay=0.01) as ex:
            # occupy the worker, then enqueue an already-expired request
            first = ex.submit("warm", seed=0)
            expired = ex.submit("too late", seed=1, timeout=-1.0)
            first.result()
            with pytest.raises(TimeoutError):
                expired.result(timeout=30)
            # live requests still work afterwards
            assert ex.generate("after", seed=2).shape[-1] == 3
            assert ex.stats()["expired"] == 1

    def test_untimed_requests_never_expire(self, served_pipe):
        with BatchingExecutor(served_pipe, batch_size=2, max_delay=0.01) as ex:
            out = ex.generate("no deadline", seed=3)
        assert out.shape[-1] == 3
