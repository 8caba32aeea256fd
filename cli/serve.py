"""Minimal HTTP serving front end over serving.BatchingExecutor.

POST /generate  body: JSON {"prompt": str, "seed": int?}
                response: image/png (the generated image)
GET  /healthz   -> {"status": "ok", ...executor stats}

Stdlib-only (ThreadingHTTPServer): concurrent client requests block on
their own futures while the executor coalesces them into fixed-batch
device calls — the throughput pattern is the executor's, the HTTP layer
is deliberately thin. For production front ends put a real ingress in
front; this endpoint exists so the serving path is drivable end to end
(tests/test_serving.py does, over a real socket).

Example:
  python cli/serve.py --model sd15 --batch_size 8 --port 8000 \
      --teacher_checkpoint ... --reverse_lora ...
  curl -d '{"prompt": "a corgi", "seed": 7}' localhost:8000/generate > out.png
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="sd15", choices=["sd15", "sdxl", "tiny"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--batch_sizes", default=None,
                   help="comma-separated compiled program set, e.g. '1,8': "
                        "each batch dispatches at the smallest size that "
                        "fits (low-traffic requests skip the padding)")
    p.add_argument("--max_delay_ms", type=float, default=10.0)
    p.add_argument("--guidance_scale", type=float, default=19.0)
    p.add_argument("--tau1", type=float, default=0.8)
    p.add_argument("--tau2", type=float, default=0.8)
    p.add_argument("--quantize", default="off",
                   choices=["off", "int8", "int8_vae", "int8_static"])
    p.add_argument("--dp", type=int, default=0,
                   help="serve over a dp(xsp) mesh: shard each batch's "
                        "requests over dp chips (0 = no mesh, single "
                        "device)")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial parallelism: additionally shard each "
                        "latent's HEIGHT over sp chips (batch-1 latency "
                        "scaling; needs dp*sp devices)")
    p.add_argument("--platform", default=None)
    p.add_argument("--reverse_timesteps", type=int, nargs="*", default=None,
                   help="default: 259 519 779 999 (SD1.5) / "
                        "249 499 699 999 (SDXL) — resolved in "
                        "cli.generate.build_pipeline")
    p.add_argument("--forward_timesteps", type=int, nargs="*", default=None)
    p.add_argument("--teacher_checkpoint", default=None)
    p.add_argument("--reverse_lora", default=None)
    p.add_argument("--forward_lora", default=None)
    p.add_argument("--vae_checkpoint", default=None)
    p.add_argument("--text_checkpoint", default=None)
    return p.parse_args(argv)


def _encode_png(img01) -> bytes:
    from PIL import Image

    from invertible_cd_tpu.pipelines import to_uint8

    buf = io.BytesIO()
    Image.fromarray(to_uint8(img01)).save(buf, format="PNG")
    return buf.getvalue()


def make_server(args, pipe=None):
    """Build (ThreadingHTTPServer, BatchingExecutor); callers own both.
    `pipe` injection keeps tests on the tiny bundle."""
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from invertible_cd_tpu.utils.cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    from invertible_cd_tpu.serving import BatchingExecutor

    if pipe is None:
        from cli.generate import build_pipeline

        pipe = build_pipeline(args)
    g = pipe.default_guidance(
        guidance_scale=args.guidance_scale, dynamic_guidance=True,
        tau1=args.tau1, tau2=args.tau2,
    )
    sizes = (
        tuple(int(b) for b in args.batch_sizes.split(","))
        if args.batch_sizes else None
    )
    mesh = None
    sp = max(1, getattr(args, "sp", 1) or 1)
    dp = getattr(args, "dp", 0) or 0
    if dp or sp > 1:
        import jax

        from invertible_cd_tpu.parallel import make_mesh

        # --sp alone serves each batch spatially partitioned over sp
        # chips with dp auto-filled over the remaining devices (dp=None
        # -> n_devices // sp); --dp alone is pure data parallelism.
        # An EXPLICIT dp with sp uses only dp*sp devices, so
        # `--dp 1 --sp 2 --batch_size 1` (the small-batch latency shape
        # sp exists for) works on a host with more chips.
        devices = jax.devices()[: dp * sp] if dp else None
        mesh = make_mesh(dp=dp or None, fsdp=1, sp=sp, tp=1,
                         devices=devices)
    executor = BatchingExecutor(
        pipe, batch_size=args.batch_size, batch_sizes=sizes,
        max_delay=args.max_delay_ms / 1e3, guidance=g, mesh=mesh,
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet by default
            pass

        def _reply(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({"status": "ok", **executor.stats()})
                self._reply(200, body.encode(), "application/json")
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict) or not isinstance(
                    req.get("prompt"), str
                ):
                    raise ValueError(
                        'body must be a JSON object with a string "prompt"'
                    )
                prompt = req["prompt"]
                seed = req.get("seed")
                if seed is not None and not isinstance(seed, int):
                    raise ValueError('"seed" must be an integer')
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._reply(
                    400, json.dumps({"error": str(e)}).encode(),
                    "application/json",
                )
                return
            try:
                fut = executor.submit(prompt, seed=seed)
            except ValueError as e:  # e.g. seed outside int64
                self._reply(
                    400, json.dumps({"error": str(e)}).encode(),
                    "application/json",
                )
                return
            try:
                img = fut.result(timeout=600)
            except Exception as e:  # noqa: BLE001 — surface as a 500
                self._reply(
                    500, json.dumps({"error": str(e)}).encode(),
                    "application/json",
                )
                return
            self._reply(200, _encode_png(img), "image/png")

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    server.executor = executor
    return server, executor


def main(argv=None):
    args = parse_args(argv)
    server, executor = make_server(args)
    print(
        f"serving on http://{args.host}:{server.server_address[1]} "
        f"(batch_size={args.batch_size})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        executor.shutdown()
        server.server_close()


if __name__ == "__main__":
    main()
