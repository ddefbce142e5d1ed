"""Minimal batch-inference server for sampling from checkpoints.

Production-serving surface for the framework (the reference has no serving
path; its inference lives in notebooks): a dependency-free HTTP service
that AOT-compiles the sampler once per (batch, steps) and answers

    POST /sample   {"n": 4, "steps": 50, "seed": 0, "sampler": "ddpm"|"dpm"}
      → PNG grid
    GET  /healthz  → {"ok": true, "model": ..., "compiled": [...]}

Run:  python -m siss_tpu.serve --checkpoint <bundle-or-params> \
          --arch celebahq_256 --port 8500
"""

from __future__ import annotations

import argparse
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


class SamplerService:
    def __init__(self, checkpoint: str, arch: str = "celebahq_256",
                 subfolder: str = "unet", dtype=jnp.bfloat16):
        from siss_tpu.diffusion import NoiseSchedule
        from siss_tpu.models import UNet2D, UNet2DConfig
        from siss_tpu.utils import CheckpointManager

        self.arch = arch
        ucfg = getattr(UNet2DConfig, arch)()
        self.model = UNet2D(ucfg, dtype=dtype)
        self.shape = (ucfg.sample_size, ucfg.sample_size, ucfg.in_channels)
        params = self.model.init_params(jax.random.PRNGKey(0))
        if os.path.isdir(os.path.join(checkpoint, subfolder)):
            mgr = CheckpointManager(os.path.dirname(checkpoint) or ".")
            params = mgr.restore_item(checkpoint, subfolder, params)
        elif os.path.exists(checkpoint):
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ck:
                params = ck.restore(os.path.abspath(checkpoint), params)
        else:
            raise FileNotFoundError(checkpoint)
        self.params = params
        self.schedule = NoiseSchedule.create(1000, "linear")
        self._compiled = {}
        self._key_locks = {}
        self._lock = threading.Lock()

    def _eps_fn(self):
        def eps_apply(x, t, cond):
            return self.model.apply({"params": self.params}, x, t)

        return eps_apply

    def _get_sampler(self, n: int, steps: int, sampler: str):
        key = (n, steps, sampler)
        # per-key locks: a cold-shape compile (minutes for big UNets) must
        # not stall requests whose shapes are already warm
        with self._lock:
            cached = self._compiled.get(key)
            key_lock = self._key_locks.setdefault(key, threading.Lock())
        if cached is not None:
            return cached
        with key_lock:
            with self._lock:
                cached = self._compiled.get(key)
            if cached is not None:
                return cached
            from siss_tpu.diffusion.sampling import sample_ddpm, sample_dpm_solver_2m

            fn = sample_dpm_solver_2m if sampler == "dpm" else sample_ddpm

            @jax.jit
            def run(rng):
                return fn(self._eps_fn(), self.schedule, rng, (n, *self.shape), steps)

            run(jax.random.PRNGKey(0)).block_until_ready()  # compile now
            with self._lock:
                self._compiled[key] = run
            return run

    def sample_png(self, n: int = 4, steps: int = 50, seed: int = 0,
                   sampler: str = "ddpm") -> bytes:
        from PIL import Image

        from siss_tpu.evaluate import Evaluator

        run = self._get_sampler(n, steps, sampler)
        imgs = np.asarray(run(jax.random.PRNGKey(seed)))
        imgs = np.clip((imgs + 1) / 2, 0, 1)
        grid = Evaluator.make_grid_from_images(imgs)
        arr = (grid * 255).astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()


def make_handler(service: SamplerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            if self.path == "/healthz":
                with service._lock:
                    compiled = [list(k) for k in service._compiled]
                body = json.dumps({"ok": True, "model": service.arch,
                                   "compiled": compiled}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/sample":
                self.send_response(404)
                self.end_headers()
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                png = service.sample_png(
                    n=int(req.get("n", 4)), steps=int(req.get("steps", 50)),
                    seed=int(req.get("seed", 0)), sampler=str(req.get("sampler", "ddpm")))
            except Exception as e:  # malformed bodies and sampler errors -> 400
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(png)

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--arch", default="celebahq_256")
    p.add_argument("--subfolder", default="unet")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    service = SamplerService(args.checkpoint, args.arch, args.subfolder)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"[siss_tpu.serve] {args.arch} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
