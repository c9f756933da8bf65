"""Sampling server — serve a trained diffusion model over HTTP.

Capability beyond the reference (which can only sample through its test
loop): ``dmme_tpu.trainer serve --config cfg.yaml`` loads the latest
checkpoint and serves

* ``GET  /healthz``              → ``{"status": "ok", "step": N, ...}``
* ``POST /sample`` JSON body     → PNG grid or raw ``.npy`` bytes
      {"n": 4,                   # samples (rounded up to a batch bucket)
       "sampler": "dpm",         # default|ddim|dpm|unipc|edm|cached|deep|deep_dpm
       "steps": 20,              # solver steps (sampler-specific default)
       "seed": 0,
       "format": "png"}          # png (grid) | npy ((n,H,W,C) float32 [0,1])

Design for a single-accelerator host: stdlib ``ThreadingHTTPServer`` for
concurrent connections, but generation runs under one lock (one TPU, one
compiled program at a time). Batch sizes are bucketed to powers of two and
the jitted generate is cached per (sampler, steps, bucket) — no recompiles
in steady state; the first request per shape pays the compile.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from dmme_tpu.diffusion.factory import MODULE_SAMPLERS
from dmme_tpu.utils.norm import denorm
from dmme_tpu.utils.vis import make_history

_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


class Sampler:
    """Checkpoint-backed sampler with per-(sampler, steps, bucket) jit cache."""

    def __init__(self, lit, state, img_size: int,
                 refresh_interval: int = 2, cache_depth: int = 1):
        self.lit = lit
        self.state = state
        self.img_size = int(img_size)
        # feature-caching knobs for the module-driven samplers — wired from
        # trainer.refresh_interval / trainer.cache_depth by cmd_serve so the
        # serve surface honors the same config keys as the sample subcommand
        self.refresh_interval = int(refresh_interval)
        self.cache_depth = int(cache_depth)
        self.step = int(jax.device_get(state.step))
        # conditioned-input models (LitUpsampler) have no conditioning
        # source over this API — reject at construction, not per-request
        from dmme_tpu.training.evaluate import _reject_conditioned_input

        _reject_conditioned_input(lit, "serve")
        self._cache: Dict[Tuple[str, int, int], Any] = {}
        self._lock = threading.Lock()

    def sample(self, n: int, sampler: str = "default",
               steps: Optional[int] = None, seed: int = 0) -> np.ndarray:
        """(n, H, W, C) float32 in [0, 1]."""
        if not 1 <= n <= _BUCKETS[-1]:
            raise ValueError(f"n must be in [1, {_BUCKETS[-1]}], got {n}")
        bucket = _bucket(n)
        key = (sampler, int(steps or 0), bucket)
        # Resolve EMA-vs-raw weights once, the same way lit.generate does
        # (reference validate_original_weights knob) so every sampler branch
        # serves the weights the model was configured to evaluate with.
        params = (
            self.state.params
            if getattr(self.lit, "validate_original_weights", False)
            else self.state.ema_params
        )
        with self._lock:  # one accelerator: serialize generation
            gen = self._cache.get(key)
            if gen is None:
                shape = (bucket, self.img_size, self.img_size,
                         self.lit.img_channels)
                if sampler == "default":
                    def raw(rng, _shape=shape):
                        return self.lit.generate(self.state, rng, _shape)
                elif sampler in MODULE_SAMPLERS:
                    # feature-caching samplers drive the UNet module itself
                    # (encoder reuse / deep-core caching, on the DDIM or
                    # DPM-Solver++ update; docs/performance.md —
                    # deep@interval-2 is +35% over exact DDIM on v5e)
                    from dmme_tpu.diffusion.factory import make_module_sampler

                    algo = make_module_sampler(
                        self.lit.diffusion_model, sampler, steps,
                        refresh_interval=self.refresh_interval,
                        cache_depth=self.cache_depth,
                        conditional=getattr(self.lit, "num_classes", None)
                        is not None,
                    )

                    def raw(rng, _algo=algo,
                            _shape=self.lit.sample_space_shape(shape),
                            _params=params):
                        return self.lit.to_images(_algo.generate(
                            self.lit.model, _params, rng, _shape
                        ))
                else:
                    # shared factory with the sample subcommand: reuses the
                    # trained schedule/parameterization and adapts IDDPM's
                    # eps||v output (dmme_tpu.diffusion.factory)
                    from dmme_tpu.diffusion import make_sampler

                    algo, adapt = make_sampler(
                        self.lit.diffusion_model, sampler, steps
                    )

                    def raw(rng, _algo=algo, _adapt=adapt,
                            _shape=self.lit.sample_space_shape(shape),
                            _params=params):
                        # conditional models: CFG wrapper w/ uniform labels
                        fn, rng = self.lit.sampling_model_fn(rng, _shape[0])
                        return self.lit.to_images(_algo.generate(
                            _adapt(fn), _params, rng, _shape
                        ))

                # jit so steady state never re-traces the sampling scan
                # (state arrays are captured as compile-time constants)
                gen = jax.jit(raw)
                self._cache[key] = gen
            out = gen(jax.random.PRNGKey(seed))
            out = np.asarray(jax.device_get(denorm(out)), np.float32)
        return out[:n]


def _png_bytes(images: np.ndarray) -> bytes:
    grid = make_history([images])
    from PIL import Image

    img = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    if img.shape[-1] == 1:
        img = img[..., 0]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _npy_bytes(images: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, images)
    return buf.getvalue()


def make_server(sampler: Sampler, host: str = "127.0.0.1", port: int = 8000):
    """Build (not start) a ThreadingHTTPServer bound to (host, port);
    ``port=0`` picks an ephemeral port (see ``server.server_address``)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "not found"})
            self._json(200, {
                "status": "ok",
                "step": sampler.step,
                "img_size": sampler.img_size,
                "samplers": ["default", "ddim", "dpm", "unipc", "edm", *MODULE_SAMPLERS],
            })

        def do_POST(self):
            if self.path != "/sample":
                return self._json(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length") or 0)
                req = json.loads(self.rfile.read(length) or b"{}")
                images = sampler.sample(
                    n=int(req.get("n", 1)),
                    sampler=str(req.get("sampler", "default")),
                    steps=req.get("steps"),
                    seed=int(req.get("seed", 0)),
                )
                fmt = str(req.get("format", "png"))
                if fmt == "npy":
                    body, ctype = _npy_bytes(images), "application/octet-stream"
                elif fmt == "png":
                    body, ctype = _png_bytes(images), "image/png"
                else:
                    return self._json(400, {"error": f"unknown format {fmt!r}"})
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                return self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — client must get an answer
                # without this the handler aborts the connection with no
                # status line at all (client sees a bare reset)
                return self._json(
                    500, {"error": f"{type(e).__name__}: {e}"}
                )
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(sampler: Sampler, host: str = "127.0.0.1", port: int = 8000):
    server = make_server(sampler, host, port)
    print(f"serving on http://{server.server_address[0]}:{server.server_address[1]}")
    server.serve_forever()
