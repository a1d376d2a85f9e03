"""Persistent sampler service — production serving for the LDM pipelines.

The reference has no serving story (research scripts only); this is the
deployment layer the TPU build adds. Design is TPU-first:

- **Compiled-program reuse**: jitted denoise scans are cached per
  (batch_bucket, num_steps) — the first request for a bucket pays the
  compile, every later request dispatches a cached executable.
- **Cross-request microbatching**: a worker thread drains the request
  queue in windows of ``batch_window_ms`` and right-pads the collected
  latents to the next power-of-two bucket, so concurrent callers share one
  device dispatch (the latency-bound regime measured in BENCH_NOTES.md:
  batch 8 costs ~2.4x batch 1 for 8x the work).
- **Explicit PRNG**: every request carries a seed; identical seed =>
  identical image, independent of batching.

Front-end: stdlib ``http.server`` (zero-egress friendly, no framework):

  POST /sample   {"num_images": 1, "num_inference_steps": 50, "seed": 0}
                 -> {"shape": [...], "latency_s": ..., "images_b64": <npy>}
  GET  /healthz  -> {"ok": true}
  GET  /stats    -> counters (requests, batches, bucket sizes, compiles)

Programmatic use: ``SamplerService.sample(...)`` (thread-safe).
"""

import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp


def _next_bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class _Request:
    __slots__ = ("latents", "steps", "event", "result", "t0", "cancelled")

    def __init__(self, latents, steps):
        self.latents = latents
        self.steps = steps
        self.event = threading.Event()
        self.result = None
        self.t0 = time.perf_counter()
        self.cancelled = False


class SamplerService:
    """Batches concurrent sample() calls onto shared device dispatches."""

    def __init__(self, pipeline, batch_window_ms: float = 5.0,
                 max_batch: int = 16):
        self.pipeline = pipeline
        self.batch_window = batch_window_ms / 1e3
        self.buckets = [b for b in (1, 2, 4, 8, 16) if b <= max_batch]
        self._q = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "padded_slots": 0,
                      "by_bucket": {}}
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- public API ---------------------------------------------------------

    def sample(self, num_images: int = 1, num_inference_steps: int = 50,
               seed: int = 0, timeout: float = 600.0):
        """Generate images; blocks until the batched result is ready."""
        if num_images > self.buckets[-1]:
            # oversize requests would dispatch an unbucketed shape and pay
            # a fresh multi-minute compile per distinct size
            raise ValueError(
                f"num_images={num_images} exceeds max_batch="
                f"{self.buckets[-1]}; split the request")
        cfg = self.pipeline.unet.config
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(
            key, (num_images, cfg.sample_size, cfg.sample_size,
                  cfg.in_channels), jnp.float32)
        req = _Request(np.asarray(latents), int(num_inference_steps))
        self._q.put(req)
        if not req.event.wait(timeout):
            req.cancelled = True  # the worker will skip it
            raise TimeoutError("sampler request timed out")
        if isinstance(req.result, Exception):
            raise req.result
        return req.result

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # -- worker -------------------------------------------------------------

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if first.cancelled:  # waiter already timed out
                continue
            # drain the window; only merge requests with equal step counts
            # (different step counts are different compiled programs)
            batch = [first]
            deadline = time.perf_counter() + self.batch_window
            leftover = []
            while time.perf_counter() < deadline:
                room = self.buckets[-1] - sum(r.latents.shape[0]
                                              for r in batch)
                if room <= 0:
                    break
                try:
                    r = self._q.get(timeout=max(
                        0.0, deadline - time.perf_counter()))
                except queue.Empty:
                    break
                if r.cancelled:
                    continue
                if (r.steps == first.steps
                        and r.latents.shape[0] <= room):
                    batch.append(r)
                else:
                    leftover.append(r)
            for r in leftover:
                self._q.put(r)
            batch = [r for r in batch if not r.cancelled]
            if not batch:
                continue
            try:
                self._execute(batch)
            except Exception as e:  # propagate to all waiters
                for r in batch:
                    r.result = e
                    r.event.set()

    def _execute(self, batch):
        lat = np.concatenate([r.latents for r in batch], axis=0)
        n = lat.shape[0]
        bucket = _next_bucket(n, self.buckets)
        if bucket > n:  # right-pad to the compiled bucket size
            pad = np.repeat(lat[-1:], bucket - n, axis=0)
            lat = np.concatenate([lat, pad], axis=0)
        steps = batch[0].steps

        denoised, _ = self.pipeline.denoise(jnp.asarray(lat), steps)
        images = np.asarray(self.pipeline.decode(denoised))[:n]

        self.stats["requests"] += len(batch)
        self.stats["batches"] += 1
        self.stats["padded_slots"] += bucket - n
        key = str(bucket)
        self.stats["by_bucket"][key] = self.stats["by_bucket"].get(key,
                                                                   0) + 1
        off = 0
        for r in batch:
            k = r.latents.shape[0]
            r.result = {
                "images": images[off:off + k],
                "latency_s": time.perf_counter() - r.t0,
                "batched_with": n - k,
            }
            off += k
            r.event.set()


# ---------------------------------------------------------------------------
# HTTP front-end
# ---------------------------------------------------------------------------

def _npy_b64(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(service: SamplerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, service.stats)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                out = service.sample(
                    num_images=int(req.get("num_images", 1)),
                    num_inference_steps=int(
                        req.get("num_inference_steps", 50)),
                    seed=int(req.get("seed", 0)))
                self._json(200, {
                    "shape": list(out["images"].shape),
                    "latency_s": round(out["latency_s"], 4),
                    "batched_with": out["batched_with"],
                    "images_b64": _npy_b64(out["images"]),
                })
            except Exception as e:  # noqa: BLE001 — report to client
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(pipeline, host: str = "127.0.0.1", port: int = 8763,
          batch_window_ms: float = 5.0, max_batch: int = 16):
    """Blocking server entry; returns (server, service) when used
    programmatically via server.serve_forever() on a thread."""
    service = SamplerService(pipeline, batch_window_ms=batch_window_ms,
                             max_batch=max_batch)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    return server, service
