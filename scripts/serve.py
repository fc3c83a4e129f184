#!/usr/bin/env python
"""HTTP serving CLI: config-driven txt2img service over the
continuous-batching server (no reference counterpart — UwUDiff has no
serving path; this fronts ``uwudiff_tpu/serving.py``).

    python scripts/serve.py --configs configs/demo_serving.yaml
    curl -s localhost:8000/healthz
    curl -s -X POST localhost:8000/generate \
      -d '{"prompt": "a (red:1.3) car", "width": 1024, "height": 1024}'

POST /generate accepts the ``Request`` fields (prompt, neg_prompt,
width, height, num_steps, cfg_scale, seed, prompt_weighting, adapter)
and returns JSON with a base64 PNG per image (or raw latent shape when
the stack has no VAE). ``adapter`` selects a LoRA registered via the
``adapters: {name: ckpt.npz}`` config node — hot-swapped per batch
group with zero recompiles.
``--self-test`` boots the server, round-trips one in-process HTTP
request, prints the response summary, and exits 0/1 — the smoke drive.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()


def _to_png_b64(img) -> str:
    """HWC image -> base64 PNG. The VAE-backed pipeline already returns
    uint8 PIL images ([0,255] via vae_image_postprocess) — pass those
    through untouched; only float [-1,1] arrays get the conversion."""
    import numpy as np
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(server, request_cls):
    """HTTP handler bound to a BatchingServer instance (kept separable
    from model construction so it unit-tests against a stub)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            elif self.path == "/statz":  # live load observability
                self._send(
                    200,
                    {
                        "load": (
                            server.load()
                            if hasattr(server, "load")
                            else None
                        ),
                        "max_queue": getattr(server, "max_queue", None),
                        "trace_count": getattr(
                            getattr(server, "pipeline", None),
                            "trace_count",
                            None,
                        ),
                    },
                )
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                allowed = {
                    f.name for f in request_cls.__dataclass_fields__.values()
                }
                unknown = set(payload) - allowed
                if unknown:
                    self._send(
                        400, {"error": f"unknown fields: {sorted(unknown)}"}
                    )
                    return
                req = request_cls(**payload)
            except (ValueError, TypeError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
                return
            try:
                out = server.generate(req)
            except Exception as e:
                from uwudiff_tpu.serving import ServerOverloaded

                if isinstance(e, ServerOverloaded):  # shed, don't queue
                    self.send_response(429)
                    self.send_header("Retry-After", "1")
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:  # surface model errors as 500s
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return
            import numpy as np

            out = np.asarray(out)
            if req.return_latents or out.shape[-1] != 3:
                # latent output (no VAE in the stack): report shape only
                self._send(
                    200,
                    {"latents_shape": list(out.shape),
                     "dtype": str(out.dtype)},
                )
            else:
                imgs = out if out.ndim == 4 else out[None]
                self._send(
                    200, {"images": [_to_png_b64(im) for im in imgs]}
                )

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="+", required=True)
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--self-test", action="store_true")
    args = parser.parse_args()

    from uwudiff_tpu.config import instantiate_any, load_config_files
    from uwudiff_tpu.data import DummyDataset
    from uwudiff_tpu.serving import BatchingServer, Request, Txt2ImgPipeline

    config = load_config_files(args.configs)
    trainer = instantiate_any(config["trainer"])
    ds = DummyDataset(
        sample_size=tuple(config.get("init_sample_size", (64, 64, 4))),
        n_samples=2,
    )
    ds.set_tokenizers(trainer.tokenizers)
    trainer.setup(ds.collate([ds[0]]))

    srv_cfg = dict(config.get("server", {}))
    cfg_port = srv_cfg.pop("port", 8000)  # pop unconditionally
    port = args.port if args.port is not None else cfg_port
    warmup_steps = srv_cfg.pop("warmup_steps", None)
    pipe_kwargs = srv_cfg.pop("pipeline", {}) or {}
    pipeline = Txt2ImgPipeline.from_trainer(trainer, **pipe_kwargs)
    # hot-swappable LoRA registry: `adapters: {name: ckpt.npz}` config
    # node; requests then select by {"adapter": "name"} with zero
    # recompiles (params are jit arguments). Needs trainer.lycoris_config
    # for the adapter specs the files load into.
    adapters_cfg = dict(config.get("adapters", {}) or {})
    if adapters_cfg:
        if trainer.adapter is None:
            raise ValueError(
                "config `adapters:` needs `trainer.lycoris_config` "
                "(the adapter specs the checkpoint files load into)"
            )
        for name, path in adapters_cfg.items():
            pipeline.register_adapter(name, trainer.adapter.load(path))
    server = BatchingServer(pipeline, **srv_cfg).start(
        warmup_steps=warmup_steps
    )

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(server, Request)
    )
    port = httpd.server_address[1]
    print(f"serving on http://127.0.0.1:{port}", flush=True)

    if args.self_test:
        import urllib.request

        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        defaults = dict(config.get("self_test_request", {}))
        body = json.dumps(defaults).encode()
        with urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=body,
                headers={"Content-Type": "application/json"},
            ),
            timeout=600,
        ) as resp:
            out = json.loads(resp.read())
        ok = "images" in out or "latents_shape" in out
        print(
            "self-test:",
            "OK" if ok else "FAIL",
            {k: (len(v) if k == "images" else v) for k, v in out.items()},
        )
        httpd.shutdown()
        server.stop()
        sys.exit(0 if ok else 1)

    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
