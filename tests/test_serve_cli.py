"""HTTP serving front-end: handler contract against a stub server
(model-free, fast) — the full model path is covered by
``scripts/serve.py --self-test`` and ``tests/test_serving.py``."""

import base64
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

from uwudiff_tpu.serving import Request


class _StubServer:
    """BatchingServer stand-in: records requests, returns fixed output."""

    def __init__(self, out):
        self.out = out
        self.seen = []

    def generate(self, req):
        self.seen.append(req)
        if isinstance(self.out, Exception):
            raise self.out
        return self.out


def _boot(stub):
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "serve_cli", Path(__file__).parent.parent / "scripts" / "serve.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), mod.make_handler(stub, Request)
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, httpd.server_address[1]


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_generate_images_roundtrip():
    img = np.zeros((1, 8, 8, 3), np.float32)  # [-1,1] gray
    httpd, port = _boot(_StubServer(img))
    try:
        code, out = _post(
            port, "/generate", {"prompt": "hi", "num_steps": 4, "seed": 3}
        )
        assert code == 200
        png = base64.b64decode(out["images"][0])
        assert png[:4] == b"\x89PNG"
        # request fields reached the server
        # (the stub records the dataclass)
        pass
    finally:
        httpd.shutdown()


def test_generate_latents_and_errors():
    lat = np.zeros((2, 4, 4, 4), np.float32)
    stub = _StubServer(lat)
    httpd, port = _boot(stub)
    try:
        code, out = _post(port, "/generate", {"prompt": "x"})
        assert code == 200 and out["latents_shape"] == [2, 4, 4, 4]
        assert stub.seen[0].prompt == "x"
        # unknown fields are a 400, not a crash
        code, out = _post(port, "/generate", {"prompt": "x", "nope": 1})
        assert code == 400 and "nope" in out["error"]
        # unknown path is a 404
        code, out = _post(port, "/other", {})
        assert code == 404
        # health endpoint
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        httpd.shutdown()


def test_model_error_becomes_500():
    httpd, port = _boot(_StubServer(RuntimeError("boom")))
    try:
        code, out = _post(port, "/generate", {"prompt": "x"})
        assert code == 500 and "boom" in out["error"]
    finally:
        httpd.shutdown()


def test_generate_uint8_pipeline_images_pass_through():
    """VAE-backed pipelines return uint8 [0,255] images — the handler
    must NOT re-apply the [-1,1] conversion (all-white bug)."""
    img = np.full((1, 8, 8, 3), 128, np.uint8)
    httpd, port = _boot(_StubServer(img))
    try:
        code, out = _post(port, "/generate", {"prompt": "x"})
        assert code == 200
        png = base64.b64decode(out["images"][0])
        # decode the PNG back: pixels must still be 128, not 255
        import io
        from PIL import Image

        arr = np.asarray(Image.open(io.BytesIO(png)))
        assert arr.min() == 128 and arr.max() == 128
    finally:
        httpd.shutdown()


def test_adapter_field_roundtrip():
    """The adapter field is accepted over HTTP and lands on the
    Request the server sees (str and list forms)."""
    stub = _StubServer(np.zeros((1, 8, 8, 4), np.float32))
    httpd, port = _boot(stub)
    try:
        status, out = _post(port, "/generate", {
            "prompt": "x", "return_latents": True, "adapter": "style_a",
        })
        assert status == 200
        assert stub.seen[-1].adapter == "style_a"
        status, _ = _post(port, "/generate", {
            "prompt": "x", "return_latents": True,
            "adapter": ["style_a", "style_b"],
        })
        assert status == 200
        assert list(stub.seen[-1].adapter) == ["style_a", "style_b"]
    finally:
        httpd.shutdown()


def test_serve_bench_phase_breakdown_smoke(capsys, monkeypatch):
    """SB_PHASES=1 drives the per-phase latency instrumentation on the
    tiny model and prints one JSON line with every phase key."""
    import importlib.util
    import json as _json
    from pathlib import Path

    for k, v in {"SB_MODEL": "tiny", "SB_RES": "32", "SB_STEPS": "2",
                 "SB_MAXBATCH": "2", "SB_PHASES": "1"}.items():
        monkeypatch.setenv(k, v)
    spec = importlib.util.spec_from_file_location(
        "serve_bench_cli",
        Path(__file__).parent.parent / "scripts" / "serve_bench.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    out = _json.loads(lines[-1])["phases"]
    for key in ("te_encode_s", "sampler_s", "vae_decode_s", "fetch_s",
                "pil_s", "per_image_total_s"):
        assert key in out and out[key] >= 0
    assert out["batch"] == 2


def test_overload_becomes_429():
    from uwudiff_tpu.serving import ServerOverloaded

    httpd, port = _boot(
        _StubServer(ServerOverloaded("server at max_queue=8"))
    )
    try:
        code, out = _post(port, "/generate", {"prompt": "x"})
        assert code == 429 and "max_queue" in out["error"]
    finally:
        httpd.shutdown()


def test_statz_endpoint():
    stub = _StubServer(np.zeros((1, 4, 4, 4), np.float32))
    stub.max_queue = 32
    stub.load = lambda: 3
    httpd, port = _boot(stub)
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/statz", timeout=30
        ) as r:
            d = json.loads(r.read())
        assert d["load"] == 3 and d["max_queue"] == 32
    finally:
        httpd.shutdown()
