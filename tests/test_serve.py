"""Serving tests: dynamic micro-batching + the HTTP front.

The reference serves inference as one forked process + full SavedModel
reload PER FRAME (reference: TBIEvaluator.py:191-206,235-236); the
framework's server keeps one resident compiled forward and coalesces
concurrent requests into padded device batches (infer/server.py)."""

import io
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.infer.server import (
    DynamicBatcher, InferenceServer, ServerOverloadedError, _bucket_sizes)

SHAPE = (4, 6, 2)  # tiny per-frame shape for batcher-level tests


def _mk(n, fill):
    return np.full((n,) + SHAPE, float(fill), np.float32)


def test_bucket_sizes():
    assert _bucket_sizes(64) == [1, 2, 4, 8, 16, 32, 64]
    assert _bucket_sizes(5) == [1, 2, 4, 5]
    assert _bucket_sizes(1) == [1]
    # data-parallel floor: every bucket divides over the mesh's data axis
    assert _bucket_sizes(64, min_batch=8) == [8, 16, 32, 64]
    assert _bucket_sizes(48, min_batch=8) == [8, 16, 32, 48]
    with pytest.raises(ValueError):
        DynamicBatcher(lambda x: x, max_batch=6, min_batch=4)


def test_batcher_scatter_identity():
    b = DynamicBatcher(lambda x: x * 2.0, max_batch=8, window_ms=5.0)
    results = {}

    def call(i):
        results[i] = b.predict(_mk(2, i + 1))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        np.testing.assert_array_equal(results[i], _mk(2, 2 * (i + 1)))
    s = b.stats()
    assert s["requests"] == 4 and s["frames"] == 8
    b.stop()


def test_batcher_coalesces_queued_requests():
    seen = []
    first = threading.Event()

    def fn(x):
        seen.append(x.shape[0])
        if not first.is_set():
            first.set()
            time.sleep(0.25)  # hold the device: later requests must queue
        return x

    b = DynamicBatcher(fn, max_batch=8, window_ms=1.0)
    threads = [threading.Thread(target=b.predict, args=(_mk(1, i),))
               for i in range(4)]
    threads[0].start()
    first.wait(5)
    for t in threads[1:]:
        t.start()
    time.sleep(0.05)  # all three are enqueued while fn sleeps
    for t in threads:
        t.join()
    # the 3 queued single-row requests ran as ONE coalesced device batch
    assert b.stats()["device_batches"] == 2
    assert seen[1] >= 3
    b.stop()


def test_batcher_pads_to_bucket():
    shapes = []

    def fn(x):
        shapes.append(x.shape[0])
        return x

    b = DynamicBatcher(fn, max_batch=8, window_ms=0.5)
    out = b.predict(_mk(3, 1.0))
    assert out.shape[0] == 3        # padding rows are sliced off
    assert shapes == [4]            # 3 rows ran in the 4-bucket
    s = b.stats()
    assert s["padded_rows"] == 1
    assert s["batch_ms_p50"] >= 0.0 and s["batch_ms_p95"] >= s["batch_ms_p50"]
    b.stop()


def test_batcher_splits_oversize_request():
    b = DynamicBatcher(lambda x: x + 1.0, max_batch=4, window_ms=0.5)
    x = np.arange(10 * np.prod(SHAPE), dtype=np.float32).reshape((10,) + SHAPE)
    np.testing.assert_array_equal(b.predict(x), x + 1.0)
    assert b.stats()["device_batches"] == 3  # 4 + 4 + 2 rows
    b.stop()


def test_batcher_dp_forward_over_mesh():
    """Data-parallel serving: coalesced batches shard over the mesh's data
    axis (the `cli serve --n-devices N` path); min_batch floors the padding
    bucket so every device batch divides evenly."""
    from ultrasound_modeling_tpu.cli import _make_forward
    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.parallel import mesh as mesh_mod

    import dataclasses as dc
    cfg = default_config("transunet")
    mcfg = dc.replace(cfg.model, hidden_size=64, num_layers=1, num_heads=2,
                      mlp_dim=64, grid=(4, 5), img_size=(64, 80),
                      radix=2, kpaths=2)
    shape = (64, 80, 10)
    mesh = mesh_mod.make_mesh(n_data=4)
    fn_dp = _make_forward(mcfg, cfg.train, shape, None, mesh=mesh)
    fn_local = _make_forward(mcfg, cfg.train, shape, None)

    b = DynamicBatcher(fn_dp, max_batch=8, window_ms=0.5, min_batch=4)
    x = np.random.default_rng(0).normal(size=(3,) + shape).astype(np.float32)
    got = b.predict(x)
    want = np.asarray(fn_local(jnp.asarray(x)))
    assert got.shape == (3, 64, 80, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert b.stats()["padded_rows"] == 1  # 3 rows ran in the 4-bucket
    b.stop()


def test_batcher_rejects_when_saturated():
    """Admission control: once max_pending frames are in flight, further
    submits raise ServerOverloadedError instead of growing the queue."""
    release = threading.Event()

    def slow_fn(x):
        release.wait(5)
        return x

    b = DynamicBatcher(slow_fn, max_batch=2, window_ms=0.5, max_pending=4)
    try:
        errs, done = [], []

        def call(i):
            try:
                done.append(b.predict(_mk(2, i)))
            except ServerOverloadedError as e:
                errs.append(e)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
            time.sleep(0.05)  # deterministic admission order
        # 2 requests x 2 frames fill the budget; the other 2 are refused
        assert len(errs) == 2
        assert b.stats()["rejected"] == 2
        assert b.stats()["inflight_frames"] <= 4
        release.set()
        for t in threads:
            t.join()
        assert len(done) == 2
        # executed-frame accounting excludes the rejected requests
        assert b.stats()["frames"] == 4
    finally:
        release.set()
        b.stop()


def test_batcher_timeout_not_counted_as_executed_frames():
    """Cancelled chunks release their admission budget and never count as
    executed frames (stats stay truthful under timeouts)."""
    def slow_fn(x):
        time.sleep(0.4)
        return x

    b = DynamicBatcher(slow_fn, max_batch=2, window_ms=0.5, max_pending=16)
    try:
        with pytest.raises(TimeoutError):
            b.predict(_mk(8, 1.0), timeout=0.5)
        time.sleep(1.2)  # batcher drains the cancelled chunks
        s = b.stats()
        assert s["timeouts"] == 1
        assert s["frames"] < 8          # only chunks that actually ran
        assert s["inflight_frames"] == 0  # budget fully released
        if s["device_batches"]:
            assert s["mean_rows_per_batch"] <= 2.0
    finally:
        b.stop()


def test_batcher_propagates_errors():
    def fn(x):
        raise RuntimeError("boom")

    b = DynamicBatcher(fn, max_batch=4, window_ms=0.5)
    with pytest.raises(RuntimeError, match="boom"):
        b.predict(_mk(1, 0.0))
    b.stop()


# --------------------------------------------------------------------------
# HTTP end-to-end over an exported artifact (tiny flagship)

TOML = """
[model]
name = 'transunet'
hidden_size = 64
num_layers = 2
num_heads = 2
mlp_dim = 64
grid = [4, 5]
img_size = [64, 80]

[train]
batch_size = 2
"""
H, W = 64, 80


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from ultrasound_modeling_tpu.config import from_toml
    from ultrasound_modeling_tpu.infer import export as ex
    from ultrasound_modeling_tpu.models.registry import build_model
    from ultrasound_modeling_tpu.train import optim, step as step_mod

    cfgp = tmp_path_factory.mktemp("cfg") / "small.toml"
    cfgp.write_text(TOML)
    cfg = from_toml(str(cfgp))
    model = build_model(cfg.model)
    tx = optim.make_direction()
    state = step_mod.TrainState.create(
        model, tx, jnp.zeros((1, H, W, 10), jnp.float32),
        jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("art") / "m.stablehlo")
    ex.save_exported(
        ex.export_forward(cfg.model, state, (H, W, 10), batch=None), path)

    fn, sample_shape, exported_batch = ex.load_exported_meta(path)
    assert sample_shape == (H, W, 10)
    assert exported_batch is None  # symbolic-batch export
    server = InferenceServer(fn, sample_shape, port=0, max_batch=4,
                             window_ms=1.0, model_name="tiny")
    server.start_background()
    host, port = server.address
    direct = step_mod.make_forward(build_model(cfg.model))
    yield f"http://{host}:{port}", state, direct
    server.shutdown()


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read(), resp.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_http_predict_npy_matches_direct(served):
    base, state, direct = served
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, 10)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, x, allow_pickle=False)
    status, body, ctype = _post(base + "/predict", buf.getvalue(),
                                "application/octet-stream")
    assert status == 200 and ctype == "application/octet-stream"
    probs = np.load(io.BytesIO(body), allow_pickle=False)
    want = np.asarray(direct(state, jnp.asarray(x)))
    assert probs.shape == (2, H, W, 3)
    np.testing.assert_allclose(probs, want, atol=1e-5)


def test_http_predict_json_single_frame(served):
    base, _, _ = served
    x = np.zeros((H, W, 10), np.float32)
    status, body, _ = _post(base + "/predict",
                            json.dumps({"instances": x.tolist()}).encode(),
                            "application/json")
    assert status == 200
    out = json.loads(body)
    probs = np.asarray(out["probabilities"], np.float32)
    assert probs.shape == (H, W, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    assert np.asarray(out["classes"]).shape == (H, W)


def test_http_rejects_bad_shape_and_route(served):
    base, _, _ = served
    buf = io.BytesIO()
    np.save(buf, np.zeros((2, 3, 4), np.float32), allow_pickle=False)
    status, body, _ = _post(base + "/predict", buf.getvalue(),
                            "application/octet-stream")
    assert status == 400 and b"expected frames shaped" in body
    status, _, _ = _post(base + "/nope", b"", "application/json")
    assert status == 404


def test_http_healthz_and_stats(served):
    base, _, _ = served
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["sample_shape"] == [H, W, 10]
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["frames"] >= 3 and s["device_batches"] >= 1


def test_http_empty_batch_is_client_error(served):
    base, _, _ = served
    buf = io.BytesIO()
    np.save(buf, np.zeros((0, H, W, 10), np.float32), allow_pickle=False)
    status, body, _ = _post(base + "/predict", buf.getvalue(),
                            "application/octet-stream")
    assert status == 400 and b"empty batch" in body


def test_http_overload_returns_503_and_oversize_returns_413():
    """End-to-end backpressure: saturating the admission budget returns 503
    with Retry-After; an oversized Content-Length is refused with 413
    before the body is read; a slow model returns 504 on deadline."""
    release = threading.Event()
    shape = (4, 6, 2)

    def slow_fn(x):
        release.wait(10)
        return x

    server = InferenceServer(slow_fn, shape, port=0, max_batch=1,
                             window_ms=0.5, max_pending=1,
                             max_body_bytes=10_000,
                             request_timeout=30.0)
    server.start_background()
    host, port = server.address
    base = f"http://{host}:{port}"
    try:
        buf = io.BytesIO()
        np.save(buf, np.zeros((1,) + shape, np.float32), allow_pickle=False)
        frame = buf.getvalue()

        codes, hdrs = [], []

        def post():
            req = urllib.request.Request(
                base + "/predict", data=frame,
                headers={"Content-Type": "application/octet-stream"})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    codes.append(r.status)
            except urllib.error.HTTPError as e:
                codes.append(e.code)
                hdrs.append(e.headers.get("Retry-After"))

        threads = [threading.Thread(target=post) for _ in range(4)]
        for t in threads:
            t.start()
            time.sleep(0.05)
        time.sleep(0.2)
        # budget = 1 frame: one in flight, the rest refused immediately
        assert codes.count(503) == 3
        assert hdrs and all(h == "1" for h in hdrs)
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            s = json.loads(r.read())
        assert s["rejected"] == 3 and s["max_pending"] == 1
        assert s["inflight_frames"] <= 1

        # oversized body: refused before reading (413), memory bounded
        big = np.zeros((200,) + shape, np.float32)
        buf = io.BytesIO()
        np.save(buf, big, allow_pickle=False)
        status, body, _ = _post(base + "/predict", buf.getvalue(),
                                "application/octet-stream")
        assert status == 413 and b"exceeds" in body
        release.set()
        for t in threads:
            t.join()
        assert codes.count(200) == 1
    finally:
        release.set()
        server.shutdown()


def test_http_timeout_returns_504():
    def never(x):
        time.sleep(2.0)
        return x

    shape = (4, 6, 2)
    server = InferenceServer(never, shape, port=0, max_batch=1,
                             window_ms=0.5, request_timeout=0.3)
    server.start_background()
    host, port = server.address
    try:
        buf = io.BytesIO()
        np.save(buf, np.zeros((1,) + shape, np.float32), allow_pickle=False)
        status, body, _ = _post(f"http://{host}:{port}/predict",
                                buf.getvalue(), "application/octet-stream")
        assert status == 504 and b"timed out" in body
    finally:
        server.shutdown()


def test_predict_timeout_is_whole_call_and_cancels(monkeypatch):
    """The predict timeout is one shared deadline across the split chunks,
    and timed-out chunks are dropped by the batcher instead of running."""
    import time as _time
    from ultrasound_modeling_tpu.infer.server import DynamicBatcher

    ran = []

    def slow_fn(x):
        ran.append(x.shape[0])
        _time.sleep(0.4)
        return np.zeros(x.shape[:1] + (1,), np.float32)

    b = DynamicBatcher(slow_fn, max_batch=2, window_ms=1.0)
    try:
        t0 = _time.monotonic()
        with pytest.raises(TimeoutError):
            # 5 chunks x 0.4 s device time >> the 0.5 s budget; a per-chunk
            # timeout would have allowed up to 5 x 0.5 s
            b.predict(np.zeros((10, 4), np.float32), timeout=0.5)
        assert _time.monotonic() - t0 < 1.5
        _time.sleep(1.0)  # let the batcher drain the cancelled queue
        assert sum(ran) < 10  # cancelled chunks never reached the device
    finally:
        b.stop()
