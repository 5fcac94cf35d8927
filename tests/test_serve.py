"""Serving: continuous-batching engine + HTTP round-trip (CPU)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from qcnn_tpu.models import synth
from qcnn_tpu.serve.engine import BatchingEngine, EngineConfig
from qcnn_tpu.serve.http import serve as http_serve


@pytest.fixture(scope="module")
def tiny_spec():
    from qcnn_tpu.core import (
        ConvSpec, FCSpec, ModelSpec, PoolSpec, ReLUSpec, SoftmaxSpec,
    )

    return ModelSpec(
        name="tiny", in_height=11, in_width=11, in_channels=4,
        layers=(
            ConvSpec(kernel=3, out_channels=16, pad=1, stride=2),
            ReLUSpec(),
            PoolSpec(kernel=2, stride=2),
            FCSpec(10),
            SoftmaxSpec(),
        ),
    )


@pytest.fixture(scope="module")
def engine(tiny_spec):
    params = synth.random_pq_params(tiny_spec, seed=1)
    eng = BatchingEngine(
        tiny_spec, params,
        config=EngineConfig(max_batch=8, max_wait_ms=5.0),
    ).start()
    yield eng
    eng.stop()


def test_single_request(engine, tiny_spec, rng):
    img = rng.standard_normal((11, 11, 4)).astype(np.float32)
    probs = engine.classify(img, timeout=60)
    assert probs.shape == (10,)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-3)


def test_engine_memory_mode(tiny_spec, rng):
    """conv_impl/fc_impl='memory': the engine keeps the compressed PQ
    params resident (no dense kernel/weight entries) and still matches the
    decode path within compute-dtype tolerance."""
    from qcnn_tpu.models import network

    params = synth.random_pq_params(tiny_spec, seed=1)
    eng = BatchingEngine(
        tiny_spec, params,
        config=EngineConfig(max_batch=8, max_wait_ms=5.0),
        conv_impl="memory", fc_impl="memory",
    ).start()
    try:
        assert any(
            p is not None and "codebooks" in p for p in eng.params
        )
        assert not any(
            p is not None and ("kernel" in p or "weight" in p)
            for p in eng.params
        )
        img = rng.standard_normal((11, 11, 4)).astype(np.float32)
        got = eng.classify(img, timeout=60)
        want = np.asarray(
            network.forward(params, img[None], spec=tiny_spec)
        )[0]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    finally:
        eng.stop()


def test_concurrent_requests_batch(engine, rng):
    imgs = [
        rng.standard_normal((11, 11, 4)).astype(np.float32) for _ in range(20)
    ]
    futs = [engine.submit(im) for im in imgs]
    results = [f.result(timeout=60) for f in futs]
    assert all(r.shape == (10,) for r in results)
    # batching actually coalesced: fewer batches than requests
    assert engine.stats["batches"] < engine.stats["requests"]


def test_matches_direct_forward(engine, tiny_spec, rng):
    from qcnn_tpu.models import network

    img = rng.standard_normal((11, 11, 4)).astype(np.float32)
    got = engine.classify(img, timeout=60)
    params = synth.random_pq_params(tiny_spec, seed=1)
    want = np.asarray(
        network.forward(params, img[None], spec=tiny_spec)
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_http_roundtrip(engine):
    server = http_serve(engine, host="127.0.0.1", port=0, block=False)
    port = server.server_address[1]
    try:
        # healthz
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        # classify via raw tensor
        img = np.random.default_rng(5).standard_normal(
            (11, 11, 4)
        ).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=img.tobytes(),
            headers={"X-Shape": "11,11,4"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["class_ids"]) == 5
        assert out["probs"][0] >= out["probs"][-1]

        # bad payload -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=b"garbage",
            headers={"X-Shape": "3,3"},
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
        assert raised
    finally:
        server.shutdown()


def test_engine_on_mesh(tiny_spec, rng):
    """DP-sharded engine on the virtual 8-device mesh."""
    import jax

    from qcnn_tpu.parallel.mesh import make_mesh

    params = synth.random_pq_params(tiny_spec, seed=1)
    mesh = make_mesh(jax.devices(), dp=4, tp=2)
    eng = BatchingEngine(
        tiny_spec, params,
        config=EngineConfig(max_batch=8, max_wait_ms=5.0),
        mesh=mesh,
    ).start()
    try:
        futs = [
            eng.submit(rng.standard_normal((11, 11, 4)).astype(np.float32))
            for _ in range(12)
        ]
        res = [f.result(timeout=120) for f in futs]
        assert all(r.shape == (10,) for r in res)
        for r in res:
            np.testing.assert_allclose(r.sum(), 1.0, rtol=1e-3)
    finally:
        eng.stop()


def test_mesh_engine_passes_resolved_strategies(tiny_spec, rng,
                                                monkeypatch):
    """Round-5 review regression: the mesh path used to drop the
    prepare_params-resolved strategies and compute dtype, silently
    re-resolving 'auto' against memory-prepared params (the
    take_along_axis decode path) and losing bf16 activation casts."""
    import jax
    import jax.numpy as jnp

    import qcnn_tpu.models.network as network_mod
    from qcnn_tpu.parallel.mesh import make_mesh

    captured = {}
    real = network_mod.forward

    def spy(params, x, **kw):
        captured.update(kw)
        return real(params, x, **kw)

    monkeypatch.setattr(network_mod, "forward", spy)
    params = synth.random_pq_params(tiny_spec, seed=1)
    mesh = make_mesh(jax.devices(), dp=4, tp=2)
    eng = BatchingEngine(
        tiny_spec, params,
        config=EngineConfig(max_batch=8, max_wait_ms=5.0),
        mesh=mesh, conv_impl="memory", fc_impl="memory",
        compute_dtype=jnp.bfloat16,
    ).start()
    try:
        fut = eng.submit(rng.standard_normal((11, 11, 4)).astype(np.float32))
        fut.result(timeout=120)
    finally:
        eng.stop()
    assert captured.get("conv_impls") is not None
    assert captured.get("fc_impls") is not None
    assert all(ci != "auto" for ci in captured["conv_impls"] if ci)
    assert captured.get("compute_dtype") == jnp.bfloat16


def test_engine_from_forward_resnet(rng):
    """Engine over the ResNet family via the generic forward constructor."""
    import functools

    from qcnn_tpu.models import resnet

    spec = resnet.ResNetSpec(
        "rn-serve", (1,), (32,), num_classes=7, in_size=16, bottleneck=False
    )
    pq = resnet.quantize_params(
        spec, resnet.init_dense_params(spec, seed=9),
        conv_codewords=8, fc_codewords=8,
    )
    prepared = resnet.prepare_params(spec, pq, dtype=np.float32)
    fwd = functools.partial(resnet.forward, spec=spec, with_softmax=True)
    eng = BatchingEngine.from_forward(
        fwd, prepared, (16, 16, 3),
        config=EngineConfig(max_batch=4, max_wait_ms=5.0),
    ).start()
    try:
        futs = [
            eng.submit(rng.standard_normal((16, 16, 3)).astype(np.float32))
            for _ in range(6)
        ]
        res = [f.result(timeout=60) for f in futs]
        assert all(r.shape == (7,) for r in res)
        for r in res:
            np.testing.assert_allclose(r.sum(), 1.0, rtol=1e-3)
    finally:
        eng.stop()


def test_http_bmp_upload(engine, reference_dir):
    """BMP body -> preprocessor (native C++ or NumPy) -> engine."""
    import os

    from qcnn_tpu.preproc.pipeline import MeanType, Preprocessor, ReszType

    bmp = os.path.join(
        reference_dir, "Bmp.Files", "ILSVRC2012_val_00000001.BMP"
    )
    if not os.path.exists(bmp):
        pytest.skip("no BMP fixture")
    pre = Preprocessor(
        full_h=16, full_w=16, crop_h=11, crop_w=11,
        resz_type=ReszType.STRICT, mean_type=MeanType.CROP,
        mean_image=np.zeros((16, 16, 3), np.float32),
    )
    # engine's tiny model takes 4 channels; wrap preprocessor to pad
    class PadPre:
        full_h, full_w, crop_h, crop_w = 16, 16, 11, 11

        def __call__(self, img):
            out = pre(img)
            return np.concatenate(
                [out, np.zeros((*out.shape[:2], 1), np.float32)], -1
            )

        def process_blobs(self, blobs, require=False):
            got = pre.process_blobs(blobs, require=require)
            if got is None:
                return None
            pad = np.zeros((*got.shape[:3], 1), np.float32)
            return np.concatenate([got, pad], -1)

    server = http_serve(
        engine, host="127.0.0.1", port=0, block=False, preprocessor=PadPre()
    )
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=open(bmp, "rb").read(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["class_ids"]) == 5
    finally:
        server.shutdown()


def test_concurrent_submitters_stress(engine, rng):
    """Many threads racing submissions; every future resolves correctly."""
    import threading

    results = {}
    errors = []

    def worker(i):
        try:
            # per-thread generator: numpy Generators are not thread-safe,
            # and 32 threads on the shared fixture rng corrupt its state
            # (round-5 review) — deterministic per-worker streams instead
            img = np.random.default_rng(1000 + i).standard_normal(
                (11, 11, 4)).astype(np.float32)
            results[i] = engine.classify(img, timeout=120)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errors
    assert len(results) == 32
    for r in results.values():
        np.testing.assert_allclose(r.sum(), 1.0, rtol=1e-3)


def test_submit_after_stop_raises(tiny_spec, rng):
    eng = BatchingEngine(
        tiny_spec, synth.random_pq_params(tiny_spec, seed=2),
        config=EngineConfig(max_batch=2),
    ).start()
    eng.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        eng.submit(rng.standard_normal((11, 11, 4)).astype(np.float32))


def test_stop_drains_pending_futures(tiny_spec, rng):
    """Requests still queued when stop() lands must fail fast, not hang
    their callers until the classify() timeout (ADVICE.md round-1)."""
    eng = BatchingEngine(
        tiny_spec, synth.random_pq_params(tiny_spec, seed=2),
        config=EngineConfig(max_batch=2),
    )
    # never started: the dispatcher can't pick the request up, simulating
    # enqueue-just-before-stop
    fut = eng.submit(rng.standard_normal((11, 11, 4)).astype(np.float32))
    eng.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        fut.result(timeout=5)


def test_backpressure_rejects_when_queue_full(tiny_spec, rng):
    """Bounded queue: submit() raises EngineOverloaded instead of queueing
    unboundedly (the HTTP layer maps this to 503)."""
    from qcnn_tpu.serve.engine import EngineOverloaded

    eng = BatchingEngine(
        tiny_spec, synth.random_pq_params(tiny_spec, seed=2),
        config=EngineConfig(max_batch=2, max_queue=2),
    )
    # not started: nothing drains, so the 3rd submit must bounce
    img = rng.standard_normal((11, 11, 4)).astype(np.float32)
    eng.submit(img)
    eng.submit(img)
    with pytest.raises(EngineOverloaded, match="queue full"):
        eng.submit(img)
    assert eng.stats["rejected"] == 1
    eng.stop()


def test_deadline_expired_requests_are_dropped(tiny_spec, rng):
    """A request whose deadline passes before dispatch fails with
    DeadlineExceeded and never spends a batch slot; live requests queued
    behind it still get answers."""
    import time

    from qcnn_tpu.serve.engine import DeadlineExceeded

    eng = BatchingEngine(
        tiny_spec, synth.random_pq_params(tiny_spec, seed=2),
        config=EngineConfig(max_batch=2, max_wait_ms=1.0),
    )
    img = rng.standard_normal((11, 11, 4)).astype(np.float32)
    # enqueue BEFORE starting so the deadline can expire deterministically
    doomed = eng.submit(img, deadline_ms=1.0)
    alive = eng.submit(img)  # no deadline
    time.sleep(0.05)
    eng.start()
    probs = alive.result(timeout=60)
    assert probs.shape == (10,)
    with pytest.raises(DeadlineExceeded):
        doomed.result(timeout=5)
    assert eng.stats["expired"] == 1
    eng.stop()


class TestRouter:
    def test_balances_and_fails_over(self, tiny_spec, rng):
        from qcnn_tpu.serve.router import serve_router

        # two real engines + one dead backend
        engines, servers = [], []
        for seed in (1, 1):
            eng = BatchingEngine(
                tiny_spec, synth.random_pq_params(tiny_spec, seed=seed),
                config=EngineConfig(max_batch=4, max_wait_ms=2.0),
            ).start()
            srv = http_serve(eng, host="127.0.0.1", port=0, block=False)
            engines.append(eng)
            servers.append(srv)
        urls = [
            f"http://127.0.0.1:{s.server_address[1]}" for s in servers
        ] + ["http://127.0.0.1:1"]  # dead backend
        router_srv = serve_router(urls, port=0, block=False, cooldown_s=60)
        rport = router_srv.server_address[1]
        try:
            img = rng.standard_normal((11, 11, 4)).astype(np.float32)
            for _ in range(6):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{rport}/classify",
                    data=img.tobytes(),
                    headers={"X-Shape": "11,11,4"},
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=60) as r:
                    out = json.loads(r.read())
                assert len(out["class_ids"]) == 5
            # both live backends served traffic
            total = sum(e.stats["requests"] for e in engines)
            assert total == 6
            with urllib.request.urlopen(
                f"http://127.0.0.1:{rport}/healthz", timeout=10
            ) as r:
                health = json.loads(r.read())
            assert health["ok"] is True
            ups = [b for b in health["backends"] if b["up"]]
            assert len(ups) == 2  # dead one quarantined
        finally:
            router_srv.shutdown()
            for s in servers:
                s.shutdown()
            for e in engines:
                e.stop()

    def test_overload_fails_over_to_idle_peer(self):
        """Round-5 review regression: a 503-overloaded backend used to
        pass its 503 straight through while an idle peer sat unused
        (its instant 503s kept its outstanding count lowest, so
        least-outstanding pinned it). 5xx must fail over and count
        toward quarantine; the peer answers."""
        import http.server
        import threading as _threading

        from qcnn_tpu.serve.router import serve_router

        class Overloaded(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                self.rfile.read(
                    int(self.headers.get("Content-Length", 0)))
                body = b'{"error": "queue full"}'
                self.send_response(503)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        class Healthy(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                self.rfile.read(
                    int(self.headers.get("Content-Length", 0)))
                body = b'{"class_ids": [0], "probs": [1.0]}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        s_over = http.server.ThreadingHTTPServer(("127.0.0.1", 0),
                                                 Overloaded)
        s_ok = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Healthy)
        for s in (s_over, s_ok):
            _threading.Thread(target=s.serve_forever, daemon=True).start()
        urls = [f"http://127.0.0.1:{s_over.server_address[1]}",
                f"http://127.0.0.1:{s_ok.server_address[1]}"]
        router_srv = serve_router(urls, port=0, block=False,
                                  cooldown_s=60)
        rport = router_srv.server_address[1]
        try:
            for _ in range(4):  # every request must succeed via the peer
                req = urllib.request.Request(
                    f"http://127.0.0.1:{rport}/classify",
                    data=b"\x00" * 16, headers={"X-Shape": "2,2,1"},
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=30) as r:
                    assert r.status == 200
        finally:
            router_srv.shutdown()
            s_over.shutdown()
            s_ok.shutdown()

    def test_application_errors_pass_through(self, engine):
        from qcnn_tpu.serve.router import serve_router

        srv = http_serve(engine, host="127.0.0.1", port=0, block=False)
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        router_srv = serve_router([url], port=0, block=False)
        rport = router_srv.server_address[1]
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{rport}/classify",
                data=b"junk", headers={"X-Shape": "2,2"}, method="POST",
            )
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400  # not converted to 502 failover
        finally:
            router_srv.shutdown()
            srv.shutdown()


def test_router_forwards_deadline_header():
    """X-Deadline-Ms must pass through the router to the backend (the
    engine's per-request deadline contract)."""
    import http.server
    import threading
    import urllib.request

    from qcnn_tpu.serve.router import serve_router

    seen = {}

    class Echo(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            seen["deadline"] = self.headers.get("X-Deadline-Ms")
            body = json.dumps({"ok": True}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    backend = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Echo)
    threading.Thread(target=backend.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{backend.server_address[1]}"
    router_srv = serve_router([url], port=0, block=False)
    rport = router_srv.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{rport}/classify", data=b"x",
            method="POST", headers={"X-Deadline-Ms": "1500"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["ok"]
        assert seen["deadline"] == "1500"
    finally:
        router_srv.shutdown()
        backend.shutdown()


def test_mis_shaped_request_rejected_not_fatal(engine, rng):
    """A wrong-shape image must be rejected at submit() — inside a batch it
    would raise in np.stack and permanently kill the dispatcher (one bad
    request = engine DoS)."""
    with pytest.raises(ValueError, match="expected image shape"):
        engine.submit(rng.standard_normal((5, 5, 4)).astype(np.float32))
    # engine still alive and serving
    probs = engine.classify(
        rng.standard_normal((11, 11, 4)).astype(np.float32), timeout=60)
    assert probs.shape == (10,)


def test_cancelled_future_does_not_poison_batch(engine, rng):
    """fut.cancel() before dispatch must not InvalidStateError the batch:
    the dispatcher claims futures (RUNNING) and drops cancelled ones."""
    imgs = [rng.standard_normal((11, 11, 4)).astype(np.float32)
            for _ in range(4)]
    futs = [engine.submit(im) for im in imgs]
    futs[1].cancel()  # may or may not win the race with the dispatcher
    results = []
    for i, f in enumerate(futs):
        if i == 1 and f.cancelled():
            continue
        results.append(f.result(timeout=60))
    assert all(r.shape == (10,) for r in results)


def test_bucket_cap_below_max_batch(tiny_spec, rng):
    """Custom buckets smaller than max_batch: batches must never dispatch
    unpadded above the largest bucket (that shape was never warmed — a
    remote recompile per burst size) and padded_waste stays >= 0."""
    params = synth.random_pq_params(tiny_spec, seed=1)
    eng = BatchingEngine(
        tiny_spec, params,
        config=EngineConfig(max_batch=8, max_wait_ms=50.0, buckets=(1, 2)),
    ).start()
    try:
        imgs = [rng.standard_normal((11, 11, 4)).astype(np.float32)
                for _ in range(5)]
        futs = [eng.submit(im) for im in imgs]
        for f in futs:
            assert f.result(timeout=60).shape == (10,)
        assert eng.stats["padded_waste"] >= 0
    finally:
        eng.stop()


def test_serving_defaults_by_family_depth():
    """Round-4 measured ladders (KERNEL_STUDIES §11b): ViT depth-invariant
    peak-at-8 ladder; resnet101 peaks at 128; resnet152 capped at 64."""
    from qcnn_tpu.models.common import serving_defaults

    assert serving_defaults("vit_b16") == {
        "max_batch": 32, "buckets": (1, 8, 32)}
    assert serving_defaults("ViT-L/16") == {
        "max_batch": 32, "buckets": (1, 8, 32)}
    assert serving_defaults("ResNet101") == {
        "max_batch": 128, "buckets": (1, 8, 32, 64, 128)}
    assert serving_defaults("resnet152")["max_batch"] == 64
    assert serving_defaults("alexnet") == {
        "max_batch": 64, "buckets": (1, 8, 32, 64)}
    # the ladders are valid EngineConfig bucket sets
    from qcnn_tpu.serve.engine import EngineConfig

    for name in ("vit_l16", "resnet101", "resnet152", "alexnet"):
        d = serving_defaults(name)
        cfg = EngineConfig(max_batch=d["max_batch"], buckets=d["buckets"])
        ladder = cfg.bucket_ladder()
        assert ladder[-1] == d["max_batch"]


# ---------------------------------------------------------------------------
# pipelined dispatcher (round 4): assembly/upload stage -> compute stage
# ---------------------------------------------------------------------------

def _echo_engine(max_batch=4, max_wait_ms=2.0):
    """Stub engine whose forward returns each row's mean — results reveal
    exactly which image filled each batch slot (reused-buffer leaks and
    stale pad rows would corrupt them)."""
    from tools.engine_inproc_bench import make_stub_engine

    eng = make_stub_engine(
        EngineConfig(max_batch=max_batch, max_wait_ms=max_wait_ms),
        (5, 5, 2), 1, lambda b: 0.0,
    )
    eng._fwd = lambda params, x: np.asarray(x).reshape(x.shape[0], -1).mean(
        axis=1, keepdims=True)
    return eng


def test_pipeline_buffer_reuse_no_stale_rows():
    """A fuller batch then a smaller one through the same reused upload
    buffer: every request gets ITS image's result, and the smaller batch
    is not polluted by the previous batch's rows."""
    eng = _echo_engine()
    with eng:
        for wave, vals in enumerate(([1.0, 2.0, 3.0, 4.0], [5.0, 6.0])):
            imgs = [np.full((5, 5, 2), v, np.float32) for v in vals]
            futs = [eng.submit(im) for im in imgs]
            got = [float(f.result(timeout=30)[0]) for f in futs]
            assert got == pytest.approx(vals), (wave, got)


def test_stop_completes_or_fails_everything():
    """stop() leaves no hung futures: already-pipelined batches complete,
    anything still queued fails fast with RuntimeError."""
    eng = _echo_engine(max_batch=2, max_wait_ms=1.0)
    eng.start()
    futs = [eng.submit(np.full((5, 5, 2), float(i), np.float32))
            for i in range(32)]
    eng.stop()
    outcomes = []
    for f in futs:
        try:
            outcomes.append(float(f.result(timeout=5)[0]))
        except RuntimeError:
            outcomes.append(None)
    assert len(outcomes) == 32  # nothing hung past its timeout
    done_vals = [v for v in outcomes if v is not None]
    assert done_vals == sorted(done_vals)  # FIFO order preserved


def test_striped_assembly_preserves_slot_contents(rng):
    """Round-5 parallel assembly (KERNEL_STUDIES §12d): the per-image
    copy stripes across a worker pool. Force a multi-stripe geometry —
    big batches, several workers — regardless of the host's core count
    and verify every future resolves to ITS image's value (a stripe
    bounds bug or a worker writing the wrong rows would corrupt them;
    a worker exception must propagate, not hang)."""
    eng = _echo_engine(max_batch=64, max_wait_ms=5.0)
    eng._asm_workers = 4  # stripes at n >= 8 regardless of host cores
    n = 192
    vals = rng.permutation(np.arange(1.0, n + 1.0)).astype(np.float32)
    with eng:
        futs = [eng.submit(np.full((5, 5, 2), v, np.float32))
                for v in vals]
        got = [float(f.result(timeout=60)[0]) for f in futs]
        # the striped path really engaged (not the serial fallback)
        assert eng._asm_pool is not None
    assert got == pytest.approx(list(vals))
    assert eng.stats["requests"] == n


def test_pipeline_stress_no_cross_batch_corruption(rng):
    """Race catcher for the pipelined dispatcher (the round-4 review found
    upload-buffer aliasing could corrupt an in-flight batch): hundreds of
    requests with unique payloads through varying batch sizes, every
    future must resolve to ITS image's mean — any buffer-reuse race or
    slot-accounting bug shows up as a mismatched value or a hang."""
    import concurrent.futures as cf

    eng = _echo_engine(max_batch=8, max_wait_ms=1.0)
    n = 400
    vals = rng.permutation(np.arange(1.0, n + 1.0)).astype(np.float32)
    with eng:
        with cf.ThreadPoolExecutor(4) as pool:
            def one(v):
                img = np.full((5, 5, 2), v, np.float32)
                return float(eng.submit(img).result(timeout=60)[0])

            got = list(pool.map(one, vals))
    assert got == pytest.approx(list(vals))
    assert eng.stats["requests"] == n
