#!/usr/bin/env python
"""In-process BatchingEngine ceiling (round-4 verdict item 5).

KERNEL_STUDIES §12's "≈11k img/s/chip if the engine were device-local" was
an extrapolation. This measures the real engine machinery — queue,
dispatcher thread, bucket padding, future resolution — as a closed-loop
in-process benchmark, with three forward backends:

  zero-cost stub   the machinery's own ceiling (no compute at all)
  device-model     a stub that sleeps the chip's measured per-batch step
                   time — the device-local-equivalent row (on this rig the
                   tunnel's ~30 ms RTT fetch + 12-16 MB/s upload corrupt
                   any real-chip in-process number, and block_until_ready
                   does not fence, utils/devtime.py)
  real chip        the honest tunneled number, for reference

The per-batch step time fed to the device-model comes from devtime on the
engine's own bucket shape. `--step-ms` overrides it (e.g. to model a
faster kernel or another model family).

    timeout 1500 python tools/engine_inproc_bench.py [--step-ms 2.0]
    python tools/engine_inproc_bench.py --stub-only   # no chip needed
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def closed_loop(engine, image, n_requests: int, inflight: int,
                feeders: int = 1) -> dict:
    """Drive the engine closed-loop: keep `inflight` requests outstanding
    until n_requests complete; return throughput + latency stats.

    Driver caveat (measured): the feeder round-trips are GIL-coupled to
    the engine's compute thread (done-callbacks run inline in set_result),
    so the closed loop under-measures the engine — one feeder caps near
    2k req/s and MORE feeders thrash worse (8 feeders: 570 img/s). The
    engine's own ceiling is the `drain` measurement below; the closed
    loop is kept as the realistic single-client view."""
    lat: list[float] = []
    lock = threading.Lock()

    def feeder(n: int, k: int):
        done = threading.Semaphore(0)
        submitted = [0]

        def submit_one():
            t0 = time.perf_counter()
            fut = engine.submit(image)

            def cb(f):
                with lock:
                    lat.append(time.perf_counter() - t0)
                done.release()

            fut.add_done_callback(cb)

        for _ in range(min(k, n)):
            submit_one()
            submitted[0] += 1
        completed = 0
        while completed < n:
            done.acquire()
            completed += 1
            if submitted[0] < n:
                submit_one()
                submitted[0] += 1

    per = n_requests // feeders
    counts = [per + (1 if i < n_requests % feeders else 0)
              for i in range(feeders)]
    k = max(1, inflight // feeders)
    threads = [threading.Thread(target=feeder, args=(n, k), daemon=True)
               for n in counts if n]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t_start
    arr = np.asarray(lat) * 1e3
    return {
        "img_per_s": n_requests / dt,
        "p50_ms": float(np.percentile(arr, 50)),
        "p99_ms": float(np.percentile(arr, 99)),
        "batches": engine.stats["batches"],
        "mean_batch": engine.stats["requests"] / max(
            engine.stats["batches"], 1),
        "padded_waste": engine.stats["padded_waste"],
    }


def drain(engine, image, n_requests: int) -> dict:
    """Pure engine machinery rate: pre-submit n_requests into the queue
    of a NOT-YET-STARTED engine, then start it and time the drain. No
    feeder coupling — this is the dispatcher+compute pipeline's own
    ceiling (assembly, upload, forward, future resolution)."""
    futs = [engine.submit(image) for _ in range(n_requests)]
    t0 = time.perf_counter()
    engine.start()
    for f in futs:
        f.result(timeout=600)
    dt = time.perf_counter() - t0
    return {
        "img_per_s": n_requests / dt,
        "p50_ms": float("nan"),
        "p99_ms": float("nan"),
        "batches": engine.stats["batches"],
        "mean_batch": engine.stats["requests"] / max(
            engine.stats["batches"], 1),
        "padded_waste": engine.stats["padded_waste"],
    }


def make_stub_engine(config, shape, n_classes: int, step_s_of_bucket):
    """A BatchingEngine whose forward is a host stub: sleeps the modeled
    per-bucket step time and returns canned probabilities. Exercises the
    REAL dispatcher/bucket/future machinery end to end."""
    from qcnn_tpu.serve.engine import BatchingEngine

    eng = BatchingEngine.__new__(BatchingEngine)
    eng.spec = type("S", (), dict(zip(
        ("in_height", "in_width", "in_channels"), shape)))()
    eng.config = config
    eng._buckets = config.bucket_ladder()
    eng._upload_dtype = np.float32

    canned = {}

    def fwd(params, x):
        b = x.shape[0]
        dt = step_s_of_bucket(b)
        if dt and dt > 0:
            time.sleep(dt)
        if b not in canned:
            canned[b] = np.zeros((b, n_classes), np.float32)
        return canned[b]

    eng.params = None
    eng._fwd = fwd
    # the seam engine.py:_to_device documents: identity, so the stub rows
    # measure the machinery, not a backend upload (without this, a live
    # axon/TPU backend ships every 39 MB stub batch through the tunnel
    # and the 'machinery ceiling' is silently transport-bound)
    eng._to_device = lambda images: images
    eng._init_runtime()
    return eng


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=4000)
    ap.add_argument("--inflight", type=int, default=256)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--step-ms", type=float, default=0.0,
                    help="override the device-model per-max_batch step time")
    ap.add_argument("--stub-only", action="store_true",
                    help="skip the real-chip rows (no TPU needed)")
    args = ap.parse_args()

    from qcnn_tpu.serve.engine import EngineConfig

    shape = (227, 227, 3)
    cfg = EngineConfig(max_batch=args.max_batch, max_wait_ms=2.0)
    rng = np.random.default_rng(0)
    image = rng.standard_normal(shape).astype(np.float32)

    rows = []

    # 1) machinery ceiling: zero-cost forward. The DRAIN row is the
    # engine's own rate (no feeder coupling); the closed-loop row is the
    # single-client view (GIL-coupled, under-measures — see closed_loop).
    eng0 = make_stub_engine(cfg, shape, 1000, lambda b: 0.0)
    r = drain(eng0, image, args.requests)
    eng0.stop()
    rows.append(("engine drain ceiling (zero-cost fwd)", r))
    eng0 = make_stub_engine(cfg, shape, 1000, lambda b: 0.0)
    with eng0:
        r = closed_loop(eng0, image, args.requests, args.inflight)
    rows.append(("closed loop, 1 feeder (zero-cost fwd)", r))

    # 2) device-local model: sleep the measured (or given) step time,
    # scaled per bucket by a simple linear-in-batch model anchored at the
    # max bucket (CNN steps are ~linear in batch at these sizes, §11)
    step_ms = args.step_ms
    spec = params = None
    if not args.stub_only:
        import jax
        import jax.numpy as jnp

        from qcnn_tpu.models import network, synth, zoo
        from qcnn_tpu.models.loader import load_alexnet_reference
        from qcnn_tpu.models.prepare import prepare_params
        from qcnn_tpu.utils.devtime import time_device_fn

        log(f"devices: {jax.devices()}")
        spec = zoo.alexnet()
        try:
            params = load_alexnet_reference(synthesize_missing=True).params
        except (FileNotFoundError, OSError):
            params = synth.random_pq_params(spec, seed=0)
        if not step_ms:
            # only measure when no --step-ms override was given; spec/
            # params are still built above for the real-chip section
            # (round-5 review: --step-ms without --stub-only crashed
            # with NameError after minutes of stub benchmarks)
            prep, ci, fi = prepare_params(spec, params,
                                          batch_hint=args.max_batch,
                                          dtype=jnp.bfloat16)
            prep = jax.device_put(prep)
            x = jnp.asarray(
                synth.random_input(spec, args.max_batch, seed=1),
                jnp.bfloat16)

            def step(x, p):
                return network.forward(p, x, spec=spec, conv_impls=ci,
                                       fc_impls=fi,
                                       compute_dtype=jnp.bfloat16)

            base = time_device_fn(
                lambda v, *_: v[(slice(0, 1),) * v.ndim], x, k1=4, k2=20)
            t = time_device_fn(step, x, prep, k1=4, k2=20) - base
            step_ms = t * 1e3
            log(f"measured AlexNet bf16 batch-{args.max_batch} step: "
                f"{step_ms:.3f} ms")
    if not step_ms:
        step_ms = 1.8  # documented §12-era default for --stub-only runs

    def model(b):
        # linear-in-batch with a fixed dispatch floor (batch-1 ≈ 0.3 ms)
        return (0.3 + (step_ms - 0.3) * b / args.max_batch) / 1e3

    eng1 = make_stub_engine(cfg, shape, 1000, model)
    r = drain(eng1, image, args.requests)
    eng1.stop()
    rows.append((f"engine drain, device-local model (step {step_ms:.2f} ms"
                 f" @{args.max_batch})", r))
    eng1 = make_stub_engine(cfg, shape, 1000, model)
    with eng1:
        r = closed_loop(eng1, image, args.requests, args.inflight)
    rows.append((f"closed loop, device-local model (step {step_ms:.2f} ms"
                 f" @{args.max_batch})", r))

    # 3) real chip through the tunnel (honest but transport-dominated)
    if not args.stub_only:
        from qcnn_tpu.serve.engine import BatchingEngine

        eng2 = BatchingEngine(spec, params, config=cfg,
                              compute_dtype=jnp.bfloat16)
        log("warming real-chip engine (all bucket programs) ...")
        eng2.warmup()
        with eng2:
            r = closed_loop(eng2, image, min(args.requests, 1000),
                            args.inflight)
        rows.append(("real chip via tunnel", r))

    print(f"{'backend':<44} {'img/s':>9} {'p50 ms':>8} {'p99 ms':>9} "
          f"{'avg batch':>9} {'batches':>8}")
    for name, r in rows:
        print(f"{name:<44} {r['img_per_s']:>9.1f} {r['p50_ms']:>8.1f} "
              f"{r['p99_ms']:>9.1f} {r['mean_batch']:>9.1f} "
              f"{r['batches']:>8d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
