#!/usr/bin/env python
"""Serving load benchmark: offered-load sweep through the BatchingEngine.

Open-loop load generator (requests fired on a fixed schedule regardless of
completions — closed-loop generators hide queueing collapse) against the
real engine on the real chip: AlexNet-PQ, reference weights, bucket-ladder
coalescing. Reports achieved throughput and end-to-end latency percentiles
per offered rate. Results: docs/KERNEL_STUDIES.md §12.

NOTE on this rig: every dispatched batch pays the ~30 ms tunnel RTT for
its result fetch, so the ceiling here is batches/s x max_batch; on a local
TPU the same engine would be bounded by the ~ms device step instead.

    timeout 3000 python tools/serve_loadbench.py [--rates 200 500 1000 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_rate(engine, images, rate: float, duration_s: float) -> dict:
    """Fire `rate` req/s for duration_s; return achieved stats."""
    latencies: list[float] = []
    errors = [0]
    lock = threading.Lock()
    futures = []
    # cap the request count: at saturated offered rates an uncapped
    # open-loop run builds a backlog that takes tens of minutes to drain
    n = min(int(rate * duration_s), 1500)
    interval = 1.0 / rate
    t0 = time.perf_counter()
    for i in range(n):
        target = t0 + i * interval
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        img = images[i % len(images)]
        t_sub = time.perf_counter()
        try:
            fut = engine.submit(img)
        except Exception:  # noqa: BLE001 - overload counts as an error
            with lock:
                errors[0] += 1
            continue
        futures.append((t_sub, fut))
    for t_sub, fut in futures:
        try:
            fut.result(timeout=120)
            latencies.append(time.perf_counter() - t_sub)
        except Exception:  # noqa: BLE001
            errors[0] += 1
    wall = time.perf_counter() - t0
    lat = np.asarray(sorted(latencies))
    pct = (
        {q: float(lat[min(len(lat) - 1, int(q / 100 * len(lat)))]) * 1e3
         for q in (50, 95, 99)}
        if len(lat) else {}
    )
    return {
        "offered_rps": rate,
        "achieved_rps": len(latencies) / wall,
        "errors": errors[0],
        "p50_ms": pct.get(50), "p95_ms": pct.get(95), "p99_ms": pct.get(99),
    }


def run_rate_http(url: str, images, rate: float, duration_s: float) -> dict:
    """Open-loop load via HTTP POST /classify (X-Shape raw tensors) — the
    multi-host path: router -> per-host engines (VERDICT r2 item 8)."""
    import concurrent.futures as cf
    import urllib.request

    latencies: list[float] = []
    errors = [0]
    n = min(int(rate * duration_s), 1500)
    interval = 1.0 / rate

    def one(img) -> float:
        t_sub = time.perf_counter()
        body = np.ascontiguousarray(img, np.float32).tobytes()
        req = urllib.request.Request(
            url + "/classify", data=body, method="POST",
            headers={"X-Shape": ",".join(str(v) for v in img.shape)},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            resp.read()
        return time.perf_counter() - t_sub

    futs = []
    with cf.ThreadPoolExecutor(max_workers=256) as pool:
        t0 = time.perf_counter()
        for i in range(n):
            target = t0 + i * interval
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
            futs.append(pool.submit(one, images[i % len(images)]))
        for f in futs:
            try:
                latencies.append(f.result())
            except Exception:  # noqa: BLE001 - 503/504 count as errors
                errors[0] += 1
        wall = time.perf_counter() - t0
    lat = np.asarray(sorted(latencies))
    pct = (
        {q: float(lat[min(len(lat) - 1, int(q / 100 * len(lat)))]) * 1e3
         for q in (50, 95, 99)}
        if len(lat) else {}
    )
    return {
        "offered_rps": rate,
        "achieved_rps": len(latencies) / wall,
        "errors": errors[0],
        "p50_ms": pct.get(50), "p95_ms": pct.get(95), "p99_ms": pct.get(99),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", type=float, nargs="+",
                    default=[200, 500, 1000, 2000, 4000])
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--router", type=int, default=0, metavar="N",
                    help="drive the load through the HTTP router over N "
                         "backend engines (multi-host serving layout; on "
                         "this rig the engines share the one chip)")
    args = ap.parse_args()

    from qcnn_tpu.eval.harness import Classifier
    from qcnn_tpu.serve.engine import BatchingEngine, EngineConfig

    clf = Classifier.from_reference("alexnet", "/root/reference")
    if args.router:
        from qcnn_tpu.serve.http import serve
        from qcnn_tpu.serve.router import serve_router

        engines, urls = [], []
        for i in range(args.router):
            eng = BatchingEngine(
                clf.spec, clf.raw_params,
                config=EngineConfig(max_batch=args.max_batch,
                                    max_wait_ms=2.0),
            ).start()
            port = 18100 + i
            serve(eng, port=port, block=False)
            engines.append(eng)
            urls.append(f"http://127.0.0.1:{port}")
        router_url = "http://127.0.0.1:18080"
        serve_router(urls, port=18080, block=False)
        print(f"router over {args.router} engines: {urls}",
              file=sys.stderr, flush=True)
        rng = np.random.default_rng(0)
        images = [
            rng.standard_normal((227, 227, 3)).astype(np.float32)
            for _ in range(32)
        ]
        for eng in engines:
            eng.warmup()
        # settle end-to-end through the router once
        run_rate_http(router_url, images, 2.0, 1.0)
        print(f"{'offered':>8} {'achieved':>9} {'err':>5} "
              f"{'p50ms':>8} {'p95ms':>8} {'p99ms':>8}")
        for rate in args.rates:
            r = run_rate_http(router_url, images, rate, args.duration)
            print(f"{r['offered_rps']:>8.0f} {r['achieved_rps']:>9.1f} "
                  f"{r['errors']:>5d} "
                  f"{(r['p50_ms'] or -1):>8.1f} "
                  f"{(r['p95_ms'] or -1):>8.1f} "
                  f"{(r['p99_ms'] or -1):>8.1f}", flush=True)
        for eng in engines:
            eng.stop()
        return 0
    engine = BatchingEngine(
        clf.spec, clf.raw_params,
        config=EngineConfig(max_batch=args.max_batch, max_wait_ms=2.0),
    ).start()
    print("warming up bucket programs...", file=sys.stderr, flush=True)
    engine.warmup()

    rng = np.random.default_rng(0)
    images = [
        rng.standard_normal((227, 227, 3)).astype(np.float32)
        for _ in range(32)
    ]
    # settle: one classified request end-to-end
    engine.classify(images[0], timeout=600)

    print(f"{'offered':>8} {'achieved':>9} {'err':>5} "
          f"{'p50ms':>8} {'p95ms':>8} {'p99ms':>8}")
    for rate in args.rates:
        r = run_rate(engine, images, rate, args.duration)
        print(f"{r['offered_rps']:>8.0f} {r['achieved_rps']:>9.1f} "
              f"{r['errors']:>5d} "
              f"{(r['p50_ms'] or -1):>8.1f} {(r['p95_ms'] or -1):>8.1f} "
              f"{(r['p99_ms'] or -1):>8.1f}", flush=True)
    engine.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
