"""Continuous-batching inference engine.

The reference processes one image per iteration in a synchronous loop
(CaffeEva.cc:167-210, kDataCntInBatch=1). The TPU-native serving shape is a
daemon that coalesces concurrent requests into device-sized batches:

- requests enqueue (image, Future) pairs from any thread;
- one dispatcher thread drains the queue, waiting at most `max_wait_ms` to
  fill up to `max_batch`;
- batches are padded UP to a fixed bucket ladder (1, 8, 32, ..., max_batch)
  so only len(buckets) programs are ever compiled — XLA recompiles per shape,
  and on the remote-TPU tunnel each compile costs tens of seconds;
- on a multi-device mesh the batch axis is sharded over `data` (see
  qcnn_tpu.parallel); a single-chip engine runs the plain jitted forward.

This is the single-host core. Multi-host continuous batching layers a
front-end router over per-host engines; the collective path is exercised by
parallel.make_sharded_forward and __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class _ShapeOnlySpec:
    """Minimal spec for from_forward engines (warmup/shape checks only)."""

    in_height: int
    in_width: int
    in_channels: int


class EngineOverloaded(RuntimeError):
    """Raised by submit() when the bounded request queue is full.

    Backpressure contract: the caller sheds load (HTTP layer maps this to
    503) instead of queueing unboundedly — queue growth past what the
    device can drain only converts overload into timeout storms."""


class DeadlineExceeded(RuntimeError):
    """Set on a request future whose deadline passed before dispatch.

    Expired requests are dropped at pop time, so a backlog never spends
    device batches computing answers nobody is waiting for."""


@dataclasses.dataclass
class EngineConfig:
    max_batch: int = 64
    max_wait_ms: float = 2.0
    buckets: Optional[tuple[int, ...]] = None  # default: 1,8,32,...,max_batch
    with_softmax: bool = True
    max_queue: int = 0        # 0 = unbounded; else submit() raises
                              # EngineOverloaded when this many are pending
    deadline_ms: float = 0.0  # 0 = none; default per-request deadline
                              # (submit(deadline_ms=...) overrides)

    def bucket_ladder(self) -> tuple[int, ...]:
        if self.buckets:
            return tuple(sorted(self.buckets))
        ladder = [1]
        b = 8
        while b < self.max_batch:
            ladder.append(b)
            b *= 4
        ladder.append(self.max_batch)
        return tuple(sorted(set(ladder)))


class BatchingEngine:
    """Coalesces classify requests into bucketed device batches."""

    @classmethod
    def from_forward(
        cls,
        forward_fn,
        params,
        input_shape: tuple[int, int, int],
        *,
        config: Optional[EngineConfig] = None,
        mesh=None,
        upload_dtype=None,
    ) -> "BatchingEngine":
        """Engine over an arbitrary jit-able forward(params, x_nhwc) — e.g.
        the ResNet/ViT families, whose params are nested pytrees rather than
        the linear ModelSpec list. With a mesh, batches shard over `data`.

        upload_dtype: host-side batch cast before device upload (pass
        ml_dtypes.bfloat16 when forward_fn casts to bf16 anyway — halves
        the host->device stream, the serving bottleneck on tunneled rigs).
        """
        import jax

        self = cls.__new__(cls)
        self.spec = _ShapeOnlySpec(*input_shape)
        # default built per call: a shared module-level EngineConfig()
        # default is one mutable object across every engine (round-5
        # review — the classic mutable-default pitfall)
        config = config if config is not None else EngineConfig()
        self.config = config
        self._buckets = config.bucket_ladder()
        self._upload_dtype = (
            np.float32 if upload_dtype is None else upload_dtype
        )
        self.params = jax.device_put(params)
        if mesh is not None:
            from qcnn_tpu.parallel.sharding import make_dp_forward

            self._fwd = make_dp_forward(forward_fn, mesh)
        else:
            self._fwd = jax.jit(forward_fn)
        self._init_runtime()
        return self

    def _init_runtime(self) -> None:
        self._queue: queue.Queue = queue.Queue(
            maxsize=self.config.max_queue or 0
        )
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {"requests": 0, "batches": 0, "padded_waste": 0,
                      "rejected": 0, "expired": 0,
                      # cumulative per-stage wall time (ms) — names the
                      # pipeline's current bind instead of guessing
                      # (§12d's residual question); pop/claim/assemble/
                      # upload accrue on the dispatcher thread, forward/
                      # resolve on the compute thread
                      "stage_ms": {"pop": 0.0, "slot_wait": 0.0,
                                   "assemble": 0.0, "upload": 0.0,
                                   "forward": 0.0, "resolve": 0.0}}
        self._latencies_ms: list[float] = []  # dispatch->result, recent
        # (bucket, rotation-slot) -> buffer; see _assemble/_BUF_ROT
        self._upload_bufs: dict[tuple[int, int], np.ndarray] = {}
        # assembly -> compute pipeline: the dispatcher thread pops/
        # assembles/uploads batch N+1 while the compute thread runs the
        # forward for batch N — host-side batch formation (~6 ms/64 at
        # 39 MB) and the tunnel upload overlap device compute instead of
        # serializing with it (measured in tools/engine_inproc_bench.py).
        # _slots bounds LIVE batches to _BUF_ROT (one computing + one
        # assembling): the compute stage releases a slot when a batch's
        # forward has finished, which is when its upload buffer — aliased
        # by jnp.asarray on the CPU backend, pinned by PJRT mid-transfer
        # elsewhere — is provably safe to overwrite. Cycling MORE buffers
        # instead measured 2-6x slower on the drain bench (three 39 MB
        # buffers thrash the host cache); two is the minimum that keeps
        # the overlap and the fastest measured.
        self._compute_q: queue.Queue = queue.Queue()
        self._slots = threading.BoundedSemaphore(self._BUF_ROT)
        self._compute_thread: Optional[threading.Thread] = None
        # parallel batch assembly (round-5; §12c named this the device-
        # local bind): the per-image copy into the upload buffer stripes
        # across a small pool. Batch FORMATION stays FIFO on the single
        # dispatcher thread; only the copy fans out, and the 2-slot
        # safety invariant is untouched (workers write disjoint rows of
        # the slot's own buffer, joined before the upload). NumPy
        # releases the GIL for these block copies, so the stripes run on
        # real cores. Pool size: leave a core each for the dispatcher
        # and compute threads.
        import os as _os

        self._asm_workers = max(1, min(8, (_os.cpu_count() or 2) - 1))
        self._asm_pool = None  # built lazily on first striped assembly

    def __init__(
        self,
        spec,
        params: Sequence[Optional[dict]],
        *,
        config: Optional[EngineConfig] = None,
        mesh=None,
        compute_dtype=None,
        act_scales: Optional[dict] = None,
        conv_impl: str = "auto",
        fc_impl: str = "auto",
    ) -> None:
        import jax
        import jax.numpy as jnp

        from qcnn_tpu.models import make_forward_fn
        from qcnn_tpu.models.prepare import prepare_params

        self.spec = spec
        config = config if config is not None else EngineConfig()
        self.config = config
        self._buckets = config.bucket_ladder()
        if compute_dtype is None:
            compute_dtype = (
                jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32
            )
        from qcnn_tpu.models.prepare import act_dtype_for

        act_dtype = act_dtype_for(compute_dtype)
        # Cast batches to the activation dtype on the HOST before upload:
        # the forward's first op is that exact cast anyway, and on a
        # tunneled rig the host->device stream is the serving bottleneck
        # (measured: 64x227x227x3 f32 = 39 MB/batch capped throughput at
        # ~27 req/s; bf16 halves the bytes).
        import ml_dtypes

        self._upload_dtype = (
            ml_dtypes.bfloat16 if act_dtype in (jnp.bfloat16, "bfloat16")
            else np.float32
        )
        prepared, conv_impls, fc_impls = prepare_params(
            spec, params, dtype=compute_dtype, act_scales=act_scales,
            conv_impl=conv_impl, fc_impl=fc_impl,
            batch_hint=config.max_batch,
        )
        if mesh is not None:
            from qcnn_tpu.parallel import shard_params
            from qcnn_tpu.parallel.sharding import make_sharded_forward

            self.params = shard_params(spec, prepared, mesh)
            # pass the RESOLVED strategies + activation dtype (round-5
            # review: omitting them silently re-resolved 'auto' against
            # memory-prepared params — the jnp.take_along_axis decode
            # path, ~300x off roofline — and lost bf16 activation casts)
            self._fwd = make_sharded_forward(
                spec, mesh, with_softmax=config.with_softmax,
                conv_impls=conv_impls, fc_impls=fc_impls,
                compute_dtype=act_dtype,
            )
        else:
            self.params = jax.device_put(prepared)
            self._fwd = make_forward_fn(
                spec,
                conv_impls=conv_impls,
                fc_impls=fc_impls,
                compute_dtype=act_dtype,
                with_softmax=config.with_softmax,
            )
        self._init_runtime()

    def latency_percentiles(self) -> dict:
        """Per-batch COMPUTE-stage latency (forward + result resolution).
        Since the round-4 pipelined dispatcher, the host->device upload
        runs in the assembly stage and is NOT in these numbers; end-to-end
        request latency is the HTTP layer's to measure."""
        if not self._latencies_ms:
            return {}
        arr = np.asarray(self._latencies_ms[-1000:])
        return {
            "p50_ms": round(float(np.percentile(arr, 50)), 3),
            "p95_ms": round(float(np.percentile(arr, 95)), 3),
            "p99_ms": round(float(np.percentile(arr, 99)), 3),
        }

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "BatchingEngine":
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="qcnn-dispatch", daemon=True
        )
        self._compute_thread = threading.Thread(
            target=self._compute_loop, name="qcnn-compute", daemon=True
        )
        self._compute_thread.start()
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self._compute_thread is not None:
            # sentinel AFTER the dispatcher joined: already-uploaded
            # batches complete (the device work is paid), then exit
            try:
                self._compute_q.put(None, timeout=60)
            except queue.Full:
                pass  # compute stage wedged; it is a daemon thread
            self._compute_thread.join(timeout=60)
            if not self._compute_thread.is_alive():
                # fail anything still in the pipeline so callers don't
                # hang for their full classify() timeout
                while True:
                    try:
                        item = self._compute_q.get_nowait()
                    except queue.Empty:
                        break
                    if item is None:
                        continue
                    for fut in item[1]:
                        if not fut.done():
                            fut.set_exception(RuntimeError("engine stopped"))
        # Requests enqueued just before stop would otherwise hang their
        # callers until the full classify() timeout.
        self._drain_stopped()
        # final sweep: a dispatcher that survived its join timeout (e.g.
        # stuck in a slow tunnel upload) may have enqueued one more batch
        # after the compute-queue drain above — fail it rather than
        # orphan it (the dispatcher also checks compute-thread liveness
        # before putting; together these close the stop() race)
        while True:
            try:
                item = self._compute_q.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            for fut in item[1]:
                if not fut.done():
                    fut.set_exception(RuntimeError("engine stopped"))
        if self._asm_pool is not None:
            self._asm_pool.shutdown(wait=False)
            self._asm_pool = None

    def _drain_stopped(self) -> None:
        while True:
            try:
                _, fut, _ = self._queue.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("engine stopped"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- client API --------------------------------------------------------

    def submit(
        self,
        image_nhwc: np.ndarray,
        *,
        deadline_ms: Optional[float] = None,
    ) -> Future:
        """Enqueue one (H, W, C) image; resolves to a (num_classes,) probs
        vector. Raises EngineOverloaded when the bounded queue is full;
        the future fails with DeadlineExceeded if `deadline_ms` (default:
        config.deadline_ms) passes before dispatch."""
        if image_nhwc.ndim != 3:
            raise ValueError(f"expected HWC image, got {image_nhwc.shape}")
        want = (self.spec.in_height, self.spec.in_width,
                self.spec.in_channels)
        if tuple(image_nhwc.shape) != want:
            # reject HERE, not in the dispatcher: a mis-shaped image inside
            # a batch would raise in np.stack and kill the dispatch thread
            # (one bad request = total engine DoS)
            raise ValueError(
                f"expected image shape {want}, got {tuple(image_nhwc.shape)}"
            )
        if self._stop.is_set():
            raise RuntimeError("engine is stopped")
        if deadline_ms is None:
            deadline_ms = self.config.deadline_ms
        expiry = (
            time.perf_counter() + deadline_ms / 1e3 if deadline_ms else None
        )
        fut: Future = Future()
        try:
            # cast to the UPLOAD dtype here, on the caller's thread: each
            # HTTP/client worker pays its own request's conversion, so the
            # cast parallelizes with client concurrency by construction
            # and the assembly stripes copy same-dtype rows (half the
            # bytes for bf16 engines). Numerically identical to the old
            # f32-then-bf16 two-step: bf16(f32(v)) == bf16(v).
            self._queue.put_nowait(
                (np.ascontiguousarray(image_nhwc, self._upload_dtype),
                 fut, expiry)
            )
        except queue.Full:
            with self._stats_lock:
                # submit() runs on many HTTP threads concurrently; an
                # unguarded += loses counts exactly when overload makes
                # 'rejected' matter (round-5 review). The other counters
                # are single-writer (dispatcher or compute thread).
                self.stats["rejected"] += 1
            raise EngineOverloaded(
                f"request queue full ({self.config.max_queue} pending)"
            ) from None
        if self._stop.is_set():
            # stop() may have drained the queue between our check above and
            # the put: fail anything still queued so no caller hangs for
            # its full timeout
            self._drain_stopped()
        return fut

    def classify(self, image_nhwc: np.ndarray, timeout: float = 600.0,
                 *, deadline_ms: Optional[float] = None):
        return self.submit(image_nhwc, deadline_ms=deadline_ms).result(
            timeout=timeout
        )

    def warmup(self) -> None:
        """Compile every bucket program up front (one dummy run each)."""
        import jax.numpy as jnp

        h, w, c = self.spec.in_height, self.spec.in_width, self.spec.in_channels
        for b in self._buckets:
            # same dtype as dispatch uploads — a mismatch would compile a
            # second program per bucket at first real request
            x = jnp.zeros((b, h, w, c), jnp.dtype(self._upload_dtype))
            np.asarray(self._fwd(self.params, x))

    # -- dispatcher --------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def _pop_live(self, timeout: float):
        """Pop the next request whose deadline has not passed; expired ones
        fail with DeadlineExceeded instead of wasting a batch slot.

        Fast path: drain with get_nowait while the queue is non-empty —
        under load the backlog is deep, and the timed get's lock +
        clock bookkeeping per request is measurable at 20k+ img/s."""
        t_end = None
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                if t_end is None:
                    t_end = time.perf_counter() + timeout
                remaining = t_end - time.perf_counter()
                if remaining <= 0:
                    raise
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    raise
            expiry = item[2]
            if expiry is not None and time.perf_counter() > expiry:
                self.stats["expired"] += 1
                if not item[1].done():
                    item[1].set_exception(
                        DeadlineExceeded("deadline passed before dispatch")
                    )
                continue
            return item

    # distinct upload buffers per bucket. jnp.asarray does NOT copy a
    # host buffer synchronously — the CPU backend aliases numpy memory
    # outright, and PJRT transfers require the buffer valid until done —
    # so a buffer may only be reused once its batch's compute finished
    # (compute forces the transfer). _slots in _init_runtime caps live
    # batches at _BUF_ROT; a slot is released only after the forward, so
    # slot k's buffer can never be overwritten while still readable.
    _BUF_ROT = 2

    def _assemble(self, batch):
        """Single-pass batch assembly into a ROTATED per-bucket upload
        buffer: each image is written (and dtype-cast) exactly once, pad
        rows zero in place. The previous stack -> astype -> concatenate
        pipeline made three full passes over the batch with fresh 39 MB
        allocations per dispatch (page-fault-bound: measured ~85 ms per
        64-batch on this host) and capped the dispatcher at ~420 img/s
        with a zero-cost forward (tools/engine_inproc_bench.py,
        KERNEL_STUDIES §12b)."""
        n = len(batch)
        bucket = self._bucket_for(n)
        self._buf_cycle = (getattr(self, "_buf_cycle", 0) + 1)
        key = (bucket, self._buf_cycle % self._BUF_ROT)
        buf = self._upload_bufs.get(key)
        if buf is None:
            buf = np.empty(
                (bucket, self.spec.in_height, self.spec.in_width,
                 self.spec.in_channels),
                self._upload_dtype,
            )
            self._upload_bufs[key] = buf
        # striped parallel copy: worker w owns rows [lo, hi) — disjoint
        # writes, joined below, so the slot buffer is fully written
        # before the upload reads it. Capture the pool ONCE and fall back
        # to the serial copy if it is gone or shut down (round-5 review:
        # stop() can null/shutdown the pool while a dispatcher stuck in a
        # long upload is still alive; a post-shutdown submit would raise
        # out of _assemble with the slot held and the batch unresolved —
        # and lazily rebuilding after stop would leak worker threads)
        pool = self._asm_pool
        if (pool is None and n >= 2 * self._asm_workers > 2
                and not self._stop.is_set()):
            from concurrent.futures import ThreadPoolExecutor

            pool = self._asm_pool = ThreadPoolExecutor(
                max_workers=self._asm_workers,
                thread_name_prefix="qcnn-asm",
            )

        # copy through BYTE views: ml_dtypes.bfloat16 is a user dtype
        # whose same-dtype copies take NumPy's custom-dtype path —
        # measured SLOWER than the f32 memcpy despite half the bytes,
        # and GIL-holding, which also defeats the stripe parallelism
        # (tools/out/asm_parallel_ab3.txt). uint8 views of the same
        # memory copy at memcpy speed; submit() guarantees contiguous
        # same-dtype rows.
        bview = buf.view(np.uint8)

        def copy_row(i: int) -> None:
            src = batch[i][0]
            if src.dtype == buf.dtype and src.flags.c_contiguous:
                bview[i] = src.view(np.uint8)
            else:  # foreign dtype slipped in: let NumPy cast
                buf[i] = src

        stripes = None
        if pool is not None and n >= 2 * self._asm_workers > 2:

            def copy_rows(lo: int, hi: int) -> None:
                for i in range(lo, hi):
                    copy_row(i)

            chunk = -(-n // self._asm_workers)
            try:
                stripes = [
                    pool.submit(copy_rows, lo, min(lo + chunk, n))
                    for lo in range(0, n, chunk)
                ]
            except RuntimeError:  # pool shut down mid-batch: go serial
                stripes = None
        if stripes is not None:
            for st in stripes:
                st.result()  # join + re-raise worker exceptions
        else:
            for i in range(n):
                copy_row(i)
        if bucket > n:
            # stale rows from a previous, fuller batch must not leak into
            # this dispatch (padding rows are sliced off the results, but
            # keep them zero so padded compute is deterministic)
            buf[n:] = 0
        return buf, n, bucket

    def _to_device(self, images: np.ndarray):
        """Host batch -> device array (the upload). A seam for harnesses
        that model device-local serving (tools/engine_inproc_bench.py):
        on tunneled rigs the upload dominates every in-process measurement,
        so the bench overrides this to isolate the engine machinery."""
        import jax.numpy as jnp

        return jnp.asarray(images)

    def _dispatch_loop(self) -> None:
        cfg = self.config
        stage = self.stats["stage_ms"]
        while not self._stop.is_set():
            try:
                first = self._pop_live(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = cfg.max_wait_ms / 1e3
            t0 = time.perf_counter()
            # never exceed the largest bucket: with user-supplied buckets
            # below max_batch, an oversized batch would ship UNPADDED at an
            # arbitrary (never-warmed) shape — a remote recompile per burst
            max_n = min(cfg.max_batch, self._buckets[-1])
            while len(batch) < max_n:
                remaining = deadline - (time.perf_counter() - t0)
                if remaining <= 0:
                    break
                try:
                    batch.append(self._pop_live(timeout=remaining))
                except queue.Empty:
                    break
            # claim each future (RUNNING state): client-side fut.cancel()
            # is honoured here, and a claimed future can no longer be
            # cancelled — so set_result below cannot raise InvalidStateError
            # (which would poison the rest of the batch via the except arm)
            batch = [b for b in batch if b[1].set_running_or_notify_cancel()]
            if not batch:
                continue
            t_claim = time.perf_counter()
            stage["pop"] += (t_claim - t0) * 1e3
            # abortable slot acquire (the pipeline-depth bound; released
            # by the compute stage after the forward): a wedged compute
            # stage — e.g. a first forward still compiling, minutes on
            # the tunnel — must not leave the dispatcher, and therefore
            # stop(), blocked forever; on stop, fail this batch's callers
            # instead of hanging them
            while not self._slots.acquire(timeout=0.1):
                if self._stop.is_set():
                    for _, fut, _ in batch:
                        if not fut.done():
                            fut.set_exception(RuntimeError("engine stopped"))
                    batch = None
                    break
            t_pop = time.perf_counter()
            # the back-pressure wait is its OWN stage (round-5 review:
            # folding it into 'pop' mis-named the bind whenever compute
            # was the bottleneck — e.g. a first forward compiling for
            # minutes accrued under pop while 'forward' stayed ~0)
            stage["slot_wait"] += (t_pop - t_claim) * 1e3
            if batch is None:
                continue
            images, n, bucket = self._assemble(batch)
            t_asm = time.perf_counter()
            stage["assemble"] += (t_asm - t_pop) * 1e3
            futures = [b[1] for b in batch]
            try:
                # the upload happens HERE, on the assembly thread, so it
                # overlaps the compute thread's forward for the previous
                # batch (on tunneled rigs the upload IS the bottleneck)
                dev_images = self._to_device(images)
            except Exception as e:  # noqa: BLE001 - propagate to callers
                self._slots.release()
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            stage["upload"] += (time.perf_counter() - t_asm) * 1e3
            if (self._stop.is_set()
                    and self._compute_thread is not None
                    and not self._compute_thread.is_alive()):
                # stop() already joined/drained the compute stage while we
                # were stuck in a slow upload (round-5 review): putting
                # now would orphan the batch in a queue nobody reads and
                # hang each caller for its full classify() timeout
                self._slots.release()
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(RuntimeError("engine stopped"))
                continue
            self._compute_q.put((dev_images, futures, n, bucket))

    def _compute_loop(self) -> None:
        """Second pipeline stage: run the forward on pre-uploaded batches
        and resolve futures. Exits on the stop() sentinel so batches that
        were already assembled/uploaded still complete."""
        while True:
            item = self._compute_q.get()
            if item is None:
                return
            dev_images, futures, n, bucket = item
            stage = self.stats["stage_ms"]
            t_dispatch = time.perf_counter()
            try:
                try:
                    probs = np.asarray(self._fwd(self.params, dev_images))
                finally:
                    # forward finished (or failed): dev_images — which may
                    # alias its upload buffer on the CPU backend — is no
                    # longer read; hand the buffer slot back to the
                    # assembler (a leaked slot would stall the pipeline)
                    del dev_images
                    self._slots.release()
                t_fwd = time.perf_counter()
                stage["forward"] += (t_fwd - t_dispatch) * 1e3
                for i, fut in enumerate(futures):
                    fut.set_result(probs[i])
                stage["resolve"] += (time.perf_counter() - t_fwd) * 1e3
            except Exception as e:  # noqa: BLE001 - propagate to callers
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)
            self._latencies_ms.append(
                (time.perf_counter() - t_dispatch) * 1e3
            )
            if len(self._latencies_ms) > 4000:
                del self._latencies_ms[:2000]
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["padded_waste"] += bucket - n
