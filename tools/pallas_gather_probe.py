#!/usr/bin/env python
"""Probe: which in-kernel dynamic-gather shapes compile on this toolchain?

PQ decode is a gather W_T[o, s] = cb[A[o, s] * D + d, s] — per-element
table lookup, Mosaic `tpu.dynamic_gather`. Four constraints measured here
(v5e, jax 0.9.0 — see ops/pallas/_common.py for the distilled list):

  1. the index block must have the SAME 2-D shape as the table block
     (bare assert in jax's _gather_lowering_rule — the round-2 probe
     gathered 8192 rows from a (k, 128) table and died with an empty
     AssertionError);
  2. index bitwidth must equal table element bitwidth;
  3. the table must fit ONE vreg along the gather dimension ("Multiple
     source vregs along gather dimension"): sublane gather => <= 8 rows
     (f32), lane gather => <= 128 lanes;
  4. sub-32-bit gathers lower to byte gathers, rejected on v5e ("Byte
     gather not supported by this TPU generation") — f32/i32 only.

The usable PQ shape is therefore the LANE gather: per-subspace 128-entry
codeword tables on lanes, one independent table row per sublane
(out[s, n] = table[s, A_T[s, n]]) — K <= 128 covers every PQ config.

Run on the real chip:  timeout 900 python tools/pallas_gather_probe.py
Results: docs/KERNEL_STUDIES.md §9c. Exits nonzero if any supported-matrix
case fails (expected-fail controls don't count).
"""

from __future__ import annotations

import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcnn_tpu.ops.pallas._common import gather_lanes, gather_rows


def _fmt_exc(e: BaseException) -> str:
    """One-line diagnostic; bare asserts have empty str() — fall back to
    repr + the last traceback frame (round-2 logs were blank). Mosaic
    errors bury the reason mid-text — surface it."""
    s = str(e)
    for marker in ("Mosaic failed to compile TPU kernel:",
                   "Not implemented:", "Internal:"):
        pos = s.find(marker)
        if pos >= 0:
            return s[pos:pos + 200].replace("\n", " | ")
    msg = s.replace("\n", " | ").strip()
    if not msg:
        frames = traceback.extract_tb(e.__traceback__)
        last = frames[-1] if frames else None
        where = f" at {last.filename}:{last.lineno}" if last else ""
        msg = repr(e) + where
    return msg[:300]


def _kernel(table_ref, idx_ref, out_ref, *, mode, out_dtype):
    if mode == "lanes":
        got = gather_lanes(table_ref[:], idx_ref[:])
    else:
        got = gather_rows(table_ref[:], idx_ref[:])
    out_ref[:] = got.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("mode", "n_tiles", "out_dtype", "interpret")
)
def gather_call(table, idx, mode, n_tiles=1, out_dtype=None,
                interpret=False):
    """Gather n_tiles (r, lanes) index blocks against one resident table
    block, mirroring how the decode kernels tile N."""
    r, lanes = table.shape
    out_dtype = out_dtype or table.dtype
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode, out_dtype=out_dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((r, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * r, lanes), out_dtype),
        interpret=interpret,
    )(table, idx)


def main():
    if "--cpu" in sys.argv:
        # the axon sitecustomize pins the TPU platform at interpreter
        # start; this is the documented override (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} interpret={interpret}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    lanes = 128
    failures = 0

    # (name, rows, value dtype, idx dtype, gather mode, out dtype,
    #  expect_ok). Lane gather rows = subspace-block sizes the PQ kernels
    # use; 'rows' mode r=8 is the only legal sublane-gather shape.
    cases = [
        ("rows f32/i32", 8, jnp.float32, jnp.int32, "rows",
         None, True),
        ("rows f32/i32", 128, jnp.float32, jnp.int32, "rows",
         None, False),  # constraint 3: >1 source vreg along sublanes
        ("rows bf16/i16", 8, jnp.bfloat16, jnp.int16, "rows",
         None, False),  # constraint 4: byte gather on v5e
        ("lanes f32/i32", 8, jnp.float32, jnp.int32, "lanes",
         None, True),
        ("lanes f32/i32", 256, jnp.float32, jnp.int32, "lanes",
         None, True),
        ("lanes f32/i32", 512, jnp.float32, jnp.int32, "lanes",
         None, True),
        ("lanes f32->bf16", 512, jnp.float32, jnp.int32, "lanes",
         jnp.bfloat16, True),  # production decode output dtype
    ]

    for name, r, vdtype, idtype, mode, out_dtype, expect_ok in cases:
        n_tiles = max(1, (1 << 23) // (r * lanes))
        table = jnp.asarray(
            rng.standard_normal((r, lanes)).astype(np.float32), vdtype
        )
        # lane gather indexes lanes (< 128); row gather indexes rows (< r)
        hi = lanes if mode == "lanes" else r
        idx = jnp.asarray(
            rng.integers(0, hi, (n_tiles * r, lanes)), idtype
        )
        tag = f"{name:16s} r={r:4d}"
        try:
            out = gather_call(
                table, idx, mode, n_tiles=n_tiles, out_dtype=out_dtype,
                interpret=interpret,
            )
            out.block_until_ready()
        except Exception as e:  # noqa: BLE001
            word = "expected-FAIL" if not expect_ok else "FAILED"
            if expect_ok:
                failures += 1
            print(f"{tag} {word}: {type(e).__name__}: {_fmt_exc(e)}")
            continue
        npt = np.asarray(table, np.float32)
        npi = np.asarray(idx, np.int64)
        if mode == "lanes":
            ref = np.stack(
                [npt[i % r][npi[i]] for i in range(npi.shape[0])]
            )
        else:
            ref = np.take_along_axis(npt, npi % r, axis=0)
        if out_dtype is not None:
            ref = np.asarray(jnp.asarray(ref, out_dtype), np.float32)
        ok = np.array_equal(np.asarray(out, np.float32), ref)
        if not ok:
            failures += 1
        line = f"{tag} correct={ok}"
        if not expect_ok:
            line += " (expected to fail; constraint lifted?)"
        if not interpret:
            from qcnn_tpu.utils.devtime import time_device_fn

            t = time_device_fn(
                lambda t_, i: gather_call(
                    t_, i, mode, n_tiles=n_tiles, out_dtype=out_dtype,
                    interpret=False,
                ),
                table, idx,
            )  # seconds/call (utils/devtime.py)
            elems = n_tiles * r * lanes
            line += (f" {t*1e6:8.1f} us  {elems / t / 1e9:7.2f} "
                     f"Gelem/s")
        print(line)

    print(f"probe failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
