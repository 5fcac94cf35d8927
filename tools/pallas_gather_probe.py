#!/usr/bin/env python
"""Probe: does Mosaic on this toolchain compile an in-kernel dynamic gather?

PQ decode is a gather W_T[o, s] = cb[A[o, s] * D + d, s] — per-lane row
selection along sublanes. The fused kernel (ops/pallas/pq_fc_fused.py) pays
2K select-accumulate ops per weight element because round-1 Mosaic notes
said "no fast gather". jax 0.9.0's Mosaic has a `tpu.dynamic_gather`
lowering for `jnp.take_along_axis(..., axis=0)` on some generations; if it
compiles and runs at VPU speed here, in-kernel decode drops from 2K ops to
~1 op per element and every memory-mode kernel should be reformulated.

Run on the real chip:  timeout 900 python tools/pallas_gather_probe.py
Results: docs/KERNEL_STUDIES.md §9c.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_call(table, idx, interpret=False):
    r, lanes = idx.shape
    return pl.pallas_call(
        _gather_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, lanes), table.dtype),
        interpret=interpret,
    )(table, idx)


def main():
    if "--cpu" in sys.argv:
        # the axon sitecustomize pins the TPU platform at interpreter start;
        # this is the documented override (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} interpret={interpret}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    lanes = 128
    # depths cover: within-vreg (8), PQ fc (K*D = 32*4 = 128), PQ conv
    # (128*4 = 512); dtypes cover the decode output domain (f32 and the
    # production bf16). rows sized so the timed gather is ~1M elements.
    for k in (8, 128, 512):
        for dtype in (jnp.float32, jnp.bfloat16):
            rows = 8192
            table = jnp.asarray(
                rng.standard_normal((k, lanes)).astype(np.float32), dtype
            )
            idx = jnp.asarray(rng.integers(0, k, (rows, lanes)), jnp.int32)
            tag = f"k={k:4d} dtype={jnp.dtype(dtype).name:9s}"
            try:
                out = gather_call(table, idx, interpret=interpret)
                out.block_until_ready()
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("\n", " | ")[:300]
                print(f"{tag} FAILED: {type(e).__name__}: {msg}")
                continue
            ref = np.take_along_axis(
                np.asarray(table, np.float32), np.asarray(idx), axis=0
            )
            ok = np.array_equal(np.asarray(out, np.float32), ref)
            line = f"{tag} correct={ok}"
            if not interpret:
                from qcnn_tpu.utils.devtime import time_device_fn

                t = time_device_fn(
                    lambda t_, i: gather_call(t_, i, interpret=False),
                    table, idx,
                )  # seconds/call (utils/devtime.py)
                elems = rows * lanes
                line += (f" {t*1e6:8.1f} us  {elems / t / 1e9:7.2f} "
                         f"Gelem/s")
            print(line)


if __name__ == "__main__":
    main()
