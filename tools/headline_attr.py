#!/usr/bin/env python
"""HLO-cycle attribution of the headline AlexNet batch-256 step (round 4).

The round-3 verdict's top item: isolated layers sum to 3.46 ms
(tools/out/profile_r3.txt) while the measured step is 5.30 ms. Two suspects:

1. the devtime harness itself — bench.py's whole-step number never
   subtracted the identity baseline the per-layer profiler subtracts
   (eval/profiler.py:136-146): the timing loop's sin-perturbation +
   full-output reduction run over the 158 MB f32 input EVERY iteration;
2. real program costs the isolated-layer sum cannot see: relayout copies
   at the loop boundary, fusion boundaries, f32->bf16 input casts.

This tool measures both: the identity baseline at the exact input shape,
the step under the exact bench.py methodology, and a compiled-HLO dump of
the looped program with per-op cost annotations (the §9f methodology,
pointed at the headline program for the first time).

    timeout 1500 python tools/headline_attr.py [--hlo] [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import synth, zoo
    from qcnn_tpu.models.loader import load_alexnet_reference
    from qcnn_tpu.models.prepare import prepare_params

    spec = zoo.alexnet()
    try:
        res = load_alexnet_reference(synthesize_missing=True)
        params = res.params
    except (FileNotFoundError, OSError):
        params = synth.random_pq_params(spec, seed=0)
    prepared, ci, fi = prepare_params(
        spec, params, batch_hint=256, dtype=jnp.bfloat16)
    return spec, jax.device_put(prepared), ci, fi


def step_fn(spec, ci, fi):
    import jax.numpy as jnp

    from qcnn_tpu.models import network

    def step(x, params):
        return network.forward(
            params, x, spec=spec, conv_impls=ci, fc_impls=fi,
            compute_dtype=jnp.bfloat16,
        )

    return step


def parse_hlo(text: str, top: int = 40) -> list[str]:
    """Attribute per-op costs from the optimized HLO text.

    Looks for any per-instruction cost annotation this toolchain emits
    (estimated_cycles / flops / bytes accessed in backend_config or
    metadata); falls back to structural census (op kinds, copy/transpose/
    convert inventory with shapes) when no cost annotations exist.
    """
    lines = []
    # cost-annotated instructions
    cost_re = re.compile(r'"?estimated_cycles"?[=:]\s*"?(\d+)')
    costed = []
    for ln in text.splitlines():
        m = cost_re.search(ln)
        if m:
            costed.append((int(m.group(1)), ln.strip()[:300]))
    if costed:
        costed.sort(reverse=True)
        total = sum(c for c, _ in costed)
        lines.append(f"estimated_cycles annotations: {len(costed)} ops, "
                     f"total {total}")
        for c, ln in costed[:top]:
            lines.append(f"  {c:>12d} ({100*c/total:5.1f}%) {ln}")
    else:
        lines.append("no estimated_cycles annotations in HLO text")
    # structural census: copies / converts / transposes with byte sizes
    census: dict[str, tuple[int, int]] = {}
    shape_re = re.compile(r"=\s+((?:bf16|f32|s32|u8|s8|pred|u32|f16|s16|u16)"
                          r"\[[0-9,]*\])\S*\s+(\w+)")
    dtype_bytes = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "f16": 2,
                   "s16": 2, "u16": 2, "u8": 1, "s8": 1, "pred": 1}

    def nbytes(shape_str: str) -> int:
        m = re.match(r"(\w+)\[([0-9,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * dtype_bytes.get(dt, 4)

    for ln in text.splitlines():
        m = shape_re.search(ln)
        if m:
            shape_str, op = m.groups()
            if op in ("copy", "transpose", "convert", "fusion",
                      "convolution", "dot", "reduce", "bitcast",
                      "reduce-window", "custom-call", "all-reduce"):
                c, b = census.get(op, (0, 0))
                census[op] = (c + 1, b + nbytes(shape_str))
    lines.append("")
    lines.append("op census (count, output bytes):")
    for op, (c, b) in sorted(census.items(), key=lambda kv: -kv[1][1]):
        lines.append(f"  {op:16s} n={c:4d}  out={b/1e6:10.1f} MB")
    # biggest copies individually
    lines.append("")
    lines.append("largest copy/transpose/convert ops:")
    big = []
    for ln in text.splitlines():
        m = shape_re.search(ln)
        if m and m.group(2) in ("copy", "transpose", "convert"):
            big.append((nbytes(m.group(1)), ln.strip()[:240]))
    big.sort(reverse=True)
    for b, ln in big[:20]:
        lines.append(f"  {b/1e6:8.1f} MB  {ln}")
    return lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hlo", action="store_true",
                    help="dump+attribute the compiled HLO (adds a remote "
                         "compile)")
    ap.add_argument("--measure", action="store_true",
                    help="run the baseline/step measurements on the chip")
    ap.add_argument("--out", default="tools/out/headline_attr_r4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qcnn_tpu.models import synth
    from qcnn_tpu.utils.devtime import _make_looped, time_device_fn

    log(f"devices: {jax.devices()}")
    spec, prepared, ci, fi = build()
    step = step_fn(spec, ci, fi)
    x32 = synth.random_input(spec, args.batch, seed=1)
    x16 = jnp.asarray(x32, jnp.bfloat16)

    if args.hlo:
        looped = _make_looped(step)
        lowered = looped.lower(2, x16, prepared)
        log("compiling looped program for HLO text ...")
        compiled = lowered.compile()
        text = compiled.as_text()
        path = args.out + "_hlo.txt"
        with open(path, "w") as f:
            f.write(text)
        log(f"wrote {len(text)} bytes of HLO to {path}")
        report = parse_hlo(text)
        rpath = args.out + "_report.txt"
        with open(rpath, "w") as f:
            f.write("\n".join(report) + "\n")
        print("\n".join(report[:80]))
        try:
            ca = compiled.cost_analysis()
            if ca:
                keys = sorted(ca)[:40]
                log("cost_analysis keys: " + ", ".join(keys))
                flops = ca.get("flops")
                bytes_ = ca.get("bytes accessed")
                oi = ca.get("optimal_seconds")
                print(f"cost_analysis: flops={flops} bytes={bytes_} "
                      f"optimal_seconds={oi}")
        except Exception as e:  # noqa: BLE001 - backend-optional API
            log(f"cost_analysis unavailable: {e}")

    if args.measure:
        rows = []

        def meas(name, fn, x, *rest, **kw):
            t = time_device_fn(fn, x, *rest, k1=4, k2=20, reps=5, **kw)
            rows.append((name, t))
            log(f"  {name:34s} {t*1e3:7.3f} ms")
            return t

        log("measuring (identity baselines + step variants) ...")
        ident = lambda v, *_: v  # noqa: E731
        t_id32 = meas("identity f32 input (harness cost)", ident, x32)
        t_id16 = meas("identity bf16 input (harness cost)", ident, x16)
        t_step32 = meas("step, f32 input (bench.py today)", step, x32,
                        prepared)
        t_step16 = meas("step, bf16 input", step, x16, prepared)
        log("")
        log(f"step-minus-baseline f32 : {(t_step32-t_id32)*1e3:7.3f} ms "
            f"-> {args.batch/(t_step32-t_id32):8.1f} img/s")
        log(f"step-minus-baseline bf16: {(t_step16-t_id16)*1e3:7.3f} ms "
            f"-> {args.batch/(t_step16-t_id16):8.1f} img/s")
        with open(args.out + "_measure.txt", "w") as f:
            for name, t in rows:
                f.write(f"{name}: {t*1e3:.3f} ms\n")
            f.write(f"step_minus_baseline_f32_ms: "
                    f"{(t_step32-t_id32)*1e3:.3f}\n")
            f.write(f"step_minus_baseline_bf16_ms: "
                    f"{(t_step16-t_id16)*1e3:.3f}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
