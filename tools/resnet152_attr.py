#!/usr/bin/env python
"""resnet152 batch-ladder attribution (round-5 verdict item 6).

§11b's ladder shows resnet152 peaking at b32 and REGRESSING past b64
(6983 -> 6374 -> 5516 img/s) — the one family claim backed by a sentence
("60M-param weight stream + deep activation working set") instead of an
artifact. This runs the §16 estimated-cycles attribution on the compiled
b64 AND b128 programs and diffs them: per-image cycles by op category,
plus the top ops whose per-image cost GROWS from b64 to b128 (at perfect
batch scaling every op's cycles double; ratios > 2 name the regression).

    timeout 3000 python tools/resnet152_attr.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cycles_by_category(text: str) -> dict[str, int]:
    """Sum estimated_cycles per coarse op category of one HLO program."""
    cat_re = re.compile(r"=\s+\S+\s+(fusion|convolution|copy|transpose|"
                        r"convert|dot|reduce-window|reduce|custom-call|"
                        r"bitcast|dynamic-slice|concatenate)\(")
    cost_re = re.compile(r'"?estimated_cycles"?[=:]\s*"?(\d+)')
    out: dict[str, int] = {}
    for ln in text.splitlines():
        m = cost_re.search(ln)
        if not m:
            continue
        c = int(m.group(1))
        mc = cat_re.search(ln)
        cat = mc.group(1) if mc else "other"
        out[cat] = out.get(cat, 0) + c
    return out


def top_ops(text: str, top: int = 200) -> list[tuple[int, str, str]]:
    """(cycles, shape-key, line) for the costliest ops; shape-key is the
    op kind + output shape with the leading (batch) dim dropped so the
    same op matches across batch sizes."""
    cost_re = re.compile(r'"?estimated_cycles"?[=:]\s*"?(\d+)')
    shape_re = re.compile(r"=\s+((?:bf16|f32|s32|u8|s8|pred)\[([0-9,]*)\])"
                          r"\S*\s+(\w+)")
    rows = []
    for ln in text.splitlines():
        m = cost_re.search(ln)
        if not m:
            continue
        ms = shape_re.search(ln)
        if ms:
            dims = ms.group(2).split(",")
            key = f"{ms.group(3)}:{ms.group(1).split('[')[0]}" \
                  f"[{','.join(dims[1:])}]"
        else:
            key = "?"
        rows.append((int(m.group(1)), key, ln.strip()[:180]))
    rows.sort(reverse=True)
    return rows[:top]


def main() -> int:
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs=2, default=[64, 128])
    args = ap.parse_args()

    from qcnn_tpu.models import resnet
    from qcnn_tpu.utils.devtime import _make_looped, time_device_fn

    log(f"devices: {jax.devices()}")
    spec = resnet.RESNETS["resnet152"]()
    pq = resnet.quantize_params(spec, resnet.init_dense_params(spec, seed=0))
    prepared = jax.device_put(
        resnet.prepare_params(spec, pq, dtype=jnp.bfloat16))
    rng = np.random.default_rng(0)

    def fwd(x, p):
        return resnet.forward(p, x, spec=spec, compute_dtype=jnp.bfloat16)

    b_lo, b_hi = args.batches
    texts = {}
    for b in (b_lo, b_hi):
        x = jnp.asarray(
            rng.standard_normal((b, spec.in_size, spec.in_size, 3)),
            jnp.bfloat16)
        bl = time_device_fn(lambda v, *_: v[(slice(0, 1),) * v.ndim], x,
                            k1=2, k2=8, reps=5)
        t = time_device_fn(fwd, x, prepared, k1=2, k2=8, reps=5) - bl
        print(f"b{b}: {t*1e3:.3f} ms/step, {b/t:,.0f} img/s", flush=True)
        log(f"compiling looped b{b} program for HLO ...")
        compiled = _make_looped(fwd).lower(2, x, prepared).compile()
        texts[b] = compiled.as_text()
        with open(f"tools/out/resnet152_attr_b{b}_hlo.txt", "w") as f:
            f.write(texts[b])

    cats = {b: cycles_by_category(t) for b, t in texts.items()}
    all_cats = sorted(set(cats[b_lo]) | set(cats[b_hi]),
                      key=lambda c: -cats[b_hi].get(c, 0))
    print(f"\nper-image estimated cycles by category (b{b_lo} vs "
          f"b{b_hi}; ratio 1.0 = perfect batch scaling):", flush=True)
    for c in all_cats:
        c64 = cats[b_lo].get(c, 0) / b_lo
        c128 = cats[b_hi].get(c, 0) / b_hi
        ratio = c128 / c64 if c64 else float("inf")
        print(f"  {c:16s} {c64:12.0f} {c128:12.0f}  x{ratio:5.2f}",
              flush=True)

    # match top ops across programs by batch-stripped shape key
    t64 = {}
    for cyc, key, _ in top_ops(texts[b_lo]):
        t64[key] = t64.get(key, 0) + cyc
    print(f"\ntop b{b_hi} ops vs their b{b_lo} twins (per-image "
          f"ratio > 1 grows with batch):", flush=True)
    agg128: dict[str, int] = {}
    for cyc, key, _ in top_ops(texts[b_hi]):
        agg128[key] = agg128.get(key, 0) + cyc
    rows = sorted(agg128.items(), key=lambda kv: -kv[1])[:25]
    for key, cyc in rows:
        per128 = cyc / b_hi
        per64 = t64.get(key, 0) / b_lo
        ratio = f"x{per128/per64:5.2f}" if per64 else "  new"
        print(f"  {per128:12.0f}/img {ratio}  {key}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
