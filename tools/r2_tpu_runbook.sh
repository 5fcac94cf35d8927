#!/bin/bash
# Round-2 TPU measurement runbook: runs the gather-kernel probe + A/Bs and
# the bench sweep as soon as a chip claims. Each python process pays the
# pooled-chip claim once; everything logs under tools/out/.
set -u
cd /root/repo
OUT=tools/out
echo "runbook start: $(date -u +%H:%M:%S)"

# 1. cheap claim probe (also the gather gate)
timeout 1200 python tools/pallas_gather_probe.py >"$OUT/gather_probe.txt" 2>&1
rc=$?
echo "gather probe rc=$rc"
cat "$OUT/gather_probe.txt"
if [ $rc -ne 0 ]; then
  echo "chip claim failed; runbook aborting (re-run when pool is back)"
  exit 1
fi

# 2. decode formulation A/B (isolated + end-to-end)
timeout 3000 python tools/decode_gather_ab.py >"$OUT/decode_ab.txt" 2>&1
echo "decode A/B rc=$?"
tail -40 "$OUT/decode_ab.txt"

# 3. headline bench refresh (sweep included)
QCNN_BENCH_BUDGET_S=900 timeout 1800 python bench.py >"$OUT/bench_r2.txt" 2>&1
echo "bench rc=$?"
tail -5 "$OUT/bench_r2.txt"

# 4. compiled-mode smoke across kernels
timeout 1800 python tools/tpu_smoke.py >"$OUT/tpu_smoke.txt" 2>&1
echo "smoke rc=$?"
tail -10 "$OUT/tpu_smoke.txt"
echo "runbook done: $(date -u +%H:%M:%S)"
