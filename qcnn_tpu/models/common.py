"""Shared family-model knobs (ResNet/ViT — models/resnet.py, models/vit.py).

MEMORY_IMPL selects the in-graph PQ decode formulation used when params
still carry codebooks (memory mode / unprepared params):

- "indecode": one-hot MXU matmul decode (KERNEL_STUDIES §9b — XLA's gather
  lowering is ~300x off roofline, the one-hot contraction is not);
- "gdecode": Pallas dynamic-gather kernel (ops/pallas/pq_decode.py, §9c).

One shared constant so A/B tools (tools/decode_gather_ab.py) and a measured
flip change exactly one value for every family.
"""

MEMORY_IMPL = "indecode"
