"""qcnn_tpu — a TPU-native product-quantization CNN inference framework.

A from-scratch JAX/XLA/Pallas reimplementation of the CVPR'16 "Quantized CNN"
scheme (per-layer sub-vector codebooks + assignment maps; dense GEMM replaced by
input-codeword inner-product lookup tables plus gather-accumulate), as
implemented by the reference C++ engine CAS-CLab/quantized-cnn.

Subsystems (reference analogue in parentheses; see SURVEY.md for file:line maps):

- ``qcnn_tpu.formats``   — reference ``.bin``/``.cbn`` codec + native checkpoints
                           (reference: include/FileIO.h)
- ``qcnn_tpu.core``      — layer/model specs and parameter pytrees
                           (reference: include/CaffePara.h)
- ``qcnn_tpu.ops``       — op library: precise + PQ paths, Pallas kernels
                           (reference: src/CaffeEva.cc CalcFeatMap_*)
- ``qcnn_tpu.models``    — model zoo (AlexNet/CaffeNet/VggCnnS/VGG16/FGB/FGD)
                           (reference: src/CaffePara.cc ConfigLayer_*)
- ``qcnn_tpu.preproc``   — BMP decode, resize, crop, mean subtract
                           (reference: src/BmpImgIO.cc)
- ``qcnn_tpu.quantizer`` — subspace k-means PQ quantizer (reference: offline MATLAB)
- ``qcnn_tpu.parallel``  — mesh/sharding rules for multi-chip serving (new)
- ``qcnn_tpu.eval``      — accuracy/latency harness (reference: src/UnitTest.cc)
"""

__version__ = "0.1.0"
