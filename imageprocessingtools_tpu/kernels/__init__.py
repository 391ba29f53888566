"""Performance layer: fused pipelines and Pallas TPU kernels.

`fused.py` is the XLA-fused flagship pipeline (gray -> 5x5 Gaussian ->
histogram equalization); `elementwise.py`, `stencil.py`, `histogram.py` are
the hand-tiled Pallas versions used when they beat XLA's fusion.
"""

from imageprocessingtools_tpu.kernels.fused import (  # noqa: F401
    fused_gray_gauss_histeq,
    fused_pipeline_xla,
)
