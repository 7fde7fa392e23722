"""Differentiable soft rasterizer — TPU-native replacement for the reference's
SoftRas CUDA extension (third-party/softras/soft_renderer/cuda/
soft_rasterize_cuda_kernel.cu).

Modules:
  common.py     pixel grid + per-face constant packing (single source of truth
                shared by the jnp reference and the Pallas kernels)
  reference.py  dense pure-jnp implementation (ground truth; tiny sizes)
  pallas_raster.py  fused streaming Pallas TPU kernels fwd/bwd
  api.py        public entry points: soft_rasterize(), render_fused()
"""
from selfcorr_tpu.ops.rasterizer.api import (  # noqa: F401
    RasterConfig,
    soft_rasterize,
    render_fused,
)
