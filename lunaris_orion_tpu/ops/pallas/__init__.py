"""Pallas (Mosaic) TPU kernels — the native tier.

The reference's implicit native tier is cuDNN/eager CUDA via torch
(SURVEY.md §2.5); these are the explicit TPU equivalents:
  K1 fused GroupNorm+Mish epilogue      (gn_mish.py)
  K2 blockwise flash spatial attention  (flash_attention.py)
  K3 fused reparam->KL/MSE loss         (loss_epilogue.py)
  K4 pixelate/palette-quantize          (pixelate.py)
Each has an XLA-composed fallback; ops.dispatch picks per backend/benchmark.
"""
