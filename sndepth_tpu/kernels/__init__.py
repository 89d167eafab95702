"""Pallas TPU kernels.

Landed:
* ``dssim`` — fused 3x3-window SSIM dissimilarity (validated vs the XLA
  reference at 5.7e-6; measured at parity with XLA's own fusion, see the
  module docstring for numbers).

Roadmap (the reference's remaining CUDA-kernel call sites, survey §2.8):
* deformable-attention gather — measured the dominant cost of UniAD at
  scale (100x100 BEV, 901 queries, 6 cams: 23.5 s/frame on v5e; one
  level's taps = 15M random 128-byte reads at ~14 GB/s effective, ~10x
  below HBM transaction peak). A Pallas kernel with pipelined per-tile
  DMAs is the round-2 priority; a one-hot matmul reformulation was
  evaluated and rejected (hundreds of TFLOPs);
* blockwise Gauss-Newton build — stream the O(N^2) per-pair Jacobian
  accumulation of `models/raft3d.py:gauss_newton_step` through VMEM tiles
  instead of materializing (B, N, N, 3, 6);
* fused inverse-warp + photometric loss with custom VJP (the GeoNet hot
  loop);
* flash-style on-the-fly correlation for resolutions where the all-pairs
  volume stops fitting (at KITTI 1/8-res it is ~2.8 MB/level and
  materialization is optimal).
"""
