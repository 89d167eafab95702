"""Pallas TPU kernels.

Landed:
* ``dssim`` — fused 3x3-window SSIM dissimilarity (validated vs the XLA
  reference at 5.7e-6; measured at parity with XLA's own fusion, see the
  module docstring for numbers).

Roadmap (the reference's remaining CUDA-kernel call sites, survey §2.8):
* deformable-attention gather — initially suspected as UniAD's bottleneck;
  actual steady-state measurement (0.7 ms/frame at 100x100 BEV with
  randomized offsets) shows XLA's gather handles the locality-friendly
  deformable pattern fine. A Pallas kernel stays an option for larger BEV
  grids, not a priority. The fully-random-coords microbenchmark
  (134 ms/level) is the non-representative worst case;
* blockwise Gauss-Newton build — stream the O(N^2) per-pair Jacobian
  accumulation of `models/raft3d.py:gauss_newton_step` through VMEM tiles
  instead of materializing (B, N, N, 3, 6);
* fused inverse-warp + photometric loss with custom VJP (the GeoNet hot
  loop);
* flash-style on-the-fly correlation for resolutions where the all-pairs
  volume stops fitting (at KITTI 1/8-res it is ~2.8 MB/level and
  materialization is optimal).
"""
