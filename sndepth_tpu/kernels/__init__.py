"""Pallas TPU kernels.

Landed:
* ``dssim`` — fused 3x3-window SSIM dissimilarity (validated vs the XLA
  reference at 5.7e-6; measured at parity with XLA's own fusion, see the
  module docstring for numbers).

Roadmap (the reference's remaining CUDA-kernel call sites, survey §2.8):
* THE round-2 kernel: vectorized bilinear-tap gather from VMEM-resident
  planes, with three users measured gather-bound under the honest
  protocol (see CLAUDE.md): the GeoNet warp (95% of the 2.18 s train
  step), UniAD deformable attention (2.29 s/frame), and the RAFT3D corr
  lookup. XLA's gather sustains only ~73M rows/s for small rows
  irrespective of layout (flattened take_along_axis / packed-patch
  variants measured equal);
* blockwise Gauss-Newton build — stream the O(N^2) per-pair Jacobian
  accumulation of `models/raft3d.py:gauss_newton_step` through VMEM tiles
  instead of materializing (B, N, N, 3, 6);
* fused inverse-warp + photometric loss with custom VJP (the GeoNet hot
  loop);
* flash-style on-the-fly correlation for resolutions where the all-pairs
  volume stops fitting (at KITTI 1/8-res it is ~2.8 MB/level and
  materialization is optimal).
"""
