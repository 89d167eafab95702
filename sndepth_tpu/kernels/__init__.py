"""Pallas TPU kernels.

Landed:
* ``warp`` — THE hot op: VMEM-resident bilinear-warp gather with a
  fully-unrolled fast path for smooth warps (16-row x 2-chunk window) and
  a dynamic-span fallback; tangent-saving custom VJP makes the backward
  an elementwise contraction. 37.6 -> 14.8 ms per full-res batch-128 warp
  on smooth coords vs 272 ms for XLA's row gather; took the GeoNet train
  step from 2.18 s to ~0.3 s.
* ``dssim`` — fused 3x3-window SSIM dissimilarity forward plus an
  analytic-adjoint backward (one VMEM pass each, separable pooling);
  replaced ~45 ms of reduce_window+fusion time in the train step.
* ``warp`` splat — the warp VJP's image gradient (bilinear splat) as
  masked lane/sublane rotations grouped by shift (the tap weights factor
  as X_s * Y_ty), accumulating into a VMEM-resident plane. 1.9x XLA's
  serialized scatter-add even on adversarial coords; GeoNet stage-2
  train_flow went 1.96 s -> 686 ms/step. (The same shift-grouping
  applied to the *forward* gather measured 7x SLOWER than the
  take_along_axis fast path — dynamic rolls are expensive relative to
  in-vreg gathers; rolls only pay where the alternative is XLA scatter.)

Related XLA-level rewrites that obviated planned kernels:
* RAFT3D correlation lookup: slab-gather formulation (contiguous
  (win+1, C) row slabs + MXU patch dot + shifted-slice bilerp) in
  `models/raft3d.py:corr_lookup_dot` — 3.7x over row gathers, 10x
  end-to-end (339 -> 33.6 ms/frame); no Pallas needed.
* Gauss-Newton build: blocked j-accumulation under lax.scan keeps
  full-resolution KITTI in memory (`models/raft3d.py:gauss_newton_step`).
* UniAD deformable attention: measured 0.6-0.7 ms/frame steady-state with
  trained-like offsets — deformable offsets stay local to reference
  points so XLA's gather keeps locality; a Pallas gather kernel remains
  an option, not a need.

Landed since (round 2):
* ``photo_loss`` — fused warp+DSSIM+L1 forward emitting the complete
  coordinate gradient (scalar-cotangent trick: the downstream is a summed
  loss, so the VJP is a scalar multiply).
* ``smooth_loss`` — edge-aware smoothness + depth gradient, same trick.

Landed since (round 3):
* ``photo_loss`` pair kernel — both loss directions x all sources per
  image in one VMEM pass; per-pixel weighted variant fuses stage-2's
  masked full-flow losses (weights ride the cotangent mask); PORTRAIT
  dispatch (transpose planes + swap coords when width is lane-ragged but
  height lane-exact — KITTI 128x416 -> zero padded lanes, single-chunk
  x-windows); 3x3 pools with the lane-dim 3-tap as a tridiagonal-band
  matmul on the otherwise-idle MXU (SNDEPTH_PHOTO_POOL=row, default).
  bench progression 2000 -> 2072 -> 2276 -> 2353 (portrait) -> 2411
  (row pools + deconv custom VJP).
* Adjoint de-serializations OUTSIDE Pallas (found via tools/dump_hlo.py
  + tools/line_attrib.py): grad-of-slab-gather as a one-hot matmul
  (models/raft3d.py:_slab_gather — XLA's transpose was a serial
  scatter-add while-loop, >half of the RAFT3D train step); deconv
  backward closed forms (models/dispnet.py:_deconv2x — XLA's was a
  full-res dy reverse + the worst-laned wgrads).

Landed since (round 4):
* ``gn_build`` — fused dense-SE3 Gauss-Newton system build (the
  reference's ``se3_build_inplace`` CUDA kernel): per 8-pixel i-group,
  j streamed in 128-wide lane chunks, the Jacobian built on the fly in
  registers (exact-zero entries skipped) and the 21 unique H + 6 g
  entries accumulated as (8,128) running sums — no Jacobian tensor ever
  materializes. Replaces the XLA blocked form (540 MB J per chunk,
  0.2%-MXU-util batched 6x6 Grams) above 2k pixels, behind a custom VJP
  whose backward re-derives through the XLA path. Full-res RAFT3D
  886 -> 186.6 ms/frame wall (device trace 2531 -> 277 ms/step).
* Gather-restructure negative results (all built, kernel- AND
  step-measured — see docs/PERF.md r4 addendum): bf16 pair-packed lane
  gathers (SNDEPTH_WARP_GATHER=pack, halves take count, ~no change);
  two-stage plane form (SNDEPTH_PHOTO_PLANE, per-tile row-table assembly
  + whole-plane lane gathers, -1.3%). Takes are already overlapped in
  the integrated band paths; stub-removal deltas and isolated take
  streams both overstate the recoverable time. Both knobs kept,
  default off.

Landed since (round 5):
* ``gn_build`` fused Pallas BACKWARD — two mirror kernels that
  ``jax.grad`` the shared pair-contribution helper inside the kernel
  body (i-kernel: d/d{rot, trans, emb, sq, intrinsics}, cotangents as
  per-i columns; j-kernel: roles swapped, i+cotangent rows streamed on
  lanes). Full-res RAFT3D TRAINING 4232 -> 1382 ms/step vs the XLA
  re-derive, losses matching (tools/raft3d_fullres_train.py). Lesson:
  in-kernel AD works under Mosaic; padded sublanes must carry finite
  dummies or 0*inf NaNs the chunk-loss sums.
* Deformable-sampler coordinate layouts (models/deformable.py): the
  warp kernel's TARGET tiling is layout-sensitive — lane-packing the
  (nq, P) coords to 128-wide rows (8271 -> 1166 ms/encoder-layer at
  UniAD refscale) then P-major ordering (tight per-tile y-spans ->
  band fast paths; 1000 -> 470 ms) are free exact reshapes, no new
  kernel needed. SNDEPTH_WARP_PLANE_MB gate raised 6 -> 8 MB for the
  200x200 TSA value plane (176 -> 11.6 ms).
* bf16 row-pool operands in the pair photo kernel
  (SNDEPTH_PHOTO_POOL_DTYPE): parity-tested, benched NEUTRAL at step
  level — pools are already overlapped. Default f32.

Roadmap:
* Pallas conv: largely OBSOLETED at the XLA level — the planned
  "4-output-pixel lane packing" is exactly a 2x2 space-to-depth fold,
  now done as exact XLA rewrites with custom lane-packed VJPs
  (models/dispnet.py: _S2DConv w/ per-shape fold factor {1,2,4},
  _PackedDGradDownConv, s2d_iconv_levels; FLOP census in
  _scratch_flops_census.py). The round-3 A/B sweep confirmed every
  extra packing knob (s2d_up, mat_heads, iconv s2d, pdg) LOSES on real
  TPU vs the default; conv forward sits near census SOL.
* Negative results (measured, do not retry blindly): x1 lane gathers
  via static roll of the row table (SNDEPTH_WARP_X1ROLL) -1.4%;
  both-dims MXU pools < row pools; portrait is REQUIRED for row pools
  to win.
* UniAD deformable gather kernel: still an option, not a need
  (0.6-0.7 ms/frame measured with trained-like offsets).
"""
