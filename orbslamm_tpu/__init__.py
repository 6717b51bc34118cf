"""orbslamm_tpu — a TPU-native multi-map visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HDaoud/ORBSLAMM
(reference surveyed in SURVEY.md): monocular ORB-feature SLAM with multi-map
creation on tracking loss and Sim3-aligned cross-map / multi-robot merging.

Layout:
  ops/       — batched compute kernels (ORB extraction, Hamming matching, BoW,
               RANSAC solvers, bundle adjustment) — jit/pallas, fixed shapes
  models/    — map state arrays (SoA pools) + the SLAM pipeline stages
               (tracking / local mapping / loop closing / multi-mapping)
  parallel/  — device-mesh sharding of maps & distributed bundle adjustment
  io/        — dataset loaders (TUM/KITTI), trajectory writers, synthetic scenes
  eval/      — trajectory evaluation (ATE RMSE with Sim3/SE3 alignment)
  utils/     — config system, small shared helpers
"""

__version__ = "0.1.0"
