"""selfcorr_tpu — TPU-native self-supervised category-level 6D pose estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kywind/self-corr-pose (ICLR 2023): per-category self-supervised training of a
model predicting a deformed canonical mesh, dense 2D<->3D correspondences and
camera pose from RGB(-D) crops, supervised by differentiable soft
rasterization (Pallas TPU kernels), DINO feature cycle-consistency and
geometric regularizers; inference recovers metric 6D pose + 3D boxes via
vectorized RANSAC-Umeyama fitting, evaluated with NOCS-style metrics.

Layering (TPU-first, not a port):
  ops/       pure-functional geometry, mesh math, Pallas rasterizer, knn,
             Umeyama/RANSAC, image ops
  models/    flax modules: ResNet18+FPN, PointNet, pose/shape heads, DINO ViT,
             correspondence, MeshNet composition
  losses/    render losses, regularizers, match/cycle losses
  train/     optax 5-group optimizer, single jitted+sharded train step, loop
  eval/      on-device pose fitting, host-side exact 3D IoU, metrics, tester
  data/      host-side pipelines (Wild6D / NOCS / CUB / synthetic)
  parallel/  jax.sharding mesh helpers (data-parallel over ICI)
"""

__version__ = "0.1.0"
