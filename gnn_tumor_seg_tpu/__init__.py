"""gnn_tumor_seg_tpu — a TPU-native supervoxel-GNN tumor segmentation framework.

Built from scratch in JAX/XLA (Pallas kernels, pjit/shard_map distribution) with the
capabilities of the reference research pipeline `rsinghlab/GNN-Tumor-Seg`
(mounted read-only at /root/reference): BraTS MRI -> supervoxel graphs -> GNN node
classification -> voxel reprojection -> 3D refinement CNN -> BraTS metrics.

Layer map (bottom-up):
  ops/        graph containers + aggregation primitives (+ Pallas kernels)
  models/     GraphSAGE / GAT / refinement-CNN architectures
  train/      losses, optimizers, jitted train steps, fold drivers, checkpoints
  parallel/   device meshes, data-parallel and graph-partitioned (halo) execution
  data/       NIfTI IO, image processing, SLIC, graph construction, datasets
  evaluation  BraTS Dice / HD95 metrics
  cli/        pipeline entry points mirroring the reference's scripts/
"""

__version__ = "0.1.0"
