"""deflow_tpu — a TPU-native scene-flow framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of KTH-RPL/DeFlow and its
surrounding OpenSceneFlow training framework (reference surveyed in /root/repo/SURVEY.md):

- dynamic pillar voxelization as static-shaped segment reductions (XLA + Pallas paths)
- PointPillars-style ``DynamicEmbedder`` + FastFlow3D siamese 2D conv U-Net backbone
- DeFlow's ConvGRU iterative-refinement decoder (plus linear / transformer heads)
- deflowLoss / ff3dLoss / zeroflowLoss, official AV2 3-way EPE + bucketed v2 metrics
- Argoverse 2 ``.h5`` frame-pair data pipeline feeding a ``jax.sharding`` data-parallel
  mesh, Hydra-compatible configs, orbax checkpoints and a torch-ckpt weight converter.

Everything is designed for XLA's compilation model: static shapes with validity
masks instead of the reference's ragged per-sample Python loops
(cf. reference deflow.py:60, decoder.py:192).
"""

__version__ = "0.1.0"
