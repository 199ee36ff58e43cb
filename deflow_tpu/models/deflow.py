"""DeFlow / FastFlow3D scene-flow model (reference deflow.py:20-113).

Pipeline: ego-motion compensation → dual pillar voxelization → siamese U-Net
→ per-point decoder head.  One flax module covers both model families — the
reference builds FastFlow3D as DeFlow with ``decoder_option='linear'``
(reference deflow.py:33-36; conf groups README.md:62,68).

Batch contract (static-shape analog of reference deflow.py:49-66):
    pc0, pc1   [B, N, 3] float  — padded point clouds
    pc0_mask,
    pc1_mask   [B, N] bool      — real (non-padding) points
    pose0,
    pose1      [B, 4, 4] float  — ego→city poses
    ego_motion [B, 4, 4] float  — optional precomputed pose_0to1

Returns a dict mirroring reference deflow.py:103-112, with validity masks in
place of ragged ``*_valid_point_idxes`` lists:
    flow            [B, N, 3]  net flow at pc0 slots (zero where invalid)
    pose_flow       [B, N, 3]  rigid ego flow at all real pc0 points
    pc0_valid, pc1_valid [B, N] in-range masks (voxelizer-valid)
    pc0_points, pc1_points [B, N, 3] (pc0 ego-compensated, as the reference's
                                      ``voxel_info['points']``)
Final predicted flow for eval = pose_flow + flow (reference composes these in
its eval path; invalid points carry pose_flow only).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from deflow_tpu.models.decoder import ConvGRUDecoder, LinearDecoder, MMHeadDecoder
from deflow_tpu.models.embedder import DynamicEmbedder
from deflow_tpu.models.unet import FastFlow3DUNet
from deflow_tpu.ops.pose import cal_pose0to1, transform_points
from deflow_tpu.ops.voxel import VoxelConfig, image_to_table


class DeFlow(nn.Module):
    """Hyperparameter defaults pinned by reference deflow.py:21-30."""

    voxel_size: Sequence[float] = (0.2, 0.2, 6.0)
    point_cloud_range: Sequence[float] = (-51.2, -51.2, -3.0, 51.2, 51.2, 3.0)
    grid_feature_size: Sequence[int] = (512, 512)
    decoder_option: str = "gru"  # gru | linear | mmhead
    num_iters: int = 4
    feat_channels: int = 32
    # num_frames > 2 (SeFlow-lineage multi-frame history, the loader's
    # ``pch{h}`` keys): each history frame is ego-compensated into pc1's
    # frame, embedded by the SAME siamese embedder, and channel-concatenated
    # into the pc0 pseudoimage before the UNet.  2 = the reference DeFlow.
    num_frames: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        cfg = VoxelConfig(tuple(self.voxel_size), tuple(self.point_cloud_range))
        gw, gh, _ = cfg.grid_size
        assert (gw, gh) == tuple(self.grid_feature_size), (
            f"grid_feature_size {self.grid_feature_size} inconsistent with "
            f"voxel_size/point_cloud_range-derived grid {(gw, gh)}"
        )
        self.voxel_cfg = cfg
        self.embedder = DynamicEmbedder(
            voxel_cfg=cfg, feat_channels=self.feat_channels, dtype=self.dtype,
            name="embedder",
        )
        self.backbone = FastFlow3DUNet(dtype=self.dtype, s2d=cfg.use_s2d,
                                       stem_cin=self.feat_channels,
                                       name="backbone")
        if self.decoder_option == "gru":
            self.head = ConvGRUDecoder(
                num_iters=self.num_iters, dtype=self.dtype, name="head"
            )
        elif self.decoder_option == "linear":
            self.head = LinearDecoder(dtype=self.dtype, name="head")
        elif self.decoder_option == "mmhead":
            self.head = MMHeadDecoder(dtype=self.dtype, name="head")
        else:
            raise ValueError(f"unknown decoder_option: {self.decoder_option!r}")
        if self.num_frames > 2:
            # per-pillar linear fusion of (pc0, history…) embeddings back to
            # feat_channels, so the siamese UNet sees its usual channel width
            self.history_fuse = nn.Dense(self.feat_channels,
                                         dtype=self.dtype, name="history_fuse")

    def __call__(
        self,
        pc0: jnp.ndarray,
        pc1: jnp.ndarray,
        pose0: jnp.ndarray,
        pose1: jnp.ndarray,
        pc0_mask: jnp.ndarray,
        pc1_mask: jnp.ndarray,
        ego_motion: Optional[jnp.ndarray] = None,
        train: bool = False,
        host_prep: Optional[Dict[str, jnp.ndarray]] = None,
        history: Optional[Sequence[Dict[str, jnp.ndarray]]] = None,
    ) -> Dict[str, jnp.ndarray]:
        # Ego-motion compensation in f32 regardless of compute dtype: poses
        # carry ~1e3-scale translations where bf16 would cost millimeters.
        # When the host loader pre-transformed pc0 (host_prep), use its points
        # so the host-computed pillar ids are authoritative.
        if host_prep is not None and "pc0_transformed" in host_prep:
            transform_pc0 = host_prep["pc0_transformed"].astype(jnp.float32)
        else:
            if ego_motion is None:
                pose_0to1 = cal_pose0to1(pose0.astype(jnp.float32),
                                         pose1.astype(jnp.float32))
            else:
                pose_0to1 = ego_motion.astype(jnp.float32)
            transform_pc0 = transform_points(pc0.astype(jnp.float32), pose_0to1)
        pose_flow = jnp.where(
            pc0_mask[..., None], transform_pc0 - pc0.astype(jnp.float32), 0.0
        )

        def host_for(tag):
            if host_prep is None or f"{tag}_ids" not in host_prep:
                return None
            d = {"ids": host_prep[f"{tag}_ids"],
                 "sorted_id": host_prep[f"{tag}_sorted"]}
            # no "order" key ⇒ the loader shipped the batch fully presorted
            # (attach_host_prep(sort=True)): zero device permutes anywhere
            if f"{tag}_order" in host_prep:
                d["order"] = host_prep[f"{tag}_order"]
            if f"{tag}_sorted_rec" in host_prep:
                d["sorted_rec"] = host_prep[f"{tag}_sorted_rec"]
            return d

        img0, info0, plan0 = self.embedder(
            transform_pc0, pc0_mask, train, host=host_for("pc0"))
        img1, info1, _ = self.embedder(
            pc1.astype(jnp.float32), pc1_mask, train, host=host_for("pc1"))

        if self.num_frames > 2:
            # history frames (loader keys pch1 = frame before pc0, …):
            # compensate each into pc1's frame (pose_h→1), embed with the
            # shared embedder, widen the pc0 pseudoimage channel-wise — the
            # UNet stem convs absorb the extra channels (new params iff
            # enabled; num_frames=2 keeps exact checkpoint compatibility)
            assert history is not None and len(history) == self.num_frames - 2, (
                f"num_frames={self.num_frames} model needs "
                f"{self.num_frames - 2} history frames (loader num_frames=)")
            from deflow_tpu.models.unet import _phase_merge, _phase_split

            imgs_h = []
            for h in history:
                pose_h1 = cal_pose0to1(h["pose"].astype(jnp.float32),
                                       pose1.astype(jnp.float32))
                pts_h = transform_points(h["pc"].astype(jnp.float32), pose_h1)
                img_h, _, _ = self.embedder(pts_h, h["mask"], train)
                imgs_h.append(img_h)
            if self.voxel_cfg.use_s2d:
                # fuse per PHASE (per original pillar), not across the folded
                # 2x2 block — a plain 1x1 conv on the folded image would mix
                # spatial neighbors
                cat = jnp.concatenate(
                    [_phase_split(img0)] + [_phase_split(i) for i in imgs_h],
                    axis=-1)
                img0 = _phase_merge(self.history_fuse(cat))
            else:
                img0 = self.history_fuse(
                    jnp.concatenate([img0] + imgs_h, axis=-1))

        grid_flow_img = self.backbone(img0, img1, train)
        # flat id-ordered pillar tables for the per-point heads (pure
        # reshapes under either image layout; rows = pillar ids)
        before_tab = jnp.concatenate(
            [image_to_table(img0, self.voxel_cfg),
             image_to_table(img1, self.voxel_cfg)], axis=-1)
        flow_tab = image_to_table(grid_flow_img, self.voxel_cfg)
        flow = self.head(before_tab, flow_tab, info0, plan0, train)

        return {
            "flow": flow.astype(jnp.float32),
            "pose_flow": pose_flow,
            "pc0_valid": info0.valid,
            "pc1_valid": info1.valid,
            "pc0_points": info0.points,
            "pc1_points": info1.points,
        }


def build_model(model_cfg, precision: str = "fp32",
                num_frames: int = 2) -> DeFlow:
    """Instantiate from a composed config's ``model.target`` node
    (the Hydra ``_target_`` contract, reference conf/model/*.yaml)."""
    target = model_cfg.target if "target" in model_cfg else model_cfg
    dtype = jnp.bfloat16 if str(precision) in ("bf16", "bfloat16") else jnp.float32
    voxel_size = tuple(target.voxel_size)
    pc_range = tuple(target.point_cloud_range)
    # The reference's voxel-size ablations override ONLY voxel_size
    # (1_train.sh:74,78); the pseudoimage dims follow from range / voxel, so
    # derive them here and treat the config value as a cross-check only.
    gw, gh, _ = VoxelConfig(voxel_size, pc_range).grid_size
    cfg_grid = tuple(target.grid_feature_size)
    if cfg_grid != (gw, gh):
        print(f"note: grid_feature_size {cfg_grid} overridden by "
              f"voxel-derived {(gw, gh)}")
    return DeFlow(
        voxel_size=voxel_size,
        point_cloud_range=pc_range,
        grid_feature_size=(gw, gh),
        decoder_option=str(target.decoder_option),
        num_iters=int(target.num_iters),
        feat_channels=int(target.get("feat_channels", 32)),
        num_frames=max(2, int(num_frames)),
        dtype=dtype,
    )
