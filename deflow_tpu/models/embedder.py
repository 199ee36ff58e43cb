"""DynamicEmbedder: dynamic pillar voxelization + PointNet-lite feature net.

The reference imports ``DynamicEmbedder`` (reference deflow.py:16,27-30) which
wraps mmcv/mmdet3d's dynamic voxelization + ``DynamicPillarFeatureNet`` +
``PointPillarsScatter`` CUDA path (reference README.md:38; SURVEY.md §2.2).
Behavior rebuilt here, TPU-first:

- points keep fixed ``[B, N]`` slots with a validity mask instead of being
  compacted (static shapes for XLA; reference's ragged per-sample loops at
  deflow.py:60 are gone),
- per-point 9-d feature = [xyz, xyz - pillar centroid, xyz - pillar center]
  (mmdet3d DynamicPillarFeatureNet with cluster+voxel center, in_channels=3),
- Linear(9→C, no bias) + BatchNorm1d(eps=1e-3, momentum=0.01) + ReLU, where
  the batch statistics run over *valid points only* (the reference normalizes
  compacted points) — hence the masked batch-norm below,
- mean-scatter into the [H, W, C] pseudoimage (``DynamicScatter(avg)`` +
  ``PointPillarsScatter`` semantics; empty pillars are exact zeros).

Returned ``PillarInfo`` carries the static-shape analog of the reference's
``voxel_info`` dicts {points, point_idxes, point_offsets, voxel_coords}
(reference deflow.py:97-101, decoder.py:65-66).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from deflow_tpu.ops.voxel import (
    TRASH_PAD,
    PillarInfo,
    VoxelConfig,
    _table_to_image,
    _use_pallas,
    compute_pillar_info,
    make_batched_scatter_plan,
    make_host_scatter_plan,
    make_presorted_plan,
    pillar_centroids_batched,
    pillar_info_from_ids,
    pillar_max_scatter,
    pillar_mean_scatter_batched,
    segment_sum_batched,
)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid subset of a padded [..., C] point buffer.

    Mirrors torch ``BatchNorm1d`` applied to compacted points: batch mean/var
    are computed only over ``mask``-true rows; running stats updated the torch
    way (``ra = (1 - momentum) * ra + momentum * batch``, unbiased var into
    running_var, biased var used for normalization).
    """

    momentum: float = 0.01
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if train:
            m = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(m), 1.0)
            xf = x.astype(jnp.float32) * m
            mean = jnp.sum(xf, axis=tuple(range(x.ndim - 1))) / n
            diff = (x.astype(jnp.float32) - mean) * m
            var = jnp.sum(diff * diff, axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(self.dtype)


class PillarFeatureNet(nn.Module):
    """Linear(9→C, bias-free) + masked BN + ReLU per point.

    Torch twin: ``feature_net.pfn_layers.0`` = Sequential(Linear, BatchNorm1d,
    ReLU) in mmdet3d's DynamicPillarFeatureNet.
    """

    feat_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats9: jnp.ndarray, mask: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        x = nn.Dense(self.feat_channels, use_bias=False, dtype=self.dtype, name="linear")(feats9)
        x = MaskedBatchNorm(dtype=self.dtype, name="norm")(x, mask, train)
        x = nn.relu(x)
        return jnp.where(mask[..., None], x, 0.0)


class DynamicEmbedder(nn.Module):
    """Point cloud [B, N, 3] + mask [B, N] → pseudoimage [B, H, W, C] + PillarInfo."""

    voxel_cfg: VoxelConfig
    feat_channels: int = 32
    scatter_mode: str = "avg"  # avg | max (DynamicScatter mode)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, points: jnp.ndarray, mask: jnp.ndarray, train: bool = False,
        host: "dict | None" = None,
    ):
        """Returns (pseudoimage, PillarInfo, ScatterPlan-or-None); the plan is
        reused by the decoder gather's Pallas backward.

        ``host`` optionally carries host-computed ragged bookkeeping
        ({'ids', 'order', 'sorted_id'}, each [B, N] int32 from
        utils/native.pillar_prep): pillar ids become the source of truth and
        the device spends zero time on binning validity or argsorts."""
        cfg = self.voxel_cfg
        pfn = PillarFeatureNet(
            self.feat_channels, dtype=self.dtype, name="feature_net")

        if host is not None:
            info = jax.vmap(
                lambda p, m, i: pillar_info_from_ids(p, m, i, cfg)
            )(points, mask, host["ids"])
            if "order" in host:
                # points arrive in original order: the decoder plan permutes;
                # the sorted RECORD below still needs a presorted plan
                plan = make_host_scatter_plan(
                    host["order"], host["sorted_id"], info.pillar_id,
                    cfg.num_pillars + TRASH_PAD)
                rec_plan = make_presorted_plan(
                    host["sorted_id"], cfg.num_pillars + TRASH_PAD)
            else:  # batch shipped presorted: ids ARE ascending, no permutes
                plan = make_presorted_plan(
                    host["sorted_id"], cfg.num_pillars + TRASH_PAD)
                rec_plan = plan
            if ("sorted_rec" in host and _use_pallas()
                    and self.scatter_mode != "max"):
                # Fully sorted compute: the host shipped the point record in
                # ascending-id order, so neither scatter needs a permute and
                # every pillar-table access has ascending indices.  Point
                # coordinates carry no gradient, so no inverse permutation is
                # needed anywhere.
                image = self._sorted_image(host, cfg, pfn, rec_plan, train)
                return image.astype(self.dtype), info, plan
        else:
            info = jax.vmap(lambda p, m: compute_pillar_info(p, m, cfg))(points, mask)
            # one sort shared by the centroid and feature scatters (TPU path);
            # bf16 models run the (centered-coordinate) centroid scatter in bf16
            plan = make_batched_scatter_plan(info.pillar_id, cfg.num_pillars + TRASH_PAD)
        _, cluster = pillar_centroids_batched(
            info, cfg, plan, compute_dtype=self.dtype)
        feats9 = jnp.concatenate([info.points, cluster, info.offsets], axis=-1)

        point_feats = pfn(feats9, info.valid, train)

        if self.scatter_mode == "max":
            image = jax.vmap(lambda f, i: pillar_max_scatter(f, i, cfg))(
                point_feats, info)
        else:
            image = pillar_mean_scatter_batched(point_feats, info, cfg, plan)
        return image.astype(self.dtype), info, plan

    def _sorted_image(self, host, cfg, pfn, pre, train):
        """Pseudoimage from the host-sorted record (zero device permutes).

        The 9-lane record IS the PFN input ([xyz | cluster | center-offset],
        host-computed centroids — utils/native.sorted_record), so the only
        device-side scatter left is the feature pass; ``pre`` is the caller's
        presorted ScatterPlan over the record's ids."""
        feats9_s = host["sorted_rec"]
        ids_s = host["sorted_id"]
        valid_s = ids_s < cfg.num_pillars

        point_feats_s = pfn(feats9_s, valid_s, train)

        fdata = jnp.concatenate(
            [point_feats_s, valid_s.astype(point_feats_s.dtype)[..., None]],
            axis=-1)
        fsums = segment_sum_batched(fdata, ids_s, cfg.num_pillars + TRASH_PAD, pre)
        c = point_feats_s.shape[-1]
        # stop_gradient on the count denominator: its cotangent is
        # structurally DEAD (it flows back only into the bool→float cast of
        # valid_s, which has no tangent) yet XLA materialized ~4.4 ms/step
        # of max-VJP tie-handling selects + [B, P, 1] lane-padded buffers
        # (256 MB physical each) and count-lane cotangent merges for it.
        # Live gradients (g / den into the feature lanes) are bit-identical.
        den = jax.lax.stop_gradient(
            jnp.maximum(fsums[:, : cfg.num_pillars, c:], 1.0))
        pillar_feats = fsums[:, : cfg.num_pillars, :c] / den
        return _table_to_image(pillar_feats, cfg)
