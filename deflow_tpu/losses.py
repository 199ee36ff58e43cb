"""Scene-flow training losses: deflowLoss / ff3dLoss / zeroflowLoss.

Named by the reference CLI contract ``loss_fn={deflowLoss,ff3dLoss,
zeroflowLoss}`` (reference README.md:66-68, assets/slurm/1_train.sh:53-60).
The loss bodies live in the absent OpenSceneFlow submodule [T3 —
SURVEY.md §2.2]; semantics are implemented from the papers:

- ``deflowLoss`` (DeFlow, arXiv:2401.16122 §III-D): per-point L2 flow error,
  bucketed by ground-truth speed (static < 0.4 m/s, 0.4–1.0 m/s, dynamic
  > 1.0 m/s at the 0.1 s sweep interval); the loss is the SUM of the three
  bucket means, so rare fast movers are not drowned out by the static
  majority.  Empty buckets contribute zero (the reference skips NaN means).
- ``ff3dLoss`` (FastFlow3D, Jund et al.): per-point L2 downweighted 10x on
  background-class points: weight = 0.1 + 0.9 * is_foreground.
- ``zeroflowLoss`` (ZeroFlow, Vedder et al. §4): per-point L2 scaled by
  clamp(speed, 0.1, 1.0) — a continuous importance ramp for fast movers,
  used when distilling from pseudo-labels.

All losses operate on the *network* flow: targets are total ground-truth flow
minus the rigid ego ``pose_flow`` (the reference trainer subtracts pose_flow
before the loss, matching model output composition at reference
deflow.py:74,103-105).  Everything is masked, static-shape jnp — no
compaction.

Inputs (all [B, N, ...]):
    pred:  [B, N, 3] network flow
    gt:    [B, N, 3] target (total gt flow − pose_flow)
    mask:  [B, N]    points that are real, in-range AND have valid gt flow
    classes: [B, N] int32 AV2 category index (0 = background) — ff3dLoss only
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

_SWEEP_DT = 0.1  # AV2 lidar sweep interval (s): flow [m] / 0.1 s = speed [m/s]


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over mask-true entries; exact 0 when the mask is empty."""
    s = jnp.sum(jnp.where(mask, x, 0.0))
    n = jnp.sum(mask)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)


def _epe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(pred - gt, axis=-1)


def deflow_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    classes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    err = _epe(pred, gt)
    speed = jnp.linalg.norm(gt, axis=-1) / _SWEEP_DT
    slow = mask & (speed < 0.4)
    mid = mask & (speed >= 0.4) & (speed <= 1.0)
    fast = mask & (speed > 1.0)
    return _masked_mean(err, slow) + _masked_mean(err, mid) + _masked_mean(err, fast)


def ff3d_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    classes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    err = _epe(pred, gt)
    if classes is None:
        weight = jnp.ones_like(err)
    else:
        weight = 0.1 + 0.9 * (classes > 0).astype(err.dtype)
    return _masked_mean(err * weight, mask)


def zeroflow_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    classes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    err = _epe(pred, gt)
    speed = jnp.linalg.norm(gt, axis=-1) / _SWEEP_DT
    scale = jnp.clip(speed, 0.1, 1.0)
    return _masked_mean(err * scale, mask)


LOSS_REGISTRY: Dict[str, Callable] = {
    "deflowLoss": deflow_loss,
    "ff3dLoss": ff3d_loss,
    "zeroflowLoss": zeroflow_loss,
}


def get_loss(name: str) -> Callable:
    if name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss_fn {name!r}; options: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name]


# ------------------------------------------------------------------ SSL losses
def seflow_loss(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    truncate: float = 2.0,
    chamfer_method: str = "auto",
    mesh=None,
    dyn_cap=None,
) -> jnp.ndarray:
    """SeFlow self-supervised loss (arXiv:2407.01702 §IV) [T3 semantics].

    Needs no gt flow; supervision comes from geometry + DUFO dynamic labels
    (``process.py``):
      1. chamfer term: pc0 warped by the predicted total flow should match
         pc1 (truncated at ``truncate`` m);
      2. static term: DUFO-static points should carry zero net flow (their
         motion is fully explained by ego motion);
      3. dynamic chamfer term: DUFO-dynamic points, warped, should find
         dynamic structure in pc1 (matches within the dynamic subset).

    Signature differs from the supervised losses: SSL losses consume the raw
    model output dict + batch (total flow = net + pose_flow).
    """
    from deflow_tpu.ops.chamfer import chamfer_distance

    net = out["flow"]
    total = out["pose_flow"] + net
    pc0, pc1 = batch["pc0"], batch["pc1"]
    m0 = out["pc0_valid"] & batch["pc0_mask"]
    m1 = out["pc1_valid"] & batch["pc1_mask"]
    dufo0 = batch.get("dufo_label0")
    dufo1 = batch.get("dufo_label1")

    warped = pc0 + total
    t2 = truncate * truncate

    def _rows_mean(x, m):
        """Per-sample masked mean: [B, N] × [B, N] → [B]."""
        s = jnp.sum(jnp.where(m, x, 0.0), axis=-1)
        n = jnp.sum(m, axis=-1)
        return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)

    # one batched chamfer instead of a per-sample Python loop: [B, N]/[B, M].
    # At full AV2 scale (131k² pairs) "auto" takes the coarse-grid search —
    # exact for the truncated loss, ~linear instead of quadratic.  With DUFO
    # labels the grid path fuses the all-points and dynamic-only chamfer
    # terms into ONE sweep per direction (~55% of two separate calls).
    from deflow_tpu.ops.chamfer import (_AUTO_GRID_PAIRS, _resolve_spec,
                                        ssl_chamfer_distances)

    n, m = warped.shape[-2], pc1.shape[-2]
    use_grid = (chamfer_method == "grid"
                or (chamfer_method == "auto" and n * m > _AUTO_GRID_PAIRS))
    if dufo0 is not None and dufo1 is not None and use_grid:
        # dyn_cap: static row budget for the dynamic-term VJP (see
        # NNSpec.dyn_cap); None = N (no compaction — measured faster).
        # DEFLOW_SSL_DYNCAP overrides for A/B benching (0 = uncompacted).
        import os as _os

        env_cap = _os.environ.get("DEFLOW_SSL_DYNCAP")
        if dyn_cap is None and env_cap is not None:
            dyn_cap = int(env_cap) or n
        spec = _resolve_spec("grid", n, m, truncate, None)
        if dyn_cap is not None:
            spec = spec._replace(dyn_cap=int(dyn_cap))
        dyn0 = m0 & (dufo0 > 0)
        dyn1 = m1 & (dufo1 > 0)
        # Host-prepped pc1 cell sort (loader chamfer_cell_prep): saves the
        # device-side pc1 sort + start-table searchsorted (~4 ms/step at
        # 4x98304 on v5e).  Gated on the start-table width matching this
        # spec's grid — a custom truncate/cell falls back to device sorting.
        host_c1 = None
        if "pc1_cell_lanes" in batch:
            from deflow_tpu.ops.chamfer import _grid_dims

            gx, gy = _grid_dims(spec)
            if int(batch["pc1_cell_start"].shape[-1]) == (gy + 1) * gx + 1:
                host_c1 = (batch["pc1_cell_lanes"], batch["pc1_cell_sid"],
                           batch["pc1_cell_start"])
        # NOTE (round 5, measured dead end): a fused sorted-space variant
        # that computed the four per-sample TRUNCATED SUMS directly in
        # sorted-query order (no unsort sorts, no [B,N] distance
        # materializations, hand-written matched-pair VJP) lost ~8% on v5e
        # in a same-process A/B (ssl4 26.9 vs 29.2 pairs/s, skewed 25.5 vs
        # 27.8, repeats ±0.1) even after packing its per-row metadata into
        # the kernel's spare q-slab lanes: the per-sample select/reduce
        # passes + gather-free mirror scatters cost more than the two ~1 ms
        # payload unsorts they replace.  Keep the unsorted distances path.
        def chamfer_terms(w, p1, a0, a1, y0, y1, hc1):
            d0, d1, dd0, dd1 = ssl_chamfer_distances(
                w, p1, a0, a1, y0, y1, truncate=truncate, spec=spec,
                host_c1=hc1)
            return (_rows_mean(jnp.minimum(d0, t2), a0)
                    + _rows_mean(jnp.minimum(d1, t2), a1)
                    + _rows_mean(jnp.minimum(dd0, t2), y0)
                    + _rows_mean(jnp.minimum(dd1, t2), y1))

        if mesh is not None and mesh.devices.size > 1:
            # The grid chamfer's flat-batch lax.sort spans the whole batch;
            # under GSPMD a batch-sharded sort becomes a cross-device
            # all-gather.  Samples are independent (per-sample id offsets),
            # so shard_map over the data axis keeps every sort local to its
            # chip — same values, zero collectives inside the loss.
            from jax import shard_map
            from jax.sharding import PartitionSpec as _P

            terms_fn = shard_map(
                chamfer_terms, mesh=mesh,
                in_specs=(_P("data"),) * 6 + (
                    None if host_c1 is None else (_P("data"),) * 3,),
                out_specs=_P("data"), check_vma=False)
        else:
            terms_fn = chamfer_terms
        terms = terms_fn(warped, pc1, m0, m1, dyn0, dyn1, host_c1)
        static = m0 & (dufo0 == 0)
        terms = terms + _rows_mean(jnp.sum(net ** 2, axis=-1), static)
        return jnp.mean(terms)

    d0, d1 = chamfer_distance(warped, pc1, m0, m1,
                              method=chamfer_method, truncate=truncate)
    terms = (_rows_mean(jnp.minimum(d0, t2), m0)
             + _rows_mean(jnp.minimum(d1, t2), m1))
    if dufo0 is not None:
        static = m0 & (dufo0 == 0)
        terms = terms + _rows_mean(jnp.sum(net ** 2, axis=-1), static)
        if dufo1 is not None:
            dyn0 = m0 & (dufo0 > 0)
            dyn1 = m1 & (dufo1 > 0)
            dd0, dd1 = chamfer_distance(warped, pc1, dyn0, dyn1,
                                        method=chamfer_method,
                                        truncate=truncate)
            terms = terms + (_rows_mean(jnp.minimum(dd0, t2), dyn0)
                             + _rows_mean(jnp.minimum(dd1, t2), dyn1))
    return jnp.mean(terms)


SSL_LOSS_REGISTRY: Dict[str, Callable] = {
    "seflowLoss": seflow_loss,
}
