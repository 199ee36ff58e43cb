"""Training engine: optax + pjit data-parallel mesh + orbax checkpoints.

Replaces the reference's PyTorch-Lightning ``ModelWrapper`` + DDP/NCCL stack
(reference deflow.py:42-45 ownership contract, README.md:64,76-77; SURVEY.md
§2.4): one ``jax.sharding.Mesh`` with a single ``data`` axis, batch arrays
sharded on axis 0, parameters replicated.  Gradient averaging is XLA's
problem — the loss is a global mean over the sharded batch, so GSPMD inserts
the cross-device reduction over ICI automatically; there is no hand-written
collective anywhere.

Batch-norm note: under GSPMD the batch statistics are computed over the
*global* batch (equivalent to SyncBN).  The reference's DDP default is
per-GPU BN stats; global stats are strictly more consistent, and eval-mode
parity is unaffected (running stats are used there).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deflow_tpu.losses import SSL_LOSS_REGISTRY, get_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(cfg) -> optax.GradientTransformation:
    lr = float(cfg.lr)
    clip = float(cfg.get("gradient_clip", 0.0) or 0.0)
    opt_name = str(cfg.get("optimizer", "adam")).lower()
    if opt_name == "adam":
        tx = optax.adam(lr)
    elif opt_name == "adamw":
        tx = optax.adamw(lr)
    elif opt_name == "sgd":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {opt_name!r}")
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def create_mesh(num_devices: int = -1) -> Mesh:
    devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_BATCH_KEYS = ("pc0", "pc1", "pose0", "pose1", "pc0_mask", "pc1_mask",
               "ego_motion", "flow", "flow_is_valid", "flow_category_indices",
               "dufo_label0", "dufo_label1",
               # host-side ragged bookkeeping (data/host_prep.py) — keep in
               # lockstep with HOST_PREP_KEYS: a key missing here silently
               # drops that host-prep feature from the jitted step (the
               # sorted-record fast path was lost to exactly that once)
               "pc0_transformed",
               "pc0_ids", "pc0_order", "pc0_iperm", "pc0_sorted",
               "pc1_ids", "pc1_order", "pc1_iperm", "pc1_sorted",
               "pc0_sorted_rec", "pc1_sorted_rec",
               # SSL chamfer cell prep (host pc1 pre-sort for the cell-sweep
               # kernel; data/host_prep.py CHAMFER_CELL_KEYS)
               "pc1_cell_lanes", "pc1_cell_sid", "pc1_cell_start",
               # multi-frame history (num_frames > 2, loader pch{h} keys) —
               # generated for every h the loader could emit so a deep-history
               # config can't silently lose frames to this whitelist
               ) + tuple(
    k for h in range(1, 17)
    for k in (f"pch{h}", f"pch{h}_mask", f"pose_pch{h}"))


def history_from_batch(batch) -> "list | None":
    """Collect the loader's ``pch{h}`` history frames (num_frames > 2) into
    the model's ``history=`` argument; None for the 2-frame contract."""
    hist = []
    h = 1
    while f"pch{h}" in batch:
        hist.append({"pc": batch[f"pch{h}"], "mask": batch[f"pch{h}_mask"],
                     "pose": batch[f"pose_pch{h}"]})
        h += 1
    return hist or None


def device_batch(batch: Dict[str, np.ndarray], mesh: Optional[Mesh]) -> Dict[str, jnp.ndarray]:
    """Move the array part of a host batch onto the mesh (sharded on axis 0)."""
    out = {}
    for k in _BATCH_KEYS:
        if k in batch:
            v = batch[k]
            if mesh is not None:
                out[k] = jax.device_put(v, batch_sharding(mesh))
            else:
                out[k] = jnp.asarray(v)
    return out


def device_prefetch(loader, mesh: Optional[Mesh], depth: int = 2):
    """Iterate ``(host_batch, device_batch)`` with the h2d transfer running
    one-plus batches AHEAD of the consumer in a background thread.

    ``jax.device_put`` can block on the transfer (it does through remote-
    device links, where a full-scale batch costs ~1 s); issued inline it
    serializes with the train step and the device idles.  Overlapping it
    costs one thread and ``depth`` batches of HBM.  Same abandon-safe
    bounded-put idiom as the DataLoader's prefetch thread.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    abandoned = threading.Event()

    def worker():
        try:
            for hb in loader:
                item = (hb, device_batch(hb, mesh))
                while not abandoned.is_set():
                    try:
                        q.put(item, timeout=0.25)
                        break
                    except queue.Full:
                        continue
                if abandoned.is_set():
                    return
        except BaseException as e:  # surface loader/transfer errors
            item = e
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return
                except queue.Full:
                    continue
            return
        while not abandoned.is_set():
            try:
                q.put(sentinel, timeout=0.25)
                break
            except queue.Full:
                continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        abandoned.set()


def init_state(model, cfg, sample_batch: Dict[str, np.ndarray], seed: int = 0) -> TrainState:
    hist = None
    if getattr(model, "num_frames", 2) > 2:
        hist = history_from_batch(
            {k: jnp.asarray(v) for k, v in sample_batch.items()
             if k.startswith(("pch", "pose_pch"))})
    variables = model.init(
        jax.random.key(seed),
        jnp.asarray(sample_batch["pc0"]), jnp.asarray(sample_batch["pc1"]),
        jnp.asarray(sample_batch["pose0"]), jnp.asarray(sample_batch["pose1"]),
        jnp.asarray(sample_batch["pc0_mask"]), jnp.asarray(sample_batch["pc1_mask"]),
        train=True, history=hist,
    )
    tx = make_optimizer(cfg)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(params),
        tx=tx,
    )


def make_train_step(model, loss_name: str, remat: bool = False,
                    mesh: Optional[Mesh] = None) -> Callable:
    """``mesh`` (the same one later given to :func:`jit_train_step`) lets SSL
    losses shard_map their chamfer over the data axis — without it GSPMD
    all-gathers the batch around the grid chamfer's flat lax.sort."""
    is_ssl = loss_name in SSL_LOSS_REGISTRY
    loss_fn = SSL_LOSS_REGISTRY[loss_name] if is_ssl else get_loss(loss_name)
    if is_ssl:
        loss_fn = functools.partial(loss_fn, mesh=mesh)

    def forward(params, batch_stats, dropout_key, pc0, pc1, pose0, pose1,
                m0, m1, ego, host_prep=None, history=None):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            pc0, pc1, pose0, pose1, m0, m1,
            ego_motion=ego, train=True, mutable=["batch_stats"],
            host_prep=host_prep, history=history,
            rngs={"dropout": dropout_key},
        )

    if remat:
        # rematerialize the forward during backprop: trades FLOPs for HBM so
        # bigger per-chip batches fit (cfg.remat)
        forward = jax.checkpoint(forward)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        from deflow_tpu.data.host_prep import host_prep_from_batch

        # step-derived dropout stream (only the mmhead ablation consumes it;
        # torch default dropout=0.1, reference decoder.py:18)
        dropout_key = jax.random.fold_in(jax.random.key(42), state.step)

        def compute_loss(params):
            out, mutated = forward(
                params, state.batch_stats, dropout_key,
                batch["pc0"], batch["pc1"], batch["pose0"], batch["pose1"],
                batch["pc0_mask"], batch["pc1_mask"],
                batch.get("ego_motion"), host_prep_from_batch(batch),
                history_from_batch(batch) if model.num_frames > 2 else None,
            )
            if is_ssl:
                # self-supervised (SeFlow family): geometry + DUFO labels,
                # no gt flow required
                loss = loss_fn(out, batch)
                mask = out["pc0_valid"] & batch["pc0_mask"]
                aux = {
                    "loss": loss,
                    "epe": jnp.zeros(()),  # no gt to compare against
                    "valid_points": jnp.sum(mask),
                }
                return loss, (mutated["batch_stats"], aux)
            # Network target: total gt flow minus rigid ego flow (the model's
            # output composition, reference deflow.py:74,103-105).
            target = batch["flow"] - out["pose_flow"]
            mask = out["pc0_valid"] & batch["flow_is_valid"]
            loss = loss_fn(out["flow"], target, mask,
                           batch.get("flow_category_indices"))
            aux = {
                "loss": loss,
                "epe": jnp.sum(jnp.where(
                    mask, jnp.linalg.norm(out["flow"] - target, axis=-1), 0.0))
                / jnp.maximum(jnp.sum(mask), 1),
                "valid_points": jnp.sum(mask),
            }
            return loss, (mutated["batch_stats"], aux)

        grads, (new_stats, aux) = jax.grad(compute_loss, has_aux=True)(state.params)
        aux["grad_norm"] = optax.global_norm(grads)
        return state.apply_gradients(grads, new_stats), aux

    return train_step


def make_eval_step(model) -> Callable:
    def eval_step(params, batch_stats, batch):
        from deflow_tpu.data.host_prep import host_prep_from_batch

        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["pc0"], batch["pc1"], batch["pose0"], batch["pose1"],
            batch["pc0_mask"], batch["pc1_mask"],
            ego_motion=batch.get("ego_motion"),
            train=False, host_prep=host_prep_from_batch(batch),
            history=(history_from_batch(batch)
                     if model.num_frames > 2 else None),
        )
        # Final predicted flow: network flow at voxel-valid points plus the
        # rigid ego flow everywhere (invalid points carry pose_flow only —
        # the reference's eval composition, SURVEY.md §3.2).
        total = out["pose_flow"] + jnp.where(
            out["pc0_valid"][..., None], out["flow"], 0.0)
        return {"pred_flow": total, "net_flow": out["flow"],
                "pose_flow": out["pose_flow"], "pc0_valid": out["pc0_valid"]}

    return eval_step


def jit_train_step(train_step, mesh: Optional[Mesh]):
    if mesh is None:
        return jax.jit(train_step, donate_argnums=0)
    shard = batch_sharding(mesh)
    repl = replicated(mesh)
    return jax.jit(
        train_step,
        donate_argnums=0,
        in_shardings=(repl, shard),
        out_shardings=(repl, repl),
    )


def jit_eval_step(eval_step, mesh: Optional[Mesh]):
    if mesh is None:
        return jax.jit(eval_step)
    shard = batch_sharding(mesh)
    repl = replicated(mesh)
    return jax.jit(eval_step, in_shardings=(repl, repl, shard), out_shardings=shard)


# ---------------------------------------------------------------- checkpoints
def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    name: Optional[str] = None) -> str:
    """Orbax checkpoint per epoch, mirroring the reference's per-epoch
    ``epoch_N_<model>.ckpt`` retention (reference README.md:76-77).
    ``name`` overrides the directory name (e.g. ``best``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name or f"epoch_{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }, force=True)
    ckptr.wait_until_finished()
    return path


class BestCheckpointKeeper:
    """Retain the best checkpoint by a monitored validation metric — the
    reference's Lightning ``ModelCheckpoint(monitor=...)`` behavior
    (``conf/model/*.yaml`` ``val_monitor``, reference README.md:76-77).

    ``monitor`` is the logged name (e.g. ``val/EPE_3way_mean``); the metric
    dict is keyed without the ``val/`` prefix.  ``mode='min'`` (EPE-style)
    or ``'max'``."""

    def __init__(self, ckpt_dir: str, monitor: str, mode: str = "min"):
        if mode not in ("min", "max"):
            raise ValueError(f"val_monitor mode must be min|max, got {mode!r}")
        self.ckpt_dir = ckpt_dir
        self.key = monitor.split("/")[-1]
        self.mode = mode
        self.best: Optional[float] = None

    def update(self, metrics: Dict[str, Any], state: TrainState,
               epoch: int) -> Optional[str]:
        """Save ``<ckpt_dir>/best`` iff the monitored metric improved;
        returns the path when it did, else None."""
        if self.key not in metrics:
            return None
        v = float(metrics[self.key])
        improved = self.best is None or (
            v < self.best if self.mode == "min" else v > self.best)
        if not improved:
            return None
        self.best = v
        return save_checkpoint(self.ckpt_dir, state, epoch, name="best")


def load_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0, "epoch": 0,
    }
    restored = ckptr.restore(os.path.abspath(path), target)
    return state.replace(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    ), int(restored["epoch"])


def load_weights(path: str, state: TrainState) -> TrainState:
    """Load weights from either an orbax dir or a torch ``.ckpt`` file."""
    if path.endswith(".ckpt") or path.endswith(".pth") or path.endswith(".pt"):
        from deflow_tpu.convert import convert_checkpoint, merge_into_variables

        merged = merge_into_variables(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)},
            convert_checkpoint(path),
        )
        return state.replace(params=merged["params"],
                             batch_stats=merged["batch_stats"])
    new_state, _ = load_checkpoint(path, state)
    return new_state
