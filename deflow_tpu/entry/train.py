"""``train.py`` entry point (reference README.md:66-74, 1_train.sh:28-34).

CLI contract: ``python train.py model=deflow lr=2e-4 epochs=15 batch_size=16
loss_fn=deflowLoss`` plus nested/list overrides — composed by the
Hydra-compatible engine in deflow_tpu.config.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from deflow_tpu.config import Config, from_cli
from deflow_tpu.data import DataLoader, HDF5Dataset
from deflow_tpu.models import build_model
from deflow_tpu import trainer as T
from deflow_tpu.utils import MetricLogger, StageTimer
from deflow_tpu.entry.evaluate import run_validation


class DynCapMonitor:
    """Continuous host-side dyn_cap validation over EVERY SSL batch: points
    beyond an explicit compacted f-term budget (NNSpec.dyn_cap; default =
    no compaction) silently lose their dynamic-chamfer gradient, so a
    denser-than-expected DUFO labeling — even one appearing late in
    training as scene mix shifts — should be loud, not a quiet
    training-quality regression.  The per-batch cost is two numpy mask
    reductions (~1 ms at bs=16); repeated warnings are deduped by only
    re-warning when a batch sets a new running maximum.

    ``dyn_cap`` mirrors the resolution in ``losses.seflow_loss``: explicit
    arg, else the ``DEFLOW_SSL_DYNCAP`` env override, else no compaction
    (cap = N, which can never overflow — the monitor is then a no-op)."""

    def __init__(self, dyn_cap: Optional[int] = None):
        if dyn_cap is None:
            env_cap = os.environ.get("DEFLOW_SSL_DYNCAP")
            if env_cap is not None and int(env_cap):
                dyn_cap = int(env_cap)
        self.dyn_cap = dyn_cap
        self._warned_max = 0
        self.seen_max = 0

    def check(self, host_batch: dict) -> None:
        import warnings

        from deflow_tpu.ops.chamfer import NNSpec, _dyn_cap_for

        for side in ("0", "1"):
            dufo = host_batch.get(f"dufo_label{side}")
            mask = host_batch.get(f"pc{side}_mask")
            if dufo is None or mask is None:
                continue
            counts = np.sum(np.asarray(mask) & (np.asarray(dufo) > 0), axis=-1)
            cap = _dyn_cap_for(NNSpec(method="grid", dyn_cap=self.dyn_cap),
                               int(np.asarray(mask).shape[-1]))
            m = int(counts.max())
            self.seen_max = max(self.seen_max, m)
            if m > cap and m > self._warned_max:
                self._warned_max = m
                warnings.warn(
                    f"dufo_label{side}: up to {m} dynamic points "
                    f"per sample exceed the SSL dyn_cap budget ({cap}); the "
                    f"extra points lose their dynamic-chamfer gradient "
                    f"(forward loss unaffected). Raise NNSpec.dyn_cap / "
                    f"seflow_loss(dyn_cap=) or re-check DUFO label density "
                    f"(ops.chamfer.dyn_cap_overflow_stats).")


def main(cfg: Optional[Config] = None) -> dict:
    from deflow_tpu.utils import enable_compile_cache

    enable_compile_cache()
    if cfg is None:
        cfg = from_cli()

    mesh = T.create_mesh(int(cfg.get("num_devices", -1)))
    n_dev = mesh.devices.size
    batch_size = int(cfg.batch_size)
    if batch_size % n_dev != 0:
        raise ValueError(
            f"batch_size={batch_size} must divide evenly over {n_dev} devices")

    train_ds = HDF5Dataset(
        str(cfg.train_data), max_points=int(cfg.max_points),
        remove_ground=bool(cfg.remove_ground),
        limit=int(cfg.get("overfit", 0)),
        num_frames=int(cfg.get("num_frames", 2)),
    )
    val_dir = str(cfg.val_data)
    val_ds = (
        HDF5Dataset(val_dir, max_points=int(cfg.max_points),
                    remove_ground=bool(cfg.remove_ground),
                    num_frames=int(cfg.get("num_frames", 2)))
        if os.path.isdir(val_dir) else None
    )
    from deflow_tpu.data.host_prep import attach_host_prep
    # sort=True: the loader ships every per-point array in ascending-pillar-id
    # order so the device runs zero permutes (losses are permutation-invariant)
    workers = int(cfg.get("num_workers", 0))
    post = (lambda b: attach_host_prep(
        b, list(cfg.voxel_size), list(cfg.point_cloud_range), sort=True,
        num_workers=workers))
    train_loader = DataLoader(train_ds, batch_size, shuffle=True,
                              seed=int(cfg.seed), post_collate=post,
                              num_workers=workers)

    model = build_model(cfg.model, precision=str(cfg.get("precision", "bf16")),
                        num_frames=int(cfg.get("num_frames", 2)))
    sample = next(iter(DataLoader(train_ds, batch_size, shuffle=False)))
    state = T.init_state(model, cfg, sample, seed=int(cfg.seed))
    state = jax.device_put(state, T.replicated(mesh))

    start_epoch = 0
    if cfg.get("resume"):
        state, start_epoch = T.load_checkpoint(str(cfg.resume), state)
        print(f"resumed from {cfg.resume} at epoch {start_epoch}")
    elif cfg.get("checkpoint"):
        state = T.load_weights(str(cfg.checkpoint), state)
        print(f"initialized weights from {cfg.checkpoint}")

    run_name = f"{cfg.model.name}-{cfg.slurm_id}"
    logger = MetricLogger(
        project=str(cfg.get("wandb_project", "deflow-tpu")), run_name=run_name,
        mode=str(cfg.wandb_mode), entity=str(cfg.get("wandb_entity", "")),
        output_dir=str(cfg.output_dir), config=cfg.to_dict(),
    )
    timer = StageTimer("Total")

    train_step = T.jit_train_step(
        T.make_train_step(model, str(cfg.loss_fn),
                          remat=bool(cfg.get("remat", False)), mesh=mesh),
        mesh)
    eval_step = T.jit_eval_step(T.make_eval_step(model), mesh)

    from deflow_tpu.losses import SSL_LOSS_REGISTRY
    is_ssl = str(cfg.loss_fn) in SSL_LOSS_REGISTRY
    monitor = str(cfg.model.get("val_monitor", "") or "")
    best_keeper = (T.BestCheckpointKeeper(
        logger.ckpt_dir, monitor,
        mode=str(cfg.get("val_monitor_mode", "min")))
        if monitor and val_ds is not None else None)

    epochs = int(cfg.epochs)
    dyn_cap_monitor = DynCapMonitor()
    log_every = int(cfg.get("log_every", 10))
    profile_steps = int(cfg.get("profile", 0))  # >0: trace this many steps
    frames_seen = 0
    global_it = 0
    t_train0 = time.perf_counter()
    final_metrics: dict = {}

    for epoch in range(start_epoch, epochs):
        # h2d runs one-plus batches ahead of the step in a background thread
        # (T.device_prefetch) — issued inline, a blocking transfer serializes
        # with the device step; "feed" below is the residual wait only.
        for i, (host_batch, batch) in enumerate(
                T.device_prefetch(train_loader, mesh)):
            if profile_steps and global_it == 2:  # skip compile steps
                jax.profiler.start_trace(os.path.join(logger.run_dir, "profile"))
            if profile_steps and global_it == 2 + profile_steps:
                jax.profiler.stop_trace()
                print(f"profile trace written to {logger.run_dir}/profile")
            global_it += 1
            if is_ssl and "dufo_label0" in host_batch:
                dyn_cap_monitor.check(host_batch)
            with timer.stage("step"):
                state, aux = train_step(state, batch)
            frames_seen += batch_size
            if i % log_every == 0:
                aux = jax.device_get(aux)
                elapsed = time.perf_counter() - t_train0
                logger.log({
                    "train/loss": float(aux["loss"]),
                    "train/epe": float(aux["epe"]),
                    "train/grad_norm": float(aux["grad_norm"]),
                    "train/frames_per_sec": frames_seen / elapsed,
                    "epoch": epoch,
                }, step=int(state.step))
                print(f"epoch {epoch} it {i} loss {float(aux['loss']):.4f} "
                      f"epe {float(aux['epe']):.4f}", flush=True)

        if val_ds is not None and (epoch + 1) % int(cfg.get("eval_every", 1)) == 0:
            metrics = run_validation(eval_step, state, val_ds, cfg, mesh)
            logger.log({f"val/{k}": v for k, v in metrics.items()},
                       step=int(state.step))
            final_metrics = metrics
            print(f"epoch {epoch} val EPE_3way_mean "
                  f"{metrics.get('EPE_3way_mean', float('nan')):.4f}", flush=True)
            if best_keeper is not None:
                path = best_keeper.update(metrics, state, epoch)
                if path:
                    logger.log({f"best/{monitor.split('/')[-1]}":
                                best_keeper.best}, step=int(state.step))
                    print(f"new best {monitor}={best_keeper.best:.4f}: {path}",
                          flush=True)

        if (epoch + 1) % int(cfg.get("ckpt_every", 1)) == 0:
            path = T.save_checkpoint(logger.ckpt_dir, state, epoch)
            print(f"saved checkpoint: {path}", flush=True)

    print(timer.report())
    logger.finish()
    train_ds.close()
    if val_ds is not None:
        val_ds.close()
    return final_metrics


if __name__ == "__main__":
    main()
