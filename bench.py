#!/usr/bin/env python
"""Headline benchmark: DeFlow leaderboard-config training throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference trains the leaderboard config
(model=deflow, bs=16, 15 epochs) in 6-8 h on 4x A100 (reference
README.md:64-66).  AV2 sensor train split ≈ 700 scenes × ~157 frame pairs
≈ 110k pairs/epoch, so at the 7 h midpoint the reference sustains
    15 × 110000 / (7·3600) ≈ 65.5 pairs/s over 4 A100 ≈ 16.4 pairs/s/A100.
``vs_baseline`` is our measured per-chip training throughput divided by that
per-A100 number (>1.0 = faster per chip than the reference's hardware).

Runs on the real TPU chip (axon); measures the steady-state jitted train step
(forward+backward+optimizer) on full-size inputs: 512x512 grid, bf16 compute,
batch 4/chip x 98304-point slots with ~86k valid points/frame (AV2-like
density after ground removal).  The slot budget is capacity planning, not a
workload cut: AV2 sensor frames carry 50-90k in-range non-ground points, the
reference processes exactly that ragged count (zero padding), and our static
shape only has to cover the max — 98304 = 86k + 14% headroom.  Every point of
the real cloud is processed either way; BENCH_N overrides.
"""

import json
import time

import numpy as np


def make_batch(batch: int, n: int, valid: int, seed: int = 0,
               dist: str = "uniform"):
    rng = np.random.default_rng(seed)

    def cloud():
        if dist == "skewed":
            # lidar-like radial density: heavy near-field concentration, so
            # pillar occupancy is strongly non-uniform (long sorted-scatter
            # spans near the sensor — the regime that flatters uniform clouds)
            r = np.clip(rng.gamma(2.0, 8.0, (batch, n)), 1.5, 51.0)
            th = rng.uniform(0, 2 * np.pi, (batch, n))
            return np.stack([r * np.cos(th), r * np.sin(th),
                             rng.uniform(-2.8, 2.8, (batch, n))], axis=-1)
        return np.stack([
            rng.uniform(-51, 51, (batch, n)),
            rng.uniform(-51, 51, (batch, n)),
            rng.uniform(-2.8, 2.8, (batch, n)),
        ], axis=-1)

    pc = lambda: np.where(
        (np.arange(n) < valid)[None, :, None], cloud(), 0.0).astype(np.float32)
    mask = np.tile((np.arange(n) < valid)[None], (batch, 1))
    pose0 = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    pose1 = pose0.copy()
    pose1[:, 0, 3] = 1.3
    hb = {
        "pc0": pc(), "pc1": pc(), "pose0": pose0, "pose1": pose1,
        "pc0_mask": mask, "pc1_mask": mask.copy(),
        "flow": rng.normal(0, 0.2, (batch, n, 3)).astype(np.float32),
        "flow_is_valid": mask.copy(),
        "flow_category_indices": rng.integers(0, 30, (batch, n)).astype(np.int32),
        # DUFO dynamic/static labels (SeFlow SSL training, process.py output)
        "dufo_label0": (rng.random((batch, n)) < 0.15).astype(np.int32),
        "dufo_label1": (rng.random((batch, n)) < 0.15).astype(np.int32),
    }
    # production data path: ragged bookkeeping (bin + sort + inverse perm)
    # happens on the host (C++), the device consumes ids/permutations
    from deflow_tpu.data.host_prep import attach_host_prep

    return attach_host_prep(hb, [0.2, 0.2, 6.0],
                            [-51.2, -51.2, -3.0, 51.2, 51.2, 3.0], sort=True)


def bench_eval(model, state, dev_batch, batch: int, n: int, mesh):
    """Eval-mode throughput: jitted forward (no grad/optimizer) pairs/s/chip
    plus per-frame submission serialization (v2 feather of all raw points +
    stored-zip append — the production write_submission path), extrapolated
    to the 15.7k-pair AV2 val split.  ``vs_baseline`` is against the
    reference's eval budget rate: AV2 val ≤ 1 h on one GPU
    (reference assets/slurm/2_eval.sh) ⇒ 15.7k/3600 ≈ 4.36 pairs/s."""
    import io
    import zipfile

    import jax

    from deflow_tpu import trainer as T
    from deflow_tpu.entry.evaluate import encode_submission_frame

    eval_step = T.jit_eval_step(T.make_eval_step(model), mesh)

    def run(k):
        for _ in range(k):
            out = eval_step(state.params, state.batch_stats, dev_batch)
        float(out["pred_flow"][0, 0, 0])  # tunnel-safe drain
        return out

    t0 = time.perf_counter(); run(1); t_c = time.perf_counter() - t0  # compile
    run(1)
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter(); out = run(iters); tk = time.perf_counter() - t0
    dt = max(tk - t1, 1e-9) / (iters - 1)
    device_pairs_per_sec = batch / dt

    # host submission serialization: one v2 feather frame of all raw points
    # through the production encoder + stored-zip append (write_submission)
    flow = np.asarray(jax.device_get(out["pred_flow"][0])).astype(np.float32)
    pose_flow = np.asarray(jax.device_get(out["pose_flow"][0])).astype(np.float32)
    valid = np.ones(n, bool)
    zf = zipfile.ZipFile(io.BytesIO(), "w", zipfile.ZIP_STORED)
    zf.writestr("warm.feather",
                encode_submission_frame(flow, pose_flow, valid, version=2))
    t0 = time.perf_counter()
    reps = 10
    for i in range(reps):
        zf.writestr(f"f{i}.feather",
                    encode_submission_frame(flow, pose_flow, valid, version=2))
    ser_per_frame = (time.perf_counter() - t0) / reps
    zf.close()

    # pipeline rate: the submission writer dispatches batch k+1 before
    # serializing batch k (entry/evaluate.py::write_submission), so the
    # steady state is bounded by the SLOWER stage, not the sum
    pair_s = 1.0 / max(1.0 / device_pairs_per_sec, ser_per_frame)
    serial_s = 1.0 / (1.0 / device_pairs_per_sec + ser_per_frame)
    budget_rate = 15700 / 3600.0
    print(json.dumps({
        "metric": "eval_frame_pairs_per_sec_per_chip",
        "value": round(pair_s, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pair_s / budget_rate, 3),
        "device_pairs_per_sec": round(device_pairs_per_sec, 3),
        "serialize_ms_per_frame": round(ser_per_frame * 1e3, 3),
        "serial_bound_pairs_per_sec": round(serial_s, 3),
        "av2_val_minutes": round(15700 / pair_s / 60.0, 2),
        "compile_s": round(t_c, 1),
    }))


def main():
    import os

    import jax

    # Persistent compile cache: first-ever run pays the (slow, tunneled)
    # XLA compile; every later bench run starts hot.
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deflow_tpu.config import compose
    from deflow_tpu.models import build_model
    from deflow_tpu import trainer as T

    # BENCH_BS: per-chip batch (default 4 = the reference's per-GPU batch).
    # BENCH_DIST=skewed: realistic near-field-heavy radial point density
    # (guards the scatter numbers against uniform-cloud flattery); the
    # default stays uniform for cross-round comparability.
    batch, n, valid = (int(os.environ.get("BENCH_BS", 4)),
                       int(os.environ.get("BENCH_N", 98304)), 86016)
    dist = os.environ.get("BENCH_DIST", "uniform")
    # BENCH_LOSS=seflowLoss benchmarks full-scale self-supervised (SeFlow)
    # training: grid-chamfer SSL loss, no gt flow consumed.
    loss_fn = os.environ.get("BENCH_LOSS", "deflowLoss")
    # BENCH_MODEL=fastflow3d benches the linear-decoder family (reference
    # README.md:68); default is the flagship DeFlow GRU config.
    model_name = os.environ.get("BENCH_MODEL", "deflow")
    cfg = compose("config", [f"model={model_name}", f"batch_size={batch}",
                             "lr=2e-4", f"loss_fn={loss_fn}",
                             "precision=bf16"])
    model = build_model(cfg.model, precision="bf16")
    host_batch = make_batch(batch, n, valid, dist=dist)

    mesh = T.create_mesh(1)
    state = T.init_state(model, cfg, host_batch, seed=0)
    state = jax.device_put(state, T.replicated(mesh))
    dev_batch = T.device_batch(host_batch, mesh)

    # BENCH_MODE=eval: steady-state jitted INFERENCE step + host submission
    # serialization, extrapolated to the AV2 val sweep (~15.7k frame pairs)
    # against the reference's ≤1 h budget (reference assets/slurm/2_eval.sh).
    if os.environ.get("BENCH_MODE", "train") == "eval":
        return bench_eval(model, state, dev_batch, batch, n, mesh)

    step = T.jit_train_step(T.make_train_step(model, loss_fn, mesh=mesh), mesh)

    # NOTE: jax.block_until_ready is unreliable through the axon tunnel (it
    # returns before device work drains); a host fetch of a scalar is the only
    # trustworthy sync point.  Differential timing removes the fetch latency.
    def run(k):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(k):
            state, aux = step(state, dev_batch)
        float(aux["loss"])  # full drain
        return time.perf_counter() - t0

    run(1)          # compile + first step
    run(1)          # warm fetch path
    t1 = run(1)
    iters = 10
    tk = run(iters)
    dt = max(tk - t1, 1e-9) / (iters - 1)

    pairs_per_sec = batch / dt
    baseline_per_chip = 15 * 110000 / (7 * 3600) / 4  # ≈16.37 pairs/s/A100
    print(json.dumps({
        "metric": "train_frame_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
