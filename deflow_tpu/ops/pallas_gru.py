"""Pallas TPU kernel: fused iterative ConvGRU (DeFlow decoder hot loop).

The DeFlow head iterates a pointwise GRU ``num_iters`` times over ~524k
points (reference decoder.py:141-199).  Unfused, every iteration round-trips
h/z/r/q through HBM (~0.6 GB/iter each way); fused, ``h`` lives in VMEM for
all iterations and the point buffer streams through the chip exactly once.

Layout: everything is padded to 128-lane blocks.  The concatenated GRU input
``hx = [h | x]`` is materialized as [TILE, 2H] with ``x`` pre-padded to H
lanes and the weight matrices zero-padded to [2H, ·] rows, so every matmul is
(TILE, 2H) x (2H, ·) on the MXU with f32 accumulation.

The backward kernel recomputes the forward per tile (activations stay in VMEM
scratch — classic remat) and accumulates weight gradients across the
sequential grid into constant-index output blocks.

Exposed as :func:`fused_gru` with a custom VJP; the decoder falls back to the
unrolled XLA loop off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512
H = 128          # hidden dim (2 x pseudoimage_channels, reference decoder.py:149)


def _sigmoid(v):
    return jax.nn.sigmoid(v)


def _fwd_iters(h, xp, w_zr, b_zr, w_q, b_q, num_iters, collect=False,
               mm_dtype=jnp.float32):
    """Shared forward recurrence on one [TILE, H] block; optionally collects
    per-iteration (h_in, z, r, q) for the backward pass.

    ``mm_dtype=bfloat16`` (used when the model runs bf16): matmul operands
    round to bf16 for the native single-pass MXU path (f32 accumulation);
    gates/state stay f32 on the VPU."""
    saved = []
    wzr_m = w_zr.astype(mm_dtype)
    wq_m = w_q.astype(mm_dtype)
    for _ in range(num_iters):
        hx = jnp.concatenate([h, xp], axis=-1).astype(mm_dtype)    # [T, 2H]
        s_zr = jax.lax.dot_general(
            hx, wzr_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_zr
        z = _sigmoid(s_zr[:, :H])
        r = _sigmoid(s_zr[:, H:])
        u = jnp.concatenate([r * h, xp], axis=-1).astype(mm_dtype)
        s_q = jax.lax.dot_general(
            u, wq_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_q
        q = jnp.tanh(s_q)
        if collect:
            saved.append((h, z, r, q))
        h = (1.0 - z) * h + z * q
    return h, saved


def _make_fwd_kernel(num_iters, mm_dtype):
    def kernel(h0_ref, x_ref, wzr_ref, bzr_ref, wq_ref, bq_ref, out_ref):
        h = h0_ref[:].astype(jnp.float32)
        xp = x_ref[:].astype(jnp.float32)
        w_zr = wzr_ref[:].astype(jnp.float32)
        b_zr = bzr_ref[:].astype(jnp.float32)[0]
        w_q = wq_ref[:].astype(jnp.float32)
        b_q = bq_ref[:].astype(jnp.float32)[0]
        h, _ = _fwd_iters(h, xp, w_zr, b_zr, w_q, b_q, num_iters,
                          mm_dtype=mm_dtype)
        out_ref[:] = h.astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(num_iters, mm_dtype):
    def kernel(h0_ref, x_ref, wzr_ref, bzr_ref, wq_ref, bq_ref, g_ref,
               dh0_ref, dx_ref, dwzr_ref, dbzr_ref, dwq_ref, dbq_ref):
        i = pl.program_id(0)
        h = h0_ref[:].astype(jnp.float32)
        xp = x_ref[:].astype(jnp.float32)
        w_zr = wzr_ref[:].astype(jnp.float32)
        b_zr = bzr_ref[:].astype(jnp.float32)[0]
        w_q = wq_ref[:].astype(jnp.float32)
        b_q = bq_ref[:].astype(jnp.float32)[0]
        wzr_m = wzr_ref[:].astype(mm_dtype)
        wq_m = wq_ref[:].astype(mm_dtype)

        _, saved = _fwd_iters(h, xp, w_zr, b_zr, w_q, b_q, num_iters,
                              collect=True, mm_dtype=mm_dtype)

        dh = g_ref[:].astype(jnp.float32)
        dx = jnp.zeros_like(xp)
        dwzr = jnp.zeros_like(w_zr)
        dbzr = jnp.zeros_like(b_zr)
        dwq = jnp.zeros_like(w_q)
        dbq = jnp.zeros_like(b_q)

        for h_in, z, r, q in reversed(saved):
            dz = dh * (q - h_in)
            dq = dh * z
            dh_in = dh * (1.0 - z)

            ds_q = (dq * (1.0 - q * q))
            ds_q_m = ds_q.astype(mm_dtype)
            u = jnp.concatenate([r * h_in, xp], axis=-1).astype(mm_dtype)
            dwq = dwq + jax.lax.dot_general(
                u, ds_q_m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbq = dbq + jnp.sum(ds_q, axis=0)
            du = jax.lax.dot_general(
                ds_q_m, wq_m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            drh = du[:, :H]
            dx = dx + du[:, H:]
            dr = drh * h_in
            dh_in = dh_in + drh * r

            ds_zr = jnp.concatenate(
                [dz * z * (1.0 - z), dr * r * (1.0 - r)], axis=-1)
            ds_zr_m = ds_zr.astype(mm_dtype)
            hx = jnp.concatenate([h_in, xp], axis=-1).astype(mm_dtype)
            dwzr = dwzr + jax.lax.dot_general(
                hx, ds_zr_m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbzr = dbzr + jnp.sum(ds_zr, axis=0)
            dhx = jax.lax.dot_general(
                ds_zr_m, wzr_m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh_in = dh_in + dhx[:, :H]
            dx = dx + dhx[:, H:]
            dh = dh_in

        dh0_ref[:] = dh.astype(dh0_ref.dtype)
        dx_ref[:] = dx.astype(dx_ref.dtype)

        # weight grads accumulate across the sequential grid
        @pl.when(i == 0)
        def _():
            dwzr_ref[:] = dwzr
            dbzr_ref[:] = dbzr[None]
            dwq_ref[:] = dwq
            dbq_ref[:] = dbq[None]

        @pl.when(i > 0)
        def _():
            dwzr_ref[:] = dwzr_ref[:] + dwzr
            dbzr_ref[:] = dbzr_ref[:] + dbzr[None]
            dwq_ref[:] = dwq_ref[:] + dwq
            dbq_ref[:] = dbq_ref[:] + dbq[None]

    return kernel


def _round_up(v, m):
    return -(-v // m) * m


def _mm_dtype(h0):
    """bf16 models get native-bf16 MXU matmuls; f32 stays exact (parity)."""
    return jnp.bfloat16 if h0.dtype == jnp.bfloat16 else jnp.float32


def _pad_inputs(h0, x, w_zr, b_zr, w_q, b_q):
    """Pad the point rows; x keeps its native lane count (the kernel block
    pads lanes in VMEM for free — an HBM-lane pad here cost a full [M, 128]
    concat pass fwd+bwd).  Weight rows stay at [H + xdim, ·]."""
    m, hdim = h0.shape
    assert hdim == H, f"fused GRU is specialized to H={H}, got {hdim}"
    m_pad = _round_up(m, TILE)
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    h0p = jnp.pad(h0, ((0, m_pad - m), (0, 0)))
    return h0p, xp, w_zr, b_zr, w_q, b_q, m_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_gru(h0, x, w_zr, b_zr, w_q, b_q, num_iters):
    """h0 [M, 128], x [M, Xdim≤128]; weights in UNPADDED layout
    (w_zr [128+Xdim, 256], w_q [128+Xdim, 128]).  Returns h after
    ``num_iters`` GRU steps, matching the XLA reference loop bit-for-bit at
    f32 block precision."""
    return _fused_fwd_impl(h0, x, w_zr, b_zr, w_q, b_q, num_iters)


def _block(shape, index_map=None, **kw):
    return pl.BlockSpec(shape, index_map or (lambda i: (0, 0)),
                        memory_space=pltpu.VMEM, **kw)


def _fused_fwd_impl(h0, x, w_zr, b_zr, w_q, b_q, num_iters):
    m = h0.shape[0]
    xdim = x.shape[1]
    h0p, xp, wzr_p, bzr, wq_p, bq = _pad_inputs(h0, x, w_zr, b_zr, w_q, b_q)[:6]
    m_pad = h0p.shape[0]
    grid = (m_pad // TILE,)
    out = pl.pallas_call(
        _make_fwd_kernel(num_iters, _mm_dtype(h0)),
        grid=grid,
        in_specs=[
            _block((TILE, H), lambda i: (i, 0)),
            _block((TILE, xdim), lambda i: (i, 0)),
            _block((H + xdim, 2 * H)),
            _block((1, 2 * H)),
            _block((H + xdim, H)),
            _block((1, H)),
        ],
        out_specs=_block((TILE, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, H), h0.dtype),
    )(h0p, xp, wzr_p, bzr.reshape(1, -1), wq_p, bq.reshape(1, -1))
    return out[:m]


def _fused_fwd(h0, x, w_zr, b_zr, w_q, b_q, num_iters):
    return _fused_fwd_impl(h0, x, w_zr, b_zr, w_q, b_q, num_iters), (
        h0, x, w_zr, b_zr, w_q, b_q)


def _fused_bwd(num_iters, res, g):
    h0, x, w_zr, b_zr, w_q, b_q = res
    m, xdim = x.shape
    h0p, xp, wzr_p, bzr, wq_p, bq = _pad_inputs(h0, x, w_zr, b_zr, w_q, b_q)[:6]
    m_pad = h0p.shape[0]
    gp = jnp.pad(g, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // TILE,)
    dh0, dx, dwzr, dbzr, dwq, dbq = pl.pallas_call(
        _make_bwd_kernel(num_iters, _mm_dtype(h0)),
        grid=grid,
        in_specs=[
            _block((TILE, H), lambda i: (i, 0)),
            _block((TILE, xdim), lambda i: (i, 0)),
            _block((H + xdim, 2 * H)),
            _block((1, 2 * H)),
            _block((H + xdim, H)),
            _block((1, H)),
            _block((TILE, H), lambda i: (i, 0)),
        ],
        out_specs=[
            _block((TILE, H), lambda i: (i, 0)),
            _block((TILE, xdim), lambda i: (i, 0)),
            _block((H + xdim, 2 * H)),
            _block((1, 2 * H)),
            _block((H + xdim, H)),
            _block((1, H)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, H), h0.dtype),
            jax.ShapeDtypeStruct((m_pad, xdim), x.dtype),
            jax.ShapeDtypeStruct((H + xdim, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((H + xdim, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
    )(h0p, xp, wzr_p, bzr.reshape(1, -1), wq_p, bq.reshape(1, -1), gp)

    return (dh0[:m], dx[:m],
            dwzr.astype(w_zr.dtype), dbzr[0].astype(b_zr.dtype),
            dwq.astype(w_q.dtype), dbq[0].astype(b_q.dtype))


fused_gru.defvjp(_fused_fwd, _fused_bwd)
