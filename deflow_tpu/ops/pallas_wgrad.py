"""Pallas TPU kernel: 3x3/s1/p1 convolution WEIGHT gradient (wgrad).

Motivation (measured, tools/trace_step.py): XLA's conv backward is the
supervised step's long tail — ~40 ms of sub-ms layout copies at bs=4, 54% of
the bs=2 step.  A large share is the wgrad path: XLA lowers filter gradients
as convolutions whose operands need transposed layouts ([3,3,C,O]-producing
fusions at 1.3-2.3 ms each), materializing activation/cotangent relayouts.

This kernel computes ``dW[ky,kx,c,o] = Σ_{b,y,x} X[b,y+ky-1,x+kx-1,c] ·
dY[b,y,x,o]`` reading both operands EXACTLY ONCE in their native NHWC
layout (plus a 2-row/2-col zero frame added by the caller):

1. grid over (image, T-row blocks); each step double-buffer-DMAs THREE
   x-shifted ``[T+2, W, C]`` windows of the padded activations (one per kx
   tap — pre-shifted copies instead of in-kernel sublane slicing, which
   Mosaic would relayout) and the ``[T, W, O]`` cotangent rows;
2. the 9 taps are leading-dim slices ``xbuf[kx][ky:ky+T]`` (always aligned)
   reshaped to ``[T·W, C]`` and contracted on the MXU against the cotangent
   block — f32 accumulation into the ``[3,3,C,O]`` output block, which
   lives at a constant block index and accumulates across the grid (the
   fused-GRU kernel's weight-grad pattern);
3. total traffic = 3 reads of X + 1 read of dY + one [3,3,C,O] write — no
   transposes exist anywhere.

dgrad (input gradient) stays on XLA's conv path; bias grad is a plain
reduction.  Used behind ``DEFLOW_PALLAS_WGRAD=1`` by the UNet's 3x3 blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_ROWS = 8   # output rows per grid step


def _make_kernel(h: int, w: int, t: int, f32: bool):
    blocks_per_img = h // t

    def _wgrad_kernel(x0_hbm, x1_hbm, x2_hbm, dy_hbm, out_ref,
                      xbuf, dybuf, sems):
        k = pl.program_id(0)
        nk = pl.num_programs(0)
        xs = (x0_hbm, x1_hbm, x2_hbm)

        def copies(s, kk):
            b = kk // blocks_per_img
            j = kk - b * blocks_per_img
            rx = (b * (h + 2) + j * t) * w
            ry = (b * h + j * t) * w
            # everything is FLAT [rows*w, C]: all DMA offsets/shapes are
            # multiples of w (sublane-tile aligned), and the 9 taps below are
            # aligned static sublane slices — no reshape, no relayout
            cps = [pltpu.make_async_copy(
                xs[kx].at[pl.ds(rx, (t + 2) * w)],
                xbuf.at[s, kx], sems.at[s, kx]) for kx in range(3)]
            cps.append(pltpu.make_async_copy(
                dy_hbm.at[pl.ds(ry, t * w)], dybuf.at[s], sems.at[s, 3]))
            return cps

        @pl.when(k == 0)
        def _():
            for c in copies(0, 0):
                c.start()

        s = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nk)
        def _():
            for c in copies(1 - s, k + 1):
                c.start()

        for c in copies(s, k):
            c.wait()

        dy = dybuf[s]
        prec = (jax.lax.Precision.HIGHEST if f32
                else jax.lax.Precision.DEFAULT)
        for ky in range(3):
            for kx in range(3):
                xwin = xbuf[s, kx, ky * w:(ky + t) * w]
                g = jax.lax.dot_general(
                    xwin, dy, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)

                @pl.when(k == 0)
                def _(g=g, ky=ky, kx=kx):
                    out_ref[ky, kx] = g

                @pl.when(k > 0)
                def _(g=g, ky=ky, kx=kx):
                    out_ref[ky, kx] = out_ref[ky, kx] + g

    return _wgrad_kernel


@functools.partial(jax.jit, static_argnames=())
def conv3x3_wgrad_pallas(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Weight gradient of a 3x3/s1/p1 NHWC conv: ``x [B,H,W,C]``,
    ``dy [B,H,W,O]`` → ``[3,3,C,O]`` f32.  H must divide by T_ROWS."""
    b, h, w, c = x.shape
    o = dy.shape[-1]
    assert h % T_ROWS == 0, (h, T_ROWS)
    t = T_ROWS
    # DMA slices must be lane-tile (128) aligned in the minor dim (pad the
    # channel dims; zero channels contribute zero rows/cols to dW) and
    # sublane offsets 8-aligned — so each kx tap gets its own XLA-pre-sliced
    # shifted copy of the padded activations (3 extra passes of X, ~0.2 ms).
    c_pad = -(-c // 128) * 128
    o_pad = -(-o // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, c_pad - c)))
    xs = [xp[:, :, kx:kx + w, :].reshape(b * (h + 2) * w, c_pad)
          for kx in range(3)]
    dyf = jnp.pad(dy, ((0, 0), (0, 0), (0, 0), (0, o_pad - o))).reshape(
        b * h * w, o_pad)
    grid = (b * h // t,)
    f32 = x.dtype != jnp.bfloat16

    out = pl.pallas_call(
        _make_kernel(h, w, t, f32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3
            + [pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((3, 3, c_pad, o_pad),
                                   lambda k: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 3, (t + 2) * w, c_pad), x.dtype),
                pltpu.VMEM((2, t * w, o_pad), dy.dtype),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, c_pad, o_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs[0], xs[1], xs[2], dyf)
    return out[:, :, :c, :o]


# --------------------------------------------------- flag-gated conv wrapper
def _conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv3x3_pallas_bwd(x, w):
    """3x3/s1/p1 NHWC conv whose BACKWARD routes the weight gradient through
    :func:`conv3x3_wgrad_pallas` (dgrad stays on XLA's conv path)."""
    return _conv3x3(x, w)


def _c3_fwd(x, w):
    return _conv3x3(x, w), (x, w)


def _c3_bwd(res, dy):
    x, w = res
    _, dx_vjp = jax.vjp(lambda xx: _conv3x3(xx, w), x)
    (dx,) = dx_vjp(dy)
    dw = conv3x3_wgrad_pallas(x, dy).astype(w.dtype)
    return dx, dw


conv3x3_pallas_bwd.defvjp(_c3_fwd, _c3_bwd)


def use_pallas_wgrad() -> bool:
    """DEFLOW_PALLAS_WGRAD=1 on TPU routes UNet 3x3 wgrads through the
    Pallas kernel (experimental)."""
    import os

    if os.environ.get("DEFLOW_PALLAS_WGRAD", "0") != "1":
        return False
    from deflow_tpu.ops.voxel import _use_pallas

    return _use_pallas()
