"""Pallas TPU kernels: fused Conv3x3(s1,p1) + BatchNorm(train) + GELU chains.

Replaces the UNet's plain-3x3 ``ConvWithNorms`` stages (reference
decoder.py:202-220 semantics) for TRAINING on TPU.  Motivation (measured,
tools/trace_step.py @ bs=4): the XLA lowering of these stages is the
supervised step's long tail — per 256² block ≈ 1.04 ms dual-dtype
(bf16,f32) forward stash fusions, 0.74 ms BN-stat convert_reduce, 1.3-1.7 ms
BN backward fusions, plus wgrad/dgrad layout churn; ~15-20 ms across the
seven 3x3 stages.  Op-granular Pallas insertion LOSES (a standalone 3x3
wgrad kernel measured 31.2 vs 35.3 pairs/s — XLA materializes channel pads
+ pre-shifted copies around custom-calls; removed round 4), so these
kernels fuse whole blocks and chain through
HBM only via the PRE-BN conv outputs ``s_i``:

    forward  block i:  s_i = conv3x3(gelu(bn_i-1(s_{i-1}))) + bias_i
                       (+ per-grid-step partial Σ/Σ² lanes → batch stats)
    backward block i:  dz_i --(BN-correct to ds_i on load)-->
                       dz_{i-1} = dgrad(ds_i) ⊙ gelu'(z_{i-1}),
                       dW_i (9 in-kernel wgrad taps), db_i, Σdz/Σdz·ẑ lanes

Design rules (each one a lesson from a measured failure):
- activations stay FLAT ``[(steps+2)·T·W, C]`` bf16 between kernels, with
  one T·W-row zero guard block on each end — kernels write their outputs
  already-guarded (out block k+1), so no XLA pad/slice ever materializes
  between chained blocks;
- the 3 kx taps come from in-kernel ``pltpu.roll`` (±1 sublane) plus an
  x-edge iota mask — NOT pre-shifted HBM copies (1.19 ms each, measured);
- channel dims are NOT padded to 128 (C=64 runs half-lane): avoiding XLA's
  materialized channel pad (2.2 ms, measured) beats full MXU lanes;
- halo rows are re-fetched per grid step ((T+2)-row windows) and image
  boundaries are zero-masked in-kernel via the block index — the guard
  blocks make every DMA offset valid with one static shape;
- BN batch stats come from per-grid-step PARTIAL sums (``[steps, 2, C]``)
  tree-reduced by XLA in f32 — a single sequential f32 accumulator across
  256 steps loses ~3 digits at 524k elements;
- partial sums are taken on the bf16-ROUNDED ``s`` so the stats match the
  plain path bit-for-bit semantics (flax BN reads the bf16 conv output).

Eval mode, CPU, and non-3x3 stages keep the plain XLA path (models/unet.py
routes via ``use_fused_cbg()``).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output rows per grid step.  Larger T = fewer grid steps, less per-step
# overhead, and a smaller halo-recompute fraction ((T+2)/T), at 2·(T+2)·W·C
# VMEM per slot buffer.  ``t_rows(h)`` halves it until it divides the
# image height (shape eligibility floor stays h % 8 == 0).
# Swept in-step on v5e @bs=4 (fused 256,128): T=8 → 35.3, T=16 → 35.43,
# T=32 → 35.18 pairs/s.
T_ROWS = int(os.environ.get("DEFLOW_CBG_T", 16))


def t_rows(h: int) -> int:
    t = T_ROWS
    while h % t:
        t //= 2
    assert t >= 8, (h, T_ROWS)
    return t
_SQRT1_2 = 0.7071067811865476
_SQRT1_2PI = 0.3989422804014327


def _gelu_f32(x):
    """Exact GELU (erf form) — matches jax.nn.gelu(approximate=False)."""
    return x * (0.5 * (1.0 + jax.lax.erf(x * _SQRT1_2)))


def _gelu_grad_f32(x):
    """d/dx gelu(x) = Φ(x) + x·φ(x)."""
    phi = jnp.exp(x * x * -0.5) * _SQRT1_2PI
    cdf = 0.5 * (1.0 + jax.lax.erf(x * _SQRT1_2))
    return cdf + x * phi


# Mosaic TC has no erf lowering — in-kernel Φ(x) uses Abramowitz-Stegun
# 7.1.26 in its erfc form (t·exp(−z²)·poly(t)), evaluated on |z| so neither
# tail suffers 1+erf cancellation.  Abs err ≤ 7.5e-8 on Φ — three orders
# below the bf16 activation rounding the chain feeds downstream (and inside
# every exactness-test tolerance, which are ≥1e-4 in f32).
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _phi_k(x):
    z = jnp.abs(x) * _SQRT1_2
    t = 1.0 / (1.0 + _AS_P * z)
    a1, a2, a3, a4, a5 = _AS_A
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    erfc_half = 0.5 * poly * jnp.exp(-z * z)       # ½·erfc(|x|/√2)
    return jnp.where(x >= 0, 1.0 - erfc_half, erfc_half)


def _gelu_k(x):
    """In-kernel exact-form GELU (A&S Φ — see note above)."""
    return x * _phi_k(x)


def _gelu_grad_k(x):
    """In-kernel d/dx gelu(x) = Φ(x) + x·φ(x)."""
    phi = jnp.exp(x * x * -0.5) * _SQRT1_2PI
    return _phi_k(x) + x * phi


# per-block scalar slab lanes (f32 [N_SCAL, C])
_S_MEAN, _S_ISTD, _S_GAMMA, _S_BETA, _S_A, _S_B = range(6)
N_SCAL = 6


def _bn_apply(x, scal):
    return ((x - scal[_S_MEAN]) * scal[_S_ISTD] * scal[_S_GAMMA]
            + scal[_S_BETA])


def _guarded_rows(n_steps: int, t: int, w: int) -> int:
    return (n_steps + 2) * t * w


def _lane_pad(c: int) -> int:
    """Physical lane width of a [*, c] chain buffer.

    Mosaic's memref_slice cannot take a dynamic-offset DMA whose minor dim
    is smaller than the source's tile-padded minor (measured failure:
    slicing [10,256,64] out of a [2064,256,128] bf16 HBM memref).  Since
    XLA tile-pads the minor to 128 lanes PHYSICALLY anyway, chain buffers
    carry the padding logically (zero upper lanes): identical HBM traffic,
    and the extra contraction lanes ride the same 128-deep MXU pass.
    """
    return -(-c // 128) * 128


def _win_masks(u, jj, last, t, w):
    """Zero the halo rows that fall outside the current image."""
    rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    u = jnp.where((jj == 0) & (rows < w), 0, u)
    u = jnp.where((jj == last) & (rows >= (t + 1) * w), 0, u)
    return u


def _tap_bufs(u, w, dtype):
    """(left, center, right) kx-tap views of a flat window via sublane roll.

    left[f] = u[f-1] (the x-1 neighbor), right[f] = u[f+1]; the wrapped
    column (crossing a spatial row) is zero — conv's implicit x-padding.
    ``u`` must be f32 (Mosaic's tpu.dynamic_rotate only handles 32-bit
    data); taps are cast to the matmul compute ``dtype`` on the way out —
    identical values to casting before the roll.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    left = pltpu.roll(u, 1, 0)
    left = jnp.where(jax.lax.rem(rows, w) == 0, 0, left)
    right = pltpu.roll(u, u.shape[0] - 1, 0)   # ≡ roll by −1
    right = jnp.where(jax.lax.rem(rows, w) == w - 1, 0, right)
    return (left.astype(dtype), u.astype(dtype), right.astype(dtype))


# ------------------------------------------------------------------ forward
def _make_fwd_kernel(h: int, w: int, t: int, blocks: int, n_steps: int,
                     has_prev: bool, out_dtype):
    hw = (t + 2) * w
    last = blocks - 1

    def kernel(x_hbm, wmat_ref, bias_ref, scal_ref, s_ref, ps_ref,
               xbuf, sems):
        g = pl.program_id(0)

        def start(slot, k):
            # x_hbm is the guarded buffer viewed [(n_steps+2)·t, w, C]: one
            # spatial row per major slot, so the (t+2)-row halo window is a
            # dynamic-start static-size slice of the UNTILED major dim (the
            # only dynamic HBM slicing Mosaic accepts on tiled bf16 refs).
            j = (k + 1) * t - 1
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(j, t + 2)], xbuf.at[slot],
                sems.at[slot]).start()

        @pl.when((g + 1 >= 1) & (g + 1 <= n_steps))
        def _():
            start((g + 1) % 2, g)          # data for step g+1 is k = g

        interior = (g >= 1) & (g <= n_steps)

        @pl.when(interior)
        def _():
            k = g - 1
            jj = jax.lax.rem(k, blocks)
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, t + 2)], xbuf.at[g % 2],
                sems.at[g % 2]).wait()

            x = xbuf[g % 2].reshape(hw, xbuf.shape[-1])
            if has_prev:
                u = _gelu_k(_bn_apply(x.astype(jnp.float32), scal_ref[...]))
            else:
                u = x.astype(jnp.float32)
            u = _win_masks(u, jj, last, t, w)
            taps = _tap_bufs(u, w, x_hbm.dtype)

            # acc runs at LOGICAL o lanes: MXU pass count scales with the
            # OUTPUT width (padding the contraction dim rides the same
            # 128-deep pass for free; padded output columns double it —
            # measured 34.7 vs 35.3 pairs/s in-step before this split)
            o = wmat_ref.shape[-1]
            op = s_ref.shape[-1]
            acc = jnp.zeros((t * w, o), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    win = taps[kx][ky * w:(ky + t) * w]
                    acc = acc + jax.lax.dot_general(
                        win, wmat_ref[ky, kx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc = acc + bias_ref[...].astype(jnp.float32)
            sbf = acc.astype(out_dtype)
            if op != o:          # physical lane pad for the next block's DMA
                s_ref[...] = jnp.concatenate(
                    [sbf, jnp.zeros((t * w, op - o), out_dtype)], axis=1)
            else:
                s_ref[...] = sbf
            sf = sbf.astype(jnp.float32)
            ps_ref[0, 0] = jnp.sum(sf, axis=0)
            ps_ref[0, 1] = jnp.sum(sf * sf, axis=0)

        @pl.when(jnp.logical_not(interior))
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            ps_ref[...] = jnp.zeros_like(ps_ref)

    return kernel


def cbg_block_fwd(x_g: jnp.ndarray, wmat: jnp.ndarray, bias: jnp.ndarray,
                  scal: Optional[jnp.ndarray], b: int, h: int, w: int):
    """One fused block forward on guard-padded flat input.

    x_g:  [(steps+2)·T·W, C] compute-dtype — previous block's pre-BN conv
          output (or the chain input), one T·W zero guard block each end.
    wmat: [3, 3, C, O] compute dtype;  bias: [1, O];
    scal: [N_SCAL, C] f32 input-side BN scalars, or None (chain head).
    Returns (s [(steps+2)·T·W, O], partial_sums [steps+2, 2, O] f32).
    """
    t = t_rows(h)
    assert w % 8 == 0, (h, w)
    blocks = h // t
    n_steps = b * blocks
    c = x_g.shape[1]               # physical (lane-padded) input width
    o = wmat.shape[-1]             # logical output width
    op = _lane_pad(o)
    assert c % 128 == 0 and wmat.shape[2] == c, (c, wmat.shape)
    assert x_g.shape[0] == _guarded_rows(n_steps, t, w), x_g.shape
    has_prev = scal is not None
    if scal is None:
        scal = jnp.zeros((N_SCAL, c), jnp.float32)

    grid = (n_steps + 2,)
    s, ps = pl.pallas_call(
        _make_fwd_kernel(h, w, t, blocks, n_steps, has_prev, x_g.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),     # [(n+2)·t, w, C]
                pl.BlockSpec((3, 3, c, o), lambda g: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, o), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_SCAL, c), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((t * w, op), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, o), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, t + 2, w, c), x_g.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((_guarded_rows(n_steps, t, w), op),
                                 x_g.dtype),
            jax.ShapeDtypeStruct((n_steps + 2, 2, o), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x_g.reshape((n_steps + 2) * t, w, c), wmat, bias, scal)
    return s, ps


# ----------------------------------------------------------------- backward
def _make_bwd_kernel(h: int, w: int, t: int, blocks: int, n_steps: int,
                     has_prev: bool, out_dtype):
    hw = (t + 2) * w
    last = blocks - 1

    def kernel(dz_hbm, si_hbm, sp_hbm, wmat_ref, scal_in_ref, scal_out_ref,
               dzp_ref, dw_ref, db_ref, psp_ref, dzbuf, sibuf, spbuf, sems):
        g = pl.program_id(0)

        def start(slot, k):
            j = (k + 1) * t - 1           # major-slot (w-row) halo offset
            pltpu.make_async_copy(dz_hbm.at[pl.ds(j, t + 2)],
                                  dzbuf.at[slot], sems.at[slot, 0]).start()
            pltpu.make_async_copy(si_hbm.at[pl.ds(j, t + 2)],
                                  sibuf.at[slot], sems.at[slot, 1]).start()
            pltpu.make_async_copy(sp_hbm.at[pl.ds(j, t + 2)],
                                  spbuf.at[slot], sems.at[slot, 2]).start()

        @pl.when((g + 1 >= 1) & (g + 1 <= n_steps))
        def _():
            start((g + 1) % 2, g)

        interior = (g >= 1) & (g <= n_steps)

        @pl.when(g == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        @pl.when(interior)
        def _():
            k = g - 1
            jj = jax.lax.rem(k, blocks)
            s = g % 2
            pltpu.make_async_copy(dz_hbm.at[pl.ds(0, t + 2)], dzbuf.at[s],
                                  sems.at[s, 0]).wait()
            pltpu.make_async_copy(si_hbm.at[pl.ds(0, t + 2)], sibuf.at[s],
                                  sems.at[s, 1]).wait()
            pltpu.make_async_copy(sp_hbm.at[pl.ds(0, t + 2)], spbuf.at[s],
                                  sems.at[s, 2]).wait()

            # compute at LOGICAL lane widths (wmat_ref is fully logical):
            # the physical lane padding of the DMA'd buffers is sliced off
            # on load, and re-added only on the dzp chain write — MXU pass
            # count scales with output width (see the forward kernel note)
            c = wmat_ref.shape[2]
            o = wmat_ref.shape[3]
            op, cp = dzbuf.shape[-1], spbuf.shape[-1]
            scal_in = scal_in_ref[...]
            dz = dzbuf[s].reshape(hw, op)[:, :o].astype(jnp.float32)
            zi_hat = ((sibuf[s].reshape(hw, op)[:, :o].astype(jnp.float32)
                       - scal_in[_S_MEAN]) * scal_in[_S_ISTD])
            ds = (scal_in[_S_GAMMA] * scal_in[_S_ISTD]
                  * (dz - scal_in[_S_A] - zi_hat * scal_in[_S_B]))
            ds = _win_masks(ds, jj, last, t, w)
            ds_taps = _tap_bufs(ds, w, out_dtype)

            sp = spbuf[s].reshape(hw, cp)[:, :c].astype(jnp.float32)
            if has_prev:
                scal_out = scal_out_ref[...]
                zp = _bn_apply(sp, scal_out)
                x = _gelu_k(zp)
            else:
                zp = sp
                x = zp
            x = _win_masks(x, jj, last, t, w)
            x_taps = _tap_bufs(x, w, out_dtype)

            ds_c = ds_taps[1][w:(t + 1) * w]
            dx = jnp.zeros((t * w, c), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    # dgrad: dx[y,x] += ds[y+1-ky, x+1-kx] · W[ky,kx,:,o]
                    dwin = ds_taps[2 - kx][(2 - ky) * w:(2 - ky + t) * w]
                    dx = dx + jax.lax.dot_general(
                        dwin, wmat_ref[ky, kx],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    # wgrad: dW[ky,kx] += x[y+ky-1, x+kx-1]ᵀ · ds[y,x]
                    xwin = x_taps[kx][ky * w:(ky + t) * w]
                    dw_ref[ky, kx] = dw_ref[ky, kx] + jax.lax.dot_general(
                        xwin, ds_c,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            db_ref[0, 0] = jnp.sum(ds_c.astype(jnp.float32), axis=0)

            if has_prev:
                zp_c = zp[w:(t + 1) * w]
                dzp = dx * _gelu_grad_k(zp_c)
                zp_hat_c = ((sp[w:(t + 1) * w]
                             - scal_out[_S_MEAN]) * scal_out[_S_ISTD])
                psp_ref[0, 0] = jnp.sum(dzp, axis=0)
                psp_ref[0, 1] = jnp.sum(dzp * zp_hat_c, axis=0)
            else:
                psp_ref[...] = jnp.zeros_like(psp_ref)
                dzp = dx
            dzb = dzp.astype(out_dtype)
            if dzp_ref.shape[-1] != c:   # physical lane pad for the chain DMA
                dzb = jnp.concatenate(
                    [dzb, jnp.zeros((t * w, dzp_ref.shape[-1] - c),
                                    out_dtype)], axis=1)
            dzp_ref[...] = dzb

        @pl.when(jnp.logical_not(interior))
        def _():
            dzp_ref[...] = jnp.zeros_like(dzp_ref)
            db_ref[...] = jnp.zeros_like(db_ref)
            psp_ref[...] = jnp.zeros_like(psp_ref)

    return kernel


def cbg_block_bwd(dz_g: jnp.ndarray, si_g: jnp.ndarray, sp_g: jnp.ndarray,
                  wmat: jnp.ndarray, scal_in: jnp.ndarray,
                  scal_out: Optional[jnp.ndarray], b: int, h: int, w: int):
    """One fused block backward on guard-padded flat buffers.

    dz_g: [(steps+2)·T·W, _lane_pad(O)] — dL/ds_i pre-BN-correction
          (dz_i = dy⊙gelu'), physical chain width;
    si_g: s_i (this block's pre-BN output, saved by forward; physical O);
    sp_g: s_{i-1} (previous block's output / chain input; physical C);
    wmat: [3, 3, C, O] fully LOGICAL (see the kernel's lane-width note);
    scal_in:  [N_SCAL, O] logical — block i's BN scalars + A/B correction;
    scal_out: [N_SCAL, C] logical — block i-1's scalars (None at chain head).
    Returns (dz_prev [(steps+2)·T·W, _lane_pad(C)] physical,
             dW [3,3,C,O] f32, db_partials [steps+2, 1, O] f32,
             ps_prev [steps+2, 2, C] f32 — all logical widths).
    """
    t = t_rows(h)
    blocks = h // t
    n_steps = b * blocks
    c, o = wmat.shape[2], wmat.shape[3]
    cp, op = _lane_pad(c), _lane_pad(o)
    assert sp_g.shape[1] == cp and dz_g.shape[1] == op, (sp_g.shape,
                                                        dz_g.shape, c, o)
    assert si_g.shape[1] == op, si_g.shape
    has_prev = scal_out is not None
    if scal_out is None:
        scal_out = jnp.zeros((N_SCAL, c), jnp.float32)

    grid = (n_steps + 2,)
    dzp, dw, db, psp = pl.pallas_call(
        _make_bwd_kernel(h, w, t, blocks, n_steps, has_prev, dz_g.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((3, 3, c, o), lambda g: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_SCAL, o), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_SCAL, c), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((t * w, cp), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, c, o), lambda g: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, o), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, c), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, t + 2, w, op), dz_g.dtype),
                pltpu.VMEM((2, t + 2, w, op), si_g.dtype),
                pltpu.VMEM((2, t + 2, w, cp), sp_g.dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((_guarded_rows(n_steps, t, w), cp),
                                 dz_g.dtype),
            jax.ShapeDtypeStruct((3, 3, c, o), jnp.float32),
            jax.ShapeDtypeStruct((n_steps + 2, 1, o), jnp.float32),
            jax.ShapeDtypeStruct((n_steps + 2, 2, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(dz_g.reshape((n_steps + 2) * t, w, op),
      si_g.reshape((n_steps + 2) * t, w, op),
      sp_g.reshape((n_steps + 2) * t, w, cp),
      wmat, scal_in, scal_out)
    return dzp, dw, db, psp


# ------------------------------------------------------------- chain (VJP)
def _scal_slab(mean, istd, gamma, beta, a=None, b=None, cp=None):
    """[N_SCAL, cp] f32 BN-scalar slab, zero-padded to the physical lanes
    (zero γ/istd make every padded-lane chain quantity identically zero)."""
    c = mean.shape[0]
    z = jnp.zeros((c,), jnp.float32)
    slab = jnp.stack([mean, istd, gamma, beta,
                      z if a is None else a, z if b is None else b])
    cp = cp or _lane_pad(c)
    if cp != c:
        slab = jnp.pad(slab, ((0, 0), (0, cp - c)))
    return slab


def _pad_w_in(wm):
    """Zero-pad conv weight [3,3,c,o] INPUT channels to the physical chain
    lanes; the output dim stays logical (MXU pass count scales with output
    width — padded contraction lanes ride the same 128-deep pass free)."""
    c = wm.shape[2]
    cp = _lane_pad(c)
    if cp != c:
        wm = jnp.pad(wm, ((0, 0), (0, 0), (0, cp - c), (0, 0)))
    return wm


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def cbg_chain(dims: Tuple[int, int, int, float], x_g, params, head_gb=()):
    """Fused chain of conv3x3+BN(train)+GELU blocks.

    dims = (b, h, w, eps).  ``x_g`` is the guard-padded flat chain input.
    ``params`` is a tuple of (wmat [3,3,C,O], bias [1,O], gamma [O],
    beta [O]) per block (compute dtype for wmat/bias, f32 for γ/β).
    ``head_gb``: () — x_g is a post-activation feature map — or
    (gamma0 [C0], beta0 [C0]) — x_g is the PREVIOUS (non-3x3) conv's
    PRE-BN output and its BN+GELU epilogue runs inside the first block's
    load phase (head stats from one XLA reduce; the guard rows are zero so
    full-array Σ/Σ² equal the valid-row sums).  Deferring the producer's
    epilogue into the chain deletes its stat/stash/backward passes
    (measured: the stem's convert_reduce 2.2 ms + f32-stash 1.0 ms +
    BN-bwd 1.4 ms at 2B=8, 256², C=64).
    Returns (y_g [(steps+2)·T·W, O_last] — post-BN+GELU output of the last
    block, guard rows garbage-but-finite; means, vars: tuples of [·] f32
    batch stats — head first when head_gb is set — for running-stat
    updates).
    """
    out, _ = _chain_fwd_impl(dims, x_g, params, head_gb)
    return out


def _chain_fwd_impl(dims, x_g, params, head_gb):
    b, h, w, eps = dims
    n = b * h * w
    c0 = x_g.shape[1]
    if _lane_pad(c0) != c0:
        x_g = jnp.pad(x_g, ((0, 0), (0, _lane_pad(c0) - c0)))
    if head_gb:
        ga0, be0 = head_gb
        xf = x_g.astype(jnp.float32)
        tot0 = jnp.sum(xf, axis=0)[:c0]
        tot0sq = jnp.sum(xf * xf, axis=0)[:c0]
        mean0 = tot0 / n
        var0 = tot0sq / n - mean0 * mean0
        istd0 = jax.lax.rsqrt(var0 + eps)
        scal = _scal_slab(mean0, istd0, ga0.astype(jnp.float32),
                          be0.astype(jnp.float32))
        head_res = (mean0, istd0)
        head_stats = [(mean0, var0)]
    else:
        scal = None
        head_res = ()
        head_stats = []
    s_prev = x_g
    s_list, stat_list = [], []
    o = c0
    for (wm, bi, ga, be) in params:
        o = wm.shape[-1]
        s, ps = cbg_block_fwd(s_prev, _pad_w_in(wm), bi, scal, b, h, w)
        tot = jnp.sum(ps, axis=0)                   # [2, O] f32 (logical)
        mean = tot[0] / n
        var = tot[1] / n - mean * mean
        istd = jax.lax.rsqrt(var + eps)
        scal = _scal_slab(mean, istd, ga, be)
        s_list.append(s)
        stat_list.append((mean, var, istd))
        s_prev = s
    # tail activation (one fused elementwise pass; guard rows junk-finite)
    y = _gelu_f32(_bn_apply(s_list[-1].astype(jnp.float32),
                            scal))[:, :o].astype(x_g.dtype)
    means = (tuple(m for m, _ in head_stats)
             + tuple(m for m, _, _ in stat_list))
    variances = (tuple(v for _, v in head_stats)
                 + tuple(v for _, v, _ in stat_list))
    return (y, means, variances), (x_g, tuple(s_list),
                                   tuple(i for _, _, i in stat_list),
                                   tuple(m for m, _, _ in stat_list),
                                   head_res)


def _chain_fwd(dims, x_g, params, head_gb):
    out, res = _chain_fwd_impl(dims, x_g, params, head_gb)
    return out, (res, params, head_gb)


def _chain_bwd(dims, res_all, cts):
    (x_g, s_list, istd_list, mean_list, head_res), params, head_gb = res_all
    dy = cts[0]          # cotangents of means/vars are stop-gradient zeros
    b, h, w, eps = dims
    n = b * h * w
    nb = len(params)

    # E0: top-of-chain dz = dy ⊙ gelu'(z_last)  (+ its stat sums).  All
    # [rows, ·] arrays run at _lane_pad physical width; slab padding keeps
    # every padded-lane quantity identically zero, so per-channel sums are
    # sliced back to logical width where they feed gradients/slabs.
    wm, bi, ga, be = params[-1]
    o_last = wm.shape[-1]
    scal_top = _scal_slab(mean_list[-1], istd_list[-1], ga, be)
    s_top = s_list[-1].astype(jnp.float32)
    z_top = _bn_apply(s_top, scal_top)
    if _lane_pad(o_last) != o_last:
        dy = jnp.pad(dy, ((0, 0), (0, _lane_pad(o_last) - o_last)))
    dz = (dy.astype(jnp.float32) * _gelu_grad_f32(z_top))
    z_hat = (s_top - scal_top[_S_MEAN]) * scal_top[_S_ISTD]
    sum_dz = jnp.sum(dz, axis=0)[:o_last]
    sum_dzz = jnp.sum(dz * z_hat, axis=0)[:o_last]
    dz = dz.astype(dy.dtype)

    grads = [None] * nb
    for i in range(nb - 1, -1, -1):
        wm, bi, ga, be = params[i]
        ci, oi = wm.shape[2], wm.shape[3]
        a_vec = sum_dz / n
        b_vec = sum_dzz / n
        d_gamma = sum_dzz                  # Σ dz·ẑ
        d_beta = sum_dz
        # slabs feeding the bwd kernel are LOGICAL width (cp=c → no pad);
        # only the chain activations stay physically padded
        scal_in = _scal_slab(mean_list[i], istd_list[i],
                             ga.astype(jnp.float32), be.astype(jnp.float32),
                             a_vec, b_vec, cp=oi)
        if i > 0:
            gp, bp = params[i - 1][2], params[i - 1][3]
            scal_out = _scal_slab(mean_list[i - 1], istd_list[i - 1],
                                  gp.astype(jnp.float32),
                                  bp.astype(jnp.float32), cp=ci)
            sp = s_list[i - 1]
        elif head_gb:
            # head BN: the first block's input-side BN+GELU ran in-kernel;
            # its backward mirrors the i>0 path (psp sums + A/B correction,
            # the correction applied by XLA after the loop)
            scal_out = _scal_slab(head_res[0], head_res[1],
                                  head_gb[0].astype(jnp.float32),
                                  head_gb[1].astype(jnp.float32), cp=ci)
            sp = x_g
        else:
            scal_out = None
            sp = x_g
        dzp, dw, db_ps, psp = cbg_block_bwd(
            dz, s_list[i], sp, wm, scal_in, scal_out, b, h, w)
        db = jnp.sum(db_ps, axis=0)[0]
        grads[i] = (dw.astype(wm.dtype),
                    db[None, :].astype(bi.dtype),
                    d_gamma.astype(ga.dtype), d_beta.astype(be.dtype))
        if i > 0 or head_gb:
            tot = jnp.sum(psp, axis=0)          # [2, C] f32 (logical)
            sum_dz, sum_dzz = tot[0], tot[1]
        dz = dzp
    c0 = params[0][0].shape[2]
    if head_gb:
        # dz is dx·gelu'(z0) (uncorrected); apply the BN0 backward
        # correction dL/ds0 = γ0·istd0·(dz − Σdz/n − ẑ0·Σdz·ẑ/n) here —
        # one elementwise pass that fuses into the consumer's layout copy
        head_grads = (sum_dzz.astype(head_gb[0].dtype),
                      sum_dz.astype(head_gb[1].dtype))
        slab = _scal_slab(head_res[0], head_res[1],
                          head_gb[0].astype(jnp.float32),
                          head_gb[1].astype(jnp.float32),
                          sum_dz / n, sum_dzz / n)
        z0_hat = (x_g.astype(jnp.float32) - slab[_S_MEAN]) * slab[_S_ISTD]
        dzf = dz.astype(jnp.float32)
        dz = (slab[_S_GAMMA] * slab[_S_ISTD]
              * (dzf - slab[_S_A] - z0_hat * slab[_S_B])).astype(dz.dtype)
    else:
        head_grads = ()
    if _lane_pad(c0) != c0:
        dz = dz[:, :c0]
    return dz, tuple(grads), head_grads


cbg_chain.defvjp(_chain_fwd, _chain_bwd)


# --------------------------------------------------------------- utilities
def guard_pad(x_flat: jnp.ndarray, b: int, h: int, w: int) -> jnp.ndarray:
    """Add one T·W-row zero guard block on each end of a flat [B·H·W, C]."""
    g = t_rows(h) * w
    return jnp.pad(x_flat, ((g, g), (0, 0)))


def guard_slice(x_g: jnp.ndarray, b: int, h: int, w: int) -> jnp.ndarray:
    g = t_rows(h) * w
    return x_g[g:g + b * h * w]


def use_fused_cbg() -> frozenset:
    """Stage groups (by grid-size tag) whose modules are chain-capable
    (CBGBlock/StemHeadCBG twins — identical parameter trees, plain-XLA
    ``__call__`` fallbacks).

    DEFLOW_FUSED_CBG on TPU: ``auto`` (default) = instantiate the 256+128
    groups and let :func:`chain_at_batch` pick the fused chain only in the
    small-batch regime; ``0`` = plain modules everywhere; ``1``/``all`` =
    every plain-3x3 group; or a comma list of {256,128,64} tags (always
    chained — the A/B form).

    Measured in-step on v5e with deferred-epilogue heads and T=16:
    bs=2 fused 33.85 pairs/s vs plain 25.90 (+31% — the fused chain's flat
    layout dodges the small-batch conv-bwd layout churn); bs=4 fused
    sampled 35.13-35.43 vs plain 35.34-35.43 (wash: XLA's lowering is
    already HBM-bound-optimal once the epilogue-boundary copies are the
    only delta); the 64² group costs a further ~0.4 ms."""
    v = os.environ.get("DEFLOW_FUSED_CBG", "auto").strip()
    if v in ("0", ""):
        return frozenset()
    from deflow_tpu.ops.voxel import _use_pallas

    if not _use_pallas():
        return frozenset()
    if v in ("1", "all"):
        return frozenset({"256", "128", "64"})
    if v == "auto":
        return frozenset({"256", "128"})
    return frozenset(x.strip() for x in v.split(","))


def chain_at_batch(rows2b: int) -> bool:
    """Call-time gate for the fused chain: under the ``auto`` policy it runs
    only at siamese batch 2B <= 4 (the layout-churn regime where it wins
    +31%; at 2B >= 8 it is a measured wash and XLA keeps the stages).  An
    explicit DEFLOW_FUSED_CBG group list always chains."""
    if os.environ.get("DEFLOW_FUSED_CBG", "auto").strip() == "auto":
        return rows2b <= 4
    return True
