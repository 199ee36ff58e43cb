"""FastFlow3D siamese 2D-conv U-Net backbone, TPU/NHWC.

The reference's ``FastFlow3DUNet`` (imported at reference deflow.py:15; block
definition ``ConvWithNorms`` at reference decoder.py:202-220) is the
FastFlow3D/ZeroFlow-lineage U-Net: a weight-shared encoder applied to the two
pseudoimages, skip connections formed by concatenating the pc0/pc1 feature
pair at each scale, and bilinear-upsampling decoder stages.

TPU-first choices:
- NHWC layout end to end (XLA's preferred conv layout on TPU).
- Bilinear upsampling via ``jax.image.resize`` (half-pixel centers — the same
  sampling as torch ``nn.Upsample(mode='bilinear', align_corners=False)``).
- Module attribute names mirror the reference checkpoint's state-dict path
  components (``encoder_step_1.conv`` ...) so the torch→jax weight converter
  is a mechanical key walk.

Channel plan (pinned by reference deflow.py:87-94: input 2×32-ch pseudoimages,
output 64-ch ``grid_flow_pseudoimage``):
    enc: 32 →(s2) 64 ×4 →(s2) 128 ×4 →(s2) 256 ×2 ; siamese pair-concat skips
    dec: 512→256, 256→128, 128→64 upsample-skip stages, final 3×3 conv 64→64.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class SpaceToDepthConv(nn.Module):
    """k=8 / s=2 / p=3 conv evaluated as k'=5 / s=1 / p=2 on the 2x2
    space-to-depth input (4x channels).

    TPU motivation: the stride-2 k=8 conv at 512x512xC=32 is layout-bound —
    XLA pads the 32-lane tensors to 128 lanes and materializes strided
    [·,512,512,·] intermediates in forward AND backward.  Folding the 2x2
    phases into channels runs the same arithmetic as a dense stride-1 conv at
    256x256x128 (full lane utilization), with the input grad landing in the
    same friendly layout.  The parameter keeps the torch checkpoint shape
    [8, 8, C, O]; the k'=5 rearrangement is a pure weight reshape at apply
    time (exact: every tap maps to one phase slot, out-of-range taps hit
    zero-padded weight rows).

    ``pre_folded=True``: the input already arrives phase-folded
    [B, H/2, W/2, 4C] (the s2d pillar-id pipeline) — no in-graph transpose.
    """

    out_channels: int
    in_channels: int
    dtype: Any = jnp.float32
    pre_folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c, o = self.in_channels, self.out_channels
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1, 2)),
            (8, 8, c, o))
        bias = self.param("bias", nn.initializers.zeros, (o,))

        if self.pre_folded:
            assert x.shape[-1] == 4 * c, (x.shape, c)
            y = x.astype(self.dtype)
        else:
            b, h, w, _ = x.shape
            if h % 2 or w % 2:
                # odd grid (row-major pillar-id fallback): the phase fold
                # does not apply — run the plain conv on the SAME parameters
                out = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    window_strides=(2, 2), padding=((3, 3), (3, 3)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return out + bias.astype(out.dtype)
            # x[., 2i+dh, 2j+dw, c] -> y[., i, j, (dh, dw, c)]
            y = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b, h // 2, w // 2, 4 * c).astype(self.dtype)

        # original tap u relates to phase dh and s2d tap m by u = 2m + dh - 1
        # + 3 = 2(m+2) + dh - ... : with wp = pad(W, 1 each side on kh/kw),
        # wp[2km + dh, 2kw + dw] == W[u, v] for km, kw in [0, 5)
        wp = jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))
        w2 = wp.reshape(5, 2, 5, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
        w2 = w2.reshape(5, 5, 4 * c, o).astype(self.dtype)

        out = jax.lax.conv_general_dilated(
            y, w2, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias.astype(out.dtype)


def _phase_split(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H2, W2, 4C] → [B, H2, W2, 4, C] (phase-major channel layout)."""
    b, h2, w2, mc = x.shape
    return x.reshape(b, h2, w2, 4, mc // 4)


def _phase_merge(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[:3] + (x.shape[3] * x.shape[4],))


class _PhaseDense(nn.Module):
    """1x1 conv applied identically to every phase of a phase-folded image.

    1x1 convs commute with space-to-depth exactly; the parameter keeps the
    plain [1, 1, C_in, C_out] checkpoint shape."""

    out_channels: int
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,H2,W2,4,Cin]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1, 2)),
            (1, 1, self.in_channels, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = jnp.einsum("bhwpc,co->bhwpo", x.astype(self.dtype),
                       kernel[0, 0].astype(self.dtype))
        return y + bias.astype(y.dtype)


# bilinear 2x (align_corners=False) phase weights over input taps m=-1,0,+1:
# output pixel 2i+d samples input position i + (2d-1)/4
_BILIN = ((0.25, 0.75, 0.0), (0.0, 0.75, 0.25))


class _UpsampleConvS2D(nn.Module):
    """Fused [2x bilinear upsample → 1x1 conv], emitting the phase-folded
    (s2d) result directly: one k=3 stride-1 conv at the SOURCE resolution
    whose kernel is the outer product of the fixed bilinear phase weights
    with the 1x1 conv weight.  Edge-replicate padding reproduces torch's
    align_corners=False boundary clamping exactly."""

    out_channels: int
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,H2,W2,Cin]
        cin, cout = self.in_channels, self.out_channels
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1, 2)),
            (1, 1, cin, cout))
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        bw = jnp.asarray(_BILIN, self.dtype)  # [2 phases, 3 taps]
        # fused[di, dj, c, (dh, dw, o)] = bw[dh, di] bw[dw, dj] W[c, o]
        fused = jnp.einsum("hi,wj,co->ijchwo",
                           bw, bw, kernel[0, 0].astype(self.dtype))
        fused = fused.reshape(3, 3, cin, 4 * cout)
        xe = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)),
                     mode="edge")
        y = jax.lax.conv_general_dilated(
            xe, fused, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _phase_split(y) + bias.astype(y.dtype)


class UpsampleSkipS2D(nn.Module):
    """``UpsampleSkip`` with the 512²-resolution half computed phase-folded:
    u1 runs at the source scale, u2 fuses the bilinear upsample, u3/u4/u5 are
    per-phase 1x1s on the s2d skip.  Parameter tree and checkpoint shapes
    identical to :class:`UpsampleSkip`."""

    skip_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b_s2d: jnp.ndarray) -> jnp.ndarray:
        c = self.skip_channels
        u1 = nn.Conv(c // 4, (1, 1), dtype=self.dtype, name="u1")(a)
        u2 = _UpsampleConvS2D(c // 8, c // 4, dtype=self.dtype, name="u2")(u1)
        bp = _phase_split(b_s2d)
        u3 = _PhaseDense(c // 8, bp.shape[-1], dtype=self.dtype, name="u3")(bp)
        cat = jnp.concatenate([u2, u3], axis=-1)
        u4 = _PhaseDense(c // 8, c // 4, dtype=self.dtype, name="u4")(cat)
        u5 = _PhaseDense(self.out_channels, c // 8, dtype=self.dtype,
                         name="u5")(u4)
        return _phase_merge(u5)


class Conv3x3S2D(nn.Module):
    """3x3 / s=1 / p=1 conv evaluated phase-folded: a structured k=3 conv on
    4C channels whose kernel is rearranged in-graph from the plain
    [3, 3, C, O] checkpoint parameter.

    Derivation: out[2i+oh] = Σ_u W[u] x[2i+oh+u-1]; writing the input row as
    2(i+m)+dh gives u = 2m + dh - oh + 1, zero where u falls outside [0, 3).
    """

    channels: int
    dtype: Any = jnp.float32

    def setup(self):
        c = self.channels
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1, 2)),
            (3, 3, c, c))
        self.bias = self.param("bias", nn.initializers.zeros, (c,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,H2,W2,4C]
        import numpy as np

        c = self.channels
        # u = 2m + dh - oh + 1 ranges over [-2, 4]; wp[u+2] == W[u] with zero
        # rows wherever u falls outside [0, 3)
        wp = jnp.pad(self.kernel.astype(self.dtype),
                     ((2, 2), (2, 2), (0, 0), (0, 0)))
        m = np.arange(3)[:, None, None] - 1
        dh = np.arange(2)[None, :, None]
        oh = np.arange(2)[None, None, :]
        u = 2 * m + dh - oh + 1 + 2           # [3(tap), 2(in ph), 2(out ph)]
        # big[a, dh, oh, aw, dw, ow, cin, cout]
        big = wp[u[:, :, :, None, None, None], u[None, None, None]]
        # → [a, aw, (dh, dw, cin), (oh, ow, cout)]
        big = big.transpose(0, 3, 1, 4, 6, 2, 5, 7)
        fused = big.reshape(3, 3, 4 * c, 4 * c)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), fused, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bias4 = jnp.tile(self.bias.astype(y.dtype), 4)
        return y + bias4


class _ConvParams(nn.Module):
    """Parameter twin of ``nn.Conv`` (kernel [3,3,Cin,Cout] + bias) — holds
    the variables for a fused-chain stage without owning the compute.  Init
    fns bit-match ``nn.Conv`` defaults (verified in tests)."""

    cin: int
    out_channels: int

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1, 2)),
            (3, 3, self.cin, self.out_channels))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.out_channels,))

    def __call__(self):
        return self.kernel, self.bias


class _BNParams(nn.Module):
    """Parameter twin of ``nn.BatchNorm`` (scale/bias params + mean/var
    batch_stats) for fused-chain stages."""

    c: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.c,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.c,))
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((self.c,)))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones((self.c,)))

    def __call__(self):
        return self.scale, self.bias


class CBGBlock(nn.Module):
    """ConvWithNorms(3,1,1) twin whose TRAIN compute lives in the fused
    Pallas chain (ops/pallas_cbg.py) driven by the parent UNet.

    Variable tree is identical to ConvWithNorms (``conv/{kernel,bias}``,
    ``batchnorm/{scale,bias}`` + batch_stats) so checkpoints are
    interchangeable; ``__call__`` is the plain XLA fallback (eval mode)."""

    cin: int
    out_channels: int
    dtype: Any = jnp.float32

    def setup(self):
        self.conv = _ConvParams(self.cin, self.out_channels, name="conv")
        self.batchnorm = _BNParams(self.out_channels, name="batchnorm")

    def handles(self):
        """(wmat, bias2d, gamma, beta) for ops/pallas_cbg.cbg_chain."""
        return (self.conv.kernel.astype(self.dtype),
                self.conv.bias.astype(self.dtype)[None, :],
                self.batchnorm.scale.astype(jnp.float32),
                self.batchnorm.bias.astype(jnp.float32))

    def update_stats(self, mean, var):
        """Running-stat update with flax BatchNorm semantics (momentum 0.9,
        biased batch var, skipped during init)."""
        if not self.is_initializing():
            m = 0.9
            self.batchnorm.mean.value = (
                m * self.batchnorm.mean.value + (1 - m) * mean)
            self.batchnorm.var.value = (
                m * self.batchnorm.var.value + (1 - m) * var)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k, b = self.conv()
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(self.dtype)
        g, be = self.batchnorm()
        yf = y.astype(jnp.float32)
        if train:
            mu = yf.mean(axis=(0, 1, 2))
            var = (yf * yf).mean(axis=(0, 1, 2)) - mu * mu
            self.update_stats(mu, var)
        else:
            mu = self.batchnorm.mean.value
            var = self.batchnorm.var.value
        z = (yf - mu) * jax.lax.rsqrt(var + 1e-5) * g + be
        return nn.gelu(z, approximate=False)


class StemHeadCBG(nn.Module):
    """k=8/s=2/p=3 stem conv whose BN+GELU epilogue is deferred into the
    following fused CBG chain in train mode (ops/pallas_cbg.cbg_chain
    ``head_gb``): ``conv_out`` returns the pre-BN conv output; the chain
    applies BN0+GELU0 inside its first block's load phase, deleting the
    stem's XLA stat/f32-stash/BN-backward passes.  ``s2d_stem`` picks the
    phase-folded SpaceToDepthConv (the 512² pseudoimage stem) vs the plain
    ``nn.Conv`` (the in-encoder downsample stems).  Variable tree is
    identical to the ConvWithNorms it replaces (``conv/{kernel,bias}``,
    ``batchnorm/...``) so checkpoints interchange; ``__call__`` is the plain
    fallback (eval mode / shape-guard failures)."""

    out_channels: int
    cin: int
    dtype: Any = jnp.float32
    pre_folded: bool = False
    s2d_stem: bool = True

    def setup(self):
        if self.s2d_stem:
            self.conv = SpaceToDepthConv(self.out_channels, self.cin,
                                         dtype=self.dtype,
                                         pre_folded=self.pre_folded,
                                         name="conv")
        else:
            self.conv = nn.Conv(self.out_channels, (8, 8), strides=(2, 2),
                                padding=((3, 3), (3, 3)), dtype=self.dtype,
                                name="conv")
        self.batchnorm = _BNParams(self.out_channels, name="batchnorm")

    def handles(self):
        """(gamma, beta) f32 for cbg_chain's head_gb."""
        return (self.batchnorm.scale.astype(jnp.float32),
                self.batchnorm.bias.astype(jnp.float32))

    def update_stats(self, mean, var):
        if not self.is_initializing():
            m = 0.9
            self.batchnorm.mean.value = (
                m * self.batchnorm.mean.value + (1 - m) * mean)
            self.batchnorm.var.value = (
                m * self.batchnorm.var.value + (1 - m) * var)

    def conv_out(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(x)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        yf = self.conv(x).astype(jnp.float32)
        if train:
            mu = yf.mean(axis=(0, 1, 2))
            var = (yf * yf).mean(axis=(0, 1, 2)) - mu * mu
            self.update_stats(mu, var)
        else:
            mu = self.batchnorm.mean.value
            var = self.batchnorm.var.value
        g, be = self.batchnorm()
        z = (yf - mu) * jax.lax.rsqrt(var + 1e-5) * g + be
        return nn.gelu(z, approximate=False)


def _remat() -> str:
    """DEFLOW_REMAT rematerializes the UNet's ConvWithNorms blocks.

    ``1``: full-block remat — backward recomputes conv+BN+GELU (saves only
    block inputs).  Measured 32.6 vs 35.3 pairs/s on v5e (recompute FLOPs >
    stash traffic) — negative result, kept for memory-constrained configs.
    ``conv``: policy remat — conv outputs are saved, backward recomputes only
    the BN normalize + GELU elementwise chain (drops the f32 [8,256,256,64]
    stashes without redoing conv FLOPs)."""
    import os

    return os.environ.get("DEFLOW_REMAT", "0")


def _remat_wrap(cls):
    mode = _remat()
    if mode == "1":
        return nn.remat(cls, static_argnums=(2,))
    if mode == "conv":
        import jax

        def save_convs(prim, *_, **__):
            return prim.name in ("conv_general_dilated", "dot_general")

        return nn.remat(cls, static_argnums=(2,), policy=save_convs)
    return cls


class ConvWithNorms(nn.Module):
    """Conv2d + BatchNorm + GELU (reference decoder.py:202-220).

    Keeps the reference's quirk of skipping batch-norm when the spatial map is
    exactly 1x1 (a static-shape check, so it folds away under jit).
    ``space_to_depth`` swaps the conv for the phase-folded equivalent
    (k=8/s=2/p=3 only); the parameter tree is unchanged (``conv/kernel``).
    """

    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    dtype: Any = jnp.float32
    space_to_depth: bool = False
    s2d_input: bool = False  # input arrives already phase-folded

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.space_to_depth:
            assert (self.kernel_size, self.stride, self.padding) == (8, 2, 3)
            cin = x.shape[-1] // 4 if self.s2d_input else x.shape[-1]
            x = SpaceToDepthConv(self.out_channels, cin, dtype=self.dtype,
                                 pre_folded=self.s2d_input, name="conv")(x)
        else:
            x = nn.Conv(
                self.out_channels,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((self.padding, self.padding),
                         (self.padding, self.padding)),
                dtype=self.dtype,
                name="conv",
            )(x)
        if not (x.shape[1] == 1 and x.shape[2] == 1):
            # f32 BN on purpose: ablated dtype=self.dtype (bf16) on v5e and it
            # LOST ~3% step time (32.4 vs 33.3 pairs/s) — XLA's convert+reduce
            # BN fusions over the bf16 conv outputs are already optimal, and
            # the bf16 normalize path adds converts without cutting traffic.
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d momentum=0.1
                epsilon=1e-5,
                dtype=jnp.float32,
                name="batchnorm",
            )(x)
        return nn.gelu(x, approximate=False)


def _bilinear_up2(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, half-pixel centers (torch align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class UpsampleSkip(nn.Module):
    """FastFlow3D decoder stage: 1x1-conv bottleneck, 2x bilinear upsample,
    fuse with the skip tensor through two more 1x1 convs.

    Torch twin is two ``nn.Sequential``s (state-dict ``u1_u2.0 / u1_u2.2 / u3 /
    u4_u5.0 / u4_u5.1``); here each conv is named u1..u5 and the converter maps
    the sequential indices onto these names.
    """

    skip_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        c = self.skip_channels
        u1 = nn.Conv(c // 4, (1, 1), dtype=self.dtype, name="u1")(a)
        u2 = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="u2")(_bilinear_up2(u1))
        u3 = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="u3")(b)
        cat = jnp.concatenate([u2, u3], axis=-1)
        u4 = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="u4")(cat)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="u5")(u4)


class FastFlow3DUNet(nn.Module):
    """Siamese encoder + pair-concat skip decoder (reference deflow.py:32,87-88).

    Takes the two 32-ch pseudoimages and returns the 64-ch flow pseudoimage.
    The encoder weights are shared between pc0 and pc1 (one set of
    ``encoder_step_*`` modules applied twice).

    ``s2d=True`` (the voxel pipeline's default on even grids): inputs and
    output are phase-folded [B, H/2, W/2, 4C].  The full-resolution stem and
    decoder tail then run at 256² with 4x channels — no 512² tensor exists
    anywhere in the graph.  Parameter tree and checkpoint shapes are
    IDENTICAL in both modes (all rearrangement happens at apply time).
    """

    dtype: Any = jnp.float32
    s2d: bool = False
    stem_cin: int = 32   # pseudoimage channels (embedder feat_channels)

    def setup(self):
        from deflow_tpu.ops.pallas_cbg import use_fused_cbg

        CWN = _remat_wrap(ConvWithNorms)
        cwn = lambda c, k, s, p, name: CWN(
            c, k, s, p, dtype=self.dtype, name=name
        )
        fused = use_fused_cbg()   # per-stage-group tags {256,128,64}
        if "256" in fused:
            # stem epilogue deferred into the fused chain (train mode)
            self.encoder_step_1 = StemHeadCBG(
                64, self.stem_cin, dtype=self.dtype, pre_folded=self.s2d,
                name="encoder_step_1")
        else:
            self.encoder_step_1 = CWN(
                64, 8, 2, 3, dtype=self.dtype, space_to_depth=True,
                s2d_input=self.s2d, name="encoder_step_1")
        cbg = lambda c, name: CBGBlock(c, c, dtype=self.dtype, name=name)
        cwn_f = ((lambda c, k, s, p, name: cbg(c, name))
                 if "256" in fused else cwn)
        cwn_128 = ((lambda c, k, s, p, name: cbg(c, name))
                   if "128" in fused else cwn)
        cwn_64 = ((lambda c, k, s, p, name: cbg(c, name))
                  if "64" in fused else cwn)
        self.encoder_step_2 = cwn_f(64, 3, 1, 1, "encoder_step_2")
        self.encoder_step_3 = cwn_f(64, 3, 1, 1, "encoder_step_3")
        self.encoder_step_4 = cwn_f(64, 3, 1, 1, "encoder_step_4")
        if "128" in fused:
            self.encoder_step_5 = StemHeadCBG(
                128, 64, dtype=self.dtype, s2d_stem=False,
                name="encoder_step_5")
        else:
            self.encoder_step_5 = cwn(128, 8, 2, 3, "encoder_step_5")
        self.encoder_step_6 = cwn_128(128, 3, 1, 1, "encoder_step_6")
        self.encoder_step_7 = cwn_128(128, 3, 1, 1, "encoder_step_7")
        self.encoder_step_8 = cwn_128(128, 3, 1, 1, "encoder_step_8")
        if "64" in fused:
            self.encoder_step_9 = StemHeadCBG(
                256, 128, dtype=self.dtype, s2d_stem=False,
                name="encoder_step_9")
        else:
            self.encoder_step_9 = cwn(256, 8, 2, 3, "encoder_step_9")
        self.encoder_step_10 = cwn_64(256, 3, 1, 1, "encoder_step_10")

        self.decoder_step1 = UpsampleSkip(512, 256, dtype=self.dtype, name="decoder_step1")
        self.decoder_step2 = UpsampleSkip(256, 128, dtype=self.dtype, name="decoder_step2")
        if self.s2d:
            self.decoder_step3 = UpsampleSkipS2D(
                128, 64, dtype=self.dtype, name="decoder_step3")
            self.decoder_step4 = Conv3x3S2D(
                64, dtype=self.dtype, name="decoder_step4")
        else:
            self.decoder_step3 = UpsampleSkip(
                128, 64, dtype=self.dtype, name="decoder_step3")
            self.decoder_step4 = nn.Conv(
                64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                name="decoder_step4")

    def _chain(self, mods, x: jnp.ndarray, head=None) -> jnp.ndarray:
        """Run consecutive CBGBlock stages through the fused Pallas chain.

        ``head``: a StemHeadCBG whose BN+GELU epilogue runs inside the
        chain's first block (``x`` is then its PRE-BN conv output)."""
        from deflow_tpu.ops import pallas_cbg as C

        b, h, w, c = x.shape
        params = tuple(m.handles() for m in mods)
        head_gb = head.handles() if head is not None else ()
        x_g = C.guard_pad(x.astype(self.dtype).reshape(b * h * w, c),
                          b, h, w)
        y_g, means, variances = C.cbg_chain((b, h, w, 1e-5), x_g, params,
                                            head_gb)
        stat_mods = ([head] if head is not None else []) + list(mods)
        for m, mu, var in zip(stat_mods, means, variances):
            m.update_stats(mu, var)
        y = C.guard_slice(y_g, b, h, w).reshape(
            b, h, w, mods[-1].out_channels)
        return y.astype(jnp.float32)

    def _stage3(self, mods, f: jnp.ndarray, train: bool) -> jnp.ndarray:
        """A run of plain-3x3 blocks: fused Pallas chain when the stages are
        CBGBlocks in train mode (and the batch-dependent chain gate says the
        chain wins), per-block calls otherwise."""
        from deflow_tpu.ops.pallas_cbg import chain_at_batch

        if (isinstance(mods[0], CBGBlock) and train
                and chain_at_batch(f.shape[0])
                and f.shape[1] % 8 == 0 and f.shape[2] % 8 == 0):
            return self._chain(mods, f)
        for m in mods:
            f = m(f, train)
        return f

    def _enc_stage(self, head_mod, mods, x: jnp.ndarray,
                   train: bool) -> jnp.ndarray:
        """Downsample stem + plain-3x3 group: when the stem is a deferred
        head and the group is fused, one chain call covers stem epilogue +
        all three blocks; otherwise the plain per-module path."""
        from deflow_tpu.ops.pallas_cbg import chain_at_batch

        if (isinstance(head_mod, StemHeadCBG) and train
                and isinstance(mods[0], CBGBlock)
                and chain_at_batch(x.shape[0])):
            s = head_mod.conv_out(x)
            if s.shape[1] % 8 == 0 and s.shape[2] % 8 == 0:
                return self._chain(mods, s, head=head_mod)
        f = head_mod(x, train)
        return self._stage3(mods, f, train)

    def _encode(
        self, x: jnp.ndarray, train: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns the three skip scales (stride 2, 4, 8 feature maps)."""
        n = self._enc_stage(self.encoder_step_1,
                            [self.encoder_step_2, self.encoder_step_3,
                             self.encoder_step_4], x, train)
        r = self._enc_stage(self.encoder_step_5,
                            [self.encoder_step_6, self.encoder_step_7,
                             self.encoder_step_8], n, train)
        t = self._enc_stage(self.encoder_step_9,
                            [self.encoder_step_10], r, train)
        return n, r, t

    def __call__(
        self, pc0_img: jnp.ndarray, pc1_img: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        # Stack the siamese pair into the batch dim so the encoder runs once
        # at 2B batch (bigger, better-tiled convs on the MXU than two passes).
        both = jnp.concatenate([pc0_img, pc1_img], axis=0)
        n_all, r_all, t_all = self._encode(both, train)
        b = pc0_img.shape[0]
        pair = lambda z: jnp.concatenate([z[:b], z[b:]], axis=-1)

        t_star = pair(t_all)                                        # 512
        r_star = pair(r_all)                                        # 256
        n_star = pair(n_all)                                        # 128
        if self.s2d:
            # phase-wise pair concat: channel layout stays (phase, feature)
            b_star = _phase_merge(jnp.concatenate(
                [_phase_split(pc0_img), _phase_split(pc1_img)], axis=-1))
        else:
            b_star = jnp.concatenate([pc0_img, pc1_img], axis=-1)   # 64

        s = self.decoder_step1(t_star, r_star)
        l = self.decoder_step2(s, n_star)
        u = self.decoder_step3(l, b_star)
        return self.decoder_step4(u)
