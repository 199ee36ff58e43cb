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
    """

    out_channels: int
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c, o = self.in_channels, self.out_channels
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1, 2)),
            (8, 8, c, o))
        bias = self.param("bias", nn.initializers.zeros, (o,))

        b, h, w, _ = x.shape
        assert h % 2 == 0 and w % 2 == 0, "space-to-depth needs even H, W"
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.space_to_depth:
            assert (self.kernel_size, self.stride, self.padding) == (8, 2, 3)
            x = SpaceToDepthConv(self.out_channels, x.shape[-1],
                                 dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.out_channels,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((self.padding, self.padding), (self.padding, self.padding)),
                dtype=self.dtype,
                name="conv",
            )(x)
        if not (x.shape[1] == 1 and x.shape[2] == 1):
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

    Takes the two 32-ch pseudoimages [B, H, W, 32] and returns the 64-ch flow
    pseudoimage [B, H, W, 64].  The encoder weights are shared between pc0 and
    pc1 (one set of ``encoder_step_*`` modules applied twice).
    """

    dtype: Any = jnp.float32

    def setup(self):
        cwn = lambda c, k, s, p, name: ConvWithNorms(
            c, k, s, p, dtype=self.dtype, name=name
        )
        self.encoder_step_1 = ConvWithNorms(
            64, 8, 2, 3, dtype=self.dtype, space_to_depth=True,
            name="encoder_step_1")
        self.encoder_step_2 = cwn(64, 3, 1, 1, "encoder_step_2")
        self.encoder_step_3 = cwn(64, 3, 1, 1, "encoder_step_3")
        self.encoder_step_4 = cwn(64, 3, 1, 1, "encoder_step_4")
        self.encoder_step_5 = cwn(128, 8, 2, 3, "encoder_step_5")
        self.encoder_step_6 = cwn(128, 3, 1, 1, "encoder_step_6")
        self.encoder_step_7 = cwn(128, 3, 1, 1, "encoder_step_7")
        self.encoder_step_8 = cwn(128, 3, 1, 1, "encoder_step_8")
        self.encoder_step_9 = cwn(256, 8, 2, 3, "encoder_step_9")
        self.encoder_step_10 = cwn(256, 3, 1, 1, "encoder_step_10")

        self.decoder_step1 = UpsampleSkip(512, 256, dtype=self.dtype, name="decoder_step1")
        self.decoder_step2 = UpsampleSkip(256, 128, dtype=self.dtype, name="decoder_step2")
        self.decoder_step3 = UpsampleSkip(128, 64, dtype=self.dtype, name="decoder_step3")
        self.decoder_step4 = nn.Conv(
            64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="decoder_step4"
        )

    def _encode(
        self, x: jnp.ndarray, train: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns the three skip scales (stride 2, 4, 8 feature maps)."""
        f = self.encoder_step_1(x, train)
        f = self.encoder_step_2(f, train)
        f = self.encoder_step_3(f, train)
        n = self.encoder_step_4(f, train)          # [H/2, W/2, 64]
        f = self.encoder_step_5(n, train)
        f = self.encoder_step_6(f, train)
        f = self.encoder_step_7(f, train)
        r = self.encoder_step_8(f, train)          # [H/4, W/4, 128]
        f = self.encoder_step_9(r, train)
        t = self.encoder_step_10(f, train)         # [H/8, W/8, 256]
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
        b_star = jnp.concatenate([pc0_img, pc1_img], axis=-1)       # 64

        s = self.decoder_step1(t_star, r_star)
        l = self.decoder_step2(s, n_star)
        u = self.decoder_step3(l, b_star)
        return self.decoder_step4(u)
