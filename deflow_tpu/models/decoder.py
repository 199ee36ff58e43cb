"""Decoder heads: per-point flow from pseudoimage features.

Rebuilds the reference's three heads (reference decoder.py):
- ``LinearDecoder`` (FastFlow3D head, decoder.py:72-120),
- ``ConvGRUDecoder`` (DeFlow's contribution, decoder.py:141-199): the gathered
  128-d voxel feature is the GRU *hidden state*, the 64-d offset embedding is
  the *input*, iterated ``num_iters`` times,
- ``MMHeadDecoder`` (transformer ablation head, decoder.py:6-70).

TPU-first: the reference loops per sample and compacts valid points
(decoder.py:192); here every head consumes dense ``[B, N, C]`` buffers with a
validity mask, the per-point "unpillar" gather
(``pseudoimage[:, vc[:,1], vc[:,2]].T``, decoder.py:34-37) becomes a batched
take on the flattened [H*W, C] image, and the GRU's 1x1 Conv1d gates become
Dense layers on the channel axis (identical math, MXU-shaped).

Channel arithmetic preserved exactly (SURVEY.md §2.1): gathered before/after
features 64+64 = 128 = GRU hidden; offset embedding 64 = GRU input; final MLP
in 192 → 32 → GELU → 3.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from deflow_tpu.ops.voxel import PillarInfo, pseudoimage_gather_batched


def gather_voxel_features(
    before_tab: jnp.ndarray, after_tab: jnp.ndarray, info: PillarInfo,
    plan=None,
) -> jnp.ndarray:
    """Batched unpillar gather: flat pillar tables [B,P,C]×2 + PillarInfo →
    [B, N, 2C].

    The model converts pseudoimages to id-ordered tables via
    ``ops.voxel.image_to_table`` (a pure reshape in either layout).  Gathering
    both tables as one concatenated [B,P,2C] tensor halves the gather count,
    and ``plan`` routes the backward scatter through the Pallas kernel."""
    both = jnp.concatenate([before_tab, after_tab], axis=-1)
    return pseudoimage_gather_batched(both, info, plan)


class FlowMLP(nn.Module):
    """The shared 2-layer flow regressor: Dense(32) → GELU → Dense(3).

    Torch twin: ``decoder.0`` / ``decoder.2`` in each head's nn.Sequential.
    """

    hidden: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(3, dtype=self.dtype, name="fc2")(x)


class LinearDecoder(nn.Module):
    """FastFlow3D head (reference decoder.py:72-120)."""

    pseudoimage_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        before_img: jnp.ndarray,
        after_img: jnp.ndarray,
        info: PillarInfo,
        plan=None,
        train: bool = False,
    ) -> jnp.ndarray:
        voxel_feats = gather_voxel_features(before_img, after_img, info, plan)  # [B,N,128]
        offset_feats = nn.Dense(128, dtype=self.dtype, name="offset_encoder")(info.offsets)
        flow = FlowMLP(dtype=self.dtype, name="decoder")(
            jnp.concatenate([voxel_feats, offset_feats], axis=-1)
        )
        return jnp.where(info.valid[..., None], flow, 0.0)


def _dense_init(key, shape):
    """Dense-compatible param leaf: {'kernel', 'bias'} (same tree layout as
    nn.Dense so the torch converter keys are unchanged)."""
    import jax as _jax

    kin, kout = shape
    kkey, _ = _jax.random.split(key)
    return {
        "kernel": nn.initializers.lecun_normal()(kkey, (kin, kout)),
        "bias": jnp.zeros((kout,), jnp.float32),
    }


class ConvGRU(nn.Module):
    """GRU cell with per-point (1x1-conv ≡ Dense) gates (decoder.py:123-139).

    The z and r gates share the same input, so their weights are concatenated
    into ONE [in, 2H] matmul — the op is bandwidth-bound on the ~524k-point
    buffers.  Parameters stay as separate ``convz``/``convr``/``convq``
    leaves (checkpoint layout identical to the reference's Conv1d gates);
    :meth:`merged_weights` exposes the fused layout for the Pallas kernel.
    """

    hidden_dim: int = 128
    input_dim: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        in_dim = self.hidden_dim + self.input_dim
        self.convz = self.param("convz", _dense_init, (in_dim, self.hidden_dim))
        self.convr = self.param("convr", _dense_init, (in_dim, self.hidden_dim))
        self.convq = self.param("convq", _dense_init, (in_dim, self.hidden_dim))

    def merged_weights(self):
        w_zr = jnp.concatenate(
            [self.convz["kernel"], self.convr["kernel"]], axis=-1)
        b_zr = jnp.concatenate([self.convz["bias"], self.convr["bias"]])
        return w_zr, b_zr, self.convq["kernel"], self.convq["bias"]

    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        hd = self.hidden_dim
        w_zr, b_zr, w_q, b_q = self.merged_weights()
        hx = jnp.concatenate([h, x], axis=-1).astype(self.dtype)
        zr = nn.sigmoid(hx @ w_zr.astype(self.dtype) + b_zr.astype(self.dtype))
        z, r = zr[..., :hd], zr[..., hd:]
        rh_x = jnp.concatenate([r * h, x], axis=-1)
        q = nn.tanh(rh_x @ w_q.astype(self.dtype) + b_q.astype(self.dtype))
        return (1 - z) * h + z * q


class ConvGRUDecoder(nn.Module):
    """DeFlow's iterative GRU refinement head (reference decoder.py:141-199)."""

    pseudoimage_channels: int = 64
    num_iters: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        before_img: jnp.ndarray,
        after_img: jnp.ndarray,
        info: PillarInfo,
        plan=None,
        train: bool = False,
    ) -> jnp.ndarray:
        c = self.pseudoimage_channels
        voxel_feats = gather_voxel_features(before_img, after_img, info, plan)  # [B,N,2c]
        offset_feats = nn.Dense(c, dtype=self.dtype, name="offset_encoder")(info.offsets)

        gru = ConvGRU(hidden_dim=2 * c, input_dim=c, dtype=self.dtype, name="gru")
        from deflow_tpu.ops.voxel import _use_pallas

        if self.num_iters > 0 and 2 * c == 128 and _use_pallas():
            # fused Pallas recurrence: h stays in VMEM across all iterations
            from deflow_tpu.ops.pallas_gru import fused_gru

            b, n, hd = voxel_feats.shape
            w_zr, b_zr, w_q, b_q = gru.merged_weights()
            h = fused_gru(
                voxel_feats.reshape(b * n, hd).astype(self.dtype),
                offset_feats.reshape(b * n, c).astype(self.dtype),
                w_zr.astype(self.dtype), b_zr.astype(self.dtype),
                w_q.astype(self.dtype), b_q.astype(self.dtype),
                self.num_iters,
            ).reshape(b, n, hd)
        else:
            h = voxel_feats
            for _ in range(self.num_iters):  # static unroll (ablations ≤ 16)
                h = gru(h, offset_feats)

        flow = FlowMLP(hidden=c // 2, dtype=self.dtype, name="decoder")(
            jnp.concatenate([h, offset_feats], axis=-1)
        )
        return jnp.where(info.valid[..., None], flow, 0.0)


class _TransformerDecoderLayer(nn.Module):
    """Post-norm torch ``nn.TransformerDecoderLayer`` twin (d_model=128, nhead=4,
    ffn=2048, ReLU, dropout=0.1 — the torch ctor defaults,
    reference decoder.py:18).  Dropout sites mirror torch exactly: on the
    attention weights inside each MHA, after each attention block
    (dropout1/dropout2), after the FFN activation, and after the FFN output
    (dropout3); all active only when ``train=True`` (needs a ``dropout``
    RNG), so eval parity with the torch twin is bit-comparable.

    ``key_mask`` [batch, kv] marks rows that are real points; padding rows
    are excluded as attention KEYS so they cannot contaminate valid outputs.
    """

    d_model: int = 128
    nhead: int = 4
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray,
                 key_mask: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        det = not train
        mask = None if key_mask is None else key_mask[:, None, None, :]
        drop = lambda z: nn.Dropout(self.dropout, deterministic=det)(z)
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=det, name="self_attn"
        )(tgt, tgt, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + drop(sa))
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=det, name="multihead_attn"
        )(x, memory, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + drop(ca))
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        y = drop(nn.relu(y))
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(x + drop(y))


class MMHeadDecoder(nn.Module):
    """Transformer ablation head (reference decoder.py:6-70).

    The reference runs a 4-layer TransformerDecoder over 512-point chunks of
    the COMPACTED valid set (SPLIT_BATCH_SIZE, decoder.py:6,47-51) — chunked
    purely to bound memory.  Matching that on static shapes: a stable sort
    moves valid rows to the front (original order preserved, so chunk
    membership is identical to the reference's), all chunks run as one
    batched attention, the single partial tail chunk masks its padding rows
    as attention keys (same softmax support as torch's shorter last chunk),
    and the outputs unsort back to dense [B, N] row order.
    """

    pseudoimage_channels: int = 64
    chunk: int = 512
    num_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        before_img: jnp.ndarray,
        after_img: jnp.ndarray,
        info: PillarInfo,
        plan=None,
        train: bool = False,
    ) -> jnp.ndarray:
        voxel_feats = gather_voxel_features(before_img, after_img, info, plan)  # [B,N,128]
        offset_feats = nn.Dense(128, dtype=self.dtype, name="offset_encoder")(info.offsets)

        b, n, d = voxel_feats.shape
        # compact valid rows first (reference chunks the compacted valid set)
        perm = jnp.argsort(jnp.logical_not(info.valid), axis=1, stable=True)
        take = jax.vmap(lambda t, i: t[i])
        vf = take(voxel_feats, perm)
        of = take(offset_feats, perm)
        active = jnp.arange(n)[None, :] < jnp.sum(info.valid, axis=1)[:, None]

        pad = (-n) % self.chunk
        tgt = jnp.pad(vf, ((0, 0), (0, pad), (0, 0))).reshape(-1, self.chunk, d)
        mem = jnp.pad(of, ((0, 0), (0, pad), (0, 0))).reshape(-1, self.chunk, d)
        kmask = jnp.pad(active, ((0, 0), (0, pad))).reshape(-1, self.chunk)

        x = tgt
        for i in range(self.num_layers):
            x = _TransformerDecoderLayer(dtype=self.dtype, name=f"layers_{i}")(
                x, mem, key_mask=kmask, train=train)
        x = x.reshape(b, n + pad, d)[:, :n]
        x = take(x, jnp.argsort(perm, axis=1))         # unsort to dense order

        flow = FlowMLP(dtype=self.dtype, name="decoder")(x)
        return jnp.where(info.valid[..., None], flow, 0.0)
