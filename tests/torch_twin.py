"""Torch twin of the DeFlow model, for converter/parity tests ONLY.

This environment has no network egress, so the published
``deflow_best.ckpt`` (reference README.md:20,86) cannot be fetched.  To still
gate the torch→JAX converter and forward parity, this module provides a torch
model whose *state-dict key layout* matches the reference lineage
(reference deflow.py:41-47 prefix contract; mmdet3d DynamicPillarFeatureNet /
FastFlow3D U-Net / DeFlow GRU head naming) and whose forward follows the
reference semantics (reference deflow.py:49-113, decoder.py) — written
independently, batched over one compacted sample at a time, eval-mode.

Tests randomize every weight and running stat, run both models on the same
cloud, and require per-point agreement — the strongest offline stand-in for
the published-checkpoint EPE parity gate (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


# ---------------------------------------------------------------- building blocks
class _ConvBNGelu(nn.Module):
    def __init__(self, cin, cout, k, s, p):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, p)
        self.batchnorm = nn.BatchNorm2d(cout)
        self.nonlinearity = nn.GELU()

    def forward(self, x):
        y = self.conv(x)
        if y.shape[2] != 1 or y.shape[3] != 1:
            y = self.batchnorm(y)
        return self.nonlinearity(y)


class _UpSkip(nn.Module):
    def __init__(self, skip_c, latent_c, out_c):
        super().__init__()
        self.u1_u2 = nn.Sequential(
            nn.Conv2d(skip_c, skip_c // 4, 1),
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            nn.Conv2d(skip_c // 4, skip_c // 8, 1),
        )
        self.u3 = nn.Conv2d(latent_c, skip_c // 8, 1)
        self.u4_u5 = nn.Sequential(
            nn.Conv2d(skip_c // 4, skip_c // 8, 1),
            nn.Conv2d(skip_c // 8, out_c, 1),
        )

    def forward(self, a, b):
        up = self.u1_u2(a)
        lat = self.u3(b)
        return self.u4_u5(torch.cat([up, lat], dim=1))


class _UNet(nn.Module):
    def __init__(self):
        super().__init__()
        chans = [(32, 64, 8, 2, 3), (64, 64, 3, 1, 1), (64, 64, 3, 1, 1),
                 (64, 64, 3, 1, 1), (64, 128, 8, 2, 3), (128, 128, 3, 1, 1),
                 (128, 128, 3, 1, 1), (128, 128, 3, 1, 1), (128, 256, 8, 2, 3),
                 (256, 256, 3, 1, 1)]
        for i, spec in enumerate(chans, start=1):
            setattr(self, f"encoder_step_{i}", _ConvBNGelu(*spec))
        self.decoder_step1 = _UpSkip(512, 256, 256)
        self.decoder_step2 = _UpSkip(256, 128, 128)
        self.decoder_step3 = _UpSkip(128, 64, 64)
        self.decoder_step4 = nn.Conv2d(64, 64, 3, 1, 1)

    def _enc(self, x):
        taps = {}
        for i in range(1, 11):
            x = getattr(self, f"encoder_step_{i}")(x)
            if i in (4, 8, 10):
                taps[i] = x
        return taps[4], taps[8], taps[10]

    def forward(self, img0, img1):
        n0, r0, t0 = self._enc(img0)
        n1, r1, t1 = self._enc(img1)
        s = self.decoder_step1(torch.cat([t0, t1], 1), torch.cat([r0, r1], 1))
        l = self.decoder_step2(s, torch.cat([n0, n1], 1))
        u = self.decoder_step3(l, torch.cat([img0, img1], 1))
        return self.decoder_step4(u)


class _GRUHead(nn.Module):
    def __init__(self, c=64, num_iters=4):
        super().__init__()
        self.num_iters = num_iters
        self.offset_encoder = nn.Linear(3, c)
        self.gru = nn.Module()
        self.gru.convz = nn.Conv1d(3 * c, 2 * c, 1)
        self.gru.convr = nn.Conv1d(3 * c, 2 * c, 1)
        self.gru.convq = nn.Conv1d(3 * c, 2 * c, 1)
        self.decoder = nn.Sequential(nn.Linear(3 * c, c // 2), nn.GELU(), nn.Linear(c // 2, 3))

    def forward(self, voxel_feat_n128, offsets_n3):
        x = self.offset_encoder(offsets_n3).T.unsqueeze(0)      # [1, 64, N]
        h = voxel_feat_n128.T.unsqueeze(0)                      # [1, 128, N]
        for _ in range(self.num_iters):
            hx = torch.cat([h, x], dim=1)
            z = torch.sigmoid(self.gru.convz(hx))
            r = torch.sigmoid(self.gru.convr(hx))
            q = torch.tanh(self.gru.convq(torch.cat([r * h, x], dim=1)))
            h = (1 - z) * h + z * q
        feat = torch.cat([h.squeeze(0).T, x.squeeze(0).T], dim=1)
        return self.decoder(feat)


class _LinearHead(nn.Module):
    def __init__(self, c=64):
        super().__init__()
        self.offset_encoder = nn.Linear(3, 128)
        self.decoder = nn.Sequential(nn.Linear(4 * c, 32), nn.GELU(), nn.Linear(32, 3))

    def forward(self, voxel_feat_n128, offsets_n3):
        off = self.offset_encoder(offsets_n3)
        return self.decoder(torch.cat([voxel_feat_n128, off], dim=1))


class _MMHead(nn.Module):
    """Transformer ablation head twin (reference decoder.py:6-70 semantics:
    4-layer post-norm TransformerDecoder over 512-point chunks)."""

    def __init__(self, c=64):
        super().__init__()
        self.offset_encoder = nn.Linear(3, 128)
        layer = nn.TransformerDecoderLayer(d_model=128, nhead=4)
        self.pts_off_transformer = nn.TransformerDecoder(layer, num_layers=4)
        self.decoder = nn.Sequential(nn.Linear(2 * c, 32), nn.GELU(),
                                     nn.Linear(32, 3))

    def forward(self, voxel_feat_n128, offsets_n3, chunk=512):
        tgt = voxel_feat_n128.unsqueeze(1)            # [N, 1, 128]
        mem = self.offset_encoder(offsets_n3).unsqueeze(1)
        out = torch.zeros_like(tgt)
        for s in range(0, tgt.shape[0], chunk):
            out[s:s + chunk] = self.pts_off_transformer(
                tgt[s:s + chunk], mem[s:s + chunk])
        return self.decoder(out.squeeze(1))


class _FeatureNet(nn.Module):
    """mmdet3d DynamicPillarFeatureNet key layout: pfn_layers.0 = Sequential."""

    def __init__(self, cout=32):
        super().__init__()
        self.pfn_layers = nn.ModuleList([
            nn.Sequential(nn.Linear(9, cout, bias=False),
                          nn.BatchNorm1d(cout, eps=1e-3, momentum=0.01),
                          nn.ReLU())
        ])

    def forward(self, feats9):
        return self.pfn_layers[0](feats9)


class _Embedder(nn.Module):
    def __init__(self, cout=32):
        super().__init__()
        self.feature_net = _FeatureNet(cout)


class TorchDeFlow(nn.Module):
    """Full twin; forward runs ONE sample compacted, reference-style."""

    def __init__(self, decoder_option="gru", num_iters=4,
                 voxel_size=(0.2, 0.2, 6.0),
                 point_cloud_range=(-51.2, -51.2, -3.0, 51.2, 51.2, 3.0)):
        super().__init__()
        self.voxel_size = voxel_size
        self.pc_range = point_cloud_range
        self.grid = tuple(
            int(round((point_cloud_range[i + 3] - point_cloud_range[i]) / voxel_size[i]))
            for i in range(3)
        )
        self.embedder = _Embedder(32)
        self.backbone = _UNet()
        self.head = {"gru": lambda: _GRUHead(64, num_iters),
                     "linear": lambda: _LinearHead(64),
                     "mmhead": lambda: _MMHead(64)}[decoder_option]()

    # -- voxel pipeline (reference DynamicEmbedder semantics) -------------------
    def _voxelize(self, pts):
        lo = torch.tensor(self.pc_range[:3], dtype=torch.float32)
        vs = torch.tensor(self.voxel_size, dtype=torch.float32)
        coords = torch.floor((pts - lo) / vs).to(torch.int64)
        gx, gy, gz = self.grid
        ok = ((coords[:, 0] >= 0) & (coords[:, 0] < gx)
              & (coords[:, 1] >= 0) & (coords[:, 1] < gy)
              & (coords[:, 2] >= 0) & (coords[:, 2] < gz))
        pts, coords = pts[ok], coords[ok]
        center = (coords.float() + 0.5) * vs + lo
        pid = coords[:, 1] * gx + coords[:, 0]
        # per-pillar centroid over compacted points
        npil = gx * gy
        sums = torch.zeros(npil, 3).index_add_(0, pid, pts)
        cnt = torch.zeros(npil).index_add_(0, pid, torch.ones(len(pts)))
        centroid = sums / cnt.clamp(min=1).unsqueeze(1)
        feats9 = torch.cat([pts, pts - centroid[pid], pts - center], dim=1)
        return pts, coords, pid, feats9, ok

    def _pseudoimage(self, feats9, pid):
        gx, gy, _ = self.grid
        pf = self.embedder.feature_net(feats9)                   # [N, 32]
        npil = gx * gy
        acc = torch.zeros(npil, pf.shape[1]).index_add_(0, pid, pf)
        cnt = torch.zeros(npil).index_add_(0, pid, torch.ones(len(pf)))
        mean = acc / cnt.clamp(min=1).unsqueeze(1)
        return mean.T.reshape(1, pf.shape[1], gy, gx)            # [1, C, Y, X]

    @torch.no_grad()
    def forward(self, pc0, pc1, pose0, pose1):
        p1inv = torch.linalg.inv(pose1)
        rel = p1inv @ pose0
        tpc0 = pc0 @ rel[:3, :3].T + rel[:3, 3]
        pose_flow = tpc0 - pc0

        pts0, coords0, pid0, f0, ok0 = self._voxelize(tpc0)
        pts1, coords1, pid1, f1, ok1 = self._voxelize(pc1)
        img0 = self._pseudoimage(f0, pid0)
        img1 = self._pseudoimage(f1, pid1)

        flow_img = self.backbone(img0, img1)                     # [1, 64, Y, X]
        before = torch.cat([img0, img1], dim=1)                  # [1, 64, Y, X]

        y, x = coords0[:, 1], coords0[:, 0]
        gather = lambda im: im[0, :, y, x].T                     # [N, 64]
        voxel_feat = torch.cat([gather(before), gather(flow_img)], dim=1)
        lo = torch.tensor(self.pc_range[:3], dtype=torch.float32)
        vs = torch.tensor(self.voxel_size, dtype=torch.float32)
        offsets = pts0 - ((coords0.float() + 0.5) * vs + lo)
        flow = self.head(voxel_feat, offsets)
        return {"flow": flow, "pose_flow": pose_flow, "valid0": ok0,
                "points0": pts0, "valid1": ok1}


def randomize_(model: TorchDeFlow, seed: int = 0) -> None:
    """Random weights AND random plausible BN running stats, eval mode."""
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        with torch.no_grad():
            p.uniform_(-0.2, 0.2, generator=g)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)
    model.eval()
