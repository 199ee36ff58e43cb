#!/usr/bin/env python
"""Scene-flow visualizer (reference README.md:108-115 CLI contract).

``python tools/visualization.py --data_dir <h5 dir> --res_name deflow_best``

The reference uses an interactive Open3D viewer; this environment is
headless, so the default backend renders bird's-eye-view PNG frames
(points colored by predicted flow magnitude, flow vectors drawn for dynamic
points) into ``--out_dir``.  If open3d is importable an interactive window is
used instead, keeping the reference workflow intact on workstations.
"""

from __future__ import annotations

import argparse
import os

import h5py
import numpy as np


def flow_to_rgb(flow: np.ndarray, max_mag: float = 1.0) -> np.ndarray:
    """Direction → hue, magnitude → saturation (standard optical-flow wheel)."""
    import colorsys

    ang = (np.arctan2(flow[:, 1], flow[:, 0]) + np.pi) / (2 * np.pi)
    mag = np.clip(np.linalg.norm(flow[:, :2], axis=1) / max_mag, 0, 1)
    rgb = np.array([colorsys.hsv_to_rgb(h, s, 0.9) for h, s in zip(ang, mag)])
    return rgb


def render_frame_png(pc, flow, pose_flow, out_path, title=""):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    net = flow - pose_flow if flow is not None else None
    fig, ax = plt.subplots(figsize=(10, 10), dpi=110)
    if net is None:
        ax.scatter(pc[:, 0], pc[:, 1], s=0.3, c="gray")
    else:
        colors = flow_to_rgb(net)
        ax.scatter(pc[:, 0], pc[:, 1], s=0.4, c=colors)
        dyn = np.linalg.norm(net, axis=1) > 0.05
        if dyn.any():
            sub = np.flatnonzero(dyn)[::9]
            ax.quiver(pc[sub, 0], pc[sub, 1], net[sub, 0], net[sub, 1],
                      angles="xy", scale_units="xy", scale=0.15,
                      width=0.0012, color="black", alpha=0.6)
    ax.set_xlim(-52, 52); ax.set_ylim(-52, 52)
    ax.set_aspect("equal"); ax.set_title(title)
    ax.set_xlabel("x [m]"); ax.set_ylabel("y [m]")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def _frame_arrays(g, res_name, remove_ground=True):
    pc = g["lidar"][:][:, :3]
    keep = np.ones(len(pc), bool)
    if remove_ground and "ground_mask" in g:
        keep = ~g["ground_mask"][:].astype(bool)
    pc = pc[keep]
    flow = g[res_name][:] if res_name in g else None
    if flow is not None and len(flow) != len(pc):
        # flow may be stored for ground-removed points already
        flow = flow[: len(pc)] if len(flow) > len(pc) else None
    pose_flow = np.zeros_like(pc)
    if "ego_motion" in g:
        rel = g["ego_motion"][:]
        pose_flow = pc @ rel[:3, :3].T + rel[:3, 3] - pc
    return pc, flow, pose_flow


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--res_name", "--flow_mode", dest="res_name", default="flow")
    p.add_argument("--out_dir", default="logs/vis")
    p.add_argument("--max_frames", type=int, default=20)
    p.add_argument("--keep_ground", action="store_true")
    args = p.parse_args()

    try:
        import open3d  # noqa: F401
        interactive = True
    except ImportError:
        interactive = False

    os.makedirs(args.out_dir, exist_ok=True)
    rendered = 0
    for fname in sorted(os.listdir(args.data_dir)):
        if not fname.endswith(".h5") or rendered >= args.max_frames:
            continue
        with h5py.File(os.path.join(args.data_dir, fname), "r") as f:
            for ts in sorted(f.keys(), key=int):
                if rendered >= args.max_frames:
                    break
                pc, flow, pose_flow = _frame_arrays(
                    f[ts], args.res_name, remove_ground=not args.keep_ground)
                if interactive:
                    _show_open3d(pc, flow, pose_flow)
                else:
                    out = os.path.join(
                        args.out_dir, f"{fname[:-3]}_{ts}_{args.res_name}.png")
                    render_frame_png(pc, flow, pose_flow, out,
                                     title=f"{fname[:-3]} @ {ts} [{args.res_name}]")
                    print("wrote", out)
                rendered += 1


def _show_open3d(pc, flow, pose_flow):
    import open3d as o3d

    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(pc)
    if flow is not None:
        pcd.colors = o3d.utility.Vector3dVector(flow_to_rgb(flow - pose_flow))
    o3d.visualization.draw_geometries([pcd])


if __name__ == "__main__":
    main()
