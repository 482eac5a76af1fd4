"""Evaluation plots: per-frame error CDFs and 3-D trajectory overlays.

Re-implements the MATLAB plot tooling (rgbddataset_cdf_plots.m:49-129,
rgbddataset_trajectory_plot.m) in matplotlib: relative-pose-error CDFs
for any number of methods against ground truth, and trajectory plots.
Baseline CSVs in the reference's `cv_rgbd_poses.csv` format (per-frame
relative poses) are supported for the OpenCV-VO comparison.
"""

from __future__ import annotations

import numpy as np


def relative_errors(gt_traj, est_traj):
    """Per-consecutive-frame relative pose errors (m, rad) — the
    quantity the CDF plots bin (rgbddataset_cdf_plots.m:49-99)."""
    stamps = sorted(set(gt_traj) & set(est_traj))
    t_err, r_err = [], []
    for a, b in zip(stamps[:-1], stamps[1:]):
        rel_gt = np.linalg.inv(gt_traj[a]) @ gt_traj[b]
        rel_est = np.linalg.inv(est_traj[a]) @ est_traj[b]
        e = np.linalg.inv(rel_gt) @ rel_est
        t_err.append(float(np.linalg.norm(e[:3, 3])))
        r_err.append(
            float(np.arccos(np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)))
        )
    return np.array(t_err), np.array(r_err)


def load_relative_pose_csv(path):
    """Read the reference's cv_rgbd_poses.csv format: one relative
    [4,4] transform per frame, rows flattened row-major."""
    raw = np.loadtxt(path, delimiter=",")
    if raw.ndim == 1:
        raw = raw[None, :]
    if raw.shape[1] == 16:
        return raw.reshape(-1, 4, 4)
    if raw.shape[1] == 12:
        out = np.tile(np.eye(4), (raw.shape[0], 1, 1))
        out[:, :3, :4] = raw.reshape(-1, 3, 4)
        return out
    raise ValueError(f"unsupported csv shape {raw.shape}")


def plot_error_cdfs(methods, out_path, title="Relative pose error CDF"):
    """methods: {name: (trans_errors, rot_errors)} -> saves a 2-panel
    CDF figure (rgbddataset_cdf_plots.m:102-129)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    for name, (te, re) in methods.items():
        for ax, err, unit in ((ax1, te, "m"), (ax2, np.degrees(re), "deg")):
            x = np.sort(err)
            y = np.arange(1, len(x) + 1) / len(x)
            ax.plot(x, y, label=name)
    ax1.set_xlabel("translation error (m)")
    ax2.set_xlabel("rotation error (deg)")
    for ax in (ax1, ax2):
        ax.set_ylabel("CDF")
        ax.grid(True, alpha=0.3)
        ax.legend()
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_trajectories(trajs, out_path, title="Trajectories"):
    """trajs: {name: {t: [4,4]}} -> 3-D trajectory figure
    (rgbddataset_trajectory_plot.m)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(111, projection="3d")
    for name, traj in trajs.items():
        pts = np.array([traj[t][:3, 3] for t in sorted(traj)])
        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], label=name)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.set_zlabel("z (m)")
    ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
