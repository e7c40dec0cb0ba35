"""Camera-frustum visualization (matplotlib, file output).

Replaces the reference's Visdom/plotly ``plot_scene`` camera rendering
(reference: demo.py:139-148, train_util.py:283-293; SURVEY.md N9) with a
server-free matplotlib 3D figure: one wire frustum per camera, color-coded
by frame index, one subplot per camera set.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from posediffusion_tpu.geometry.cameras import PerspectiveCameras, camera_center


def _frustum_points(R: np.ndarray, T: np.ndarray, scale: float = 0.1) -> np.ndarray:
    """5 world-space points of a camera wire frustum (apex + 4 corners)."""
    corners_view = np.array(
        [
            [0.0, 0.0, 0.0],
            [-1, -1, 2.0], [1, -1, 2.0], [1, 1, 2.0], [-1, 1, 2.0],
        ]
    ) * scale
    # view -> world for row-vector extrinsics: x_w = (x_v - T) R^T
    return (corners_view - T) @ R.T


def plot_cameras(
    camera_sets: Dict[str, PerspectiveCameras],
    path: str,
    camera_scale: float = 0.1,
):
    """Save a figure with one 3D subplot per named camera set."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import cm

    n_sets = len(camera_sets)
    fig = plt.figure(figsize=(5 * n_sets, 5))
    for si, (name, cams) in enumerate(camera_sets.items()):
        ax = fig.add_subplot(1, n_sets, si + 1, projection="3d")
        R = np.asarray(cams.R)
        T = np.asarray(cams.T)
        n = len(R)
        cmap = cm.get_cmap("hsv") if hasattr(cm, "get_cmap") else plt.get_cmap("hsv")
        for i in range(n):
            pts = _frustum_points(R[i], T[i], camera_scale)
            color = cmap(i / max(n, 1))
            edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
            for a, b in edges:
                ax.plot(*zip(pts[a], pts[b]), color=color, linewidth=0.8)
        centers = np.asarray(camera_center(cams))
        ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], s=4, c="k")
        ax.set_title(name)
        ax.set_box_aspect((1, 1, 1))
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
