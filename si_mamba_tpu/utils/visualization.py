"""Visualization + analysis utilities (reference tools/runner.py:14-111
reconstruction renders, visualize.py Plotly traversal viewer, and the
runner_finetune t-SNE dump :533-631)."""

from __future__ import annotations

import os

import numpy as np


def save_traversal_dump(path: str, center: np.ndarray, neighborhood: np.ndarray,
                        orders: np.ndarray) -> None:
    """npz traversal dump compatible with the reference's visualize.py inputs
    (written at models/point_mamba.py:969-979)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, center=center, neighborhood=neighborhood,
                        orders=orders)


def render_cloud_figure(points: np.ndarray, out_path: str, roll: float = 0,
                        pitch: float = 0) -> None:
    """Matplotlib 3-D scatter render (reference utils/misc.py:192-209)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.view_init(roll, pitch)
    x, z, y = points.transpose(1, 0)
    mx = np.max(np.abs(points))
    ax.set_xbound(-mx, mx)
    ax.set_ybound(-mx, mx)
    ax.set_zbound(-mx, mx)
    ax.scatter(x, y, z, zdir="z", c=x, cmap="jet", s=2)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=150)
    plt.close(fig)


def save_reconstruction(out_dir: str, tag: str, full: np.ndarray,
                        visible: np.ndarray) -> None:
    """Dump gt/visible/rebuilt clouds as txt + jpg (reference tools/
    runner.py:70-100)."""
    os.makedirs(out_dir, exist_ok=True)
    np.savetxt(os.path.join(out_dir, f"{tag}_full.txt"), full, delimiter=";")
    np.savetxt(os.path.join(out_dir, f"{tag}_vis.txt"), visible, delimiter=";")
    render_cloud_figure(full, os.path.join(out_dir, f"{tag}_full.jpg"))
    render_cloud_figure(visible, os.path.join(out_dir, f"{tag}_vis.jpg"))


def traversal_viewer_html(npz_path: str, out_html: str, sample: int = 0) -> None:
    """Standalone Plotly viewer with a K-slider over traversal orders
    (replacement for the reference's visualize.py:25-130 interactive app).
    Falls back to a no-op if plotly is unavailable."""
    try:
        import plotly.graph_objects as go
    except Exception:
        return
    data = np.load(npz_path)
    center = data["center"]
    orders = data["orders"]
    if center.ndim == 4:  # (B, K, G, 3)
        centers_k = center[sample]
    else:
        K = orders.shape[1]
        centers_k = center[sample].reshape(K, -1, 3)
    frames = []
    for k in range(centers_k.shape[0]):
        c = centers_k[k]
        frames.append(go.Frame(
            data=[go.Scatter3d(x=c[:, 0], y=c[:, 1], z=c[:, 2],
                               mode="markers+lines",
                               marker=dict(size=3, color=np.arange(len(c)),
                                           colorscale="Viridis"))],
            name=str(k)))
    fig = go.Figure(data=frames[0].data, frames=frames)
    fig.update_layout(sliders=[{
        "steps": [{"args": [[f.name]], "label": f.name, "method": "animate"}
                  for f in frames]}])
    fig.write_html(out_html)


def tsne_features(features: np.ndarray, labels: np.ndarray, out_path: str) -> None:
    """2-D t-SNE scatter of pooled features (reference test_tsne :615-631)."""
    from sklearn.manifold import TSNE
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    emb = TSNE(n_components=2, init="pca", random_state=0).fit_transform(features)
    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab20", s=4)
    fig.colorbar(sc)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
