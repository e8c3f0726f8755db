"""Matplotlib-based plotting utilities.

Reference: saber/data/visualizer/easy_plot.py — grid plotting of
images/curves/spectrograms, viridis color mapping to uint8 images, and
figure→numpy conversion (used by the TB plot plugins and eval image tracks).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Union

import numpy as np


def color_mapping(values: np.ndarray, cmap: str = "viridis",
                  vmin: Optional[float] = None, vmax: Optional[float] = None) -> np.ndarray:
    """(H, W) floats → (H, W, 3) uint8 via a matplotlib colormap."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm

    values = np.asarray(values, np.float64)
    vmin = values.min() if vmin is None else vmin
    vmax = values.max() if vmax is None else vmax
    denom = (vmax - vmin) or 1.0
    norm = np.clip((values - vmin) / denom, 0, 1)
    rgba = cm.get_cmap(cmap)(norm)
    return (rgba[..., :3] * 255).astype(np.uint8)


def figure_to_numpy(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def plot_item(ax, item: Union[np.ndarray, dict], title: str = ""):
    """Heuristic single-axes plot: 1D → curve, 2D → image (origin lower)."""
    data = item["data"] if isinstance(item, dict) else item
    if isinstance(item, dict):
        title = item.get("title", title)
    data = np.asarray(data)
    if data.ndim == 1:
        ax.plot(data)
    elif data.ndim == 2:
        ax.imshow(data, aspect="auto", origin="lower", interpolation="nearest")
    elif data.ndim == 3:
        ax.imshow(data)
    ax.set_title(title, fontsize=8)


def plot_grid(items: List, cols: Optional[int] = None, figsize_each: float = 3.0) -> np.ndarray:
    """List of arrays/dicts → one grid image (numpy uint8)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(items)
    cols = cols or int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols * figsize_each, rows * figsize_each))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax in axes[n:]:
        ax.axis("off")
    for ax, item in zip(axes, items):
        plot_item(ax, item)
    fig.tight_layout()
    img = figure_to_numpy(fig)
    plt.close(fig)
    return img


def plot(item, **kwargs) -> np.ndarray:
    return plot_grid([item], **kwargs)
