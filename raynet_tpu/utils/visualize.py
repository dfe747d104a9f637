"""Matplotlib visualization helpers (depth maps, distributions, patches).

Parity: raynet/utils/visualize.py — non-interactive plotting utilities used
for debugging samples and eyeballing predicted depth distributions.
"""
import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_image(image, output_file=None, title=None):
    plt = _plt()
    fig, ax = plt.subplots()
    data = image.image if hasattr(image, "image") else np.asarray(image)
    ax.imshow(data.squeeze())
    if title:
        ax.set_title(title)
    ax.axis("off")
    if output_file:
        fig.savefig(output_file, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_depth_map(depth_map, output_file=None, cmap="viridis"):
    plt = _plt()
    fig, ax = plt.subplots()
    im = ax.imshow(np.asarray(depth_map), cmap=cmap)
    fig.colorbar(im, ax=ax)
    ax.axis("off")
    if output_file:
        fig.savefig(output_file, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_image_with_projected_points(image, pixels, output_file=None):
    """Overlay projected patch centers on an image; pixels: (N, 2) (x, y)."""
    plt = _plt()
    fig, ax = plt.subplots()
    data = image.image if hasattr(image, "image") else np.asarray(image)
    ax.imshow(data.squeeze())
    pixels = np.asarray(pixels)
    ax.scatter(pixels[:, 0], pixels[:, 1], s=6, c="r", marker="x")
    ax.axis("off")
    if output_file:
        fig.savefig(output_file, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_depth_distribution(s, target=None, output_file=None):
    """Bar plot of a per-ray depth distribution, optional target overlay."""
    plt = _plt()
    fig, ax = plt.subplots()
    s = np.asarray(s).ravel()
    ax.bar(np.arange(len(s)), s, alpha=0.7, label="predicted")
    if target is not None:
        target = np.asarray(target).ravel()
        ax.bar(np.arange(len(target)), target, alpha=0.4, label="target")
    ax.set_xlabel("depth hypothesis")
    ax.set_ylabel("probability")
    ax.legend()
    if output_file:
        fig.savefig(output_file, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_batch_of_patches(patches, output_file=None, max_cols=8):
    """Grid plot of a (N, H, W, C) patch batch."""
    plt = _plt()
    patches = np.asarray(patches)
    n = len(patches)
    cols = min(n, max_cols)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(patches[i].squeeze())
    if output_file:
        fig.savefig(output_file, bbox_inches="tight")
        plt.close(fig)
    return fig
