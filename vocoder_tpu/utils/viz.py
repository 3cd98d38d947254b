"""Validation visualisation: stacked mel figures (utils/viz.py:8-29 parity)."""

from __future__ import annotations

import numpy as np


def plot_mel(data, titles=None):
    """List of (n_mels, T) arrays -> matplotlib figure of stacked mels."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(len(data), 1, squeeze=False)
    if titles is None:
        titles = [None] * len(data)
    plt.tight_layout()

    for i, mel in enumerate(data):
        mel = np.asarray(mel)
        axes[i][0].imshow(mel, origin="lower")
        axes[i][0].set_aspect(2.5, adjustable="box")
        axes[i][0].set_ylim(0, mel.shape[0])
        axes[i][0].set_title(titles[i], fontsize="medium")
        axes[i][0].tick_params(labelsize="x-small", left=False, labelleft=False)
        axes[i][0].set_anchor("W")
    return fig
