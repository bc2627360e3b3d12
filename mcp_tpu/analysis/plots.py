"""Radar charts, runtime-scaling plots, and loss-curve plots.

Mirror of the reference's visualization suite (scripts/radar_plot_{4,10,ped}.py,
scripts/time_plot.py, examples/loss_visualize.py). Matplotlib with Agg —
figures are written to files, never shown.
"""

from __future__ import annotations

import json
from typing import Mapping, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def radar_plot(
    metrics_by_mode: Mapping[str, Mapping[str, float]],
    out_path: str,
    *,
    metric_names: Optional[Sequence[str]] = None,
    title: str = "Selection-mode comparison",
) -> None:
    """Radar chart over modes with per-axis min/max normalization
    (radar_plot_10.py:99-165: each metric axis is scaled to its min..max
    range across modes)."""
    modes = list(metrics_by_mode)
    if metric_names is None:
        metric_names = list(next(iter(metrics_by_mode.values())))
    K = len(metric_names)
    values = np.array(
        [[metrics_by_mode[m][k] for k in metric_names] for m in modes]
    )  # (modes, K)
    lo, hi = values.min(axis=0), values.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    normalized = (values - lo) / span

    angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
    fig, ax = plt.subplots(figsize=(8, 8), subplot_kw={"projection": "polar"})
    for mode, row in zip(modes, normalized):
        closed = np.concatenate([row, row[:1]])
        ax.plot(np.concatenate([angles, angles[:1]]), closed, label=mode)
        ax.fill(np.concatenate([angles, angles[:1]]), closed, alpha=0.08)
    ax.set_xticks(angles)
    ax.set_xticklabels(metric_names)
    ax.set_title(title)
    ax.legend(loc="upper right", bbox_to_anchor=(1.35, 1.1), fontsize=8)
    fig.savefig(out_path, bbox_inches="tight", dpi=150)
    plt.close(fig)


def time_scaling_plot(
    player_counts: Sequence[int],
    step_times_s: Sequence[float],
    out_path: str,
    *,
    fit_cubic: bool = True,
) -> None:
    """Per-step runtime vs player count with an O(N³) fit overlay
    (scripts/time_plot.py:5-29)."""
    n = np.asarray(player_counts, dtype=float)
    t = np.asarray(step_times_s, dtype=float)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(n, t, "o-", label="measured")
    if fit_cubic and len(n) >= 2:
        c = float(np.mean(t / n**3))
        ax.plot(n, c * n**3, "--", label=f"O(N³)·{c:.2e}")
    ax.set_xlabel("number of players N")
    ax.set_ylabel("per-step solve time (s)")
    ax.legend()
    fig.savefig(out_path, bbox_inches="tight", dpi=150)
    plt.close(fig)


def loss_curves_plot(history: Mapping[str, Sequence[float]], out_path: str) -> None:
    """Train/val loss curves (examples/loss_visualize.py)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, values in history.items():
        if values:
            ax.plot(values, label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(out_path, bbox_inches="tight", dpi=150)
    plt.close(fig)


def loss_landscape_plot(
    grid_x: np.ndarray, grid_y: np.ndarray, losses: np.ndarray, out_path: str
) -> None:
    """2-D mask loss-landscape heatmap (examples/gradient_test.jl:7-55)."""
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.pcolormesh(grid_x, grid_y, losses, shading="auto")
    fig.colorbar(im, ax=ax, label="loss")
    ax.set_xlabel("mask component 1")
    ax.set_ylabel("mask component 2")
    fig.savefig(out_path, bbox_inches="tight", dpi=150)
    plt.close(fig)
