"""Graph + Euler-walk visualisation (dev-time only; reference analogue:
src/utils/visualize.py plotly drawing). Matplotlib spring layout with the
Euler walk order annotated."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.graph import CSR, Graph


def spring_layout(graph: Graph, iterations: int = 60, seed: int = 0) -> np.ndarray:
    """Simple Fruchterman-Reingold layout, numpy-only."""
    n = graph.num_nodes
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(n, 2)) * 0.1
    csr = CSR(n, graph.edge_index)
    k = 1.0 / np.sqrt(max(n, 1))
    adj = np.zeros((n, n), bool)
    adj[csr.u, csr.v] = True
    adj[csr.v, csr.u] = True
    t = 0.1
    for _ in range(iterations):
        delta = pos[:, None, :] - pos[None, :, :]
        dist = np.linalg.norm(delta, axis=-1) + 1e-9
        rep = (k * k / dist**2)[:, :, None] * delta
        att = np.where(adj[:, :, None], (dist / k)[:, :, None] * -delta / dist[:, :, None], 0.0)
        disp = rep.sum(1) + att.sum(1)
        norm = np.linalg.norm(disp, axis=-1, keepdims=True) + 1e-9
        pos = pos + disp / norm * np.minimum(norm, t)
        t *= 0.95
    return pos


def draw_graph(
    graph: Graph,
    walk: Optional[np.ndarray] = None,
    path: str = "graph.png",
    node_labels: bool = True,
):
    """Render the graph (and optionally its Euler walk order) to a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pos = spring_layout(graph)
    fig, ax = plt.subplots(figsize=(6, 6))
    csr = CSR(graph.num_nodes, graph.edge_index)
    for a, b in zip(csr.u, csr.v):
        ax.plot(*zip(pos[a], pos[b]), color="#cccccc", lw=1, zorder=1)
    if walk is not None and len(walk) > 1:
        for i, (a, b) in enumerate(zip(walk[:-1], walk[1:])):
            mid = (pos[a] + pos[b]) / 2
            ax.annotate(
                str(i),
                mid,
                fontsize=6,
                color="#d62728",
                ha="center",
                zorder=3,
            )
            ax.plot(*zip(pos[a], pos[b]), color="#1f77b4", lw=1.5, alpha=0.6, zorder=2)
    ax.scatter(pos[:, 0], pos[:, 1], s=120, c="#ffbb78", edgecolors="k", zorder=4)
    if node_labels:
        for i, p in enumerate(pos):
            ax.annotate(str(i), p, fontsize=8, ha="center", va="center", zorder=5)
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
