"""Offline visualization (headless equivalent of the reference's dev tools).

The reference draws the routing graph and debug geometry into the CARLA
world (utils/draw_routing_graph.py, carla_simulation.py:148-160); headless
we render matplotlib figures to files: the nav graph color-coded by edge
type, and scenario trajectories/geometry from a rollout or its CSV output.
"""
from __future__ import annotations

import numpy as np

from ..routing.graph import EdgeType, NavGraph

EDGE_COLORS = {
    EdgeType.SIDEWALK: "tab:green",
    EdgeType.CROSSWALK: "tab:blue",
    EdgeType.JAYWALKING: "tab:red",
    EdgeType.JAYWALKING_JUNCTION: "tab:orange",
    EdgeType.SIDEWALK_TO_ROAD: "tab:purple",
    EdgeType.VOID: "gray",
}


def plot_nav_graph(graph: NavGraph, path: str, show_nodes: bool = True):
    """Render the routing graph color-coded by EdgeType (reference
    draw_routing_graph.py:116-161's color scheme intent)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 12))
    for etype in EdgeType:
        mask = graph.edge_type == int(etype)
        if not mask.any():
            continue
        segs = np.stack([graph.nodes[graph.edge_u[mask]][:, :2],
                         graph.nodes[graph.edge_v[mask]][:, :2]], axis=1)
        from matplotlib.collections import LineCollection
        ax.add_collection(LineCollection(
            segs, colors=EDGE_COLORS[etype], label=etype.name, linewidths=1.2))
    if show_nodes:
        ax.scatter(graph.nodes[:, 0], graph.nodes[:, 1], s=4, c="k", zorder=3)
    ax.autoscale()
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title("pedestrian navigation graph")
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_trajectories(records, path: str, border_lines=(), obstacle_outlines=(),
                      dt: float = 0.05):
    """Render pedestrian trajectories (+ borders/obstacles) from a
    StepRecord pytree."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pos = np.asarray(records.pos)
    alive = np.asarray(records.alive)
    fig, ax = plt.subplots(figsize=(10, 8))
    for border in border_lines:
        b = np.asarray(border)
        ax.plot(b[:, 0], b[:, 1], ".", ms=1, color="0.4")
    for outline in obstacle_outlines:
        o = np.asarray(outline)
        ax.plot(o[:, 0], o[:, 1], ".", ms=1, color="0.6")
    cmap = plt.get_cmap("tab20")
    for slot in range(pos.shape[1]):
        m = alive[:, slot]
        if not m.any():
            continue
        ax.plot(pos[m, slot, 0], pos[m, slot, 1], "-", lw=1.0,
                color=cmap(slot % 20))
    ax.set_aspect("equal")
    ax.set_title(f"trajectories ({pos.shape[0]} steps, dt={dt})")
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return path
