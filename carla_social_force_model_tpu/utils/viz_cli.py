"""Standalone visualization CLI (reference utils/draw_routing_graph.py role).

Subcommands:
  graph         render a NavGraph (.npz, or built live from a CARLA map)
                to a PNG, or draw it into a running CARLA world
  trajectories  render a simulation run's CSV output to a PNG

Examples:
  python -m carla_social_force_model_tpu.utils.viz_cli graph \
      --npz cache/map_geometry/navgraph_Town10HD_Opt_<hash>.npz --out graph.png
  python -m carla_social_force_model_tpu.utils.viz_cli trajectories \
      --csv-dir output/20260816-061022-scenario --out run.png
"""
from __future__ import annotations

import argparse
import csv
import logging

import numpy as np

log = logging.getLogger(__name__)


def _cmd_graph(args) -> int:
    from ..routing.graph import NavGraph
    if args.npz:
        graph = NavGraph.load_npz(args.npz)
    else:
        import carla  # noqa: F401  (availability check)
        from ..bridge.carla_world import CarlaWorld
        from ..routing.carla_graph import build_carla_nav_graph
        world = CarlaWorld(args.carla_host, args.carla_port,
                           {"map": {"map_name": args.map} if args.map else {}})
        graph = build_carla_nav_graph(world.carla_map,
                                      waypoint_distance=args.waypoint_distance,
                                      jaywalking_weight_factor=args.jaywalking_weight)
        if args.draw_in_world:
            _draw_graph_in_carla(graph, world)
            return 0
    from .visualize import plot_nav_graph
    out = plot_nav_graph(graph, args.out)
    log.info("wrote %s (%d nodes, %d edges)", out, graph.num_nodes,
             graph.num_edges)
    return 0


def _draw_graph_in_carla(graph, world, life_time: float = 60.0):
    """Debug-draw the graph edges into a CARLA world, color-coded by type
    (reference draw_routing_graph.py:116-161)."""
    import carla
    from .visualize import EDGE_COLORS
    from matplotlib.colors import to_rgb
    from ..routing.graph import EdgeType
    for u, v, t in zip(graph.edge_u, graph.edge_v, graph.edge_type):
        r, g, b = (int(c * 255) for c in to_rgb(EDGE_COLORS[EdgeType(int(t))]))
        a = graph.nodes[u]
        bnode = graph.nodes[v]
        world.world.debug.draw_line(
            carla.Location(float(a[0]), float(a[1]), float(a[2]) + 0.5),
            carla.Location(float(bnode[0]), float(bnode[1]), float(bnode[2]) + 0.5),
            thickness=0.08, color=carla.Color(r, g, b), life_time=life_time)


def _cmd_trajectories(args) -> int:
    import os
    peds: dict[int, list] = {}
    with open(os.path.join(args.csv_dir, "pedestrian.csv")) as f:
        for row in csv.DictReader(f):
            peds.setdefault(int(row["ped_id"]), []).append(
                (float(row["x"]), float(row["y"])))
    borders = []
    bpath = os.path.join(args.csv_dir, "borders.csv")
    if os.path.exists(bpath):
        with open(bpath) as f:
            borders = [(float(r["x"]), float(r["y"]))
                       for r in csv.DictReader(f)]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 8))
    if borders:
        b = np.asarray(borders)
        ax.plot(b[:, 0], b[:, 1], ".", ms=1, color="0.4")
    cmap = plt.get_cmap("tab20")
    for ped_id, pts in sorted(peds.items()):
        p = np.asarray(pts)
        ax.plot(p[:, 0], p[:, 1], lw=1.0, color=cmap(ped_id % 20))
    ax.set_aspect("equal")
    ax.set_title(args.csv_dir)
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    log.info("wrote %s (%d pedestrians)", args.out, len(peds))
    return 0


def main(argv=None) -> int:
    logging.basicConfig(format="%(levelname)s: %(message)s", level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("graph")
    g.add_argument("--npz", type=str, default=None)
    g.add_argument("--out", type=str, default="nav_graph.png")
    g.add_argument("--carla-host", default="127.0.0.1")
    g.add_argument("--carla-port", default=2000, type=int)
    g.add_argument("--map", type=str, default=None)
    g.add_argument("--waypoint-distance", type=float, default=10.0)
    g.add_argument("--jaywalking-weight", type=float, default=2.0)
    g.add_argument("--draw-in-world", action="store_true",
                   help="debug-draw into the CARLA world instead of a PNG")
    g.set_defaults(fn=_cmd_graph)

    t = sub.add_parser("trajectories")
    t.add_argument("--csv-dir", type=str, required=True)
    t.add_argument("--out", type=str, default="trajectories.png")
    t.set_defaults(fn=_cmd_trajectories)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
