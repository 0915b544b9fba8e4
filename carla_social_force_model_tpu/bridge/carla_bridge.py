"""CARLA-attached main loop (the reference's simulation_loop with a TPU core).

Wires the pieces for interactive use against a live CARLA server:
map-geometry extraction (cached), nav-graph routing, vehicle management
(TrafficManager / BehaviorAgent / scripted), the BridgeRunner tick sync, and
real-time pacing (run_simulation.py:160-229).  Headless use never imports
this module.
"""
from __future__ import annotations

import logging
import time

from ..utils.config import load_config
from ..utils import csvout

log = logging.getLogger(__name__)


def run_with_carla(args, sfm_config) -> int:
    scenario = load_config(args.scenario_config)
    sfm = load_config(sfm_config)

    from .carla_world import CarlaWorld
    from .extract import extract_obstacles, extract_sidewalk
    from .runner import BridgeRunner
    from .vehicle_spawner import BridgeVehicleManager

    world = CarlaWorld(args.carla_host, args.carla_port, scenario)
    obstacles_cfg = scenario.get("obstacles", {})
    resolution = float(obstacles_cfg.get("resolution", 0.1))

    lines, centers, lengths = extract_sidewalk(world.carla_map, resolution)
    outlines, ocenters = extract_obstacles(
        world.world, resolution,
        ellipse_shape=bool(obstacles_cfg.get("ellipse_shape", True)),
        max_obstacle_z_pos=float(obstacles_cfg.get("max_obstacle_z_pos", 0.3)))

    route_provider = None
    extra_ped_specs = None
    walker_cfg = scenario.get("walker", {})
    spawners = walker_cfg.get("ped_spawner", []) or []
    n_random = int(walker_cfg.get("random_pedestrians", 0))
    if any(sp.get("generate_route") for sp in spawners) or n_random > 0:
        from ..api.scenario import random_ped_spawners
        from ..routing.carla_graph import build_carla_nav_graph
        from ..routing.planner import PedPathPlanner
        graph = build_carla_nav_graph(
            world.carla_map,
            waypoint_distance=float(walker_cfg.get("waypoint_distance", 10)),
            jaywalking_weight_factor=float(walker_cfg.get("jaywalking_weight", 2)))
        planner = PedPathPlanner(graph)
        route_provider = planner.route_provider()
        if n_random > 0:
            extra_ped_specs = random_ped_spawners(
                planner, n_random,
                int(walker_cfg.get("pedestrian_seed", 2000)))

    runner = BridgeRunner(
        world, scenario, sfm,
        strict_parity=getattr(args, "strict_parity", False),
        route_provider=route_provider,
        extra_borders=lines,
        extra_border_sections=list(zip(centers, lengths)),
        extra_obstacles=outlines, extra_obstacle_centers=ocenters,
        extra_ped_specs=extra_ped_specs)
    vehicles = BridgeVehicleManager(world, scenario)

    dt = world.dt
    try:
        while True:
            start = time.time()
            vehicles.tick(world.get_sim_time())
            runner.tick()
            elapsed = time.time() - start
            if elapsed < dt:
                time.sleep(dt - elapsed)
    except KeyboardInterrupt:
        log.info("Cancelled by user.")
    finally:
        log.info("Cleaning Simulation")
        vehicles.close()
        world.close()
        if getattr(args, "csv", False):
            records = runner.records()
            if records is not None:
                import os
                out = csvout.write_all(
                    args.output, scenario.get("scenario_name"), records, dt,
                    vehicles=None, num_steps=len(runner.history),
                    border_lines=runner.border_lines,
                    obstacle_outlines=runner.obstacle_outlines,
                    obstacle_centers=runner.obstacle_centers)
                csvout.write_vehicle_obs_csv(
                    os.path.join(out, "vehicle.csv"), runner.veh_history, dt)
                log.info("CSV output written to %s", out)
    return 0
