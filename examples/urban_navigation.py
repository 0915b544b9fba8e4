#!/usr/bin/env python
"""Urban navigation, fully headless (BASELINE.json config #4).

Builds a synthetic city block: two sidewalks along a road, a crosswalk, a
jaywalking shortcut, scripted vehicle traffic on the road.  Pedestrians get
routes from the nav graph (A*, no-jaywalking vs jaywalking-allowed), wait at
the curb for gaps in traffic, cross, and continue -- the reference's full
routing + gap-acceptance + mode-transition stack with no CARLA server.

Run:  python examples/urban_navigation.py [--steps 1200] [--out out/urban]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_city_graph():
    """Two sidewalks (y=0, y=12) along a road, crosswalk at x=60,
    jaywalking shortcut at x=20."""
    from carla_social_force_model_tpu.routing.graph import (
        EdgeType, NavGraphBuilder)
    b = NavGraphBuilder(jaywalking_weight_factor=2.0)
    xs = np.arange(0.0, 121.0, 10.0)
    b.add_polyline([np.array([x, 0.0, 0.0]) for x in xs], EdgeType.SIDEWALK)
    b.add_polyline([np.array([x, 12.0, 0.0]) for x in xs], EdgeType.SIDEWALK)
    b.add_edge([60.0, 0.0, 0.0], [60.0, 12.0, 0.0], EdgeType.CROSSWALK)
    b.add_edge([20.0, 0.0, 0.0], [20.0, 12.0, 0.0], EdgeType.JAYWALKING)
    return b.build()


def vehicle_stream(num_steps, dt, lanes=((4.0, 1), (8.0, -1)), period=6.0,
                   speed=9.0):
    """Scripted vehicles in both road lanes for the whole horizon (one spec
    per vehicle -- scripted specs carry a single teleport list each)."""
    from carla_social_force_model_tpu.models.vehicles import VehicleSpec
    specs = []
    length = int(140.0 / (speed * dt))
    horizon = num_steps * dt
    for y, direction in lanes:
        xs = np.arange(length) * speed * dt
        xs = -10.0 + xs if direction > 0 else 130.0 - xs
        traj = np.column_stack([xs, np.full(length, y)])
        heading = 0.0 if direction > 0 else np.pi
        t0 = 0.0 if direction > 0 else period / 2.0
        while t0 < horizon:
            specs.append(VehicleSpec(
                trajectory=traj, headings=np.full(length, heading),
                speeds=np.full(length, speed), extent=(2.4, 1.1),
                spawn_time=t0, quantity=1))
            t0 += period
    return specs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2600)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    from carla_social_force_model_tpu.api.scenario import build_scenario
    from carla_social_force_model_tpu.api.simulation import Simulation
    from carla_social_force_model_tpu.models.vehicles import build_vehicle_states
    from carla_social_force_model_tpu.routing.planner import PedPathPlanner

    planner = PedPathPlanner(build_city_graph())
    scenario = {
        "scenario_name": "urban_navigation",
        "step_length": 0.05,
        "walker": {
            "pedestrian_seed": 31,
            "despawn_on_arrival": True,
            "waypoint_threshold": 1.5,
            "ped_spawner": [
                # south-west corner -> north-east corner, no jaywalking:
                # routes along the south sidewalk, crosses at the crosswalk
                {"spawn_location": [2.0, 0.5, 1.0],
                 "destination": [118.0, 11.5, 0.0],
                 "generate_route": "NO_JAYWALKING",
                 "speed": 1.4, "quantity": 6, "spawn_interval": 2.5,
                 "crossing_speed_factor": 1.5, "crossing_safety_margin": 1.5},
                # north-east -> south-west, jaywalking allowed: shortcut at x=20
                {"spawn_location": [118.0, 11.5, 1.0],
                 "destination": [2.0, 0.5, 0.0],
                 "generate_route": "JAYWALKING",
                 "speed": 1.3, "quantity": 6, "spawn_interval": 2.5,
                 "crossing_speed_factor": 1.5, "crossing_safety_margin": 1.0},
            ],
        },
        "obstacles": {
            "resolution": 0.1,
            "borders": [  # curbs
                {"start_point": [0.0, 1.8], "end_point": [120.0, 1.8]},
                {"start_point": [0.0, 10.2], "end_point": [120.0, 10.2]},
            ],
        },
    }
    sfm = {
        "max_speed_multiplier": 1.3,
        "forces": {"acceleration_force": True, "pedestrian_force": True,
                   "border_force": True, "dynamic_obstacle_force": True},
        "border_force": {"a": 6.0, "b": 0.3},
        "dynamic_obstacle_force": {"lambda": 2.0, "A": 50, "gamma": 0.4,
                                   "n": 1.0, "n_prime": 3.0,
                                   "epsilon": 0.005,
                                   "perception_threshold": 50},
    }

    bundle = build_scenario(scenario, sfm, num_steps=args.steps,
                            planner=planner)
    # scripted two-lane vehicle stream
    import dataclasses
    vehicles = build_vehicle_states(
        vehicle_stream(args.steps, bundle.dt), bundle.dt, args.steps)
    bundle = dataclasses.replace(
        bundle, scene=dataclasses.replace(bundle.scene, vehicles=vehicles))

    sim = Simulation(bundle)
    final, recs = sim.run()

    mode = np.asarray(recs.mode)
    alive = np.asarray(recs.alive)
    import collections
    counts = collections.Counter(mode[alive].tolist())
    print("mode tick counts:", {k: counts.get(k, 0) for k in range(5)})
    print(f"spawned={int(np.asarray(final.spawned).sum())} "
          f"arrived+despawned={int(np.asarray(final.spawned).sum() - np.asarray(final.alive).sum())}")
    if args.out:
        out = sim.write_csv(args.out)
        from carla_social_force_model_tpu.utils.visualize import plot_trajectories
        png = plot_trajectories(recs, os.path.join(out, "trajectories.png"),
                                border_lines=bundle.border_lines)
        print("wrote", out, "and", png)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
