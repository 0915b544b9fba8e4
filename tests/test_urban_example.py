"""The urban-navigation example (BASELINE config #4) runs end-to-end."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_urban_navigation_stack():
    import dataclasses
    import urban_navigation as ex
    from carla_social_force_model_tpu.api.scenario import build_scenario
    from carla_social_force_model_tpu.api.simulation import Simulation
    from carla_social_force_model_tpu.models.vehicles import build_vehicle_states
    from carla_social_force_model_tpu.routing.planner import PedPathPlanner

    steps = 2600
    planner = PedPathPlanner(ex.build_city_graph())
    scenario = {
        "step_length": 0.05,
        "walker": {
            "despawn_on_arrival": True, "waypoint_threshold": 1.5,
            "ped_spawner": [
                {"spawn_location": [2.0, 0.5, 1.0],
                 "destination": [118.0, 11.5, 0.0],
                 "generate_route": "NO_JAYWALKING", "speed": 1.4,
                 "quantity": 3, "spawn_interval": 2.5},
            ],
        },
        "obstacles": {"resolution": 0.1, "borders": [
            {"start_point": [0.0, 1.8], "end_point": [120.0, 1.8]},
            {"start_point": [0.0, 10.2], "end_point": [120.0, 10.2]}]},
    }
    sfm = {"forces": {"acceleration_force": True, "pedestrian_force": True,
                      "border_force": True, "dynamic_obstacle_force": True},
           "border_force": {"a": 6.0, "b": 0.3},
           "dynamic_obstacle_force": {"A": 50, "gamma": 0.4, "n": 1.0,
                                      "perception_threshold": 50}}
    bundle = build_scenario(scenario, sfm, num_steps=steps, planner=planner)
    vehicles = build_vehicle_states(ex.vehicle_stream(steps, bundle.dt),
                                    bundle.dt, steps)
    bundle = dataclasses.replace(
        bundle, scene=dataclasses.replace(bundle.scene, vehicles=vehicles))
    final, recs = Simulation(bundle).run()

    mode = np.asarray(recs.mode)
    alive = np.asarray(recs.alive)
    seen = set(np.unique(mode[alive]).tolist())
    # walked, waited at the curb, crossed, returned to the sidewalk
    assert {1, 2, 3} <= seen, seen
    assert int(np.asarray(final.spawned).sum()) == 3
    assert int(np.asarray(final.alive).sum()) == 0  # everyone arrived


def test_ensemble_example_runs(monkeypatch, capsys):
    """The ensemble-rollouts example runs end-to-end at a tiny scale."""
    import runpy
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setattr(sys, "argv", ["ensemble_rollouts.py", "4", "64"])
    runpy.run_path(os.path.join(repo, "examples", "ensemble_rollouts.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "4 crowds x 64 peds" in out and "mean displacement" in out
