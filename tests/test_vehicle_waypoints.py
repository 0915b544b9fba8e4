"""Waypoint-based scripted vehicle authoring (headless sugar)."""
import numpy as np

from carla_social_force_model_tpu.api.scenario import extract_vehicle_specs
from carla_social_force_model_tpu.models.vehicles import trajectory_from_waypoints


def test_trajectory_from_waypoints_spacing_and_headings():
    traj, heads, speeds = trajectory_from_waypoints(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 5.0]], speed=10.0, dt=0.05)
    # ~0.5 m spacing
    gaps = np.linalg.norm(np.diff(traj, axis=0), axis=1)
    np.testing.assert_allclose(gaps, 0.5, rtol=1e-6)
    assert np.isclose(heads[1], 0.0)               # first leg +x
    assert np.isclose(heads[-1], np.pi / 2)        # second leg +y
    np.testing.assert_allclose(speeds, 10.0)
    np.testing.assert_allclose(traj[0], [0.0, 0.0])
    np.testing.assert_allclose(traj[-1], [10.0, 5.0], atol=1e-9)


def test_vehicle_spawner_accepts_waypoints():
    scenario = {
        "step_length": 0.05,
        "vehicle": {"vehicle_spawner": [{
            "auto_pilot": False,
            "waypoints": [[0.0, 4.0], [50.0, 4.0]],
            "speed": 8.0, "quantity": 1}]},
    }
    specs = extract_vehicle_specs(scenario)
    assert len(specs) == 1
    s = specs[0]
    assert len(s.trajectory) == len(s.headings) == len(s.speeds)
    assert len(s.trajectory) > 100
    np.testing.assert_allclose(s.speeds, 8.0)
