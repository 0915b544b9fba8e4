"""Every shipped scenario config must run end-to-end headless."""
import os

import numpy as np
import pytest

from carla_social_force_model_tpu.api.simulation import Simulation

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFM = os.path.join(REPO, "configs", "sfm.toml")
SCEN_DIR = os.path.join(REPO, "configs", "scenarios")

#: scenarios that need a non-default SFM parameter set (their spawners
#: request model families the default config does not enable)
SFM_FOR = {"mixed_crossing.toml": "sfm_mixed.toml",
           "grouped_crossing.toml": "sfm_groups.toml"}


@pytest.mark.parametrize("name", sorted(os.listdir(SCEN_DIR)))
def test_shipped_scenario_runs(name):
    sfm = os.path.join(REPO, "configs", SFM_FOR.get(name, "sfm.toml"))
    sim = Simulation.from_config(os.path.join(SCEN_DIR, name), sfm,
                                 duration=12.0)
    final, recs = sim.run()
    alive = np.asarray(recs.alive)
    assert alive.any(), "nobody ever spawned"
    pos = np.where(alive[..., None], np.asarray(recs.pos), 0.0)
    assert np.all(np.isfinite(pos))
    # pedestrians actually moved
    first, last = np.argmax(alive.any(axis=1)), alive.shape[0] - 1
    moved = np.abs(np.asarray(recs.pos)[last] - np.asarray(recs.pos)[first])
    assert moved.max() > 1.0


def test_obstacle_scenario_peds_avoid_obstacles():
    sim = Simulation.from_config(
        os.path.join(SCEN_DIR, "obstacle_evasion.toml"), SFM, duration=30.0)
    _, recs = sim.run()
    alive = np.asarray(recs.alive)
    pos = np.asarray(recs.pos)
    # no pedestrian center inside the pole footprint (r=0.3 ellipse*sqrt2)
    d_pole = np.linalg.norm(pos - np.array([0.0, 0.0]), axis=-1)
    assert d_pole[alive].min() > 0.3


def test_road_crossing_scenario_waits_for_vehicle():
    sim = Simulation.from_config(
        os.path.join(SCEN_DIR, "road_crossing.toml"), SFM, duration=40.0)
    _, recs = sim.run()
    mode = np.asarray(recs.mode)
    alive = np.asarray(recs.alive)
    assert (mode[alive] == 4).sum() > 0   # someone checked traffic
    assert (mode[alive] == 2).sum() > 0   # and crossed


def test_sidewalk_scenario_stays_in_extracted_corridor():
    """The sidewalk-class scenario's crowd is confined by the cached
    map-extracted borders (reference sidewalk_scenario_config.toml class)."""
    sim = Simulation.from_config(
        os.path.join(SCEN_DIR, "sidewalk_counterflow.toml"), SFM,
        duration=45.0)
    _, recs = sim.run()
    alive = np.asarray(recs.alive)
    ys = np.asarray(recs.pos)[alive][:, 1]
    assert ((ys > -9.2) & (ys < -5.8)).all()
