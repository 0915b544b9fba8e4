"""BASELINE config #4 workload: the urban-navigation bundle.

Exercises the full per-step pipeline in one scene (reference tick,
run_simulation.py:47-132): nav-graph-routed pedestrians, curb border
force, crosswalk mode transitions, gap acceptance, reactive vehicles.
"""
import numpy as np
import jax

from carla_social_force_model_tpu.api.synthetic import urban_bundle
from carla_social_force_model_tpu.models import modes
from carla_social_force_model_tpu.models.stepper import make_rollout_fn


def test_urban_bundle_full_pipeline():
    steps = 80
    scene, params, cfg, state = urban_bundle(
        48, num_steps_hint=steps, n_routes=8, n_roads=3, width=200.0,
        cross_spacing=80.0, vehicles_per_road=1, use_pallas=False)
    assert scene.borders is not None
    assert scene.autopilot is not None
    assert params.enable_border and params.enable_dynamic_obstacle

    run = make_rollout_fn(scene, params, cfg, steps, record=True)
    final, (rec, veh_rec) = jax.jit(run)(state)
    assert np.asarray(veh_rec.active).any(), "vehicle fleet never active"

    pos = np.asarray(rec.pos)  # (T, N, 2)
    mode = np.asarray(rec.mode)
    alive = np.asarray(rec.alive)
    assert alive.any(), "nobody spawned"
    assert alive[0].all()  # everybody spawns at step 0 in this bundle
    assert np.isfinite(pos[alive]).all()
    # peds actually walk their routes
    both = alive[0] & alive[-1]
    moved = np.abs(pos[-1] - pos[0]).sum(-1)
    assert (moved[both] > 0.5).any()
    # the crossing machinery engages: some ped is in a road-crossing mode
    # (CROSSING_ROAD / CHECKING_TRAFFIC / ROAD_TO_SIDEWALK) at some point
    crossing = np.isin(mode, [modes.CROSSING_ROAD, modes.CHECKING_TRAFFIC,
                              modes.ROAD_TO_SIDEWALK]) & alive
    assert crossing.any(), "no road-crossing activity in urban bundle"
