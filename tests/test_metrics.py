"""Crowd-analysis metrics (utils/metrics.py): synthetic-record unit tests
plus one end-to-end rollout check.  The synthetic records have hand-
computable answers (constant-velocity walkers crossing a known gate)."""
import numpy as np

from carla_social_force_model_tpu.models.stepper import StepRecord
from carla_social_force_model_tpu.utils import metrics


def _marching_record(n=6, t=40, dt=0.1, speed=2.0):
    """n walkers abreast marching +x at `speed` from x = -3, alive
    throughout; one extra dead slot."""
    x0 = -3.0
    ts = np.arange(t)[:, None] * dt
    xs = x0 + speed * ts + np.zeros((1, n))
    ys = np.linspace(-2.0, 2.0, n)[None, :] + np.zeros((t, 1))
    pos = np.stack([np.concatenate([xs, np.zeros((t, 1))], axis=1),
                    np.concatenate([ys, np.zeros((t, 1))], axis=1)], axis=-1)
    vel = np.zeros_like(pos)
    vel[:, :n, 0] = speed
    alive = np.ones((t, n + 1), bool)
    alive[:, n] = False
    mode = np.zeros((t, n + 1), np.int32)
    return StepRecord(pos=pos, vel=vel, mode=mode, alive=alive), dt


def test_gate_crossings_and_flow():
    rec, dt = _marching_record()
    # a gate spanning all lanes at x = 0: every walker crosses exactly once
    flow = metrics.flow_rate(rec, (0.0, -5.0), (0.0, 5.0), dt)
    assert flow["total"] == 6
    assert abs(flow["net"]) == 6
    # a short gate catching only the two central walkers (|y| < 0.5)
    flow2 = metrics.flow_rate(rec, (0.0, -0.5), (0.0, 0.5), dt)
    assert flow2["total"] == 2
    # a gate the walkers never reach
    flow3 = metrics.flow_rate(rec, (100.0, -5.0), (100.0, 5.0), dt)
    assert flow3["total"] == 0
    # specific flow = total / (span * width)
    span = (rec.pos.shape[0] - 1) * dt
    assert np.isclose(flow["specific"], 6 / (span * 10.0))


def test_gate_sign_convention():
    rec, dt = _marching_record()
    plus, minus = metrics.gate_crossings(rec, (0.0, -5.0), (0.0, 5.0))
    fwd = int(plus.sum()), int(minus.sum())
    # reversing the gate direction swaps the signs
    plus_r, minus_r = metrics.gate_crossings(rec, (0.0, 5.0), (0.0, -5.0))
    assert (int(minus_r.sum()), int(plus_r.sum())) == fwd


def test_mean_speed_and_density():
    rec, dt = _marching_record(speed=2.0)
    v = metrics.mean_speed(rec)
    np.testing.assert_allclose(v, 2.0)
    # region selection: nobody above y = 10
    v_empty = metrics.mean_speed(rec, region=(-100, 100, 10, 20))
    assert np.isnan(v_empty).all()
    rho = metrics.region_density(rec, (-10, 10, -3, 3))
    # all 6 walkers inside while -10 <= x(t) <= 10 -> 6 / 120 m^2
    assert np.isclose(rho[0], 6 / 120.0)
    grid, xe, ye = metrics.density_grid(rec, (-5, 5, -3, 3), cell=1.0)
    assert grid.shape == (len(xe) - 1, len(ye) - 1)
    # total mass = mean alive count inside bounds per frame
    inside = ((rec.pos[..., 0] >= -5) & (rec.pos[..., 0] <= 5)
              & (rec.pos[..., 1] >= -3) & (rec.pos[..., 1] <= 3)
              & rec.alive)
    assert np.isclose(grid.sum(), inside.sum() / rec.pos.shape[0], atol=0.51)


def test_evacuation():
    rec, dt = _marching_record(t=30)
    alive = np.asarray(rec.alive).copy()
    # walkers "arrive" (despawn) one per frame from frame 10
    for k in range(6):
        alive[10 + k:, k] = False
    rec2 = StepRecord(pos=rec.pos, vel=rec.vel, mode=rec.mode, alive=alive)
    t, remaining = metrics.evacuation_curve(rec2, dt)
    assert remaining[0] == 6 and remaining[-1] == 0
    assert np.isclose(metrics.evacuation_time(rec2, dt), 15 * dt)
    # a record that never empties
    assert np.isnan(metrics.evacuation_time(rec, dt))


def test_lane_order_parameter_extremes():
    rng = np.random.default_rng(0)
    n = 400
    pos = np.column_stack([rng.uniform(-20, 20, n), rng.uniform(-3, 3, n)])
    region = (-20, 20, -3, 3)
    # perfect lanes: direction = sign of y
    dirs = np.where(pos[:, 1] > 0, 1.0, -1.0)
    y_perfect = metrics.lane_order_parameter(pos, dirs, region, bins=2)
    assert y_perfect > 0.999
    # random labels on the same positions: ~1/k per bin, far from 1
    y_rand = np.mean([metrics.lane_order_parameter(
        pos, rng.permutation(dirs), region, bins=2) for _ in range(20)])
    assert y_rand < 0.2
    # empty window
    assert np.isnan(metrics.lane_order_parameter(
        pos[:0], dirs[:0], region))


def test_fundamental_diagram_binning():
    rec, dt = _marching_record()
    rho, v, cnt = metrics.fundamental_diagram(rec, (-10, 10, -3, 3), dt,
                                              bins=4)
    assert len(rho) == 4 and len(v) == 4
    # constant-speed record: every populated bin means 2.0
    assert np.allclose(v[cnt >= 3], 2.0)


def test_metrics_on_real_rollout():
    """End to end: a corridor rollout's gate flow matches its despawn count
    and read_pedestrian_csv records analyze identically to live ones."""
    import jax.numpy as jnp

    from carla_social_force_model_tpu.api.scenario import build_scenario
    from carla_social_force_model_tpu.api.simulation import Simulation

    scenario = {
        "scenario_name": "metrics_e2e", "step_length": 0.05,
        "walker": {"despawn_on_arrival": True, "waypoint_threshold": 1.0,
                   "ped_spawner": [
                       {"spawn_location": [-10.0, 0.0, 1.0],
                        "destination": [15.0, 0.0, 0.0],
                        "speed": 1.4, "quantity": 8,
                        "spawn_interval": 0.3}]},
    }
    sfm = {"forces": {"acceleration_force": True, "pedestrian_force": True}}
    b = build_scenario(scenario, sfm, 500)
    _, rec = Simulation(b).run()
    rec = StepRecord(*(np.asarray(x) for x in rec))
    flow = metrics.flow_rate(rec, (5.0, -4.0), (5.0, 4.0), b.cfg.dt)
    assert flow["total"] == 8 and flow["net"] == 8
    assert np.isfinite(metrics.evacuation_time(rec, b.cfg.dt))
    v = metrics.mean_speed(rec)
    assert np.nanmax(v) <= 1.4 * 1.3 + 1e-5   # speed cap honored

    # CSV round trip analyzes identically
    import tempfile
    import os
    from carla_social_force_model_tpu.utils.csvout import (
        read_pedestrian_csv, write_pedestrian_csv)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "pedestrian.csv")
        write_pedestrian_csv(path, rec, b.cfg.dt, use_native=False)
        rec2, dt2 = read_pedestrian_csv(path)
    flow2 = metrics.flow_rate(rec2, (5.0, -4.0), (5.0, 4.0), dt2)
    # counts are identical; rates differ because the CSV format (the
    # reference's) only carries frames with at least one alive pedestrian,
    # so the reloaded record spans fewer frames than the live one
    assert (flow2["total"], flow2["net"]) == (flow["total"], flow["net"])
