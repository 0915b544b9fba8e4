"""Whole-tick and rollout parity vs the float64 oracle simulator."""
import numpy as np
import jax.numpy as jnp

import oracle
from oracle_sim import OracleSim
from carla_social_force_model_tpu.models import modes
from carla_social_force_model_tpu.models.params import SfmParams
from carla_social_force_model_tpu.models.spawn import (
    SpawnerSpec, build_spawn_schedule, realized_spawn_steps)
from carla_social_force_model_tpu.models.state import PedState
from carla_social_force_model_tpu.models.stepper import (
    Scene, StepConfig, make_rollout_fn)
from carla_social_force_model_tpu.models.vehicles import (
    VehicleSpec, build_vehicle_states, ellipse_template)
from carla_social_force_model_tpu.models.gap import gap_ready
from carla_social_force_model_tpu.env.borders import build_border_set

DT = 0.05

BASE_PARAMS = dict(
    acceleration={"tau": 0.5},
    pedestrian={"lambda": 2.0, "A": 4.5, "gamma": 0.35, "n": 2.0,
                "n_prime": 3.0, "epsilon": 0.005},
    border={"a": 6.0, "b": 0.3},
    dynamic_obstacle={"lambda": 2.0, "A": 50.0, "gamma": 0.4, "n": 1.0,
                      "n_prime": 3.0, "epsilon": 0.005,
                      "perception_threshold": 50.0},
    max_speed_factor=1.3,
)


def sfm_params(**flags):
    return SfmParams.from_dict({
        "max_speed_multiplier": 1.3,
        "forces": {
            "acceleration_force": flags.get("acceleration", True),
            "pedestrian_force": flags.get("pedestrian", True),
            "border_force": flags.get("border", False),
            "dynamic_obstacle_force": flags.get("dynamic_obstacle", False),
        },
        "acceleration_force": BASE_PARAMS["acceleration"],
        "pedestrian_force": BASE_PARAMS["pedestrian"],
        "border_force": BASE_PARAMS["border"],
        "dynamic_obstacle_force": BASE_PARAMS["dynamic_obstacle"],
    })


def corridor_walls():
    walls = [np.column_stack([np.linspace(-15, 15, 301), np.full(301, 2.0)]),
             np.column_stack([np.linspace(-15, 15, 301), np.full(301, -2.0)])]
    centers = [w[len(w) // 2] for w in walls]
    lengths = [len(w) * 0.1 for w in walls]
    return walls, centers, lengths


def corridor_spawners():
    """Bidirectional counterflow with staggered spawn intervals."""
    specs, oracle_specs = [], []
    for k in range(3):
        for (x0, x1) in [(-12.0, 12.0), (12.0, -12.0)]:
            y = -1.0 + k * 0.9
            spec = dict(spawn_location=[x0, y, 1.0], waypoints=[[x1, y]],
                        crossing_road=[False], speed=1.2 + 0.1 * k,
                        quantity=2, spawn_time=0.3 * k, spawn_interval=1.7)
            oracle_specs.append(spec)
            specs.append(SpawnerSpec(
                spawn_location=np.array(spec["spawn_location"]),
                waypoints=np.array(spec["waypoints"]),
                crossing_road=spec["crossing_road"], speed=spec["speed"],
                quantity=spec["quantity"], spawn_time=spec["spawn_time"],
                spawn_interval=spec["spawn_interval"]))
    return specs, oracle_specs


def run_engine(specs, num_steps, params, cfg, borders=None, vehicles=None):
    schedule = build_spawn_schedule(specs, DT, num_steps)
    scene = Scene(spawn=schedule, borders=borders, vehicles=vehicles)
    state = PedState.empty(schedule.capacity)
    run = make_rollout_fn(scene, params, cfg, num_steps)
    final, recs = run(state)
    return schedule, final, recs


def oracle_records(history, capacity, num_steps):
    """Convert oracle history to dense (T, N) arrays keyed by slot index."""
    pos = np.full((num_steps, capacity, 2), np.nan)
    vel = np.full((num_steps, capacity, 2), np.nan)
    mode = np.full((num_steps, capacity), -1)
    alive = np.zeros((num_steps, capacity), bool)
    for t, rows in enumerate(history):
        for name, p, v, m in rows:
            slot = int(name.split("_")[-1])
            pos[t, slot], vel[t, slot], mode[t, slot], alive[t, slot] = p, v, m, True
    return pos, vel, mode, alive


def test_realized_spawn_steps_greedy_one_per_tick():
    # interval shorter than dt: one spawn per tick, lagging behind schedule
    assert realized_spawn_steps(0.0, 0.01, 4, 0.05, 100) == [0, 1, 2, 3]
    # interval not a multiple of dt: next step whose time passed the due time
    assert realized_spawn_steps(0.0, 0.12, 3, 0.05, 100) == [0, 3, 5]
    # late start
    assert realized_spawn_steps(0.26, 1.0, 2, 0.05, 100) == [6, 26]


def test_corridor_rollout_matches_oracle():
    num_steps = 120
    cfg = StepConfig(dt=DT, waypoint_threshold=1.0, despawn_on_arrival=True)
    params = sfm_params(border=True)
    walls, centers, lengths = corridor_walls()
    borders = build_border_set(walls, centers, lengths)
    specs, ospecs = corridor_spawners()
    schedule, final, recs = run_engine(specs, num_steps, params, cfg,
                                       borders=borders)

    sim = OracleSim(
        dict(BASE_PARAMS, **{"acceleration": BASE_PARAMS["acceleration"],
                             "pedestrian": BASE_PARAMS["pedestrian"],
                             "border": BASE_PARAMS["border"]}),
        dt=DT, waypoint_threshold=1.0, despawn_on_arrival=True,
        borders=walls, border_centers=centers, border_lengths=lengths)
    for spec in ospecs:
        sim.add_spawner(**spec)
    history = sim.run(num_steps)

    n = schedule.capacity
    opos, ovel, omode, oalive = oracle_records(history, n, num_steps)
    epos = np.asarray(recs.pos)
    ealive = np.asarray(recs.alive)
    emode = np.asarray(recs.mode)

    # alive/spawn/despawn structure must match exactly
    np.testing.assert_array_equal(ealive, oalive)
    np.testing.assert_array_equal(np.where(ealive, emode, -1),
                                  np.where(oalive, omode, -1))
    # f32 engine vs f64 oracle trajectory drift stays small on this horizon
    err = np.abs(np.where(ealive[..., None], epos - opos, 0.0))
    assert err.max() < 2e-3, f"max position error {err.max()}"


def test_despawn_on_arrival_false_keeps_peds():
    num_steps = 300
    cfg = StepConfig(dt=DT, waypoint_threshold=1.0, despawn_on_arrival=False)
    params = sfm_params()
    specs = [SpawnerSpec(spawn_location=np.array([0.0, 0.0, 1.0]),
                         waypoints=np.array([[5.0, 0.0]]),
                         crossing_road=[False], speed=1.5, quantity=1)]
    _, final, recs = run_engine(specs, num_steps, params, cfg)
    assert bool(final.alive[0])
    # settled near the waypoint
    assert np.linalg.norm(np.asarray(final.pos[0]) - [5.0, 0.0]) < 1.0


def test_waypoint_advance_and_mode_transitions():
    """Ped walks, crosses a 'road' (flagged waypoint), walks again."""
    num_steps = 400
    cfg = StepConfig(dt=DT, waypoint_threshold=1.0, despawn_on_arrival=True)
    params = sfm_params()
    specs = [SpawnerSpec(
        spawn_location=np.array([0.0, 0.0, 1.0]),
        waypoints=np.array([[6.0, 0.0], [12.0, 0.0], [18.0, 0.0], [24.0, 0.0]]),
        crossing_road=[False, True, False, False], speed=1.5, quantity=1)]
    _, final, recs = run_engine(specs, num_steps, params, cfg)
    seen = [int(m) for m, a in zip(np.asarray(recs.mode)[:, 0],
                                   np.asarray(recs.alive)[:, 0]) if a]
    # collapse runs
    runs = [seen[0]]
    for m in seen[1:]:
        if m != runs[-1]:
            runs.append(m)
    # With no vehicles, CHECKING_TRAFFIC resolves to CROSSING_ROAD inside the
    # next tick *before* the snapshot -- the reference's recording shows the
    # same (pedestrian_simulation.py:67-76 run before record at :76).
    # ROAD_TO_SIDEWALK persists until the next flag-False waypoint arrival.
    assert runs == [modes.WALKING_SIDEWALK, modes.CROSSING_ROAD,
                    modes.ROAD_TO_SIDEWALK, modes.WALKING_SIDEWALK], runs
    assert not bool(final.alive[0])  # despawned at destination


def test_checking_traffic_keeps_applied_speed_one_tick():
    """The tick a ped enters CHECKING_TRAFFIC still uses the old target
    speed for forces (reference apply_current_mode ordering quirk)."""
    num_steps = 120
    cfg = StepConfig(dt=DT, waypoint_threshold=1.0, despawn_on_arrival=True)
    params = sfm_params()
    specs = [SpawnerSpec(
        spawn_location=np.array([0.0, 0.0, 1.0]),
        waypoints=np.array([[4.0, 0.0], [8.0, 0.0]]),
        crossing_road=[False, True], speed=1.5, quantity=1)]
    schedule, final, recs = run_engine(specs, num_steps, params, cfg)

    sim = OracleSim(dict(BASE_PARAMS), dt=DT, waypoint_threshold=1.0)
    sim.add_spawner(spawn_location=[0.0, 0.0], waypoints=[[4.0, 0.0], [8.0, 0.0]],
                    crossing_road=[False, True], speed=1.5, quantity=1)
    history = sim.run(num_steps)
    opos, ovel, omode, oalive = oracle_records(history, 1, num_steps)
    np.testing.assert_array_equal(np.asarray(recs.alive), oalive)
    err = np.abs(np.where(oalive[..., None], np.asarray(recs.pos) - opos, 0.0))
    assert err.max() < 2e-3


def scripted_vehicle(speed=8.0, y0=-30.0, x=12.0, length=140):
    """Vehicle driving +y along x=12, crossing the ped's path."""
    ys = y0 + speed * DT * np.arange(length)
    traj = np.column_stack([np.full(length, x), ys])
    headings = np.full(length, np.pi / 2)
    speeds = np.full(length, speed)
    return VehicleSpec(trajectory=traj, headings=headings, speeds=speeds,
                       extent=(2.4, 1.1), spawn_time=0.0)


def test_vehicle_timeline_contract():
    spec = scripted_vehicle(length=10)
    vs = build_vehicle_states([spec], DT, 30)
    # visible from traj index 1 at its spawn step, for len-1 steps
    assert bool(vs.active[0, 0]) and bool(vs.active[8, 0])
    assert not bool(vs.active[9, 0])
    np.testing.assert_allclose(np.asarray(vs.pos[0, 0]),
                               np.asarray(spec.trajectory[1]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vs.vel[3, 0]),
        spec.speeds[4] * np.array([np.cos(spec.headings[4]),
                                   np.sin(spec.headings[4])]), atol=1e-6)


def test_gap_acceptance_rollout_matches_oracle():
    """Ped waits at the curb for a scripted vehicle, then crosses."""
    num_steps = 260
    cfg = StepConfig(dt=DT, waypoint_threshold=1.0, despawn_on_arrival=True)
    params = sfm_params(dynamic_obstacle=True)
    vspec = scripted_vehicle()
    vehicles = build_vehicle_states([vspec], DT, num_steps)
    specs = [SpawnerSpec(
        spawn_location=np.array([4.0, 0.0, 1.0]),
        waypoints=np.array([[9.0, 0.0], [15.0, 0.0], [20.0, 0.0]]),
        crossing_road=[False, True, False], speed=1.5, quantity=1,
        crossing_speed_factor=1.5, crossing_safety_margin=1.5)]
    schedule, final, recs = run_engine(specs, num_steps, params, cfg,
                                       vehicles=vehicles)

    template = ellipse_template(2.4, 1.1, 0.1)
    vpos = np.asarray(vehicles.pos)
    vvel = np.asarray(vehicles.vel)
    vhead = np.asarray(vehicles.heading)
    vact = np.asarray(vehicles.active)

    def timeline(step):
        act = vact[step]
        if not act.any():
            return np.zeros((0, 2)), np.zeros((0, 2)), np.zeros((0, 2)), []
        idx = np.where(act)[0]
        outlines = []
        for v in idx:
            c, s = np.cos(vhead[step, v]), np.sin(vhead[step, v])
            world = template @ np.array([[c, s], [-s, c]]) + vpos[step, v]
            outlines.append(world)
        return (vpos[step][idx], vvel[step][idx],
                np.asarray([[2.4, 1.1]] * len(idx)), outlines)

    sim = OracleSim(dict(BASE_PARAMS), dt=DT, waypoint_threshold=1.0,
                    vehicle_timeline=timeline)
    sim.add_spawner(spawn_location=[4.0, 0.0],
                    waypoints=[[9.0, 0.0], [15.0, 0.0], [20.0, 0.0]],
                    crossing_road=[False, True, False], speed=1.5, quantity=1,
                    crossing_speed_factor=1.5, crossing_safety_margin=1.5)
    history = sim.run(num_steps)
    opos, ovel, omode, oalive = oracle_records(history, 1, num_steps)

    emode = np.asarray(recs.mode)[:, 0]
    ealive = np.asarray(recs.alive)[:, 0]
    np.testing.assert_array_equal(ealive, oalive[:, 0])
    np.testing.assert_array_equal(np.where(ealive, emode, -1),
                                  np.where(oalive[:, 0], omode[:, 0], -1))
    # the ped actually waited: CHECKING_TRAFFIC for multiple ticks
    assert (emode[ealive] == modes.CHECKING_TRAFFIC).sum() > 3
    err = np.abs(np.where(oalive[..., None], np.asarray(recs.pos) - opos, 0.0))
    assert err.max() < 5e-3, err.max()


def test_gap_ready_unit_vs_oracle():
    rng = np.random.default_rng(7)
    for _ in range(20):
        pos = rng.uniform(-5, 5, 2)
        goal = pos + rng.uniform(-8, 8, 2)
        speed = rng.uniform(0.5, 2.5)
        margin = rng.uniform(-1, 3)
        v = 3
        centers = rng.uniform(-15, 15, (v, 2))
        vels = rng.uniform(-10, 10, (v, 2))
        exts = np.column_stack([rng.uniform(1.5, 3, v), rng.uniform(0.8, 1.2, v)])
        want = oracle.gap_acceptance_ready(pos, goal, speed, margin, centers,
                                           vels, exts[:, 0])
        got = gap_ready(
            jnp.asarray(pos[None], jnp.float32), jnp.asarray(goal[None], jnp.float32),
            jnp.asarray([speed], jnp.float32), jnp.asarray([margin], jnp.float32),
            jnp.asarray(centers, jnp.float32), jnp.asarray(vels, jnp.float32),
            jnp.asarray(exts, jnp.float32), jnp.ones((v,), bool))
        assert bool(got[0]) == want


def test_record_stride_subsamples_history():
    from carla_social_force_model_tpu.api.synthetic import benchmark_bundle
    from carla_social_force_model_tpu.models.stepper import rollout
    import jax

    n, steps, k = 16, 40, 5
    scene, params, cfg, state = benchmark_bundle(n, extent=8.0)
    full_final, full = jax.jit(
        lambda s: rollout(s, scene, params, cfg, steps))(state)
    strided_final, strided = jax.jit(
        lambda s: rollout(s, scene, params, cfg, steps, record_stride=k))(state)
    np.testing.assert_array_equal(np.asarray(full_final.pos),
                                  np.asarray(strided_final.pos))
    np.testing.assert_array_equal(np.asarray(full.pos)[::k],
                                  np.asarray(strided.pos))
    np.testing.assert_array_equal(np.asarray(full.mode)[::k],
                                  np.asarray(strided.mode))
