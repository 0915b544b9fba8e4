"""Reactive vehicle autopilot (models/autopilot.py): the headless equivalent
of the reference's TrafficManager-driven vehicles (vehicle_spawner.py:125-130)
driving a jaywalking scenario class (jaywalking_scenario_config.toml)."""
import os
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from carla_social_force_model_tpu.api.simulation import Simulation
from carla_social_force_model_tpu.models.autopilot import (
    AutopilotSpec, build_autopilot_fleet, autopilot_step)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCEN = os.path.join(REPO, "configs", "scenarios", "jaywalking_reactive.toml")
SFM = os.path.join(REPO, "configs", "sfm.toml")


@pytest.fixture(scope="module")
def jaywalk_run():
    sim = Simulation.from_config(SCEN, SFM, duration=25.0)
    sim.run()
    return sim


def test_ped_waits_for_reactive_vehicle(jaywalk_run):
    """The checking pedestrian must actually wait (CHECKING_TRAFFIC for a
    while) before crossing, then finish."""
    recs = jaywalk_run.records
    mode = np.asarray(recs.mode)
    alive = np.asarray(recs.alive)
    checking = (mode[:, 0] == 4) & alive[:, 0]
    assert checking.sum() > 10           # waited > 0.5 s at the curb
    crossed = (mode[:, 0] == 2) & alive[:, 0]
    assert crossed.any()
    assert np.nonzero(crossed)[0][0] > np.nonzero(checking)[0][0]
    assert not alive[-1, 0]              # reached the far side and despawned


def test_vehicle_brakes_for_blind_crosser(jaywalk_run):
    """The second pedestrian crosses blindly (negative safety margin); the
    vehicle must brake for them, never touch them, and then resume."""
    recs, vrec = jaywalk_run.records, jaywalk_run.veh_records
    mode = np.asarray(recs.mode)
    alive = np.asarray(recs.alive)
    pos = np.asarray(recs.pos)
    vspeed = np.asarray(vrec.speed)[:, 0]
    vpos = np.asarray(vrec.pos)[:, 0]
    vact = np.asarray(vrec.active)[:, 0]

    w = np.nonzero((mode[:, 1] == 2) & alive[:, 1])[0]
    assert w.size > 0
    assert vspeed[w[0]: w[-1] + 1].min() < 1.0     # braked nearly to rest
    assert vspeed.max() > 8.0                      # and did reach the limit
    d = np.linalg.norm(pos - vpos[:, None, :], axis=-1)
    d = np.where(alive & vact[:, None], d, np.inf)
    assert d.min() > 2.4                           # never inside the bbox
    assert vpos[vact][-1, 1] > 100.0               # resumed and finished
    assert not alive[-1].any()                     # both peds arrived


def test_ignore_walkers_percentage():
    """ignore_walkers_percentage = 100 reproduces the TM knob: the vehicle
    never brakes for the jaywalkers."""
    from carla_social_force_model_tpu.utils.config import load_config
    scen = load_config(SCEN)
    scen["vehicle"]["vehicle_spawner"][0]["ignore_walkers_percentage"] = 100
    sim = Simulation.from_config(scen, SFM, duration=20.0)
    sim.run()
    vspeed = np.asarray(sim.veh_records.speed)[:, 0]
    vact = np.asarray(sim.veh_records.active)[:, 0]
    # monotone ramp to the limit, no braking dip while active
    active_speeds = vspeed[vact]
    assert (np.diff(active_speeds) >= -1e-5).all()
    assert active_speeds.max() > 8.0


def test_fleet_seeded_jitter_matches_reference_oracle():
    """build_autopilot_fleet's per-vehicle draws replicate the reference's
    vehicle spawner order (vehicle_spawner.py:100-118): seed; blueprint
    choice; cumulative speed_reduction_factor jitter; seed += 1."""
    spec = AutopilotSpec(waypoints=np.array([[0.0, 0.0], [100.0, 0.0]]),
                         speed_limit=10.0, speed_reduction_factor=30.0,
                         quantity=3, spawn_interval=1.0)
    fleet = build_autopilot_fleet([spec], 0.05, 100, vehicle_seed=55,
                                  variate_speed_factor=5.0,
                                  blueprint_count=23)
    # transliterated oracle
    seed, reduction, expect = 55, 30.0, []
    for _ in range(3):
        random.seed(seed)
        random.choice(list(range(23)))
        reduction += random.uniform(-5.0, 5.0)
        seed += 1
        expect.append(10.0 * (1.0 - reduction / 100.0))
    np.testing.assert_allclose(np.asarray(fleet.target_speed), expect,
                               rtol=0, atol=1e-6)


def test_scenario_default_blueprint_count_matches_reference():
    """Headless scenarios default the vehicle library size to CARLA
    0.9.13's (38, or 31 under no_bikes), so seeded speed jitter matches the
    reference without setting vehicle.blueprint_count (round-3 parity fix;
    vehicle_spawner.py:27-31, :100-118)."""
    from carla_social_force_model_tpu.api.scenario import build_scenario
    from carla_social_force_model_tpu.utils.config import load_config

    scen = load_config(SCEN)
    scen["vehicle"]["variate_speed_factor"] = 5.0
    scen["vehicle"].pop("blueprint_count", None)
    sp = scen["vehicle"]["vehicle_spawner"][0]
    seed = int(scen["vehicle"].get("vehicle_seed", 2000))
    limit = float(sp["speed_limit"])
    base_reduction = float(sp.get("speed_reduction_factor", 30.0))

    for no_bikes, count in ((False, 38), (True, 31)):
        scen["vehicle"]["no_bikes"] = no_bikes
        fleet = build_scenario(scen, load_config(SFM),
                               num_steps=200).scene.autopilot
        # transliterated reference oracle at the documented library size
        random.seed(seed)
        random.choice(list(range(count)))
        expect = limit * (1.0 - (base_reduction
                                 + random.uniform(-5.0, 5.0)) / 100.0)
        np.testing.assert_allclose(float(np.asarray(fleet.target_speed)[0]),
                                   expect, rtol=0, atol=1e-6)


def test_traffic_light_stop_and_go_and_ignore():
    """Headless traffic lights (PARITY.md round-3 entry): a red light ahead
    on the lane stops the vehicle short of the stop-point until it turns
    green; ignore_lights_percentage = 100 reproduces the TM knob and drives
    straight through the red."""
    from carla_social_force_model_tpu.models.autopilot import TrafficLightSpec
    dt, steps = 0.05, 500
    light = TrafficLightSpec(position=np.array([50.0, 0.0]),
                             red=12.0, green=30.0, offset=0.0)

    def drive(ignore_pct):
        spec = AutopilotSpec(waypoints=np.array([[0.0, 0.0], [100.0, 0.0]]),
                             speed_limit=10.0, speed_reduction_factor=0.0,
                             ignore_lights_percentage=ignore_pct)
        fleet = build_autopilot_fleet([spec], dt, steps,
                                      traffic_lights=[light])
        st = fleet.initial_state()
        ped = jnp.zeros((1,), jnp.float32)
        dead = jnp.zeros((1,), bool)
        xs, speeds = [], []
        for t in range(steps):
            st = autopilot_step(fleet, st, (ped, ped), (ped, ped), dead,
                                jnp.asarray(t), dt)
            xs.append(float(st.pos[0, 0]))
            speeds.append(float(st.speed[0]))
        return np.asarray(xs), np.asarray(speeds)

    red_steps = int(12.0 / dt)
    xs, speeds = drive(0.0)
    assert xs[:red_steps].max() < 50.0          # held short of the light
    assert speeds[:red_steps].min() == 0.0      # actually came to rest
    assert speeds[: red_steps // 2].max() > 5.0  # after having driven
    assert xs.max() > 99.0                      # proceeded on green

    xs_i, speeds_i = drive(100.0)
    crossed = np.nonzero(xs_i > 50.0)[0]
    assert crossed.size and crossed[0] < red_steps  # ran the red
    assert speeds_i.min() >= 0.0 and speeds_i.max() > 9.0


def test_waypoint_following_and_loop():
    """Kinematics: accelerate to target, turn at corners, loop the route."""
    spec = AutopilotSpec(waypoints=np.array([[0.0, 0.0], [20.0, 0.0],
                                             [20.0, 20.0]]),
                         speed_limit=5.0, speed_reduction_factor=0.0,
                         loop=True)
    fleet = build_autopilot_fleet([spec], 0.05, 10)
    st = fleet.initial_state()

    @jax.jit
    def run(st):
        def body(s, t):
            s = autopilot_step(fleet, s,
                               jnp.zeros((1, 2)) + 1e6, jnp.zeros((1, 2)),
                               jnp.zeros((1,), bool), t, 0.05)
            return s, (s.pos, s.speed, s.active)
        return jax.lax.scan(body, st, jnp.arange(1200))   # 60 s

    _, (pos, speed, active) = run(st)
    pos, speed = np.asarray(pos)[:, 0], np.asarray(speed)[:, 0]
    assert np.asarray(active).all()           # looping: never parks
    assert abs(speed.max() - 5.0) < 1e-5
    # visited both legs and came back around at least once
    assert pos[:, 0].max() > 19.0 and pos[:, 1].max() > 19.0
    d_start = np.linalg.norm(pos - pos[0], axis=-1)
    late = d_start[600:]
    assert late.min() < 3.0                   # returned near the origin


# --------------------------------------------------------------------------
# Car following + BehaviorAgent-style overtaking (round 4): the headless
# equivalent of the reference's agent-vehicle driving dynamics
# (vehicle_spawner.py:131-138) -- vehicles never rear-end each other, and
# an `overtake = true` vehicle passes a slower leader through the adjacent
# lane and merges back.
# --------------------------------------------------------------------------

def _drive_fleet(specs, dt, steps):
    fleet = build_autopilot_fleet(specs, dt, steps)

    @jax.jit
    def run(st):
        def body(s, t):
            s = autopilot_step(fleet, s,
                               jnp.zeros((1, 2)) + 1e6, jnp.zeros((1, 2)),
                               jnp.zeros((1,), bool), t, dt)
            return s, (s.pos, s.speed, s.active, s.lane_off, s.overtaking)
        return jax.lax.scan(body, st, jnp.arange(steps))

    _, out = run(fleet.initial_state())
    return tuple(np.asarray(o) for o in out)


def _no_bbox_overlap(pos, active, i, j, half_len=2.4, half_wid=1.1,
                     pad=0.1):
    """True when vehicles i and j never overlap as axis-aligned boxes
    (both routes here are x-aligned, so the AABB test is exact)."""
    both = active[:, i] & active[:, j]
    dx = np.abs(pos[:, i, 0] - pos[:, j, 0])
    dy = np.abs(pos[:, i, 1] - pos[:, j, 1])
    hit = both & (dx < 2 * half_len - pad) & (dy < 2 * half_wid - pad)
    return not hit.any()


ROUTE = np.array([[0.0, 0.0], [300.0, 0.0]])


def test_car_following_never_rear_ends():
    """A faster follower on the same lane brakes behind a slow leader and
    holds a gap -- it neither collides nor passes with overtake off."""
    dt, steps = 0.05, 600
    slow = AutopilotSpec(waypoints=ROUTE, speed_limit=4.0,
                         speed_reduction_factor=0.0)
    # 8 s of headroom: the follower reaches its own limit before the
    # braking corridor (~20 m at 10 m/s) touches the leader
    fast = AutopilotSpec(waypoints=ROUTE, speed_limit=10.0,
                         speed_reduction_factor=0.0, spawn_time=8.0)
    pos, speed, active, lane_off, overtaking = _drive_fleet(
        [slow, fast], dt, steps)
    both = active[:, 0] & active[:, 1]
    assert both.sum() > 300
    gap = pos[:, 0, 0] - pos[:, 1, 0]          # leader ahead of follower
    assert (gap[both] > 4.8).all()             # bumper never touches bumper
    assert speed[both, 1].max() > 9.0          # did reach its own target
    # caught up and settled into following (braked well below target)
    tail = both & (np.arange(steps) > 400)
    assert speed[tail, 1].mean() < 6.0
    assert not overtaking.any() and np.abs(lane_off).max() == 0.0


def test_overtake_passes_and_merges_back():
    """With overtake = true the follower side-steps by lane_width, passes
    the slow leader without any box overlap, and merges back to the lane."""
    dt, steps = 0.05, 900
    slow = AutopilotSpec(waypoints=ROUTE, speed_limit=4.0,
                         speed_reduction_factor=0.0)
    fast = AutopilotSpec(waypoints=ROUTE, speed_limit=10.0,
                         speed_reduction_factor=0.0, spawn_time=4.0,
                         overtake=True)
    pos, speed, active, lane_off, overtaking = _drive_fleet(
        [slow, fast], dt, steps)
    assert overtaking[:, 1].any() and not overtaking[:, 0].any()
    assert lane_off[:, 1].max() > 3.0          # actually used the left lane
    assert _no_bbox_overlap(pos, active, 0, 1)
    both = active[:, 0] & active[:, 1]
    assert (pos[both, 1, 0] - pos[both, 0, 0]).max() > 8.0   # got ahead
    # merged back: by the follower's last active step the offset is gone
    last = np.nonzero(active[:, 1])[0][-1]
    assert abs(lane_off[last, 1]) < 0.5
    assert not overtaking[last, 1]
    # and the pass is complete: follower parked at route end before leader
    assert np.nonzero(~active[:, 1])[0][-1] >= last


def test_overtake_waits_for_oncoming_traffic():
    """An oncoming vehicle in the passing lane defers the maneuver: the
    follower must not commit while the closing-speed-extended window is
    occupied, and never collides with either vehicle."""
    dt, steps = 0.05, 800
    slow = AutopilotSpec(waypoints=ROUTE, speed_limit=4.0,
                         speed_reduction_factor=0.0)
    fast = AutopilotSpec(waypoints=ROUTE, speed_limit=10.0,
                         speed_reduction_factor=0.0, spawn_time=4.0,
                         overtake=True)
    oncoming = AutopilotSpec(
        waypoints=np.array([[150.0, 3.5], [-50.0, 3.5]]),
        speed_limit=10.0, speed_reduction_factor=0.0)
    # fleet order is spawn-time order (build_autopilot_fleet events):
    # 0 = slow leader (t=0), 1 = oncoming (t=0), 2 = follower (t=4)
    pos, speed, active, lane_off, overtaking = _drive_fleet(
        [slow, fast, oncoming], dt, steps)
    assert overtaking[:, 2].any()
    first = np.nonzero(overtaking[:, 2])[0][0]
    # commitment only after the oncoming vehicle has passed the follower
    assert pos[first, 1, 0] < pos[first, 2, 0]
    assert _no_bbox_overlap(pos, active, 0, 2)
    assert _no_bbox_overlap(pos, active, 1, 2)
    both = active[:, 0] & active[:, 2]
    assert (pos[both, 2, 0] - pos[both, 0, 0]).max() > 8.0   # still passed


def test_overtake_scenario_keys_parse():
    """The [[vehicle.vehicle_spawner]] overtake keys reach AutopilotSpec."""
    from carla_social_force_model_tpu.api.scenario import (
        extract_autopilot_specs)
    specs = extract_autopilot_specs({"vehicle": {"vehicle_spawner": [{
        "waypoints": [[0.0, 0.0], [10.0, 0.0]],
        "overtake": True, "lane_width": 3.0,
        "overtake_speed_gain": 1.0, "overtake_clear_ahead": 30.0,
        "overtake_clear_behind": 6.0, "lane_change_rate": 2.0,
    }]}})
    (s,) = specs
    assert s.overtake and s.lane_width == 3.0
    assert s.overtake_speed_gain == 1.0 and s.overtake_clear_ahead == 30.0
    assert s.overtake_clear_behind == 6.0 and s.lane_change_rate == 2.0


# --------------------------------------------------------------------------
# Overtake legality from the driving-lane graph (round 5): the headless
# stand-in for the OpenDRIVE lane markings CARLA's local planner consults
# (vehicle_spawner.py:131-138) -- plus walker-hazard deferral.
# --------------------------------------------------------------------------

def _two_lane_graph(two_lane_until=100.0, length=200.0, spacing=4.0):
    """Lane A along y=0 (+x, full length); lane B along y=3.5 (-x) only
    for x <= two_lane_until -- a two-lane stretch that narrows to one."""
    from carla_social_force_model_tpu.routing.driving import (
        DrivingGraphBuilder)
    b = DrivingGraphBuilder()
    xs = np.arange(0.0, length + 1e-6, spacing)
    b.add_chain([np.array([x, 0.0, 0.0]) for x in xs])
    xs_b = np.arange(0.0, two_lane_until + 1e-6, spacing)
    b.add_chain([np.array([x, 3.5, 0.0]) for x in xs_b[::-1]])
    return b.build()


def test_lane_adjacency_mask():
    g = _two_lane_graph()
    route = g.route([0.0, 0.0], [200.0, 0.0])
    ok, width = g.lane_adjacency(route)
    assert route.shape[0] == ok.shape[0]
    xs = route[:, 0]
    assert ok[xs <= 95.0].all()          # opposing lane runs alongside
    assert not ok[xs >= 110.0].any()     # single-lane stretch: no pass
    assert abs(width - 3.5) < 0.3
    # right-side neighbors don't legalize a LEFT pass: the opposite
    # direction's route sees lane A on its left instead
    route_b = g.route([100.0, 3.5], [0.0, 3.5])
    ok_b, _ = g.lane_adjacency(route_b)
    assert ok_b.any()                    # lane A is on B's left too


def test_routed_specs_derive_overtake_from_graph():
    from carla_social_force_model_tpu.api.scenario import (
        extract_autopilot_specs)
    g = _two_lane_graph()
    (s,) = extract_autopilot_specs({"vehicle": {"vehicle_spawner": [{
        "auto_pilot": True, "spawn_location": [0.0, 0.0],
        "destination": [200.0, 0.0],
    }]}}, driving_router=g)
    assert s.overtake                          # an adjacent lane exists
    assert s.overtake_ok is not None and s.overtake_ok.any()
    assert not s.overtake_ok[-1]               # ... but not at the end
    assert abs(s.lane_width - 3.5) < 0.3
    # explicit keys override the derivation
    (s2,) = extract_autopilot_specs({"vehicle": {"vehicle_spawner": [{
        "auto_pilot": True, "spawn_location": [0.0, 0.0],
        "destination": [200.0, 0.0], "overtake": False,
    }]}}, driving_router=g)
    assert not s2.overtake
    # a single-lane graph derives overtake = False outright
    g1 = _two_lane_graph(two_lane_until=-1.0)
    (s3,) = extract_autopilot_specs({"vehicle": {"vehicle_spawner": [{
        "auto_pilot": True, "spawn_location": [0.0, 0.0],
        "destination": [200.0, 0.0],
    }]}}, driving_router=g1)
    assert not s3.overtake


def test_overtake_ok_mask_gates_the_start():
    """A follower whose route forbids passing where it catches the leader
    stays behind until the route allows it (and an all-False mask pins it
    behind for good)."""
    dt, steps = 0.05, 900
    slow = AutopilotSpec(waypoints=ROUTE, speed_limit=4.0,
                         speed_reduction_factor=0.0)
    never = AutopilotSpec(waypoints=ROUTE, speed_limit=10.0,
                          speed_reduction_factor=0.0, spawn_time=4.0,
                          overtake=True,
                          overtake_ok=np.zeros((2,), bool))
    pos, speed, active, lane_off, overtaking = _drive_fleet(
        [slow, never], dt, steps)
    assert not overtaking.any() and np.abs(lane_off).max() == 0.0
    both = active[:, 0] & active[:, 1]
    assert (pos[both, 0, 0] - pos[both, 1, 0] > 4.8).all()  # stayed behind

    # legality only from a mid-route vertex: the catch-up happens around
    # x~40 (illegal there); the pass must wait until the x=80 waypoint
    # has been reached and the final leg is current
    route3 = np.array([[0.0, 0.0], [80.0, 0.0], [300.0, 0.0]])
    late = AutopilotSpec(waypoints=route3, speed_limit=10.0,
                         speed_reduction_factor=0.0, spawn_time=4.0,
                         overtake=True,
                         overtake_ok=np.array([False, False, True]))
    slow3 = AutopilotSpec(waypoints=route3, speed_limit=4.0,
                          speed_reduction_factor=0.0)
    pos, speed, active, lane_off, overtaking = _drive_fleet(
        [slow3, late], dt, steps)
    assert overtaking[:, 1].any()
    first = np.nonzero(overtaking[:, 1])[0][0]
    # commitment only once the x=80 waypoint was reached and passed
    assert pos[first, 1, 0] > 75.0
    both = active[:, 0] & active[:, 1]
    assert (pos[both, 1, 0] - pos[both, 0, 0]).max() > 8.0   # still passed


def test_overtake_deferred_by_walker_in_passing_lane():
    """A walker standing in the passing lane defers the commit (the
    VERDICT r4 interaction case): the follower tails the leader past the
    walker and only then starts the maneuver -- never touching either."""
    dt, steps = 0.05, 900
    slow = AutopilotSpec(waypoints=ROUTE, speed_limit=4.0,
                         speed_reduction_factor=0.0)
    fast = AutopilotSpec(waypoints=ROUTE, speed_limit=10.0,
                         speed_reduction_factor=0.0, spawn_time=4.0,
                         overtake=True)
    fleet = build_autopilot_fleet([slow, fast], dt, steps)
    # the follower gets blocked behind the leader around x~10; a walker
    # at x=35 in the passing lane sits inside the ot_clear_ahead=40 m
    # window of that commit point, so the commit must wait until the
    # walker falls out of the window (follower past x = 35 + 8)
    walker_xy = jnp.asarray([[35.0, 3.5]])

    @jax.jit
    def run(st):
        def body(s, t):
            s = autopilot_step(fleet, s, walker_xy, jnp.zeros((1, 2)),
                               jnp.ones((1,), bool), t, dt)
            return s, (s.pos, s.active, s.lane_off, s.overtaking)
        return jax.lax.scan(body, st, jnp.arange(steps))

    _, out = run(fleet.initial_state())
    pos, active, lane_off, overtaking = (np.asarray(o) for o in out)
    assert overtaking[:, 1].any()              # eventually passed
    first = np.nonzero(overtaking[:, 1])[0][0]
    # the commit came only after the walker dropped out of the clearance
    # window (ot_clear_behind = 8 m behind the bumper)
    assert pos[first, 1, 0] > 35.0 + 7.0
    # while the walker sat inside the window, no commitment happened:
    # every overtaking step is beyond the walker
    assert (pos[overtaking[:, 1], 1, 0] > 35.0).all()
    # and the walker was never run over (during the pass the vehicle is
    # past it; while deferring, the walker is outside lane A's corridor)
    d = np.linalg.norm(pos[:, 1, :] - np.array([35.0, 3.5]), axis=-1)
    assert d[active[:, 1] & (np.abs(lane_off[:, 1]) > 1.0)].min() > 2.4
