"""ORCA velocity law (ops/orca.py) vs independent float64 oracles.

Oracle strategy (tests/oracle_orca.py): the half-plane geometry is checked
against dense boundary sampling of the exact velocity obstacle (membership
by the quadratic-in-t collision condition -- no shared case analysis), and
the LP solvers against brute-force grid search over the speed disc.
Engine-level tests then pin the collision-avoidance guarantees the law
exists for.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle_orca
from carla_social_force_model_tpu.models.params import (OrcaParams,
                                                        SfmParams)
from carla_social_force_model_tpu.models.spawn import (SpawnerSpec,
                                                       build_spawn_schedule)
from carla_social_force_model_tpu.models.state import PedState
from carla_social_force_model_tpu.models.stepper import (Scene, StepConfig,
                                                         make_rollout_fn)
from carla_social_force_model_tpu.ops.orca import (orca_halfplane,
                                                   orca_velocities,
                                                   solve_lp2, solve_lp3,
                                                   solve_orca_lp)

DT = 0.05


def sfm_orca(**orca_kw):
    p = SfmParams.from_dict({
        "forces": {"acceleration_force": True, "orca_law": True},
    })
    if orca_kw:
        p = dataclasses.replace(p, orca=OrcaParams(**orca_kw))
    return p


# ---------------------------------------------------------------------------
# half-plane geometry vs the boundary-sampling oracle
# ---------------------------------------------------------------------------

def _halfplane_case(p, rv, r, tau=2.0, dt=DT):
    ux, uy, nx, ny = orca_halfplane(
        jnp.asarray(p[0]), jnp.asarray(p[1]),
        jnp.asarray(rv[0]), jnp.asarray(rv[1]), jnp.asarray(r), tau, dt)
    return np.array([float(ux), float(uy)]), np.array([float(nx), float(ny)])


def test_halfplane_boundary_oracle():
    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(40):
        d = rng.uniform(0.25, 10.0)
        ang = rng.uniform(0, 2 * np.pi)
        p = d * np.array([np.cos(ang), np.sin(ang)])
        rv = rng.uniform(-3, 3, 2)
        r = rng.uniform(0.3, 1.2)
        tau = 2.0
        u, n = _halfplane_case(p, rv, r, tau=tau)
        assert np.all(np.isfinite(u)) and np.all(np.isfinite(n))
        np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-5)

        if d <= r:  # colliding branch: closed-form disc comparison
            u_o, n_o = oracle_orca.vo_closest_boundary(p, rv, r, tau, DT)
            np.testing.assert_allclose(u, u_o, atol=1e-4)
            assert n @ n_o > 0.999
            checked += 1
            continue

        u_o, n_o = oracle_orca.vo_closest_boundary(p, rv, r, tau, DT)
        # the point we chose must be no farther than the oracle's closest
        # boundary point (robust to equidistant-feature ties, where u may
        # legitimately differ from u_o), and the +-n probes below pin it
        # to within eps of the boundary
        b = rv + u
        scale = max(1.0, np.linalg.norm(rv), d)
        assert np.linalg.norm(u) <= np.linalg.norm(u_o) + 2e-3 * scale
        # n is the outward normal at that point: stepping along +n exits
        # the obstacle, along -n stays in
        eps = 1e-3 * scale
        assert not oracle_orca.in_vo(b + eps * n, p, r, tau)
        assert oracle_orca.in_vo(b - eps * n, p, r * (1 + 1e-9), tau)
        checked += 1
    assert checked == 40


def test_halfplane_inside_vs_outside_sign():
    # agent heading straight at a neighbor dead ahead: rv inside the VO,
    # so u must point AWAY from the collision course and v + u/2 slows or
    # deflects; an agent moving away has a permissive plane (u along -n)
    p = np.array([2.0, 0.0])
    u_in, n_in = _halfplane_case(p, np.array([1.0, 0.0]), 0.6)
    assert u_in @ n_in > 0  # correction pushes out
    u_out, n_out = _halfplane_case(p, np.array([-1.0, 0.0]), 0.6)
    assert u_out @ n_out < 0  # already clear: plane sits behind


# ---------------------------------------------------------------------------
# LP solvers vs grid search
# ---------------------------------------------------------------------------

def _random_lp(rng, c=6, vmax=2.0):
    ang = rng.uniform(0, 2 * np.pi, c)
    nx, ny = np.cos(ang), np.sin(ang)
    ptx = rng.uniform(-1.5, 1.5, c)
    pty = rng.uniform(-1.5, 1.5, c)
    valid = rng.random(c) < 0.8
    pref = rng.uniform(-2.5, 2.5, 2)
    return pref, ptx, pty, nx, ny, valid, vmax


def test_lp2_matches_grid():
    rng = np.random.default_rng(1)
    n_feas = 0
    for _ in range(60):
        pref, ptx, pty, nx, ny, valid, vmax = _random_lp(rng)
        grid = oracle_orca.lp_grid(
            pref, list(zip(ptx, pty)), list(zip(nx, ny)), valid, vmax)
        cell = 2 * vmax / 800
        vx, vy, feas = jax.tree_util.tree_map(np.asarray, solve_lp2(
            jnp.asarray(pref[0]), jnp.asarray(pref[1]),
            jnp.asarray(ptx)[None, :], jnp.asarray(pty)[None, :],
            jnp.asarray(nx)[None, :], jnp.asarray(ny)[None, :],
            jnp.asarray(valid)[None, :], jnp.asarray(vmax)))
        if not grid["feasible"] or grid["minimax_m"] < 2 * cell:
            continue  # infeasible or too thin to trust the grid
        n_feas += 1
        assert bool(feas[0])
        v = np.array([vx[0], vy[0]])
        # feasible within tolerance
        clear = (v[0] - ptx) * nx + (v[1] - pty) * ny
        assert clear[valid].min() >= -1e-3
        assert np.linalg.norm(v) <= vmax * (1 + 1e-4) + 1e-3
        # no worse than the best grid point (grid can only be coarser)
        assert np.linalg.norm(v - pref) <= grid["best_dist"] + 2 * cell
    assert n_feas >= 25  # the generator must actually exercise the solver


def test_lp3_matches_grid_on_infeasible():
    rng = np.random.default_rng(2)
    n_inf = 0
    for _ in range(60):
        # planes demanding v far out along scattered normals: with normals
        # spread wider than the disc can satisfy, the intersection is empty
        c = 5
        ang = rng.uniform(0, 2 * np.pi, c)
        nx, ny = np.cos(ang), np.sin(ang)
        ptx = 2.5 * nx + rng.uniform(-0.5, 0.5, c)
        pty = 2.5 * ny + rng.uniform(-0.5, 0.5, c)
        valid = np.ones(c, bool)
        vmax = 2.0
        grid = oracle_orca.lp_grid(
            np.zeros(2), list(zip(ptx, pty)), list(zip(nx, ny)), valid, vmax)
        cell = 2 * vmax / 800
        if grid["feasible"] or grid["minimax_m"] > -2 * cell:
            continue
        n_inf += 1
        vx, vy = jax.tree_util.tree_map(np.asarray, solve_lp3(
            jnp.asarray(ptx)[None, :], jnp.asarray(pty)[None, :],
            jnp.asarray(nx)[None, :], jnp.asarray(ny)[None, :],
            jnp.asarray(valid)[None, :], jnp.asarray(vmax)[None]))
        v = np.array([vx[0], vy[0]])
        m_ours = (((v[0] - ptx) * nx + (v[1] - pty) * ny)[valid]).min()
        assert np.linalg.norm(v) <= vmax * (1 + 1e-4) + 1e-3
        # at least as good as the best grid point (within grid resolution)
        assert m_ours >= grid["minimax_m"] - 2.5 * cell
    assert n_inf >= 15


def test_lp_no_constraints_returns_clipped_pref():
    vx, vy, feas = solve_lp2(
        jnp.asarray([3.0, 0.5]), jnp.asarray([0.0, -0.5]),
        jnp.zeros((2, 3)), jnp.zeros((2, 3)),
        jnp.zeros((2, 3)), jnp.zeros((2, 3)),
        jnp.zeros((2, 3), bool), jnp.asarray([2.0, 2.0]))
    assert bool(feas.all())
    np.testing.assert_allclose(np.asarray(vx), [2.0, 0.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(vy), [0.0, -0.5], atol=1e-5)


def test_solve_orca_lp_falls_back_on_infeasible_rows():
    # row 0 feasible, row 1 plainly infeasible (two opposing planes with a
    # gap outside the disc): the cond must still fix row 1 exactly
    ptx = jnp.asarray([[0.0, 0.0], [3.0, -3.0]])
    pty = jnp.zeros((2, 2))
    nx = jnp.asarray([[1.0, 1.0], [1.0, -1.0]])
    ny = jnp.zeros((2, 2))
    valid = jnp.ones((2, 2), bool)
    vmax = jnp.asarray([2.0, 2.0])
    vx, vy = solve_orca_lp(jnp.asarray([1.0, 1.0]), jnp.asarray([0.0, 0.0]),
                           ptx, pty, nx, ny, valid, vmax)
    # row 1: m(v) = min(vx-3, 3-vx) maximized at vx=0 (m=-3); y free ->
    # tie broken toward first candidate but any |v|<=vmax with vx=0 is
    # optimal
    assert abs(float(vx[1])) < 1e-3
    # row 0: pref (1, 0) already feasible
    np.testing.assert_allclose(float(vx[0]), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# orca_velocities: neighbor machinery
# ---------------------------------------------------------------------------

def _mk(n, rng, spread=10.0):
    px = jnp.asarray(rng.uniform(-spread, spread, n), jnp.float32)
    py = jnp.asarray(rng.uniform(-spread, spread, n), jnp.float32)
    vx = jnp.asarray(rng.uniform(-1.5, 1.5, n), jnp.float32)
    vy = jnp.asarray(rng.uniform(-1.5, 1.5, n), jnp.float32)
    r = jnp.full((n,), 0.3, jnp.float32)
    alive = jnp.asarray(rng.random(n) < 0.9)
    vmax = jnp.full((n,), 1.56, jnp.float32)
    return px, py, vx, vy, r, alive, vmax


def test_windowed_equals_full_on_a_line():
    # agents on the x-axis: Morton order IS x order, so a window of +-5
    # positions contains the 4 nearest exactly -> windowed == full
    n = 24
    rng = np.random.default_rng(3)
    xs = np.sort(rng.uniform(-12, 12, n))
    px = jnp.asarray(xs, jnp.float32)
    py = jnp.zeros((n,), jnp.float32)
    vx = jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
    vy = jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
    r = jnp.full((n,), 0.3, jnp.float32)
    alive = jnp.ones((n,), bool)
    vmax = jnp.full((n,), 1.5, jnp.float32)
    pref = (vx * 0.5, vy * 0.5)
    kw = dict(dt=DT, spatial_order="morton")
    pw = OrcaParams(max_neighbors=4, window=10, neighbor_dist=6.0)
    pf = OrcaParams(max_neighbors=4, window=0, neighbor_dist=6.0)
    wvx, wvy = orca_velocities((px, py), (vx, vy), r, alive, pref, vmax,
                               pw, **kw)
    fvx, fvy = orca_velocities((px, py), (vx, vy), r, alive, pref, vmax,
                               pf, **kw)
    np.testing.assert_allclose(np.asarray(wvx), np.asarray(fvx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(wvy), np.asarray(fvy), atol=2e-5)


def test_orca_velocities_finite_and_capped():
    rng = np.random.default_rng(4)
    px, py, vx, vy, r, alive, vmax = _mk(40, rng, spread=2.0)
    # coincident pair + zero velocities stress the zero guards
    px = px.at[1].set(px[0])
    py = py.at[1].set(py[0])
    vx = vx.at[:2].set(0.0)
    vy = vy.at[:2].set(0.0)
    for window in (0, 8):
        ovx, ovy = orca_velocities(
            (px, py), (vx, vy), r, alive, (vx, vy), vmax,
            OrcaParams(window=window), DT)
        ovx, ovy = np.asarray(ovx), np.asarray(ovy)
        a = np.asarray(alive)
        assert np.isfinite(ovx[a]).all() and np.isfinite(ovy[a]).all()
        sp = np.sqrt(ovx[a] ** 2 + ovy[a] ** 2)
        assert (sp <= np.asarray(vmax)[a] * (1 + 1e-4) + 1e-3).all()


def test_no_neighbors_returns_pref():
    px = jnp.asarray([0.0, 100.0], jnp.float32)
    py = jnp.zeros((2,), jnp.float32)
    z = jnp.zeros((2,), jnp.float32)
    r = jnp.full((2,), 0.3, jnp.float32)
    alive = jnp.ones((2,), bool)
    pref = (jnp.asarray([1.0, -0.5], jnp.float32), z)
    ovx, ovy = orca_velocities((px, py), (z, z), r, alive, pref,
                               jnp.full((2,), 2.0, jnp.float32),
                               OrcaParams(), DT)
    np.testing.assert_allclose(np.asarray(ovx), [1.0, -0.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ovy), [0.0, 0.0], atol=1e-5)


# ---------------------------------------------------------------------------
# engine-level: the guarantees the law exists for
# ---------------------------------------------------------------------------

def _orca_specs(starts_goals, speed=1.3, radius=0.4):
    # slight per-agent speed stagger breaks perfect symmetry (the classic
    # ORCA deadlock of exactly-symmetric crowds, which RVO2 also avoids by
    # perturbation)
    return [SpawnerSpec(spawn_location=np.array([sx, sy, 0.3]),
                        waypoints=np.array([[gx, gy]]),
                        crossing_road=[False], speed=speed + 0.015 * i,
                        radius=radius, quantity=1, spawn_time=0.0,
                        pair_force="orca")
            for i, (sx, sy, gx, gy) in enumerate(starts_goals)]


def _min_pairwise_dist(recs):
    pos = np.asarray(recs.pos)           # (T, N, 2)
    alive = np.asarray(recs.alive)
    best = np.inf
    for t in range(pos.shape[0]):
        a = alive[t]
        if a.sum() < 2:
            continue
        pts = pos[t, a]
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        d[np.diag_indices(len(pts))] = np.inf
        best = min(best, d.min())
    return best


def test_head_on_pair_passes_without_contact():
    # the tiny lateral offset de-degenerates the exactly-collinear case:
    # at y == 0 exactly, ORCA's minimal correction for a slow head-on
    # approach is pure deceleration (the truncation-arc projection) and a
    # perfectly symmetric pair crawls to a stop at contact distance -- the
    # textbook symmetric deadlock every ORCA implementation breaks by
    # perturbation
    specs = _orca_specs([(-6.0, 0.02, 6.0, 0.02), (6.0, -0.02, -6.0, -0.02)])
    steps = 300
    schedule = build_spawn_schedule(specs, DT, steps)
    scene = Scene(spawn=schedule)
    cfg = StepConfig(dt=DT, waypoint_threshold=0.8)
    run = make_rollout_fn(scene, sfm_orca(), cfg, steps)
    final, recs = run(PedState.empty(schedule.capacity))
    # both arrived (despawned on arrival)
    assert not np.asarray(final.alive).any()
    # never touched: centers stayed >= r_i + r_j (tiny dt-discretization
    # slack -- positions move one Euler step between ORCA solves)
    assert _min_pairwise_dist(recs) >= 0.8 - 0.05


def test_antipodal_circle_no_contact():
    n = 8
    # small angular stagger: see the symmetric-deadlock note above
    ang = (np.linspace(0, 2 * np.pi, n, endpoint=False)
           + 0.013 * np.arange(n))
    R = 6.0
    specs = _orca_specs([(R * np.cos(a), R * np.sin(a),
                          -R * np.cos(a), -R * np.sin(a)) for a in ang])
    # stagger departures so not all 8 hit the center in the same second
    # (an 8-way simultaneous crossing takes much longer to untangle than
    # the horizon needs to be to prove no-contact + arrival)
    for i, s in enumerate(specs):
        s.spawn_time = 0.4 * i
    steps = 700
    schedule = build_spawn_schedule(specs, DT, steps)
    scene = Scene(spawn=schedule)
    cfg = StepConfig(dt=DT, waypoint_threshold=0.8)
    run = make_rollout_fn(scene, sfm_orca(), cfg, steps)
    final, recs = run(PedState.empty(schedule.capacity))
    assert not np.asarray(final.alive).any()      # everyone arrived
    assert _min_pairwise_dist(recs) >= 0.8 - 0.06


def test_orca_dodges_scripted_vehicle():
    """A scripted (non-yielding) vehicle drives straight at a standing
    ORCA agent: the agent must clear out of the swept path (the reference
    treats vehicles as non-negotiating dynamic obstacles; here the walker
    takes the full correction)."""
    from carla_social_force_model_tpu.models.vehicles import (
        VehicleSpec, build_vehicle_states, trajectory_from_waypoints)
    steps = 240
    traj, head, spd = trajectory_from_waypoints(
        np.array([[-20.0, 0.0], [20.0, 0.0]]), speed=5.0, dt=DT)
    veh = build_vehicle_states(
        [VehicleSpec(trajectory=traj, headings=head, speeds=spd,
                     extent=(2.4, 1.1))], DT, steps)
    # standing agent in the lane: goal == start, pref velocity ~ 0
    specs = _orca_specs([(0.0, 0.3, 0.0, 0.3)], radius=0.4)
    schedule = build_spawn_schedule(specs, DT, steps)
    scene = Scene(spawn=schedule, vehicles=veh)
    cfg = StepConfig(dt=DT, waypoint_threshold=0.1, despawn_on_arrival=False)
    run = make_rollout_fn(scene, sfm_orca(), cfg, steps)
    final, recs = run(PedState.empty(schedule.capacity))
    pos = np.asarray(recs.pos)[:, 0]       # (T, 2)
    centers = np.asarray(veh.pos)[:steps, 0]
    active = np.asarray(veh.active)[:steps, 0]
    d = np.linalg.norm(pos - centers, axis=-1)
    min_d = d[active.astype(bool)].min()
    # circumscribed vehicle radius sqrt(2.4^2+1.1^2)=2.64 + ped 0.4
    assert min_d >= 2.6  # cleared the disc (small dt slack)


def _wall_pset(start, end, resolution=0.1):
    from carla_social_force_model_tpu.env.borders import (build_border_set,
                                                          sample_borderline)
    lines = [sample_borderline(start, end, resolution)]
    return build_border_set(lines, [lines[0][len(lines[0]) // 2]],
                            [len(lines[0]) * resolution])


def _multi_wall_pset(segs, resolution=0.1):
    from carla_social_force_model_tpu.env.borders import (build_border_set,
                                                          sample_borderline)
    lines = [sample_borderline(s, e, resolution) for s, e in segs]
    return build_border_set(lines, [ln[len(ln) // 2] for ln in lines],
                            [len(ln) * resolution for ln in lines])


def test_wall_halfplane_bounds_approach_rate():
    """The static constraint is the exact straight-wall rule: the wall-ward
    velocity component can never exceed gap / tau_static (and crossing is
    impossible a fortiori).  Agents sit exactly below wall samples (normal
    exactly (0, 1)) and far enough apart that no pair plane binds, so the
    bound is sharp."""
    pset = _wall_pset([-10.0, 2.0], [10.0, 2.0])
    wall_x = np.asarray(pset.points[..., 0]).reshape(-1)
    wall_v = np.asarray(pset.valid).reshape(-1)
    xs = np.sort(wall_x[wall_v])[[5, 30, 55, 80, 105, 130, 155, 180]]
    rng = np.random.default_rng(7)
    n = len(xs)
    px = jnp.asarray(xs, jnp.float32)
    py = jnp.asarray(rng.uniform(-1.0, 1.6, n), jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    r = jnp.full((n,), 0.3, jnp.float32)
    alive = jnp.ones((n,), bool)
    # everyone prefers to charge straight at the wall at full speed
    pref = (z, jnp.full((n,), 1.8, jnp.float32))
    vmax = jnp.full((n,), 2.0, jnp.float32)
    p = OrcaParams(tau_static=2.0)
    ovx, ovy = orca_velocities((px, py), (z, z), r, alive, pref, vmax, p,
                               DT, borders=pset)
    ovx, ovy = np.asarray(ovx), np.asarray(ovy)
    gap = (2.0 - np.asarray(py)) - 0.3
    assert (ovy <= gap / 2.0 + 1e-3).all()
    # exempt rows keep the raw preference (crossing-mode semantics);
    # checked with a lone agent so no pair plane can bind either
    one = slice(0, 1)
    evx, evy = orca_velocities(
        (px[one], py[one]), (z[one], z[one]), r[one], alive[one],
        (pref[0][one], pref[1][one]), vmax[one], p, DT, borders=pset,
        static_exempt=jnp.ones((1,), bool))
    np.testing.assert_allclose(np.asarray(evy), 1.8, atol=1e-5)


def test_goal_behind_wall_is_blocked_only_with_statics():
    """An ORCA agent whose waypoint lies BEYOND a wall: without static
    constraints the projection happily selects the wall-crossing preferred
    velocity (the round-3 gap this feature closes); with them the agent
    provably never penetrates."""
    steps = 200
    specs = _orca_specs([(0.0, 0.0, 0.0, 6.0)], radius=0.3)
    schedule = build_spawn_schedule(specs, DT, steps)
    scene = Scene(spawn=schedule, borders=_wall_pset([-10, 2.0], [10, 2.0]))
    cfg = StepConfig(dt=DT, waypoint_threshold=0.2,
                     despawn_on_arrival=False)

    def max_y(params):
        run = make_rollout_fn(scene, params, cfg, steps)
        _, recs = run(PedState.empty(schedule.capacity))
        y = np.asarray(recs.pos)[..., 1]
        return np.where(np.asarray(recs.alive), y, -np.inf).max()

    # no statics: walks straight through the wall toward the goal
    p_off = sfm_orca(max_statics=0)
    assert max_y(p_off) > 2.5
    # statics on (default): body never crosses; center stays <= 2 - r
    p_on = sfm_orca()
    assert max_y(p_on) <= 2.0 - 0.3 + 0.01


def test_orca_corridor_counterflow_zero_wall_penetration():
    """Dense ORCA counterflow in a walled corridor with the border FORCE
    off (nothing soft pushes agents away from the walls -- only the hard
    half-planes): no agent's body may ever penetrate a wall, and the
    crowd must still make it through (the constraints don't deadlock)."""
    walls = _multi_wall_pset([([-12.0, 2.0], [12.0, 2.0]),
                              ([-12.0, -2.0], [12.0, -2.0])])
    lanes = [-1.2, -0.45, 0.45, 1.2]
    sg, waves = [], []
    for wave in range(2):
        for y in lanes:
            sg.append((-8.0, y, 8.0, y))
            waves.append(2.5 * wave)
        for y in lanes:
            sg.append((8.0, y + 0.11, -8.0, y + 0.11))
            waves.append(2.5 * wave + 1.1)
    specs = _orca_specs(sg, radius=0.3)
    for s, t0 in zip(specs, waves):
        s.spawn_time = t0
    steps = 640
    schedule = build_spawn_schedule(specs, DT, steps)
    scene = Scene(spawn=schedule, borders=walls)
    cfg = StepConfig(dt=DT, waypoint_threshold=0.8)
    run = make_rollout_fn(scene, sfm_orca(), cfg, steps)
    final, recs = run(PedState.empty(schedule.capacity))
    alive = np.asarray(recs.alive)
    y = np.asarray(recs.pos)[..., 1]
    # zero wall penetration vs the TRUE wall lines y = +-2 (0.01 slack =
    # the 0.05 m sample half-spacing chord correction, see
    # ops/orca._static_constraints)
    assert np.where(alive, np.abs(y), 0.0).max() <= 2.0 - 0.3 + 0.01
    # and no deadlock: everyone still arrived (despawned)
    assert not np.asarray(final.alive).any()
    # agents never touched each other either (the pair guarantee holds
    # alongside the wall constraints)
    assert _min_pairwise_dist(recs) >= 0.6 - 0.06


def test_mixed_crowd_orca_rows_skip_pair_families():
    """pair_force='orca' rows must not feel the Moussaid force (the law_id
    machinery masks families), while moussaid rows still do."""
    from carla_social_force_model_tpu.models.stepper import force_terms
    specs = [
        SpawnerSpec(spawn_location=np.array([0.0, 0.0, 0.3]),
                    waypoints=np.array([[10.0, 0.0]]), crossing_road=[False],
                    quantity=1, pair_force="orca"),
        SpawnerSpec(spawn_location=np.array([1.0, 0.0, 0.3]),
                    waypoints=np.array([[10.0, 0.0]]), crossing_road=[False],
                    quantity=1, pair_force="moussaid"),
    ]
    schedule = build_spawn_schedule(specs, DT, 10)
    scene = Scene(spawn=schedule)
    params = SfmParams.from_dict({
        "forces": {"acceleration_force": True, "pedestrian_force": True,
                   "orca_law": True}})
    state = PedState.empty(schedule.capacity)
    from carla_social_force_model_tpu.models.spawn import apply_spawn
    state = apply_spawn(state, schedule, 0)
    terms = force_terms(state, scene, params, StepConfig(dt=DT), None)
    fx, fy = terms["pedestrian_force"]
    fx, fy = np.asarray(fx), np.asarray(fy)
    assert fx[0] == 0.0 and fy[0] == 0.0        # orca row masked
    assert abs(fx[1]) > 0.0                     # moussaid row feels slot 0


def test_orca_rollout_shards_like_single_device():
    from carla_social_force_model_tpu.parallel.mesh import make_mesh
    from carla_social_force_model_tpu.parallel.sharding import (
        make_sharded_rollout, prepare_sharded_scene)
    n = 12
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    R = 5.0
    specs = _orca_specs([(R * np.cos(a), R * np.sin(a),
                          -R * np.cos(a), -R * np.sin(a)) for a in ang])
    steps = 40
    schedule = build_spawn_schedule(specs, DT, steps)
    scene = Scene(spawn=schedule)
    cfg = StepConfig(dt=DT, waypoint_threshold=0.8)
    params = sfm_orca(window=0)

    run_single = make_rollout_fn(scene, params, cfg, steps)
    final_s, recs_s = run_single(PedState.empty(schedule.capacity))

    mesh = make_mesh(n_agent_shards=8)
    scene_p, cap = prepare_sharded_scene(scene, 8)
    run_sharded = make_sharded_rollout(mesh, scene_p, params, cfg, steps,
                                       record=True)
    final_p, recs_p = run_sharded(PedState.empty(cap))
    np.testing.assert_array_equal(np.asarray(recs_s.alive),
                                  np.asarray(recs_p.alive)[:, :n])
    np.testing.assert_allclose(np.asarray(recs_s.pos),
                               np.asarray(recs_p.pos)[:, :n], atol=3e-5)


def test_scenario_rejects_orca_without_flag():
    from carla_social_force_model_tpu.models.spawn import LAW_IDS
    assert LAW_IDS["orca"] == 3
    specs = _orca_specs([(0.0, 0.0, 5.0, 0.0)])
    schedule = build_spawn_schedule(specs, DT, 10)
    # the scenario builder is what validates; emulate its check here
    params = SfmParams.from_dict({"forces": {"acceleration_force": True}})
    assert not params.enable_orca
    enabled = {3: params.enable_orca}
    fid = int(np.asarray(schedule.law_id).max())
    assert fid == 3 and not enabled[fid]


def test_sfm_orca_config_runs_shipped_circle():
    """The shipped configs/sfm_orca.toml composes with any scenario config
    (homogeneous ORCA crowd): the antipodal circle crosses without contact."""
    import os
    from carla_social_force_model_tpu.api.simulation import Simulation
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sim = Simulation.from_config(
        os.path.join(repo, "configs/scenarios/antipodal_circle.toml"),
        os.path.join(repo, "configs/sfm_orca.toml"), duration=14.0)
    assert sim.bundle.params.enable_orca
    _, recs = sim.run()
    alive = np.asarray(recs.alive)
    assert alive.any()
    pos = np.where(alive[..., None], np.asarray(recs.pos), 0.0)
    assert np.all(np.isfinite(pos))
    # default headless walker radius is 0.3: centers stay >= 2r (with one
    # Euler step of slack)
    assert _min_pairwise_dist(recs) >= 0.6 - 0.05


def test_strict_parity_rejects_orca_flag():
    with pytest.raises(ValueError, match="orca_law"):
        SfmParams.from_dict({"forces": {"orca_law": True}},
                            strict_parity=True)
