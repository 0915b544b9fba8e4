"""Strict-parity quirk reproduction tests (SURVEY.md deliberate deviations)."""
import numpy as np
import jax.numpy as jnp

from carla_social_force_model_tpu.models.gap import gap_ready
from carla_social_force_model_tpu.models.params import SfmParams


def _quirk_oracle_ready(ped_loc, ped_goal, ped_speed, margin,
                        centers, vels, extents):
    """check_traffic.py:35-36 verbatim semantics: the FIRST vehicle's
    (ext_x, ext_y) pair is applied elementwise to every vehicle's direction
    vector when computing front/back."""
    import oracle
    t_ped = np.linalg.norm(ped_goal - ped_loc) / ped_speed
    e0 = extents[0]
    for v in range(len(centers)):
        speed = np.linalg.norm(vels[v])
        if speed == 0:
            continue
        direction = vels[v] / speed
        front = centers[v] + direction * e0     # elementwise (x*e0x, y*e0y)
        back = centers[v] - direction * e0
        goal = front + vels[v] * (t_ped + margin)
        hit, point = oracle._seg_intersect(ped_loc, ped_goal, back, goal)
        if not hit:
            continue
        tti_ped = np.linalg.norm(point - ped_loc) / ped_speed
        tti_front = np.linalg.norm(point - front) / speed
        tti_back = np.linalg.norm(point - back) / speed
        if tti_front - margin < tti_ped < tti_back + margin:
            return False
    return True


def test_gap_strict_parity_reproduces_first_vehicle_extent_quirk():
    import oracle
    rng = np.random.default_rng(5)
    diffs = 0
    for _ in range(200):
        ped_loc = rng.uniform(-3, 3, 2)
        ped_goal = ped_loc + rng.uniform(-10, 10, 2)
        speed = rng.uniform(0.8, 2.0)
        margin = rng.uniform(0.0, 2.5)
        centers = rng.uniform(-12, 12, (3, 2))
        vels = rng.uniform(-9, 9, (3, 2))
        extents = np.column_stack([rng.uniform(1.0, 4.0, 3),
                                   rng.uniform(0.5, 1.5, 3)])
        want_strict = _quirk_oracle_ready(ped_loc, ped_goal, speed, margin,
                                          centers, vels, extents)
        want_correct = oracle.gap_acceptance_ready(ped_loc, ped_goal, speed,
                                                   margin, centers, vels,
                                                   extents[:, 0])
        args = (jnp.asarray(ped_loc[None], jnp.float32),
                jnp.asarray(ped_goal[None], jnp.float32),
                jnp.asarray([speed], jnp.float32),
                jnp.asarray([margin], jnp.float32),
                jnp.asarray(centers, jnp.float32),
                jnp.asarray(vels, jnp.float32),
                jnp.asarray(extents, jnp.float32),
                jnp.ones((3,), bool))
        got_strict = bool(gap_ready(*args, strict_parity=True)[0])
        got_correct = bool(gap_ready(*args, strict_parity=False)[0])
        assert got_strict == want_strict
        assert got_correct == want_correct
        diffs += int(want_strict != want_correct)
    # the quirk must actually be observable on this distribution
    assert diffs > 0


def test_strict_parity_keeps_inert_config_keys():
    cfg = {
        "max_speed_multiplier": 2.0,
        "acceleration_force": {"tau": 1.5},
        "goal_force": {"tau": 0.7},
        "max_speed_factor": 1.1,
        "forces": {"acceleration_force": True},
    }
    strict = SfmParams.from_dict(cfg, strict_parity=True)
    # reference reads goal_force.tau and max_speed_factor only
    assert strict.acceleration.tau == 0.7
    assert strict.max_speed_factor == 1.1
    honored = SfmParams.from_dict(cfg)
    # non-strict honors the keys as written in the shipped config
    assert honored.acceleration.tau == 1.5
    assert honored.max_speed_factor == 2.0
