#!/usr/bin/env python
"""ORCA reciprocal collision avoidance on the antipodal-circle stress test.

Pedestrians start on a circle and walk to their antipodal points, so every
trajectory crosses the center at once -- the classic collision-avoidance
stress test (the reference ships it as circle_scenario_config.toml; here it
runs headless).  Two crowds are compared:

* the Moussaid-2009 social FORCE (the reference's law): smooth evasion,
  but nothing forbids bodies overlapping in a crush;
* ORCA (van den Berg et al. 2011, `[forces] orca_law`, ops/orca.py): each
  agent's force-integrated velocity is only a *preference* -- the executed
  velocity is its projection onto the intersection of half-planes that
  provably avoid every neighbor for `tau` seconds, assuming neighbors
  reciprocate.  Bodies cannot interpenetrate while the program is feasible.

The printed metric is the worst surface-to-surface clearance over the whole
rollout (negative = bodies overlapping).  Mixed crowds work too: set
`pair_force = "orca"` on one `[[walker.ped_spawner]]` and that spawner's
walkers run ORCA while the rest keep the force law (models/spawn.py
LAW_IDS row masks).

Run:  python examples/orca_circle.py   (CPU-friendly; ~5 min -- two
520-step rollouts, compile-bound)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
except Exception:
    pass

import numpy as np  # noqa: E402

from carla_social_force_model_tpu.api.scenario import build_scenario  # noqa: E402
from carla_social_force_model_tpu.api.simulation import Simulation  # noqa: E402

N = 24
RADIUS = 12.0       # spawn circle [m]
STEPS = 520         # 26 s at dt = 0.05 (24 m at ~1.3 m/s + center crush)


def _angles():
    # a perfectly symmetric circle is ORCA's textbook degenerate case: the
    # reciprocal side choices tie and the crowd freezes in a standoff ring
    # (RVO2's own examples jitter agent state for exactly this reason).
    # A deterministic sub-degree angular stagger breaks every tie.
    rng = np.random.default_rng(7)
    return (2.0 * np.pi * np.arange(N) / N
            + rng.uniform(-0.012, 0.012, N))


def scenario():
    spawners = []
    for a in _angles():
        x, y = RADIUS * np.cos(a), RADIUS * np.sin(a)
        spawners.append({
            "spawn_location": [float(x), float(y), 1.0],
            "destination": [float(-x), float(-y), 0.0],
            "speed": 1.3, "quantity": 1,
        })
    return {
        "scenario_name": "orca_circle",
        "step_length": 0.05,
        "walker": {"despawn_on_arrival": False, "waypoint_threshold": 1.0,
                   "variate_speed": 0.08, "pedestrian_seed": 3,
                   "ped_spawner": spawners},
    }


def min_clearance(rec, ped_radius):
    """Worst surface-to-surface distance between alive pairs [m]."""
    pos = np.asarray(rec.pos)
    alive = np.asarray(rec.alive)
    worst = np.inf
    for t in range(pos.shape[0]):
        p = pos[t][alive[t]]
        if len(p) < 2:
            continue
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        worst = min(worst, float(d.min()) - 2.0 * ped_radius)
    return worst


def run(orca: bool):
    forces = {"acceleration_force": True}
    if orca:
        forces["orca_law"] = True
    else:
        forces["pedestrian_force"] = True
    b = build_scenario(scenario(), {"forces": forces}, STEPS)
    _, rec = Simulation(b).run()
    radius = float(np.asarray(b.scene.spawn.radius)[0])
    return min_clearance(rec, radius), np.asarray(rec.pos)


def main():
    print(f"{N} pedestrians, antipodal circle r={RADIUS:.0f} m, "
          f"{STEPS} steps")
    c_force, _ = run(orca=False)
    c_orca, pos = run(orca=True)
    print(f"  Moussaid force law: worst clearance {c_force:+7.3f} m")
    print(f"  ORCA projection:    worst clearance {c_orca:+7.3f} m")
    assert c_orca > -0.02, (
        "ORCA let bodies interpenetrate -- the LP should forbid this")
    # everyone made it across (final position near their antipode; slot
    # order is spawner order, so destinations follow the spawn formula)
    ang = _angles()
    dests = -RADIUS * np.column_stack([np.cos(ang), np.sin(ang)])
    miss = np.linalg.norm(pos[-1] - dests, axis=-1)
    assert (miss < 3.0).mean() > 0.9, f"crowd failed to cross: {miss}"
    print("ORCA kept every pair collision-free through the center crush; "
          "the force law alone does not guarantee that.")
    print("\n(mixed crowds: pair_force = \"orca\" on one spawner; "
          "vehicles constrain as non-reciprocating discs -- "
          "see tests/test_orca.py)")


if __name__ == "__main__":
    main()
