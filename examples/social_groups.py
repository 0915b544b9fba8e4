#!/usr/bin/env python
"""Social groups walking through an oncoming crowd (Moussaid et al. 2010).

A 4-member party walks east through a westbound crowd with per-walker speed
jitter.  Without the group forces, the jitter strings the party out over
tens of meters; with them (gaze + attraction + comfort-distance repulsion,
models/groups.py) the party stays inside its coherence length the whole
way.  The group terms compose with any of the three pair-force families
(Moussaid / power law / Helbing) -- swap `pedestrian_force` below to try.

The reference framework has no group model (it implements only the 2009
individual forces); `group_size` on a `[[walker.ped_spawner]]` plus
`[forces] group_force` is all it takes here.

Run:  python examples/social_groups.py  (CPU-friendly; ~30 s)
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

STEPS = 500   # 25 s at dt = 0.05


def scenario():
    spawners = [{
        # the party: 4 walkers, same origin, grouped
        "spawn_location": [-15.0, 0.0, 1.0],
        "destination": [60.0, 0.0, 0.0],
        "speed": 1.3, "quantity": 4, "spawn_interval": 0.3,
        "group_size": 4,
    }]
    # oncoming crowd lanes
    for k, y in enumerate(np.linspace(-3.0, 3.0, 7)):
        spawners.append({
            "spawn_location": [30.0, float(y), 1.0],
            "destination": [-40.0, float(y), 0.0],
            "speed": 1.25, "quantity": 4, "spawn_interval": 1.1,
        })
    return {
        "scenario_name": "social_groups",
        "step_length": 0.05,
        "walker": {"despawn_on_arrival": True, "waypoint_threshold": 1.5,
                   "variate_speed": 0.25, "pedestrian_seed": 11,
                   "ped_spawner": spawners},
    }


def run(group_force_on: bool):
    forces = {"acceleration_force": True, "pedestrian_force": True}
    if group_force_on:
        forces["group_force"] = True
    b = build_scenario(scenario(), {"forces": forces}, STEPS)
    # slot order is global spawn order (ticks ascending, spawners in config
    # order within a tick), so the party's slots come from the group table
    party = np.asarray(b.scene.groups.member_slot[0])
    party = party[party >= 0]
    _, rec = Simulation(b).run()
    pos = np.asarray(rec.pos)       # (T, N, 2)
    alive = np.asarray(rec.alive)
    spread = []
    for t in range(pos.shape[0]):
        if alive[t, party].all():
            pts = pos[t, party]
            m = len(party)
            spread.append(max(np.linalg.norm(pts[i] - pts[j])
                              for i in range(m) for j in range(i + 1, m)))
    return np.asarray(spread)


def main():
    print(f"4-member party vs. an oncoming crowd, {STEPS} steps "
          f"(speed jitter 0.25 m/s)")
    s_off = run(False)
    s_on = run(True)
    print(f"  group force OFF: party spread mean {s_off.mean():5.2f} m, "
          f"max {s_off.max():5.2f} m")
    print(f"  group force ON:  party spread mean {s_on.mean():5.2f} m, "
          f"max {s_on.max():5.2f} m")
    assert s_on.max() < s_off.max() * 0.6, "group forces failed to cohere"
    print("the party held together through the counterflow; ungrouped it "
          "strung out.")
    print("\n(fit the betas to observed parties with "
          "api.calibrate.fit_params(fit=('group.beta_att', ...), "
          "teacher_window=8) -- see tests/test_groups.py)")


if __name__ == "__main__":
    main()
