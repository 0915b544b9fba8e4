#!/usr/bin/env python
"""V-formation emergence study for the Moussaid-2010 group model.

The paper's empirical signature (Moussaid, Perozo, Garnier, Helbing &
Theraulaz 2010, PLoS ONE 5(4):e10047, Fig. 4): at low density a walking
party spreads laterally into a line abreast; as density rises the line
bends against the walking direction -- the center member drops BEHIND the
flanks so everyone can keep the others in view (a concave "V"/"U").  The
bending is driven by the gaze term (f_vis = -beta_vis * alpha * v): flank
members minimize their head rotation alpha when the others' centroid sits
forward-inward of them, which is exactly the center-behind configuration.

This tool measures the shape of a 3-member party in the walking frame:

* lateral width  w      = y_max - y_min over the members,
* bend           delta  = x_center - mean(x_flanks)  (x = walking axis,
  "center" = the member with the middle lateral position), negative =
  center behind = the paper's concave V.

over two conditions -- free walking (low density) and pushing through an
oncoming crowd (high density) -- across several seeds.  The physics test
in tests/test_physics.py pins the stable part of the result.

Run:  python tools/group_shape_study.py   (CPU, ~1 min)
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

STEPS = 700   # 35 s at dt = 0.05


def scenario(seed: int, crowd: bool):
    spawners = [{
        "spawn_location": [-20.0, 0.0, 1.0],
        "destination": [80.0, 0.0, 0.0],
        "speed": 1.3, "quantity": 3, "spawn_interval": 0.2,
        "group_size": 3,
    }]
    if crowd:
        # oncoming lanes at ~0.4 peds/m^2 in the party's path
        for y in np.linspace(-3.5, 3.5, 8):
            spawners.append({
                "spawn_location": [40.0, float(y), 1.0],
                "destination": [-50.0, float(y), 0.0],
                "speed": 1.25, "quantity": 6, "spawn_interval": 1.6,
            })
    return {
        "scenario_name": "group_shape",
        "step_length": 0.05,
        "walker": {"despawn_on_arrival": True, "waypoint_threshold": 1.5,
                   "variate_speed": 0.15, "pedestrian_seed": seed,
                   "ped_spawner": spawners},
    }


def measure(seed: int, crowd: bool):
    """Time-averaged (width, bend) of the party in its steady window."""
    forces = {"acceleration_force": True, "pedestrian_force": True,
              "group_force": True}
    b = build_scenario(scenario(seed, crowd), {"forces": forces}, STEPS)
    party = np.asarray(b.scene.groups.member_slot[0])
    party = party[party >= 0]
    _, rec = Simulation(b).run()
    pos = np.asarray(rec.pos)
    alive = np.asarray(rec.alive)
    widths, bends = [], []
    # steady window: skip the first 8 s (spawn stagger + formation), stop
    # when anyone arrives
    for t in range(160, pos.shape[0]):
        if not alive[t, party].all():
            break
        pts = pos[t, party]                      # (3, 2); walking axis = x
        order = np.argsort(pts[:, 1])            # lateral sort
        flank_lo, center, flank_hi = pts[order]
        widths.append(flank_hi[1] - flank_lo[1])
        bends.append(center[0] - 0.5 * (flank_lo[0] + flank_hi[0]))
    return float(np.mean(widths)), float(np.mean(bends)), len(widths)


def main():
    print("3-member party shape in the walking frame "
          "(bend < 0 = center behind flanks = concave V):")
    for crowd in (False, True):
        tag = "oncoming crowd" if crowd else "free walking  "
        ws, bs = [], []
        for seed in (3, 11, 23, 41, 57):
            w, bend, n = measure(seed, crowd)
            ws.append(w)
            bs.append(bend)
            print(f"  {tag} seed {seed:2d}: width {w:5.2f} m  "
                  f"bend {bend:+6.3f} m  ({n} steps)")
        print(f"  {tag} MEAN    : width {np.mean(ws):5.2f} m  "
              f"bend {np.mean(bs):+6.3f} m  "
              f"(|bend|/width = {abs(np.mean(bs)) / np.mean(ws):.3f})")


if __name__ == "__main__":
    main()
