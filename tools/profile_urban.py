"""Ablation profile of the urban config (#4): which stage is the wall?

Times the full urban rollout with individual pipeline stages disabled;
the delta to the full run attributes cost per stage.  One JSON line per
ablation.  Usage: python tools/profile_urban.py [n] [steps] [cutoff]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cutoff = float(sys.argv[3]) if len(sys.argv) > 3 else None

    import numpy as np
    from carla_social_force_model_tpu.api.synthetic import urban_bundle
    from carla_social_force_model_tpu.models.stepper import make_rollout_fn

    scene, params, cfg, state = urban_bundle(n, num_steps_hint=steps)
    if cutoff:
        cfg = dataclasses.replace(cfg, interaction_cutoff=cutoff)
    if os.environ.get("PROF_ENV_ANALYTIC", "") not in ("", "0"):
        cfg = dataclasses.replace(cfg, env_analytic=True)

    def timed(scene_, params_, cfg_, label):
        run = make_rollout_fn(scene_, params_, cfg_, steps, record=False)

        def once():
            final, _ = run(state)
            final = final[0] if isinstance(final, tuple) else final
            return float(np.asarray(final.pos_x).sum())

        once()
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            once()
            best = min(best, time.perf_counter() - t0)
        ms = best / steps * 1e3
        print(json.dumps({"what": "urban_ablation", "label": label, "n": n,
                          "cutoff": cutoff, "ms_per_step": round(ms, 3),
                          "agent_steps_per_s": round(n / (ms / 1e3), 1)}),
              flush=True)
        return ms

    full = timed(scene, params, cfg, "full")
    timed(scene, dataclasses.replace(params, enable_border=False), cfg,
          "no_border_force")
    timed(scene, dataclasses.replace(params, enable_pedestrian=False), cfg,
          "no_pedestrian_force")
    timed(scene, dataclasses.replace(params, enable_dynamic_obstacle=False),
          cfg, "no_dynamic_obstacle_force")
    timed(dataclasses.replace(scene, autopilot=None, vehicles=None),
          dataclasses.replace(params, enable_dynamic_obstacle=False), cfg,
          "no_vehicles_at_all")
    # record=False baseline with every optional force off: the residual is
    # spawn + FSM + gap + waypoint + integrate (the non-force pipeline)
    timed(dataclasses.replace(scene, autopilot=None, vehicles=None),
          dataclasses.replace(params, enable_pedestrian=False,
                              enable_border=False,
                              enable_dynamic_obstacle=False),
          cfg, "pipeline_only")
    print(json.dumps({"what": "urban_ablation", "label": "full_ms",
                      "ms_per_step": round(full, 3)}))


if __name__ == "__main__":
    main()
