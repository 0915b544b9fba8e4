"""Command-line entry point (the reference's run_simulation.py CLI surface).

Headless by default: the whole rollout runs on device with no real-time
pacing.  ``--carla-host/--carla-port`` attach the optional CARLA bridge
(bridge/carla_bridge.py) which restores the reference's per-tick sync +
real-time pacing against a live CARLA server.

Flags mirror run_simulation.py:243-268 plus headless extensions
(``--duration``/``--steps``, ``--headless``).
"""
from __future__ import annotations

import argparse
import logging

log = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native Social Force Model simulation")
    p.add_argument("--scenario-config", type=str, required=True,
                   help="scenario configuration file (reference TOML surface)")
    p.add_argument("--sfm-config", type=str, default=None,
                   help="social force model configuration file")
    p.add_argument("--duration", type=float, default=60.0,
                   help="simulated seconds to roll out (headless)")
    p.add_argument("--steps", type=int, default=None,
                   help="number of steps (overrides --duration)")
    p.add_argument("--csv", action="store_true", help="output csv results")
    p.add_argument("--output", type=str, default="output",
                   help="path for output CSV files")
    p.add_argument("--carla", action="store_true",
                   help="attach the CARLA bridge (requires a CARLA server)")
    p.add_argument("--carla-host", default="127.0.0.1")
    p.add_argument("--carla-port", default=2000, type=int)
    p.add_argument("--strict-parity", action="store_true",
                   help="reproduce reference-inert config keys and quirks")
    p.add_argument("--pallas", action="store_true", default=None,
                   help="use the fused Pallas N x N force kernel (TPU)")
    p.add_argument("--cutoff", type=float, default=None, metavar="METERS",
                   help="locality-sorted interaction cutoff (see BENCH.md)")
    p.add_argument("--spatial-order", choices=("morton", "hilbert"),
                   default=None,
                   help="space-filling curve for the cutoff sort")
    p.add_argument("--comm", choices=("gather", "ring", "ring_kernel"),
                   default=None,
                   help="column-state communication under agent-sharding")
    p.add_argument("--exact-div", action="store_true", default=None,
                   help="exact division in the Pallas in-kernel atan2 "
                        "(default: Newton-refined approximate reciprocal)")
    p.add_argument("--vmem-mb", type=int, default=None,
                   help="Mosaic scoped-VMEM limit for the Pallas kernels")
    p.add_argument("--env-compact", action="store_true", default=None,
                   help="compacted env-kernel grid (best for sparse street-"
                        "network borders, see BENCH.md)")
    p.add_argument("--env-analytic", action="store_true", default=None,
                   help="analytic border geometry: closest point ON Douglas-"
                        "Peucker-simplified segments instead of the "
                        "reference's 0.1 m sampled argmin (~10x less border "
                        "work; deviation bounded by the sampling "
                        "quantization, see PARITY.md/BENCH.md)")
    p.add_argument("--pallas-compact", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="compacted pairwise-kernel grid (takes effect with "
                        "--cutoff; default on -- auto-engages above ~33k "
                        "agents, making the cutoff kernel O(N) at fixed "
                        "density, see BENCH.md)")
    p.add_argument("--symmetric", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Newton's-third-law pairwise launch: each unordered "
                        "pair computed once (default on; half the pairwise "
                        "work, f32-summation-order equal; single-device)")
    p.add_argument("--stream", action="store_true",
                   help="stream records to CSV in chunks (bounded memory "
                        "for long rollouts; implies --csv)")
    p.add_argument("--chunk-steps", type=int, default=2400,
                   help="segment length for --stream")
    p.add_argument("--record-stride", type=int, default=1,
                   help="record every k-th tick (--stream)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a JAX profiler trace of the rollout to DIR")
    p.add_argument("--checkpoint-dir", type=str, default=None,
                   help="write state snapshots every --checkpoint-every steps")
    p.add_argument("--checkpoint-every", type=int, default=200)
    p.add_argument("--checkpoint-backend", choices=("npz", "orbax"),
                   default="npz", help="snapshot format (resume reads both)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest checkpoint in --checkpoint-dir")
    p.add_argument("--platform", type=str, default=None, metavar="NAME",
                   help="JAX platform override (e.g. 'cpu'). Also re-applies "
                        "the JAX_PLATFORMS env var when a site config has "
                        "force-set jax_platforms (which beats the env var)")
    p.add_argument("--debug", action="store_true")
    return p


DEFAULT_SFM_CONFIG = {
    "max_speed_multiplier": 1.3,
    "use_ped_radius": False,
    "forces": {"acceleration_force": True, "pedestrian_force": True,
               "border_force": True, "static_obstacle_force": True,
               "dynamic_obstacle_force": True},
}


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.stream and args.checkpoint_dir:
        # the checkpoint path runs the segmented in-memory rollout, which
        # is exactly the unbounded (T, N) record --stream exists to avoid;
        # refuse loudly rather than silently dropping one of the two
        parser.error("--stream and --checkpoint-dir cannot be combined "
                     "(checkpointed rollouts keep records in memory; use "
                     "--record-stride to bound them, or stream without "
                     "checkpoints)")
    logging.basicConfig(format="%(levelname)s: %(message)s",
                        level=logging.DEBUG if args.debug else logging.INFO)

    import os
    platform = args.platform or os.environ.get("JAX_PLATFORMS")
    if platform:
        # a sitecustomize may force jax_platforms via jax.config, which
        # silently beats the env var — re-apply before any backend inits
        import jax
        jax.config.update("jax_platforms", platform)

    sfm_config = args.sfm_config if args.sfm_config else dict(DEFAULT_SFM_CONFIG)

    if args.carla:
        from ..bridge.carla_bridge import run_with_carla
        return run_with_carla(args, sfm_config)

    from .simulation import Simulation
    sim = Simulation.from_config(
        args.scenario_config, sfm_config,
        duration=args.duration, num_steps=args.steps,
        strict_parity=args.strict_parity,
        engine={"use_pallas": args.pallas,
                "interaction_cutoff": args.cutoff,
                "axis_comm": args.comm,
                "pallas_exact_div": args.exact_div,
                "pallas_vmem_mb": args.vmem_mb,
                "spatial_order": args.spatial_order,
                "env_compact": args.env_compact,
                "env_analytic": args.env_analytic,
                "pallas_compact": args.pallas_compact,
                "pallas_symmetric": args.symmetric})

    if args.checkpoint_dir:
        from ..utils.checkpoint import latest_checkpoint, load_state, run_segmented
        b = sim.bundle
        state, start, ap = b.initial_state, 0, None
        if args.resume:
            ckpt = latest_checkpoint(args.checkpoint_dir)
            if ckpt:
                state, start, ap = load_state(ckpt, with_autopilot=True)
                log.info("resuming from %s (step %d)", ckpt, start)
        final, recs = run_segmented(
            state, b.scene, b.params, b.cfg, b.num_steps - start,
            segment_steps=args.checkpoint_every,
            checkpoint_dir=args.checkpoint_dir, start_step=start,
            autopilot_state=ap, backend=args.checkpoint_backend)
        sim.set_results(final, recs)
    elif args.stream:
        out = sim.run_streamed(args.output, chunk_steps=args.chunk_steps,
                               record_stride=args.record_stride)
        log.info("final population: %d alive of %d slots",
                 int(sim.final_state.alive.sum()), sim.bundle.capacity)
        log.info("CSV output written to %s", out)
        return 0
    elif args.profile:
        from ..utils.profiling import trace
        with trace(args.profile):
            sim.run()
    else:
        sim.run()
    alive = int(sim.final_state.alive.sum())
    log.info("final population: %d alive of %d slots", alive,
             sim.bundle.capacity)
    if args.csv:
        out = sim.write_csv(args.output)
        log.info("CSV output written to %s", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
