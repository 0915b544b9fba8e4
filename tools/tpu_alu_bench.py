"""Measure the ALU-transcendental kernel knobs (alu_exp / alu_recip) on the
real chip.

The fused pairwise kernel sits at ~90% of the v5e's transcendental-port
(EUP) floor of 5 ops/pair (BENCH.md); these knobs move the 2 exp ops and/or
the atan2 reciprocal onto the regular VPU ALUs (ops/pallas_forces.py
_exp_alu/_recip_alu), which co-issue with EUP work.  Whether that wins
depends on the ALU:EUP throughput ratio -- measured here, not guessed.

One JSON line per config; whole-``lax.scan`` rollouts of the force op only
(eager per-call dispatch costs ~1 ms/call through the axon runtime).

Usage: python tools/tpu_alu_bench.py <n> [steps] [cutoff]
  env: ALU_EXP=0/1 ALU_RECIP=0/1 TILES=<tr>x<tc>
(subprocess-per-config recommended; see CLAUDE.md TPU gotchas)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cutoff = float(sys.argv[3]) if len(sys.argv) > 3 else None
    alu_exp = os.environ.get("ALU_EXP", "0") == "1"
    alu_recip = os.environ.get("ALU_RECIP", "0") == "1"
    sym = os.environ.get("SYM", "0") == "1"
    compact = os.environ.get("COMPACT", "0") == "1"
    tr, tc = (int(v) for v in os.environ.get("TILES", "192x512").split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from carla_social_force_model_tpu.models.params import MoussaidParams
    from carla_social_force_model_tpu.ops.pallas_forces import (
        pedestrian_force_pallas, pedestrian_force_pallas_sorted)

    rng = np.random.default_rng(0)
    side = max(10.0, (n / 0.4) ** 0.5)
    px = jnp.asarray(rng.uniform(0, side, n), jnp.float32)
    py = jnp.asarray(rng.uniform(0, side, n), jnp.float32)
    vx = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    vy = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    rad = jnp.full((n,), 0.3, jnp.float32)
    alive = jnp.ones((n,), bool)
    p = MoussaidParams()
    kw = dict(row_tile=tr, col_tile=tc, planar_out=True,
              alu_exp=alu_exp, alu_recip=alu_recip, symmetric=sym,
              compact=compact)

    @jax.jit
    def run(px, py, vx, vy):
        def body(c, _):
            cpx, cpy = c
            if cutoff is None:
                fx, fy = pedestrian_force_pallas(
                    (cpx, cpy), (vx, vy), rad, alive, p, **kw)
            else:
                fx, fy = pedestrian_force_pallas_sorted(
                    (cpx, cpy), (vx, vy), rad, alive, p, cutoff=cutoff, **kw)
            # feed forces back so no step can be CSE'd/elided
            return (cpx + 1e-6 * fx, cpy + 1e-6 * fy), None
        c, _ = jax.lax.scan(body, (px, py), None, length=steps)
        return c

    out = run(px, py, vx, vy)
    float(np.asarray(out[0]).sum())  # force transfer (see CLAUDE.md)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(px, py, vx, vy)
        float(np.asarray(out[0]).sum())
        best = min(best, time.perf_counter() - t0)
    ms = best / steps * 1e3
    print(json.dumps({
        "what": "alu_kernel", "n": n, "steps": steps, "cutoff": cutoff,
        "tiles": f"{tr}x{tc}", "alu_exp": alu_exp, "alu_recip": alu_recip,
        "sym": sym, "compact": compact,
        "ms_per_step": round(ms, 4),
        "agent_steps_per_s": round(n / (ms / 1e3), 1)}))


if __name__ == "__main__":
    main()
