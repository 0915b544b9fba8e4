"""Synthetic large-N crowd scenarios (benchmarks, scaling studies).

Builds SpawnSchedules directly as arrays (no per-ped Python loop) for
populations far beyond the reference's tens-of-agents scenarios.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models import modes
from ..models.routes import RouteBuffer
from ..models.spawn import SpawnSchedule
from ..models.state import PedState
from ..models.stepper import Scene, StepConfig


def synthetic_crowd(n: int, extent: float = 100.0, speed: float = 1.3,
                    seed: int = 0, radius: float = 0.3,
                    dtype=np.float32) -> SpawnSchedule:
    """N pedestrians spawning at step 0, uniformly placed in a square of
    half-size ``extent``, each walking to the antipodal point (sustained
    counterflow through the center -- a dense interaction workload)."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-extent, extent, (n, 2)).astype(dtype)
    dest = (-pos).astype(dtype)
    direction = dest - pos
    nrm = np.linalg.norm(direction, axis=-1, keepdims=True)
    direction = direction / np.where(nrm == 0, 1, nrm)
    speeds = np.full((n,), speed, dtype) + rng.uniform(-0.2, 0.2, n).astype(dtype)

    routes = RouteBuffer(
        waypoints=jnp.asarray(dest[:, None, :]),
        crossing=jnp.zeros((n, 1), bool),
        count=jnp.ones((n,), jnp.int32),
    )
    return SpawnSchedule(
        step=jnp.zeros((n,), jnp.int32),
        pos=jnp.asarray(pos),
        vel=jnp.asarray(direction * speeds[:, None]),
        speed=jnp.asarray(speeds),
        crossing_speed=jnp.asarray(speeds * 1.5),
        margin=jnp.full((n,), 1.5, dtype),
        radius=jnp.full((n,), radius, dtype),
        initial_mode=jnp.full((n,), modes.WALKING_SIDEWALK, jnp.int32),
        first_waypoint=jnp.asarray(dest),
        routes=routes,
    )


def batched_crowds(batch: int, n: int, extent: float = 35.0, speed: float = 1.3,
                   seed: int = 0, radius: float = 0.3) -> SpawnSchedule:
    """A batch of independent synthetic crowds (leading batch dim on every
    spawn-schedule leaf) for ensemble rollouts."""
    import jax
    schedules = [synthetic_crowd(n, extent=extent, speed=speed,
                                 seed=seed + b, radius=radius)
                 for b in range(batch)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *schedules)


def benchmark_bundle(n: int, extent: float | None = None, seed: int = 0,
                     use_pallas: bool | None = None):
    """(scene, params, cfg, state) for the BASELINE.json headline benchmark:
    acceleration + pedestrian forces, headless, no despawn.

    ``use_pallas=None`` auto-enables the fused kernel on TPU backends.
    """
    import jax
    from ..models.params import SfmParams
    if extent is None:
        # keep density roughly constant (~1 ped / 4 m^2)
        extent = max(25.0, float(np.sqrt(n) * 1.0))
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    schedule = synthetic_crowd(n, extent=extent, seed=seed)
    scene = Scene(spawn=schedule)
    params = SfmParams(enable_acceleration=True, enable_pedestrian=True,
                       enable_border=False, enable_static_obstacle=False,
                       enable_dynamic_obstacle=False)
    cfg = StepConfig(dt=0.05, waypoint_threshold=2.0, despawn_on_arrival=False,
                     use_pallas=use_pallas)
    return scene, params, cfg, PedState.empty(n)
