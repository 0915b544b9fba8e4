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

    vel = direction * speeds[:, None]
    routes = RouteBuffer(
        wp_x=jnp.asarray(dest[:, None, 0]),
        wp_y=jnp.asarray(dest[:, None, 1]),
        crossing=jnp.zeros((n, 1), bool),
        count=jnp.ones((n,), jnp.int32),
    )
    return SpawnSchedule(
        step=jnp.zeros((n,), jnp.int32),
        pos_x=jnp.asarray(pos[:, 0]), pos_y=jnp.asarray(pos[:, 1]),
        vel_x=jnp.asarray(vel[:, 0]), vel_y=jnp.asarray(vel[:, 1]),
        speed=jnp.asarray(speeds),
        crossing_speed=jnp.asarray(speeds * 1.5),
        margin=jnp.full((n,), 1.5, dtype),
        radius=jnp.full((n,), radius, dtype),
        initial_mode=jnp.full((n,), modes.WALKING_SIDEWALK, jnp.int32),
        fwp_x=jnp.asarray(dest[:, 0]), fwp_y=jnp.asarray(dest[:, 1]),
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


def synthetic_borders(extent: float, spacing: float = 20.0,
                      section_length: float = 30.0, resolution: float = 0.1):
    """Street-grid walls across the arena, sampled at the reference's 0.1 m
    border resolution and split into <=30 m sections (the reference's
    section-center/length coarse filter granularity, forces.py:149-151).
    BASELINE config #2's workload shape."""
    from ..env.borders import build_border_set, sample_borderline
    lines, centers, lengths = [], [], []

    def add_wall(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        total = float(np.linalg.norm(b - a))
        n_sec = max(1, int(np.ceil(total / section_length)))
        for k in range(n_sec):
            s = a + (b - a) * (k / n_sec)
            e = a + (b - a) * ((k + 1) / n_sec)
            pts = sample_borderline(s, e, resolution)
            lines.append(pts)
            centers.append((s + e) / 2.0)
            lengths.append(float(np.linalg.norm(e - s)))

    coords = np.arange(-extent, extent + 1e-6, spacing)
    for c in coords:
        add_wall((-extent, c), (extent, c))   # horizontal street wall
        add_wall((c, -extent), (c, extent))   # vertical street wall
    return build_border_set(lines, centers, lengths)


def synthetic_obstacles(extent: float, spacing: float = 15.0,
                        resolution: float = 0.1,
                        perception_threshold: float = 20.0):
    """A grid of parked-car-sized static obstacles (ellipse outlines at the
    reference's sampling, obstacles.py:269-281).  BASELINE config #3's
    static workload shape."""
    from ..env.obstacles_gen import build_obstacle_set
    from ..models.vehicles import ellipse_template
    outlines, centers = [], []
    coords = np.arange(-extent + spacing / 2, extent, spacing)
    tmpl = ellipse_template(2.4, 1.1, resolution)
    for cx in coords:
        for cy in coords:
            outlines.append(tmpl + np.array([cx, cy]))
            centers.append(np.array([cx, cy]))
    return build_obstacle_set(outlines, centers, perception_threshold)


def synthetic_vehicles(extent: float, count: int, dt: float, num_steps: int):
    """Moving vehicles sweeping the arena (dynamic-obstacle workload)."""
    from ..models.vehicles import VehicleSpec, build_vehicle_states
    specs = []
    speed = 8.0
    length = num_steps + 2
    for v in range(count):
        y = -extent + (v + 0.5) * (2 * extent / count)
        xs = -extent + speed * dt * np.arange(length)
        specs.append(VehicleSpec(
            trajectory=np.column_stack([xs, np.full(length, y)]),
            headings=np.zeros(length), speeds=np.full(length, speed)))
    return build_vehicle_states(specs, dt, num_steps)


def benchmark_bundle(n: int, extent: float | None = None, seed: int = 0,
                     use_pallas: bool | None = None,
                     with_borders: bool = False,
                     with_obstacles: bool = False,
                     num_steps_hint: int = 512):
    """(scene, params, cfg, state) for the BASELINE.json benchmarks:

    * default: config #1 -- acceleration + pedestrian forces, headless.
    * ``with_borders``: config #2 -- + border force over a street-grid wall
      point cloud at 0.1 m resolution.
    * ``with_obstacles``: config #3 -- + static (parked-car grid) and
      dynamic (moving vehicles) obstacle forces.

    ``use_pallas=None`` auto-enables the fused kernel on TPU backends.
    """
    import jax
    import jax.numpy as jnp
    from ..models.params import SfmParams
    if extent is None:
        # keep density roughly constant (~1 ped / 4 m^2)
        extent = max(25.0, float(np.sqrt(n) * 1.0))
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    schedule = synthetic_crowd(n, extent=extent, seed=seed)

    borders = synthetic_borders(extent) if with_borders else None
    static_obstacles = synthetic_obstacles(extent) if with_obstacles else None
    static_vel = (jnp.zeros((static_obstacles.num_segments, 2), jnp.float32)
                  if static_obstacles is not None else None)
    vehicles = (synthetic_vehicles(extent, count=8, dt=0.05,
                                   num_steps=num_steps_hint)
                if with_obstacles else None)

    scene = Scene(spawn=schedule, borders=borders,
                  static_obstacles=static_obstacles,
                  static_obstacle_vel=static_vel, vehicles=vehicles)
    params = SfmParams(enable_acceleration=True, enable_pedestrian=True,
                       enable_border=with_borders,
                       enable_static_obstacle=with_obstacles,
                       enable_dynamic_obstacle=with_obstacles)
    cfg = StepConfig(dt=0.05, waypoint_threshold=2.0, despawn_on_arrival=False,
                     use_pallas=use_pallas)
    return scene, params, cfg, PedState.empty(n)
