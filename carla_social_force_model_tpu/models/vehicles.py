"""Headless vehicle model: scripted trajectories as dense rollout arrays.

The reference's scripted vehicles are teleported to the next trajectory
point each tick with a target velocity along their heading
(run_simulation.py:56-67, carla_simulation.py:107-111); their state is read
back every tick as "dynamic obstacles" with a regenerated ellipse outline
(obstacles.py:297-329).  Headless, the whole trajectory is precomputable:
``(T, V)`` state arrays indexed by the scan step, and a static per-vehicle
local ellipse template rotated+translated on device each tick.

Reference timing contract replicated exactly: a vehicle spawned at step s
with trajectory/headings/speeds lists appears to the pedestrian simulation at
position ``trajectory[1+j]``, heading ``headings[1+j]``, speed
``speeds[1+j]`` on step ``s+j`` (the spawn transform consumes index 0 and the
same-tick teleport consumes index 1; speeds[0] is never used,
vehicle_spawner.py:164 stores ``speeds[1:]``), and despawns when the list is
exhausted.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field
from ..env.pointsets import ChunkedPointSet, PAD_COORD
from .spawn import realized_spawn_steps


@dataclass
class VehicleSpec:
    """Host-side description of one scripted ``[[vehicle.vehicle_spawner]]``."""

    trajectory: np.ndarray        # (L, 2) teleport points (index 0 = spawn)
    headings: np.ndarray          # (L,) radians (reference config convention)
    speeds: np.ndarray            # (L,) speeds; speeds[0] unused
    extent: tuple[float, float] = (2.4, 1.1)  # bbox half-extents (x, y)
    spawn_time: float = 0.0
    spawn_interval: float = 5.0
    quantity: int = 1             # reference shares popped lists; keep 1


def trajectory_from_waypoints(waypoints, speed: float, dt: float):
    """Expand a sparse waypoint polyline into per-tick teleport arrays.

    Headless authoring sugar: instead of hand-writing a per-tick
    ``trajectory`` list (the reference's scripted format), give waypoints +
    a constant speed; positions are interpolated at ``speed*dt`` spacing and
    headings follow the segment directions.  Returns
    ``(trajectory (L,2), headings (L,), speeds (L,))`` in the reference's
    scripted-vehicle format.
    """
    wps = np.asarray(waypoints, np.float64).reshape(-1, 2)
    pts = [wps[0]]
    heads = []
    step = speed * dt
    for a, b in zip(wps[:-1], wps[1:]):
        seg = b - a
        dist = float(np.linalg.norm(seg))
        if dist == 0.0:
            continue
        heading = float(np.arctan2(seg[1], seg[0]))
        n_steps = max(1, int(round(dist / step)))
        for k in range(1, n_steps + 1):
            pts.append(a + seg * (k / n_steps))
            heads.append(heading)
    trajectory = np.asarray(pts)
    headings = np.asarray([heads[0]] + heads if heads else [0.0])
    speeds = np.full(len(trajectory), speed)
    return trajectory, headings, speeds


def ellipse_template(extent_x: float, extent_y: float, resolution: float,
                     size_factor: float = float(np.sqrt(2.0))) -> np.ndarray:
    """Local-frame ellipse outline points (reference obstacles.py:269-281)."""
    circumference = 2.0 * extent_x + 2.0 * extent_y
    samples = max(6, int(circumference / resolution))
    theta = 2.0 * np.pi * np.arange(samples) / samples
    return np.stack([extent_x * np.cos(theta) * size_factor,
                     extent_y * np.sin(theta) * size_factor], axis=-1)


@pytree_dataclass
class VehicleStates:
    """Dense scripted-vehicle rollout state, shaped for ``lax.scan``."""

    pos: jnp.ndarray        # (T, V, 2)
    heading: jnp.ndarray    # (T, V) radians
    vel: jnp.ndarray        # (T, V, 2)
    active: jnp.ndarray     # (T, V) bool
    extent: jnp.ndarray     # (V, 2)
    template: jnp.ndarray   # (V, P, 2) local outline, padded
    template_valid: jnp.ndarray  # (V, P) bool
    points_per_chunk: int = static_field(default=128)

    @property
    def num_vehicles(self) -> int:
        return self.extent.shape[0]

    @property
    def num_steps(self) -> int:
        return self.pos.shape[0]


def build_vehicle_states(specs: Sequence[VehicleSpec], dt: float,
                         num_steps: int, resolution: float = 0.1,
                         points_per_chunk: int = 128,
                         dtype=np.float32) -> VehicleStates | None:
    """Expand scripted vehicle specs into dense per-step arrays."""
    rows = []  # (spawn_step, spec)
    for spec in specs:
        for s in realized_spawn_steps(spec.spawn_time, spec.spawn_interval,
                                      min(spec.quantity, 1), dt, num_steps):
            rows.append((s, spec))
    if not rows:
        return None

    v = len(rows)
    pos = np.zeros((num_steps, v, 2), dtype)
    heading = np.zeros((num_steps, v), dtype)
    vel = np.zeros((num_steps, v, 2), dtype)
    active = np.zeros((num_steps, v), bool)
    extent = np.zeros((v, 2), dtype)
    templates = []
    for vi, (s, spec) in enumerate(rows):
        traj = np.asarray(spec.trajectory, dtype).reshape(-1, 2)
        heads = np.asarray(spec.headings, dtype).reshape(-1)
        spds = np.asarray(spec.speeds, dtype).reshape(-1)
        length = min(len(traj), len(heads), len(spds))
        extent[vi] = spec.extent
        templates.append(ellipse_template(spec.extent[0], spec.extent[1], resolution))
        # visible from index 1 (spawn consumed index 0, same-tick teleport -> 1)
        for j in range(length - 1):
            t = s + j
            if t >= num_steps:
                break
            idx = 1 + j
            pos[t, vi] = traj[idx]
            heading[t, vi] = heads[idx]
            vel[t, vi] = spds[idx] * np.array(
                [np.cos(heads[idx]), np.sin(heads[idx])], dtype)
            active[t, vi] = True

    p_raw = max(len(t) for t in templates)
    p = -(-p_raw // points_per_chunk) * points_per_chunk
    template = np.full((v, p, 2), PAD_COORD, dtype)
    template_valid = np.zeros((v, p), bool)
    for vi, t in enumerate(templates):
        template[vi, : len(t)] = t
        template_valid[vi, : len(t)] = True

    return VehicleStates(
        pos=jnp.asarray(pos), heading=jnp.asarray(heading),
        vel=jnp.asarray(vel), active=jnp.asarray(active),
        extent=jnp.asarray(extent), template=jnp.asarray(template),
        template_valid=jnp.asarray(template_valid),
        points_per_chunk=points_per_chunk,
    )


@pytree_dataclass
class VehicleSnapshot:
    """Per-tick vehicle state, source-agnostic (scan timeline or CARLA
    readback).  Gap acceptance and the dynamic-obstacle force consume this."""

    center: jnp.ndarray         # (V, 2)
    vel: jnp.ndarray            # (V, 2)
    heading: jnp.ndarray        # (V,)
    extent: jnp.ndarray         # (V, 2)
    active: jnp.ndarray         # (V,)
    template: jnp.ndarray       # (V, P, 2)
    template_valid: jnp.ndarray  # (V, P)
    points_per_chunk: int = static_field(default=128)


def vehicle_snapshot_at(vehicles: VehicleStates, t_idx) -> VehicleSnapshot:
    """Slice the scripted timeline at scan step ``t_idx`` (traced index)."""
    return VehicleSnapshot(
        center=vehicles.pos[t_idx], vel=vehicles.vel[t_idx],
        heading=vehicles.heading[t_idx], extent=vehicles.extent,
        active=vehicles.active[t_idx], template=vehicles.template,
        template_valid=vehicles.template_valid,
        points_per_chunk=vehicles.points_per_chunk)


def snapshot_segment_pointset(snap: VehicleSnapshot, perception_threshold):
    """Segment-major dynamic-obstacle point set from a snapshot (on device).

    One row per vehicle (the template is already padded to a multiple of
    128), for the fused environment-force kernel (ops/pallas_env.py).
    Returns ``(SegmentPointSet, obstacle_vel (V, 2), active (V,))``.
    """
    from ..env.pointsets import SegmentPointSet

    c, s = jnp.cos(snap.heading), jnp.sin(snap.heading)
    tx = jnp.where(snap.template_valid, snap.template[..., 0], 0.0)  # (V, P)
    ty = jnp.where(snap.template_valid, snap.template[..., 1], 0.0)
    wx = c[:, None] * tx - s[:, None] * ty + snap.center[:, None, 0]
    wy = s[:, None] * tx + c[:, None] * ty + snap.center[:, None, 1]
    world = jnp.stack([wx, wy], axis=-1)                            # (V, P, 2)
    world = jnp.where(snap.template_valid[..., None], world, PAD_COORD)

    v = world.shape[0]
    pset = SegmentPointSet(
        points=world, centers=snap.center,
        filter_radius=jnp.full((v,), perception_threshold, world.dtype),
        num_segments=v,
    )
    return pset, snap.vel, snap.active


def snapshot_pointset(snap: VehicleSnapshot, perception_threshold):
    """Dynamic-obstacle ChunkedPointSet from a snapshot (on device).

    World outline = R(heading) @ template + center, the headless equivalent
    of regenerating the CARLA ellipse border each tick (obstacles.py:297-329).
    Returns ``(pointset, obstacle_vel (V,2), active (V,))``.
    """
    c, s = jnp.cos(snap.heading), jnp.sin(snap.heading)
    tx, ty = snap.template[..., 0], snap.template[..., 1]           # (V, P)
    wx = c[:, None] * tx - s[:, None] * ty + snap.center[:, None, 0]
    wy = s[:, None] * tx + c[:, None] * ty + snap.center[:, None, 1]
    world = jnp.stack([wx, wy], axis=-1)                            # (V, P, 2)

    v, p, _ = world.shape
    k = snap.points_per_chunk
    n_chunks_per_v = p // k
    points = world.reshape(v * n_chunks_per_v, k, 2)
    valid = (snap.template_valid & snap.active[:, None]).reshape(
        v * n_chunks_per_v, k)
    chunk_segment = jnp.repeat(
        jnp.arange(v, dtype=jnp.int32), n_chunks_per_v,
        total_repeat_length=v * n_chunks_per_v)

    pset = ChunkedPointSet(
        points=points, valid=valid, chunk_segment=chunk_segment,
        centers=snap.center,
        filter_radius=jnp.full((v,), perception_threshold, world.dtype),
        num_segments=v,
    )
    return pset, snap.vel, snap.active
