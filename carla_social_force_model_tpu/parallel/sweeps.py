"""Batched scenario sweeps: vmap over rollouts, data-parallel over devices.

The reference runs one real-time scenario per process; here thousands of
independent rollouts (parameter sweeps, seed ensembles) batch with ``vmap``
and shard over the ``batch`` mesh axis (pure data parallelism -- no
cross-rollout communication).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.params import SfmParams
from ..models.state import PedState
from ..models.stepper import Scene, StepConfig, rollout
from .mesh import BATCH_AXIS


def batch_params(params: SfmParams, **leaf_batches) -> SfmParams:
    """Broadcast selected numeric parameter leaves to a batch.

    Example::

        swept = batch_params(params, pedestrian_A=jnp.linspace(2, 8, 256))

    names are ``<section>_<field>`` (e.g. ``pedestrian_A``, ``border_b``,
    ``acceleration_tau``).  All named leaves must share the batch size; the
    rest broadcast.
    """
    sizes = {jnp.asarray(v).shape[0] for v in leaf_batches.values()}
    if len(sizes) != 1:
        raise ValueError(f"inconsistent sweep batch sizes: {sizes}")
    (b,) = sizes

    def expand(section_params, section_name):
        updates = {}
        for f in dataclasses.fields(section_params):
            key = f"{section_name}_{f.name}".rstrip("_")
            if key in leaf_batches:
                updates[f.name] = jnp.asarray(leaf_batches.pop(key), jnp.float32)
            else:
                updates[f.name] = jnp.broadcast_to(
                    jnp.asarray(getattr(section_params, f.name), jnp.float32), (b,))
        return dataclasses.replace(section_params, **updates)

    new = dataclasses.replace(
        params,
        acceleration=expand(params.acceleration, "acceleration"),
        pedestrian=expand(params.pedestrian, "pedestrian"),
        border=expand(params.border, "border"),
        static_obstacle=expand(params.static_obstacle, "static_obstacle"),
        dynamic_obstacle=expand(params.dynamic_obstacle, "dynamic_obstacle"),
        ped_repulsive=expand(params.ped_repulsive, "ped_repulsive"),
        space_repulsive=expand(params.space_repulsive, "space_repulsive"),
        max_speed_factor=jnp.broadcast_to(
            jnp.asarray(leaf_batches.pop("max_speed_factor",
                                         params.max_speed_factor), jnp.float32),
            (b,)),
    )
    if leaf_batches:
        raise ValueError(f"unknown sweep parameters: {sorted(leaf_batches)}")
    return new


def make_ensemble_rollout(scene_batch: Scene, params: SfmParams,
                          cfg: StepConfig, num_steps: int,
                          record: bool = False, mesh=None):
    """vmap the rollout over a batch of scenarios (batched spawn schedules,
    shared geometry, shared params) -- BASELINE.json config #5's shape:
    hundreds of independent rollouts of 1k+ pedestrians in one launch.

    ``scene_batch.spawn`` leaves carry a leading batch dim; geometry
    (borders/obstacles/vehicles) is unbatched and broadcast.  Params stay
    concrete, so the fused Pallas kernel is eligible under the vmap.

    The returned function accepts either a Scene (only its ``spawn`` batch is
    read -- the *prepared* geometry closed over here is what runs, so the
    caller's pytree never has to match the prepared layout) or a bare
    SpawnSchedule batch.
    """
    from ..models.spawn import SpawnSchedule
    from ..models.stepper import prepare_scene
    scene_prepared = prepare_scene(scene_batch)
    spawn_axes = jax.tree_util.tree_map(lambda _: 0, scene_prepared.spawn)
    scene_axes = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: None, scene_prepared),
        spawn=spawn_axes)
    capacity = scene_prepared.spawn.pos_x.shape[1]

    def one(scene_row: Scene):
        state = PedState.empty(capacity)
        return rollout(state, scene_row, params, cfg, num_steps, record=record)

    batched = jax.vmap(one, in_axes=(scene_axes,))

    @jax.jit
    def run(scenes):
        spawn = scenes if isinstance(scenes, SpawnSchedule) else scenes.spawn
        if mesh is not None:
            spawn = jax.lax.with_sharding_constraint(
                spawn,
                jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P(BATCH_AXIS)), spawn))
        return batched(dataclasses.replace(scene_prepared, spawn=spawn))

    return run


def make_sweep_rollout(scene: Scene, cfg: StepConfig, num_steps: int,
                       record: bool = False, mesh=None):
    """vmap the rollout over a batched SfmParams pytree.

    With ``mesh`` given, the parameter batch (and the result) is sharded over
    the ``batch`` axis -- data parallelism over independent rollouts.
    """

    from ..models.stepper import prepare_scene
    scene = prepare_scene(scene)

    def one(params_row: SfmParams):
        state = PedState.empty(scene.spawn.capacity)
        return rollout(state, scene, params_row, cfg, num_steps, record=record)

    batched = jax.vmap(one)

    if mesh is None:
        return jax.jit(batched)

    def shard_leaf(leaf):
        return NamedSharding(mesh, P(BATCH_AXIS) if jnp.ndim(leaf) >= 1 else P())

    @jax.jit
    def run(params_batch: SfmParams):
        params_batch = jax.lax.with_sharding_constraint(
            params_batch,
            jax.tree_util.tree_map(shard_leaf, params_batch))
        return batched(params_batch)

    return run
