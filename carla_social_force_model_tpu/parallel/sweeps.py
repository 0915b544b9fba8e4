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
            if f.metadata.get("static", False):
                # static metadata (e.g. OrcaParams.max_neighbors) is not a
                # pytree leaf: it must stay unbatched (and unsweepable)
                continue
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
        powerlaw=expand(params.powerlaw, "powerlaw"),
        group=expand(params.group, "group"),
        orca=expand(params.orca, "orca"),
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
    scene_prepared = prepare_scene(scene_batch, analytic=cfg.env_analytic,
                                   orca=params.enable_orca)
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


def make_sharded_ensemble_rollout(mesh, scene_batch: Scene, params: SfmParams,
                                  cfg: StepConfig, num_steps: int,
                                  record: bool = False):
    """Composed 2D parallelism over a ``(batch, agents)`` mesh.

    Independent rollouts are data-parallel over the ``batch`` axis while each
    rollout's pedestrian slots shard over the ``agents`` axis — the dp x tp
    composition: B rollouts of N agents run on B_shards x A_shards devices,
    and the N x N force's collectives (gather or ppermute ring, per
    ``cfg.axis_comm``) are scoped to the ``agents`` axis so they never cross
    batch rows.  Geometry is replicated; only spawn schedules carry the
    batch dimension (``scene_batch.spawn`` leaves lead with B).

    B must divide evenly over the mesh's batch axis; slot capacity is padded
    to a multiple of the agents axis (padding slots never spawn).
    """
    from ..models.stepper import prepare_scene
    from .mesh import AGENT_AXIS

    n_batch = mesh.shape[BATCH_AXIS]
    n_agents = mesh.shape[AGENT_AXIS]
    scene_prepared = prepare_scene(scene_batch, analytic=cfg.env_analytic,
                                   orca=params.enable_orca)
    b = scene_prepared.spawn.pos_x.shape[0]
    if b % n_batch:
        raise ValueError(f"ensemble batch {b} must divide over the mesh's "
                         f"{n_batch}-way batch axis")

    # pad the slot axis (axis 1 of every spawn leaf) to the agents axis
    cap = scene_prepared.spawn.pos_x.shape[1]
    new_cap = -(-cap // n_agents) * n_agents
    if new_cap != cap:
        def pad1(leaf):
            widths = [(0, 0)] * leaf.ndim
            widths[1] = (0, new_cap - cap)
            return jnp.pad(leaf, widths)
        spawn = jax.tree_util.tree_map(pad1, scene_prepared.spawn)
        spawn = dataclasses.replace(
            spawn, step=spawn.step.at[:, cap:].set(-1))
        scene_prepared = dataclasses.replace(scene_prepared, spawn=spawn)

    state_spec = jax.tree_util.tree_map(lambda _: P(BATCH_AXIS, AGENT_AXIS),
                                        PedState.empty(1))
    scene_spec = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: P(), scene_prepared),
        spawn=jax.tree_util.tree_map(lambda _: P(BATCH_AXIS, AGENT_AXIS),
                                     scene_prepared.spawn))

    def body(state_blk, scn):
        def one(state_row, spawn_row):
            return rollout(state_row,
                           dataclasses.replace(scn, spawn=spawn_row),
                           params, cfg, num_steps, record=record,
                           axis_name=AGENT_AXIS)
        return jax.vmap(one)(state_blk, scn.spawn)

    if record:
        from ..models.stepper import StepRecord
        rec_spec = StepRecord(pos=P(BATCH_AXIS, None, AGENT_AXIS),
                              vel=P(BATCH_AXIS, None, AGENT_AXIS),
                              mode=P(BATCH_AXIS, None, AGENT_AXIS),
                              alive=P(BATCH_AXIS, None, AGENT_AXIS))
        if scene_prepared.autopilot is not None:
            from ..models.autopilot import AutopilotRecord
            rec_spec = (rec_spec, AutopilotRecord(
                pos=P(BATCH_AXIS), heading=P(BATCH_AXIS),
                speed=P(BATCH_AXIS), active=P(BATCH_AXIS)))
        out_specs = (state_spec, rec_spec)
    else:
        out_specs = (state_spec, None)

    shard_fn = jax.shard_map(body, mesh=mesh,
                             in_specs=(state_spec, scene_spec),
                             out_specs=out_specs, check_vma=False)
    empty = PedState.empty(new_cap)

    @jax.jit
    def run():
        state0 = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf[None], (b,) + leaf.shape),
            empty)
        return shard_fn(state0, scene_prepared)

    return run


def make_sweep_rollout(scene: Scene, cfg: StepConfig, num_steps: int,
                       record: bool = False, mesh=None, orca: bool = False):
    """vmap the rollout over a batched SfmParams pytree.

    With ``mesh`` given, the parameter batch (and the result) is sharded over
    the ``batch`` axis -- data parallelism over independent rollouts.
    ``orca``: pass the (static) ``enable_orca`` of the swept params so the
    scene preparation builds the ORCA static-feature splits.
    """

    from ..models.stepper import prepare_scene
    scene = prepare_scene(scene, analytic=cfg.env_analytic, orca=orca)

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
