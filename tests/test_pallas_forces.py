"""Fused Pallas pedestrian-force kernel vs the jnp path (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from carla_social_force_model_tpu.models.params import MoussaidParams
from carla_social_force_model_tpu.ops import forces
from carla_social_force_model_tpu.ops.pallas_forces import pedestrian_force_pallas

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("n,use_radius", [(16, False), (40, True), (130, False)])
def test_pallas_matches_jnp(n, use_radius):
    pos = jnp.asarray(RNG.uniform(-15, 15, (n, 2)), jnp.float32)
    vel = jnp.asarray(RNG.uniform(-2, 2, (n, 2)), jnp.float32)
    radius = jnp.asarray(RNG.uniform(0.2, 0.4, (n,)), jnp.float32)
    alive = jnp.asarray(RNG.uniform(size=n) < 0.8)
    p = MoussaidParams()
    want = forces.pedestrian_force(pos, vel, radius, alive, p,
                                   use_ped_radius=use_radius)
    got = pedestrian_force_pallas(pos, vel, radius, alive, p,
                                  use_ped_radius=use_radius,
                                  row_tile=64, col_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(got)[~np.asarray(alive)] == 0.0)


def test_pallas_sharded_matches_unsharded():
    """Kernel under shard_map (rows sharded, cols gathered) == single-device."""
    import jax
    from jax.sharding import PartitionSpec as P
    from carla_social_force_model_tpu.parallel.mesh import make_mesh

    n = 64
    pos = jnp.asarray(RNG.uniform(-12, 12, (n, 2)), jnp.float32)
    vel = jnp.asarray(RNG.uniform(-2, 2, (n, 2)), jnp.float32)
    radius = jnp.full((n,), 0.3, jnp.float32)
    alive = jnp.asarray(RNG.uniform(size=n) < 0.9)
    p = MoussaidParams()

    want = pedestrian_force_pallas(pos, vel, radius, alive, p,
                                   row_tile=8, col_tile=128, interpret=True)

    mesh = make_mesh(n_agent_shards=8)
    fn = jax.shard_map(
        lambda *a: pedestrian_force_pallas(*a, p, row_tile=8, col_tile=128,
                                           interpret=True,
                                           axis_name="agents"),
        mesh=mesh, in_specs=(P("agents"), P("agents"), P("agents"), P("agents")),
        out_specs=P("agents"), check_vma=False)
    got = jax.jit(fn)(pos, vel, radius, alive)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_coincident_peds_zero():
    pos = jnp.zeros((4, 2), jnp.float32)
    vel = jnp.zeros((4, 2), jnp.float32)
    got = pedestrian_force_pallas(pos, vel, jnp.full((4,), 0.3),
                                  jnp.ones((4,), bool), MoussaidParams(),
                                  row_tile=8, col_tile=128, interpret=True)
    assert np.all(np.asarray(got) == 0.0)
