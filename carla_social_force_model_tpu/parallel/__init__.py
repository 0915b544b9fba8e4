"""Device meshes, agent-sharding, batched sweeps."""

from .mesh import AGENT_AXIS, BATCH_AXIS, make_mesh  # noqa: F401

__all__ = ["AGENT_AXIS", "BATCH_AXIS", "make_mesh"]
