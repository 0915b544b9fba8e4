"""Compute kernels (jnp + Pallas)."""

from . import forces, geometry, vecmath  # noqa: F401

__all__ = ["forces", "geometry", "vecmath"]
