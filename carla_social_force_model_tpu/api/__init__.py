"""User-facing API: scenarios, Simulation facade, CLI, synthetic crowds."""

from .simulation import Simulation  # noqa: F401

__all__ = ["Simulation"]
