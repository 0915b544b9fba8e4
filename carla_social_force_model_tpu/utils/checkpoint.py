"""Simulation checkpoint / resume.

The reference has no simulation-state persistence (SURVEY.md section 5);
here the whole rollout carry is a pytree of arrays, so a snapshot is one
npz (content-addressed by step) and resume is exact: a segmented rollout
that checkpoints every K steps produces bit-identical trajectories to an
uninterrupted one (covered by tests).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax

from ..models.state import PedState


def save_state(path: str, state: PedState, step: int) -> str:
    """Snapshot the rollout carry at ``step`` to ``path`` (npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {f"state__{f.name}": np.asarray(getattr(state, f.name))
               for f in dataclasses.fields(PedState)}
    payload["step"] = np.asarray(step, np.int64)
    np.savez_compressed(path, **payload)
    return path


def load_state(path: str):
    """Returns ``(state, step)``."""
    with np.load(path) as data:
        kwargs = {f.name: jax.numpy.asarray(data[f"state__{f.name}"])
                  for f in dataclasses.fields(PedState)}
        step = int(data["step"])
    return PedState(**kwargs), step


def run_segmented(state: PedState, scene, params, cfg, num_steps: int,
                  segment_steps: int, checkpoint_dir: str | None = None,
                  start_step: int = 0, record: bool = True):
    """Rollout in jitted segments with host-side checkpoints in between.

    Returns ``(final_state, stacked_records_or_None)``.  Resume by loading
    the newest checkpoint and passing its step as ``start_step``.
    """
    from ..models.stepper import StepRecord, prepare_scene, rollout
    import jax.numpy as jnp
    import functools

    scene = prepare_scene(scene)

    if getattr(scene, "autopilot", None) is not None:
        raise NotImplementedError(
            "segmented checkpoint/resume does not yet carry reactive "
            "autopilot fleet state across segments")

    @functools.partial(jax.jit, static_argnames=("n",))
    def seg(s, start, n):
        return rollout(s, scene, params, cfg, n, record=record,
                       start_step=start)

    records = []
    step = start_step
    end = start_step + num_steps
    while step < end:
        n = min(segment_steps, end - step)
        state, rec = seg(state, jnp.asarray(step), n)
        # NOTE: start_step is traced; rollout uses jnp.arange(start, start+n)
        if record:
            records.append(jax.tree_util.tree_map(np.asarray, rec))
        step += n
        if checkpoint_dir is not None:
            save_state(os.path.join(checkpoint_dir, f"ckpt_{step:08d}.npz"),
                       state, step)
    if record and records:
        stacked = StepRecord(*[np.concatenate([getattr(r, f) for r in records])
                               for f in StepRecord._fields])
        return state, stacked
    return state, None


def latest_checkpoint(checkpoint_dir: str):
    """Newest ``ckpt_*.npz`` in the directory or None."""
    if not os.path.isdir(checkpoint_dir):
        return None
    files = sorted(f for f in os.listdir(checkpoint_dir)
                   if f.startswith("ckpt_") and f.endswith(".npz"))
    return os.path.join(checkpoint_dir, files[-1]) if files else None
