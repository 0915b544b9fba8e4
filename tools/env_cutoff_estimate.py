"""Estimate the surviving-tile reduction of an f32-exact border cutoff.

The reference's border section filter keeps any segment whose CENTER is
within section_length (~30 m) of the pedestrian (forces.py:148-151); the
fused env kernels (ops/pallas_env.py) therefore run every (ped-tile,
point-tile) pair some segment's filter circle touches.  But the border
magnitude a*exp(-d/b) with b = 0.1 underflows to exactly +0 in f32 beyond
d = 110*b = 11 m, so a tile-skip on the SEGMENT POINT BBOX inflated by
11 m is bit-exact and strictly tighter.  This tool counts surviving
(ped-tile, seg-tile) pairs under both tests on the bench geometries to
decide whether the kernel change is worth it.

Usage: JAX_PLATFORMS=cpu python tools/env_cutoff_estimate.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from carla_social_force_model_tpu.env.pointsets import (  # noqa: E402
    PAD_COORD, segment_major)
from carla_social_force_model_tpu.ops.pallas_env import (  # noqa: E402
    _round_up, _stage_lane, _tile_hits)
from carla_social_force_model_tpu.ops.pallas_forces import _SENTINEL  # noqa: E402
from carla_social_force_model_tpu.ops.spatial import (  # noqa: E402
    morton_sort, tile_bboxes)


def survivors(name, scene_borders, pos, alive, tc=512, point_tile=1024,
              cutoff=11.0):
    sset = segment_major(scene_borders)
    s, kk = sset.num_segments, sset.points_per_segment
    gs = max(1, point_tile // kk)
    s_pad = _round_up(s, gs)
    n = pos.shape[0]
    n_pad = _round_up(max(n, tc), tc)

    (spx, spy, salive), _ = morton_sort(
        (pos[:, 0], pos[:, 1]), alive, (pos[:, 0], pos[:, 1], alive),
        order="hilbert")
    px = _stage_lane(spx, _SENTINEL, salive, n_pad)
    py = _stage_lane(spy, _SENTINEL, salive, n_pad)
    alive_pad = jnp.zeros((n_pad,), bool).at[:n].set(salive)
    bb = tile_bboxes(px, py, alive_pad, tc).T

    # current test: per-segment filter circles
    cx = jnp.full((s_pad,), PAD_COORD, jnp.float32).at[:s].set(
        sset.centers[:, 0])
    cy = jnp.full((s_pad,), PAD_COORD, jnp.float32).at[:s].set(
        sset.centers[:, 1])
    r2 = jnp.full((s_pad,), -1.0, jnp.float32).at[:s].set(
        jnp.maximum(sset.filter_radius, 0.0) ** 2)
    circ = jnp.stack([cx, cy, r2])
    hits_circ = np.asarray(_tile_hits(bb, circ, gs, s_pad // gs))

    # proposed: circle AND (segment point bbox + cutoff)
    ptsx, ptsy = sset.points[..., 0], sset.points[..., 1]   # (S, K)
    valid = ptsx < 1e7
    seg_minx = jnp.where(valid, ptsx, np.inf).min(axis=1)
    seg_maxx = jnp.where(valid, ptsx, -np.inf).max(axis=1)
    seg_miny = jnp.where(valid, ptsy, np.inf).min(axis=1)
    seg_maxy = jnp.where(valid, ptsy, -np.inf).max(axis=1)

    def pad(a, fill):
        return jnp.full((s_pad,), fill, jnp.float32).at[:s].set(a)

    sminx, smaxx = pad(seg_minx, np.inf), pad(seg_maxx, -np.inf)
    sminy, smaxy = pad(seg_miny, np.inf), pad(seg_maxy, -np.inf)
    minx, maxx, miny, maxy = bb[0], bb[1], bb[2], bb[3]
    gx = jnp.maximum(jnp.maximum(sminx[None, :] - maxx[:, None],
                                 minx[:, None] - smaxx[None, :]), 0.0)
    gy = jnp.maximum(jnp.maximum(sminy[None, :] - maxy[:, None],
                                 miny[:, None] - smaxy[None, :]), 0.0)
    near = gx * gx + gy * gy <= cutoff * cutoff                # (J, s_pad)
    j = near.shape[0]
    hit_seg_c = np.asarray(near.reshape(j, s_pad // gs, gs))
    hits_both = hits_circ & hit_seg_c.any(axis=2)

    tot = hits_circ.size
    print(f"{name}: tiles {hits_circ.shape}, surviving circle-only "
          f"{hits_circ.sum()}/{tot} ({100 * hits_circ.mean():.1f}%), "
          f"+bbox{cutoff:g}m {hits_both.sum()}/{tot} "
          f"({100 * hits_both.mean():.1f}%), reduction "
          f"{1 - hits_both.sum() / max(1, hits_circ.sum()):.1%}",
          flush=True)


def main():
    n = int(os.environ.get("EST_N", 10_000))
    # config #2: uniform crowd over a walled street grid
    from carla_social_force_model_tpu.api.synthetic import (benchmark_bundle,
                                                            urban_bundle)
    scene, params, cfg, state = benchmark_bundle(n, with_borders=True,
                                                 use_pallas=False)
    # spawn positions are representative (peds fill the arena uniformly)
    sx = np.asarray(scene.spawn.pos_x)[:n]
    sy = np.asarray(scene.spawn.pos_y)[:n]
    pos = jnp.asarray(np.column_stack([sx, sy]), jnp.float32)
    alive = jnp.ones((n,), bool)
    survivors("config#2 borders", scene.borders, pos, alive)

    # config #4: routed urban grid (peds on sidewalks/crossings)
    scene_u, _, _, _ = urban_bundle(n, use_pallas=False)
    sx = np.asarray(scene_u.spawn.pos_x)[:n]
    sy = np.asarray(scene_u.spawn.pos_y)[:n]
    pos_u = jnp.asarray(np.column_stack([sx, sy]), jnp.float32)
    survivors("config#4 urban", scene_u.borders, pos_u, alive)


if __name__ == "__main__":
    main()
