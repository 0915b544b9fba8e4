"""Float64 numpy oracles for the ORCA law (ops/orca.py).

Independent derivations (no shared code with the implementation):

* :func:`vo_closest_boundary` finds the closest point on the truncated
  velocity obstacle's boundary by DENSE SAMPLING of the boundary features
  (truncation arc + tangent leg rays), with true-boundary filtering and
  membership tested by the exact quadratic-in-t collision condition -- no
  cone/arc case analysis at all, so it cannot share a case-selection bug
  with the implementation.
* :func:`lp_grid` solves the projection LP and the minimax fallback by
  brute-force grid search over the speed disc.
"""
from __future__ import annotations

import numpy as np


def in_vo_many(W, p, r, tau):
    """Exact membership of relative velocities ``W`` (M, 2) in the closed
    VO^tau: the gap ``p - t*w`` closes to <= r for some t in (0, tau].
    Quadratic in t: |w|^2 t^2 - 2 (p.w) t + |p|^2 - r^2 <= 0."""
    W = np.asarray(W, float)
    p = np.asarray(p, float)
    a = (W * W).sum(axis=1)
    b = -2.0 * (W @ p)
    c = float(p @ p) - r * r
    if c <= 0.0:
        return np.ones(len(W), bool)  # already colliding
    disc = b * b - 4.0 * a * c
    ok = (disc >= 0.0) & (a > 0.0)
    sa = np.where(a > 0.0, a, 1.0)
    sq = np.sqrt(np.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * sa)
    t2 = (-b + sq) / (2.0 * sa)
    return ok & (t1 <= tau) & (t2 > 0.0)


def in_vo(w, p, r, tau):
    return bool(in_vo_many(np.asarray(w, float)[None, :], p, r, tau)[0])


def vo_closest_boundary(p, rv, r, tau, dt, n_arc=4096, n_leg=8192,
                        leg_extent=60.0):
    """Closest point on the boundary of the (truncated) velocity obstacle
    to the relative velocity ``rv``, by dense boundary sampling.

    Returns ``(u, n)``: the displacement from ``rv`` to the closest
    boundary point, and the obstacle's outward unit normal there.
    """
    p = np.asarray(p, float)
    rv = np.asarray(rv, float)
    d = np.linalg.norm(p)
    if d <= r:
        # colliding: the obstacle is the disc D(p/dt, r/dt)
        c = p / dt
        rho = r / dt
        w = rv - c
        wl = np.linalg.norm(w)
        uw = w / wl if wl > 0 else np.array([1.0, 0.0])
        closest = c + rho * uw
        return closest - rv, uw

    # --- sample the two geometric features, with their analytic normals
    c = p / tau
    rho = r / tau
    th = np.linspace(0.0, 2 * np.pi, n_arc, endpoint=False)
    arc = c[None, :] + rho * np.column_stack([np.cos(th), np.sin(th)])
    arc_n = (arc - c[None, :]) / rho

    alpha = np.arcsin(min(1.0, r / d))
    base = np.arctan2(p[1], p[0])
    ts = np.linspace(0.0, leg_extent, n_leg)
    legs, legs_n = [], []
    for sgn in (-1.0, 1.0):
        ang = base + sgn * alpha
        dirv = np.array([np.cos(ang), np.sin(ang)])
        pts = ts[:, None] * dirv[None, :]
        # two perpendicular candidates; the outward one exits the VO
        perp = np.array([-dirv[1], dirv[0]])
        legs.append(pts)
        legs_n.append(np.broadcast_to(perp, pts.shape).copy())
    cand = np.concatenate([arc] + legs, axis=0)
    cand_n = np.concatenate([arc_n] + legs_n, axis=0)

    # --- keep true boundary points: member, with an exterior point within
    # eps along +n or -n (fixing the normal sign as we go)
    eps = 1e-5 * max(1.0, np.linalg.norm(rv), rho, d)
    member = in_vo_many(cand * (1 + 1e-12), p, r * (1 + 1e-9), tau)
    out_plus = ~in_vo_many(cand + eps * cand_n, p, r, tau)
    out_minus = ~in_vo_many(cand - eps * cand_n, p, r, tau)
    boundary = member & (out_plus | out_minus)
    assert boundary.any(), "no boundary samples -- bad test geometry"
    sign = np.where(out_plus, 1.0, -1.0)

    bpts = cand[boundary]
    bns = cand_n[boundary] * sign[boundary, None]
    i = np.argmin(np.linalg.norm(bpts - rv[None, :], axis=1))
    return bpts[i] - rv, bns[i]


def lp_grid(pref, pts, ns, valid, vmax, res=801):
    """Brute-force solve of the ORCA velocity program on a grid.

    ``pts``/``ns``: sequences of (x, y) pairs; ``valid``: sequence of
    bool.  Returns a dict with ``feasible`` (bool), ``best_v``/
    ``best_dist`` (projection objective, when feasible), and
    ``minimax_v``/``minimax_m`` (the least-clearance maximizer).  Grid
    resolution bounds the optimality gap at ~``2*vmax/(res-1)`` per axis.
    """
    pref = np.asarray(pref, float)
    xs = np.linspace(-vmax, vmax, res)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    inside = gx * gx + gy * gy <= vmax * vmax
    clear = np.full(gx.shape, np.inf)
    for (ptx, pty), (nx, ny), ok in zip(pts, ns, valid):
        if not ok:
            continue
        cl = (gx - ptx) * nx + (gy - pty) * ny
        clear = np.minimum(clear, cl)
    feas = inside & (clear >= 0.0)
    dist = (gx - pref[0]) ** 2 + (gy - pref[1]) ** 2
    out = {}
    if feas.any():
        i = np.argmin(np.where(feas, dist, np.inf))
        out["feasible"] = True
        out["best_v"] = np.array([gx.flat[i], gy.flat[i]])
        out["best_dist"] = float(np.sqrt(dist.flat[i]))
    else:
        out["feasible"] = False
    mm = np.where(inside, clear, -np.inf)
    j = np.argmax(mm)
    out["minimax_v"] = np.array([gx.flat[j], gy.flat[j]])
    out["minimax_m"] = float(mm.flat[j])
    return out
