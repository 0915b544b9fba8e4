"""Typed, validated Social-Force-Model parameters.

One schema replaces the reference's ~30 scattered ``dict.get`` call sites
(SURVEY.md section 5).  The TOML surface of the reference's
``config/sfm_config.toml`` parses unchanged via :func:`SfmParams.from_dict`.

Config-key quirk handling (see SURVEY.md "Deliberate semantic deviations"):
the reference *reads* ``goal_force.tau`` (forces.py:44) while its shipped
config *writes* ``[acceleration_force] tau``, and reads ``max_speed_factor``
(pedestrian_state.py:15) while the config writes ``max_speed_multiplier`` --
so both settings are silently inert in the reference and the defaults
(tau=0.5, factor=1.3) always apply.  We honor the keys *as written in the
config* (so they actually work), falling back to the reference's read-keys
and finally to the reference defaults.  ``strict_parity=True`` reproduces the
reference's inert-key behavior exactly.
"""
from __future__ import annotations

from .. utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class AccelerationParams:
    """Helbing-Molnar (1995) relaxation force. Reference: forces.py:35-53."""

    tau: float = 0.5


@pytree_dataclass
class MoussaidParams:
    """Moussaid et al. (2009) interaction-force parameters.

    Shared by the pedestrian-pedestrian force (reference forces.py:56-117)
    and the static/dynamic obstacle forces (forces.py:182-283, which reuse
    the same formula against per-obstacle closest border points).
    ``perception_threshold`` is only consulted by the obstacle variants.
    """

    lambda_: float = 2.0
    A: float = 4.5
    gamma: float = 0.35
    n: float = 2.0
    n_prime: float = 3.0
    epsilon: float = 0.005
    perception_threshold: float = 20.0


@pytree_dataclass
class BorderParams:
    """Exponential wall-repulsion parameters. Reference: forces.py:120-137."""

    a: float = 3.0
    b: float = 0.1


@pytree_dataclass
class PedRepulsiveParams:
    """Helbing-Molnar (1995) elliptical pedestrian repulsion.

    The reference's config names this force (pedestrian_simulation.py:49-50)
    but the class does not exist there (enabling it crashes); here it is a
    working implementation of the original paper's V(b) = V0*exp(-b/sigma)
    potential with the field-of-view modulation (weight c outside the
    2*phi cone).  Defaults are the paper's values.

    ``b_min`` regularizes the law's b -> 0 singularity: the force magnitude
    scales as s/(4b), and b (the ellipse semi-minor axis) cancels to ZERO
    for an equal-speed follower directly behind its leader (s^2 == |y|^2
    catastrophically, so f32 rounding decides between "masked" and an
    unbounded kick).  Clamping b at b_min saturates the potential below
    the contact scale -- the force stays bounded and continuous (in the
    exact-degenerate geometry the two unit vectors of grad b cancel, so
    the clamped force tends to zero smoothly).
    """

    v0: float = 2.1
    sigma: float = 0.3
    fov_phi: float = 100.0   # degrees
    fov_factor: float = 0.5
    step_width: float = 1.0  # Delta-t of the anticipation term [s]
    b_min: float = 0.1       # semi-minor-axis floor [m] (see above)


@pytree_dataclass
class PowerLawParams:
    """Karamouzas-Skinner-Guy (PRL 2014) universal power-law interaction.

    A second pedestrian-model family beyond the reference's Moussaid force:
    the pair energy is a function of projected TIME TO COLLISION rather
    than distance, E(tau) = k / tau^2 * exp(-tau / tau0), with tau solved
    from the relative state of two discs (radii summed).  Measured from
    crowd data in the paper; defaults are the paper's fit.  ``tau_max``
    bounds the anticipation horizon (pairs whose collision lies further
    out contribute nothing -- the paper's data supports ~3 s of
    anticipation); ``tau_min`` guards the tau -> 0 singularity for
    nearly-touching pairs.
    """

    k: float = 1.5
    tau0: float = 3.0
    tau_max: float = 20.0
    tau_min: float = 1e-2


@pytree_dataclass
class OrcaParams:
    """ORCA (van den Berg et al., ISRR 2011) reciprocal collision
    avoidance -- a velocity-projection law, not a force (ops/orca.py).

    ``tau``: avoidance horizon [s] for non-colliding pairs (colliding
    pairs resolve over one step).  ``neighbor_dist``: perception radius
    [m].  ``max_neighbors``: K nearest agents constrain the LP (RVO2's
    knob of the same name).  ``window``: Hilbert-sorted candidate band
    the K nearest are drawn from (0 = exact full-crowd selection; only
    viable for small N -- the band is exact whenever the true K nearest
    are within +-window/2 sorted positions, which a 64-wide band
    guarantees in practice at K=10).  ``max_vehicles``: nearest vehicles
    constraining the LP as non-reciprocating bounding discs.

    ``max_statics``: nearest static wall features (per point set: borders
    and static obstacles each) constraining the LP as half-planes --
    0 disables.  For a straight wall at body gap ``g`` the permitted set
    ``{v : v . n >= -g/tau_static}`` is EXACT (a velocity collides with
    the wall within ``tau_static`` iff its wall-ward component exceeds
    ``g/tau_static``), so unlike the reference's soft exponential border
    force (forces.py:138-179) the projection cannot select a wall-crossing
    velocity; penetrating rows (``g < 0``) resolve over one step.

    ``tau``/``neighbor_dist``/``tau_static`` are pytree leaves
    (sweepable/calibratable); the integer shape knobs are static.
    """

    tau: float = 2.0
    neighbor_dist: float = 15.0
    tau_static: float = 2.0
    max_neighbors: int = static_field(default=10)
    window: int = static_field(default=64)
    max_vehicles: int = static_field(default=4)
    max_statics: int = static_field(default=3)


@pytree_dataclass
class SpaceRepulsiveParams:
    """Helbing-Molnar (1995) boundary repulsion U(d) = U0*exp(-d/R) from the
    nearest border point (the reference's other dead config path,
    pedestrian_simulation.py:51-53)."""

    u0: float = 10.0
    r: float = 0.2


@pytree_dataclass
class GroupParams:
    """Moussaid et al. (2010) social-group forces (PLoS ONE 5(4): e10047,
    "The walking behaviour of pedestrian social groups").

    Three terms act on members of the same social group (models/groups.py):

    * gaze   f_vis = -beta_vis * alpha * v_i, where alpha [rad] is the head
      rotation needed to keep the other members' centroid in view (the
      angle between the member's desired direction and the direction to
      that centroid) -- groups slow down to keep sight of each other;
    * attraction f_att = beta_att * U_i toward the others' centroid when
      the member trails more than (M-1)/2 m behind it (the paper's
      group-size-dependent threshold);
    * repulsion  f_rep = beta_rep * W_ik away from each member k closer
      than ``rep_distance`` -- members keep social comfort spacing.

    Defaults are the paper's fitted values (beta1=4, beta2=3, beta3=1);
    ``rep_distance`` follows the PySocialForce convention (0.55 m).
    """

    beta_vis: float = 4.0
    beta_att: float = 3.0
    beta_rep: float = 1.0
    rep_distance: float = 0.55


def _moussaid_from_dict(section: dict, default_threshold: float) -> MoussaidParams:
    return MoussaidParams(
        lambda_=float(section.get("lambda", 2.0)),
        A=float(section.get("A", 4.5)),
        gamma=float(section.get("gamma", 0.35)),
        n=float(section.get("n", 2.0)),
        n_prime=float(section.get("n_prime", 3.0)),
        epsilon=float(section.get("epsilon", 0.005)),
        perception_threshold=float(section.get("perception_threshold", default_threshold)),
    )


@pytree_dataclass
class SfmParams:
    """Full SFM parameter set (the reference's sfm_config.toml surface)."""

    # numeric parameters are pytree *leaves* so sweeps can vmap over them
    acceleration: AccelerationParams = AccelerationParams()
    pedestrian: MoussaidParams = MoussaidParams()
    border: BorderParams = BorderParams()
    static_obstacle: MoussaidParams = MoussaidParams()
    dynamic_obstacle: MoussaidParams = MoussaidParams(perception_threshold=50.0)
    max_speed_factor: float = 1.3
    use_ped_radius: bool = static_field(default=False)
    # force on/off flags ([forces] table; pedestrian_simulation.py:32-55)
    enable_acceleration: bool = static_field(default=True)
    enable_pedestrian: bool = static_field(default=True)
    enable_border: bool = static_field(default=True)
    enable_static_obstacle: bool = static_field(default=False)
    enable_dynamic_obstacle: bool = static_field(default=False)
    # Helbing-1995 extension forces (dead config paths in the reference)
    ped_repulsive: PedRepulsiveParams = PedRepulsiveParams()
    space_repulsive: SpaceRepulsiveParams = SpaceRepulsiveParams()
    enable_ped_repulsive: bool = static_field(default=False)
    enable_space_repulsive: bool = static_field(default=False)
    # Karamouzas et al. (2014) time-to-collision power law: an alternative
    # pedestrian-pedestrian model family (beyond the reference's surface;
    # typically enabled INSTEAD of pedestrian_force)
    powerlaw: PowerLawParams = PowerLawParams()
    enable_powerlaw: bool = static_field(default=False)
    # Moussaid et al. (2010) social-group forces (beyond the reference's
    # surface; needs group assignments -- `group_size` on a ped spawner)
    group: GroupParams = GroupParams()
    enable_group: bool = static_field(default=False)
    # ORCA reciprocal collision avoidance (beyond the reference's surface):
    # a velocity-projection law layered on the force pipeline -- the
    # force-integrated velocity becomes the *preferred* velocity and ORCA
    # projects it onto the collision-free half-plane intersection
    # (ops/orca.py).  Applies to all agents, or per-spawner via
    # pair_force = "orca" (mixed crowds)
    orca: OrcaParams = OrcaParams()
    enable_orca: bool = static_field(default=False)
    # reproduce reference-inert config keys & first-vehicle-extent quirk
    strict_parity: bool = static_field(default=False)

    @staticmethod
    def from_dict(cfg: dict, strict_parity: bool = False) -> "SfmParams":
        """Build params from a parsed sfm_config.toml-style dict.

        The reference's own config files parse unchanged.  The two inert
        reference keys are honored as written unless ``strict_parity``.
        Enabling the reference's dead force flags (``ped_repulsive_force`` /
        ``space_repulsive_force``, which crash the reference with an
        AttributeError, pedestrian_simulation.py:49-53) raises a clear error.
        """
        forces = cfg.get("forces", {})
        if strict_parity:
            # the reference crashes when these flags are enabled
            # (pedestrian_simulation.py:49-53 references missing classes;
            # powerlaw_force is not a reference force name at all)
            for dead in ("ped_repulsive_force", "space_repulsive_force",
                         "powerlaw_force", "group_force", "orca_law"):
                if forces.get(dead, False):
                    raise ValueError(
                        f"strict parity: force '{dead}' is a dead config path "
                        "in the reference (enabling it crashes init_forces "
                        "with an AttributeError); disable strict_parity to "
                        "use this framework's working implementation")

        goal = cfg.get("goal_force", {})
        accel = cfg.get("acceleration_force", {})
        if strict_parity:
            tau = float(goal.get("tau", 0.5))
            max_speed_factor = float(cfg.get("max_speed_factor", 1.3))
        else:
            tau = float(accel.get("tau", goal.get("tau", 0.5)))
            max_speed_factor = float(
                cfg.get("max_speed_multiplier", cfg.get("max_speed_factor", 1.3))
            )

        border_cfg = cfg.get("border_force", {})
        pr = cfg.get("ped_repulsive_force", {})
        sr = cfg.get("space_repulsive_force", {})
        pw = cfg.get("powerlaw_force", {})
        gr = cfg.get("group_force", {})
        oc = cfg.get("orca_law", {})
        return SfmParams(
            orca=OrcaParams(
                tau=float(oc.get("tau", 2.0)),
                neighbor_dist=float(oc.get("neighbor_dist", 15.0)),
                tau_static=float(oc.get("tau_static", 2.0)),
                max_neighbors=int(oc.get("max_neighbors", 10)),
                window=int(oc.get("window", 64)),
                max_vehicles=int(oc.get("max_vehicles", 4)),
                max_statics=int(oc.get("max_statics", 3))),
            enable_orca=bool(forces.get("orca_law", False))
            and not strict_parity,
            group=GroupParams(
                beta_vis=float(gr.get("beta_vis", 4.0)),
                beta_att=float(gr.get("beta_att", 3.0)),
                beta_rep=float(gr.get("beta_rep", 1.0)),
                rep_distance=float(gr.get("rep_distance", 0.55))),
            enable_group=bool(forces.get("group_force", False))
            and not strict_parity,
            powerlaw=PowerLawParams(
                k=float(pw.get("k", 1.5)),
                tau0=float(pw.get("tau0", 3.0)),
                tau_max=float(pw.get("tau_max", 20.0)),
                tau_min=float(pw.get("tau_min", 1e-2))),
            enable_powerlaw=bool(forces.get("powerlaw_force", False))
            and not strict_parity,
            ped_repulsive=PedRepulsiveParams(
                v0=float(pr.get("v0", 2.1)),
                sigma=float(pr.get("sigma", 0.3)),
                fov_phi=float(pr.get("fov_phi", 100.0)),
                fov_factor=float(pr.get("fov_factor", 0.5)),
                step_width=float(pr.get("step_width", 1.0)),
                b_min=float(pr.get("b_min", 0.1))),
            space_repulsive=SpaceRepulsiveParams(
                u0=float(sr.get("u0", 10.0)), r=float(sr.get("r", 0.2))),
            enable_ped_repulsive=bool(forces.get("ped_repulsive_force", False))
            and not strict_parity,
            enable_space_repulsive=bool(forces.get("space_repulsive_force", False))
            and not strict_parity,
            acceleration=AccelerationParams(tau=tau),
            pedestrian=_moussaid_from_dict(cfg.get("pedestrian_force", {}), 20.0),
            border=BorderParams(
                a=float(border_cfg.get("a", 3.0)), b=float(border_cfg.get("b", 0.1))
            ),
            static_obstacle=_moussaid_from_dict(cfg.get("static_obstacle_force", {}), 20.0),
            dynamic_obstacle=_moussaid_from_dict(cfg.get("dynamic_obstacle_force", {}), 50.0),
            max_speed_factor=max_speed_factor,
            use_ped_radius=bool(cfg.get("use_ped_radius", False)),
            enable_acceleration=bool(forces.get("acceleration_force", False)),
            enable_pedestrian=bool(forces.get("pedestrian_force", False)),
            enable_border=bool(forces.get("border_force", False)),
            enable_static_obstacle=bool(forces.get("static_obstacle_force", False)),
            enable_dynamic_obstacle=bool(forces.get("dynamic_obstacle_force", False)),
            strict_parity=strict_parity,
        )
