"""Differentiable calibration (api/calibrate.py): gradients through the
rollout are finite and informative, and ground-truth parameters are
recoverable from observed trajectories.

The reference has no analogue (numpy + CARLA RPC is not differentiable);
the parameter surface being fitted is its sfm_config.toml
(/root/reference/config/sfm_config.toml:1-56, /root/reference/forces.py:60-117).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_social_force_model_tpu.api.calibrate import (
    DEFAULT_FIT, fit_params, get_param, make_loss_fn, replace_param,
    replace_params, trajectory_mse)
from carla_social_force_model_tpu.api.synthetic import benchmark_bundle
from carla_social_force_model_tpu.models.stepper import make_rollout_fn


def _bundle(n=24, steps=80, **kw):
    scene, params, cfg, state = benchmark_bundle(n, extent=8.0,
                                                 use_pallas=False, **kw)
    run = make_rollout_fn(scene, params, cfg, steps)
    _, observed = run(state)
    return scene, params, cfg, state, observed


def test_param_path_helpers():
    _, params, _, _, _ = _bundle(n=4, steps=2)
    assert get_param(params, "pedestrian.A") == 4.5
    assert get_param(params, "acceleration.tau") == 0.5
    p2 = replace_param(params, "pedestrian.A", 2.0)
    assert get_param(p2, "pedestrian.A") == 2.0
    assert get_param(p2, "pedestrian.gamma") == get_param(params, "pedestrian.gamma")
    p3 = replace_params(params, {"pedestrian.gamma": 0.5, "border.a": 1.0})
    assert get_param(p3, "pedestrian.gamma") == 0.5
    assert get_param(p3, "border.a") == 1.0
    # the original is untouched (functional update)
    assert get_param(params, "pedestrian.A") == 4.5


def test_loss_zero_at_truth_and_grads_finite():
    scene, params, cfg, state, observed = _bundle()
    fit = DEFAULT_FIT + ("acceleration.tau",)
    loss_fn = make_loss_fn(state, scene, params, cfg, observed, 80, fit=fit)

    theta_true = {k: jnp.log(jnp.asarray(get_param(params, k), jnp.float32))
                  for k in fit}
    assert float(loss_fn(theta_true)) < 1e-10

    # perturbed thetas: loss positive, every gradient finite, the
    # high-leverage ones nonzero
    theta = {k: v + 0.4 for k, v in theta_true.items()}
    loss, grads = jax.value_and_grad(loss_fn)(theta)
    assert float(loss) > 1e-4
    for k, g in grads.items():
        assert np.isfinite(float(g)), f"non-finite grad for {k}"
    assert abs(float(grads["pedestrian.A"])) > 1e-6
    assert abs(float(grads["acceleration.tau"])) > 1e-6


def test_remat_matches_and_is_differentiable():
    scene, params, cfg, state, observed = _bundle(n=12, steps=40)
    kw = dict(fit=("pedestrian.A",), log_space=False)
    loss_r = make_loss_fn(state, scene, params, cfg, observed, 40,
                          remat=True, **kw)
    loss_n = make_loss_fn(state, scene, params, cfg, observed, 40,
                          remat=False, **kw)
    theta = {"pedestrian.A": jnp.asarray(3.0)}
    v_r, g_r = jax.value_and_grad(loss_r)(theta)
    v_n, g_n = jax.value_and_grad(loss_n)(theta)
    assert np.allclose(float(v_r), float(v_n), rtol=1e-6)
    assert np.allclose(float(g_r["pedestrian.A"]),
                       float(g_n["pedestrian.A"]), rtol=1e-4)


def test_grads_through_border_force():
    scene, params, cfg, state, observed = _bundle(n=16, steps=40,
                                                  with_borders=True)
    loss_fn = make_loss_fn(state, scene, params, cfg, observed, 40,
                           fit=("border.a", "border.b"))
    theta = {"border.a": jnp.log(jnp.asarray(2.0)),
             "border.b": jnp.log(jnp.asarray(0.15))}
    loss, grads = jax.value_and_grad(loss_fn)(theta)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.isfinite(float(g)), f"non-finite grad for {k}"


def test_recover_pedestrian_params():
    scene, params, cfg, state, observed = _bundle(n=24, steps=80)
    # start the interaction strength/range well off the truth
    start = replace_params(params, {"pedestrian.A": 2.0,
                                    "pedestrian.gamma": 0.55})
    result = fit_params(state, scene, start, cfg, observed, 80,
                        fit=("pedestrian.A", "pedestrian.gamma"),
                        iters=150, learning_rate=0.05)
    assert result.final_loss < result.initial_loss * 1e-2
    assert abs(result.fitted["pedestrian.A"] - 4.5) / 4.5 < 0.15, result.fitted
    assert abs(result.fitted["pedestrian.gamma"] - 0.35) / 0.35 < 0.2, \
        result.fitted
    # the returned params carry the fitted values, everything else untouched
    assert get_param(result.params, "pedestrian.A") == pytest.approx(
        result.fitted["pedestrian.A"])
    assert get_param(result.params, "pedestrian.n") == 2.0


def test_trajectory_mse_masking():
    from carla_social_force_model_tpu.models.stepper import StepRecord
    pos_a = jnp.zeros((3, 2, 2))
    pos_b = jnp.ones((3, 2, 2))
    alive = jnp.ones((3, 2), bool)
    dead = jnp.zeros((3, 2), bool)
    vel = jnp.zeros((3, 2, 2))
    mode = jnp.zeros((3, 2), jnp.int32)
    ra = StepRecord(pos=pos_a, vel=vel, mode=mode, alive=alive)
    rb = StepRecord(pos=pos_b, vel=vel, mode=mode, alive=alive)
    assert float(trajectory_mse(ra, rb)) == pytest.approx(2.0)
    rb_dead = StepRecord(pos=pos_b, vel=vel, mode=mode, alive=dead)
    assert float(trajectory_mse(ra, rb_dead)) == 0.0


def test_pallas_cfg_falls_back_to_jnp():
    scene, params, cfg, state, observed = _bundle(n=8, steps=10)
    cfg_p = dataclasses.replace(cfg, use_pallas=True, pallas_interpret=True)
    loss_fn = make_loss_fn(state, scene, params, cfg_p, observed, 10,
                           fit=("pedestrian.A",))
    theta = {"pedestrian.A": jnp.log(jnp.asarray(4.5, jnp.float32))}
    # differentiable (i.e. the jnp path was used) and consistent with the
    # observed record at the true parameters
    val, grad = jax.value_and_grad(loss_fn)(theta)
    assert float(val) < 1e-8
    assert np.isfinite(float(grad["pedestrian.A"]))


def test_csv_roundtrip_feeds_calibration(tmp_path):
    """write_pedestrian_csv -> read_pedestrian_csv round-trips into a
    StepRecord that the calibration loss accepts (zero at true params)."""
    from carla_social_force_model_tpu.utils.csvout import (
        read_pedestrian_csv, write_pedestrian_csv)
    scene, params, cfg, state, observed = _bundle(n=10, steps=20)
    path = str(tmp_path / "pedestrian.csv")
    write_pedestrian_csv(path, observed, cfg.dt, use_native=False)
    rec, dt = read_pedestrian_csv(path)
    assert dt == pytest.approx(cfg.dt)
    assert rec.pos.shape == observed.pos.shape
    np.testing.assert_array_equal(np.asarray(rec.alive),
                                  np.asarray(observed.alive))
    a = np.asarray(observed.alive)
    np.testing.assert_allclose(np.asarray(rec.pos)[a],
                               np.asarray(observed.pos)[a], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rec.vel)[a],
                               np.asarray(observed.vel)[a], rtol=1e-6)
    loss_fn = make_loss_fn(state, scene, params, cfg,
                           jax.tree_util.tree_map(jnp.asarray, rec), 20,
                           fit=("pedestrian.A",))
    theta = {"pedestrian.A": jnp.log(jnp.asarray(4.5, jnp.float32))}
    assert float(loss_fn(theta)) < 1e-9

    # mode-text (reference PedMode.<NAME>) files load too
    path2 = str(tmp_path / "pedestrian_text.csv")
    write_pedestrian_csv(path2, observed, cfg.dt, use_native=False,
                         mode_text=True)
    rec2, _ = read_pedestrian_csv(path2)
    np.testing.assert_array_equal(np.asarray(rec2.mode)[a],
                                  np.asarray(observed.mode)[a])


# --------------------------------------------------------------------------
# per-agent heterogeneity fitting ("scene."-prefixed fit names; round 4):
# the pair_scale vector post-multiplies each agent's summed pair force
# (models/stepper.py force_terms), so its per-agent gradient is cheap and
# each s_i is identified by agent i's own trajectory response.

def test_recover_per_agent_scales():
    rng = np.random.default_rng(3)
    scene, params, cfg, state = benchmark_bundle(24, extent=8.0,
                                                 use_pallas=False)
    true_scale = jnp.asarray(rng.uniform(0.3, 1.7, 24), jnp.float32)
    scene_true = dataclasses.replace(
        scene, spawn=dataclasses.replace(scene.spawn,
                                         pair_scale=true_scale))
    _, observed = make_rollout_fn(scene_true, params, cfg, 80)(state)

    # fit from the homogeneous default (scene.pair_scale=None auto-inits
    # to ones); physics params stay fixed at truth
    result = fit_params(state, scene, params, cfg, observed, 80,
                        fit=("scene.spawn.pair_scale",), iters=300,
                        learning_rate=0.05)
    got = np.asarray(result.fitted["scene.spawn.pair_scale"])
    assert got.shape == (24,)
    assert result.final_loss < result.initial_loss * 1e-2, \
        (result.initial_loss, result.final_loss)
    np.testing.assert_allclose(got, np.asarray(true_scale),
                               rtol=0.05, atol=0.03)
    # the fitted scene carries the vector; params are returned untouched
    assert result.scene is not None
    np.testing.assert_allclose(
        np.asarray(result.scene.spawn.pair_scale), got, rtol=1e-6)
    assert get_param(result.params, "pedestrian.A") == 4.5


def test_recover_group_beta():
    """Group-force betas are ordinary SfmParams leaves -- recoverable from
    an observed grouped crowd through the same machinery."""
    from carla_social_force_model_tpu.models.groups import build_groups
    scene, params, cfg, state = benchmark_bundle(24, extent=8.0,
                                                 use_pallas=False)
    gid = np.arange(24) // 4          # six 4-member parties
    scene = dataclasses.replace(scene, groups=build_groups(gid,
                                                           max_members=4))
    params = dataclasses.replace(params, enable_group=True)
    _, observed = make_rollout_fn(scene, params, cfg, 80)(state)

    start = replace_params(params, {"group.beta_att": 1.0,
                                    "group.beta_vis": 1.5})
    result = fit_params(state, scene, start, cfg, observed, 80,
                        fit=("group.beta_att", "group.beta_vis"),
                        iters=200, learning_rate=0.05)
    assert result.final_loss < result.initial_loss * 5e-2, \
        (result.initial_loss, result.final_loss)
    assert abs(result.fitted["group.beta_att"] - 3.0) / 3.0 < 0.2, \
        result.fitted
    assert abs(result.fitted["group.beta_vis"] - 4.0) / 4.0 < 0.2, \
        result.fitted


def test_scene_fit_requires_initial_array():
    scene, params, cfg, state, observed = _bundle(n=8, steps=10)
    with pytest.raises(ValueError, match="initial"):
        fit_params(state, scene, params, cfg, observed, 10,
                   fit=("scene.spawn.law_id",), iters=1)


# --------------------------------------------------------------------------
# power-law family (models/params.PowerLawParams; a model family the
# reference does not have).  Full-trajectory MSE is chaotic in the
# parameters for this stiff, hard-gated law (collision-course gates flip on
# ulp-level changes; reverse-mode gradients overflow beyond ~40 ticks), so
# calibration uses the teacher-forced windowed objective
# (make_teacher_forced_loss_fn) / rollout(grad_horizon=...) truncated BPTT.

def _powerlaw_bundle(n=24, steps=80, **kw):
    scene, params, cfg, state = benchmark_bundle(n, extent=8.0,
                                                 use_pallas=False, **kw)
    params = dataclasses.replace(params, enable_pedestrian=False,
                                 enable_powerlaw=True)
    run = make_rollout_fn(scene, params, cfg, steps)
    _, observed = run(state)
    return scene, params, cfg, state, observed


def _clipped_adam(lr, iters):
    import optax
    return optax.chain(optax.zero_nans(), optax.clip_by_global_norm(1.0),
                       optax.adam(optax.cosine_decay_schedule(lr, iters)))


def test_powerlaw_teacher_forced_loss_and_grads():
    from carla_social_force_model_tpu.api.calibrate import (
        make_teacher_forced_loss_fn)
    scene, params, cfg, state, observed = _powerlaw_bundle()
    fit = ("powerlaw.k", "powerlaw.tau0")
    loss_fn = make_teacher_forced_loss_fn(state, scene, params, cfg,
                                          observed, 80, fit=fit, window=8)
    theta_true = {k: jnp.log(jnp.asarray(get_param(params, k), jnp.float32))
                  for k in fit}
    # windows restart FROM the observed data, so the loss at the true
    # parameters is the <=8-step prediction error of the generating model
    # on its own trajectory: ~f32 epsilon, no chaos amplification
    assert float(loss_fn(theta_true)) < 1e-8
    theta = {k: v + 0.4 for k, v in theta_true.items()}
    loss, grads = jax.value_and_grad(loss_fn)(theta)
    assert float(loss) > 1e-5
    for k, g in grads.items():
        g = float(g)
        assert np.isfinite(g), f"non-finite grad for {k}"
        assert abs(g) < 1e3, f"unbounded grad for {k}: {g} (window broken?)"
    assert abs(float(grads["powerlaw.k"])) > 1e-7


def test_grad_horizon_truncated_bptt():
    """rollout(grad_horizon=K): forward bitwise unchanged, reverse-mode
    bounded where full BPTT overflows f32 (the power-law stiffness)."""
    scene, params, cfg, state, observed = _powerlaw_bundle()
    fit = ("powerlaw.k", "powerlaw.tau0")
    theta = {k: jnp.log(jnp.asarray(get_param(params, k), jnp.float32)) + 0.4
             for k in fit}
    loss_h = make_loss_fn(state, scene, params, cfg, observed, 80, fit=fit,
                          grad_horizon=20)
    loss_f = make_loss_fn(state, scene, params, cfg, observed, 80, fit=fit)
    # identical forward values (stop_gradient is the identity forward)
    assert float(loss_h(theta)) == float(loss_f(theta))
    _, gh = jax.value_and_grad(loss_h)(theta)
    for k, g in gh.items():
        assert np.isfinite(float(g)), f"non-finite truncated grad for {k}"


def test_recover_powerlaw_params():
    scene, params, cfg, state, observed = _powerlaw_bundle()
    start = replace_params(params, {"powerlaw.k": 0.6, "powerlaw.tau0": 6.0})
    result = fit_params(state, scene, start, cfg, observed, 80,
                        fit=("powerlaw.k", "powerlaw.tau0"), iters=300,
                        teacher_window=4, vel_weight=4.0,
                        optimizer=_clipped_adam(0.1, 300))
    assert result.final_loss < result.initial_loss * 2e-2
    assert abs(result.fitted["powerlaw.k"] - 1.5) / 1.5 < 0.15, result.fitted
    assert abs(result.fitted["powerlaw.tau0"] - 3.0) / 3.0 < 0.3, \
        result.fitted


def test_cross_family_distillation_reduces_loss():
    """Fit the power-law family to MOUSSAID-generated observations: the
    families are different physics, so the loss cannot reach zero, but
    distillation from a deliberately weak start must close most of the gap
    toward the family floor."""
    scene, params, cfg, state, observed = _bundle(n=24, steps=60)
    pl_params = dataclasses.replace(params, enable_pedestrian=False,
                                    enable_powerlaw=True)
    # full-trajectory objective (the deployment-relevant metric: where do
    # the crowds END UP) with truncated BPTT for the stiff family
    result = fit_params(state, scene, pl_params, cfg, observed, 60,
                        fit=("powerlaw.k", "powerlaw.tau0"), iters=120,
                        grad_horizon=10,
                        optimizer=_clipped_adam(0.05, 120))
    assert np.isfinite(result.final_loss)
    # ~25% measured reduction; the floor is the structural family gap
    assert result.final_loss < result.initial_loss * 0.8, \
        (result.initial_loss, result.final_loss, result.fitted)
    assert result.fitted["powerlaw.k"] > 0.0, result.fitted


def test_recover_orca_tau():
    """Differentiable ORCA (round 5, the fourth family): ``orca.tau`` is
    recoverable THROUGH the velocity-projection LP.  The candidate-
    enumeration argmin is piecewise-smooth in tau (tau scales the
    half-plane offsets, ops/orca.orca_halfplane), but the full-trajectory
    MSE landscape is chaotic like the power law's (measured: the loss
    curve oscillates without converging), so the fit uses the same
    teacher-forcing remedy -- the windowed prediction error is smooth and
    recovers tau to 3 decimals.

    ``orca.neighbor_dist`` is the documented NEGATIVE result: it enters
    the computation only through inclusion masks (``d2 <= nd**2``), so
    its gradient is identically zero -- asserted below rather than
    hand-waved.  Fit the smooth knobs; sweep the gate knobs
    (tools/orca_accuracy.py prices them).
    """
    scene, params, cfg, state = benchmark_bundle(16, extent=7.0,
                                                 use_pallas=False)
    params = dataclasses.replace(
        params, enable_pedestrian=False, enable_orca=True,
        orca=dataclasses.replace(params.orca, tau=1.5, window=0))
    steps = 120
    run = make_rollout_fn(scene, params, cfg, steps)
    _, observed = run(state)

    # gradient w.r.t. neighbor_dist is exactly zero (mask-only parameter)
    loss_nd = make_loss_fn(state, scene, params, cfg, observed, steps,
                           fit=("orca.neighbor_dist",), log_space=False)
    g_nd = jax.grad(loss_nd)(
        {"orca.neighbor_dist": jnp.asarray(12.0, jnp.float32)})
    assert float(g_nd["orca.neighbor_dist"]) == 0.0

    # tau recovers from a 60%-off start (teacher-forced objective)
    start = replace_param(params, "orca.tau", 2.4)
    result = fit_params(state, scene, start, cfg, observed, steps,
                        fit=("orca.tau",), iters=150, learning_rate=0.05,
                        teacher_window=8, vel_weight=1.0)
    assert result.final_loss < result.initial_loss * 1e-2
    assert abs(result.fitted["orca.tau"] - 1.5) / 1.5 < 0.05, result.fitted
