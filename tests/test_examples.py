"""Smoke tests: every shipped example entry point runs end-to-end.

The underlying logic each example demonstrates is unit-tested elsewhere
(test_orca.py, test_groups.py, test_calibrate.py); these guard the example
*scripts* themselves against rot (import drift, renamed APIs, stale
assertions).  All are compile-bound multi-rollout programs, so they carry
the ``slow`` marker -- ``pytest -m "not slow"`` skips them.

(urban_navigation / ensemble_rollouts / parameter_sweep / multichip_scaling
are exercised in test_urban_example.py and test_parallel.py.)
"""
import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name, argv=None):
    path = os.path.join(REPO, "examples", name)
    old_argv = sys.argv
    sys.argv = [name] + list(argv or [])
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old_argv


@pytest.mark.slow
def test_orca_circle_example(capsys):
    _run_example("orca_circle.py")
    out = capsys.readouterr().out
    assert "ORCA projection" in out and "collision-free" in out


@pytest.mark.slow
def test_social_groups_example(capsys):
    _run_example("social_groups.py")
    out = capsys.readouterr().out
    assert "group force ON" in out and "held together" in out


@pytest.mark.slow
def test_calibrate_params_example(capsys):
    _run_example("calibrate_params.py")
    out = capsys.readouterr().out
    assert "fitted params drop straight into" in out
    assert "per-agent scale error" in out


@pytest.mark.slow
def test_distill_powerlaw_example(capsys):
    _run_example("distill_powerlaw.py")
    out = capsys.readouterr().out
    assert "recover power-law params" in out
    assert "distill Moussaid-generated trajectories" in out
