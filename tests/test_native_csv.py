"""Native trajectory writer vs the Python csv path (value-identical)."""
import csv
import os
import time

import numpy as np
import pytest

from carla_social_force_model_tpu.models.stepper import StepRecord
from carla_social_force_model_tpu.utils.csvout import write_pedestrian_csv
from carla_social_force_model_tpu.utils.nativelib import load

RNG = np.random.default_rng(23)


def random_records(t, n):
    return StepRecord(
        pos=RNG.uniform(-100, 100, (t, n, 2)).astype(np.float32),
        vel=RNG.uniform(-3, 3, (t, n, 2)).astype(np.float32),
        mode=RNG.integers(0, 5, (t, n)).astype(np.int32),
        alive=RNG.uniform(size=(t, n)) < 0.8,
    )


def read_rows(path):
    with open(path) as f:
        return list(csv.reader(f))


def test_native_matches_python(tmp_path):
    if load("trajio") is None:
        pytest.skip("no native toolchain")
    recs = random_records(40, 17)
    p_native = str(tmp_path / "native.csv")
    p_python = str(tmp_path / "python.csv")
    write_pedestrian_csv(p_native, recs, 0.05, use_native=True)
    write_pedestrian_csv(p_python, recs, 0.05, use_native=False)
    a, b = read_rows(p_native), read_rows(p_python)
    assert a[0] == b[0]
    assert len(a) == len(b)
    for ra, rb in zip(a[1:], b[1:]):
        assert ra[:2] == rb[:2] and ra[7] == rb[7]     # ids/frame/mode exact
        for x, y in zip(ra[2:7], rb[2:7]):             # floats parse equal
            assert float(x) == float(y), (ra, rb)


def test_native_writer_speed(tmp_path):
    if load("trajio") is None:
        pytest.skip("no native toolchain")
    recs = random_records(300, 500)  # 150k rows x ~80% alive

    def timed(use_native, path):
        # best of 3: wall-clock timing flakes under concurrent machine load
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            write_pedestrian_csv(path, recs, 0.05, use_native=use_native)
            best = min(best, time.perf_counter() - t0)
        return best

    native_t = timed(True, str(tmp_path / "n.csv"))
    python_t = timed(False, str(tmp_path / "p.csv"))
    # native should be decisively faster (typically 10-50x)
    assert native_t < python_t, (native_t, python_t)
    assert os.path.getsize(tmp_path / "n.csv") > 1_000_000


def test_mode_text_column(tmp_path):
    """strict-parity mode column: the reference stringifies the recorded
    PedMode IntEnum (output_generator.py:49) -> 'PedMode.<NAME>' on py3.7/3.8."""
    recs = random_records(4, 3)
    p = str(tmp_path / "text.csv")
    write_pedestrian_csv(p, recs, 0.05, mode_text=True)
    rows = read_rows(p)
    modes = np.asarray(recs.mode)
    alive = np.asarray(recs.alive)
    assert len(rows) == 1 + int(alive.sum())
    from carla_social_force_model_tpu.models.modes import MODE_NAMES
    for row in rows[1:]:
        assert row[7].startswith("PedMode.")
        assert row[7].split(".", 1)[1] in MODE_NAMES.values()
    # spot-check one cell against the int record
    frame, slot = map(int, (rows[1][1], rows[1][0]))
    assert rows[1][7] == f"PedMode.{MODE_NAMES[int(modes[frame, slot])]}"
