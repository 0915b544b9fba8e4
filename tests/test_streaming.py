"""Streaming record writer: chunked device->host CSV drain
(Simulation.run_streamed) equals the in-memory path byte-for-byte.

The in-memory (T, N) record is the memory ceiling for long rollouts
(reference analogue: output_generator.py's full-history dump); streaming
bounds it at two chunks.
"""
import os

import numpy as np
import pytest

from carla_social_force_model_tpu.api.simulation import Simulation

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCEN = os.path.join(REPO, "configs", "scenarios")
SFM = os.path.join(REPO, "configs", "sfm.toml")


def _read(path):
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("scen,duration,chunk", [
    # plain scenario (scripted-vehicle-free), uneven final chunk
    ("corridor_counterflow", 10.0, 72),
    # reactive-autopilot fleet: vehicle.csv streams from chunked
    # AutopilotRecords through the rollout-carry fleet state
    ("jaywalking_reactive", 10.0, 80),
])
def test_streamed_csv_equals_in_memory(tmp_path, scen, duration, chunk):
    cfg = os.path.join(SCEN, f"{scen}.toml")
    ref = Simulation.from_config(cfg, SFM, duration=duration)
    ref.run()
    ref_dir = ref.write_csv(str(tmp_path / "mem"))

    sim = Simulation.from_config(cfg, SFM, duration=duration)
    out_dir = sim.run_streamed(str(tmp_path / "stream"), chunk_steps=chunk)

    for name in ("pedestrian.csv", "vehicle.csv", "borders.csv",
                 "obstacles.csv"):
        assert _read(os.path.join(out_dir, name)) == \
            _read(os.path.join(ref_dir, name)), name
    # the streamed final state matches the one-shot rollout bit-for-bit
    np.testing.assert_array_equal(np.asarray(sim.final_state.pos_x),
                                  np.asarray(ref.final_state.pos_x))
    np.testing.assert_array_equal(np.asarray(sim.final_state.mode),
                                  np.asarray(ref.final_state.mode))


def test_streamed_record_stride(tmp_path):
    """record_stride composes with streaming: frames are numbered in
    recorded units, time = frame * dt * stride, rows match the strided
    in-memory record."""
    import jax
    from carla_social_force_model_tpu.models.stepper import make_rollout_fn
    from carla_social_force_model_tpu.utils import csvout

    cfg = os.path.join(SCEN, "corridor_counterflow.toml")
    duration, stride, chunk = 12.0, 4, 80
    sim = Simulation.from_config(cfg, SFM, duration=duration)
    out_dir = sim.run_streamed(str(tmp_path / "s"), chunk_steps=chunk,
                               record_stride=stride)

    b = sim.bundle
    run = make_rollout_fn(b.scene, b.params, b.cfg, b.num_steps,
                          record=True, record_stride=stride)
    _, recs = jax.jit(run)(b.initial_state)
    csvout.write_pedestrian_csv(str(tmp_path / "ref.csv"), recs,
                                b.dt * stride)
    assert _read(os.path.join(out_dir, "pedestrian.csv")) == \
        _read(str(tmp_path / "ref.csv"))


def test_streamed_chunk_stride_mismatch(tmp_path):
    sim = Simulation.from_config(
        os.path.join(SCEN, "corridor_counterflow.toml"), SFM, duration=5.0)
    with pytest.raises(ValueError):
        sim.run_streamed(str(tmp_path), chunk_steps=70, record_stride=4)


def test_streamed_total_stride_mismatch(tmp_path):
    """Non-divisible TOTAL steps fail fast (before any segment computes),
    not mid-stream in the final partial chunk."""
    # duration 5.1 s / dt 0.05 = 102 steps: chunk_steps=80 is a multiple of
    # stride 4 but the total is not
    sim = Simulation.from_config(
        os.path.join(SCEN, "corridor_counterflow.toml"), SFM, duration=5.1)
    assert sim.bundle.num_steps % 4 != 0
    with pytest.raises(ValueError, match="total steps"):
        sim.run_streamed(str(tmp_path), chunk_steps=80, record_stride=4)


def test_cli_stream_checkpoint_conflict(tmp_path):
    """--stream with --checkpoint-dir is refused at parse time (the
    checkpointed rollout keeps records in memory, defeating --stream)."""
    from carla_social_force_model_tpu.api.cli import main
    with pytest.raises(SystemExit) as exc:
        main(["--scenario-config",
              os.path.join(SCEN, "corridor_counterflow.toml"),
              "--duration", "4", "--csv", "--output", str(tmp_path),
              "--stream", "--checkpoint-dir", str(tmp_path / "ck")])
    assert exc.value.code == 2


def test_csv_chunk_append_native_and_python(tmp_path):
    """The chunked writers (native + Python fallback) produce the whole-file
    output when fed the record in two pieces."""
    from carla_social_force_model_tpu.models.stepper import StepRecord
    from carla_social_force_model_tpu.utils import csvout

    rng = np.random.default_rng(0)
    t, n = 10, 7
    rec = StepRecord(pos=rng.normal(size=(t, n, 2)).astype(np.float32),
                     vel=rng.normal(size=(t, n, 2)).astype(np.float32),
                     mode=rng.integers(0, 5, (t, n)).astype(np.int8),
                     alive=rng.random((t, n)) > 0.3)
    part = lambda s: StepRecord(*[a[s] for a in rec])
    for native in (True, False):
        whole = tmp_path / f"whole_{native}.csv"
        parts = tmp_path / f"parts_{native}.csv"
        csvout.write_pedestrian_csv(str(whole), rec, 0.05, use_native=native)
        csvout.write_pedestrian_csv(str(parts), part(slice(0, 6)), 0.05,
                                    use_native=native)
        csvout.write_pedestrian_csv(str(parts), part(slice(6, None)), 0.05,
                                    use_native=native, frame_offset=6,
                                    append=True)
        assert _read(whole) == _read(parts), f"native={native}"
    # native and Python parse value-equal (the established trajio contract:
    # shortest round-trip floats both ways, formatting may differ --
    # tests/test_native_csv.py)
    import csv
    with open(tmp_path / "whole_True.csv") as fa, \
            open(tmp_path / "whole_False.csv") as fb:
        ra, rb = list(csv.reader(fa)), list(csv.reader(fb))
    assert ra[0] == rb[0] and len(ra) == len(rb)
    for a, b in zip(ra[1:], rb[1:]):
        assert a[:2] == b[:2] and a[7] == b[7]
        assert all(float(x) == float(y) for x, y in zip(a[2:7], b[2:7]))
