#!/usr/bin/env python
"""On-hardware Mosaic validation of the half-ring's off-diagonal launch.

The symmetric half-ring schedule (ops/pallas_forces.py, ``axis_comm="ring"``
+ ``symmetric``) only engages on multi-device meshes, which this environment
cannot provide on real hardware -- but its one NEW kernel,
``_pair_kernel_sym_dense`` (full-block one-sided compute with mirrored
column accumulation), is an ordinary single-core pallas_call.  This tool
lowers and runs it on the real chip and checks both outputs against the
plain dense kernel:

* row sums must equal the dense launch over the same (rows x cols) slab
  (identical pair order -> bitwise);
* the mirrored column sums must equal the dense launch with the operand
  roles swapped (forces ON the column agents FROM the row agents), up to
  f32 reduction order.

Run on the TPU host: ``python tools/tpu_symring_check.py``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp
    from carla_social_force_model_tpu.models.params import MoussaidParams
    from carla_social_force_model_tpu.ops import pallas_forces as PF

    print(f"backend: {jax.default_backend()}", flush=True)
    interpret = jax.default_backend() != "tpu"

    rng = np.random.default_rng(7)
    n_rows, n_cols = 768, 1024
    tr, tc = 192, 512
    rows = [jnp.asarray(rng.uniform(-30, 30, (n_rows,)), jnp.float32)
            for _ in range(2)]
    rows += [jnp.asarray(rng.uniform(-2, 2, (n_rows,)), jnp.float32)
             for _ in range(2)]
    rows += [jnp.full((n_rows,), 0.3, jnp.float32)]
    cols = [jnp.asarray(rng.uniform(-30, 30, (n_cols,)), jnp.float32)
            for _ in range(2)]
    cols += [jnp.asarray(rng.uniform(-2, 2, (n_cols,)), jnp.float32)
             for _ in range(2)]
    cols += [jnp.full((n_cols,), 0.3, jnp.float32)]
    alive_r = jnp.asarray(rng.uniform(size=n_rows) < 0.9)
    alive_c = jnp.asarray(rng.uniform(size=n_cols) < 0.9)

    row_1d = PF._stage(*rows, alive_r, n_rows)
    col_1d = PF._stage(*cols, alive_c, n_cols)
    row_bb = PF._bboxes(row_1d, alive_r, n_rows, tr)
    col_bb = PF._bboxes(col_1d, alive_c, n_cols, tc)
    row_args = [a.reshape(n_rows, 1) for a in row_1d]
    col_args = [a.reshape(1, n_cols) for a in col_1d]
    # the swapped-role slab: column agents as rows, row agents as columns;
    # re-stage with the roles' own tile-multiple padding
    n_rows_T = PF._round_up(n_cols, tr)
    n_cols_T = PF._round_up(n_rows, tc)
    row_1d_T = PF._stage(*cols, alive_c, n_rows_T)
    col_1d_T = PF._stage(*rows, alive_r, n_cols_T)
    row_args_T = [a.reshape(n_rows_T, 1) for a in row_1d_T]
    col_args_T = [a.reshape(1, n_cols_T) for a in col_1d_T]
    row_bb_T = PF._bboxes(row_1d_T, alive_c, n_cols, tr)
    col_bb_T = PF._bboxes(col_1d_T, alive_r, n_rows, tc)

    import functools
    prm = PF._params_vec(MoussaidParams())
    for cutoff in (None, 25.0):
        call = functools.partial(
            PF._slab_call, prm=prm, use_radius=False, tr=tr, tc=tc,
            cutoff=cutoff, interpret=interpret)
        fxr, fyr = jax.jit(lambda c=call: c(row_args, row_bb, col_args,
                                            col_bb))()
        sx, sy, scx, scy = jax.jit(
            lambda c=call: c(row_args, row_bb, col_args, col_bb,
                             sym_dense=True))()
        np.testing.assert_array_equal(np.asarray(sx), np.asarray(fxr))
        np.testing.assert_array_equal(np.asarray(sy), np.asarray(fyr))
        call_T = functools.partial(
            PF._slab_call, prm=prm, use_radius=False, tr=tr, tc=tc,
            cutoff=cutoff, interpret=interpret)
        gxT, gyT = jax.jit(lambda c=call_T: c(row_args_T, row_bb_T,
                                              col_args_T, col_bb_T))()
        np.testing.assert_allclose(np.asarray(scx)[0],
                                   np.asarray(gxT)[:n_cols, 0],
                                   rtol=2e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(scy)[0],
                                   np.asarray(gyT)[:n_cols, 0],
                                   rtol=2e-4, atol=3e-5)
        print(f"cutoff={cutoff}: rows bitwise-equal, mirrored cols allclose "
              f"(max |fxc| {float(jnp.max(jnp.abs(scx))):.3e})", flush=True)
    print("sym_dense Mosaic lowering OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
