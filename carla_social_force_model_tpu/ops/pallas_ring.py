"""In-kernel ICI ring for the pairwise force under agent-sharding.

The jnp-level ring (ops/pallas_forces.py, ``axis_comm="ring"``) scans
``n_dev`` kernel launches with a ``ppermute`` between launches; XLA's async
collective permute overlaps each transfer with the previous block's
compute, but every rotated block stages through HBM and each ring step
pays a kernel-launch + scan-iteration boundary.  This module fuses the
whole ring into ONE ``pallas_call`` per device: the column block lives in
a double-buffered VMEM scratch, rotates with ``make_async_remote_copy``
RDMA over ICI while the current block's tiles compute, and the per-tile
force accumulator never leaves VMEM (ROADMAP #1; ring-attention-shaped
schedule for an order-free force sum).

Flow control (2 slots): a device may write ring block k+2 into a
neighbor's slot only after the neighbor is done *reading* that slot for
block k (compute + its own forwarding send).  Slot credits are REGULAR
semaphores granted right-to-left; the initial credit for slot 1 is seeded
at kernel start, after a neighbor barrier.  All semaphores drain to zero
before the kernel exits (no cross-invocation leakage).

Per-pair math, staging sentinels, and the per-pair cutoff masking are
shared with ops/pallas_forces (same ``_pair_tile``); results equal the
jnp ring / all-gather paths up to f32 summation order (tested on the
8-device CPU mesh in interpret mode).

Select with ``StepConfig.axis_comm = "ring_kernel"``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_forces import (_bboxes, _params_vec, _round_up, _stage,
                            _tile_fn)

#: distinct from any other collective in the program (barrier semaphore id)
_COLLECTIVE_ID = 11


def _single_named_axis() -> bool:
    """True when the trace-time axis env has exactly one named axis: then
    scalar LOGICAL device ids are used (the only form the pallas TPU
    interpreter implements); multi-axis meshes use MESH dict ids (compiled
    Mosaic only)."""
    try:
        from jax._src import core as _core
        env = _core.get_axis_env()
        return len([n for n in env.axis_sizes if n is not None]) <= 1
    except Exception:
        return False


def _dev_id(axis_name, idx, single_axis):
    if single_axis:
        return dict(device_id=idx,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
    return dict(device_id={axis_name: idx},
                device_id_type=pltpu.DeviceIdType.MESH)


def _ring_kernel(prm_ref, rbb_ref,
                 px_r, py_r, vx_r, vy_r, rad_r,
                 cols_ref, cbb_ref,
                 fx_ref, fy_ref,
                 comm_ref, commbb_ref, bbs_ref,
                 send_c, recv_c, send_b, recv_b, credit, mirror_sem,
                 *, n_dev, n_tr, n_tc, tr, tc, use_radius, cutoff,
                 exact_div, axis_name, flow_control, single_axis,
                 law="moussaid"):
    k = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my + n_dev - 1, n_dev)
    s = jax.lax.rem(k, 2)

    def descs(src_slot, dst_slot):
        """The (cols, bbox) RDMA pair for src->right-neighbor dst."""
        dc = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[src_slot], dst_ref=comm_ref.at[dst_slot],
            send_sem=send_c.at[src_slot], recv_sem=recv_c.at[dst_slot],
            **_dev_id(axis_name, right, single_axis))
        db = pltpu.make_async_remote_copy(
            src_ref=commbb_ref.at[src_slot], dst_ref=commbb_ref.at[dst_slot],
            send_sem=send_b.at[src_slot], recv_sem=recv_b.at[dst_slot],
            **_dev_id(axis_name, right, single_axis))
        return dc, db

    @pl.when((k == 0) & (i == 0) & (j == 0))
    def _init():
        comm_ref[0] = cols_ref[...]
        commbb_ref[0] = cbb_ref[...]
        if flow_control and n_dev > 1:
            # neighbor barrier: no RDMA may land before both sides entered
            barrier = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                barrier, inc=1, **_dev_id(axis_name, left, single_axis))
            pltpu.semaphore_signal(
                barrier, inc=1, **_dev_id(axis_name, right, single_axis))
            pltpu.semaphore_wait(barrier, 2)
            # seed the slot-1 credit on the device that sends into us
            pltpu.semaphore_signal(
                credit.at[1], inc=1,
                **_dev_id(axis_name, left, single_axis))

    @pl.when((i == 0) & (j == 0))
    def _ring_step():
        @pl.when(k > 0)
        def _recv():
            # block k landed in slot s (sent by the left neighbor at k-1)
            dc, db = descs(1 - s, s)
            dc.wait_recv()
            db.wait_recv()

        if cutoff is not None:
            # mirror this step's tile bboxes into SMEM: the per-(i, j)
            # cutoff test reads them as scalars at a dynamic tile index,
            # which VMEM vector loads cannot do (lane alignment) but SMEM
            # scalar loads can -- same layout as the rbb scalar-prefetch
            mirror = pltpu.make_async_copy(
                commbb_ref.at[s], bbs_ref.at[s], mirror_sem)
            mirror.start()
            mirror.wait()

        @pl.when(k < n_dev - 1)
        def _send():
            # forward block k to the right for its step k+1; slot 1-s over
            # there is free once its step-(k-1) use completed (credit)
            if flow_control:
                pltpu.semaphore_wait(credit.at[1 - s], 1)
            dc, db = descs(s, 1 - s)
            dc.start()
            db.start()

    @pl.when((k == 0) & (j == 0))
    def _zero():
        fx_ref[...] = jnp.zeros_like(fx_ref)
        fy_ref[...] = jnp.zeros_like(fy_ref)

    if cutoff is not None:
        gx = jnp.maximum(jnp.maximum(bbs_ref[s, 0, j] - rbb_ref[1, i],
                                     rbb_ref[0, i] - bbs_ref[s, 1, j]),
                         0.0)
        gy = jnp.maximum(jnp.maximum(bbs_ref[s, 2, j] - rbb_ref[3, i],
                                     rbb_ref[2, i] - bbs_ref[s, 3, j]),
                         0.0)
        run_tile = gx * gx + gy * gy <= cutoff * cutoff
    else:
        run_tile = True

    # per-law tile dispatch (same registry as every other pair launch,
    # ops/pallas_forces._tile_fn); for law="helbing" the ROW velocity
    # planes carry the desired directions (staged by the caller), the
    # rotating column block always carries true velocities
    tile = _tile_fn(law, prm_ref, use_radius=use_radius, tr=tr, tc=tc,
                    cutoff=cutoff, exact_div=exact_div, alu_exp=False,
                    alu_recip=False)

    @pl.when(run_tile)
    def _compute():
        block = comm_ref[s, :, pl.ds(j * tc, tc)]       # (5, tc) VMEM load
        tile(px_r[...], py_r[...], vx_r[...], vy_r[...], rad_r[...],
             block[0:1], block[1:2], block[2:3], block[3:4], block[4:5],
             fx_ref, fy_ref)

    @pl.when((i == n_tr - 1) & (j == n_tc - 1))
    def _drain():
        # end of ring step k: our forwarding send (if any) must finish
        # before this slot may be overwritten, then grant the slot back
        @pl.when(k < n_dev - 1)
        def _():
            dc, db = descs(s, 1 - s)
            dc.wait_send()
            db.wait_send()

        if flow_control and n_dev > 2:
            # slot s frees at end of step k; the next send INTO it is the
            # left neighbor's step-(k+1) send (targets slot (k+2)%2 == s),
            # which exists iff k+1 <= n_dev-2
            @pl.when(k <= n_dev - 3)
            def _():
                pltpu.semaphore_signal(
                    credit.at[s], inc=1,
                    **_dev_id(axis_name, left, single_axis))


def pedestrian_force_pallas_ring(pos, vel, radius, alive, p,
                                 axis_name: str,
                                 use_ped_radius: bool = False,
                                 row_tile: int = 192, col_tile: int = 512,
                                 interpret: bool = False,
                                 cutoff: float | None = None,
                                 planar_out: bool = False,
                                 exact_div: bool = False,
                                 vmem_mb: int = 64,
                                 law: str = "moussaid",
                                 desired=None):
    """In-kernel-ring drop-in for ``pedestrian_force_pallas`` under
    shard_map with rows sharded over ``axis_name`` (see module docstring).

    ``law`` selects the pair-force family through the shared tile registry
    (ops/pallas_forces._tile_fn): ``"moussaid"`` (default), ``"powerlaw"``
    (PowerLawParams), or ``"helbing"`` (PedRepulsiveParams; ``desired`` --
    planar ``(ex, ey)`` unit desired directions -- is then required and
    rides in the row velocity planes, exactly as in the non-ring
    launches).  The rotating column block is law-independent (positions,
    true velocities, radii), so the ring schedule is unchanged.
    """
    from .vecmath import split_xy
    px, py = split_xy(pos)
    vx, vy = split_xy(vel)
    n = px.shape[0]
    tr, tc = row_tile, col_tile
    if law == "helbing":
        if desired is None:
            raise ValueError("law='helbing' needs desired=(ex, ey) planes")
        row_vx, row_vy = desired
    elif desired is not None:
        raise ValueError(f"desired planes only apply to law='helbing', "
                         f"got law={law!r}")
    else:
        row_vx, row_vy = vx, vy
    if not interpret and tc % 128:
        raise ValueError(
            f"ring_kernel col_tile must be a multiple of 128 lanes on "
            f"hardware (the in-kernel column-block slice is lane-offset "
            f"by j*col_tile), got {tc}")
    n_dev = jax.lax.axis_size(axis_name)

    n_rows = _round_up(max(n, tr), tr)
    n_cols = _round_up(max(n, tc), tc)
    n_tr = n_rows // tr
    n_tc = n_cols // tc

    row_1d = _stage(px, py, row_vx, row_vy, radius, alive, n_rows)
    row_bb = _bboxes(row_1d, alive, n, tr)          # (4, n_tr) SMEM
    row_args = [a.reshape(n_rows, 1) for a in row_1d]
    col_1d = _stage(px, py, vx, vy, radius, alive, n_cols)
    # the comm buffers rotate with sliced DMAs (comm_ref.at[slot]), and
    # Mosaic requires DMA slice sublane extents to be multiples of the
    # (8, 128) VMEM tile -- pad the plane axis 5 -> 8 (and 4 -> 8 for the
    # bboxes) with zero planes; the kernel only reads planes it uses
    cols = jnp.stack(col_1d)                        # (5, n_cols) VMEM
    cols = jnp.concatenate(
        [cols, jnp.zeros((3, n_cols), cols.dtype)])  # (8, n_cols)
    n_tc_pad = _round_up(n_tc, 128)                 # lane-dim DMA alignment
    col_bb = _bboxes(col_1d, alive, n, tc)          # (4, n_tc) VMEM
    col_bb = jnp.concatenate(
        [col_bb, jnp.zeros((4, n_tc), col_bb.dtype)])  # (8, n_tc)
    col_bb = jnp.pad(col_bb, ((0, 0), (0, n_tc_pad - n_tc)))

    grid = (n_dev, n_tr, n_tc)
    row_spec = pl.BlockSpec((tr, 1), lambda k, i, j, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tr, 1), lambda k, i, j, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    # the pallas TPU interpreter implements remote DMA but not remote
    # semaphore signals; its cooperative per-device scheduling cannot
    # overrun a slot, so the credit/barrier flow control is hardware-only.
    # Mosaic rejects a collective_id unless the kernel actually takes the
    # barrier semaphore, so both follow the same predicate (a 1-device
    # ring has no neighbor to barrier with).
    flow_control = not interpret and n_dev > 1
    kernel = functools.partial(
        _ring_kernel, n_dev=n_dev, n_tr=n_tr, n_tc=n_tc, tr=tr, tc=tc,
        use_radius=use_ped_radius,
        cutoff=float(cutoff) if cutoff is not None else None,
        exact_div=exact_div, axis_name=axis_name,
        flow_control=flow_control, single_axis=_single_named_axis(),
        law=law)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[row_spec] * 5 + [full, full],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, 8, n_cols), jnp.float32),
            pltpu.VMEM((2, 8, n_tc_pad), jnp.float32),
            pltpu.SMEM((2, 8, n_tc_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    fx, fy = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, 1), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=int(40 * n_rows * n_cols * n_dev),
            bytes_accessed=int(4 * (5 * n_cols * n_dev + 7 * n_rows)),
            transcendentals=int(5 * n_rows * n_cols * n_dev)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb) * 1024 * 1024,
            collective_id=_COLLECTIVE_ID if flow_control else None,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(_params_vec(p, law), row_bb, *row_args, cols, col_bb)

    if planar_out:
        return fx[:n, 0].astype(px.dtype), fy[:n, 0].astype(py.dtype)
    return jnp.concatenate([fx[:n], fy[:n]], axis=-1).astype(px.dtype)
