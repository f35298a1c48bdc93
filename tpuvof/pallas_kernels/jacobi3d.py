"""Fused 3-D Jacobi pressure iterations (VMEM-resident, chunk-streamed).

The XLA 3-D path pays ~70 GB/s effective for every shifted-slice stencil
pass (BASELINE.md analysis), and the Jacobi phase is 10 such passes per
step. This kernel keeps p in VMEM across all iterations: HBM traffic drops
from 10x(read p + write p + read rhs) to one read of (p, rhs) and one write
of p.

Round-1 limitation removed: the first version computed each iteration as
six whole-volume shifted reads, which made Mosaic keep ~8 padded volumes
live and capped the kernel at ~112^3. This rewrite walks the i-axis in
B-plane chunks per iteration, so the live set is p (aliased in/out) + rhs
+ O(B)-plane temporaries — the reference's full 200^3 workload
(3dvof.py:20-22) now fits in the v5e's 128 MB VMEM.

Exact-Jacobi bookkeeping: a chunk updates planes [i0, i0+B) in place after
reading the extended block [i0-1, i0+B+1). Plane i0-1 was already
overwritten by the previous chunk, so each chunk stashes the *old* value of
its last plane in a one-plane scratch and the next chunk splices it back —
every neighbor read sees previous-iteration values, exactly like the XLA
path's out-of-place update.

Boundary handling keeps round 1's two tricks (they are load-bearing for
parity — see the git history of this file):
- ghost-zeroing instead of edge-zeroed coefficient volumes: the reference
  zeroes the off-diagonal coefficients at the walls (3dvof.py:269-275);
  with *constant* off-diagonals the same numbers result if the iterate's
  ghost ring is zero. No downstream consumer reads the zeroed ring: the
  correction kernel masks every ghost-adjacent row and the simulate-exit
  BC re-mirrors p before the state is returned.
- the position-dependent diagonal 1/ap is selected from the 8
  f64-precomputed edge-class constants, replicating the XLA path's
  ((((ae+aw)+an)+a_s)+ab)+af accumulation bit-for-bit after the f32 cast.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid3D
from .step3d import _gib_vec

__all__ = ["jacobi3d_fits_vmem", "pallas_jacobi_3d",
           "streamed_jacobi_3d"]


def _padded_dims(g: Grid3D):
    n1 = ((g.ny + 9) // 8) * 8
    n2 = ((g.nz + 129) // 128) * 128
    return g.nx + 2, n1, n2


def _vmem_need(g: Grid3D, b: int, nloc: int | None = None,
               plane: tuple[int, int] | None = None) -> int:
    """Measured VMEM allocation structure of the resident kernel (XLA's
    own OOM dump at the 512^3/2x8 shard shape, round 5): ONE resident
    volume (the p output window — the input streams from HBM through the
    rhs_buf staging during the ghost-zero pass; before round 5 p was a
    VMEM in-spec and Mosaic allocated input AND output windows, 2x vol,
    which sank exactly the beyond-envelope shapes this model admitted) +
    the declared scratch (rhs_buf (2,B,plane) + wplane (1,plane)) + a
    register-spill/code margin (observed 1.5-2.7 MB; 6 MB keeps the
    rejected shapes rejected with headroom). plane: padded (n1, n2)
    override for the pencil engine, whose local planes are smaller than
    the global ones."""
    n0, n1, n2 = _padded_dims(g)
    if nloc is not None:
        n0 = nloc + 2
    if plane is not None:
        n1, n2 = plane
    vol = n0 * n1 * n2 * 4
    return vol + (2 * b + 1) * n1 * n2 * 4 + 6 * 2**20


def _pick_chunk(nx: int, g: Grid3D | None = None,
                nloc: int | None = None,
                plane: tuple[int, int] | None = None) -> int | None:
    """Largest divisor chunk whose working set fits VMEM (smaller chunks
    shrink only the temporaries; p and rhs stay whole-volume). `nx` is the
    plane count being chunked (= nloc when given)."""
    for b in (8, 4, 2, 1):
        if nx % b == 0 and (g is None
                            or _vmem_need(g, b, nloc, plane) <= 120 * 2**20):
            return b
    return None


def jacobi3d_fits_vmem(g: Grid3D) -> bool:
    return _pick_chunk(g.nx, g) is not None


def _kernel(p_ref, rhs_ref, gib, out_ref, wplane, rhs_buf, sem,
            *, g: Grid3D, n_iter: int, B: int, nloc: int,
            njl: int | None = None):
    # rhs_buf has two slots: chunk c+1's rhs DMA is issued before chunk c's
    # compute, hiding the 250 per-chunk-per-iteration HBM waits that
    # serialized the round-1 kernel.
    # plane dims from the (possibly lane/sublane-padded) buffers; masks use
    # explicit grid bounds so the pad region is held at zero.
    # nloc/gib: the volume holds local planes whose plane l has GLOBAL
    # i-index gib[0] + l (serial: nloc = g.nx, gib = [0]; gib is an SMEM
    # scalar because the shard offset is traced under shard_map). The masks
    # are global, so the distributed wide-halo caller (parallel/dist3d.py)
    # runs the identical kernel on an extended shard block: planes outside
    # the global interior stay zero (the Neumann wall condition needs
    # exactly that), halo-edge planes go progressively stale and are
    # discarded.
    gi_base = gib[0]
    n1p, n2p = p_ref.shape[1], p_ref.shape[2]
    dtype = p_ref.dtype
    nc = nloc // B
    bshape = (B, n1p, n2p)

    # ---- zero the ghost ring + pad region (chunk-wise; stands in for the
    # edge-zeroed coefficients — interior values never read a nonzero ghost)
    j = lax.broadcasted_iota(jnp.int32, bshape, 1)
    k = lax.broadcasted_iota(jnp.int32, bshape, 2)
    if njl is None:
        # serial/slab: local j IS global j; rows past ny+1 are pad
        ghost_jk = (j == 0) | (j >= g.ny + 1) | (k == 0) | (k >= g.nz + 1)
    else:
        # pencil: block-edge rows (0, njl+1) and the sublane pad are
        # zeroed like the i block ghosts (never updated; erosion covers
        # their staleness), true-wall rows (gj 0 / ny+1) sit mid-block
        gj = j + gib[1]
        ghost_jk = ((j == 0) | (j >= njl + 1)
                    | (gj <= 0) | (gj >= g.ny + 1)
                    | (k == 0) | (k >= g.nz + 1))
    iota0 = lax.broadcasted_iota(jnp.int32, bshape, 0)

    def ghost_for(i0):
        # global-i ghost: positions at/beyond the true walls stay zero
        # (serial chunks never contain them — mask compiles away)
        gi = iota0 + (i0 + gi_base)
        return ghost_jk | (gi <= 0) | (gi >= g.nx + 1)

    # p arrives from HBM chunk-wise through the rhs staging buffer (free
    # until the iteration loop starts): a VMEM in-spec would make Mosaic
    # allocate a second whole-volume window next to the output's —
    # input_output_aliases aliases the HBM buffers, NOT the VMEM windows
    # — which is exactly 2x vol and sank the beyond-envelope shapes
    # (512^3/2x8 shard: 138.5M of 128M, XLA OOM dump, round 5). Every
    # out_ref plane is written here before any iteration reads it.
    def p_dma(slot, c):
        return pltpu.make_async_copy(
            p_ref.at[pl.ds(1 + c * B, B)], rhs_buf.at[slot], sem.at[slot])

    def zero_body(c, _):
        slot = lax.rem(c, 2)
        pl.when(c + 1 < nc)(
            lambda: p_dma(lax.rem(c + 1, 2), c + 1).start())
        p_dma(slot, c).wait()
        i0 = 1 + c * B
        out_ref[pl.ds(i0, B)] = jnp.where(ghost_for(i0), 0.0,
                                          rhs_buf[slot])
        return 0

    p_dma(0, 0).start()

    lax.fori_loop(0, nc, zero_body, 0)
    zp = jnp.zeros((1, n1p, n2p), dtype)
    out_ref[pl.ds(0, 1)] = zp
    out_ref[pl.ds(nloc + 1, 1)] = zp

    # ---- the 8 edge-class diagonal constants (f64 accumulation order of
    # solver3d._poisson_coeffs_3d, cast to the field dtype) ----
    dxi2 = np.float64(g.dxi) ** 2
    dyi2 = np.float64(g.dyi) ** 2
    dzi2 = np.float64(g.dzi) ** 2

    def const(ex, ey, ez):
        t = dxi2 if ex else dxi2 + dxi2
        for _ in range(2 - ey):
            t = t + dyi2
        for _ in range(2 - ez):
            t = t + dzi2
        return jnp.asarray(-1.0 / t, dtype)

    cx = jnp.asarray(dxi2, dtype)
    cy = jnp.asarray(dyi2, dtype)
    cz = jnp.asarray(dzi2, dtype)

    if njl is None:
        ey = (j == 1) | (j == g.ny)
    else:
        ey = (gj == 1) | (gj == g.ny)
    ez = (k == 1) | (k == g.nz)

    def ap_inv_for(i0):
        gi = lax.broadcasted_iota(jnp.int32, bshape, 0) + (i0 + gi_base)
        ex = (gi == 1) | (gi == g.nx)
        return jnp.where(
            ex,
            jnp.where(ey, jnp.where(ez, const(1, 1, 1), const(1, 1, 0)),
                      jnp.where(ez, const(1, 0, 1), const(1, 0, 0))),
            jnp.where(ey, jnp.where(ez, const(0, 1, 1), const(0, 1, 0)),
                      jnp.where(ez, const(0, 0, 1), const(0, 0, 0))),
        )

    first = lax.broadcasted_iota(jnp.int32, bshape, 0) == 0

    def rhs_dma(slot, c):
        return pltpu.make_async_copy(
            rhs_ref.at[pl.ds(1 + c * B, B)],
            rhs_buf.at[slot], sem.at[slot])

    def iter_body(it, carry):
        # old-west plane for chunk 0 is the (permanently zero) ghost plane
        wplane[:] = jnp.zeros((1, n1p, n2p), dtype)

        @pl.when(it == 0)
        def _():
            rhs_dma(0, 0).start()

        def chunk_body(c, _):
            i0 = 1 + c * B
            # slots follow the GLOBAL chunk counter (nc may be odd, so c%2
            # alone would mis-pair the cross-iteration prefetch)
            k = it * nc + c
            slot = lax.rem(k, 2)
            # prefetch next chunk's rhs (wraps to chunk 0 for the next
            # iteration)
            nxt = lax.rem(c + 1, nc)
            pl.when((c + 1 < nc) | (it + 1 < n_iter))(
                lambda: rhs_dma(lax.rem(k + 1, 2), nxt).start())
            # read ONLY not-yet-written planes [i0, i0+B+1): chunk c-1 wrote
            # [i0-B, i0), so no load here ever touches a plane stored through
            # a dynamic slice earlier in this iteration (a read-after-write
            # pattern that miscompiled at 128^3 — the west neighbor comes
            # from the rolling scratch instead)
            ext = out_ref[pl.ds(i0, B + 1)]
            center = lax.slice_in_dim(ext, 0, B, axis=0)
            east = lax.slice_in_dim(ext, 1, B + 1, axis=0)
            west = jnp.where(first, wplane[:], jnp.roll(center, 1, axis=0))
            wplane[:] = lax.slice_in_dim(ext, B - 1, B, axis=0)  # old last
            rhs_dma(slot, c).wait()
            rhs = rhs_buf[slot]
            # subtraction order matches the XLA path: e, w, n, s, f, b
            val = (
                rhs
                - cx * east
                - cx * west
                - cy * jnp.roll(center, -1, axis=1)
                - cy * jnp.roll(center, 1, axis=1)
                - cz * jnp.roll(center, -1, axis=2)
                - cz * jnp.roll(center, 1, axis=2)
            ) * ap_inv_for(i0)
            out_ref[pl.ds(i0, B)] = jnp.where(ghost_for(i0), 0.0, val)
            return 0

        lax.fori_loop(0, nc, chunk_body, 0)
        return carry

    lax.fori_loop(0, n_iter, iter_body, 0)


def _streamed_iter_kernel(p_hbm, rhs_hbm, p_out, pbuf, rbuf, obuf,
                          isems, osems,
                          *, g: Grid3D, B: int):
    """ONE out-of-place Jacobi iteration with p, rhs, and the output all
    HBM-resident: chunks of B planes stream through VMEM double-buffered
    (prefetch chunk c+1's p-ext/rhs while computing chunk c). Out-of-place
    means no old-west-plane bookkeeping: the ext read [i0-1, i0+B+1) comes
    entirely from the UNTOUCHED input volume, exactly the XLA path's
    update. Ghost semantics are applied at READ time (the input's ghost
    ring holds the previous step's BC mirrors on iteration 0): every
    loaded plane is masked to zero on the global ghost ring before the
    stencil, and the stored planes re-mask, so the returned volume has
    the same zeroed ghost ring as the resident kernel (_kernel)."""
    nx = g.nx
    n1p, n2p = p_hbm.shape[1], p_hbm.shape[2]
    dtype = p_hbm.dtype
    nc = nx // B
    eshape = (B + 2, n1p, n2p)
    bshape = (B, n1p, n2p)

    # masks are built at the shape they are USED at, never sliced: slicing
    # a value that is constant along axis 0 (a broadcast layout) crashes
    # Mosaic's vector_extract_strided_slice ("limits[i] <= dim(i)")
    j = lax.broadcasted_iota(jnp.int32, eshape, 1)
    k = lax.broadcasted_iota(jnp.int32, eshape, 2)
    ghost_jk = (j == 0) | (j >= g.ny + 1) | (k == 0) | (k >= g.nz + 1)
    iota0 = lax.broadcasted_iota(jnp.int32, eshape, 0)
    jb = lax.broadcasted_iota(jnp.int32, bshape, 1)
    kb = lax.broadcasted_iota(jnp.int32, bshape, 2)
    ghost_jk_b = ((jb == 0) | (jb >= g.ny + 1) | (kb == 0)
                  | (kb >= g.nz + 1))
    eyb = (jb == 1) | (jb == g.ny)
    ezb = (kb == 1) | (kb == g.nz)
    iota0b = lax.broadcasted_iota(jnp.int32, bshape, 0)

    # ---- the 8 edge-class diagonal constants (f64 accumulation order of
    # solver3d._poisson_coeffs_3d, cast to the field dtype — identical
    # code path to the resident kernel so the two agree bit-for-bit) ----
    dxi2 = np.float64(g.dxi) ** 2
    dyi2 = np.float64(g.dyi) ** 2
    dzi2 = np.float64(g.dzi) ** 2

    def const(ex, ey, ez):
        t = dxi2 if ex else dxi2 + dxi2
        for _ in range(2 - ey):
            t = t + dyi2
        for _ in range(2 - ez):
            t = t + dzi2
        return jnp.asarray(-1.0 / t, dtype)

    cx = jnp.asarray(dxi2, dtype)
    cy = jnp.asarray(dyi2, dtype)
    cz = jnp.asarray(dzi2, dtype)

    def in_dma(slot, c):
        i0 = c * B  # ext start (plane i0 .. i0+B+1), global ghost at 0
        return (
            pltpu.make_async_copy(p_hbm.at[pl.ds(i0, B + 2)],
                                  pbuf.at[slot], isems.at[slot, 0]),
            pltpu.make_async_copy(rhs_hbm.at[pl.ds(1 + c * B, B)],
                                  rbuf.at[slot], isems.at[slot, 1]),
        )

    def out_dma(slot, c):
        return pltpu.make_async_copy(obuf.at[slot],
                                     p_out.at[pl.ds(1 + c * B, B)],
                                     osems.at[slot])

    for d in in_dma(0, 0):
        d.start()

    def chunk_body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            for d in in_dma(lax.rem(c + 1, 2), c + 1):
                d.start()

        for d in in_dma(slot, c):
            d.wait()
        gi = iota0 + c * B  # ext plane l has global i-index c*B + l
        ghost = ghost_jk | (gi <= 0) | (gi >= nx + 1)
        ext = jnp.where(ghost, 0.0, pbuf[slot])
        center = lax.slice_in_dim(ext, 1, B + 1, axis=0)
        east = lax.slice_in_dim(ext, 2, B + 2, axis=0)
        west = lax.slice_in_dim(ext, 0, B, axis=0)
        gic = iota0b + (1 + c * B)
        ex = (gic == 1) | (gic == nx)
        ap_inv = jnp.where(
            ex,
            jnp.where(eyb, jnp.where(ezb, const(1, 1, 1), const(1, 1, 0)),
                      jnp.where(ezb, const(1, 0, 1), const(1, 0, 0))),
            jnp.where(eyb, jnp.where(ezb, const(0, 1, 1), const(0, 1, 0)),
                      jnp.where(ezb, const(0, 0, 1), const(0, 0, 0))),
        )
        # subtraction order matches the XLA path: e, w, n, s, f, b
        val = (
            rbuf[slot]
            - cx * east
            - cx * west
            - cy * jnp.roll(center, -1, axis=1)
            - cy * jnp.roll(center, 1, axis=1)
            - cz * jnp.roll(center, -1, axis=2)
            - cz * jnp.roll(center, 1, axis=2)
        ) * ap_inv
        gh_c = ghost_jk_b | (gic <= 0) | (gic >= nx + 1)

        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        obuf[slot] = jnp.where(gh_c, 0.0, val)
        out_dma(slot, c).start()
        return 0

    lax.fori_loop(0, nc, chunk_body, 0, unroll=False)
    # drain the last (up to) two in-flight output DMAs, then write the
    # output volume's ghost planes (never stored by the chunk loop) from a
    # zeroed slot
    for c in range(max(0, nc - 2), nc):
        out_dma(c % 2, c).wait()
    obuf[0, 0:1] = jnp.zeros((1, n1p, n2p), dtype)
    lo = pltpu.make_async_copy(obuf.at[0, pl.ds(0, 1)],
                               p_out.at[pl.ds(0, 1)], osems.at[0])
    hi = pltpu.make_async_copy(obuf.at[0, pl.ds(0, 1)],
                               p_out.at[pl.ds(nx + 1, 1)], osems.at[1])
    lo.start()
    hi.start()
    lo.wait()
    hi.wait()


def streamed_jacobi_3d(g: Grid3D, n_iter: int, p, rhs,
                       interpret: bool = False):
    """Beyond-VMEM fixed-iteration Jacobi (VERDICT r3 #4): p stays
    HBM-resident and each iteration streams it through VMEM out-of-place
    (read p + rhs, write p' = ~3 volumes of HBM traffic per iteration vs
    the resident kernel's amortized ~3 volumes TOTAL). Same update rule
    as `pallas_jacobi_3d` (same edge-class constants, same subtraction
    order, same zeroed ghost ring; agrees with it to 1 ulp over 10 f64
    iterations — tests/test_3d.py); serial x-slab layout only
    (the distributed engines shard the volume below the VMEM envelope
    already). n_iter unrolls as a Python loop of kernel launches — the
    per-launch cost is negligible against the ~300 MB streamed per
    iteration at 256^3."""
    n1p, n2p = p.shape[1], p.shape[2]
    B = None
    for b in (8, 4, 2):
        if g.nx % b == 0:
            B = b
            break
    if B is None:
        raise ValueError(f"streamed_jacobi_3d needs even nx (got {g.nx})")

    call = pl.pallas_call(
        partial(_streamed_iter_kernel, g=g, B=B),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, B + 2, n1p, n2p), p.dtype),
            pltpu.VMEM((2, B, n1p, n2p), p.dtype),
            pltpu.VMEM((2, B, n1p, n2p), p.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(124 * 2**20,
                                 16 * (B + 2) * n1p * n2p * 4)),
        interpret=interpret,
    )
    for _ in range(n_iter):
        p = call(p, rhs)
    return p


def pallas_jacobi_3d(g: Grid3D, n_iter: int, p, rhs, interpret: bool = False,
                     nloc: int | None = None, gi_base: int = 0,
                     njl: int | None = None, gj_base=0):
    """p, rhs: full (nloc+2, ny_pad, nz_pad) volumes (serial: nloc = g.nx);
    rhs must be zero outside the global interior. Returns the iterated p
    with a zeroed ghost ring (reconstructed by consumers). nloc/gi_base
    support the distributed wide-halo caller, njl/gj_base the pencil
    engine — see _kernel."""
    if nloc is None:
        nloc = g.nx
    n1p, n2p = p.shape[1], p.shape[2]
    B = _pick_chunk(nloc, g, nloc,
                    plane=None if njl is None else (n1p, n2p))
    return pl.pallas_call(
        partial(_kernel, g=g, n_iter=n_iter, B=B, nloc=nloc, njl=njl),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[
            # p streams from HBM through the rhs_buf staging in the
            # ghost-zero pass — a VMEM in-spec would cost a SECOND
            # whole-volume window (input_output_aliases aliases HBM
            # buffers, not VMEM windows; see _kernel / _vmem_need)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n1p, n2p), p.dtype),
                        pltpu.VMEM((2, B, n1p, n2p), p.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        # alias p's HBM buffer into the output's: every plane is consumed
        # by the ghost-zero DMAs before the output window writes back
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(p, rhs, _gib_vec(gi_base, gj_base, njl is not None))
