"""Pallas TPU mega-kernel for the directional bead-pair spline ("quadspline").

This is the hot op of the force field: every force evaluation computes,
for every interacting site pair, two angular B-splines times two distance
B-splines (reference src/bead_interaction.h:30-84).  The XLA formulation
materializes (n1, n2, n_knot)-sized window-weight intermediates in HBM
every evaluation; this kernel keeps them in VMEM:

* the B-spline is evaluated as interval-selected cubic polynomials: the
  knot axis of the parameter table is poly-expanded once at prep time by
  a static linear map (_poly_matrix), the kernel Horner-evaluates on
  per-pair coefficient planes selected with one compare per interval —
  4x fewer selects than per-knot windows, and the backward pass reuses
  the same coefficient planes for the derivative,
* per (128 x 128) pair tile, all of a (segment, degree)'s interval planes
  come from ONE wide MXU matmul of the group-1 type one-hots against
  in-VMEM column-concatenated slabs of the pre-transposed,
  position-independent table (hoisted out of MD loops); nothing of size
  (n1, n2, M) touches HBM,
* a replica ensemble runs as a replica-block grid dimension
  (jax.custom_batching.custom_vmap): position data is blocked (RB
  replicas per grid step) while the type one-hots, parameter table and
  exclusion mask stay SHARED across the ensemble instead of being
  broadcast per replica by the default vmap rule,
* the backward pass is a second kernel implementing the reference's
  analytic derivative partition (bead_interaction.h:61-73); group-1
  cotangents accumulate in-place across j-tiles (the innermost grid
  dimension) so only group-2 needs a small XLA reduction.  Parameter-
  table cotangents come from an XLA einsum that XLA dead-code eliminates
  in MD (only position gradients are consumed there).

HBM traffic per evaluation: site data in, (n1, n2) values out.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
# replicas per grid step (VMEM-bounded; the backward kernel keeps more
# live tensors).  Env-overridable for benchmarking experiments.
RB_FWD = int(os.environ.get("UPSIDE_RB_FWD", "8"))
# 4 was the round-3 winner at 64 replicas; at the 256-replica operating
# point 8 measures slightly better end-to-end (bench_logs/r4k: full
# advance 23.006 vs 23.256 ms/eval, bench 11,419 vs 11,369 steps/s)
RB_BWD = int(os.environ.get("UPSIDE_RB_BWD", "8"))

# TIMING-ONLY (perf_loop): 1 replaces the backward kernel's poly-select
# recompute with cheap geometry-derived stand-ins, bounding the VPU
# savings a derivative-fields-from-forward design could reach
# (BENCH_NOTES round-5 target #1).  Numbers are WRONG under the mock —
# never enable outside a timing session.
MOCK_BWD = int(os.environ.get("UPSIDE_FUSED_BWD_MOCK", "0"))


def _resid_enabled():
    """Derivative-fields-from-forward (BENCH_NOTES round-5 target #1):
    under differentiation the fused forward additionally emits per-pair
    (val, d/d dist, d/d cos1, d/d cos2) planes through the custom_vjp
    residuals, and the backward consumes them instead of re-running the
    C-plane lookup + poly-select chains.  Trades ~4 f32 planes of HBM
    round trip for the backward's dominant VPU work.  Read at trace
    time so tests and A/B sessions can flip it per-jit.

    Default ON since round 5: measured 12,994 vs 11,698 steps/s @512
    replicas on the headline bench (bench_logs/r5b_0820_0516), gradient
    equivalence covered by test_fused_pairs.py (plain/vmapped/prep).
    Set UPSIDE_FUSED_RESID=0 to fall back to the recomputing backward
    (saves the planes residual's HBM footprint; see
    fused_pair_block_env docstring)."""
    return os.environ.get("UPSIDE_FUSED_RESID", "1") not in ("0", "",
                                                             "off")


def _round_up(x, m):
    return (x + m - 1) // m * m


# Uniform cubic B-spline basis, expanded in powers of the in-interval
# fraction t: value = sum_kk w_kk(t) * C[i-1+kk] = sum_d t^d * Q_d(i) with
# Q_d(i) = sum_kk BETA[kk][d] * C[i-1+kk].  Evaluating Horner on interval-
# selected poly coefficients needs one select per interval per coefficient
# instead of four compare+selects per KNOT — and the derivative reuses the
# same Q planes.
BETA = np.array([
    [1 / 6, -1 / 2, 1 / 2, -1 / 6],   # C[i-1]:  (1/6)(1-t)^3
    [4 / 6, 0.0, -1.0, 1 / 2],        # C[i]:    (1/6)(3t^3-6t^2+4)
    [1 / 6, 1 / 2, 1 / 2, -1 / 2],    # C[i+1]:  (1/6)(-3t^3+3t^2+3t+1)
    [0.0, 0.0, 0.0, 1 / 6],           # C[i+2]:  (1/6)t^3
], np.float64)


def _poly_matrix(ka, k):
    """Knot-axis linear map from the raw quadspline parameter rows
    [ang1 (ka), ang2 (ka), wide (k), narrow (k)] to per-interval cubic
    coefficients [(ka-3)*4, (ka-3)*4, (k-3)*4, (k-3)*4].  Applied to the
    parameter table once at prep time (position-independent)."""
    def seg(n):
        P = np.zeros((n, (n - 3) * 4), np.float64)
        for iv in range(n - 3):       # interval index i = iv + 1
            for kk in range(4):
                P[iv + kk, iv * 4:(iv + 1) * 4] = BETA[kk]
        return P
    blocks = [seg(ka), seg(ka), seg(k), seg(k)]
    M = ka * 2 + k * 2
    Mp = sum(b.shape[1] for b in blocks)
    P = np.zeros((M, Mp), np.float32)
    r = c = 0
    for b in blocks:
        P[r:r + b.shape[0], c:c + b.shape[1]] = b
        r += b.shape[0]
        c += b.shape[1]
    return P


def _poly_offsets(ka, k):
    """Slab offsets of the four segments in the poly-expanded table."""
    na, nd = (ka - 3) * 4, (k - 3) * 4
    return 0, na, 2 * na, 2 * na + nd


def _poly_accumulate(x_coord, n_knot, clamped, get_C, seg_offs, want_deriv):
    """Values (and optionally d/dx) of one or more spline segments sharing
    the coordinate `x_coord` ((RB, TI, TJ) blocks in the batched kernels).
    get_C(slab) returns the (TI, TJ) per-pair poly-coefficient plane, built
    on the fly from type one-hots — nothing of size (TI, TJ, M) is ever
    materialized.  Segments listed in seg_offs share the interval selects.

    Clamping comes out of the clipped coordinate for free: at x <= 1 the
    fraction t is 0 and Q_0(1) is exactly the reference's left boundary
    stencil (c0 + 4 c1 + c2)/6; at x >= n-2, t = 1 in the last interval
    gives the right stencil.  Only the derivative needs masking."""
    n = n_knot
    lo, hi = 1.0, float(n - 2)
    xc = jnp.clip(x_coord, lo, hi)
    i = jnp.clip(jnp.floor(xc).astype(jnp.int32), 1, n - 3)
    t = xc - i.astype(xc.dtype)

    n_int = n - 3
    sels = [i == (iv + 1) for iv in range(n_int)]
    nseg = len(seg_offs)
    Q = [[jnp.zeros_like(x_coord) for _ in range(4)] for _ in range(nseg)]
    TJ = x_coord.shape[-1]
    for si, off in enumerate(seg_offs):
        for d in range(4):
            # all of this (segment, degree)'s interval planes in one matmul
            C_all = get_C.group([off + iv * 4 + d for iv in range(n_int)])
            for iv in range(n_int):
                C = C_all[:, iv * TJ:(iv + 1) * TJ]
                if x_coord.ndim == 3:
                    C = C[None]
                Q[si][d] = jnp.where(sels[iv], C, Q[si][d])

    vals, ders = [], []
    for si in range(nseg):
        q0, q1, q2, q3 = Q[si]
        vals.append(((q3 * t + q2) * t + q1) * t + q0)
        if want_deriv:
            dv = (3.0 * q3 * t + 2.0 * q2) * t + q1
            if clamped:
                dv = jnp.where((x_coord <= lo) | (x_coord >= hi), 0.0, dv)
            ders.append(dv)
        else:
            ders.append(None)
    return vals, ders


def _geometry(x1_ref, x2t_ref):
    """Pair geometry from (RB, TI, 8) group-1 rows and the (RB, 8, TJ)
    transposed group-2 block: all (RB,TI,1) x (RB,1,TJ) broadcasts — no
    in-kernel gathers or transposes (Mosaic lowers those poorly)."""
    d1 = [x1_ref[:, :, c:c + 1] for c in (3, 4, 5)]       # each (RB, TI, 1)
    d2 = [x2t_ref[:, c:c + 1, :] for c in (3, 4, 5)]      # each (RB, 1, TJ)
    dx = x2t_ref[:, 0:1, :] - x1_ref[:, :, 0:1]
    dy = x2t_ref[:, 1:2, :] - x1_ref[:, :, 1:2]
    dz = x2t_ref[:, 2:3, :] - x1_ref[:, :, 2:3]
    dist2 = dx * dx + dy * dy + dz * dz + 1e-12
    inv_dist = jax.lax.rsqrt(dist2)
    dist = dist2 * inv_dist
    ux, uy, uz = dx * inv_dist, dy * inv_dist, dz * inv_dist
    cos1 = d1[0] * ux + d1[1] * uy + d1[2] * uz
    cos2 = -(d2[0] * ux + d2[1] * uy + d2[2] * uz)
    return d1, d2, dist, inv_dist, (ux, uy, uz), cos1, cos2


def _make_get_C(oh1_ref, t2t_ref, A):
    """Closure producing per-pair parameter planes from the type one-hots,
    shared across the RB replicas of the grid step.  get_C_group builds
    the planes of several slabs with ONE wider MXU matmul (the slabs are
    column-concatenated in VMEM first — tiny (2A, TJ) copies), so a
    segment's interval planes don't pay per-matmul issue overhead.

    Precision: the MXU's default single-pass matmul rounds f32 operands to
    bf16, which put ~3e-3 relative noise on every spline coefficient
    (caught on device by the bench.py Pallas-vs-XLA gate).  The slab
    therefore arrives split into bf16 hi + lo ROW halves per slab
    (t2t rows = [slab0 hi; slab0 lo; slab1 hi; ...], see _hilo_split),
    and the one-hot LHS — EXACT in bf16 — is column-duplicated so ONE
    K=2A matmul accumulates hi + lo in f32, reconstructing the table to
    ~2^-16 relative.  Because K=2A <= 128 still fits one systolic pass,
    this costs the same MXU cycles and the same instruction count as a
    single-bf16 lookup — double precision for free."""
    oh = oh1_ref[:, :].astype(jnp.bfloat16)
    ohcat = jnp.concatenate([oh, oh], axis=1)          # (TI, 2A)
    A2 = 2 * A

    def get_C(m):
        return jnp.dot(ohcat, t2t_ref[m * A2:(m + 1) * A2, :],
                       preferred_element_type=jnp.float32)

    def get_C_group(ms):
        rhs = jnp.concatenate(
            [t2t_ref[m * A2:(m + 1) * A2, :] for m in ms],
            axis=1)                                    # (2A, len(ms)*TJ)
        return jnp.dot(ohcat, rhs, preferred_element_type=jnp.float32)

    get_C.group = get_C_group
    return get_C


def _hilo_split(t2t):
    """f32 (P, A, N) -> bf16 (P*2A, N) with rows [hi; lo] per slab, so
    slab p's f32 value is recovered by a single K=2A one-hot matmul with
    duplicated LHS columns (see _make_get_C).

    The optimization_barrier is load-bearing: under jit, XLA (with its
    default allow-excess-precision algebraic simplification) folds the
    bf16->f32 up-convert of hi into a no-op, so lo becomes t2t - t2t = 0
    and the whole parameter table silently degrades to single-bf16
    precision (caught on device as a 2.8e-2 energy discrepancy vs
    interpret mode; the lo plane measured identically zero under jit,
    dense in eager).  The barrier sits between the down- and up-convert
    so the pair cannot be cancelled."""
    hi = t2t.astype(jnp.bfloat16)
    hi_f32 = jax.lax.optimization_barrier(hi).astype(jnp.float32)
    lo = (t2t - hi_f32).astype(jnp.bfloat16)
    P, A, N = t2t.shape
    return jnp.concatenate([hi, lo], axis=1).reshape(P * 2 * A, N)


def _fwd_kernel(ka, k, inv_dx, A, x1_ref, x2t_ref, oh1_ref, t2t_ref,
                mask_ref, out_ref):
    inv_dtheta = (ka - 3) / 2.0
    # tile-level sparsity: the exclusion mask is static per call (e.g. the
    # rotamer mask is upper-triangular, killing a third of the tiles);
    # fully-masked tiles skip all spline work
    alive = jnp.any(mask_ref[:, :] > 0)

    @pl.when(jnp.logical_not(alive))
    def _():
        out_ref[:, :, :] = jnp.zeros_like(out_ref)

    @pl.when(alive)
    def _():
        _, _, dist, _, _, cos1, cos2 = _geometry(x1_ref, x2t_ref)
        get_C = _make_get_C(oh1_ref, t2t_ref, A)

        o_a1, o_a2, o_w, o_n = _poly_offsets(ka, k)
        s = dist * inv_dx
        (a1,), _ = _poly_accumulate((cos1 + 1.0) * inv_dtheta + 1.0, ka,
                                    False, get_C, (o_a1,), False)
        (a2,), _ = _poly_accumulate((cos2 + 1.0) * inv_dtheta + 1.0, ka,
                                    False, get_C, (o_a2,), False)
        (wide, narrow), _ = _poly_accumulate(s, k, True, get_C,
                                             (o_w, o_n), False)
        live = (mask_ref[:, :] > 0)[None] & (s < (k - 2 - 1e-6))
        out_ref[:, :, :] = jnp.where(live, wide + a1 * a2 * narrow, 0.0)


def _bwd_kernel(ka, k, inv_dx, A, n_j, x1_ref, x2t_ref, oh1_ref, t2t_ref,
                mask_ref, g_ref, d1_ref, d2_ref):
    inv_dtheta = (ka - 3) / 2.0
    j = pl.program_id(2)
    alive = jnp.any(mask_ref[:, :] > 0)

    @pl.when(jnp.logical_not(alive))
    def _():
        # fully-masked tile: contributes nothing, but the d1 accumulator
        # must still be initialized on the first j step
        @pl.when(j == 0)
        def _():
            d1_ref[:, :, :] = jnp.zeros_like(d1_ref)
        d2_ref[0, :, :, :] = jnp.zeros_like(d2_ref[0])

    @pl.when(alive)
    def _():
        dir1, dir2, dist, inv_dist, (ux, uy, uz), cos1, cos2 = _geometry(
            x1_ref, x2t_ref)
        get_C = _make_get_C(oh1_ref, t2t_ref, A)

        o_a1, o_a2, o_w, o_n = _poly_offsets(ka, k)
        s = dist * inv_dx
        (a1,), (da1,) = _poly_accumulate(
            (cos1 + 1.0) * inv_dtheta + 1.0, ka, False, get_C, (o_a1,), True)
        (a2,), (da2,) = _poly_accumulate(
            (cos2 + 1.0) * inv_dtheta + 1.0, ka, False, get_C, (o_a2,), True)
        (wide, narrow), (dwide, dnarrow) = _poly_accumulate(
            s, k, True, get_C, (o_w, o_n), True)
        del wide

        live = (mask_ref[:, :] > 0)[None] & (s < (k - 2 - 1e-6))
        g = jnp.where(live, g_ref[:, :, :], 0.0)
        # reference derivative partition (bead_interaction.h:61-73)
        radial = g * (dwide + a1 * a2 * dnarrow) * inv_dx
        c1 = g * da1 * inv_dtheta * a2 * narrow
        c2 = g * da2 * inv_dtheta * a1 * narrow

        f1 = c1 * inv_dist
        f2 = c2 * inv_dist
        gx = (radial * ux + f1 * (dir1[0] - cos1 * ux)
              - f2 * (dir2[0] + cos2 * ux))
        gy = (radial * uy + f1 * (dir1[1] - cos1 * uy)
              - f2 * (dir2[1] + cos2 * uy))
        gz = (radial * uz + f1 * (dir1[2] - cos1 * uz)
              - f2 * (dir2[2] + cos2 * uz))

        # d_pos1 = -sum_j d_pos2; d_dir1 = sum_j c1*u.  j is the innermost
        # grid dimension, so the (rb, i) output block is revisited across
        # consecutive steps and can accumulate in place.
        cols = []
        for c, arr, sgn in ((0, gx, -1.0), (1, gy, -1.0), (2, gz, -1.0),
                            (3, c1 * ux, 1.0), (4, c1 * uy, 1.0),
                            (5, c1 * uz, 1.0)):
            cols.append(sgn * jnp.sum(arr, 2, keepdims=True))
        cols.append(jnp.zeros_like(cols[0]))
        cols.append(jnp.zeros_like(cols[0]))
        block = jnp.concatenate(cols, axis=2)          # (RB, TI, 8)

        @pl.when(j == 0)
        def _():
            d1_ref[:, :, :] = block

        @pl.when(j > 0)
        def _():
            d1_ref[:, :, :] = d1_ref[:, :, :] + block

        # d_pos2 rows (summed over i) land in per-i-tile partials (reduced
        # in XLA): the i dimension is not consecutive in this grid order.
        rows = []
        for c, arr, sgn in ((0, gx, 1.0), (1, gy, 1.0), (2, gz, 1.0),
                            (3, c2 * ux, -1.0), (4, c2 * uy, -1.0),
                            (5, c2 * uz, -1.0)):
            rows.append(sgn * jnp.sum(arr, 1, keepdims=True))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        d2_ref[0, :, :, :] = jnp.concatenate(rows, axis=1)  # (1, RB, 8, TJ)


def _colsum_fwd_kernel(ka, k, inv_dx, A, x1_ref, x2t_ref, oh1_ref, t2t_ref,
                       mask_ref, out_ref):
    """Column sums of w_i * quadspline(i, j): the coverage contraction
    (hbond.cpp:241-286) fused into the pair kernel, so the dense (n1, n2)
    value grid never exists.  The per-row weight w_i rides in column 6 of
    the x1 block; the (rb, j) output block accumulates across i-tiles
    (innermost grid dim)."""
    inv_dtheta = (ka - 3) / 2.0
    it = pl.program_id(2)
    alive = jnp.any(mask_ref[:, :] > 0)

    @pl.when(it == 0)
    def _():
        out_ref[:, :, :] = jnp.zeros_like(out_ref)

    @pl.when(alive)
    def _():
        _, _, dist, _, _, cos1, cos2 = _geometry(x1_ref, x2t_ref)
        get_C = _make_get_C(oh1_ref, t2t_ref, A)
        o_a1, o_a2, o_w, o_n = _poly_offsets(ka, k)
        s = dist * inv_dx
        (a1,), _ = _poly_accumulate((cos1 + 1.0) * inv_dtheta + 1.0, ka,
                                    False, get_C, (o_a1,), False)
        (a2,), _ = _poly_accumulate((cos2 + 1.0) * inv_dtheta + 1.0, ka,
                                    False, get_C, (o_a2,), False)
        (wide, narrow), _ = _poly_accumulate(s, k, True, get_C,
                                             (o_w, o_n), False)
        live = (mask_ref[:, :] > 0)[None] & (s < (k - 2 - 1e-6))
        w = x1_ref[:, :, 6:7]
        val = jnp.where(live, w * (wide + a1 * a2 * narrow), 0.0)
        out_ref[:, 0:1, :] = out_ref[:, 0:1, :] + jnp.sum(val, 1,
                                                          keepdims=True)


def _colsum_bwd_kernel(ka, k, inv_dx, A, x1_ref, x2t_ref, oh1_ref, t2t_ref,
                       mask_ref, g_ref, d1_ref, d2_ref):
    """Backward of the coverage contraction.  The pair cotangent is the
    rank-1 outer product w_i * g_j, built in-registers from the column-6
    weight and the (rb, 1, TJ) cotangent row; position/direction cotangents
    follow the reference derivative partition (bead_interaction.h:61-73)
    and dsum/dw_i lands in column 6 of d1."""
    inv_dtheta = (ka - 3) / 2.0
    j = pl.program_id(2)
    alive = jnp.any(mask_ref[:, :] > 0)

    @pl.when(jnp.logical_not(alive))
    def _():
        @pl.when(j == 0)
        def _():
            d1_ref[:, :, :] = jnp.zeros_like(d1_ref)
        d2_ref[0, :, :, :] = jnp.zeros_like(d2_ref[0])

    @pl.when(alive)
    def _():
        dir1, dir2, dist, inv_dist, (ux, uy, uz), cos1, cos2 = _geometry(
            x1_ref, x2t_ref)
        get_C = _make_get_C(oh1_ref, t2t_ref, A)
        o_a1, o_a2, o_w, o_n = _poly_offsets(ka, k)
        s = dist * inv_dx
        (a1,), (da1,) = _poly_accumulate(
            (cos1 + 1.0) * inv_dtheta + 1.0, ka, False, get_C, (o_a1,), True)
        (a2,), (da2,) = _poly_accumulate(
            (cos2 + 1.0) * inv_dtheta + 1.0, ka, False, get_C, (o_a2,), True)
        (wide, narrow), (dwide, dnarrow) = _poly_accumulate(
            s, k, True, get_C, (o_w, o_n), True)

        live = (mask_ref[:, :] > 0)[None] & (s < (k - 2 - 1e-6))
        w = x1_ref[:, :, 6:7]
        grow = g_ref[:, 0:1, :]
        g = jnp.where(live, w * grow, 0.0)
        radial = g * (dwide + a1 * a2 * dnarrow) * inv_dx
        c1 = g * da1 * inv_dtheta * a2 * narrow
        c2 = g * da2 * inv_dtheta * a1 * narrow

        f1 = c1 * inv_dist
        f2 = c2 * inv_dist
        gx = (radial * ux + f1 * (dir1[0] - cos1 * ux)
              - f2 * (dir2[0] + cos2 * ux))
        gy = (radial * uy + f1 * (dir1[1] - cos1 * uy)
              - f2 * (dir2[1] + cos2 * uy))
        gz = (radial * uz + f1 * (dir1[2] - cos1 * uz)
              - f2 * (dir2[2] + cos2 * uz))

        dw = jnp.where(live, grow * (wide + a1 * a2 * narrow), 0.0)

        cols = []
        for arr, sgn in ((gx, -1.0), (gy, -1.0), (gz, -1.0),
                         (c1 * ux, 1.0), (c1 * uy, 1.0), (c1 * uz, 1.0),
                         (dw, 1.0)):
            cols.append(sgn * jnp.sum(arr, 2, keepdims=True))
        cols.append(jnp.zeros_like(cols[0]))
        block = jnp.concatenate(cols, axis=2)          # (RB, TI, 8)

        @pl.when(j == 0)
        def _():
            d1_ref[:, :, :] = block

        @pl.when(j > 0)
        def _():
            d1_ref[:, :, :] = d1_ref[:, :, :] + block

        rows = []
        for arr, sgn in ((gx, 1.0), (gy, 1.0), (gz, 1.0),
                         (c2 * ux, -1.0), (c2 * uy, -1.0), (c2 * uz, -1.0)):
            rows.append(sgn * jnp.sum(arr, 1, keepdims=True))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        d2_ref[0, :, :, :] = jnp.concatenate(rows, axis=1)  # (1, RB, 8, TJ)


def _prep(table, t1, t2, x1, x2, mask, w1=None):
    """Pad to tiles and precompute the position-independent operands.
    x1, x2 carry a leading replica axis; w1 (optional per-row weights)
    ride in column 6 of the padded x1 block."""
    A, B, M = table.shape
    n_rep, n1, n2 = x1.shape[0], x1.shape[1], x2.shape[1]
    n1p, n2p = _round_up(n1, TILE), _round_up(n2, TILE)
    x16 = x1[:, :, :6].astype(jnp.float32)
    if w1 is not None:
        x16 = jnp.concatenate([x16, w1.astype(jnp.float32)[:, :, None]],
                              axis=2)
    x1p = jnp.pad(x16, ((0, 0), (0, n1p - n1), (0, 8 - x16.shape[2])))
    x2p = jnp.pad(jnp.swapaxes(x2[:, :, :6].astype(jnp.float32), 1, 2),
                  ((0, 0), (0, 2), (0, n2p - n2)))
    Ap = _round_up(A, 16)   # bf16 sublane tile: aligned slab slices
    oh1 = jax.nn.one_hot(t1, A, dtype=jnp.float32)
    oh1 = jnp.pad(oh1, ((0, n1p - n1), (0, Ap - A)))
    oh2 = jax.nn.one_hot(t2, B, dtype=jnp.float32)
    # poly-expand the knot axis (a static linear map of the parameter
    # table, position-independent, hoisted out of MD loops by XLA), then
    # t2flat[p*A + a, j] = sum_b tpoly[a,b,p] * oh2[j,b] — slab-major rows
    # so each poly-coefficient plane is a static contiguous kernel slice
    from .pairs import quadspline_family
    ka, k, _ = quadspline_family(M)
    P = jnp.asarray(_poly_matrix(ka, k))
    HI = jax.lax.Precision.HIGHEST
    tpoly = jnp.einsum('abm,mp->abp', table.astype(jnp.float32), P,
                       precision=HI)
    t2t = jnp.einsum('abp,jb->paj', tpoly, oh2, precision=HI)
    t2t = jnp.pad(t2t, ((0, 0), (0, Ap - A), (0, n2p - n2)))
    t2t = _hilo_split(t2t)                  # (P * 2Ap, n2p), [hi; lo] rows
    maskp = jnp.pad(mask.astype(jnp.float32), ((0, n1p - n1), (0, n2p - n2)))
    return x1p, x2p, oh1, t2t, maskp, n1p, n2p, Ap


def _pad_reps(x, rb):
    n_rep = x.shape[0]
    return jnp.pad(x, ((0, _round_up(n_rep, rb) - n_rep),) +
                   ((0, 0),) * (x.ndim - 1)), _round_up(n_rep, rb) // rb


def _common_specs(A, M, rb):
    return [
        pl.BlockSpec((rb, TILE, 8), lambda r, i, j: (r, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 8, TILE), lambda r, i, j: (r, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, A), lambda r, i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((M * 2 * A, TILE), lambda r, i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda r, i, j: (i, j),
                     memory_space=pltpu.VMEM),
    ]


def _fwd_batched(family, interpret, rb, table, t1, t2, x1, x2, mask):
    """Forward kernel over a replica ensemble: x1 (R, n1, >=6),
    x2 (R, n2, >=6); table/types/mask shared.  Returns (R, n1, n2)."""
    ka, k, inv_dx = family
    A, B, M = table.shape
    n_rep, n1, n2 = x1.shape[0], x1.shape[1], x2.shape[1]
    (x1p, x2p, oh1, t2t, maskp, n1p, n2p, A) = _prep(table, t1, t2, x1,
                                                     x2, mask)
    Mp = t2t.shape[0] // (2 * A)
    rb = min(rb, max(n_rep, 1))
    x1p, n_rb = _pad_reps(x1p, rb)
    x2p, _ = _pad_reps(x2p, rb)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ka, k, inv_dx, A),
        grid=(n_rb, n1p // TILE, n2p // TILE),
        in_specs=_common_specs(A, Mp, rb),
        out_specs=pl.BlockSpec((rb, TILE, TILE), lambda r, i, j: (r, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rb * rb, n1p, n2p), jnp.float32),
        interpret=interpret,
    )(x1p, x2p, oh1, t2t, maskp)
    return out[:n_rep, :n1, :n2].astype(x1.dtype)


def _bwd_batched(family, interpret, rb, table, t1, t2, x1, x2, mask, g):
    """Backward kernel over a replica ensemble: position/direction
    cotangents (dx1 (R, n1, 8), dx2 (R, n2, 8))."""
    ka, k, inv_dx = family
    A, B, M = table.shape
    n_rep, n1, n2 = x1.shape[0], x1.shape[1], x2.shape[1]
    (x1p, x2p, oh1, t2t, maskp, n1p, n2p, A) = _prep(table, t1, t2, x1,
                                                     x2, mask)
    Mp = t2t.shape[0] // (2 * A)
    rb = min(rb, max(n_rep, 1))
    x1p, n_rb = _pad_reps(x1p, rb)
    x2p, _ = _pad_reps(x2p, rb)
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, n_rb * rb - n_rep), (0, n1p - n1), (0, n2p - n2)))

    n_j = n2p // TILE
    d1, d2_part = pl.pallas_call(
        functools.partial(_bwd_kernel, ka, k, inv_dx, A, n_j),
        grid=(n_rb, n1p // TILE, n_j),
        in_specs=_common_specs(A, Mp, rb) + [
            pl.BlockSpec((rb, TILE, TILE), lambda r, i, j: (r, i, j),
                         memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((rb, TILE, 8), lambda r, i, j: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 8, TILE), lambda r, i, j: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rb * rb, n1p, 8), jnp.float32),
            jax.ShapeDtypeStruct((n1p // TILE, n_rb * rb, 8, n2p),
                                 jnp.float32),
        ),
        interpret=interpret,
    )(x1p, x2p, oh1, t2t, maskp, gp)
    d2 = jnp.swapaxes(jnp.sum(d2_part, axis=0), 1, 2)    # (R, n2p, 8)
    return d1[:n_rep, :n1], d2[:n_rep, :n2]


def _colsum_fwd_batched(family, interpret, rb, table, t1, t2, x1, x2, mask,
                        w1):
    """Weighted column sums over a replica ensemble: x1 (R, n1, >=6) with
    weights w1 (R, n1); returns (R, n2)."""
    ka, k, inv_dx = family
    A, B, M = table.shape
    n_rep, n1, n2 = x1.shape[0], x1.shape[1], x2.shape[1]
    (x1p, x2p, oh1, t2t, maskp, n1p, n2p, A) = _prep(table, t1, t2, x1,
                                                     x2, mask, w1)
    Mp = t2t.shape[0] // (2 * A)
    rb = min(rb, max(n_rep, 1))
    x1p, n_rb = _pad_reps(x1p, rb)
    x2p, _ = _pad_reps(x2p, rb)
    out = pl.pallas_call(
        functools.partial(_colsum_fwd_kernel, ka, k, inv_dx, A),
        grid=(n_rb, n2p // TILE, n1p // TILE),
        in_specs=[
            pl.BlockSpec((rb, TILE, 8), lambda r, j, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8, TILE), lambda r, j, i: (r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, A), lambda r, j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp * 2 * A, TILE), lambda r, j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda r, j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 8, TILE), lambda r, j, i: (r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rb * rb, 8, n2p), jnp.float32),
        interpret=interpret,
    )(x1p, x2p, oh1, t2t, maskp)
    return out[:n_rep, 0, :n2].astype(x1.dtype)


def _colsum_bwd_batched(family, interpret, rb, table, t1, t2, x1, x2, mask,
                        w1, g):
    """Backward of the coverage contraction: (dx1 (R,n1,8) with dw in
    column 6, dx2 (R,n2,8)) from the (R, n2) cotangent."""
    ka, k, inv_dx = family
    A, B, M = table.shape
    n_rep, n1, n2 = x1.shape[0], x1.shape[1], x2.shape[1]
    (x1p, x2p, oh1, t2t, maskp, n1p, n2p, A) = _prep(table, t1, t2, x1,
                                                     x2, mask, w1)
    Mp = t2t.shape[0] // (2 * A)
    rb = min(rb, max(n_rep, 1))
    x1p, n_rb = _pad_reps(x1p, rb)
    x2p, _ = _pad_reps(x2p, rb)
    gp = jnp.pad(g.astype(jnp.float32)[:, None, :],
                 ((0, n_rb * rb - n_rep), (0, 7), (0, n2p - n2)))

    n_j = n2p // TILE
    d1, d2_part = pl.pallas_call(
        functools.partial(_colsum_bwd_kernel, ka, k, inv_dx, A),
        grid=(n_rb, n1p // TILE, n_j),
        in_specs=_common_specs(A, Mp, rb) + [
            pl.BlockSpec((rb, 8, TILE), lambda r, i, j: (r, 0, j),
                         memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((rb, TILE, 8), lambda r, i, j: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 8, TILE), lambda r, i, j: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rb * rb, n1p, 8), jnp.float32),
            jax.ShapeDtypeStruct((n1p // TILE, n_rb * rb, 8, n2p),
                                 jnp.float32),
        ),
        interpret=interpret,
    )(x1p, x2p, oh1, t2t, maskp, gp)
    d2 = jnp.swapaxes(jnp.sum(d2_part, axis=0), 1, 2)
    return d1[:n_rep, :n1], d2[:n_rep, :n2]


# --- custom_vmap wrappers: a replica ensemble maps to the blocked grid ---

@functools.lru_cache(maxsize=None)
def _fwd_dispatch(family, interpret):
    @jax.custom_batching.custom_vmap
    def fwd(table, t1, t2, x1, x2, mask):
        return _fwd_batched(family, interpret, RB_FWD, table, t1, t2,
                            x1[None], x2[None], mask)[0]

    @fwd.def_vmap
    def rule(axis_size, in_batched, table, t1, t2, x1, x2, mask):
        tb, t1b, t2b, x1b, x2b, mb = in_batched
        if tb or t1b or t2b or mb:
            # per-replica tables/masks (Hamiltonian ensembles): sequential
            # fallback keeps semantics without kernel support
            out = jax.lax.map(
                lambda args: fwd(
                    args[0] if tb else table, args[1] if t1b else t1,
                    args[2] if t2b else t2, args[3], args[4],
                    args[5] if mb else mask),
                (table if tb else jnp.zeros((axis_size,)),
                 t1 if t1b else jnp.zeros((axis_size,)),
                 t2 if t2b else jnp.zeros((axis_size,)),
                 x1 if x1b else jnp.broadcast_to(x1, (axis_size,) + x1.shape),
                 x2 if x2b else jnp.broadcast_to(x2, (axis_size,) + x2.shape),
                 mask if mb else jnp.zeros((axis_size,))))
            return out, True
        if not x1b:
            x1 = jnp.broadcast_to(x1, (axis_size,) + x1.shape)
        if not x2b:
            x2 = jnp.broadcast_to(x2, (axis_size,) + x2.shape)
        return _fwd_batched(family, interpret, RB_FWD, table, t1, t2,
                            x1, x2, mask), True

    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_dispatch(family, interpret):
    @jax.custom_batching.custom_vmap
    def bwd(table, t1, t2, x1, x2, mask, g):
        d1, d2 = _bwd_batched(family, interpret, RB_BWD, table, t1, t2,
                              x1[None], x2[None], mask, g[None])
        return d1[0], d2[0]

    @bwd.def_vmap
    def rule(axis_size, in_batched, table, t1, t2, x1, x2, mask, g):
        tb, t1b, t2b, x1b, x2b, mb, gb = in_batched
        if tb or t1b or t2b or mb:
            out = jax.lax.map(
                lambda args: bwd(
                    args[0] if tb else table, args[1] if t1b else t1,
                    args[2] if t2b else t2, args[3], args[4],
                    args[5] if mb else mask, args[6]),
                (table if tb else jnp.zeros((axis_size,)),
                 t1 if t1b else jnp.zeros((axis_size,)),
                 t2 if t2b else jnp.zeros((axis_size,)),
                 x1 if x1b else jnp.broadcast_to(x1, (axis_size,) + x1.shape),
                 x2 if x2b else jnp.broadcast_to(x2, (axis_size,) + x2.shape),
                 mask if mb else jnp.zeros((axis_size,)),
                 g if gb else jnp.broadcast_to(g, (axis_size,) + g.shape)))
            return out, (True, True)
        if not x1b:
            x1 = jnp.broadcast_to(x1, (axis_size,) + x1.shape)
        if not x2b:
            x2 = jnp.broadcast_to(x2, (axis_size,) + x2.shape)
        if not gb:
            g = jnp.broadcast_to(g, (axis_size,) + g.shape)
        d1, d2 = _bwd_batched(family, interpret, RB_BWD, table, t1, t2,
                              x1, x2, mask, g)
        return (d1, d2), (True, True)

    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def quadspline_pallas(family, interpret, table, t1, t2, x1, x2, mask):
    """Masked pair-spline values (n1, n2) on the TPU MXU/VPU.

    family: (ka, k, inv_dx); x1/x2: (n, >=6) site pos+dir rows; mask:
    (n1, n2) bool exclusion mask.  Matches ops.pairs.quadspline_coverage
    (with its distance cutoff) exactly.  Under jax.vmap over x1/x2 the
    replica axis becomes a blocked kernel grid dimension with the table
    and mask shared (see _fwd_dispatch)."""
    return _fwd_dispatch(family, interpret)(table, t1, t2, x1, x2, mask)


def _fwd_rule(family, interpret, table, t1, t2, x1, x2, mask):
    out = _fwd_dispatch(family, interpret)(table, t1, t2, x1, x2, mask)
    return out, (table, t1, t2, x1, x2, mask)


def _table_cotangent(family, table, t1, t2, x1, x2, mask, g):
    """Parameter-table cotangent via the XLA dense-window formulation;
    XLA dead-code eliminates this whole block when the table gradient is
    not consumed (i.e., in MD where only position gradients are used)."""
    ka, k, inv_dx = family
    inv_dtheta = (ka - 3) / 2.0
    A, B, M = table.shape
    from .spline import bspline_window_weights
    disp = x2[None, :, 0:3] - x1[:, None, 0:3]
    dist2 = jnp.sum(disp * disp, -1) + 1e-12
    inv_dist = jax.lax.rsqrt(dist2)
    u = disp * inv_dist[..., None]
    cos1 = jnp.sum(x1[:, None, 3:6] * u, -1)
    cos2 = -jnp.sum(x2[None, :, 3:6] * u, -1)
    s = dist2 * inv_dist * inv_dx
    live = mask & (s < (k - 2 - 1e-6))
    gm = jnp.where(live, g, 0.0)
    Wa1 = bspline_window_weights((cos1 + 1) * inv_dtheta + 1, ka, False)
    Wa2 = bspline_window_weights((cos2 + 1) * inv_dtheta + 1, ka, False)
    Wd = bspline_window_weights(s, k, True)
    oh1f = jax.nn.one_hot(t1, A, dtype=jnp.float32)
    oh2f = jax.nn.one_hot(t2, B, dtype=jnp.float32)
    HI = jax.lax.Precision.HIGHEST
    p_pair = jnp.einsum('ia,jb,abm->ijm', oh1f, oh2f,
                        table.astype(jnp.float32), precision=HI)
    a1 = jnp.sum(Wa1 * p_pair[..., 0:ka], -1)
    a2 = jnp.sum(Wa2 * p_pair[..., ka:2 * ka], -1)
    narrow = jnp.sum(Wd * p_pair[..., 2 * ka + k:], -1)
    gW = jnp.concatenate([
        (gm * a2 * narrow)[..., None] * Wa1,
        (gm * a1 * narrow)[..., None] * Wa2,
        gm[..., None] * Wd,
        (gm * a1 * a2)[..., None] * Wd], axis=-1)
    return jnp.einsum('ia,jb,ijm->abm', oh1f, oh2f, gW,
                      precision=HI).astype(table.dtype)


def _bwd_rule(family, interpret, res, g):
    table, t1, t2, x1, x2, mask = res

    d1, d2 = _bwd_dispatch(family, interpret)(table, t1, t2, x1, x2, mask,
                                              g)
    dx1 = jnp.zeros_like(x1).at[:, :6].set(d1[:, :6].astype(x1.dtype))
    dx2 = jnp.zeros_like(x2).at[:, :6].set(d2[:, :6].astype(x2.dtype))
    d_table = _table_cotangent(family, table, t1, t2, x1, x2, mask, g)
    return (d_table, None, None, dx1, dx2, None)


quadspline_pallas.defvjp(_fwd_rule, _bwd_rule)


@functools.lru_cache(maxsize=None)
def _colsum_fwd_dispatch(family, interpret):
    @jax.custom_batching.custom_vmap
    def fwd(table, t1, t2, x1, x2, mask, w1):
        return _colsum_fwd_batched(family, interpret, RB_FWD, table, t1, t2,
                                   x1[None], x2[None], mask, w1[None])[0]

    @fwd.def_vmap
    def rule(axis_size, in_batched, table, t1, t2, x1, x2, mask, w1):
        tb, t1b, t2b, x1b, x2b, mb, wb = in_batched
        if tb or t1b or t2b or mb:
            out = jax.lax.map(
                lambda args: fwd(
                    args[0] if tb else table, args[1] if t1b else t1,
                    args[2] if t2b else t2, args[3], args[4],
                    args[5] if mb else mask, args[6]),
                (table if tb else jnp.zeros((axis_size,)),
                 t1 if t1b else jnp.zeros((axis_size,)),
                 t2 if t2b else jnp.zeros((axis_size,)),
                 x1 if x1b else jnp.broadcast_to(x1, (axis_size,) + x1.shape),
                 x2 if x2b else jnp.broadcast_to(x2, (axis_size,) + x2.shape),
                 mask if mb else jnp.zeros((axis_size,)),
                 w1 if wb else jnp.broadcast_to(w1, (axis_size,) + w1.shape)))
            return out, True
        if not x1b:
            x1 = jnp.broadcast_to(x1, (axis_size,) + x1.shape)
        if not x2b:
            x2 = jnp.broadcast_to(x2, (axis_size,) + x2.shape)
        if not wb:
            w1 = jnp.broadcast_to(w1, (axis_size,) + w1.shape)
        return _colsum_fwd_batched(family, interpret, RB_FWD, table, t1, t2,
                                   x1, x2, mask, w1), True

    return fwd


@functools.lru_cache(maxsize=None)
def _colsum_bwd_dispatch(family, interpret):
    @jax.custom_batching.custom_vmap
    def bwd(table, t1, t2, x1, x2, mask, w1, g):
        d1, d2 = _colsum_bwd_batched(family, interpret, RB_BWD, table, t1,
                                     t2, x1[None], x2[None], mask, w1[None],
                                     g[None])
        return d1[0], d2[0]

    @bwd.def_vmap
    def rule(axis_size, in_batched, table, t1, t2, x1, x2, mask, w1, g):
        tb, t1b, t2b, x1b, x2b, mb, wb, gb = in_batched
        if tb or t1b or t2b or mb:
            out = jax.lax.map(
                lambda args: bwd(
                    args[0] if tb else table, args[1] if t1b else t1,
                    args[2] if t2b else t2, args[3], args[4],
                    args[5] if mb else mask, args[6], args[7]),
                (table if tb else jnp.zeros((axis_size,)),
                 t1 if t1b else jnp.zeros((axis_size,)),
                 t2 if t2b else jnp.zeros((axis_size,)),
                 x1 if x1b else jnp.broadcast_to(x1, (axis_size,) + x1.shape),
                 x2 if x2b else jnp.broadcast_to(x2, (axis_size,) + x2.shape),
                 mask if mb else jnp.zeros((axis_size,)),
                 w1 if wb else jnp.broadcast_to(w1, (axis_size,) + w1.shape),
                 g if gb else jnp.broadcast_to(g, (axis_size,) + g.shape)))
            return out, (True, True)
        if not x1b:
            x1 = jnp.broadcast_to(x1, (axis_size,) + x1.shape)
        if not x2b:
            x2 = jnp.broadcast_to(x2, (axis_size,) + x2.shape)
        if not wb:
            w1 = jnp.broadcast_to(w1, (axis_size,) + w1.shape)
        if not gb:
            g = jnp.broadcast_to(g, (axis_size,) + g.shape)
        d1, d2 = _colsum_bwd_batched(family, interpret, RB_BWD, table, t1,
                                     t2, x1, x2, mask, w1, g)
        return (d1, d2), (True, True)

    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def quadspline_colsum_pallas(family, interpret, table, t1, t2, x1, x2, mask,
                             w1):
    """Weighted coverage sums out[j] = sum_i w1[i] * quadspline(i, j)
    (reference hbond.cpp:241-286 coverage accumulation) without ever
    materializing the (n1, n2) pair grid.  Same kernel math and cutoff
    semantics as quadspline_pallas; gradients flow to x1 (pos+dir), x2,
    w1 and the parameter table."""
    return _colsum_fwd_dispatch(family, interpret)(table, t1, t2, x1, x2,
                                                   mask, w1)


def _colsum_fwd_rule(family, interpret, table, t1, t2, x1, x2, mask, w1):
    out = _colsum_fwd_dispatch(family, interpret)(table, t1, t2, x1, x2,
                                                  mask, w1)
    return out, (table, t1, t2, x1, x2, mask, w1)


def _colsum_bwd_rule(family, interpret, res, g):
    ka, k, inv_dx = family
    table, t1, t2, x1, x2, mask, w1 = res
    A, B, M = table.shape

    d1, d2 = _colsum_bwd_dispatch(family, interpret)(table, t1, t2, x1, x2,
                                                     mask, w1, g)
    dx1 = jnp.zeros_like(x1).at[:, :6].set(d1[:, :6].astype(x1.dtype))
    dx2 = jnp.zeros_like(x2).at[:, :6].set(d2[:, :6].astype(x2.dtype))
    dw1 = d1[:, 6].astype(w1.dtype)

    # parameter-table cotangent through the XLA dense-window formulation
    # with the rank-1 pair cotangent w1[i] * g[j]; XLA dead-code eliminates
    # it when the table gradient is not consumed (MD)
    gm_pair = w1[:, None] * g[None, :]
    d_table = _table_cotangent(family, table, t1, t2, x1, x2, mask, gm_pair)
    return (d_table, None, None, dx1, dx2, None, dw1)


quadspline_colsum_pallas.defvjp(_colsum_fwd_rule, _colsum_bwd_rule)


# ===========================================================================
# Fused pair block: both hbond-coverage contractions AND the rotamer
# bead-pair grid in ONE pallas_call per direction.
# ===========================================================================
#
# The two coverage kernels (hbond_coverage, hbond_coverage_hydrophobe;
# reference hbond.cpp:241-286) and the rotamer bead-pair kernel
# (bead_interaction.h:30-84) stream the SAME group-2 operand (the sidechain
# beads) through three separate kernel launches per direction.  This fusion
# packs their group-1 rows into one tiled operand:
#
#   rows [0, n_cov1):        hbond virtuals, weight w1 in column 6
#   rows [n_cov1, IT0*128):  hydrophobe probes, weight w2 in column 7
#   rows [IT0*128, ...):     beads themselves (the symmetric pair grid)
#
# and unifies the three spline families: all shipped parameter sets share
# n_knot_angular and the knot spacing within a set, differing only in the
# distance knot count k.  Padding a k-knot distance segment to k_max knots
# (edge replication) is EXACT for every in-cutoff coordinate -- the de Boor
# window of interval i only touches coefficients [i-1, i+2], so appended
# coefficients are reachable only at s >= k-2, which the per-segment cutoff
# mask already zeroes.  One one-hot type space of size A1+A2+A3 routes each
# row to its own table; two weight columns route rows to the two colsum
# outputs (weights are zero elsewhere, so segments cannot leak into each
# other's outputs).
#
# Outputs per call: colsums (2, n2) and the (n2, n2) pair grid.  The grid
# output block index is clamped (max(i-IT0, 0)); coverage tiles write
# scratch values into grid block 0 which the i=IT0 pair tile (later in the
# innermost-i iteration order) overwrites.

def _fill_C_scratch(get_C, ka, k, c_ref):
    """Fill the (Mp, TILE, TILE) VMEM scratch with EVERY (segment, degree,
    interval) per-pair poly-coefficient plane of this (i, j) tile — the
    replica-INDEPENDENT part of the kernel.  Runs once per tile (at the
    first replica-block grid step) and is reused by all replica blocks,
    so the MXU table-lookup cost no longer scales with the ensemble."""
    na = (ka - 3) * 4
    nd = (k - 3) * 4
    TJ = c_ref.shape[-1]
    for off, n_int in ((0, ka - 3), (na, ka - 3),
                       (2 * na, k - 3), (2 * na + nd, k - 3)):
        for d in range(4):
            C_all = get_C.group([off + iv * 4 + d for iv in range(n_int)])
            for iv in range(n_int):
                c_ref[off + iv * 4 + d] = C_all[:, iv * TJ:(iv + 1) * TJ]


def _poly_accumulate_scratch(x_coord, n_knot, clamped, c_ref, seg_offs,
                             want_deriv):
    """_poly_accumulate reading precomputed coefficient planes from the
    VMEM scratch instead of issuing MXU lookups (see _fill_C_scratch)."""
    n = n_knot
    lo, hi = 1.0, float(n - 2)
    xc = jnp.clip(x_coord, lo, hi)
    i = jnp.clip(jnp.floor(xc).astype(jnp.int32), 1, n - 3)
    t = xc - i.astype(xc.dtype)

    n_int = n - 3
    sels = [i == (iv + 1) for iv in range(n_int)]
    nseg = len(seg_offs)
    Q = [[jnp.zeros_like(x_coord) for _ in range(4)] for _ in range(nseg)]
    for si, off in enumerate(seg_offs):
        for d in range(4):
            for iv in range(n_int):
                C = c_ref[off + iv * 4 + d]
                if x_coord.ndim == 3:
                    C = C[None]
                Q[si][d] = jnp.where(sels[iv], C, Q[si][d])

    vals, ders = [], []
    for si in range(nseg):
        q0, q1, q2, q3 = Q[si]
        vals.append(((q3 * t + q2) * t + q1) * t + q0)
        if want_deriv:
            dv = (3.0 * q3 * t + 2.0 * q2) * t + q1
            if clamped:
                dv = jnp.where((x_coord <= lo) | (x_coord >= hi), 0.0, dv)
            ders.append(dv)
        else:
            ders.append(None)
    return vals, ders


def _pad_distance_knots(table, ka, k, k_max):
    """Pad the wide/narrow distance segments from k to k_max knots by edge
    replication (exact below the family's own cutoff, see above)."""
    if k == k_max:
        return jnp.asarray(table, jnp.float32)
    table = jnp.asarray(table, jnp.float32)
    ang = table[..., :2 * ka]
    wide = table[..., 2 * ka:2 * ka + k]
    narrow = table[..., 2 * ka + k:2 * ka + 2 * k]
    reps = [(0, 0)] * (table.ndim - 1) + [(0, k_max - k)]
    wide = jnp.pad(wide, reps, mode='edge')
    narrow = jnp.pad(narrow, reps, mode='edge')
    return jnp.concatenate([ang, wide, narrow], axis=-1)


def _fused_fwd_kernel(ka, k, inv_dx, A, IT0, ITE, kcut_cov, kcut_pair,
                      want_planes, x1_ref, x2t_ref, oh1_ref, t2t_ref,
                      mask_ref, *rest):
    # grid (n_j, n_it, n_rb): the replica-block dimension is INNERMOST so
    # the per-(i, j)-tile poly-coefficient planes — the MXU table lookup,
    # which is replica-independent — are computed ONCE into VMEM scratch
    # (at r == 0) and reused by every replica block, and the parameter
    # slab stays HBM-resident for a whole j sweep.  Column sums land in
    # per-i-tile partials (one small XLA reduction) because the cs block
    # is revisited non-consecutively in this order.
    #
    # ITE >= 0 marks one additional ENVIRONMENT-COVERAGE row tile (rows =
    # CB probes) between the coverage and pair bands: same geometry, but
    # compact radial x angular sigmoids on precomputed per-pair parameter
    # planes (ep_ref) instead of splines, weighted by the per-column
    # Boltzmann weights riding x2t row 6, summed per ROW into cs row 2
    # (reference environment.cpp:12-68).  Its tile index is below IT0 so
    # its (ignored) grid block 0 is overwritten by the first pair tile.
    rest = list(rest)
    ep_ref = rest.pop(0) if ITE >= 0 else None
    if want_planes:
        cs_ref, grid_ref, pln_ref, vcov_ref, c_ref = rest
    else:
        cs_ref, grid_ref, c_ref = rest
        pln_ref = vcov_ref = None
    inv_dtheta = (ka - 3) / 2.0
    it = pl.program_id(1)
    r = pl.program_id(2)
    alive = jnp.any(mask_ref[:, :] > 0)
    is_env = (it == ITE) if ITE >= 0 else jnp.bool_(False)

    @pl.when(alive & jnp.logical_not(is_env) & (r == 0))
    def _():
        _fill_C_scratch(_make_get_C(oh1_ref, t2t_ref, A), ka, k, c_ref)

    @pl.when(jnp.logical_not(alive))
    def _():
        grid_ref[:, :, :] = jnp.zeros_like(grid_ref)
        cs_ref[0] = jnp.zeros_like(cs_ref[0])
        if want_planes:
            pln_ref[:, :, :, :] = jnp.zeros_like(pln_ref)
            vcov_ref[:, :, :] = jnp.zeros_like(vcov_ref)

    if ITE >= 0:
        @pl.when(alive & is_env)
        def _():
            from .sigmoid import compact_sigmoid
            _, _, dist, _, _, cos1, _ = _geometry(x1_ref, x2t_ref)
            r0 = ep_ref[0][None]
            rs = ep_ref[1][None]
            d0 = ep_ref[2][None]
            ds = ep_ref[3][None]
            radial, _ = compact_sigmoid(dist - r0, rs)
            angular, _ = compact_sigmoid(d0 - cos1, ds)
            m = mask_ref[:, :][None]
            w = x2t_ref[:, 6:7, :]
            val = m * w * radial * angular
            rb = val.shape[0]
            rowsum = jnp.sum(val, axis=2)            # (rb, TI) on lanes
            cs_ref[0] = jnp.concatenate(
                [jnp.zeros((rb, 2, val.shape[1]), val.dtype),
                 rowsum[:, None, :],
                 jnp.zeros((rb, 5, val.shape[1]), val.dtype)], axis=1)
            grid_ref[:, :, :] = jnp.zeros_like(grid_ref)
            if want_planes:
                pln_ref[:, :, :, :] = jnp.zeros_like(pln_ref)
                vcov_ref[:, :, :] = jnp.zeros_like(vcov_ref)

    @pl.when(alive & jnp.logical_not(is_env))
    def _():
        _, _, dist, _, _, cos1, cos2 = _geometry(x1_ref, x2t_ref)
        o_a1, o_a2, o_w, o_n = _poly_offsets(ka, k)
        s = dist * inv_dx
        (a1,), (da1,) = _poly_accumulate_scratch(
            (cos1 + 1.0) * inv_dtheta + 1.0, ka, False, c_ref, (o_a1,),
            want_planes)
        (a2,), (da2,) = _poly_accumulate_scratch(
            (cos2 + 1.0) * inv_dtheta + 1.0, ka, False, c_ref, (o_a2,),
            want_planes)
        (wide, narrow), (dwide, dnarrow) = _poly_accumulate_scratch(
            s, k, True, c_ref, (o_w, o_n), want_planes)
        kcut = jnp.where(it >= IT0, kcut_pair, kcut_cov)
        live = (mask_ref[:, :] > 0)[None] & (s < kcut)
        val = jnp.where(live, wide + a1 * a2 * narrow, 0.0)
        grid_ref[:, :, :] = val
        w6 = x1_ref[:, :, 6:7]
        w7 = x1_ref[:, :, 7:8]
        rb = val.shape[0]
        cs_ref[0] = jnp.concatenate(
            [jnp.sum(w6 * val, 1, keepdims=True),
             jnp.sum(w7 * val, 1, keepdims=True),
             jnp.zeros((rb, 6, val.shape[2]), val.dtype)], axis=1)
        if want_planes:
            # derivative fields for the residual-consuming backward
            # (BENCH_NOTES round-5 target #1): pre-masked, pre-scaled, so
            # the backward kernel is pure geometry + multiply-reduce with
            # no C-plane scratch and no poly-select chains.  val itself
            # rides the separate vcov output, whose block index is
            # CLAMPED to the coverage band (min(i, IT0-1)): pair tiles
            # overwrite the env tile's scrap block, so vcov stores the
            # value plane only where the backward needs it (the coverage
            # weight cotangents) instead of a fourth full-height plane.
            pln_ref[:, 0] = jnp.where(
                live, (dwide + a1 * a2 * dnarrow) * inv_dx, 0.0)
            pln_ref[:, 1] = jnp.where(
                live, da1 * inv_dtheta * a2 * narrow, 0.0)
            pln_ref[:, 2] = jnp.where(
                live, da2 * inv_dtheta * a1 * narrow, 0.0)
            vcov_ref[:, :, :] = val


def _fused_bwd_kernel(ka, k, inv_dx, A, IT0, ITE, kcut_cov, kcut_pair,
                      x1_ref, x2t_ref, oh1_ref, t2t_ref, mask_ref,
                      *rest):
    # grid (n_j, n_it, n_rb): same layout as the forward kernel — the
    # per-(i, j)-tile poly-coefficient planes are computed once into VMEM
    # scratch at r == 0 and shared across all replica blocks, and the
    # parameter slab stays resident for a whole j sweep.  Both cotangent
    # outputs land in partial blocks (d1 per j, d2 per i) summed by small
    # XLA reductions.
    #
    # ITE >= 0: environment-coverage row tile (see _fused_fwd_kernel).
    # Its per-row output cotangent arrives through x1 column 6 of the env
    # rows (stuffed by _fused_bwd_batched); its per-column WEIGHT
    # cotangent leaves through d2 row 6 (zero for every other band).
    if ITE >= 0:
        ep_ref, gcs_ref, ggrid_ref, d1_ref, d2_ref, c_ref = rest
    else:
        gcs_ref, ggrid_ref, d1_ref, d2_ref, c_ref = rest
    inv_dtheta = (ka - 3) / 2.0
    i = pl.program_id(1)
    r = pl.program_id(2)
    alive = jnp.any(mask_ref[:, :] > 0)
    is_env = (i == ITE) if ITE >= 0 else jnp.bool_(False)

    if not MOCK_BWD:
        @pl.when(alive & jnp.logical_not(is_env) & (r == 0))
        def _():
            _fill_C_scratch(_make_get_C(oh1_ref, t2t_ref, A), ka, k,
                            c_ref)

    @pl.when(jnp.logical_not(alive))
    def _():
        d1_ref[0] = jnp.zeros_like(d1_ref[0])
        d2_ref[0] = jnp.zeros_like(d2_ref[0])

    if ITE >= 0:
        @pl.when(alive & is_env)
        def _():
            from .sigmoid import compact_sigmoid
            dir1, _, dist, inv_dist, (ux, uy, uz), cos1, _ = _geometry(
                x1_ref, x2t_ref)
            r0 = ep_ref[0][None]
            rs = ep_ref[1][None]
            d0 = ep_ref[2][None]
            ds = ep_ref[3][None]
            radial, dradial = compact_sigmoid(dist - r0, rs)
            angular, dangular = compact_sigmoid(d0 - cos1, ds)
            m = mask_ref[:, :][None]
            w = x2t_ref[:, 6:7, :]
            genv = x1_ref[:, :, 6:7]
            g = genv * m * w
            rad = g * dradial * angular              # d/d dist
            c1 = -g * radial * dangular              # d/d cos1
            f1 = c1 * inv_dist
            gx = rad * ux + f1 * (dir1[0] - cos1 * ux)
            gy = rad * uy + f1 * (dir1[1] - cos1 * uy)
            gz = rad * uz + f1 * (dir1[2] - cos1 * uz)

            cols = []
            for arr, sgn in ((gx, -1.0), (gy, -1.0), (gz, -1.0),
                             (c1 * ux, 1.0), (c1 * uy, 1.0),
                             (c1 * uz, 1.0)):
                cols.append(sgn * jnp.sum(arr, 2, keepdims=True))
            cols.append(jnp.zeros_like(cols[0]))
            cols.append(jnp.zeros_like(cols[0]))
            d1_ref[0] = jnp.concatenate(cols, axis=2)

            dw = jnp.sum(genv * m * radial * angular, 1, keepdims=True)
            rows = []
            for arr, sgn in ((gx, 1.0), (gy, 1.0), (gz, 1.0)):
                rows.append(sgn * jnp.sum(arr, 1, keepdims=True))
            rows.extend([jnp.zeros_like(rows[0])] * 3)
            rows.append(dw)
            rows.append(jnp.zeros_like(rows[0]))
            d2_ref[0] = jnp.concatenate(rows, axis=1)

    @pl.when(alive & jnp.logical_not(is_env))
    def _():
        dir1, dir2, dist, inv_dist, (ux, uy, uz), cos1, cos2 = _geometry(
            x1_ref, x2t_ref)
        o_a1, o_a2, o_w, o_n = _poly_offsets(ka, k)
        s = dist * inv_dx
        if MOCK_BWD:
            a1, da1 = 0.5 * cos1 + 0.6, 0.1 * cos1
            a2, da2 = 0.5 * cos2 + 0.6, 0.1 * cos2
            wide, dwide = 0.01 * s, 0.002 * s
            narrow, dnarrow = 0.02 * s, 0.004 * s
        else:
            (a1,), (da1,) = _poly_accumulate_scratch(
                (cos1 + 1.0) * inv_dtheta + 1.0, ka, False, c_ref,
                (o_a1,), True)
            (a2,), (da2,) = _poly_accumulate_scratch(
                (cos2 + 1.0) * inv_dtheta + 1.0, ka, False, c_ref,
                (o_a2,), True)
            (wide, narrow), (dwide, dnarrow) = _poly_accumulate_scratch(
                s, k, True, c_ref, (o_w, o_n), True)

        kcut = jnp.where(i >= IT0, kcut_pair, kcut_cov)
        live = (mask_ref[:, :] > 0)[None] & (s < kcut)
        is_pair = i >= IT0
        w6 = x1_ref[:, :, 6:7]
        w7 = x1_ref[:, :, 7:8]
        gcov = w6 * gcs_ref[:, 0:1, :] + w7 * gcs_ref[:, 1:2, :]
        g_raw = jnp.where(is_pair, ggrid_ref[:, :, :], gcov)
        g = jnp.where(live, g_raw, 0.0)

        radial = g * (dwide + a1 * a2 * dnarrow) * inv_dx
        c1 = g * da1 * inv_dtheta * a2 * narrow
        c2 = g * da2 * inv_dtheta * a1 * narrow
        f1 = c1 * inv_dist
        f2 = c2 * inv_dist
        gx = (radial * ux + f1 * (dir1[0] - cos1 * ux)
              - f2 * (dir2[0] + cos2 * ux))
        gy = (radial * uy + f1 * (dir1[1] - cos1 * uy)
              - f2 * (dir2[1] + cos2 * uy))
        gz = (radial * uz + f1 * (dir1[2] - cos1 * uz)
              - f2 * (dir2[2] + cos2 * uz))

        # weight cotangents: d(colsum_k)/d(w_k[i]) = sum_j val * g_k[j];
        # zero for pair tiles (their rows' weights are not exposed)
        val = jnp.where(live, wide + a1 * a2 * narrow, 0.0)
        zero_if_pair = jnp.where(is_pair, 0.0, 1.0)
        dw6 = zero_if_pair * jnp.sum(val * gcs_ref[:, 0:1, :], 2,
                                     keepdims=True)
        dw7 = zero_if_pair * jnp.sum(val * gcs_ref[:, 1:2, :], 2,
                                     keepdims=True)

        cols = []
        for arr, sgn in ((gx, -1.0), (gy, -1.0), (gz, -1.0),
                         (c1 * ux, 1.0), (c1 * uy, 1.0), (c1 * uz, 1.0)):
            cols.append(sgn * jnp.sum(arr, 2, keepdims=True))
        cols.append(dw6)
        cols.append(dw7)
        d1_ref[0] = jnp.concatenate(cols, axis=2)      # (1, RB, TI, 8)

        rows = []
        for arr, sgn in ((gx, 1.0), (gy, 1.0), (gz, 1.0),
                         (c2 * ux, -1.0), (c2 * uy, -1.0), (c2 * uz, -1.0)):
            rows.append(sgn * jnp.sum(arr, 1, keepdims=True))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        d2_ref[0] = jnp.concatenate(rows, axis=1)      # (1, RB, 8, TJ)


def _fused_bwd_resid_kernel(IT0, ITE, inv_dx, kcut_cov, kcut_pair,
                            x1_ref, x2t_ref, mask_ref, *rest):
    # Residual-consuming backward (BENCH_NOTES round-5 target #1): the
    # forward kernel emitted pre-masked, pre-scaled derivative fields
    # (d/d dist, d/d cos1, d/d cos2 — pln planes 0..2; the value plane
    # rides the coverage-band-clamped vcov residual), so this kernel is
    # geometry + multiply-reduce only: no type one-hots, no parameter
    # slab, no C-plane scratch, no poly-select chains.  Unlike the
    # recomputing backward it has no C-scratch amortization constraint,
    # so its grid is (n_j, n_rb, n_it) with the ROW-TILE axis innermost:
    # the clamped vcov window is then unchanged across the pair tiles
    # and the clamped ggrid window unchanged across the coverage tiles,
    # and Mosaic elides those re-fetches (~2/7 of the backward's HBM
    # reads at headline shapes).
    if ITE >= 0:
        ep_ref, pln_ref, vcov_ref, gcs_ref, ggrid_ref, d1_ref, \
            d2_ref = rest
    else:
        pln_ref, vcov_ref, gcs_ref, ggrid_ref, d1_ref, d2_ref = rest
    i = pl.program_id(2)
    alive = jnp.any(mask_ref[:, :] > 0)
    is_env = (i == ITE) if ITE >= 0 else jnp.bool_(False)

    @pl.when(jnp.logical_not(alive))
    def _():
        d1_ref[0] = jnp.zeros_like(d1_ref[0])
        d2_ref[0] = jnp.zeros_like(d2_ref[0])

    if ITE >= 0:
        @pl.when(alive & is_env)
        def _():
            from .sigmoid import compact_sigmoid
            dir1, _, dist, inv_dist, (ux, uy, uz), cos1, _ = _geometry(
                x1_ref, x2t_ref)
            r0 = ep_ref[0][None]
            rs = ep_ref[1][None]
            d0 = ep_ref[2][None]
            ds = ep_ref[3][None]
            radial, dradial = compact_sigmoid(dist - r0, rs)
            angular, dangular = compact_sigmoid(d0 - cos1, ds)
            m = mask_ref[:, :][None]
            w = x2t_ref[:, 6:7, :]
            genv = x1_ref[:, :, 6:7]
            g = genv * m * w
            rad = g * dradial * angular              # d/d dist
            c1 = -g * radial * dangular              # d/d cos1
            f1 = c1 * inv_dist
            gx = rad * ux + f1 * (dir1[0] - cos1 * ux)
            gy = rad * uy + f1 * (dir1[1] - cos1 * uy)
            gz = rad * uz + f1 * (dir1[2] - cos1 * uz)

            cols = []
            for arr, sgn in ((gx, -1.0), (gy, -1.0), (gz, -1.0),
                             (c1 * ux, 1.0), (c1 * uy, 1.0),
                             (c1 * uz, 1.0)):
                cols.append(sgn * jnp.sum(arr, 2, keepdims=True))
            cols.append(jnp.zeros_like(cols[0]))
            cols.append(jnp.zeros_like(cols[0]))
            d1_ref[0] = jnp.concatenate(cols, axis=2)

            dw = jnp.sum(genv * m * radial * angular, 1, keepdims=True)
            rows = []
            for arr, sgn in ((gx, 1.0), (gy, 1.0), (gz, 1.0)):
                rows.append(sgn * jnp.sum(arr, 1, keepdims=True))
            rows.extend([jnp.zeros_like(rows[0])] * 3)
            rows.append(dw)
            rows.append(jnp.zeros_like(rows[0]))
            d2_ref[0] = jnp.concatenate(rows, axis=1)

    @pl.when(alive & jnp.logical_not(is_env))
    def _():
        dir1, dir2, dist, inv_dist, (ux, uy, uz), cos1, cos2 = _geometry(
            x1_ref, x2t_ref)
        is_pair = i >= IT0
        w6 = x1_ref[:, :, 6:7]
        w7 = x1_ref[:, :, 7:8]
        gcov = w6 * gcs_ref[:, 0:1, :] + w7 * gcs_ref[:, 1:2, :]
        # the planes carry the live-mask (and inv_dx/inv_dtheta scales),
        # but the upstream cotangent itself may be non-finite in padded
        # slots (NaN*0=NaN), so keep the cheap mask on g
        # guard by the SAME live predicate as the recomputing backward
        # (mask AND inside-cutoff), not the mask alone: a non-finite
        # upstream cotangent at a cutoff-dead slot (e.g. a loss with an
        # infinite gradient at the zero-valued grid entries) would
        # otherwise survive the mask and poison forces via NaN*0 against
        # the zeroed derivative planes
        kcut = jnp.where(is_pair, kcut_pair, kcut_cov)
        live = (mask_ref[:, :] > 0)[None] & (dist * inv_dx < kcut)
        g = jnp.where(live, jnp.where(is_pair, ggrid_ref[:, :, :], gcov),
                      0.0)
        val = vcov_ref[:, :, :]
        radial = g * pln_ref[:, 0]
        c1 = g * pln_ref[:, 1]
        c2 = g * pln_ref[:, 2]
        f1 = c1 * inv_dist
        f2 = c2 * inv_dist
        gx = (radial * ux + f1 * (dir1[0] - cos1 * ux)
              - f2 * (dir2[0] + cos2 * ux))
        gy = (radial * uy + f1 * (dir1[1] - cos1 * uy)
              - f2 * (dir2[1] + cos2 * uy))
        gz = (radial * uz + f1 * (dir1[2] - cos1 * uz)
              - f2 * (dir2[2] + cos2 * uz))

        # where (not multiply): pair tiles see the vcov SCRAP block,
        # whose garbage may be non-finite — select, don't scale by zero
        dw6 = jnp.where(is_pair, 0.0,
                        jnp.sum(val * gcs_ref[:, 0:1, :], 2,
                                keepdims=True))
        dw7 = jnp.where(is_pair, 0.0,
                        jnp.sum(val * gcs_ref[:, 1:2, :], 2,
                                keepdims=True))

        cols = []
        for arr, sgn in ((gx, -1.0), (gy, -1.0), (gz, -1.0),
                         (c1 * ux, 1.0), (c1 * uy, 1.0), (c1 * uz, 1.0)):
            cols.append(sgn * jnp.sum(arr, 2, keepdims=True))
        cols.append(dw6)
        cols.append(dw7)
        d1_ref[0] = jnp.concatenate(cols, axis=2)      # (1, RB, TI, 8)

        rows = []
        for arr, sgn in ((gx, 1.0), (gy, 1.0), (gz, 1.0),
                         (c2 * ux, -1.0), (c2 * uy, -1.0), (c2 * uz, -1.0)):
            rows.append(sgn * jnp.sum(arr, 1, keepdims=True))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        d2_ref[0] = jnp.concatenate(rows, axis=1)      # (1, RB, 8, TJ)


def _fused_meta(fams, a_shapes, shapes, has_env):
    """Scalar-only half of the static prep: every plane size, tile
    index, and cutoff the kernels need, derived purely from shapes —
    hashable, so it can serve as a custom_vjp nondiff argument while the
    prepared ARRAYS travel through the jit boundary as tracers.

    fams = ((ka, kc, inv_dx), (ka, kp, inv_dx)); a_shapes = (A1, A2, A3)
    type counts of the three tables; shapes = (n_a, n_b, n2, n_e)."""
    (ka, kc, inv_dxc), (ka2, kp, inv_dxp) = fams
    assert ka == ka2 and abs(inv_dxc - inv_dxp) < 1e-12, \
        "fused families must share angular knots and knot spacing"
    k = max(kc, kp)
    A1, A2, A3 = a_shapes
    A_tot = A1 + A2 + A3
    Ap = _round_up(A_tot, 16)   # bf16 sublane tile: aligned slab slices
    n_a, n_b, n2, n_e = shapes
    N1 = n_a + n_b
    N1C = _round_up(N1, TILE)
    n2p = _round_up(n2, TILE)
    if has_env:
        assert n_e <= TILE, "fused env band supports <= 128 CB probes"
        E_rows = TILE
        ITE = N1C // TILE
    else:
        E_rows = 0
        ITE = -1
    IT0 = (N1C + E_rows) // TILE
    N1P = N1C + E_rows + n2p
    kcut_cov = kc - 2 - 1e-6
    kcut_pair = kp - 2 - 1e-6
    return ((ka, k, inv_dxc), Ap, IT0, kcut_cov, kcut_pair, N1P, n2p,
            n2, ITE, n_a, n_b, n_e)


def _fused_prep_static(fams, tabs, t1s, t2s, masks, shapes, env_static):
    """Parameter-only half of _fused_prep: everything derivable from the
    tables, type indices, and masks — no position data.  Returned as a
    (pack, meta) pair so it can be computed ONCE per advance call and
    passed through the jit boundary (the optimized HLO shows XLA's
    loop-invariant code motion never hoists this chain out of the MD
    loop: ~25 instructions x 5-10 MB per force evaluation,
    BENCH_NOTES round-4 HLO section).

    shapes = (n_a, n_b, n2, n_e); env_static = (tab4, t1e, t2e, maske)
    or None.  meta is a tuple of plain numbers (hashable, usable as a
    custom_vjp nondiff argument)."""
    (ka, kc, inv_dxc), (ka2, kp, inv_dxp) = fams
    k = max(kc, kp)
    tab1, tab2, tab3 = [
        _pad_distance_knots(t, ka, kf, k)
        for t, kf in ((tabs[0], kc), (tabs[1], kc), (tabs[2], kp))]
    A1, A2, A3 = tab1.shape[0], tab2.shape[0], tab3.shape[0]
    meta = _fused_meta(fams, (A1, A2, A3), shapes, env_static is not None)
    (_, Ap, IT0, _, _, N1P, n2p, n2, ITE, n_a, n_b, n_e) = meta
    A_tot = A1 + A2 + A3
    N1 = n_a + n_b
    N1C = _round_up(N1, TILE)
    E_rows = TILE if ITE >= 0 else 0
    bead0 = N1C + E_rows
    if env_static is not None:
        tab4, t1e, t2e, maske = env_static

    ep = None
    if env_static is not None:
        HI = jax.lax.Precision.HIGHEST
        oh1e = jax.nn.one_hot(t1e, tab4.shape[0], dtype=jnp.float32)
        oh2e = jax.nn.one_hot(t2e, tab4.shape[1], dtype=jnp.float32)
        ep = jnp.stack([
            jnp.einsum('ia,ab,jb->ij', oh1e,
                       tab4[:, :, c].astype(jnp.float32), oh2e,
                       precision=HI)
            for c in range(4)])                       # (4, n_e, n2)
        ep = jnp.pad(ep, ((0, 0), (0, TILE - n_e), (0, n2p - n2)))

    oh1 = jnp.zeros((N1P, Ap), jnp.float32)
    oh1 = oh1.at[:n_a, :A1].set(jax.nn.one_hot(t1s[0], A1,
                                               dtype=jnp.float32))
    oh1 = oh1.at[n_a:N1, A1:A1 + A2].set(
        jax.nn.one_hot(t1s[1], A2, dtype=jnp.float32))
    oh1 = oh1.at[bead0:bead0 + n2, A1 + A2:A1 + A2 + A3].set(
        jax.nn.one_hot(t1s[2], A3, dtype=jnp.float32))

    # per-family poly expansion against the SHARED (ka, k) layout, stacked
    # along the type axis so slab p rows are [fam1 A1 | fam2 A2 | fam3 A3]
    P = jnp.asarray(_poly_matrix(ka, k))
    HI = jax.lax.Precision.HIGHEST
    slabs = []
    for tab, t2f in zip((tab1, tab2, tab3), t2s):
        oh2 = jax.nn.one_hot(t2f, tab.shape[1], dtype=jnp.float32)
        tpoly = jnp.einsum('abm,mp->abp', tab, P, precision=HI)
        slabs.append(jnp.einsum('abp,jb->paj', tpoly, oh2, precision=HI))
    t2t = jnp.concatenate(slabs, axis=1)            # (Mp, A_tot, n2)
    t2t = jnp.pad(t2t, ((0, 0), (0, Ap - A_tot), (0, n2p - n2)))
    t2t = _hilo_split(t2t)                  # (Mp * 2Ap, n2p), [hi; lo] rows

    maskcat = jnp.zeros((N1P, n2p), jnp.float32)
    maskcat = maskcat.at[:n_a, :n2].set(masks[0].astype(jnp.float32))
    maskcat = maskcat.at[n_a:N1, :n2].set(masks[1].astype(jnp.float32))
    if env_static is not None:
        maskcat = maskcat.at[N1C:N1C + n_e, :n2].set(
            maske.astype(jnp.float32))
    maskcat = maskcat.at[bead0:bead0 + n2, :n2].set(
        masks[2].astype(jnp.float32))

    return (oh1, t2t, maskcat, ep), meta


def _fused_prep_dyn(meta, x1a, w1a, x1b, w1b, xb, x1e=None, wcol=None):
    """Position-dependent half of _fused_prep (runs every evaluation)."""
    (fam, Ap, IT0, kcc, kcp, N1P, n2p, n2, ITE, n_a, n_b, n_e) = meta
    n_rep = xb.shape[0]
    N1 = n_a + n_b
    N1C = _round_up(N1, TILE)
    E_rows = TILE if ITE >= 0 else 0
    pad_mid = N1C - N1

    def row8(x, w6, w7):
        cols = [x[:, :, :6].astype(jnp.float32)]
        cols.append((w6 if w6 is not None else
                     jnp.zeros(x.shape[:2], jnp.float32))[:, :, None]
                    .astype(jnp.float32))
        cols.append((w7 if w7 is not None else
                     jnp.zeros(x.shape[:2], jnp.float32))[:, :, None]
                    .astype(jnp.float32))
        return jnp.concatenate(cols, axis=2)

    parts = [
        row8(x1a, w1a, None),
        row8(x1b, None, w1b),
        jnp.zeros((n_rep, pad_mid, 8), jnp.float32)]
    if ITE >= 0:
        parts.append(row8(x1e, None, None))
        parts.append(jnp.zeros((n_rep, E_rows - n_e, 8), jnp.float32))
    parts.extend([
        row8(xb, None, None),
        jnp.zeros((n_rep, n2p - n2, 8), jnp.float32)])
    x1cat = jnp.concatenate(parts, axis=1)
    x2t = jnp.pad(jnp.swapaxes(xb[:, :, :6].astype(jnp.float32), 1, 2),
                  ((0, 0), (0, 2), (0, n2p - n2)))
    if ITE >= 0:
        x2t = x2t.at[:, 6, :n2].set(wcol.astype(jnp.float32))
    return x1cat, x2t


def _fused_prep(fams, tabs, t1s, t2s, x1a, w1a, x1b, w1b, xb, masks,
                env=None, prep=None):
    """Pad, unify spline families, and build the concatenated operands.
    x1a/x1b/xb carry a leading replica axis; w1a/w1b likewise.

    env (optional): (tab4, t1e, t2e, maske, x1e, wcol) adds one
    environment-coverage row tile between the coverage and pair bands:
    x1e (n_rep, n_e<=128, 6) CB probes, wcol (n_rep, n2) per-column
    Boltzmann weights (riding x2t row 6), tab4 (nt1, nt2, 4) the
    (r0, r_sharp, dot0, dot_sharp) table whose per-pair planes are
    precomputed here (position-independent one-hot lookups).

    prep (optional): a ((oh1, t2t, maskcat, ep), meta) pair from
    _fused_prep_static, computed ONCE per advance call — skips the
    parameter-only staging entirely (see _fused_prep_static)."""
    if env is not None:
        tab4, t1e, t2e, maske, x1e, wcol = env
        env_static = (tab4, t1e, t2e, maske)
        n_e = x1e.shape[1]
    else:
        env_static, x1e, wcol, n_e = None, None, None, 0
    if prep is None:
        shapes = (x1a.shape[1], x1b.shape[1], xb.shape[1], n_e)
        prep = _fused_prep_static(fams, tabs, t1s, t2s, masks, shapes,
                                  env_static)
    (oh1, t2t, maskcat, ep), meta = prep
    x1cat, x2t = _fused_prep_dyn(meta, x1a, w1a, x1b, w1b, xb, x1e, wcol)
    (fam, Ap, IT0, kcc, kcp, N1P, n2p, n2, ITE, _, _, _) = meta
    return (x1cat, x2t, oh1, t2t, maskcat, fam, Ap, IT0,
            kcc, kcp, N1P, n2p, n2, ITE, ep)


def _fused_fwd_batched(fams, interpret, rb, tabs, t1s, t2s, masks,
                       x1a, w1a, x1b, w1b, xb, env=None, prep=None,
                       want_planes=False):
    (x1cat, x2t, oh1, t2t, maskcat, fam, A_tot, IT0, kcc, kcp, N1P, n2p,
     n2, ITE, ep) = _fused_prep(fams, tabs, t1s, t2s, x1a, w1a, x1b, w1b,
                                xb, masks, env, prep)
    ka, k, inv_dx = fam
    n_rep = xb.shape[0]
    Mp = t2t.shape[0] // (2 * A_tot)
    rb = min(rb, max(n_rep, 1))
    x1cat, n_rb = _pad_reps(x1cat, rb)
    x2t, _ = _pad_reps(x2t, rb)
    n_it = N1P // TILE
    n_it_pair = n_it - IT0
    R = n_rb * rb
    in_specs = [
        pl.BlockSpec((rb, TILE, 8), lambda j, i, r: (r, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 8, TILE), lambda j, i, r: (r, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, A_tot), lambda j, i, r: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Mp * 2 * A_tot, TILE), lambda j, i, r: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, TILE), lambda j, i, r: (i, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x1cat, x2t, oh1, t2t, maskcat]
    if ITE >= 0:
        in_specs.append(pl.BlockSpec((4, TILE, TILE),
                                     lambda j, i, r: (0, 0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(ep)
    out_specs = [
        pl.BlockSpec((1, rb, 8, TILE), lambda j, i, r: (i, r, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, TILE, TILE),
                     lambda j, i, r: (r, jnp.maximum(i - IT0, 0), j),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_it, R, 8, n2p), jnp.float32),
        jax.ShapeDtypeStruct((R, n_it_pair * TILE, n2p), jnp.float32),
    ]
    if want_planes:
        out_specs.append(pl.BlockSpec((rb, 3, TILE, TILE),
                                      lambda j, i, r: (r, 0, i, j),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((R, 3, N1P, n2p),
                                              jnp.float32))
        # value plane, coverage band only: pair tiles land on the env
        # tile's scrap block (min clamp); the backward never reads it
        out_specs.append(pl.BlockSpec(
            (rb, TILE, TILE),
            lambda j, i, r: (r, jnp.minimum(i, IT0 - 1), j),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((R, IT0 * TILE, n2p),
                                              jnp.float32))
    kouts = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, ka, k, inv_dx, A_tot, IT0,
                          ITE, kcc, kcp, want_planes),
        grid=(n2p // TILE, n_it, n_rb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((Mp, TILE, TILE), jnp.float32)],
        # the coefficient-plane scratch alone is Mp*64KB (~13 MB for the
        # shipped families) — above the conservative 16 MB default scoped
        # limit but well within v5e's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    if want_planes:
        cs_part, grid, planes, vcov = kouts
    else:
        cs_part, grid = kouts
    cs = jnp.sum(cs_part, axis=0)                        # (R, 8, n2p)
    cov1 = cs[:n_rep, 0, :n2].astype(xb.dtype)
    cov2 = cs[:n_rep, 1, :n2].astype(xb.dtype)
    # the pair grid is returned at its PADDED (n2p, n2p) kernel layout
    # (zeros beyond n2 — masked tiles write 0): the BP mega-kernel pads
    # its E_pair operand to the same 128-aligned shape, so handing the
    # padded band over directly elides two 37 MB layout copies per eval
    # (slice+re-pad forward, pad-scatter backward) on the 64-replica
    # bench graph
    outs = (cov1, cov2, grid[:n_rep].astype(xb.dtype))
    if ITE >= 0:
        n_e = env[4].shape[1]
        envsum = cs[:n_rep, 2, :].reshape(
            n_rep, n2p // TILE, TILE).sum(1)[:, :n_e]
        outs = outs + (envsum.astype(xb.dtype),)
    if want_planes:
        outs = outs + (planes[:n_rep], vcov[:n_rep])
    return outs


def _fused_bwd_batched(fams, interpret, rb, tabs, t1s, t2s, masks,
                       x1a, w1a, x1b, w1b, xb, g1, g2, gg, env=None,
                       genv=None, prep=None, planes=None, vcov=None):
    (x1cat, x2t, oh1, t2t, maskcat, fam, A_tot, IT0, kcc, kcp, N1P, n2p,
     n2, ITE, ep) = _fused_prep(fams, tabs, t1s, t2s, x1a, w1a, x1b, w1b,
                                xb, masks, env, prep)
    ka, k, inv_dx = fam
    n_rep = xb.shape[0]
    n_a, n_b = x1a.shape[1], x1b.shape[1]
    N1 = n_a + n_b
    N1C = _round_up(N1, TILE)
    if ITE >= 0:
        # the env band's per-row output cotangent rides x1 column 6
        n_e = env[4].shape[1]
        x1cat = x1cat.at[:, N1C:N1C + n_e, 6].set(
            genv.astype(jnp.float32))
    Mp = t2t.shape[0] // (2 * A_tot)
    rb = min(rb, max(n_rep, 1))
    x1cat, n_rb = _pad_reps(x1cat, rb)
    x2t, _ = _pad_reps(x2t, rb)
    R = n_rb * rb

    gcs = jnp.stack([g1.astype(jnp.float32), g2.astype(jnp.float32)],
                    axis=1)                              # (n_rep, 2, n2)
    gcs = jnp.pad(gcs, ((0, R - n_rep), (0, 6), (0, n2p - n2)))
    # gg arrives at the padded (n2p, n2p) grid layout when it is the
    # VJP cotangent of the padded forward output (pad widths 0 below);
    # unfused callers may still hand (n2, n2)
    ggrid = jnp.pad(gg.astype(jnp.float32),
                    ((0, R - n_rep), (0, n2p - gg.shape[1]),
                     (0, n2p - gg.shape[2])))

    n_it = N1P // TILE
    n_j = n2p // TILE
    if planes is not None:
        # residual-consuming backward: the derivative fields replace the
        # type one-hots, parameter slab, and C-plane scratch entirely.
        # Grid (n_j, n_rb, n_it) — row tiles INNERMOST (no C-scratch to
        # amortize here), so the clamped vcov/ggrid windows repeat
        # across consecutive row tiles and their re-fetches are elided.
        planes = jnp.pad(planes.astype(jnp.float32),
                         ((0, R - n_rep), (0, 0), (0, 0), (0, 0)))
        vcov = jnp.pad(vcov.astype(jnp.float32),
                       ((0, R - n_rep), (0, 0), (0, 0)))
        in_specs = [
            pl.BlockSpec((rb, TILE, 8), lambda j, r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8, TILE), lambda j, r, i: (r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda j, r, i: (i, j),
                         memory_space=pltpu.VMEM),
        ]
        operands = [x1cat, x2t, maskcat]
        if ITE >= 0:
            in_specs.append(pl.BlockSpec((4, TILE, TILE),
                                         lambda j, r, i: (0, 0, j),
                                         memory_space=pltpu.VMEM))
            operands.append(ep)
        in_specs.extend([
            pl.BlockSpec((rb, 3, TILE, TILE),
                         lambda j, r, i: (r, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, TILE, TILE),
                         lambda j, r, i: (r, jnp.minimum(i, IT0 - 1), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8, TILE), lambda j, r, i: (r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, TILE, TILE),
                         lambda j, r, i: (r, jnp.maximum(i - IT0, 0), j),
                         memory_space=pltpu.VMEM),
        ])
        operands.extend([planes, vcov, gcs, ggrid])
        kernel = functools.partial(_fused_bwd_resid_kernel, IT0, ITE,
                                   inv_dx, kcc, kcp)
        scratch = []
        grid = (n_j, n_rb, n_it)
        out_specs = (
            pl.BlockSpec((1, rb, TILE, 8), lambda j, r, i: (j, r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 8, TILE), lambda j, r, i: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
        )
    else:
        in_specs = [
            pl.BlockSpec((rb, TILE, 8), lambda j, i, r: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8, TILE), lambda j, i, r: (r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, A_tot), lambda j, i, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp * 2 * A_tot, TILE), lambda j, i, r: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda j, i, r: (i, j),
                         memory_space=pltpu.VMEM),
        ]
        operands = [x1cat, x2t, oh1, t2t, maskcat]
        if ITE >= 0:
            in_specs.append(pl.BlockSpec((4, TILE, TILE),
                                         lambda j, i, r: (0, 0, j),
                                         memory_space=pltpu.VMEM))
            operands.append(ep)
        in_specs.extend([
            pl.BlockSpec((rb, 8, TILE), lambda j, i, r: (r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, TILE, TILE),
                         lambda j, i, r: (r, jnp.maximum(i - IT0, 0), j),
                         memory_space=pltpu.VMEM),
        ])
        operands.extend([gcs, ggrid])
        kernel = functools.partial(_fused_bwd_kernel, ka, k, inv_dx,
                                   A_tot, IT0, ITE, kcc, kcp)
        scratch = [pltpu.VMEM((Mp, TILE, TILE), jnp.float32)]
        grid = (n_j, n_it, n_rb)
        out_specs = (
            pl.BlockSpec((1, rb, TILE, 8), lambda j, i, r: (j, r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 8, TILE), lambda j, i, r: (i, r, 0, j),
                         memory_space=pltpu.VMEM),
        )
    d1_part, d2_part = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((n_j, R, N1P, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_it, R, 8, n2p), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    d1 = jnp.sum(d1_part, axis=0)                        # (R, N1P, 8)
    d2 = jnp.swapaxes(jnp.sum(d2_part, axis=0), 1, 2)    # (R, n2p, 8)
    dxa = d1[:n_rep, :n_a]
    dxb = d1[:n_rep, n_a:N1]
    bead0 = N1C + (TILE if ITE >= 0 else 0)
    dbeads_g1 = d1[:n_rep, bead0:bead0 + n2, :6]
    outs = (dxa, dxb, dbeads_g1, d2[:n_rep, :n2])
    if ITE >= 0:
        dxe = d1[:n_rep, N1C:N1C + n_e, :6]
        outs = outs + (dxe,)
    return outs


@functools.lru_cache(maxsize=None)
def _fused_fwd_dispatch(fams, interpret):
    @jax.custom_batching.custom_vmap
    def fwd(tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c, ma, mb, mc,
            x1a, w1a, x1b, w1b, xb):
        c1, c2, grid = _fused_fwd_batched(
            fams, interpret, RB_FWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a[None], w1a[None],
            x1b[None], w1b[None], xb[None])
        return c1[0], c2[0], grid[0]

    @fwd.def_vmap
    def rule(axis_size, in_batched, tab1, tab2, tab3, t1a, t1b, t1c,
             t2a, t2b, t2c, ma, mb, mc, x1a, w1a, x1b, w1b, xb):
        statics = (tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c,
                   ma, mb, mc)
        dyn = [x1a, w1a, x1b, w1b, xb]
        if any(in_batched[:12]):
            # per-replica tables/masks (Hamiltonian ensembles): sequential
            # fallback keeps semantics without kernel support
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(statics + tuple(dyn), in_batched)]
            out = jax.lax.map(lambda args: fwd(*args), tuple(bs))
            return out, (True, True, True)
        for n, b in enumerate(in_batched[12:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        x1a, w1a, x1b, w1b, xb = dyn
        out = _fused_fwd_batched(
            fams, interpret, RB_FWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a, w1a, x1b, w1b, xb)
        return out, (True, True, True)

    return fwd


@functools.lru_cache(maxsize=None)
def _fused_bwd_dispatch(fams, interpret):
    @jax.custom_batching.custom_vmap
    def bwd(tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c, ma, mb, mc,
            x1a, w1a, x1b, w1b, xb, g1, g2, gg):
        outs = _fused_bwd_batched(
            fams, interpret, RB_BWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a[None], w1a[None],
            x1b[None], w1b[None], xb[None], g1[None], g2[None], gg[None])
        return tuple(o[0] for o in outs)

    @bwd.def_vmap
    def rule(axis_size, in_batched, tab1, tab2, tab3, t1a, t1b, t1c,
             t2a, t2b, t2c, ma, mb, mc, x1a, w1a, x1b, w1b, xb, g1, g2,
             gg):
        statics = (tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c,
                   ma, mb, mc)
        dyn = [x1a, w1a, x1b, w1b, xb, g1, g2, gg]
        if any(in_batched[:12]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(statics + tuple(dyn), in_batched)]
            out = jax.lax.map(lambda args: bwd(*args), tuple(bs))
            return out, (True, True, True, True)
        for n, b in enumerate(in_batched[12:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        x1a, w1a, x1b, w1b, xb, g1, g2, gg = dyn
        out = _fused_bwd_batched(
            fams, interpret, RB_BWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a, w1a, x1b, w1b, xb, g1, g2,
            gg)
        return out, (True, True, True, True)

    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_pair_block(fams, interpret, tab1, tab2, tab3, t1a, t1b, t1c,
                     t2a, t2b, t2c, ma, mb, mc, x1a, w1a, x1b, w1b, xb):
    """One kernel for (hbond coverage colsum, hydrophobe coverage colsum,
    bead pair grid) sharing the bead operand xb.

    fams: ((ka, k_cov, inv_dx), (ka, k_pair, inv_dx)) — the coverage
    tables (tab1, tab2) must be one family and the pair table (tab3)
    another (possibly equal); all must share ka and inv_dx (true for
    every shipped parameter set, src/bead_interaction.h:12-27).

    Returns (cov1 (n2,), cov2 (n2,), grid (n2, n2)); identical values to
    three separate quadspline_colsum_pallas/quadspline_pallas calls.
    Gradients flow to the tables, x1a/w1a, x1b/w1b and xb."""
    return _fused_fwd_dispatch(fams, interpret)(
        tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c, ma, mb, mc,
        x1a, w1a, x1b, w1b, xb)


def _fused_fwd_rule(fams, interpret, tab1, tab2, tab3, t1a, t1b, t1c,
                    t2a, t2b, t2c, ma, mb, mc, x1a, w1a, x1b, w1b, xb):
    out = _fused_fwd_dispatch(fams, interpret)(
        tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c, ma, mb, mc,
        x1a, w1a, x1b, w1b, xb)
    return out, (tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c, ma, mb,
                 mc, x1a, w1a, x1b, w1b, xb)


def _fused_bwd_rule(fams, interpret, res, cots):
    (tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c, ma, mb, mc,
     x1a, w1a, x1b, w1b, xb) = res
    g1, g2, gg = cots
    fam_cov, fam_pair = fams

    dxa, dxb, dbg1, d2 = _fused_bwd_dispatch(fams, interpret)(
        tab1, tab2, tab3, t1a, t1b, t1c, t2a, t2b, t2c, ma, mb, mc,
        x1a, w1a, x1b, w1b, xb, g1, g2, gg)

    d_x1a = jnp.zeros_like(x1a).at[:, :6].set(dxa[:, :6].astype(x1a.dtype))
    d_w1a = dxa[:, 6].astype(w1a.dtype)
    d_x1b = jnp.zeros_like(x1b).at[:, :6].set(dxb[:, :6].astype(x1b.dtype))
    d_w1b = dxb[:, 7].astype(w1b.dtype)
    d_xb = jnp.zeros_like(xb).at[:, :6].set(
        (dbg1 + d2[:, :6]).astype(xb.dtype))

    # table cotangents through the XLA dense-window formulation (dead-code
    # eliminated in MD; alive only under parameter training)
    gm1 = w1a[:, None] * g1[None, :]
    d_tab1 = _table_cotangent(fam_cov, tab1, t1a, t2a, x1a, xb, ma, gm1)
    gm2 = w1b[:, None] * g2[None, :]
    d_tab2 = _table_cotangent(fam_cov, tab2, t1b, t2b, x1b, xb, mb, gm2)
    # gg is the padded-grid cotangent; the XLA table-cotangent
    # formulation works in unpadded bead space
    d_tab3 = _table_cotangent(fam_pair, tab3, t1c, t2c, xb, xb, mc,
                              gg[..., :xb.shape[-2], :xb.shape[-2]])
    return (d_tab1, d_tab2, d_tab3, None, None, None, None, None, None,
            None, None, None, d_x1a, d_w1a, d_x1b, d_w1b, d_xb)


fused_pair_block.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# --- fused block WITH the environment-coverage band -------------------------
# Same kernels with one extra row tile of CB probes evaluating compact
# radial x angular sigmoids (reference environment.cpp:12-68) against the
# shared bead columns, weighted by per-column Boltzmann weights.  Kept as
# a separate entry point so the measured default path is untouched;
# enabled by nodes/fusion.py under UPSIDE_FUSE_ENV=1.

def _env_pack(tab4, t1e, t2e, me, x1e, wcol):
    return (tab4, t1e, t2e, me, x1e, wcol)


@functools.lru_cache(maxsize=None)
def _fused_env_fwd_dispatch(fams, interpret):
    @jax.custom_batching.custom_vmap
    def fwd(tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c,
            t2e, ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e, wcol):
        outs = _fused_fwd_batched(
            fams, interpret, RB_FWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a[None], w1a[None],
            x1b[None], w1b[None], xb[None],
            env=_env_pack(tab4, t1e, t2e, me, x1e[None], wcol[None]))
        return tuple(o[0] for o in outs)

    @fwd.def_vmap
    def rule(axis_size, in_batched, *args):
        statics = args[:16]
        dyn = list(args[16:])
        if any(in_batched[:16]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(args, in_batched)]
            out = jax.lax.map(lambda aa: fwd(*aa), tuple(bs))
            return out, (True, True, True, True)
        for n, b in enumerate(in_batched[16:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        (tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c, t2e,
         ma, mb, mc, me) = statics
        x1a, w1a, x1b, w1b, xb, x1e, wcol = dyn
        out = _fused_fwd_batched(
            fams, interpret, RB_FWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a, w1a, x1b, w1b, xb,
            env=_env_pack(tab4, t1e, t2e, me, x1e, wcol))
        return out, (True, True, True, True)

    return fwd


@functools.lru_cache(maxsize=None)
def _fused_env_bwd_dispatch(fams, interpret):
    @jax.custom_batching.custom_vmap
    def bwd(tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c,
            t2e, ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e, wcol,
            g1, g2, gg, genv):
        outs = _fused_bwd_batched(
            fams, interpret, RB_BWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a[None], w1a[None],
            x1b[None], w1b[None], xb[None], g1[None], g2[None], gg[None],
            env=_env_pack(tab4, t1e, t2e, me, x1e[None], wcol[None]),
            genv=genv[None])
        return tuple(o[0] for o in outs)

    @bwd.def_vmap
    def rule(axis_size, in_batched, *args):
        statics = args[:16]
        dyn = list(args[16:])
        if any(in_batched[:16]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(args, in_batched)]
            out = jax.lax.map(lambda aa: bwd(*aa), tuple(bs))
            return out, (True,) * 5
        for n, b in enumerate(in_batched[16:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        (tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c, t2e,
         ma, mb, mc, me) = statics
        x1a, w1a, x1b, w1b, xb, x1e, wcol, g1, g2, gg, genv = dyn
        out = _fused_bwd_batched(
            fams, interpret, RB_BWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a, w1a, x1b, w1b, xb, g1,
            g2, gg, env=_env_pack(tab4, t1e, t2e, me, x1e, wcol),
            genv=genv)
        return out, (True,) * 5

    return bwd


@functools.lru_cache(maxsize=None)
def _fused_env_fwdres_dispatch(fams, interpret):
    """_fused_env_fwd_dispatch + the derivative-field planes and the
    coverage-band value plane as fifth/sixth outputs (consumed by the
    residual backward, see _resid_enabled)."""
    @jax.custom_batching.custom_vmap
    def fwd(tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c,
            t2e, ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e, wcol):
        outs = _fused_fwd_batched(
            fams, interpret, RB_FWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a[None], w1a[None],
            x1b[None], w1b[None], xb[None],
            env=_env_pack(tab4, t1e, t2e, me, x1e[None], wcol[None]),
            want_planes=True)
        return tuple(o[0] for o in outs)

    @fwd.def_vmap
    def rule(axis_size, in_batched, *args):
        statics = args[:16]
        dyn = list(args[16:])
        if any(in_batched[:16]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(args, in_batched)]
            out = jax.lax.map(lambda aa: fwd(*aa), tuple(bs))
            return out, (True,) * 6
        for n, b in enumerate(in_batched[16:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        (tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c, t2e,
         ma, mb, mc, me) = statics
        x1a, w1a, x1b, w1b, xb, x1e, wcol = dyn
        out = _fused_fwd_batched(
            fams, interpret, RB_FWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a, w1a, x1b, w1b, xb,
            env=_env_pack(tab4, t1e, t2e, me, x1e, wcol),
            want_planes=True)
        return out, (True,) * 6

    return fwd


@functools.lru_cache(maxsize=None)
def _fused_env_bwdres_dispatch(fams, interpret):
    """_fused_env_bwd_dispatch taking the forward's derivative-field
    planes and coverage value plane as final operands (geometry +
    multiply-reduce kernel)."""
    @jax.custom_batching.custom_vmap
    def bwd(tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c,
            t2e, ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e, wcol,
            g1, g2, gg, genv, planes, vcov):
        outs = _fused_bwd_batched(
            fams, interpret, RB_BWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a[None], w1a[None],
            x1b[None], w1b[None], xb[None], g1[None], g2[None], gg[None],
            env=_env_pack(tab4, t1e, t2e, me, x1e[None], wcol[None]),
            genv=genv[None], planes=planes[None], vcov=vcov[None])
        return tuple(o[0] for o in outs)

    @bwd.def_vmap
    def rule(axis_size, in_batched, *args):
        statics = args[:16]
        dyn = list(args[16:])
        if any(in_batched[:16]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(args, in_batched)]
            out = jax.lax.map(lambda aa: bwd(*aa), tuple(bs))
            return out, (True,) * 5
        for n, b in enumerate(in_batched[16:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        (tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c, t2e,
         ma, mb, mc, me) = statics
        (x1a, w1a, x1b, w1b, xb, x1e, wcol, g1, g2, gg, genv,
         planes, vcov) = dyn
        out = _fused_bwd_batched(
            fams, interpret, RB_BWD, (tab1, tab2, tab3), (t1a, t1b, t1c),
            (t2a, t2b, t2c), (ma, mb, mc), x1a, w1a, x1b, w1b, xb, g1,
            g2, gg, env=_env_pack(tab4, t1e, t2e, me, x1e, wcol),
            genv=genv, planes=planes, vcov=vcov)
        return out, (True,) * 5

    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_pair_block_env(fams, interpret, tab1, tab2, tab3, tab4,
                         t1a, t1b, t1c, t1e, t2a, t2b, t2c, t2e,
                         ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e,
                         wcol):
    """fused_pair_block plus the environment-coverage band: x1e are the
    CB probe rows (n_e <= 128, pos+direction), wcol the per-bead-column
    Boltzmann weights, tab4 the (nt1, nt2, [r0, r_sharp, dot0,
    dot_sharp]) sigmoid table (reference environment.cpp:12-68).

    Returns (cov1, cov2, grid, env (n_e,)); env values identical to the
    XLA environment_coverage node.  Gradients additionally flow to x1e
    and wcol (and tab4 under training).

    HBM note: with UPSIDE_FUSED_RESID on (the default), differentiation
    holds a (3, N1P, n2p) float32 derivative-planes residual plus a
    (IT0*128, n2p) coverage value plane per replica between forward and
    backward — for the 76-res headline problem (N1P=896, n2p=384,
    IT0=4) that is 3.9 MB + 0.75 MB ≈ 4.7 MB per replica (~2.4 GB @512
    replicas), growing linearly with replicas and padded tile counts.
    Set UPSIDE_FUSED_RESID=0 to trade it back for the recomputing
    backward if a large-replica run OOMs."""
    return _fused_env_fwd_dispatch(fams, interpret)(
        tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c, t2e,
        ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e, wcol)


def _fused_env_fwd_rule(fams, interpret, *args):
    # residuals always end in (planes, vcov) slots (arrays or None) so
    # the bwd rule unpacks a fixed structure regardless of the resid flag
    if _resid_enabled():
        *out, planes, vcov = _fused_env_fwdres_dispatch(
            fams, interpret)(*args)
        return tuple(out), args + (planes, vcov)
    out = _fused_env_fwd_dispatch(fams, interpret)(*args)
    return out, args + (None, None)


def _env_xla_rowsums(tab4, t1e, t2e, me, x1e, wcol, xb):
    """XLA reference formulation of the env band (for table cotangents
    under training; dead-code eliminated in MD)."""
    from .sigmoid import compact_sigmoid
    p = tab4[t1e[:, None], t2e[None, :]]     # (n_e, n2, 4)
    d = xb[None, :, :3] - x1e[:, None, :3]
    dist = jnp.sqrt(jnp.sum(d * d, -1) + 1e-12)
    dp = jnp.sum(d * x1e[:, None, 3:6], -1) / dist
    radial, _ = compact_sigmoid(dist - p[..., 0], p[..., 1])
    angular, _ = compact_sigmoid(p[..., 2] - dp, p[..., 3])
    val = jnp.where(me, wcol[None, :] * radial * angular, 0.0)
    return jnp.sum(val, axis=1)


def _fused_env_bwd_rule(fams, interpret, res, cots):
    *res, planes, vcov = res
    (tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c, t2e,
     ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e, wcol) = res
    g1, g2, gg, genv = cots
    fam_cov, fam_pair = fams

    if planes is not None:
        dxa, dxb, dbg1, d2, dxe = _fused_env_bwdres_dispatch(
            fams, interpret)(
            tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c,
            t2e, ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e, wcol,
            g1, g2, gg, genv, planes, vcov)
    else:
        dxa, dxb, dbg1, d2, dxe = _fused_env_bwd_dispatch(
            fams, interpret)(
            tab1, tab2, tab3, tab4, t1a, t1b, t1c, t1e, t2a, t2b, t2c,
            t2e, ma, mb, mc, me, x1a, w1a, x1b, w1b, xb, x1e, wcol,
            g1, g2, gg, genv)

    d_x1a = jnp.zeros_like(x1a).at[:, :6].set(dxa[:, :6].astype(x1a.dtype))
    d_w1a = dxa[:, 6].astype(w1a.dtype)
    d_x1b = jnp.zeros_like(x1b).at[:, :6].set(dxb[:, :6].astype(x1b.dtype))
    d_w1b = dxb[:, 7].astype(w1b.dtype)
    d_xb = jnp.zeros_like(xb).at[:, :6].set(
        (dbg1 + d2[:, :6]).astype(xb.dtype))
    d_x1e = jnp.zeros_like(x1e).at[:, :6].set(dxe[:, :6].astype(x1e.dtype))
    d_wcol = d2[:, 6].astype(wcol.dtype)

    gm1 = w1a[:, None] * g1[None, :]
    d_tab1 = _table_cotangent(fam_cov, tab1, t1a, t2a, x1a, xb, ma, gm1)
    gm2 = w1b[:, None] * g2[None, :]
    d_tab2 = _table_cotangent(fam_cov, tab2, t1b, t2b, x1b, xb, mb, gm2)
    # gg is the padded-grid cotangent; the XLA table-cotangent
    # formulation works in unpadded bead space
    d_tab3 = _table_cotangent(fam_pair, tab3, t1c, t2c, xb, xb, mc,
                              gg[..., :xb.shape[-2], :xb.shape[-2]])
    d_tab4 = jax.grad(lambda t: jnp.sum(genv * _env_xla_rowsums(
        t, t1e, t2e, me, x1e[:, :6].astype(jnp.float32),
        wcol.astype(jnp.float32),
        xb[:, :6].astype(jnp.float32))))(tab4.astype(jnp.float32)) \
        .astype(tab4.dtype)
    return (d_tab1, d_tab2, d_tab3, d_tab4, None, None, None, None, None,
            None, None, None, None, None, None, None, d_x1a, d_w1a,
            d_x1b, d_w1b, d_xb, d_x1e, d_wcol)


fused_pair_block_env.defvjp(_fused_env_fwd_rule, _fused_env_bwd_rule)


# --- prepared-operand entry point (MD fast path) -----------------------------
# Same kernels as fused_pair_block_env, but the parameter-only operand
# staging (oh1 / t2t / maskcat / ep) arrives PRECOMPUTED — built once per
# Simulation.advance call by PairFusionPlan.prepare and threaded through
# the jit boundary — instead of being rebuilt (and never hoisted, see
# BENCH_NOTES round-4 optimized-HLO section) inside the MD loop on every
# force evaluation.  Table cotangents are NOT computed on this path:
# parameter training uses the unprepared entry (fusion.compute only
# selects this path when the caller supplies a prepared pack, which only
# Simulation.advance does, and advance is never differentiated w.r.t.
# params).

@functools.lru_cache(maxsize=None)
def _fused_prep_fwd_dispatch(meta, interpret):
    @jax.custom_batching.custom_vmap
    def fwd(oh1, t2t, maskcat, ep, x1a, w1a, x1b, w1b, xb, x1e, wcol):
        outs = _fused_fwd_batched(
            None, interpret, RB_FWD, None, None, None, None,
            x1a[None], w1a[None], x1b[None], w1b[None], xb[None],
            env=_env_pack(None, None, None, None, x1e[None], wcol[None]),
            prep=((oh1, t2t, maskcat, ep), meta))
        return tuple(o[0] for o in outs)

    @fwd.def_vmap
    def rule(axis_size, in_batched, *args):
        statics = args[:4]
        dyn = list(args[4:])
        if any(in_batched[:4]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(args, in_batched)]
            out = jax.lax.map(lambda aa: fwd(*aa), tuple(bs))
            return out, (True, True, True, True)
        for n, b in enumerate(in_batched[4:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        oh1, t2t, maskcat, ep = statics
        x1a, w1a, x1b, w1b, xb, x1e, wcol = dyn
        out = _fused_fwd_batched(
            None, interpret, RB_FWD, None, None, None, None,
            x1a, w1a, x1b, w1b, xb,
            env=_env_pack(None, None, None, None, x1e, wcol),
            prep=((oh1, t2t, maskcat, ep), meta))
        return out, (True, True, True, True)

    return fwd


@functools.lru_cache(maxsize=None)
def _fused_prep_bwd_dispatch(meta, interpret):
    @jax.custom_batching.custom_vmap
    def bwd(oh1, t2t, maskcat, ep, x1a, w1a, x1b, w1b, xb, x1e, wcol,
            g1, g2, gg, genv):
        outs = _fused_bwd_batched(
            None, interpret, RB_BWD, None, None, None, None,
            x1a[None], w1a[None], x1b[None], w1b[None], xb[None],
            g1[None], g2[None], gg[None],
            env=_env_pack(None, None, None, None, x1e[None], wcol[None]),
            genv=genv[None], prep=((oh1, t2t, maskcat, ep), meta))
        return tuple(o[0] for o in outs)

    @bwd.def_vmap
    def rule(axis_size, in_batched, *args):
        statics = args[:4]
        dyn = list(args[4:])
        if any(in_batched[:4]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(args, in_batched)]
            out = jax.lax.map(lambda aa: bwd(*aa), tuple(bs))
            return out, (True,) * 5
        for n, b in enumerate(in_batched[4:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        oh1, t2t, maskcat, ep = statics
        x1a, w1a, x1b, w1b, xb, x1e, wcol, g1, g2, gg, genv = dyn
        out = _fused_bwd_batched(
            None, interpret, RB_BWD, None, None, None, None,
            x1a, w1a, x1b, w1b, xb, g1, g2, gg,
            env=_env_pack(None, None, None, None, x1e, wcol),
            genv=genv, prep=((oh1, t2t, maskcat, ep), meta))
        return out, (True,) * 5

    return bwd


@functools.lru_cache(maxsize=None)
def _fused_prep_fwdres_dispatch(meta, interpret):
    """_fused_prep_fwd_dispatch + derivative-field planes and coverage
    value-plane outputs."""
    @jax.custom_batching.custom_vmap
    def fwd(oh1, t2t, maskcat, ep, x1a, w1a, x1b, w1b, xb, x1e, wcol):
        outs = _fused_fwd_batched(
            None, interpret, RB_FWD, None, None, None, None,
            x1a[None], w1a[None], x1b[None], w1b[None], xb[None],
            env=_env_pack(None, None, None, None, x1e[None], wcol[None]),
            prep=((oh1, t2t, maskcat, ep), meta), want_planes=True)
        return tuple(o[0] for o in outs)

    @fwd.def_vmap
    def rule(axis_size, in_batched, *args):
        statics = args[:4]
        dyn = list(args[4:])
        if any(in_batched[:4]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(args, in_batched)]
            out = jax.lax.map(lambda aa: fwd(*aa), tuple(bs))
            return out, (True,) * 6
        for n, b in enumerate(in_batched[4:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        oh1, t2t, maskcat, ep = statics
        x1a, w1a, x1b, w1b, xb, x1e, wcol = dyn
        out = _fused_fwd_batched(
            None, interpret, RB_FWD, None, None, None, None,
            x1a, w1a, x1b, w1b, xb,
            env=_env_pack(None, None, None, None, x1e, wcol),
            prep=((oh1, t2t, maskcat, ep), meta), want_planes=True)
        return out, (True,) * 6

    return fwd


@functools.lru_cache(maxsize=None)
def _fused_prep_bwdres_dispatch(meta, interpret):
    """_fused_prep_bwd_dispatch consuming derivative-field planes."""
    @jax.custom_batching.custom_vmap
    def bwd(oh1, t2t, maskcat, ep, x1a, w1a, x1b, w1b, xb, x1e, wcol,
            g1, g2, gg, genv, planes, vcov):
        outs = _fused_bwd_batched(
            None, interpret, RB_BWD, None, None, None, None,
            x1a[None], w1a[None], x1b[None], w1b[None], xb[None],
            g1[None], g2[None], gg[None],
            env=_env_pack(None, None, None, None, x1e[None], wcol[None]),
            genv=genv[None], prep=((oh1, t2t, maskcat, ep), meta),
            planes=planes[None], vcov=vcov[None])
        return tuple(o[0] for o in outs)

    @bwd.def_vmap
    def rule(axis_size, in_batched, *args):
        statics = args[:4]
        dyn = list(args[4:])
        if any(in_batched[:4]):
            bs = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                  for a, b in zip(args, in_batched)]
            out = jax.lax.map(lambda aa: bwd(*aa), tuple(bs))
            return out, (True,) * 5
        for n, b in enumerate(in_batched[4:]):
            if not b:
                dyn[n] = jnp.broadcast_to(dyn[n],
                                          (axis_size,) + dyn[n].shape)
        oh1, t2t, maskcat, ep = statics
        (x1a, w1a, x1b, w1b, xb, x1e, wcol, g1, g2, gg, genv,
         planes, vcov) = dyn
        out = _fused_bwd_batched(
            None, interpret, RB_BWD, None, None, None, None,
            x1a, w1a, x1b, w1b, xb, g1, g2, gg,
            env=_env_pack(None, None, None, None, x1e, wcol),
            genv=genv, prep=((oh1, t2t, maskcat, ep), meta),
            planes=planes, vcov=vcov)
        return out, (True,) * 5

    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_pair_block_env_prep(meta, interpret, oh1, t2t, maskcat, ep,
                              x1a, w1a, x1b, w1b, xb, x1e, wcol):
    """fused_pair_block_env with prepared parameter-only operands.

    meta is the hashable scalar pack from _fused_meta; (oh1, t2t,
    maskcat, ep) the arrays from _fused_prep_static.  Values and
    position/weight gradients identical to fused_pair_block_env; table
    gradients are not computed (MD path only)."""
    return _fused_prep_fwd_dispatch(meta, interpret)(
        oh1, t2t, maskcat, ep, x1a, w1a, x1b, w1b, xb, x1e, wcol)


def _fused_prep_fwd_rule(meta, interpret, *args):
    # fixed residual structure: (planes, vcov) slots always present
    # (arrays or None)
    if _resid_enabled():
        *out, planes, vcov = _fused_prep_fwdres_dispatch(
            meta, interpret)(*args)
        return tuple(out), args + (planes, vcov)
    out = _fused_prep_fwd_dispatch(meta, interpret)(*args)
    return out, args + (None, None)


def _fused_prep_bwd_rule(meta, interpret, res, cots):
    *res, planes, vcov = res
    (oh1, t2t, maskcat, ep, x1a, w1a, x1b, w1b, xb, x1e, wcol) = res
    g1, g2, gg, genv = cots
    if planes is not None:
        dxa, dxb, dbg1, d2, dxe = _fused_prep_bwdres_dispatch(
            meta, interpret)(
            oh1, t2t, maskcat, ep, x1a, w1a, x1b, w1b, xb, x1e, wcol,
            g1, g2, gg, genv, planes, vcov)
    else:
        dxa, dxb, dbg1, d2, dxe = _fused_prep_bwd_dispatch(
            meta, interpret)(
            oh1, t2t, maskcat, ep, x1a, w1a, x1b, w1b, xb, x1e, wcol,
            g1, g2, gg, genv)
    d_x1a = jnp.zeros_like(x1a).at[:, :6].set(dxa[:, :6].astype(x1a.dtype))
    d_w1a = dxa[:, 6].astype(w1a.dtype)
    d_x1b = jnp.zeros_like(x1b).at[:, :6].set(dxb[:, :6].astype(x1b.dtype))
    d_w1b = dxb[:, 7].astype(w1b.dtype)
    d_xb = jnp.zeros_like(xb).at[:, :6].set(
        (dbg1 + d2[:, :6]).astype(xb.dtype))
    d_x1e = jnp.zeros_like(x1e).at[:, :6].set(dxe[:, :6].astype(x1e.dtype))
    d_wcol = d2[:, 6].astype(wcol.dtype)
    return (None, None, None, None, d_x1a, d_w1a, d_x1b, d_w1b, d_xb,
            d_x1e, d_wcol)


fused_pair_block_env_prep.defvjp(_fused_prep_fwd_rule,
                                 _fused_prep_bwd_rule)
