"""Fused Pallas TPU kernel: rotamer belief propagation + Bethe free energy.

The reference solves BP with hand-scheduled SIMD sweeps over a sparse edge
hash (src/rotamer.cpp:988-1061) and differentiates via the envelope theorem
(rotamer.cpp:956-985).  The round-1 TPU formulation ran the damped solve as
an XLA while_loop over dense (R, R, 6, 6) tensors; for a replica ensemble
that streams ~50 MB of edge potentials from HBM per BP iteration.

This kernel exploits that one replica's whole BP problem is tiny: for
R <= 128 residues the edge-potential tensor is 36 (a,b)-planes of
(128, 128) f32 = 2.4 MB, which fits in VMEM.  One grid step per replica:

  * P = exp(-E2) (validity-masked) is computed once in XLA and streamed in
    as 36 planes; the kernel reads planes from the VMEM block on demand,
  * the damped message loop (reference schedule: undamped first sweep,
    `chunk` sweeps per convergence check) runs as an in-kernel
    lax.while_loop -- zero HBM traffic per iteration,
  * the Bethe free energy AND its envelope gradients are assembled in the
    same kernel:  dF/dE2[i<j, a, b] = m_ij(a,b) * pbb/(EPS+pbb)  (pair
    marginals), dF/dE1[i, a] = b_i(a) * q + (1 - sum b q) * argmin (node
    marginals), so the custom VJP is a pure elementwise scale -- autodiff
    never sees the solve.  The pair-marginal normalization is two-pass so
    the 36 m_raw planes are never held at once (VMEM budget),
  * converged messages are returned for warm-starting the next force
    evaluation (MD positions move little between the 3 integrator stages).

HBM traffic per replica per evaluation: P planes in, gradients out --
one read and one write of the problem, independent of iteration count.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NROT = 6
EPS = 1e-10
LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _make_onehot_dots(bf16):
    """Exact f32 contractions against a bf16-exact one-hot operand.

    The f32 dynamic operand is split into bf16 hi + lo halves and both
    halves are contracted in ONE MXU issue: the one-hot side arrives
    pre-duplicated along the contraction axis ([S | S]) and the hi/lo
    halves are stacked along it ([hi; lo]), so (S|S)@(hi;lo) =
    S@hi + S@lo reconstructs the f32 result to ~2^-24 with the MAC count
    of two single-pass dots but a SINGLE instruction issue — profiling
    showed issue overhead, not MACs, dominates these scatter-shaped
    matmuls.  bf16=True slices the plain one-hot out of the duplicated
    operand and contracts the hi half alone."""
    f32 = jnp.float32
    bf = jnp.bfloat16

    def hl_rows(dyn):
        hi = dyn.astype(bf)
        lo = (dyn - hi.astype(f32)).astype(bf)
        return jnp.concatenate([hi, lo], axis=0)

    def hl_cols(dyn):
        hi = dyn.astype(bf)
        lo = (dyn - hi.astype(f32)).astype(bf)
        return jnp.concatenate([hi, lo], axis=1)

    def onehot_dot_l(oh_dup, dyn):
        """oh_dup (m, 2k) = [S | S]; dyn f32 (k, n) -> exact S @ dyn."""
        if bf16:
            return jax.lax.dot(oh_dup[:, :dyn.shape[0]], dyn.astype(bf),
                               preferred_element_type=f32)
        return jax.lax.dot(oh_dup, hl_rows(dyn),
                           preferred_element_type=f32)

    def onehot_dot_r(dyn, oh_stack):
        """dyn f32 (m, k); oh_stack (2k, n) = [S; S] -> exact dyn @ S."""
        if bf16:
            return jax.lax.dot(dyn.astype(bf), oh_stack[:dyn.shape[1]],
                               preferred_element_type=f32)
        return jax.lax.dot(hl_cols(dyn), oh_stack,
                           preferred_element_type=f32)

    return onehot_dot_l, onehot_dot_r


# --- shared in-kernel building blocks (used by both BP kernels) ------------

def _node_prep(e1_ref, valid_ref):
    """Per-rotamer-slot columns: validity, masked 1-body energies, the
    per-residue offset (min valid energy) and node potentials
    probC = exp(offset - E1)."""
    f32 = jnp.float32
    validC = [valid_ref[:, a:a + 1] for a in range(NROT)]        # (128,1)
    validB = [jnp.broadcast_to(v, (LANE, LANE)) for v in validC]
    BIG = f32(1e30)
    e1 = [e1_ref[:, a:a + 1] for a in range(NROT)]
    masked = [jnp.where(validC[a] > 0, e1[a], BIG) for a in range(NROT)]
    offset = masked[0]
    for a in range(1, NROT):
        offset = jnp.minimum(offset, masked[a])
    probC = [jnp.where(validC[a] > 0, jnp.exp(offset - e1[a]), 0.0)
             for a in range(NROT)]
    return validC, validB, masked, offset, probC


def _make_updates(P, adjP, validB, probC):
    """The damped synchronous BP sweep operators over 6 belief columns and
    6 edge-message planes (reference calculate_new_beliefs schedule)."""
    def edge_update(nbC, eb):
        VT = [(jnp.broadcast_to(nbC[b], (LANE, LANE)) / (EPS + eb[b])).T
              for b in range(NROT)]
        m = []
        for a in range(NROT):
            acc = P(a, 0) * VT[0]
            for b in range(1, NROT):
                acc = acc + P(a, b) * VT[b]
            m.append(acc * validB[a])
        norm = m[0]
        for a in range(1, NROT):
            norm = norm + m[a]
        rnorm = 1.0 / jnp.maximum(norm, EPS)
        return [jnp.where(adjP > 0, m[a] * rnorm, 1.0) for a in range(NROT)]

    def node_update(eb):
        # Max-center the log-message sums before exponentiating.  With the
        # all-pairs adjacency every identity edge contributes
        # log(1/n_valid) ~ -1.1, so a 76-residue node's raw sum sits near
        # -80; exp(-80) is f32-subnormal (flushed to zero on TPU), which
        # silently zeroed small belief slots and moved the BP fixed point
        # (caught by the bench.py device gate).  Centering is exact: the
        # subtracted constant cancels in the max-normalization below.
        sC = []
        for a in range(NROT):
            sC.append(jnp.sum(jnp.log(jnp.maximum(eb[a], 1e-30)) * adjP,
                              axis=1, keepdims=True))
        smax = sC[0]
        for a in range(1, NROT):
            smax = jnp.maximum(smax, sC[a])
        nbC = [probC[a] * jnp.exp(sC[a] - smax) for a in range(NROT)]
        mx = nbC[0]
        for a in range(1, NROT):
            mx = jnp.maximum(mx, nbC[a])
        rmx = 1.0 / jnp.maximum(mx, EPS)
        return [nbC[a] * rmx for a in range(NROT)]

    return edge_update, node_update


def _solve_loop(damping, max_iter, tol, chunk, edge_update, node_update,
                nb, eb):
    """Damped solve to tolerance; several sweeps per convergence check
    (the reference's iteration_chunk_size)."""
    f32 = jnp.float32

    def cond(state):
        it, dev = state[0], state[1]
        return jnp.logical_and(it < max_iter, dev > tol)

    def body(state):
        it, _, nb, eb = state
        nb_prev = nb
        for _ in range(chunk):
            nb_prev = nb
            eb = edge_update(nb, eb)
            nb_new = node_update(eb)
            nb = [(1.0 - damping) * nb_new[a] + damping * nb[a]
                  for a in range(NROT)]
        dev = jnp.abs(nb[0] - nb_prev[0])
        for a in range(1, NROT):
            dev = jnp.maximum(dev, jnp.abs(nb[a] - nb_prev[a]))
        return (it + chunk, jnp.max(dev), nb, eb)

    state = (jnp.asarray(0, jnp.int32), f32(np.inf), list(nb), list(eb))
    it, dev, nb, eb = jax.lax.while_loop(cond, body, state)
    tot = nb[0]
    for a in range(1, NROT):
        tot = tot + nb[a]
    rtot = 1.0 / jnp.maximum(tot, EPS)
    bC = [nb[a] * rtot for a in range(NROT)]
    return nb, eb, bC, it, dev


def _cold_start(probC, edge_update):
    """Reference cold start: one undamped sweep from the bare priors."""
    eb = edge_update(probC, [jnp.ones((LANE, LANE), jnp.float32)] * NROT)
    mx = probC[0]
    for a in range(1, NROT):
        mx = jnp.maximum(mx, probC[a])
    rmx = 1.0 / jnp.maximum(mx, EPS)
    nb = [probC[a] * rmx for a in range(NROT)]
    return nb, eb


def _bethe_node_term(validC, masked, offset, probC, bC, live_col):
    """Node free-energy column and its envelope gradient columns
    (rotamer.cpp:292-302, 956-985): dF/dE1 = b*q with the un-captured
    weight (1 - sum b q) routed to the argmin slot."""
    node_en = offset * live_col
    sum_bq = jnp.zeros((LANE, 1), jnp.float32)
    qC = []
    for a in range(NROT):
        q = probC[a] / (EPS + probC[a])
        qC.append(q)
        node_en = node_en + jnp.where(
            validC[a] > 0,
            bC[a] * jnp.log((EPS + bC[a]) / (EPS + probC[a])), 0.0)
        sum_bq = sum_bq + jnp.where(validC[a] > 0, bC[a] * q, 0.0)

    taken = jnp.zeros((LANE, 1), jnp.float32)
    g1_cols = []
    for a in range(NROT):
        is_min = jnp.where((validC[a] > 0) & (masked[a] <= offset)
                           & (taken == 0), 1.0, 0.0)
        taken = taken + is_min
        g1_cols.append(jnp.where(validC[a] > 0,
                                 bC[a] * qC[a] + (1.0 - sum_bq) * is_min,
                                 0.0) * live_col)
    return node_en, g1_cols


def _bp_kernel(R, damping, max_iter, tol, chunk, warm, *refs):
    if warm:
        (e1_ref, p_ref, adj_ref, valid_ref, nb0_ref, eb0_ref,
         f_ref, g1_ref, g2_ref, nb_ref, eb_ref) = refs
    else:
        (e1_ref, p_ref, adj_ref, valid_ref,
         f_ref, g1_ref, g2_ref, nb_ref, eb_ref) = refs

    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    live_row = (rows < R).astype(f32)
    triu = (rows < cols).astype(f32)

    adjP = adj_ref[0] * live_row * (cols < R).astype(f32)

    def P(a, b):
        # edge Boltzmann factors, validity pre-masked in XLA
        return p_ref[0, a * NROT + b]

    validC, validB, masked, offset, probC = _node_prep(e1_ref[0],
                                                       valid_ref[0])
    edge_update, node_update = _make_updates(P, adjP, validB, probC)

    # initial beliefs: warm messages or the reference cold-start sweep
    if warm:
        nb = [nb0_ref[0][:, a:a + 1] for a in range(NROT)]
        eb = [eb0_ref[0, a] for a in range(NROT)]
    else:
        nb, eb = _cold_start(probC, edge_update)

    nb, eb, bC, n_it, dev = _solve_loop(damping, max_iter, tol, chunk,
                                        edge_update, node_update, nb, eb)

    # padding columns 6/7 carry solve diagnostics: the final per-sweep
    # deviation and the iteration count (the reference's n_bad_solve
    # signal, rotamer.cpp:657-659)
    nb_ref[0] = jnp.concatenate(
        nb + [jnp.full((LANE, 1), dev, f32),
              jnp.full((LANE, 1), n_it.astype(f32))], axis=1)
    for a in range(NROT):
        eb_ref[0, a] = eb[a]

    # ---- Bethe free energy + envelope gradients -------------------------
    live_col = live_row[:, 0:1]
    node_en, g1_cols = _bethe_node_term(validC, masked, offset, probC, bC,
                                        live_col)
    g1_ref[0] = jnp.concatenate(g1_cols + [jnp.zeros((LANE, 2), f32)],
                                axis=1)

    # edge term (rotamer.cpp:431-451): for i<j real edges,
    #   sum_ab m log((EPS+m)/(EPS+P b b)),  m = normalize(P bc1 bc2).
    # Two passes over the 36 (a,b) planes so m_raw is never held whole.
    bc1 = [jnp.broadcast_to(bC[a], (LANE, LANE)) / (EPS + eb[a])
           for a in range(NROT)]
    bB1 = [jnp.broadcast_to(bC[a], (LANE, LANE)) for a in range(NROT)]

    mnorm = jnp.zeros((LANE, LANE), f32)
    for a in range(NROT):
        for b in range(NROT):
            mnorm = mnorm + P(a, b) * bc1[a] * bc1[b].T
    rmnorm = 1.0 / jnp.maximum(mnorm, EPS)

    tadj = triu * adjP
    edge_en = jnp.zeros((LANE, LANE), f32)
    for a in range(NROT):
        for b in range(NROT):
            pv = validB[a] * validB[b].T
            mm = P(a, b) * bc1[a] * bc1[b].T * rmnorm
            pbb = P(a, b) * bB1[a] * bB1[b].T
            edge_en = edge_en + pv * mm * jnp.log((EPS + mm) / (EPS + pbb))
            g2_ref[0, a * NROT + b] = tadj * pv * mm * pbb / (EPS + pbb)

    f_ref[:, :] = (jnp.sum(node_en) + jnp.sum(tadj * edge_en)).reshape(1, 1)


def _bp_impl(R, damping, max_iter, tol, chunk, interpret,
             E1, E2planes, adj, valid, init):
    """Pad to (128, 128) planes and invoke the kernel.  All array args may
    carry a leading replica axis; this impl is written unbatched and the
    default Pallas vmap rule (prepended batch grid dim) handles replicas —
    every operand is per-replica data, so nothing is redundantly
    broadcast."""
    f32 = jnp.float32
    validf = jnp.asarray(valid, f32)
    # Boltzmann factors with validity folded in (XLA fuses this into one
    # elementwise pass; keeping it out of the kernel saves two VMEM-plane
    # copies of the problem)
    vmask = (validf[:, :, None, None] * validf[None, None, :, :])
    vplanes = jnp.transpose(vmask, (1, 3, 0, 2)).reshape(
        NROT * NROT, R, R)
    Pp = jnp.exp(-E2planes.astype(f32)) * vplanes
    e1p = jnp.pad(E1.astype(f32), ((0, LANE - R), (0, 8 - NROT + 2)))[None]
    ppp = jnp.pad(Pp, ((0, 0), (0, LANE - R), (0, LANE - R)))[None]
    adjp = jnp.pad(adj.astype(f32), ((0, LANE - R), (0, LANE - R)))[None]
    valp = jnp.pad(validf, ((0, LANE - R), (0, 8 - NROT + 2)))[None]
    operands = [e1p, ppp, adjp, valp]
    warm = init is not None
    if warm:
        nb0, eb0 = init
        operands.append(jnp.pad(nb0.astype(f32),
                                ((0, LANE - nb0.shape[0]),
                                 (0, 8 - nb0.shape[1])))[None])
        operands.append(eb0.astype(f32)[None])

    spec2 = pl.BlockSpec(memory_space=pltpu.VMEM)
    F, G1, G2, nb, eb = pl.pallas_call(
        functools.partial(_bp_kernel, R, damping, max_iter, tol, chunk,
                          warm),
        in_specs=[spec2] * len(operands),
        out_specs=[spec2] * 5,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, LANE, 8), f32),
            jax.ShapeDtypeStruct((1, NROT * NROT, LANE, LANE), f32),
            jax.ShapeDtypeStruct((1, LANE, 8), f32),
            jax.ShapeDtypeStruct((1, NROT, LANE, LANE), f32),
        ),
        interpret=interpret,
    )(*operands)
    # nb keeps its two diagnostics columns (final deviation, iterations)
    return (F[0, 0], G1[0, :R, :NROT], G2[0, :, :R, :R], nb[0], eb[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def bp_bethe_pallas(static, interpret, E1, E2planes, adj, valid, init):
    """Bethe free energy of the padded rotamer model, solved in-VMEM.

    static: (R, damping, max_iter, tol, chunk) — compile-time constants.
    E1: (R, 6) one-body energies; E2planes: (36, R, R) pair energies in
    (a*6+b)-plane layout; adj: (R, R) bool edges; valid: (R, 6) bool;
    init: None for the reference cold-start schedule, or (nb0 (128, 6..8),
    eb0 (6, 128, 128)) padded warm-start messages.

    Returns (F, nb_padded, eb_padded): the free energy plus converged
    messages for warm-starting the next evaluation; nb's padding columns
    6/7 carry (final solve deviation, iteration count) — the reference's
    n_bad_solve observability signal (rotamer.cpp:657-659).  Gradients flow to E1
    and E2planes only, via the envelope theorem (reference
    rotamer.cpp:956-985) — the solve is never differentiated through.
    """
    F, G1, G2, nb, eb = _bp_impl(*static, interpret, E1, E2planes, adj,
                                 valid, init)
    return F, nb, eb


def _bp_fwd(static, interpret, E1, E2planes, adj, valid, init):
    F, G1, G2, nb, eb = _bp_impl(*static, interpret, E1, E2planes, adj,
                                 valid, init)
    return (F, nb, eb), (G1, G2, jnp.zeros((0,), E1.dtype),
                         jnp.zeros((0,), E2planes.dtype))


def _bp_bwd(static, interpret, res, cot):
    G1, G2, z1, z2 = res
    gF = cot[0]
    return (gF * G1.astype(z1.dtype), gF * G2.astype(z2.dtype),
            None, None, None)


bp_bethe_pallas.defvjp(_bp_fwd, _bp_bwd)


# ===========================================================================
# Mega-kernel: bead-space pair energies -> Bethe free energy + gradients
# ===========================================================================
#
# The kernel above still leaves the residue-pair 6x6 block assembly (two
# one-hot matmuls, a symmetrization, and layout transposes with tiny
# trailing dims) and a 36-plane gradient tensor round trip to XLA; measured
# on v5e that glue costs ~2x the solve itself.  This kernel consumes the
# raw (n_bead, n_bead) pair-energy grid directly:
#
#   * the rot-slot scatter E2[ab][ri,rj] = sum_{i in (ri,a), j in (rj,b)}
#     (E + E^T)[i,j] runs as in-VMEM MXU matmuls against the static bead
#     one-hots S6 (exact in bf16),
#   * no adjacency input: every live residue pair is an edge.  Pairs with
#     no in-cutoff bead contact get identity potentials, which provably do
#     not move the BP fixed point, contribute exactly zero Bethe edge
#     energy, and whose (nonzero) pair-marginal gradients are annihilated
#     downstream by the pair kernel's distance-cutoff mask,
#   * the free-energy gradient is returned in bead space:
#     dF/dE = X + X^T with X = sum_ab S6_a^T G2[ab] S6_b -- again in-VMEM
#     matmuls, so the 36-plane gradient never touches HBM.
#
# HBM per replica per evaluation: E_pair in, dF/dE_pair out.

def _bp_pairs_kernel(R, NBP, damping, max_iter, tol, chunk, warm, bf16,
                     *refs):
    if warm:
        (e1_ref, ep_ref, s6d2_ref, s6t2_ref, s6td2_ref, s6s2_ref,
         valid_ref, nb0_ref, eb0_ref,
         f_ref, g1_ref, de_ref, nb_ref, eb_ref) = refs
    else:
        (e1_ref, ep_ref, s6d2_ref, s6t2_ref, s6td2_ref, s6s2_ref,
         valid_ref, f_ref, g1_ref, de_ref, nb_ref, eb_ref) = refs

    f32 = jnp.float32

    # Exact-in-bf16 one-hot contractions (see _make_onehot_dots).
    onehot_dot_l, onehot_dot_r = _make_onehot_dots(bf16)

    rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    live_row = (rows < R).astype(f32)
    live = live_row * (cols < R).astype(f32)
    triu = (rows < cols).astype(f32)
    adjP = live * (rows != cols).astype(f32)

    validC, validB, masked, offset, probC = _node_prep(e1_ref[0],
                                                       valid_ref[:, :])

    # ---- rot-slot scatter: E2 planes from bead pair energies ------------
    # u = S6 @ (E + E^T) @ S6^T in TWO wide exact dots (was 7 + 7 hi/lo)
    E = ep_ref[0]
    Es = E + E.T
    h = onehot_dot_l(s6d2_ref[:, :], Es)            # (6L, NBP) f32
    u_all = onehot_dot_r(h, s6t2_ref[:, :])         # (6L, 6L) f32

    planes = []
    for a in range(NROT):
        row = []
        for b in range(NROT):
            u = u_all[a * LANE:(a + 1) * LANE, b * LANE:(b + 1) * LANE]
            vm = validB[a] * validB[b].T
            row.append(jnp.exp(-u) * vm)
        planes.append(row)

    def P(a, b):
        return planes[a][b]

    edge_update, node_update = _make_updates(P, adjP, validB, probC)
    if warm:
        nb = [nb0_ref[0][:, a:a + 1] for a in range(NROT)]
        eb = [eb0_ref[0, a] for a in range(NROT)]
    else:
        nb, eb = _cold_start(probC, edge_update)

    nb, eb, bC, n_it, dev = _solve_loop(damping, max_iter, tol, chunk,
                                        edge_update, node_update, nb, eb)

    # padding columns 6/7 carry solve diagnostics (see _bp_kernel)
    nb_ref[0] = jnp.concatenate(
        nb + [jnp.full((LANE, 1), dev, f32),
              jnp.full((LANE, 1), n_it.astype(f32))], axis=1)
    for a in range(NROT):
        eb_ref[0, a] = eb[a]

    # ---- Bethe free energy + envelope gradients -------------------------
    live_col = live_row[:, 0:1]
    node_en, g1_cols = _bethe_node_term(validC, masked, offset, probC, bC,
                                        live_col)
    g1_ref[0] = jnp.concatenate(g1_cols + [jnp.zeros((LANE, 2), f32)],
                                axis=1)

    # edge term over all live i<j pairs (identity edges contribute 0); the
    # pair-marginal gradients contract straight back to bead space:
    #   X = sum_ab S6_a^T G[ab] S6_b,  dF/dE = X + X^T.
    bc1 = [jnp.broadcast_to(bC[a], (LANE, LANE)) / (EPS + eb[a])
           for a in range(NROT)]
    bB1 = [jnp.broadcast_to(bC[a], (LANE, LANE)) for a in range(NROT)]

    mnorm = jnp.zeros((LANE, LANE), f32)
    for a in range(NROT):
        for b in range(NROT):
            mnorm = mnorm + P(a, b) * bc1[a] * bc1[b].T
    rmnorm = 1.0 / jnp.maximum(mnorm, EPS)

    # the edge entropy log factorizes over the message planes:
    #   log(mm/pbb) = -log(EPS+eb_a) - log(EPS+eb_b)^T - log(mnorm)
    # (exactly zero for identity edges) — 13 transcendental planes
    # instead of 36
    logmn = jnp.log(jnp.maximum(mnorm, EPS))
    logeb = [jnp.log(EPS + eb[a]) for a in range(NROT)]

    tadj = triu * adjP
    edge_en = jnp.zeros((LANE, LANE), f32)
    Gcols = []
    for b in range(NROT):
        logebT = logeb[b].T
        Gs = []
        for a in range(NROT):
            pv = validB[a] * validB[b].T
            mm = P(a, b) * bc1[a] * bc1[b].T * rmnorm
            pbb = P(a, b) * bB1[a] * bB1[b].T
            edge_en = edge_en - pv * mm * (logeb[a] + logebT + logmn)
            Gs.append(tadj * pv * mm * pbb / (EPS + pbb))
        Gcols.append(jnp.concatenate(Gs, axis=0))
    # X = S6^T @ G_all @ S6 in TWO wide exact dots (was 7 + 7 hi/lo)
    G_all = jnp.concatenate(Gcols, axis=1)          # (6L, 6L) f32
    T1 = onehot_dot_l(s6td2_ref[:, :], G_all)       # (NBP, 6L) f32
    X = onehot_dot_r(T1, s6s2_ref[:, :])            # (NBP, NBP) f32

    de_ref[0] = X + X.T
    f_ref[0] = (jnp.sum(node_en) + jnp.sum(tadj * edge_en)).reshape(1, 1)


# --- stacked-plane layout helpers (kernel-internal) ------------------------
#
# The stacked mega-kernel keeps the 36 (a,b) rotamer planes as ONE
# (768, 768) array (row block a, column block b -- exactly u_all's layout)
# and the 6 per-slot message/belief planes as (768, 128) / (768, 1) stacks.
# Block algebra is expressed with 128-aligned slices, concatenations and
# whole-array ops only, all of which lower cleanly in Mosaic.

def _blocks_r(X):
    n = X.shape[0] // LANE
    return [X[k * LANE:(k + 1) * LANE] for k in range(n)]


def _blocks_c(X):
    n = X.shape[1] // LANE
    return [X[:, k * LANE:(k + 1) * LANE] for k in range(n)]


def _reduce(blocks, op):
    acc = blocks[0]
    for b in blocks[1:]:
        acc = op(acc, b)
    return acc


def _tile_r(x, n=NROT):
    return jnp.concatenate([x] * n, axis=0)


def _tile_c(x, n=NROT):
    return jnp.concatenate([x] * n, axis=1)


def _t_tall(X):
    """(k*128, 128) -> (128, k*128) via per-block (128, 128) transposes."""
    return jnp.concatenate([b.T for b in _blocks_r(X)], axis=1)


def _stack_cols(ref2d, n=NROT):
    """(128, >=n) -> (n*128, 1): row a*128+i = ref2d[i, a].

    Each block is extracted as a one-hot masked row reduction rather than
    a ``ref2d[:, a:a+1]`` lane slice: Mosaic refuses to concatenate
    vectors whose lane offsets differ on a non-concat dimension
    ("result/input offset mismatch", measured on-device 2026-08-18), and
    the reduction lands every block at lane offset 0.  Runs once per
    solve at prep time, so the extra n multiplies are noise."""
    cols = jax.lax.broadcasted_iota(jnp.int32, ref2d.shape, 1)
    return jnp.concatenate(
        [jnp.sum(jnp.where(cols == a, ref2d, 0.0), axis=1, keepdims=True)
         for a in range(n)], axis=0)


def _stacked_node_prep(e1_2d, valid_2d):
    """(valid_s, masked_s, offset, probC_s) column stacks from the (128,
    >=6) one-body energy/validity planes (shared by the stacked and
    lockstep solvers)."""
    f32 = jnp.float32
    valid_s = _stack_cols(valid_2d)                   # (SL, 1)
    e1_s = _stack_cols(e1_2d)
    masked_s = jnp.where(valid_s > 0, e1_s, f32(1e30))
    offset = _reduce(_blocks_r(masked_s), jnp.minimum)    # (128, 1)
    probC_s = jnp.where(valid_s > 0, jnp.exp(_tile_r(offset) - e1_s), 0.0)
    return valid_s, masked_s, offset, probC_s


def _stacked_solve_bethe(R, damping, max_iter, tol, chunk, bcast, t_tall,
                         P_stack, e1_2d, valid_2d, init, real=None):
    """One replica's stacked-plane BP solve + Bethe assembly, from the
    exp(-E2) plane stack to the gradient stack (the shared body of the
    stacked and replica-blocked kernels; semantics identical to
    _bp_pairs_kernel).

    init: None for the reference cold-start schedule, or (nb0 (128, >=6),
    EB0 (SL, 128)) warm-start beliefs.

    real: optional (128, 128) mask of residue pairs whose potential plane
    is NOT the identity (any u != 0).  When given ("prodlog" mode),
    messages off the real set are pinned to exactly 1.0 — provably the
    same fixed point: an identity-plane message is uniform over the
    receiver's valid slots after one sweep (m(a) = 1/n_valid(i) for all
    valid a), so it contributes an a-independent factor to every node
    belief that the max-centering cancels; its Bethe edge energy is
    exactly 0 either way, and the per-(i,j) gradient mm = X*rmn is scale
    -invariant in eb.  With all non-real messages exactly 1, the per-node
    log-message sum collapses to a lane PRODUCT over the ~dozen real
    messages — removing the (SL, 128) per-element log from every sweep
    (the sweep's largest transcendental block).

    Returns (nb_cat (128, 8) incl. diagnostics cols, EB (SL, 128),
    g1_cat (128, 8), G_all (SL, SL) gradient planes, F () free energy)."""
    f32 = jnp.float32
    SL = NROT * LANE

    rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    live_row = (rows < R).astype(f32)
    live = live_row * (cols < R).astype(f32)
    triu = (rows < cols).astype(f32)
    adjP = live * (rows != cols).astype(f32)
    prodlog = real is not None
    # message-pinning adjacency: all live pairs, or just the real ones
    padj_t = _tile_r(adjP * (real > 0) if prodlog else adjP)  # (SL, 128)
    adjP_t = _tile_r(adjP)

    # ---- stacked node prep ----------------------------------------------
    valid_s, masked_s, offset, probC_s = _stacked_node_prep(e1_2d,
                                                            valid_2d)

    def rowblock_mul(A, B):
        """A (SL, n) * tile_r(B (128, n)) without materializing the tile."""
        if bcast:
            return (A.reshape(NROT, LANE, A.shape[1])
                    * B[None]).reshape(SL, A.shape[1])
        return A * _tile_r(B)

    def edge_update(nb_s, EB):
        # VT[b][i, j] = nb[b][j] / eb[b][j, i] lives at W[i, b*128+j]
        U = nb_s / (EPS + EB)                         # (SL, 128)
        W = t_tall(U)                                 # (128, SL)
        PROD = rowblock_mul(P_stack, W)               # (SL, SL)
        m = _reduce(_blocks_c(PROD), jnp.add) * valid_s   # (SL, 128)
        norm = _reduce(_blocks_r(m), jnp.add)         # (128, 128)
        rn = 1.0 / jnp.maximum(norm, EPS)
        return jnp.where(padj_t > 0, rowblock_mul(m, rn), 1.0)

    if prodlog:
        def node_update(EB):
            # Lane-product form of the max-centered log-message sum: with
            # non-real messages pinned to exactly 1 only the ~dozen real
            # messages per row deviate from 1, so prod(EB^(1/4), lanes)
            # stays inside f32 range for any realistic contact pattern
            # (worst case ~20 clash messages at e^-30: exponent -65).  A
            # residue whose valid slots ALL underflow anyway (a fully
            # jammed geometry) falls back to its prior for this sweep and
            # lets the next sweep recover — the log-domain path survives
            # such rows via centering, so the fallback preserves solve
            # robustness rather than NaN-ing.
            q = jnp.sqrt(jnp.sqrt(jnp.maximum(EB, 1e-30)))
            # halving-tree lane product (Mosaic has no reduce_prod
            # lowering): 7 static-slice multiplies 128 -> 1
            p = q
            while p.shape[1] > 1:
                h = p.shape[1] // 2
                p = p[:, :h] * p[:, h:]               # (SL, h)
            lp = 4.0 * jnp.log(jnp.maximum(p, 1e-38))
            smax = _reduce(_blocks_r(
                jnp.where(valid_s > 0, lp, f32(-3e38))), jnp.maximum)
            nbC = probC_s * jnp.exp(lp - _tile_r(smax))
            pmax = _reduce(_blocks_r(jnp.where(valid_s > 0, p, 0.0)),
                           jnp.maximum)
            nbC = jnp.where(_tile_r(pmax) > 0, nbC, probC_s)
            mx = _reduce(_blocks_r(nbC), jnp.maximum)
            return nbC * _tile_r(1.0 / jnp.maximum(mx, EPS))
    else:
        def node_update(EB):
            # max-centered log-message sums (see _make_updates for why)
            LG = jnp.log(jnp.maximum(EB, 1e-30)) * adjP_t
            sC = jnp.sum(LG, axis=1, keepdims=True)   # (SL, 1)
            smax = _reduce(_blocks_r(sC), jnp.maximum)
            nbC = probC_s * jnp.exp(sC - _tile_r(smax))
            mx = _reduce(_blocks_r(nbC), jnp.maximum)
            return nbC * _tile_r(1.0 / jnp.maximum(mx, EPS))

    if init is not None:
        nb0_2d, EB = init
        nb_s = _stack_cols(nb0_2d)
    else:
        EB = edge_update(probC_s, jnp.ones((SL, LANE), f32))
        mx0 = _reduce(_blocks_r(probC_s), jnp.maximum)
        nb_s = probC_s * _tile_r(1.0 / jnp.maximum(mx0, EPS))

    def cond(state):
        it, dev = state[0], state[1]
        return jnp.logical_and(it < max_iter, dev > tol)

    def body(state):
        it, _, nb_s, EB = state
        nb_prev = nb_s
        for _ in range(chunk):
            nb_prev = nb_s
            EB = edge_update(nb_s, EB)
            nb_new = node_update(EB)
            nb_s = (1.0 - damping) * nb_new + damping * nb_s
        return (it + chunk, jnp.max(jnp.abs(nb_s - nb_prev)), nb_s, EB)

    state = (jnp.asarray(0, jnp.int32), f32(np.inf), nb_s, EB)
    n_it, dev, nb_s, EB = jax.lax.while_loop(cond, body, state)

    return _stacked_bethe_assembly(R, t_tall, P_stack, valid_s, masked_s,
                                   offset, probC_s, nb_s, EB, dev,
                                   n_it.astype(f32))


def _stacked_bethe_assembly(R, t_tall, P_stack, valid_s, masked_s, offset,
                            probC_s, nb_s, EB, dev, n_it):
    """Bethe free energy + envelope gradients from a converged stacked
    solve (the tail of _stacked_solve_bethe, shared with the lockstep
    replica-blocked solver)."""
    f32 = jnp.float32
    SL = NROT * LANE
    rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    live_row = (rows < R).astype(f32)
    live = live_row * (cols < R).astype(f32)
    triu = (rows < cols).astype(f32)
    adjP = live * (rows != cols).astype(f32)

    tot = _reduce(_blocks_r(nb_s), jnp.add)
    bC_s = nb_s * _tile_r(1.0 / jnp.maximum(tot, EPS))

    # padding columns 6/7 carry solve diagnostics (see _bp_kernel)
    nb_cat = jnp.concatenate(
        _blocks_r(nb_s) + [jnp.full((LANE, 1), dev, f32),
                           jnp.full((LANE, 1), n_it.astype(f32))], axis=1)

    # ---- Bethe node term + envelope g1 (rotamer.cpp:292-302, 956-985) ----
    live_col = live_row[:, 0:1]
    q_s = probC_s / (EPS + probC_s)
    node_en = offset * live_col + _reduce(_blocks_r(
        jnp.where(valid_s > 0,
                  bC_s * jnp.log((EPS + bC_s) / (EPS + probC_s)), 0.0)),
        jnp.add)
    sum_bq = _reduce(_blocks_r(jnp.where(valid_s > 0, bC_s * q_s, 0.0)),
                     jnp.add)

    validb = _blocks_r(valid_s)
    maskedb = _blocks_r(masked_s)
    bCb = _blocks_r(bC_s)
    qb = _blocks_r(q_s)
    taken = jnp.zeros((LANE, 1), f32)
    g1_cols = []
    for a in range(NROT):
        is_min = jnp.where((validb[a] > 0) & (maskedb[a] <= offset)
                           & (taken == 0), 1.0, 0.0)
        taken = taken + is_min
        g1_cols.append(jnp.where(validb[a] > 0,
                                 bCb[a] * qb[a] + (1.0 - sum_bq) * is_min,
                                 0.0) * live_col)
    g1_cat = jnp.concatenate(g1_cols + [jnp.zeros((LANE, 2), f32)], axis=1)

    # ---- Bethe edge term (rotamer.cpp:431-451) ---------------------------
    # mm = X * rmn with X[a*128+i, b*128+j] = P * bc1[a][i,j] * bc1[b][j,i];
    # the entropy log factorizes (-logeb_a - logeb_b^T - logmn), and each
    # factor's (a,b)-sum is a segmented block reduction of X against a
    # stacked log plane -- no 36-plane loop.
    BC1 = bC_s / (EPS + EB)                           # (SL, 128)
    BC1T = t_tall(BC1)                                # (128, SL)
    X = P_stack * _tile_c(BC1) * _tile_r(BC1T)        # (SL, SL)
    Xb = _reduce(_blocks_c(X), jnp.add)               # (SL, 128)
    mnorm = _reduce(_blocks_r(Xb), jnp.add)           # (128, 128)
    rmn = 1.0 / jnp.maximum(mnorm, EPS)
    logmn = jnp.log(jnp.maximum(mnorm, EPS))
    LEB = jnp.log(EPS + EB)                           # (SL, 128)
    term1 = _reduce(_blocks_r(Xb * LEB), jnp.add)
    Xa = _reduce(_blocks_r(X), jnp.add)               # (128, SL)
    term2 = _reduce(_blocks_c(Xa * t_tall(LEB)), jnp.add)
    edge_en = -(term1 + term2 + mnorm * logmn) * rmn

    # gradient planes in G_all layout (bead-space contraction done by the
    # caller so the replica-blocked kernel can batch it across replicas)
    tadj = triu * adjP
    C_c = _tile_c(tadj * rmn)                         # (128, SL)
    bC_rowT = t_tall(jnp.broadcast_to(bC_s, (SL, LANE)))  # (128, SL)
    Pb = _blocks_r(P_stack)
    Xrb = _blocks_r(X)
    Gb = []
    for a in range(NROT):
        pbb = Pb[a] * bCb[a] * bC_rowT
        Gb.append(Xrb[a] * (pbb / (EPS + pbb)) * C_c)
    G_all = jnp.concatenate(Gb, axis=0)               # (SL, SL)
    F = jnp.sum(node_en) + jnp.sum(tadj * edge_en)
    return nb_cat, EB, g1_cat, G_all, F


def _real_pair_mask(u_stack):
    """(128, 128) mask of residue pairs with a non-identity potential
    plane (any u != 0 across the 36 (a, b) blocks) — the prodlog pinning
    set; see _stacked_solve_bethe."""
    nz = (u_stack != 0.0).astype(jnp.float32)         # (SL, SL)
    r6 = _reduce(_blocks_c(nz), jnp.add)              # (SL, 128)
    return _reduce(_blocks_r(r6), jnp.add)            # (128, 128)


def _lockstep_solve(R, RB, damping, max_iter, tol, chunk, P4, probC4,
                    valid4, init4):
    """Replica-LOCKSTEP damped BP solve: one while_loop advances all RB
    replicas' sweeps together on 4D (RB, NROT, LANE, n) stacks, so every
    per-sweep VPU op is RB× wider (the per-replica solve is
    latency/issue-bound at (SL, 128) shapes — measured 0.085 ms/sweep for
    64 replicas, bench_logs/r4f).  Replicas are uncoupled, so each
    replica's message trajectory is IDENTICAL to its single-replica solve;
    the loop runs to the max sweep count of the block, and a replica that
    has converged keeps sweeping (extra damped sweeps only converge it
    further — same fixed point).  Per-replica diagnostics record the
    deviation and iteration count at FIRST convergence, which match the
    single-replica exit values exactly.

    P4 (RB, NROT, LANE, SL) plane stacks; probC4/valid4 (RB|1, NROT,
    LANE, 1); init4 None or (nb4, EB4).  Returns (nb4, EB4, dev4, it4)
    with dev4/it4 (RB, 1, 1, 1)."""
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    adjP = ((rows < R) & (cols < R) & (rows != cols)).astype(f32)
    adj4 = adjP[None, None]                           # (1, 1, 128, 128)

    def edge_update(nb4, EB4):
        U4 = nb4 / (EPS + EB4)                        # (RB, 6, 128, 128)
        W4 = jnp.concatenate(
            [jnp.swapaxes(U4[:, a], 1, 2) for a in range(NROT)],
            axis=2)[:, None]                          # (RB, 1, 128, SL)
        PROD = P4 * W4                                # (RB, 6, 128, SL)
        m4 = PROD[..., :LANE]
        for b in range(1, NROT):
            m4 = m4 + PROD[..., b * LANE:(b + 1) * LANE]
        m4 = m4 * valid4                              # (RB, 6, 128, 128)
        norm = jnp.sum(m4, axis=1, keepdims=True)     # (RB, 1, 128, 128)
        rn = 1.0 / jnp.maximum(norm, EPS)
        return jnp.where(adj4 > 0, m4 * rn, 1.0)

    def node_update(EB4):
        # max-centered log-message sums, exactly the plain (non-prodlog)
        # stacked path: padded rows have all-zero LG (adj4 masks them), so
        # the unmasked max keeps exp() bounded there
        LG = jnp.log(jnp.maximum(EB4, 1e-30)) * adj4
        sC = jnp.sum(LG, axis=3, keepdims=True)       # (RB, 6, 128, 1)
        smax = jnp.max(sC, axis=1, keepdims=True)
        nbC = probC4 * jnp.exp(sC - smax)
        mx = jnp.max(nbC, axis=1, keepdims=True)
        return nbC * (1.0 / jnp.maximum(mx, EPS))

    if init4 is not None:
        nb4, EB4 = init4
    else:
        EB4 = edge_update(probC4, jnp.ones((RB, NROT, LANE, LANE), f32))
        mx0 = jnp.max(probC4, axis=1, keepdims=True)
        nb4 = probC4 * (1.0 / jnp.maximum(mx0, EPS))

    def per_replica_max(d4):
        m = jnp.max(d4, axis=3, keepdims=True)
        m = jnp.max(m, axis=1, keepdims=True)
        return jnp.max(m, axis=2, keepdims=True)      # (RB, 1, 1, 1)

    def cond(state):
        it, dev4 = state[0], state[1]
        return jnp.logical_and(it < max_iter, jnp.max(dev4) > tol)

    def body(state):
        it, _, done_it, done_dev, nb4, EB4 = state
        nb_prev = nb4
        for _ in range(chunk):
            nb_prev = nb4
            EB4 = edge_update(nb4, EB4)
            nb_new = node_update(EB4)
            nb4 = (1.0 - damping) * nb_new + damping * nb4
        dev4 = per_replica_max(jnp.abs(nb4 - nb_prev))
        it = it + chunk
        first = (dev4 <= tol) & (done_it < 0)
        done_it = jnp.where(first, f32(1.0) * it, done_it)
        done_dev = jnp.where(first, dev4, done_dev)
        return (it, dev4, done_it, done_dev, nb4, EB4)

    shape1 = (RB, 1, 1, 1)
    state = (jnp.asarray(0, jnp.int32), jnp.full(shape1, np.inf, f32),
             jnp.full(shape1, -1.0, f32), jnp.full(shape1, np.inf, f32),
             nb4, EB4)
    n_it, dev4, done_it, done_dev, nb4, EB4 = \
        jax.lax.while_loop(cond, body, state)
    # replicas that hit max_iter report their final state
    it4 = jnp.where(done_it < 0, f32(1.0) * n_it, done_it)
    dev4f = jnp.where(done_it < 0, dev4, done_dev)
    return nb4, EB4, dev4f, it4


def _bp_pairs_kernel_stacked(R, NBP, damping, max_iter, tol, chunk, warm,
                             bf16, stacked, prodlog, *refs):
    """Stacked-plane variant of _bp_pairs_kernel (identical semantics).

    The unstacked kernel issues ~100 separate (128, 128) VPU ops per BP
    sweep (36 plane multiplies + 30 adds + per-slot glue); Mosaic issue
    overhead, not element throughput, bounded it.  Here each sweep is a
    handful of wide ops over the (768, 768) plane stack: one division,
    one blockwise transpose, one tiled multiply, and two segmented block
    reductions.  The Bethe edge assembly collapses the 36-plane loops the
    same way, and the gradient stack G_all is built directly in the
    layout the bead-space scatter dot consumes."""
    if warm:
        (e1_ref, ep_ref, s6d2_ref, s6t2_ref, s6td2_ref, s6s2_ref,
         valid_ref, nb0_ref, eb0_ref,
         f_ref, g1_ref, de_ref, nb_ref, eb_ref) = refs
    else:
        (e1_ref, ep_ref, s6d2_ref, s6t2_ref, s6td2_ref, s6s2_ref,
         valid_ref, f_ref, g1_ref, de_ref, nb_ref, eb_ref) = refs

    f32 = jnp.float32
    onehot_dot_l, onehot_dot_r = _make_onehot_dots(bf16)

    # ---- rot-slot scatter (as in _bp_pairs_kernel) -----------------------
    E = ep_ref[0]
    Es = E + E.T
    h = onehot_dot_l(s6d2_ref[:, :], Es)              # (SL, NBP)
    u_all = onehot_dot_r(h, s6t2_ref[:, :])           # (SL, SL), symmetric
    # No validity masking needed: rot slots without beads scatter to u = 0
    # (so P = 1, never inf), and every read of P below is multiplied by a
    # belief/message factor that is exactly zero at invalid slots.
    P_stack = jnp.exp(-u_all)

    # bcast: express row-block tiling as a leading-dim reshape + broadcast
    # multiply instead of a materialized concat copy (UPSIDE_BP_STACKED=2,
    # the measured round-3 winner; =3 additionally uses one whole-array
    # transpose per sweep instead of 6 block transposes).
    bcast = stacked >= 2
    t_tall = (lambda X: X.T) if stacked >= 3 else _t_tall

    if warm:
        init = (nb0_ref[0],
                jnp.concatenate([eb0_ref[0, a] for a in range(NROT)],
                                axis=0))
    else:
        init = None
    nb_cat, EB, g1_cat, G_all, F = _stacked_solve_bethe(
        R, damping, max_iter, tol, chunk, bcast, t_tall,
        P_stack, e1_ref[0], valid_ref[:, :], init,
        real=_real_pair_mask(u_all) if prodlog else None)

    nb_ref[0] = nb_cat
    for a in range(NROT):
        eb_ref[0, a] = EB[a * LANE:(a + 1) * LANE]
    g1_ref[0] = g1_cat

    T1 = onehot_dot_l(s6td2_ref[:, :], G_all)         # (NBP, SL)
    X2 = onehot_dot_r(T1, s6s2_ref[:, :])             # (NBP, NBP)

    de_ref[0] = X2 + X2.T
    f_ref[0] = F.reshape(1, 1)


def _bp_pairs_kernel_rb(R, NBP, RB, damping, max_iter, tol, chunk, warm,
                        bf16, prodlog, lockstep, *refs):
    """Replica-blocked stacked kernel: RB replicas per grid step.

    The per-replica kernel's cost is dominated by the four exact scatter
    dots (hi/lo one-hot contractions, ~1.4G MACs per replica at NBP=384)
    issued one replica at a time; replica-blocking batches each of them
    into ONE wide MXU issue per block — the same amortization that bought
    -25% in the fused pair kernel.  The damped solves stay per-replica
    (each replica exits its while_loop at its own sweep count, preserving
    the reference convergence semantics), operating on slices of the
    batched U stack held in VMEM scratch:

      phase 1 (batched):  Es_cat (NBP, RB*NBP)  -> H (SL, RB*NBP)
                          H_rows (RB*SL, NBP)   -> U_rows (RB*SL, SL)
      phase 2 (per r):    P = exp(-U_rows[r])   -> solve + Bethe
                          G_cat[:, r*SL:(r+1)*SL] = G_all_r
      phase 3 (batched):  T1_wide (NBP, RB*SL)  -> T1_rows (RB*NBP, SL)
                          X_rows (RB*NBP, NBP)  -> dE[r] = X_r + X_r^T

    All layout shuffles are 128-aligned slice copies inside VMEM."""
    nscr = 8
    scratch = refs[-nscr:]
    refs = refs[:-nscr]
    (es_cat, h_scr, h_rows, u_rows, g_cat, t1_wide, t1_rows,
     x_rows) = scratch
    if warm:
        (e1_ref, ep_ref, s6d2_ref, s6t2_ref, s6td2_ref, s6s2_ref,
         valid_ref, nb0_ref, eb0_ref,
         f_ref, g1_ref, de_ref, nb_ref, eb_ref) = refs
    else:
        (e1_ref, ep_ref, s6d2_ref, s6t2_ref, s6td2_ref, s6s2_ref,
         valid_ref, f_ref, g1_ref, de_ref, nb_ref, eb_ref) = refs

    SL = NROT * LANE
    onehot_dot_l, onehot_dot_r = _make_onehot_dots(bf16)

    # ---- phase 1: batched rot-slot scatter -------------------------------
    for r in range(RB):
        E = ep_ref[r]
        es_cat[:, r * NBP:(r + 1) * NBP] = E + E.T
    h_scr[:, :] = onehot_dot_l(s6d2_ref[:, :], es_cat[:, :])
    for r in range(RB):
        h_rows[r * SL:(r + 1) * SL, :] = h_scr[:, r * NBP:(r + 1) * NBP]
    u_rows[:, :] = onehot_dot_r(h_rows[:, :], s6t2_ref[:, :])

    # ---- phase 2: per-replica solves + Bethe assembly --------------------
    if lockstep:
        # one while_loop advances all RB replicas' sweeps together
        # (prodlog is ignored on this path; see _lockstep_solve).  exp()
        # lands back in the u_rows scratch so only one (RB*SL, SL) plane
        # stack is live.
        u_rows[:, :] = jnp.exp(-u_rows[:, :])
        P4 = u_rows[:, :].reshape(RB, NROT, LANE, SL)
        preps = [_stacked_node_prep(e1_ref[r], valid_ref[:, :])
                 for r in range(RB)]
        probC4 = jnp.stack([p[3].reshape(NROT, LANE, 1) for p in preps])
        valid4 = preps[0][0].reshape(NROT, LANE, 1)[None]
        if warm:
            nb4 = jnp.stack([_stack_cols(nb0_ref[r]).reshape(NROT, LANE, 1)
                             for r in range(RB)])
            init4 = (nb4, eb0_ref[:, :, :, :])
        else:
            init4 = None
        nb4, EB4, dev4, it4 = _lockstep_solve(
            R, RB, damping, max_iter, tol, chunk, P4, probC4, valid4,
            init4)
        eb_ref[:, :, :, :] = EB4
        for r in range(RB):
            valid_s, masked_s, offset, probC_s = preps[r]
            nb_cat, _, g1_cat, G_all, F = _stacked_bethe_assembly(
                R, _t_tall, P4[r].reshape(SL, SL), valid_s, masked_s,
                offset, probC_s, nb4[r].reshape(SL, 1),
                EB4[r].reshape(SL, LANE), jnp.max(dev4[r]),
                jnp.max(it4[r]))
            nb_ref[r] = nb_cat
            g1_ref[r] = g1_cat
            f_ref[r] = F.reshape(1, 1)
            g_cat[:, r * SL:(r + 1) * SL] = G_all
    else:
        for r in range(RB):
            P_stack = jnp.exp(-u_rows[r * SL:(r + 1) * SL, :])
            if warm:
                init = (nb0_ref[r],
                        jnp.concatenate([eb0_ref[r, a]
                                         for a in range(NROT)], axis=0))
            else:
                init = None
            nb_cat, EB, g1_cat, G_all, F = _stacked_solve_bethe(
                R, damping, max_iter, tol, chunk, True, _t_tall,
                P_stack, e1_ref[r], valid_ref[:, :], init,
                real=_real_pair_mask(u_rows[r * SL:(r + 1) * SL, :])
                if prodlog else None)
            nb_ref[r] = nb_cat
            for a in range(NROT):
                eb_ref[r, a] = EB[a * LANE:(a + 1) * LANE]
            g1_ref[r] = g1_cat
            f_ref[r] = F.reshape(1, 1)
            g_cat[:, r * SL:(r + 1) * SL] = G_all

    # ---- phase 3: batched bead-space gradient contraction ----------------
    t1_wide[:, :] = onehot_dot_l(s6td2_ref[:, :], g_cat[:, :])
    for r in range(RB):
        t1_rows[r * NBP:(r + 1) * NBP, :] = \
            t1_wide[:, r * SL:(r + 1) * SL]
    x_rows[:, :] = onehot_dot_r(t1_rows[:, :], s6s2_ref[:, :])
    for r in range(RB):
        X2 = x_rows[r * NBP:(r + 1) * NBP, :]
        de_ref[r] = X2 + X2.T


def _scatter_onehots(res, rot, nbp, dtype=np.float32):
    """Static bead -> (rot-slot, residue) scatter matrix S6: row a*128+ri is
    hot at bead columns with (rot, residue) == (a, ri).  Exact in bf16."""
    res = np.asarray(res)
    rot = np.asarray(rot)
    S = np.zeros((NROT * LANE, nbp), dtype)
    S[rot * LANE + res, np.arange(len(res))] = 1.0
    return S


def _bp_pairs_impl(R, damping, max_iter, tol, chunk, interpret, bf16,
                   stacked, rb, prodlog, lockstep, E1, E_pair, S6, S6T,
                   valid, init):
    """Pad and invoke the mega-kernel over a leading replica axis.
    E1 (b, R, 6), E_pair (b, nb, nb); S6/S6T/valid shared.  rb > 1 runs
    the replica-blocked kernel with rb replicas per grid step (clamped to
    the largest divisor of the replica count); lockstep additionally
    advances the block's BP sweeps in one 4D while_loop
    (_lockstep_solve)."""
    f32 = jnp.float32
    n_rep, nb_count = E_pair.shape[0], E_pair.shape[1]
    NBP = S6.shape[1]
    RB = max(r for r in range(1, min(rb, n_rep) + 1) if n_rep % r == 0)
    e1p = jnp.pad(E1.astype(f32),
                  ((0, 0), (0, LANE - R), (0, 8 - NROT)))
    epp = jnp.pad(E_pair.astype(f32),
                  ((0, 0), (0, NBP - nb_count), (0, NBP - nb_count)))
    valp = jnp.pad(jnp.asarray(valid, f32), ((0, LANE - R), (0, 8 - NROT)))
    # the scatter one-hots are exact in bf16; each is shipped duplicated
    # along its contraction axis so the kernel's hi/lo reconstruction is a
    # single MXU issue (see onehot_dot_l/_r in _bp_pairs_kernel)
    S6b = S6.astype(jnp.bfloat16)
    S6Tb = S6T.astype(jnp.bfloat16)
    s6d2 = jnp.concatenate([S6b, S6b], axis=1)      # (6L, 2*NBP)
    s6t2 = jnp.concatenate([S6Tb, S6Tb], axis=0)    # (2*NBP, 6L)
    s6td2 = jnp.concatenate([S6Tb, S6Tb], axis=1)   # (NBP, 2*6L)
    s6s2 = jnp.concatenate([S6b, S6b], axis=0)      # (2*6L, NBP)
    operands = [e1p, epp, s6d2, s6t2, s6td2, s6s2, valp]
    warm = init is not None
    if warm:
        nb0, eb0 = init
        operands.append(jnp.pad(nb0.astype(f32),
                                ((0, 0), (0, LANE - nb0.shape[1]),
                                 (0, 8 - nb0.shape[2]))))
        operands.append(eb0.astype(f32))

    RBX = RB if RB > 1 else 1
    rspec = [
        pl.BlockSpec((RBX, LANE, 8), lambda r: (r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RBX, NBP, NBP), lambda r: (r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NROT * LANE, 2 * NBP), lambda r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * NBP, NROT * LANE), lambda r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NBP, 2 * NROT * LANE), lambda r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * NROT * LANE, NBP), lambda r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((LANE, 8), lambda r: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if warm:
        rspec.append(pl.BlockSpec((RBX, LANE, 8), lambda r: (r, 0, 0),
                                  memory_space=pltpu.VMEM))
        rspec.append(pl.BlockSpec((RBX, NROT, LANE, LANE),
                                  lambda r: (r, 0, 0, 0),
                                  memory_space=pltpu.VMEM))

    SL = NROT * LANE
    scratch_shapes = []
    if RB > 1:
        kernel = functools.partial(_bp_pairs_kernel_rb, R, NBP, RB,
                                   damping, max_iter, tol, chunk, warm,
                                   bf16, prodlog, bool(lockstep))
        scratch_shapes = [
            pltpu.VMEM((NBP, RB * NBP), f32),      # es_cat
            pltpu.VMEM((SL, RB * NBP), f32),       # h
            pltpu.VMEM((RB * SL, NBP), f32),       # h_rows
            pltpu.VMEM((RB * SL, SL), f32),        # u_rows
            pltpu.VMEM((SL, RB * SL), f32),        # g_cat
            pltpu.VMEM((NBP, RB * SL), f32),       # t1_wide
            pltpu.VMEM((RB * NBP, SL), f32),       # t1_rows
            pltpu.VMEM((RB * NBP, NBP), f32),      # x_rows
        ]
    elif stacked:
        kernel = functools.partial(_bp_pairs_kernel_stacked, R, NBP,
                                   damping, max_iter, tol, chunk, warm,
                                   bf16, stacked, prodlog)
    else:
        kernel = functools.partial(_bp_pairs_kernel, R, NBP, damping,
                                   max_iter, tol, chunk, warm, bf16)
    F, G1, dE, nb, eb = pl.pallas_call(
        kernel,
        grid=(n_rep // RBX,),
        in_specs=rspec,
        out_specs=(
            pl.BlockSpec((RBX, 1, 1), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBX, LANE, 8), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBX, NBP, NBP), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBX, LANE, 8), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBX, NROT, LANE, LANE), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rep, 1, 1), f32),
            jax.ShapeDtypeStruct((n_rep, LANE, 8), f32),
            jax.ShapeDtypeStruct((n_rep, NBP, NBP), f32),
            jax.ShapeDtypeStruct((n_rep, LANE, 8), f32),
            jax.ShapeDtypeStruct((n_rep, NROT, LANE, LANE), f32),
        ),
        scratch_shapes=scratch_shapes,
        # Same-shaped donated inputs alias their outputs (E_pair -> dE,
        # and the warm-start messages nb0 -> nb, eb0 -> eb): every kernel
        # variant fully reads these refs before the first write (E_pair
        # in scatter phase 1, the warm start at solve init), and the
        # in/out block index maps are identical, so pipelined prefetch
        # regions stay disjoint.  This shares their VMEM windows and HBM
        # buffers — the ~8 MB it frees at RB=8 is what un-OOMs the
        # lockstep RB=8 configuration (r4h measured 164 KB over budget).
        input_output_aliases=(
            {1: 2, 7: 3, 8: 4} if warm else {1: 2}),
        # the f32 (precision=HIGHEST) scatter needs more scratch than the
        # 16M default scoped-vmem budget; the per-replica problem is ~8M
        # (replica-blocked: ~60M at RB=4) so a raised ceiling is safe on
        # v5e's 128M VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    # nb keeps its two diagnostics columns (final deviation, iterations)
    return (F[:, 0, 0], G1[:, :R, :NROT], dE[:, :nb_count, :nb_count],
            nb, eb)


def _stacked_default():
    """Kernel-variant switch for on-device A/B measurement:
    0 = original per-plane kernel, 1 = stacked (concat tiling),
    2 = stacked with leading-dim broadcast tiling, 3 = 2 + whole-array
    transposes.  Default is variant 2, the round-3 A/B winner on a real
    v5e chip (warm fwd+VJP 2.416 ms vs 2.663 for the per-plane kernel at
    64 replicas, on-device cold-solve cross-check rel err 4.5e-6 —
    bench_logs/r3c_0819_0331/bp{0,2}.log)."""
    return int(os.environ.get("UPSIDE_BP_STACKED", "2"))


def _rb_default():
    """Replicas per grid step for the replica-blocked kernel
    (UPSIDE_BP_RB).  1 = one replica per grid step (the round-3 kernels).
    Values > 1 batch the four exact scatter dots across the block in
    single wide MXU issues.  With per-replica solve loops this measured a
    LOSS at every block size (bench_logs/r4c_0819_1023); combined with
    the LOCKSTEP solve, RB=2 is the measured end-to-end winner
    (bench_logs/r4h: 11,364 vs 11,028 steps/s at 256 reps), so the
    defaults are RB=2 + LOCKSTEP=1; RB=1 restores the round-3 kernel."""
    return int(os.environ.get("UPSIDE_BP_RB", "2"))


def _prodlog_default():
    """UPSIDE_BP_PRODLOG: 1 pins identity-plane messages to exactly 1.0
    and computes node beliefs from lane PRODUCTS of the real messages
    instead of per-element log sums (see _stacked_solve_bethe) — same
    fixed point, ~1M fewer VPU ops per sweep.  Stacked/rb kernels only;
    the per-plane variant-0 kernel keeps the log path as the numeric
    cross-check reference.  Measured LOSS on TPU (bench_logs/r4e: narrow-
    lane tree products cost more than the wide log), so the default is 0."""
    return int(os.environ.get("UPSIDE_BP_PRODLOG", "0"))


def _lockstep_default():
    """UPSIDE_BP_LOCKSTEP: 1 advances the whole replica block's BP sweeps
    in ONE 4D while_loop (requires UPSIDE_BP_RB > 1; see _lockstep_solve).
    The per-replica solve is issue-bound at (768, 128) shapes, so lockstep
    widens every per-sweep op RB× at the cost of running each block to its
    max sweep count.  Default ON with RB=2 — the measured end-to-end
    winner (bench_logs/r4h, +3.0% over the padded-grid-only state; RB=8
    exceeds VMEM, RB=4 ties on fwd+VJP)."""
    return int(os.environ.get("UPSIDE_BP_LOCKSTEP", "1"))


@functools.lru_cache(maxsize=None)
def _pairs_dispatch(static, interpret, bf16, warm, stacked, rb=1,
                    prodlog=0, lockstep=0):
    """custom_vmap wrapper: a replica ensemble maps to the kernel's grid
    with the scatter one-hots and validity mask shared, not broadcast."""
    R, damping, max_iter, tol, chunk = static

    @jax.custom_batching.custom_vmap
    def run(E1, E_pair, S6, S6T, valid, nb0, eb0):
        init = (nb0[None], eb0[None]) if warm else None
        F, G1, dE, nb, eb = _bp_pairs_impl(
            R, damping, max_iter, tol, chunk, interpret, bf16, stacked, 1,
            prodlog, 0, E1[None], E_pair[None], S6, S6T, valid, init)
        return F[0], G1[0], dE[0], nb[0], eb[0]

    @run.def_vmap
    def rule(axis_size, in_batched, E1, E_pair, S6, S6T, valid, nb0, eb0):
        e1b, epb, s6b, s6tb, vb, nbb, ebb = in_batched
        if s6b or s6tb or vb:
            raise NotImplementedError(
                "per-replica scatter structure is static by construction")
        if not e1b:
            E1 = jnp.broadcast_to(E1, (axis_size,) + E1.shape)
        if not epb:
            E_pair = jnp.broadcast_to(E_pair, (axis_size,) + E_pair.shape)
        if warm:
            if not nbb:
                nb0 = jnp.broadcast_to(nb0, (axis_size,) + nb0.shape)
            if not ebb:
                eb0 = jnp.broadcast_to(eb0, (axis_size,) + eb0.shape)
            init = (nb0, eb0)
        else:
            init = None
        out = _bp_pairs_impl(R, damping, max_iter, tol, chunk, interpret,
                             bf16, stacked, rb, prodlog, lockstep, E1,
                             E_pair, S6, S6T, valid, init)
        return out, (True,) * 5

    return run


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def bp_bethe_pairs(static, interpret, bf16, E1, E_pair, S6, S6T, valid,
                   init):
    """Bethe free energy straight from bead-space pair energies.

    static: (R, damping, max_iter, tol, chunk); E1 (R, 6) one-body
    energies; E_pair (nb, nb) pair-energy grid (each unordered pair counted
    once, upper triangle); S6/S6T the static scatter one-hots from
    _scatter_onehots; valid (R, 6) slot validity; init None or padded warm
    messages (nb0 (128, 6..8), eb0 (6, 128, 128)).

    Returns (F, nb, eb).  Gradients flow to E1 and E_pair only, via the
    envelope theorem (reference rotamer.cpp:956-985); spurious pair-
    marginal gradients on out-of-cutoff bead pairs are zeroed by the pair
    kernel's own cutoff mask downstream."""
    warm = init is not None
    nb0, eb0 = init if warm else (jnp.zeros((LANE, NROT), jnp.float32),
                                  jnp.zeros((NROT, LANE, LANE), jnp.float32))
    F, G1, dE, nb, eb = _pairs_dispatch(static, interpret, bf16, warm,
                                        _stacked_default(), _rb_default(),
                                        _prodlog_default(),
                                        _lockstep_default())(
        E1, E_pair, S6, S6T, valid, nb0, eb0)
    return F, nb, eb


def _bp_pairs_fwd(static, interpret, bf16, E1, E_pair, S6, S6T, valid,
                  init):
    warm = init is not None
    nb0, eb0 = init if warm else (jnp.zeros((LANE, NROT), jnp.float32),
                                  jnp.zeros((NROT, LANE, LANE), jnp.float32))
    F, G1, dE, nb, eb = _pairs_dispatch(static, interpret, bf16, warm,
                                        _stacked_default(), _rb_default(),
                                        _prodlog_default(),
                                        _lockstep_default())(
        E1, E_pair, S6, S6T, valid, nb0, eb0)
    return (F, nb, eb), (G1, dE, jnp.zeros((0,), E1.dtype),
                         jnp.zeros((0,), E_pair.dtype))


def _bp_pairs_bwd(static, interpret, bf16, res, cot):
    G1, dE, z1, z2 = res
    gF = cot[0]
    return (gF * G1.astype(z1.dtype), gF * dE.astype(z2.dtype),
            None, None, None, None)


bp_bethe_pairs.defvjp(_bp_pairs_fwd, _bp_pairs_bwd)
