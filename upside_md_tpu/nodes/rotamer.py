"""Side-chain rotamer free energy via loopy belief propagation.

Reference: src/rotamer.cpp (1082 LoC of SIMD message passing over a
hand-built sparse edge hash).  TPU-native redesign:

* Every residue is padded to MAX_ROT=6 rotamer slots with a validity mask;
  there are no 1/3/6-rotamer node classes and no edge hash.
* Bead-pair energies (the directional quadspline kernel of
  src/bead_interaction.h) are computed on the dense bead grid and
  scattered into residue-pair 6x6 blocks with two one-hot matmuls (MXU).
* BP messages are one batched einsum over the dense (n_res, n_res, 6, 6)
  edge-potential tensor per iteration; non-edges carry identity potentials
  and provably do not move the fixed point.
* The solve runs inside stop_gradient; the returned potential is the Bethe
  free energy written as an explicit function of the (stopped) marginals
  and the (differentiable) energies.  jax.grad then reproduces exactly the
  reference's envelope-theorem derivative: edge sensitivity = pair
  marginal, 1-body sensitivity = node marginal (rotamer.cpp:956-985).

The padded-class trick mirrors how the reference already splits 1/3/6-rot
NodeHolders; folding 1-rotamer residues into their neighbors (reference
move_edge_prob_to_node2) is unnecessary here because a 1-rot node's belief
is pinned by its mask and its messages act as the same constant field.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pairs import (quadspline_coverage_nl, quadspline_family,
                         scatter_rows)
from .base import register_node

MAX_ROT = 6
EPS = 1e-10
# beads beyond this count switch the pair kernel to a fixed-K neighbor
# list; K must exceed the worst-case in-cutoff partner count.  Measured on
# v5e: masked-dense beats the neighbor list below ~1k beads (top_k + row
# gathers dominate), so the NL only engages for large multi-chain systems.
NEIGHBOR_LIST_THRESHOLD = 1024
NEIGHBOR_K = 128
# the bead->rot-slot mega-kernel holds the (padded) pair grid plus its
# gradient in VMEM; beyond this bead count fall back to the plane kernel
PAIRS_KERNEL_MAX_BEADS = 512


def decode_bead_ids(packed_ids, n_bit_rotamer=4):
    """Packed bead id -> (rot, n_rot, residue) bit fields
    (reference rotamer.cpp:565-577, bead_interaction.h:131)."""
    packed_ids = np.asarray(packed_ids, np.int64)
    sel = (1 << n_bit_rotamer) - 1
    rot = packed_ids & sel
    n_rot = (packed_ids >> n_bit_rotamer) & sel
    res = packed_ids >> (2 * n_bit_rotamer)
    return rot.astype(np.int32), n_rot.astype(np.int32), res.astype(np.int32)


def _bp_solve(prob, P, adj, valid, damping, max_iter, tol, chunk=2,
              init=None, return_iters=False):
    """Damped synchronous loopy BP on the dense residue grid.

    prob:  (R, 6)        unnormalized node potentials (zero at invalid slots)
    P:     (R, R, 6, 6)  pairwise Boltzmann factors, P[i,j,a,b]=exp(-E2[i,j,a,b])
    adj:   (R, R) bool   which pairs are real edges (diagonal False)
    valid: (R, 6) bool   rotamer-slot validity
    init:  optional (nb0 (R,6), eb0 (R,R,6)) warm-start beliefs; BP
           converges to the same fixed point from any positive init, so a
           warm start (e.g. the previous MD step's messages) only changes
           the iteration count, never the answer beyond `tol`.
    Returns (node_belief (R,6) l1-normalized, edge_belief (R,R,6)).

    Matches the reference solve_for_marginals schedule
    (rotamer.cpp:988-1061): beliefs start from the bare probabilities, the
    first sweep is undamped, subsequent sweeps mix with `damping`.
    """
    R = prob.shape[0]
    adf = adj[..., None].astype(prob.dtype)

    def edge_update(nb_for_v, eb):
        # V[i,j,:] = nb[i]/(eps+eb[i,j,:]); message into i from j:
        # eb_new[i,j,a] = sum_b P[i,j,a,b] * V[j,i,b].
        # Written as an elementwise multiply-reduce instead of an einsum:
        # a batched 6x6 dot_general pads each tiny tile onto the MXU and
        # dominates the whole force evaluation; the VPU form is ~free.
        V = nb_for_v[:, None, :] / (EPS + eb)
        VT = jnp.swapaxes(V, 0, 1)                    # VT[i,j,b] = V[j,i,b]
        m = jnp.sum(P * VT[:, :, None, :], axis=-1)   # (R,R,6)
        m = jnp.where(valid[:, None, :], m, 0.0)
        norm = jnp.sum(m, axis=-1, keepdims=True)
        m = m / jnp.maximum(norm, EPS)
        return jnp.where(adj[..., None], m, 1.0)

    def node_update(eb):
        # product over edges in log space (masked), max-centered before
        # exp so high-degree nodes cannot underflow f32 (the constant
        # cancels in the max-normalization)
        s = jnp.sum(jnp.log(jnp.maximum(eb, 1e-30)) * adf, axis=1)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        nb = prob * jnp.exp(s)
        return nb / jnp.maximum(jnp.max(nb, axis=-1, keepdims=True), EPS)

    if init is None:
        # initial sweep (undamped; reference calculate_new_beliefs(0, true))
        eb0 = edge_update(prob, jnp.ones((R, R, MAX_ROT), prob.dtype))
        nb0 = prob / jnp.maximum(jnp.max(prob, -1, keepdims=True), EPS)
    else:
        nb0, eb0 = (jnp.asarray(init[0], prob.dtype),
                    jnp.asarray(init[1], prob.dtype))
        # the cache stores sum-normalized beliefs but the sweep loop is
        # max-normalized; rescale so the damping mix doesn't see a purely
        # notational deviation (costs ~2 chunks of sweeps otherwise)
        nb0 = nb0 / jnp.maximum(jnp.max(nb0, -1, keepdims=True), EPS)

    def cond(state):
        _, _, it, dev = state
        return (it < max_iter) & (dev > tol)

    def body(state):
        nb, eb, it, _ = state
        # several sweeps per convergence check (the reference's
        # iteration_chunk_size, rotamer.cpp:1038-1046) — halves the
        # while-loop condition overhead
        for _ in range(chunk):
            nb_prev = nb
            eb = edge_update(nb, eb)
            nb_new = node_update(eb)
            nb = (1.0 - damping) * nb_new + damping * nb
        dev = jnp.max(jnp.abs(nb - nb_prev))
        return nb, eb, it + chunk, dev

    nb, eb, iters, _ = jax.lax.while_loop(
        cond, body, (nb0, eb0, jnp.asarray(0), jnp.asarray(jnp.inf, prob.dtype)))

    nb = nb / jnp.maximum(jnp.sum(nb, -1, keepdims=True), EPS)
    if return_iters:
        return nb, eb, iters
    return nb, eb


def bethe_free_energy(E1, offset, P, adj, valid, node_marg, edge_belief):
    """Bethe free energy as an explicit function of the energies with the
    marginals held constant (envelope form).

    node term (rotamer.cpp:292-302):
        offset_r + sum_o b log((eps+b)/(eps+exp(offset-E1)))
    edge term (rotamer.cpp:431-451), i<j real edges:
        sum_ab m log((eps+m)/(eps+P*b_i*b_j))
    """
    b = jax.lax.stop_gradient(node_marg)
    pr = jnp.where(valid, jnp.exp(offset[:, None] - E1), 0.0)
    node_en = offset + jnp.sum(
        jnp.where(valid, b * jnp.log((EPS + b) / (EPS + pr)), 0.0), axis=-1)

    eb = jax.lax.stop_gradient(edge_belief)
    bc1 = b[:, None, :] / (EPS + eb)                 # (R,R,6) node i at edge ij
    bc2 = jnp.swapaxes(bc1, 0, 1)                    # node j at edge ij
    m_raw = P * bc1[:, :, :, None] * bc2[:, :, None, :]
    m_norm = jnp.maximum(jnp.sum(m_raw, axis=(-1, -2), keepdims=True), EPS)
    m = jax.lax.stop_gradient(m_raw / m_norm)

    pbb = P * b[:, None, :, None] * b[None, :, None, :]
    pair_valid = valid[:, None, :, None] & valid[None, :, None, :]
    edge_en = jnp.sum(
        jnp.where(pair_valid, m * jnp.log((EPS + m) / (EPS + pbb)), 0.0),
        axis=(-1, -2))

    iu = jnp.triu(adj, 1)  # count each edge once
    return jnp.sum(node_en) + jnp.sum(jnp.where(iu, edge_en, 0.0))


def assemble_one_body(consts, params, inputs):
    """Bead geometry rows + the padded 1-body energy table.

    Returns (x (n_bead, >=6), E1 (R,6), offset (R,), prob (R,6), valid)."""
    beads = inputs[0]                       # bead pos+dir node (n, >=6)
    prob_nodes = inputs[1:]                 # 1-body energies, each (n, 1)
    idx = consts["index"]                   # bead -> row in pos node
    x = beads[idx]
    n_res = int(consts["n_res"])
    valid = jnp.asarray(consts["valid"])    # (n_res, 6) bool
    onehot = jnp.asarray(consts["onehot"], x.dtype)      # (n_bead, n_res*6)

    if prob_nodes and all(pn.shape == prob_nodes[0].shape
                          for pn in prob_nodes):
        # fold the bead gather into the rot-slot scatter: one static
        # matrix G[(ri,a), row] = sum_{n: idx[n]=row} onehot[n, ri*6+a]
        # turns gather + scatter-add (slow on TPU) into a single matvec
        n_rows = prob_nodes[0].shape[0]
        G = np.zeros((n_res * MAX_ROT, n_rows), np.float32)
        np.add.at(G, (np.argmax(consts["onehot"], axis=1),
                      np.asarray(idx)), 1.0)
        e_rows = prob_nodes[0][:, 0]
        for pn in prob_nodes[1:]:
            e_rows = e_rows + pn[:, 0]
        E1 = (jnp.asarray(G, x.dtype) @ e_rows).reshape(n_res, MAX_ROT)
    else:
        e_bead = jnp.zeros((x.shape[0],), x.dtype)
        for pn in prob_nodes:
            e_bead = e_bead + pn[idx, 0]
        E1 = (e_bead @ onehot).reshape(n_res, MAX_ROT)
    offset = jnp.min(jnp.where(valid, E1, jnp.inf), axis=-1)
    prob = jnp.where(valid, jnp.exp(offset[:, None] - E1), 0.0)
    return x, E1, offset, prob, valid


def assemble_pair_grid(consts, params, x):
    """Dense (n_bead, n_bead) pair-energy grid, each unordered pair counted
    once (upper triangle, different residues — the reference pairlist
    builds b1<b2 edges, rotamer.cpp:793-852).

    Returns (E_pair, pair_mask)."""
    table = params["interaction_param"]
    ka, k, dx = quadspline_family(table.shape[-1])
    res = consts["res"]
    n_bead = x.shape[0]
    cutoff = (k - 2 - 1e-6) * dx
    triangle = jnp.arange(n_bead)[:, None] < jnp.arange(n_bead)[None, :]
    base_mask = triangle & (res[:, None] != res[None, :])
    if n_bead > NEIGHBOR_LIST_THRESHOLD:
        cov, idx, nmask = quadspline_coverage_nl(
            table, consts["type"], consts["type"], x[:, 0:3], x[:, 3:6],
            x[:, 0:3], x[:, 3:6], ka, k, 1.0 / dx, base_mask,
            min(n_bead, NEIGHBOR_K))
        E_pair = scatter_rows(cov, idx, nmask, n_bead)
        pair_mask = scatter_rows(jnp.where(nmask, 1.0, 0.0), idx, nmask,
                                 n_bead) > 0
    else:
        disp = x[None, :, 0:3] - x[:, None, 0:3]
        dist2 = jnp.sum(disp * disp, -1)
        pair_mask = base_mask & (dist2 < cutoff * cutoff)
        from ..ops.pairs import pair_coverage
        E_pair = pair_coverage(table, consts["type"], consts["type"],
                               x, x, base_mask, ka, k, dx)
    return E_pair, pair_mask


def assemble_rotamer_energies(consts, params, inputs):
    """Build the padded residue-level BP problem from bead geometry.

    Returns (E1 (R,6), offset (R,), prob (R,6), E2 (R,R,6,6), adj, valid) —
    the reference builds the same data into its Node/EdgeHolders
    (rotamer.cpp fill_holders, :793-852).  E2 is the symmetrized pair
    energy; the Boltzmann factor P = exp(-E2) is formed by the solver."""
    x, E1, offset, prob, valid = assemble_one_body(consts, params, inputs)
    n_res = int(consts["n_res"])
    onehot = jnp.asarray(consts["onehot"], x.dtype)      # (n_bead, n_res*6)
    onehot_res = jnp.asarray(consts["onehot_res"], x.dtype)  # (n_bead, n_res)
    E_pair, pair_mask = assemble_pair_grid(consts, params, x)

    # scatter to (R*6, R*6) with two one-hot matmuls (MXU-friendly) at
    # HIGHEST precision: bf16 rounding of the pair energies (0.4%) is
    # amplified through exp(-E2) on clash-scale energies and measurably
    # moves the BP fixed point on frustrated problems — the bench.py
    # device gate requires the scatter to be exact (f32) so the Pallas
    # and XLA paths agree.
    HI = jax.lax.Precision.HIGHEST
    half = jax.lax.dot(onehot.T, E_pair.astype(onehot.dtype), precision=HI,
                       preferred_element_type=jnp.float32)
    E2u = jax.lax.dot(half.astype(onehot.dtype), onehot, precision=HI,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    E2u = E2u.reshape(n_res, MAX_ROT, n_res, MAX_ROT)
    E2u = jnp.transpose(E2u, (0, 2, 1, 3))    # (R, R, 6, 6)
    E2 = E2u + jnp.transpose(E2u, (1, 0, 3, 2))
    adjf = onehot_res.T @ pair_mask.astype(x.dtype) @ onehot_res
    adj = ((adjf + adjf.T) > 0) & ~jnp.eye(n_res, dtype=bool)
    return E1, offset, prob, E2, adj, valid


def _use_pallas_bp(n_res):
    import os
    return (jax.default_backend() == 'tpu'
            and not os.environ.get('UPSIDE_NO_PALLAS')
            and n_res <= 128)


def bp_solve_health(cache_entry):
    """Per-replica (final deviation, sweep count) from a threaded BP
    cache entry, or None when the entry carries no diagnostics columns
    (XLA-path caches).  The Pallas kernels write them into the belief
    array's padding columns 6/7 (the reference's n_bad_solve signal,
    rotamer.cpp:657-659); extrapolation history leaves behind the first
    two do not affect the location."""
    if not isinstance(cache_entry, tuple) or len(cache_entry) < 2:
        return None
    nb = cache_entry[0]
    if getattr(nb, "ndim", 0) == 3 and nb.shape[-1] >= 8:
        diag = np.asarray(nb[:, 0, 6:8])
        return diag[:, 0], diag[:, 1]
    return None


def _extrap_cfg():
    """UPSIDE_BP_EXTRAP: "<alpha>" extrapolates node beliefs AND edge
    messages; "nb:<alpha>" node beliefs only.  nb-only keeps ~94% of the
    sweep savings (6.99 vs 6.58 mean sweeps, vs 7.56 plain warm on
    ubiquitin at damping 0.1 — tools/bp_extrap_exp.py) while the cache
    history shrinks from the (6,128,128) message planes to one (128,8)
    belief array per replica."""
    import os
    # default: nb-only linear log-space extrapolation — measured strictly
    # fewer sweeps than the plain warm start on every system tried, at
    # one extra (128, 8) history array of cost; quadratic (3-point)
    # extrapolation measured WORSE (noise amplification across
    # thermostat kicks), see BENCH_NOTES.md
    v = os.environ.get("UPSIDE_BP_EXTRAP", "nb:1.0")
    if not v or v.lower() in ("0", "off", "none"):
        return None
    if v.startswith("nb:"):
        return (float(v[3:]), "nb")
    return (float(v), "both")


def _extrapolate_beliefs(last, prev, alpha):
    """Warm-start init extrapolated (log-space) from the last TWO force
    evaluations' converged beliefs: m = m1 * (m1/m0)^alpha, clipped.

    Positions move by O(dt/3) between evaluations, so the beliefs drift
    smoothly; starting from the extrapolation instead of the last value
    cuts the sweep count (measured on trajectory: median 12 -> 8 sweeps
    on ubiquitin at alpha=1, tools/bp_extrap_exp.py).  BP converges to
    the same fixed point from any positive init, so this changes only the
    iteration count, never the answer beyond tol.  Handles both belief
    layouts: XLA nb (R, 6)/eb (R, R, 6) and the Pallas kernels'
    nb (128, 8 incl. diagnostics cols)/eb (6, 128, 128) planes."""
    nb1, eb1 = last
    nb0, eb0 = prev

    def ex(m1, m0):
        r = jnp.clip(m1 / jnp.maximum(m0, 1e-12), 0.1, 10.0)
        m = m1 * r ** alpha
        return jnp.where(m1 > 0, jnp.maximum(m, 1e-8), jnp.zeros_like(m1))

    nbx = ex(nb1[..., :MAX_ROT], nb0[..., :MAX_ROT])
    nbx = nbx / jnp.maximum(jnp.max(nbx, -1, keepdims=True), EPS)
    if nb1.shape[-1] > MAX_ROT:   # diagnostics columns ride along
        nbx = jnp.concatenate([nbx, nb1[..., MAX_ROT:]], axis=-1)

    if eb1 is eb0:     # nb-only mode: messages pass through untouched
        return nbx, eb1
    eb = ex(eb1, eb0)
    # renormalize each extrapolated message across its rotamer-slot axis
    # (last axis in the XLA layout, plane axis in the kernel layout);
    # messages that did not move between the two steps — non-edges pinned
    # at 1.0, or converged-identical edges — keep their stored value
    ax = -1 if eb.shape[-1] == MAX_ROT else 0
    s = jnp.sum(eb, axis=ax, keepdims=True)
    moved = jnp.any(eb1 != eb0, axis=ax, keepdims=True)
    eb = jnp.where(moved, eb / jnp.maximum(s, EPS), eb1)
    return nbx, eb


def _solve_damping(consts):
    """Solver damping: the config's value, unless overridden.

    Damping shapes the convergence path, never the fixed point, so an
    override changes iteration counts only (tools/bp_damping_exp.py:
    warm-started production solves converge FASTER with less damping —
    ubiquitin mean 11.7 sweeps at the reference default 0.4 vs 7.6 at
    0.1).  UPSIDE_BP_DAMPING applies to every solve; configs keep their
    stored attribute for reference parity."""
    import os
    v = os.environ.get("UPSIDE_BP_DAMPING")
    return float(v) if v else float(consts["damping"])


def _solve_chunk(consts):
    """Convergence-check cadence (sweeps between tolerance tests,
    reference iteration_chunk_size rotamer.cpp:1038-1046).  Schedule
    only — overshooting the fixed point by up to chunk-1 sweeps never
    changes it.  UPSIDE_BP_CHUNK overrides for A/B sessions."""
    import os
    v = os.environ.get("UPSIDE_BP_CHUNK")
    # clamp to >= 1: chunk 0 would make the solve body run zero sweeps
    # between checks, which is meaningless and trips the loop carry
    return max(1, int(v)) if v else max(
        1, int(consts.get("iteration_chunk_size", 2)))


def _rotamer(consts, params, inputs, extra):
    n_res = int(consts["n_res"])
    static = (n_res, _solve_damping(consts), int(consts["max_iter"]),
              float(consts["tol"]), _solve_chunk(consts))

    # warm-start messages threaded through the MD loop (cache protocol of
    # System.energy_and_cache); BP converges to the same fixed point from
    # any init, so this only cuts iterations
    name = (extra or {}).get("_node_name")
    raw_init = (extra or {}).get("_cache", {}).get(name)
    cache_out = (extra or {}).get("_cache_out")

    extrap = _extrap_cfg()
    init = raw_init
    if raw_init is not None:
        if extrap is not None and extrap[1] == "both" and len(raw_init) >= 4:
            init = _extrapolate_beliefs((raw_init[0], raw_init[1]),
                                        (raw_init[2], raw_init[3]),
                                        extrap[0])
        elif extrap is not None and extrap[1] == "nb" and len(raw_init) >= 3:
            init = _extrapolate_beliefs((raw_init[0], raw_init[1]),
                                        (raw_init[2], raw_init[1]),
                                        extrap[0])
        else:
            init = (raw_init[0], raw_init[1])

    def cache_entry(nb_new, eb_new):
        """(last, prev) belief history when extrapolating, last alone
        otherwise; `prev` is the previous evaluation's raw solution
        (node beliefs only in nb mode)."""
        entry = (nb_new, eb_new)
        if extrap is not None:
            prev = raw_init if raw_init is not None else entry
            entry = entry + ((prev[0],) if extrap[1] == "nb"
                             else (prev[0], prev[1]))
        return entry

    import os
    n_bead = len(consts["res"])
    if (_use_pallas_bp(n_res) and n_bead <= PAIRS_KERNEL_MAX_BEADS
            and not os.environ.get("UPSIDE_BP_PLANES")):
        # mega-kernel: bead pair energies -> rot-slot scatter, BP solve,
        # Bethe energy and envelope gradients all in one VMEM-resident
        # Pallas kernel (see ops/pallas_bp.py bp_bethe_pairs); the
        # residue-pair block tensor never exists in HBM
        from ..ops.pallas_bp import LANE, _scatter_onehots, bp_bethe_pairs
        x, E1, offset, prob, valid = assemble_one_body(consts, params,
                                                       inputs)
        pre_grid = (extra or {}).get("_fused", {}).get(
            (name or "") + ":E_pair")
        if pre_grid is not None:
            E_pair = pre_grid   # fused cross-node kernel (nodes/fusion.py)
        else:
            E_pair, _ = assemble_pair_grid(consts, params, x)
        nbp = -(-n_bead // LANE) * LANE
        S6 = _scatter_onehots(consts["res"], consts["rot"], nbp)
        F, nb, eb = bp_bethe_pairs(static, False, False,
                                   E1.astype(jnp.float32),
                                   E_pair.astype(jnp.float32),
                                   jnp.asarray(S6), jnp.asarray(S6.T),
                                   valid, init)
        if cache_out is not None and name is not None:
            cache_out[name] = cache_entry(jax.lax.stop_gradient(nb),
                                          jax.lax.stop_gradient(eb))
        return F.astype(E1.dtype)

    E1, offset, prob, E2, adj, valid = assemble_rotamer_energies(
        consts, params, inputs)

    if _use_pallas_bp(n_res):
        # fused in-VMEM solve + Bethe + envelope gradients (one Pallas
        # kernel per replica; see ops/pallas_bp.py)
        from ..ops.pallas_bp import bp_bethe_pallas
        E2planes = jnp.transpose(E2, (2, 3, 0, 1)).reshape(
            MAX_ROT * MAX_ROT, n_res, n_res).astype(jnp.float32)
        F, nb, eb = bp_bethe_pallas(static, False, E1.astype(jnp.float32),
                                    E2planes, adj, jnp.asarray(valid), init)
        if cache_out is not None and name is not None:
            cache_out[name] = cache_entry(jax.lax.stop_gradient(nb),
                                          jax.lax.stop_gradient(eb))
        return F.astype(E1.dtype)

    P = jnp.exp(-E2)
    # solve (constant w.r.t. autodiff) and assemble the Bethe energy
    debug_iters = bool(os.environ.get("UPSIDE_BP_DEBUG_ITERS"))
    out = _bp_solve(jax.lax.stop_gradient(prob), jax.lax.stop_gradient(P),
                    adj, valid, static[1], consts["max_iter"],
                    consts["tol"],
                    _solve_chunk(consts), init=init,
                    return_iters=debug_iters)
    nb, eb = out[0], out[1]
    if cache_out is not None and name is not None:
        # stored in f32 so the cache pytree keeps a stable structure in
        # lax.fori_loop carries regardless of the x64 mode
        entry = cache_entry(
            jax.lax.stop_gradient(nb).astype(jnp.float32),
            jax.lax.stop_gradient(eb).astype(jnp.float32))
        if debug_iters:
            # observability parity with the Pallas kernels' diagnostics
            # columns: ride the solve's sweep count through the cache
            entry = entry + (out[2].astype(jnp.int32),)
        cache_out[name] = entry
    return bethe_free_energy(E1, offset, P, adj, valid, nb, eb)


def _rot_init_cache(consts, params):
    """Initial warm-start messages: uniform beliefs, identity edge
    messages.  These are a valid BP starting point (the reference's cold
    start normalizes away the difference in its first sweep), so the first
    cached evaluation matches the cold answer to the solver tolerance."""
    n_res = int(consts["n_res"])
    valid = np.asarray(consts["valid"])
    if _use_pallas_bp(n_res):
        from ..ops.pallas_bp import LANE
        # 8 columns: 6 belief slots + the kernel's two solve-diagnostics
        # columns (final deviation, iteration count)
        nb0 = np.zeros((LANE, 8), np.float32)
        nb0[:n_res, :MAX_ROT] = valid.astype(np.float32)
        eb0 = np.ones((MAX_ROT, LANE, LANE), np.float32)
        entry = (jnp.asarray(nb0), jnp.asarray(eb0))
        cfg = _extrap_cfg()
        if cfg is not None:   # (last, prev) history, initially equal
            entry = entry + ((entry[0],) if cfg[1] == "nb" else entry)
        return entry
    entry = (jnp.asarray(valid, jnp.float32),
             jnp.ones((n_res, n_res, MAX_ROT), jnp.float32))
    cfg = _extrap_cfg()
    if cfg is not None:
        entry = entry + ((entry[0],) if cfg[1] == "nb" else entry)
    import os
    if os.environ.get("UPSIDE_BP_DEBUG_ITERS"):
        entry = entry + (jnp.asarray(0, jnp.int32),)
    return entry


def _rot_get_param(c, p):
    return np.asarray(p["interaction_param"]).ravel()


def _rot_set_param(c, p, flat):
    shape = np.asarray(p["interaction_param"]).shape
    q = dict(p)
    q["interaction_param"] = jnp.asarray(
        np.asarray(flat, np.float32).reshape(shape))
    return c, q


rotamer = register_node("rotamer", True, _rotamer,
                        get_param=_rot_get_param, set_param=_rot_set_param,
                        init_cache=_rot_init_cache)


def make_rotamer_consts(packed_ids, index, types, damping, max_iter, tol):
    """Build the static scatter/mask structures from packed bead ids.

    NOTE: the packed residue field is a counter *within* each
    rotamer-count class (upside_config.py:973-983 count_by_n_rot), so the
    BP node key is the (n_rot, count) pair — two residues in different
    classes share count values."""
    rot, n_rot, res = decode_bead_ids(packed_ids)
    key = res.astype(np.int64) * (1 << 4) + n_rot
    uniq, res_c = np.unique(key, return_inverse=True)
    res_c = res_c.astype(np.int32)
    n_res = len(uniq)
    n_rot_per_res = np.zeros(n_res, np.int32)
    n_rot_per_res[res_c] = n_rot
    valid = np.arange(MAX_ROT)[None, :] < n_rot_per_res[:, None]

    n_bead = len(rot)
    onehot = np.zeros((n_bead, n_res * MAX_ROT), np.float32)
    onehot[np.arange(n_bead), res_c * MAX_ROT + rot] = 1.0
    onehot_res = np.zeros((n_bead, n_res), np.float32)
    onehot_res[np.arange(n_bead), res_c] = 1.0

    return {
        "index": np.asarray(index, np.int32),
        "type": np.asarray(types, np.int32),
        "rot": rot, "res": res_c, "n_res": n_res,
        "n_rot_per_res": n_rot_per_res,
        "valid": valid, "onehot": onehot, "onehot_res": onehot_res,
        "damping": float(damping), "max_iter": int(max_iter),
        "tol": float(tol),
    }


def rotamer_diagnostics(consts, params, inputs):
    """Diagnostics matching the reference's get_value_by_name channels
    (rotamer.cpp:675-773): per-residue free energies, 1-body energies,
    node/edge energies and marginals."""
    E1, offset, prob, E2, adj, valid = assemble_rotamer_energies(
        consts, params, inputs)
    P = jnp.exp(-E2)
    nb, eb = _bp_solve(prob, P, adj, valid, consts["damping"],
                       consts["max_iter"], consts["tol"])

    pr = jnp.where(valid, jnp.exp(offset[:, None] - E1), 0.0)
    node_en = offset + jnp.sum(
        jnp.where(valid, nb * jnp.log((EPS + nb) / (EPS + pr)), 0.0), -1)

    bc1 = nb[:, None, :] / (EPS + eb)
    bc2 = jnp.swapaxes(bc1, 0, 1)
    m_raw = P * bc1[:, :, :, None] * bc2[:, :, None, :]
    m = m_raw / jnp.maximum(jnp.sum(m_raw, (-1, -2), keepdims=True), EPS)
    pbb = P * nb[:, None, :, None] * nb[None, :, None, :]
    pair_valid = valid[:, None, :, None] & valid[None, :, None, :]
    edge_en = jnp.sum(jnp.where(pair_valid,
                                m * jnp.log((EPS + m) / (EPS + pbb)), 0.0),
                      (-1, -2))
    edge_en = jnp.where(adj, edge_en, 0.0)

    residue_fe = node_en + 0.5 * jnp.sum(edge_en, axis=1)
    bead_marg = nb.reshape(-1)[consts["res"] * MAX_ROT + consts["rot"]]
    return {
        "node_marginal": nb,
        "edge_marginal": jnp.where(adj[:, :, None, None], m, 0.0),
        "node_energy": jnp.where(valid, E1, 1e5),
        "edge_energy": -jnp.log(jnp.where(adj[:, :, None, None], P, 1.0)),
        "node_free_energy": node_en,
        "edge_free_energy": edge_en,
        "rotamer_free_energy": residue_fe,
        "bead_marginal": bead_marg,
        "adjacency": adj,
    }


def rotamer_1body_energy(consts, params, inputs, prob_node_index):
    """Marginal-weighted 1-body energy per residue for one prob node
    (rotamer.cpp:904-926)."""
    diag = rotamer_diagnostics(consts, params, inputs)
    nb = diag["node_marginal"]
    idx = consts["index"]
    e_bead = inputs[1 + prob_node_index][idx, 0]
    w = nb.reshape(-1)[consts["res"] * MAX_ROT + consts["rot"]]
    onehot_res = jnp.asarray(consts["onehot_res"], e_bead.dtype)
    return (w * e_bead) @ onehot_res


def rotamer_marginals(consts, params, inputs):
    """Posterior node marginals per bead (for chi1 prediction diagnostics).

    Returns (node_marginals (n_res, 6), per-bead marginal (n_bead,))."""
    _, _, prob, E2, adj, valid = assemble_rotamer_energies(
        consts, params, inputs)
    nb, _ = _bp_solve(prob, jnp.exp(-E2), adj, valid, consts["damping"],
                      consts["max_iter"], consts["tol"])
    bead_marg = nb.reshape(-1)[consts["res"] * MAX_ROT + consts["rot"]]
    return nb, bead_marg
