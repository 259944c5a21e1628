"""Chi1 rotamer-state prediction (reference: py/predict_chi1.py).

Pipeline: PDB -> config (loose hbond criteria, dynamic rotamer 1-body, no
backbone sterics, basic springs disabled) -> one energy evaluation ->
sensitivities of the hbond_coverage output (= posterior bead marginals by
the envelope theorem) -> chi1-state probabilities per residue.
"""

from __future__ import annotations

import time
from typing import Optional

import h5py
import numpy as np

deg = np.pi / 180.0


def compute_chi1_state(chi1):
    return (((chi1 / deg) % 360.0) / 120.0).astype('i')


class Chi1Predict:
    def __init__(self, sidechain_file):
        with h5py.File(sidechain_file, 'r') as t:
            restype_order = [b.decode() if isinstance(b, bytes) else str(b)
                             for b in t['restype_order']]
            self.restype_dict = {x: i for i, x in enumerate(restype_order)}
            self.n_restype = len(self.restype_dict)
            self.restype_dict['CPR'] = self.restype_dict['PRO']
            self.restype_and_chi_and_state = np.asarray(
                t['restype_and_chi_and_state'])

        x = self.restype_and_chi_and_state
        chi1_state_ref = compute_chi1_state(x[:, 1])
        self.chi1_partition = {
            aa: [np.array(sorted(set(
                x[(x[:, 0] == self.restype_dict[aa]) &
                  (chi1_state_ref == j), -1].astype('i'))))
                for j in range(3)]
            for aa in sorted(self.restype_dict)}
        self.chi1_partition['CPR'] = self.chi1_partition['PRO']

    def predict_chi1(self, seq, residue, rotamer_posterior_prob):
        """seq: 3-letter sequence; residue: per-bead residue index;
        rotamer_posterior_prob: per-bead posterior marginal."""
        residue = np.asarray(residue)
        rotamer_posterior_prob = np.asarray(rotamer_posterior_prob)
        out = []
        for resnum, aa in enumerate(seq):
            if aa in ('ALA', 'GLY'):
                out.append(np.array([1.0, 0.0, 0.0]))
            else:
                probs = rotamer_posterior_prob[residue == resnum]
                out.append(np.array([probs[s].sum()
                                     for s in self.chi1_partition[aa]]))
        return np.array(out, dtype='f4')

    def compute_zero_one_stats(self, seq, chi1_prob, chi1_states):
        results = np.zeros((self.n_restype, 2), dtype='i8')
        for aa, p, state in zip(seq, chi1_prob, chi1_states):
            results[self.restype_dict[aa], 0] += int(np.argmax(p) == state)
            results[self.restype_dict[aa], 1] += 1
        return results


def predict_chi1_from_pdb(pdb_text, sidechain_param,
                          chains: Optional[list] = None):
    """Full pipeline; returns (chi1_prob (n_res,3), seq, chi_true,
    elapsed_seconds)."""
    import tempfile

    import jax.numpy as jnp

    from .config.builder import ConfigBuilder
    from .config.reader import load_system
    from .io.pdb import extract_initial_structure

    info = extract_initial_structure(pdb_text, chains=chains,
                                     allow_unexpected_breaks=True)
    b = ConfigBuilder(f">x\n{info['fasta']}\n", initial_pos=info['coords'])
    # mirror the reference predict_chi1 config flags (predict_chi1.py:83-94):
    # no basic springs, no backbone sterics, loose hbond criteria,
    # dynamic rotamer 1-body, tiny hbond energy
    b.add_rotamer_sidechains(sidechain_param, sidechain_param, damping=0.4,
                             dynamic_1body=True)
    b.add_hbond(hbond_energy=-1e-5, loose=True,
                coverage_library=sidechain_param)
    b.add_rotamer_node()
    with tempfile.NamedTemporaryFile(suffix='.up') as f:
        b.write(f.name)
        system, params, pos, aux = load_system(f.name)
        sc = system.by_name['placement_fixed_point_vector_only']
        residue = np.asarray(sc.consts['affine_residue'])

    t0 = time.time()
    sens = np.asarray(system.get_sens(jnp.asarray(pos), params,
                                      'hbond_coverage'))[:, 0]
    elapsed = time.time() - t0

    predictor = Chi1Predict(sidechain_param)
    chi1_prob = predictor.predict_chi1(info['sequence'], residue, sens)
    return chi1_prob, info, elapsed
