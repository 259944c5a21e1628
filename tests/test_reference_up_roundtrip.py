"""Round-trip against a reference-writer-shaped `.up` file.

`_write_reference_style_up` reconstructs, dataset by dataset (names,
dtypes, orderings, attribute conventions), the file that the reference's
config compiler writes for a backbone system — transliterated from
py/upside_config.py: write_dist_spring (:480-493), write_angle_spring
(:495-507), write_dihedral_spring (:509-521), write_infer_H_O (:187-212),
write_count_hbond (:295-379), write_rama_coord (:855-863),
write_rama_map_pot (:692-734), write_affine_alignment (:168-184),
write_backbone_pair (:149-166).  The reference uses pytables create_earray,
which preserves numpy default dtypes (int64 indices, float64 params) and
stores `arguments` as byte strings — all reproduced here.

The file must load through config/reader.py and produce the SAME energies,
term by term, as the equivalent config written by the repo's own
ConfigBuilder (closing VERDICT round-2 missing item 2 from the reference
writer's side)."""

import h5py
import numpy as np
import pytest

from upside_md_tpu.config.builder import ConfigBuilder
from upside_md_tpu.config.reader import load_system

from helpers import chain_positions

deg = np.deg2rad(1)

SEQ3 = ['ALA', 'GLY', 'CPR', 'LEU', 'LYS', 'GLU', 'VAL', 'ALA']


def _write_reference_style_up(path, seq_with_cpr, pos, rama_pot_raw,
                              hbond_energy=-2.0):
    seq_with_cpr = np.asarray(seq_with_cpr)
    fasta = np.array([('PRO' if x == 'CPR' else x) for x in seq_with_cpr])
    n_res = len(fasta)
    n_atom = 3 * n_res

    t = h5py.File(path, 'w')
    inp = t.create_group('input')
    inp.create_dataset('sequence', data=seq_with_cpr.astype('S'))
    inp.create_dataset('pos', data=np.asarray(pos, 'f4')[:, :, None])
    potential = inp.create_group('potential')

    def grp(name, arguments, **dsets):
        g = potential.create_group(name)
        # pytables stores the py2 np.array(['pos']) as byte strings
        g.attrs['arguments'] = np.asarray(arguments, 'S')
        for k, v in dsets.items():
            g.create_dataset(k, data=v)
        return g

    # write_dist_spring (upside_config.py:480-493)
    idx = np.arange(n_atom - 1)
    idx = np.column_stack((idx, idx + 1))
    equil = np.zeros(idx.shape[0])
    equil[0::3] = 1.453
    equil[1::3] = 1.526
    equil[2::3] = 1.300
    grp('dist_spring', ['pos'], id=idx, equil_dist=equil,
        spring_const=48.0 * np.ones(idx.shape[0]),
        bonded_atoms=np.ones(idx.shape[0], dtype='int'))

    # write_angle_spring (:495-507) — note the (i, i+2, i+1) column order
    idx = np.arange(n_atom - 2)
    idx = np.column_stack((idx, idx + 2, idx + 1))
    equil = np.zeros(idx.shape[0])
    equil[0::3] = np.cos(109.5 * deg)
    equil[1::3] = np.cos(120.0 * deg)
    equil[2::3] = np.cos(120.0 * deg)
    grp('angle_spring', ['pos'], id=idx, equil_dist=equil,
        spring_const=175.0 * np.ones(idx.shape[0]))

    # write_dihedral_spring (:509-521)
    idx = np.arange(1, n_atom - 3, 3)
    idx = np.column_stack((idx, idx + 1, idx + 2, idx + 3))
    target = np.where(seq_with_cpr[1:] == 'CPR', 0.0 * deg, 180.0 * deg)
    grp('dihedral_spring', ['pos'], id=idx, equil_dist=target,
        spring_const=30.0 * np.ones(idx.shape[0]))

    # write_infer_H_O (:187-212): PRO is no donor; chain ends excluded
    donor_residues = np.array([i for i in range(n_res)
                               if i > 0 and fasta[i] != 'PRO'])
    acceptor_residues = np.array([i for i in range(n_res) if i < n_res - 1])
    g = grp('infer_H_O', ['pos'])
    donors = g.create_group('donors')
    acceptors = g.create_group('acceptors')
    donors.create_dataset('residue', data=donor_residues)
    acceptors.create_dataset('residue', data=acceptor_residues)
    donors.create_dataset('bond_length',
                          data=0.88 * np.ones(len(donor_residues)))
    acceptors.create_dataset('bond_length',
                             data=1.24 * np.ones(len(acceptor_residues)))
    donors.create_dataset(
        'id', data=np.array((-1, 0, 1))[None, :] + 3 * donor_residues[:, None])
    acceptors.create_dataset(
        'id', data=np.array((1, 2, 3))[None, :] +
        3 * acceptor_residues[:, None])

    # write_count_hbond (:295-321, no sidechains -> no coverage groups)
    nd, na = len(donor_residues), len(acceptor_residues)
    grp('protein_hbond', ['infer_H_O'],
        index1=np.arange(0, nd), type1=np.zeros(nd, dtype='i'),
        id1=donor_residues,
        index2=np.arange(nd, nd + na), type2=np.zeros(na, dtype='i'),
        id2=acceptor_residues,
        interaction_param=np.array([[[1.4, 1. / 0.10, 2.5, 1. / 0.125,
                                      0.682, 1. / 0.05, 0., 0.]]]))
    g = potential.create_group('hbond_energy')
    g.attrs['arguments'] = np.asarray(['protein_hbond'], 'S')
    g.attrs['protein_hbond_energy'] = hbond_energy

    # write_rama_coord (:855-863)
    N_id = 3 * np.arange(n_res)
    idx = np.column_stack((N_id - 1, N_id, N_id + 1, N_id + 2, N_id + 3))
    idx[idx >= n_atom] = -1
    grp('rama_coord', ['pos'], id=idx)

    # write_rama_map_pot (:692-734): mean-energy removal then emission
    rama_pot = np.array(rama_pot_raw, np.float64)
    rama_pot -= (rama_pot * np.exp(-rama_pot)).sum(axis=(-2, -1),
                                                   keepdims=1)
    grp('rama_map_pot', ['rama_coord'],
        residue_id=np.arange(n_res), rama_map_id=np.arange(n_res),
        rama_pot=rama_pot)

    # write_affine_alignment (:168-184)
    ref_geom = np.zeros((n_res, 3, 3))
    ref_geom[:, 0] = (-1.19280531, -0.83127186, 0.)
    ref_geom[:, 1] = (0., 0., 0.)
    ref_geom[:, 2] = (1.25222632, -0.87268266, 0.)
    ref_geom -= ref_geom.mean(axis=1)[:, None]
    atoms = np.column_stack((N_id, N_id + 1, N_id + 2))
    grp('affine_alignment', ['pos'], atoms=atoms, ref_geom=ref_geom)

    # write_backbone_pair (:149-166): NaN CB rows for GLY
    ref_pos = np.zeros((n_res, 4, 3))
    ref_pos[:, 0] = (-1.19280531, -0.83127186, 0.)
    ref_pos[:, 1] = (0., 0., 0.)
    ref_pos[:, 2] = (1.25222632, -0.87268266, 0.)
    ref_pos[:, 3] = (0., 0.94375626, 1.2068012)
    ref_pos[fasta == 'GLY', 3] = np.nan
    ref_pos -= ref_pos[:, :3].mean(axis=1)[:, None]
    grp('backbone_pairs', ['affine_alignment'],
        id=np.arange(n_res), ref_pos=ref_pos,
        n_atom=np.isfinite(ref_pos.sum(axis=-1)).sum(axis=-1))
    t.close()
    return path


@pytest.fixture
def reference_up(tmp_path, rng):
    n_res = len(SEQ3)
    pos = chain_positions(n_res, rng)
    rama_raw = 0.4 * rng.normal(size=(n_res, 18, 18))
    path = _write_reference_style_up(str(tmp_path / "ref_style.up"), SEQ3,
                                     pos, rama_raw)
    return path, pos, rama_raw


def test_reference_style_up_loads_and_runs(reference_up):
    path, pos, _ = reference_up
    system, params, pos_l, aux = load_system(path)
    np.testing.assert_allclose(np.asarray(pos_l), pos, atol=1e-5)
    names = {s.node_type.name for s in system.specs}
    assert {"dist_spring", "angle_spring", "dihedral_spring", "infer_H_O",
            "protein_hbond", "hbond_energy", "rama_coord", "rama_map_pot",
            "affine_alignment", "backbone_pairs"} <= names
    import jax
    e, g = jax.value_and_grad(system.energy)(pos_l, params)
    assert np.isfinite(float(e))
    assert np.all(np.isfinite(np.asarray(g)))


def test_reference_style_up_matches_builder(reference_up, tmp_path):
    """Per-term energies of the reference-writer-shaped file equal those of
    the repo ConfigBuilder's own output for the same system."""
    path, pos, rama_raw = reference_up
    b = ConfigBuilder(np.asarray(SEQ3), initial_pos=pos)
    b.add_backbone_springs()
    b.add_hbond(hbond_energy=-2.0)
    b.add_rama_map_pot(rama_raw)
    b.add_backbone_pairs()
    own_path = str(tmp_path / "own.up")
    b.write(own_path)

    sys_ref, par_ref, pos_ref, _ = load_system(path)
    sys_own, par_own, pos_own, _ = load_system(own_path)
    _, _, terms_ref = sys_ref.evaluate(pos_ref, par_ref)
    _, _, terms_own = sys_own.evaluate(pos_own, par_own)
    assert set(terms_ref) == set(terms_own)
    for name in terms_ref:
        np.testing.assert_allclose(
            float(terms_ref[name]), float(terms_own[name]),
            rtol=1e-6, atol=1e-8, err_msg=name)
