"""Canonical benchmark systems (BASELINE.json configs).

Builds the driver-defined benchmark configurations from the reference
parameter libraries when mounted (at /root/reference/parameters), with a
synthetic fallback so compile checks run anywhere.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from .config.builder import ConfigBuilder, uniform_rama_maps_from_reference
from .config.reader import load_system

PARAM_DIR = os.environ.get("UPSIDE_PARAM_DIR", "/root/reference/parameters")
RAMA_REF = f"{PARAM_DIR}/common/rama_reference.pkl"
SIDECHAIN = f"{PARAM_DIR}/ff_1/sidechain.h5"
SIDECHAIN_10A = f"{PARAM_DIR}/packing/sidechain_10A_cutoff.h5"
ENVIRONMENT = f"{PARAM_DIR}/ff_1/environment.h5"

TRP_CAGE = "NLYIQWLKDGGPSSGRPPPS"                       # 1L2Y, 20 res
UBIQUITIN = ("MQIFVKTLTGKTITLEVEPSDTIENVKAKIQDKEGIPPDQ"
             "QRLIFAGKQLEDGRTLSDYNIQKESTLHLVLRLRGG")     # 1UBQ, 76 res
PROTEIN_G = "MTYKLILNGKTLKGETTTEAVDAATAEKVFKQYANDNGVDGEWTYDDATKTFTVTE"
# horse cytochrome c, 104 res — the "~100-res protein" of BASELINE
# config 4 (64-replica Hamiltonian replica exchange)
CYT_C = ("GDVEKGKKIFVQKCAQCHTVEKGGKHKTGPNLHGLFGRKTGQAPGFTYTDANKNKGITW"
         "KEETLMEYLENPKKYIPGTKMIFAGIKKKTEREDLIAYLKKATNE")


def have_reference_params():
    return os.path.exists(SIDECHAIN) and os.path.exists(RAMA_REF)


def _rama_maps(n_res):
    if os.path.exists(RAMA_REF):
        return uniform_rama_maps_from_reference(n_res, RAMA_REF)
    rng = np.random.default_rng(0)
    base = 0.5 * rng.normal(size=(1, 72, 72))
    return np.tile(base, (n_res, 1, 1))


def build_backbone_system(seq=TRP_CAGE, hbond_energy=-2.1119, seed=1):
    """BASELINE config 1: constant-T backbone potential (bonds + Rama map +
    HBond + steric)."""
    b = ConfigBuilder(f">x\n{seq}\n", seed=seed)
    b.add_backbone_springs()
    b.add_rama_map_pot(_rama_maps(b.n_res))
    b.add_backbone_pairs()
    b.add_hbond(hbond_energy=hbond_energy)
    return _write_and_load(b)


def build_full_system(seq=UBIQUITIN, hbond_energy=-2.1119, seed=1,
                      sidechain_lib=None, environment_lib=None):
    """BASELINE config 2: full forcefield with rotamer BP sidechains,
    hbond coverage + hydrophobes, and the environment/burial chain."""
    sidechain_lib = sidechain_lib or SIDECHAIN
    environment_lib = environment_lib or ENVIRONMENT
    b = ConfigBuilder(f">x\n{seq}\n", seed=seed)
    b.add_backbone_springs()
    b.add_rama_map_pot(_rama_maps(b.n_res))
    b.add_backbone_pairs()
    # damping 0.1: solver schedule only (same fixed point as the reference
    # default 0.4) — measured uniformly faster to tol with lower maxima and
    # zero max_iter hits on all three BASELINE proteins, warm AND cold
    # starts (tools/bp_damping_exp.py, BENCH_NOTES.md)
    b.add_rotamer_sidechains(sidechain_lib, sidechain_lib, damping=0.1,
                             dynamic_1body=True)
    b.add_hbond(hbond_energy=hbond_energy, coverage_library=sidechain_lib)
    if os.path.exists(environment_lib):
        b.add_environment(environment_lib)
    b.add_rotamer_node()
    return _write_and_load(b)


def build_10A_system(seq=PROTEIN_G, seed=1):
    """BASELINE config 3: 10-Angstrom-cutoff parameter family (the
    reference needs a PARAM_10A_CUTOFF rebuild; here the knot family is
    inferred from the table shapes at runtime)."""
    return build_full_system(seq=seq, seed=seed,
                             sidechain_lib=SIDECHAIN_10A,
                             environment_lib=ENVIRONMENT)


def _write_and_load(builder):
    with tempfile.NamedTemporaryFile(suffix=".up", delete=False) as f:
        path = f.name
    builder.write(path)
    system, params, pos, aux = load_system(path)
    os.unlink(path)
    return system, params, pos, aux
