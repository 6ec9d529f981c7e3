"""qNEP (charge NEP) parity vs GPUMD training outputs committed in the
reference repo (reference tests/test_qnep.py): energies, forces, virials,
zero-mean charges, and Born effective charges for nep4_charge1 (full Ewald)
and nep4_charge2 (reciprocal-space only)."""

import os

import numpy as np
import pytest

from conftest import REF_INPUTS

pytestmark = pytest.mark.slow

QNEP_DIR = os.path.join(REF_INPUTS, "qnep")


@pytest.mark.parametrize("mode", ["mode1", "mode2"])
def test_qnep(mode):
    if not os.path.isdir(QNEP_DIR):
        pytest.skip("reference qnep inputs unavailable")
    from mdapy_tpu import NEP, XYZTrajectory

    path = os.path.join(QNEP_DIR, mode)
    nep = NEP(os.path.join(path, "nep.txt"))
    traj = XYZTrajectory(os.path.join(QNEP_DIR, "train.xyz"))

    e_m, f_m, v_m, charge_m, bec_m = [], [], [], [], []
    for system in traj:
        nep.calculate(system.data, system.box)
        e_m.append(nep.results["energies"].mean())
        f_m.append(nep.results["forces"])
        v_m.append(nep.results["virials"].mean(axis=0)[[0, 4, 8, 1, 5, 6]])
        charge_m.append(nep.results["charges"])
        bec_m.append(nep.results["bec"])

    e_m = np.array(e_m)
    f_m = np.concatenate(f_m)
    v_m = np.array(v_m)
    charge_m = np.concatenate(charge_m).flatten()
    bec_m = np.concatenate(bec_m)

    e_g = np.loadtxt(os.path.join(path, "energy_train.out"))[:, 0]
    f_g = np.loadtxt(os.path.join(path, "force_train.out"))[:, :3]
    v_g = np.loadtxt(os.path.join(path, "virial_train.out"))[:, :6]
    charge_g = np.loadtxt(os.path.join(path, "charge_train.out"))
    bec_g = np.loadtxt(os.path.join(path, "bec_train.out"))[:, :9]
    N = 384
    for i in range(len(traj)):
        charge_g[i * N : (i + 1) * N] -= charge_g[i * N : (i + 1) * N].mean()

    atol = 1e-4
    assert np.allclose(e_m, e_g, atol=atol), f"{mode} energy is wrong."
    assert np.allclose(f_m, f_g, atol=atol), f"{mode} force is wrong."
    assert np.allclose(v_m, v_g, atol=atol), f"{mode} virial is wrong."
    assert np.allclose(bec_m, bec_g, atol=atol), f"{mode} bec is wrong."
    assert np.allclose(charge_m, charge_g, atol=atol), f"{mode} charge is wrong."
