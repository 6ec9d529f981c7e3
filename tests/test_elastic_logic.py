"""Logic-level tests for the finite-T / quasi-harmonic elastic pipelines.

LAMMPS and phonopy are absent in this environment; these tests exercise the
math the drivers assemble — strain modes, central-difference Cij assembly,
kappa->Cij inversion, V(T) + curvature interpolation — the way the
reference's test_md_elastic / test_qha_elastic cover the same pipelines.
"""

import numpy as np
import pytest

from mdapy_tpu.potentials.md_elastic import (
    MDElasticResult, assemble_elastic_tensor, fanout,
)
from mdapy_tpu.potentials.qha_elastic import (
    CUBIC_STRAIN_MODES, HEXAGONAL_STRAIN_MODES, QHAElastic,
    _build_cij_matrix, _cubic_kappa_to_cij, _hexagonal_kappa_to_cij,
    _voigt_to_tensor, EV_A3_TO_GPA,
)
import mdapy_tpu as mp


# --------------------------------------------------------- md_elastic math
def _cubic_C(c11, c12, c44):
    C = np.zeros((6, 6))
    C[:3, :3] = c12
    np.fill_diagonal(C[:3, :3], c11)
    C[3, 3] = C[4, 4] = C[5, 5] = c44
    return C


def test_assemble_elastic_tensor_roundtrip():
    """Synthetic linear-elastic stresses must reproduce the input C."""
    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6))
    C_true = A @ A.T + 50 * np.eye(6)  # SPD, symmetric
    delta = 0.015
    s_ref = rng.standard_normal(6) * 0.01
    s_plus = np.zeros((6, 6))
    s_minus = np.zeros((6, 6))
    for d in range(6):
        eps = np.zeros(6)
        eps[d] = delta
        s_plus[d] = s_ref - C_true @ eps
        eps[d] = -delta
        s_minus[d] = s_ref - C_true @ eps
    C = assemble_elastic_tensor(s_plus, s_minus, delta)
    np.testing.assert_allclose(C, C_true, atol=1e-9)


def test_md_elastic_result_cubic_averages_and_vrh():
    C = _cubic_C(250.0, 160.0, 120.0)
    res = MDElasticResult(C, np.zeros(6), 1000.0, 300.0, 300.0, "isothermal")
    c11, c12, c44 = res.cubic_average()
    assert np.isclose(c11, 250.0) and np.isclose(c12, 160.0)
    assert np.isclose(c44, 120.0)
    vrh = res.vrh()
    # bulk modulus of a cubic crystal: (C11 + 2 C12)/3, exact in V and R
    assert np.isclose(vrh["K"], (250.0 + 2 * 160.0) / 3.0, rtol=1e-6)
    assert vrh["GV"] >= vrh["G"] >= vrh["GR"] > 0
    assert 0 < vrh["nu"] < 0.5 and vrh["E"] > 0
    assert res.born_stable_cubic()
    unstable = MDElasticResult(_cubic_C(100.0, 120.0, 50.0), np.zeros(6),
                               1.0, 0.0, 0.0, "isothermal")
    assert not unstable.born_stable_cubic()


def _square(x):
    return x * x


def test_fanout_pool_matches_inline():
    jobs = list(range(7))
    assert fanout(_square, jobs, 1) == [x * x for x in jobs]
    assert fanout(_square, jobs, 3) == [x * x for x in jobs]


# --------------------------------------------------------- qha_elastic math
def test_kappa_cij_inversions_roundtrip():
    # cubic: kappa defined by k0=C11-C12, k1=1.5(C11+2C12), k2=1.5 C44
    c11, c12, c44 = 240.0, 130.0, 110.0
    kappa = (c11 - c12, 1.5 * (c11 + 2 * c12), 1.5 * c44)
    np.testing.assert_allclose(_cubic_kappa_to_cij(kappa), (c11, c12, c44))
    C = _build_cij_matrix("cubic", kappa)
    assert np.isclose(C[0, 0], c11) and np.isclose(C[3, 3], c44)
    # hexagonal
    c11, c12, c13, c33, c44 = 180.0, 80.0, 60.0, 200.0, 50.0
    kappa = (c11 + c12, 0.25 * (c11 - c12), 0.5 * c33, c44,
             2 * c13 + (c11 + c12) + 0.5 * c33)
    np.testing.assert_allclose(
        _hexagonal_kappa_to_cij(kappa), (c11, c12, c13, c33, c44)
    )
    C = _build_cij_matrix("hexagonal", kappa)
    assert np.isclose(C[5, 5], 0.5 * (c11 - c12))


def test_voigt_strain_tensor_convention():
    v = np.array([0.01, 0.02, 0.03, 0.04, 0.05, 0.06])
    t = _voigt_to_tensor(v)
    assert np.allclose(t, t.T)
    np.testing.assert_allclose(np.diag(t), v[:3])
    assert np.isclose(t[1, 2], v[3] / 2)  # engineering shear halved


def test_qha_compute_recovers_cij_from_synthetic_free_energy():
    """Monkeypatch the phonopy free-energy stage with an analytic quadratic
    F(cell) and check the full compute() pipeline (per-mode curvature fits,
    V(T) minimisation, kappa interpolation) returns the planted Cij."""
    s = mp.build_crystal("Cu", "fcc", 3.615)
    qha = QHAElastic(
        s, calc=None, crystal_class="cubic",
        t_min=100.0, t_max=300.0, t_step=200.0,
        volume_strains=[-0.01, 0.0, 0.01],
        strain_values=[-0.01, 0.0, 0.01],
    )
    c11, c12, c44 = 220.0, 140.0, 100.0
    C_true = _cubic_C(c11, c12, c44) / EV_A3_TO_GPA  # eV/A^3
    V0 = abs(np.linalg.det(s.box.matrix))

    def fake_free_energies():
        out = np.zeros((len(qha.unique_cells), len(qha.temperatures)))
        for ci, uc in enumerate(qha.unique_cells):
            V = V0 * (1.0 + uc["volume_strain"])
            mode = (np.zeros(6) if uc["mode"] < 0
                    else np.asarray(qha.modes[uc["mode"]], float))
            eps = mode * uc["eps"]
            elastic = 0.5 * V * eps @ C_true @ eps
            for ti, T in enumerate(qha.temperatures):
                # volume term with a T-dependent minimum (thermal expansion)
                Vmin = V0 * (1.0 + 2e-5 * T)
                out[ci, ti] = elastic + 1e-3 * (V - Vmin) ** 2
        return out

    qha._free_energies = fake_free_energies
    df = qha.compute()
    np.testing.assert_allclose(df["C11"], c11, rtol=1e-4)
    np.testing.assert_allclose(df["C12"], c12, rtol=1e-4)
    np.testing.assert_allclose(df["C44"], c44, rtol=1e-4)
    # V(T) must track the planted thermal expansion
    v100 = df.loc[df["T"] == 100.0, "V"].iloc[0]
    v300 = df.loc[df["T"] == 300.0, "V"].iloc[0]
    assert v300 > v100
    np.testing.assert_allclose(v300, V0 * (1.0 + 2e-5 * 300.0), rtol=1e-4)


def test_qha_strain_mode_tables():
    assert len(CUBIC_STRAIN_MODES) == 3
    assert len(HEXAGONAL_STRAIN_MODES) == 5
    # cubic modes probe C11-C12, bulk, and C44 channels independently
    k = [m @ _cubic_C(1.0, 0.0, 0.0) @ m for m in CUBIC_STRAIN_MODES]
    assert k[2] == 0.0  # pure shear mode has no C11 content
