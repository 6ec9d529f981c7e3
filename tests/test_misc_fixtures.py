"""Golden-fixture parity for the remaining analysis capabilities (SURVEY.md
Appendix C): RDF (+streaming kernel equivalence), ADF, bond analysis,
average-by-neighbor, Warren-Cowley, lindemann, void counting, chemical
species, atomic temperature, and S(k) rdf-mode invariants.

Expected values come from the reference repo's committed fixtures
(tests/fixtures/misc/*.npz, generated from OVITO/freud) and the reference
tests' hard-coded constants (e.g. test_warren_cowley_parameter.py:12-21,
test_atomic_temperature.py:16)."""

import os

import numpy as np
import pytest

from conftest import REF_FIXTURES, REF_INPUTS, input_path, load_fixture

import mdapy_tpu as mp


def _need_inputs():
    if not os.path.isdir(REF_INPUTS):
        pytest.skip("reference input files unavailable")


# ---------------------------------------------------------------- RDF
def test_rdf_fixture_partials():
    data = load_fixture("misc", "rdf")
    _need_inputs()
    system = mp.System(input_path("AlCrNi.xyz"))
    rdf = system.cal_radial_distribution_function(
        float(data["cutoff"]), int(data["nbins"])
    )
    elements = list(data["elements"])
    g_ref = data["g"]
    for i in range(len(elements)):
        for j in range(i, len(elements)):
            np.testing.assert_allclose(
                rdf.g_partial[(elements[i], elements[j])], g_ref[i, j],
                atol=1e-6, err_msg=f"{elements[i]}-{elements[j]} RDF differs",
            )


def test_rdf_streaming_matches_verlet_on_fixture():
    data = load_fixture("misc", "rdf")
    _need_inputs()
    system = mp.System(input_path("AlCrNi.xyz"))
    rc, nbin = float(data["cutoff"]), int(data["nbins"])
    rdf_v = system.cal_radial_distribution_function(rc, nbin, streaming=False)
    rdf_s = system.cal_radial_distribution_function(rc, nbin, streaming=True)
    for key in rdf_v.g_partial:
        np.testing.assert_allclose(
            rdf_s.g_partial[key], rdf_v.g_partial[key], atol=1e-9,
            err_msg=f"streaming vs verlet mismatch at pair {key}",
        )


def test_rdf_streaming_matches_verlet_pure_fcc():
    sys_ = mp.build_crystal("Cu", "fcc", 3.615, nx=8, ny=8, nz=8)
    rdf_v = sys_.cal_radial_distribution_function(6.0, 100, streaming=False)
    rdf_s = sys_.cal_radial_distribution_function(6.0, 100, streaming=True)
    np.testing.assert_allclose(rdf_v.g_total, rdf_s.g_total, atol=1e-12)


def test_rdf_streaming_multi_element_partials():
    hea = mp.build_hea(
        ("Al", "Cu", "Ni"), (0.34, 0.33, 0.33), "fcc",
        a=3.7, nx=6, ny=6, nz=6, random_seed=42,
    )
    rdf_v = hea.cal_radial_distribution_function(5.0, 80, streaming=False)
    rdf_s = hea.cal_radial_distribution_function(5.0, 80, streaming=True)
    for key in rdf_v.g_partial:
        np.testing.assert_allclose(
            rdf_s.g_partial[key], rdf_v.g_partial[key], atol=1e-12,
            err_msg=f"partial {key} mismatch",
        )


def test_rdf_streaming_large_cutoff():
    """rc near L/2 without a Verlet list — exercises the streaming kernel's
    reason for existing. g(r) must oscillate around 1 at large r."""
    sys_ = mp.build_crystal("Cu", "fcc", 3.615, nx=12, ny=12, nz=12)
    L = 12 * 3.615
    rdf = sys_.cal_radial_distribution_function(L / 2 - 0.1, 200, streaming=True)
    tail = rdf.g_total[150:]
    assert 0.5 < tail.mean() < 1.5
    assert rdf.g_total[:5].max() == 0.0  # no pairs below first-neighbor shell


# ---------------------------------------------------------------- ADF
# mdapy triplet notation "A-B-C" = central A with B/C arms; OVITO's fixture
# names put the central atom in the middle (reference
# test_angular_distribution_function.py:13-21).
_ADF_DICT_ORDER = ["O-H-H", "O-O-H", "H-H-H", "H-O-O", "O-O-O", "H-O-H"]
_IDX_TO_OVITO = {0: "H-O-H", 1: "O-O-H", 2: "H-H-H",
                 3: "O-H-O", 4: "O-O-O", 5: "O-H-H"}


def test_adf_fixture():
    data = load_fixture("misc", "adf")
    _need_inputs()
    system = mp.System(input_path("water.xyz"))
    adf = system.cal_angular_distribution_function(
        {k: [0, 2.0, 0, 2.0] for k in _ADF_DICT_ORDER}, int(data["bins"])
    )
    for idx, name in _IDX_TO_OVITO.items():
        key = f"adf_{name.replace('-', '_')}"
        if key in data.files:
            np.testing.assert_allclose(
                adf.bond_angle_distribution[idx], data[key], atol=1e-6,
                err_msg=f"{name} ADF differs",
            )


# ---------------------------------------------------------------- bonds
def test_bond_analysis_fixture():
    data = load_fixture("misc", "bond_analysis")
    _need_inputs()
    system = mp.System(input_path("water.xyz"))
    bo = system.cal_bond_analysis(
        float(data["cutoff"]), int(data["bins"]), max_neigh=int(data["max_neigh"])
    )
    np.testing.assert_allclose(bo.r_length, data["r_length"], atol=1e-6)
    np.testing.assert_allclose(
        bo.bond_length_distribution, data["bond_length_distribution"], atol=1e-6
    )
    np.testing.assert_allclose(bo.r_angle, data["r_angle"], atol=1e-6)
    np.testing.assert_allclose(
        bo.bond_angle_distribution, data["bond_angle_distribution"], atol=1e-6
    )


# ------------------------------------------------------- average_by_neighbor
@pytest.mark.parametrize("name", ["rec_box_big", "tri_box_big"])
def test_average_neighbor_fixture(name):
    data = load_fixture("misc", "average_neighbor")
    _need_inputs()
    rc = float(data[f"{name}__cutoff"])
    expected = data[f"{name}__x_ave"]
    system = mp.System(input_path(f"{name}.xyz"))
    got = system.average_by_neighbor(rc, "x", include_self=True)
    np.testing.assert_allclose(got, expected, atol=1e-6)
    np.testing.assert_allclose(system.data["x_ave"], expected, atol=1e-6)


# ---------------------------------------------------------------- WCP
def test_warren_cowley_fixture():
    _need_inputs()
    fcc = mp.System(input_path("CoCuFeNiPd-4M.dump"))
    wcp = fcc.cal_warren_cowley_parameter(rc=3.0)
    expected = np.array(
        [
            [-1.39, 0.64, 0.39, -0.3, 0.66],
            [0.64, -1.94, 0.58, 0.51, 0.2],
            [0.39, 0.58, -0.56, 0.63, -1.04],
            [-0.3, 0.51, 0.63, -1.69, 0.85],
            [0.66, 0.2, -1.04, 0.85, -0.67],
        ]
    )
    np.testing.assert_allclose(wcp.WCP.round(2), expected)


# ------------------------------------------------------------- lindemann
def test_lindemann_global_equals_per_atom():
    rng = np.random.default_rng(7)
    pos_list = np.cumsum(
        rng.choice([-1.0, 0.0, 1.0], size=(120, 300, 3)), axis=0
    )
    g = mp.LindemannParameter(pos_list, only_global=True)
    g.compute()
    l = mp.LindemannParameter(pos_list)
    l.compute()
    assert np.isclose(g.lindemann_trj, l.lindemann_trj)


# ------------------------------------------------------------- void
def test_void_analysis_counts_three_voids():
    fcc = mp.build_crystal("Al", "fcc", 4.05, nx=50, ny=50, nz=50)
    d = fcc.data
    x, y, z = d["x"], d["y"], d["z"]
    keep = (
        ((x - 50) ** 2 + (y - 50) ** 2 + (z - 50) ** 2 > 100)
        & ((x - 100) ** 2 + (y - 100) ** 2 + (z - 100) ** 2 > 100)
        & ((x - 150) ** 2 + (y - 150) ** 2 + (z - 150) ** 2 > 400)
    )
    fcc.update_data(d.filter(keep))
    void = mp.VoidAnalysis(fcc, 4.1)
    void.compute()
    assert void.void_number == 3
    assert void.void_volume > 0


# ------------------------------------------------------ chemical species
def test_chemical_species_water():
    _need_inputs()
    system = mp.System(input_path("water.xyz"))
    res = system.cal_chemical_species(
        search_species=["H2O"], scale=0.4, add_mol_id=True
    )
    assert res["H2O"] * 3 == system.N
    mol_id = np.asarray(system.data["mol_id"])
    assert (mol_id != -1).all()
    assert mol_id.sum() == 0


# --------------------------------------------------- atomic temperature
def test_atomic_temperature_small_system_selfconsistent():
    """Fast-tier variant: Maxwell velocities at 300 K must average back to
    ~300 K through the neighborhood-averaged kinetic-temperature kernel."""
    from mdapy_tpu.utils.tool_function import generate_velocity
    from mdapy_tpu.core.elements import atomic_masses, atomic_numbers

    fcc = mp.build_crystal("Cu", "fcc", 3.615, nx=6, ny=6, nz=6)
    vel = generate_velocity(
        fcc.N, atomic_masses[atomic_numbers["Cu"]], 300, seed=1
    )
    fcc.update_data(
        fcc.data.with_columns(vx=vel[:, 0], vy=vel[:, 1], vz=vel[:, 2])
    )
    fcc.cal_atomic_temperature(6.0)
    temp = np.asarray(fcc.data["atomic_temp"])
    assert abs(temp.mean() - 300.0) / 300.0 < 0.05
    assert (temp > 0).all()


@pytest.mark.slow
def test_atomic_temperature_reference_constant():
    from mdapy_tpu.utils.tool_function import generate_velocity
    from mdapy_tpu.core.elements import atomic_masses, atomic_numbers

    fcc = mp.build_crystal("Cu", "fcc", 3.615, nx=30, ny=30, nz=30)
    vel = generate_velocity(
        fcc.N, atomic_masses[atomic_numbers["Cu"]], 300, seed=1
    )
    fcc.update_data(
        fcc.data.with_columns(vx=vel[:, 0], vy=vel[:, 1], vz=vel[:, 2])
    )
    fcc.cal_atomic_temperature(10.0)
    # constant from reference test_atomic_temperature.py:16 (same seed,
    # same np.random stream, same kernel semantics)
    assert np.allclose(
        np.asarray(fcc.data["atomic_temp"]).mean(), 298.74971909939046
    )


# ------------------------------------------------- S(k) rdf-mode invariants
def _two_atom_system(r0, L=20.0):
    pos = np.array([[0.0, 0.0, 0.0], [r0, 0.0, 0.0]])
    return mp.System(pos=pos, box=[L, L, L], element_list=["Cu", "Cu"])


def test_sk_rdf_mode_two_atoms_matches_analytic():
    r0 = 2.0
    sys_ = _two_atom_system(r0)
    sfc = sys_.cal_structure_factor(0.5, 6.0, 50, mode="rdf", nbin_rdf=4000)
    k = sfc.k
    np.testing.assert_allclose(sfc.Sk, 1.0 + np.sin(k * r0) / (k * r0), atol=0.1)


def test_sk_partial_faber_ziman_total_relation():
    hea = mp.build_hea(
        ("Al", "Cu"), (0.5, 0.5), "fcc", a=3.7, nx=4, ny=4, nz=4, random_seed=1
    )
    sfc = hea.cal_structure_factor(
        0.5, 8.0, 60, cal_partial=True, mode="debye", nbin_rdf=200
    )
    keys = set(sfc.Sk_partial.keys())
    assert keys == {("Al", "Al"), ("Al", "Cu"), ("Cu", "Cu")}
    expected = (
        0.25 * sfc.Sk_partial[("Al", "Al")]
        + 0.5 * sfc.Sk_partial[("Al", "Cu")]
        + 0.25 * sfc.Sk_partial[("Cu", "Cu")]
    )
    np.testing.assert_allclose(sfc.Sk, expected, atol=1e-12)


# --------------------------------------------------- adaptive CNA invariants
def test_cna_adaptive_perfect_crystals():
    """Adaptive (cutoff-free) CNA: perfect lattices classify uniformly
    (reference test_common_neighbor_analysis.py self-invariants)."""
    fcc = mp.build_crystal("Al", "fcc", 4.05, nx=4, ny=4, nz=4)
    fcc.cal_common_neighbor_analysis()
    assert (np.asarray(fcc.data["cna"]) == 1).all()
    bcc = mp.build_crystal("Fe", "bcc", 2.86, nx=4, ny=4, nz=4)
    bcc.cal_common_neighbor_analysis()
    assert (np.asarray(bcc.data["cna"]) == 3).all()
    hcp = mp.build_crystal("Mg", "hcp", 3.21, nx=4, ny=4, nz=4)
    hcp.cal_common_neighbor_analysis()
    assert (np.asarray(hcp.data["cna"]) == 2).all()


# ------------------------------------------------------- spatial binning
def test_spatial_binning_analytic():
    """1-D and 2-D binning with analytic expectations (reference
    spatial_binning.py:10-236 semantics: bin width, mean/sum/count ops)."""
    from mdapy_tpu.analysis.spatial_binning import SpatialBinning
    from mdapy_tpu.core.box import Box

    # 4 atoms on a line, one per 5-wide bin in x
    data = {
        "x": np.array([1.0, 6.0, 11.0, 16.0]),
        "y": np.full(4, 2.0),
        "z": np.full(4, 2.0),
        "mass": np.array([1.0, 2.0, 3.0, 4.0]),
    }
    box = Box([20.0, 4.0, 4.0])
    sb = SpatialBinning(data, box, "x", bin_width=5.0)
    sb.compute(["mass", "mass"], ["sum", "count"])
    np.testing.assert_allclose(sb.result["mass_sum"], [1, 2, 3, 4])
    np.testing.assert_allclose(sb.result["mass_count"], [1, 1, 1, 1])

    # 2-D xy binning: mean of a property constant per quadrant
    rng = np.random.default_rng(5)
    n = 400
    d2 = {
        "x": rng.uniform(0, 10, n),
        "y": rng.uniform(0, 10, n),
        "z": rng.uniform(0, 10, n),
    }
    d2["q"] = np.where(d2["x"] < 5, 1.0, 2.0) * np.where(d2["y"] < 5, 1.0, 3.0)
    sb2 = SpatialBinning(d2, Box([10.0, 10.0, 10.0]), "xy", bin_width=5.0)
    sb2.compute("q", "mean")
    np.testing.assert_allclose(
        sb2.result["q_mean"], [[1.0, 3.0], [2.0, 6.0]]
    )
