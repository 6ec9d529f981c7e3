"""Utility layer tests: EAMGenerator (ZJW04), PKA/velocities, split/pigz,
PCA/FPS, EOS/SFE, thermo reader, plotting."""

import gzip
import os

import numpy as np
import pytest

import mdapy_tpu as mp
from mdapy_tpu.core.box import Box


@pytest.fixture(scope="module")
def cu_eam(tmp_path_factory):
    out = tmp_path_factory.mktemp("zjw") / "Cu.eam.alloy"
    mp.EAMGenerator(["Cu"], str(out))
    return mp.EAM(str(out))


def test_eam_generator_zjw_cu(cu_eam, tmp_path):
    """Generated ZJW04 Cu reproduces the published cohesive energy and
    equilibrium lattice constant."""
    s = mp.build_crystal("Cu", "fcc", 3.615, nx=2, ny=2, nz=2)
    s.calc = cu_eam
    eos = mp.get_eos(s, 0.97, 1.03, 13)
    i = int(np.argmin(eos[:, 1]))
    a_eq = (eos[i, 0] * 4) ** (1 / 3)
    assert abs(eos[i, 1] + 3.54) < 0.02
    assert abs(a_eq - 3.615) < 0.01


def test_eam_generator_binary(tmp_path):
    out = tmp_path / "CuNi.eam.alloy"
    mp.EAMGenerator(["Cu", "Ni"], str(out))
    s = mp.build_hea(["Cu", "Ni"], [0.5, 0.5], "fcc", 3.56,
                     nx=2, ny=2, nz=2, random_seed=0)
    s.calc = mp.EAM(str(out))
    assert -5 < float(s.get_energies().mean()) < -3


def test_eam_generator_rejects_unknown():
    with pytest.raises(ValueError, match="not supported"):
        mp.EAMGenerator(["Xx"])


def test_sfe_fcc_cu(cu_eam):
    sfe = mp.get_sfe_fcc("Cu", 3.615, cu_eam)
    assert 20 < sfe < 80  # ZJW Cu intrinsic SFE ~ 40 mJ/m^2


def test_generate_velocity_temperature():
    v = mp.generate_velocity(20000, 63.55, 300.0, seed=1)
    KE_eV = 0.5 * 63.55 * (v ** 2).sum() * 103.642696
    T = KE_eV * 2 / (3 * 20000 * 8.617333e-5)
    assert abs(T - 300) < 10
    # COM momentum removed
    assert np.allclose(v.sum(axis=0), 0, atol=1e-9)


def test_set_pka():
    s = mp.build_crystal("Cu", "fcc", 3.615, nx=3, ny=3, nz=3)
    cols = {c: np.asarray(s.data[c]) for c in s.data.columns}
    cols["element"] = np.array(["Cu"] * s.N, object)
    vv = mp.generate_velocity(s.N, 63.546, 300, seed=0)
    cols["vx"], cols["vy"], cols["vz"] = vv[:, 0], vv[:, 1], vv[:, 2]
    s.update_data(cols)
    idx = mp.set_pka(s, energy=1000.0, direction=[1, 3, 5])
    vmag = np.linalg.norm(
        [s.data["vx"][idx], s.data["vy"][idx], s.data["vz"][idx]]
    )
    exp = np.sqrt(2 * 1000 / 63.546) / 10.18051
    assert abs(vmag - exp) < 0.02 * exp
    mom = (63.546 * np.column_stack(
        [s.data["vx"], s.data["vy"], s.data["vz"]])).sum(0)
    assert np.allclose(mom, 0, atol=1e-9)
    with pytest.raises(ValueError, match="out of bounds"):
        mp.set_pka(s, 100.0, [1, 0, 0], index=10 ** 6)


def test_split_xyz_and_pigz(tmp_path):
    xyz = tmp_path / "traj.xyz"
    frames = [mp.System(pos=np.random.rand(3, 3) * 4, box=Box(np.eye(3) * 4.0))
              for _ in range(4)]
    mp.Trajectory(systems=frames).save(str(xyz))
    mp.split_xyz(str(xyz), output_dir=str(tmp_path / "res"))
    files = sorted(os.listdir(tmp_path / "res"))
    assert len(files) == 4
    assert files[0].endswith(".000000.xyz")
    gz = mp.compress_file(str(xyz))
    assert gzip.open(gz, "rt").read() == open(xyz).read()
    with pytest.raises(ValueError, match="already"):
        mp.compress_file(gz)


def test_pca_and_fps():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 10)) @ np.diag([5, 3, 1] + [0.1] * 7)
    pca = mp.PCA(3)
    Y = pca.fit_transform(X)
    assert Y.shape == (200, 3)
    assert pca.explained_variance_ratio[0] > 0.5
    assert pca.explained_variance_ratio.sum() > 0.95
    idx = mp.fps_sample(10, X)
    assert len(set(idx.tolist())) == 10
    assert idx[0] == 0
    with pytest.raises(AssertionError):
        mp.fps_sample(500, X)


def test_rmse_and_read_thermo(tmp_path):
    assert mp.rmse(np.array([1.0, 2.0]), np.array([1.0, 4.0])) == np.sqrt(2.0)
    np.savetxt(tmp_path / "thermo.out", np.random.rand(5, 18))
    df = mp.read_thermo(str(tmp_path))
    assert list(df.columns)[:3] == ["T", "K", "U"]
    assert len(df) == 5


def test_plotset(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    fig, ax = mp.set_figure(figsize=(8, 6))
    ax.plot([1, 2], [3, 4])
    mp.save_figure(fig, str(tmp_path / "f.png"))
    assert (tmp_path / "f.png").exists()


def test_outcar_and_cfg_converters(tmp_path):
    # minimal synthetic single-point OUTCAR
    outcar = tmp_path / "OUTCAR"
    outcar.write_text(
        "POTCAR: PAW_PBE Cu 22Jun2005\n"
        "   number of ions     NIONS =      2\n"
        "   ions per type =   2\n"
        "   ISIF   =      2\n"
        "aborting loop because EDIFF is reached\n"
        " VOLUME and BASIS-vectors are now:\n"
        " dummy\n dummy\n dummy\n dummy\n"
        "     3.6 0.0 0.0\n     0.0 3.6 0.0\n     0.0 0.0 3.6\n"
        " FORCE on cell =-STRESS in cart. coord.  units (eV):\n"
        "  Total   1.0 1.0 1.0 0.0 0.0 0.0\n"
        " TOTAL-FORCE (eV/Angst)\n"
        " -----\n"
        " 0.0 0.0 0.0 0.1 0.2 0.3\n"
        " 1.8 1.8 1.8 -0.1 -0.2 -0.3\n"
        " -----\n"
        "  free  energy   TOTEN  =      -7.123456 eV\n"
    )
    data = mp.read_OUTCAR(str(outcar))
    assert data and data["Natom"] == 2
    assert data["energy"] == -7.123456
    assert data["symbols"] == ["Cu", "Cu"]
    out = tmp_path / "train.xyz"
    mp.outcar2xyz(str(outcar), str(out))
    traj = mp.Trajectory(str(out), verbose=False)
    assert traj[0].N == 2
    assert {"fx", "fy", "fz"} <= set(traj[0].data.columns)

    # minimal MTP cfg
    cfg = tmp_path / "a.cfg"
    cfg.write_text(
        "BEGIN_CFG\n Size\n    2\n Supercell\n"
        "  3.6 0 0\n  0 3.6 0\n  0 0 3.6\n"
        " AtomData:  id type cartes_x cartes_y cartes_z fx fy fz\n"
        "  1 0 0.0 0.0 0.0 0.1 0.2 0.3\n"
        "  2 0 1.8 1.8 1.8 -0.1 -0.2 -0.3\n"
        " Energy\n  -7.0\n PlusStress:  xx yy zz yz xz xy\n"
        "  1.0 1.0 1.0 0.0 0.0 0.0\nEND_CFG\n"
    )
    out2 = tmp_path / "cfg_train.xyz"
    mp.cfg2xyz(str(cfg), {0: "Cu"}, str(out2))
    traj = mp.Trajectory(str(out2), verbose=False)
    assert traj[0].N == 2
    assert list(np.asarray(traj[0].data["element"])) == ["Cu", "Cu"]


def test_pigz_honors_thread_knob(tmp_path, monkeypatch):
    # The parallel path (>5 MB) must resolve workers through get_num_threads()
    # rather than raw os.cpu_count() (reference parallel.py governs all
    # host-side parallelism through the one MDAPY_NUM_THREADS knob).
    import mdapy_tpu.utils.pigz as pigz_mod

    monkeypatch.setenv("MDAPY_NUM_THREADS", "1")
    seen = {}
    real = pigz_mod.ProcessPoolExecutor

    class SpyPool(real):
        def __init__(self, max_workers=None, **kw):
            seen["workers"] = max_workers
            super().__init__(max_workers=max_workers, **kw)

    monkeypatch.setattr(pigz_mod, "ProcessPoolExecutor", SpyPool)
    big = tmp_path / "big.txt"
    big.write_bytes(b"0123456789abcdef" * (6 * 1024 * 1024 // 16))
    gz = mp.compress_file(str(big))
    assert seen["workers"] == 1
    assert gzip.open(gz, "rb").read() == big.read_bytes()
