"""Potential-development tooling.

Parity: reference potential_tool.py — RMSE, GPUMD thermo reader, NEP
training plots, FCC stacking-fault energies, equation of state, PCA,
farthest-point sampling, and MTP-cfg / VASP-OUTCAR -> extended-XYZ
converters for GPUMD training sets.
"""

from __future__ import annotations

import os
import re
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np

__all__ = [
    "rmse", "read_thermo", "plot_nep_train", "get_sfe_fcc",
    "get_average_sfe_fcc_hea", "get_eos", "PCA", "fps_sample", "cfg2xyz",
    "read_OUTCAR", "outcar2xyz", "outcars2xyz", "run_gpumd",
]

_THERMO_COLS = "T K U Pxx Pyy Pzz Pyz Pxz Pxy ax ay az bx by bz cx cy cz".split()


def rmse(predictions: np.ndarray, targets: np.ndarray) -> float:
    return float(np.sqrt(((np.asarray(predictions) - np.asarray(targets)) ** 2).mean()))


def read_thermo(path: str):
    """GPUMD thermo.out -> pandas DataFrame with the 18 canonical columns."""
    import pandas as pd

    arr = np.loadtxt(Path(path, "thermo.out"))
    return pd.DataFrame(np.atleast_2d(arr), columns=_THERMO_COLS)


def run_gpumd(path: str, gpumd_exe: str = "gpumd"):
    """Run GPUMD in ``path`` (requires the external gpumd binary)."""
    return subprocess.run([gpumd_exe], cwd=path, check=True)


def plot_nep_train(path: str, outname: Optional[str] = None,
                   figdpi: int = 300, **kargs):
    """2x2 panel: energy / force / stress parity scatter + loss curves."""
    from .plotset import save_figure, set_figure

    fig, axes = set_figure(figsize=(16, 14), figdpi=figdpi, nrow=2, ncol=2,
                           **kargs)
    loss = np.loadtxt(Path(path, "loss.out"))
    e_train = np.loadtxt(Path(path, "energy_train.out"))
    f_train = np.loadtxt(Path(path, "force_train.out"))
    s_train = np.loadtxt(Path(path, "stress_train.out"))

    x, y = e_train[:, 1], e_train[:, 0]
    axes[0][0].plot(x, y, "o", label=f"RMSE={rmse(x, y) * 1000:.1f} meV")
    axes[0][0].set_xlabel("DFT energy (eV/atom)")
    axes[0][0].set_ylabel("NEP energy (eV/atom)")
    x, y = f_train[:, 3:].flatten(), f_train[:, :3].flatten()
    axes[0][1].plot(x, y, "o",
                    label=f"RMSE={rmse(x, y) * 1000:.1f} meV/" + r"$\AA$")
    axes[0][1].set_xlabel(r"DFT force (eV/$\AA$)")
    axes[0][1].set_ylabel(r"NEP force (eV/$\AA$)")
    x, y = s_train[:, 6:].flatten(), s_train[:, :6].flatten()
    axes[1][0].plot(x, y, "o", label=f"RMSE={rmse(x, y):.2f} GPa")
    axes[1][0].set_xlabel("DFT stress (GPa)")
    axes[1][0].set_ylabel("NEP stress (GPa)")
    for i, lab in zip([1, 4, 5, 6], "Total E-train F-train V-train".split()):
        axes[1][1].plot(loss[:, 0], loss[:, i], label=lab)
    axes[1][1].set_xlabel("Generation")
    axes[1][1].set_ylabel("Loss")
    axes[1][1].set_xscale("log")
    axes[1][1].set_yscale("log")
    for i in (0, 1):
        for j in (0, 1):
            axes[i][j].legend()
            if i == 1 and j == 1:
                continue
            lo = min(axes[i][j].get_xlim()[0], axes[i][j].get_ylim()[0])
            hi = max(axes[i][j].get_xlim()[1], axes[i][j].get_ylim()[1])
            pad = 0.05 * abs(hi - lo)
            lim = [lo - pad, hi + pad]
            axes[i][j].plot(lim, lim, "grey")
            axes[i][j].set_xlim(lim)
            axes[i][j].set_ylim(lim)
    if outname is not None:
        save_figure(fig, outname)
    return fig, axes


def _sfe_of(system, calc, a: float) -> float:
    """Shift the top half of a (112)x(-110)x(111) slab by a/sqrt(6) and
    return the energy difference per fault area in mJ/m^2."""
    from ..core.box import Box

    system.calc = calc
    bnd = list(system.box.boundary)
    bnd[2] = 0
    system._box = Box(system.box.matrix, bnd, system.box.origin)
    e1 = system.get_energy()
    z = np.asarray(system.data["z"])
    LZ = z.max() - z.min()
    pos = system.pos
    pos[:, 0] = np.where(z > LZ / 2, pos[:, 0] + a / 6 ** 0.5, pos[:, 0])
    system.update_pos(pos)
    system.wrap_pos()
    system.calc.results = {}
    e2 = system.get_energy()
    area_factor = system.box.matrix[0, 0] * system.box.matrix[1, 1] / 16021.7662
    return (e2 - e1) / area_factor


def get_sfe_fcc(name: str, a: float, calc) -> float:
    """Intrinsic stacking fault energy of an FCC crystal, in mJ/m^2."""
    from ..build.lattice import build_crystal

    system = build_crystal(name, "fcc", a, nx=3, ny=3, nz=4,
                           miller1=[1, 1, 2], miller2=[1, -1, 0],
                           miller3=[1, 1, -1])
    return _sfe_of(system, calc, a)


def get_average_sfe_fcc_hea(N: int, element_list: List[str],
                            element_ratio: List[float], a: float,
                            calc) -> np.ndarray:
    """Running-average SFE over N random HEA samples -> (N-1, 2) array of
    [i, mean(sfe[:i])]."""
    from ..build.lattice import build_hea

    sfe = []
    for seed in range(1, N + 1):
        system = build_hea(element_list, element_ratio, "fcc", a,
                           nx=3, ny=3, nz=4, miller1=[1, 1, 2],
                           miller2=[1, -1, 0], miller3=[1, 1, -1],
                           random_seed=seed)
        sfe.append(_sfe_of(system, calc, a))
    return np.array([[i, np.mean(sfe[:i])] for i in range(1, len(sfe))])


def get_eos(system, scale_start: float, scale_end: float, num: int) -> np.ndarray:
    """Isotropic-scaling equation of state -> (num, 2) array of
    [volume/atom, energy/atom]."""
    assert 0 < scale_start < scale_end
    from ..core.system import System

    out = []
    for s in np.linspace(scale_start, scale_end, num):
        cols = {c: np.array(system.data[c], copy=True)
                for c in system.data.columns}
        for c in "xyz":
            cols[c] = cols[c] * s
        cur = System(data=cols, box=system.box.matrix * s,
                     boundary=system.box.boundary)
        cur.calc = system.calc
        cur.calc.results = {}
        out.append([abs(cur.box.volume) / cur.N, cur.get_energy() / cur.N])
    system.calc.results = {}
    return np.array(out)


class PCA:
    """Eigendecomposition PCA with sklearn-style deterministic signs."""

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.explained_variance = None
        self.explained_variance_ratio = None

    def fit_transform(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        Xc = X - X.mean(axis=0)
        evals, evecs = np.linalg.eigh(np.cov(Xc.T))
        order = np.argsort(evals)[::-1]
        evals, evecs = evals[order], evecs[:, order]
        comp = evecs[:, : self.n_components]
        self.explained_variance = evals[: self.n_components]
        self.explained_variance_ratio = evals[: self.n_components] / evals.sum()
        max_abs = np.argmax(np.abs(comp), axis=0)
        comp = comp * np.sign(comp[max_abs, np.arange(self.n_components)])
        return Xc @ comp


def fps_sample(n_sample: int, descriptors: np.ndarray,
               start_idx: int = 0) -> np.ndarray:
    """Farthest-point sampling of descriptor rows (active learning)."""
    descriptors = np.asarray(descriptors)
    assert descriptors.ndim == 2, "Only support 2-D ndarray."
    n_points = descriptors.shape[0]
    assert 0 < n_sample <= n_points
    assert 0 <= start_idx < n_points
    sampled = [start_idx]
    min_d = np.full(n_points, np.inf)
    cur = start_idx
    for _ in range(n_sample - 1):
        d = np.linalg.norm(descriptors - descriptors[cur], axis=1)
        min_d = np.minimum(min_d, d)
        cur = int(np.argmax(min_d))
        sampled.append(cur)
    return np.array(sampled, np.int32)


def cfg2xyz(file_list: Union[List[str], str], type_dict: Dict[int, str],
            output_name: str = "train.xyz", f_max: float = 25.0) -> None:
    """MTP cfg frames -> extended XYZ (energy/force/virial), filtering
    frames whose max |force| exceeds ``f_max``."""
    if isinstance(file_list, str):
        file_list = [file_list]
    with open(output_name, "a") as op:
        for cfg in file_list:
            with open(cfg) as fh:
                frames = fh.read().split("BEGIN_CFG")[1:]
            for frame in frames:
                lines = frame.split("\n")
                N = int(lines[2].strip())
                box = []
                for ln in lines[4:7]:
                    box.extend(ln.split())
                tpf = [ln.split()[1:] for ln in lines[8 : 8 + N]]
                forces = np.array(tpf)[:, -3:].astype(float)
                if np.abs(forces).max() > f_max:
                    continue
                energy = lines[8 + N + 1].strip()
                vxx, vyy, vzz, vyz, vxz, vxy = lines[8 + N + 3].strip().split()
                op.write(f"{N}\n")
                lat = " ".join(box)
                op.write(
                    f'Lattice="{lat}" energy={energy} '
                    f'virial="{vxx} {vxy} {vxz} {vxy} {vyy} {vyz} '
                    f'{vxz} {vyz} {vzz}" '
                    "properties=species:S:1:pos:R:3:force:R:3\n"
                )
                for row in tpf:
                    op.write(f"{type_dict[int(row[0])]} {' '.join(row[1:])}\n")


def read_OUTCAR(filename: str) -> Union[Dict, bool]:
    """Parse a single-point VASP OUTCAR; False if not converged."""
    data = {"Natom": None, "lattice": None, "energy": None,
            "pos_force": None, "symbols": None, "virial": None}
    with open(filename) as f:
        content = f.read()
    if "aborting loop because EDIFF is reached" not in content:
        return False
    lines_content = content.split("\n")
    pattern = (r"VOLUME and BASIS-vectors are now.*?\n"
               r"(.*?\n.*?\n.*?\n.*?\n.*?\n.*?\n.*?\n)")
    match = re.search(pattern, content, re.DOTALL)
    lattice = []
    for line in match.group(1).strip().split("\n")[-3:]:
        line = re.sub(r"(?<=\d)-", " -", line)
        lattice.extend(line.split()[:3])
    data["lattice"] = " ".join(lattice)

    has_virial = False
    ion_symbols: List[str] = []
    ion_numbers: List[int] = []
    for i, line in enumerate(lines_content):
        if "number of ions" in line:
            data["Natom"] = int(line.split()[-1])
        if "free  energy   TOTEN" in line:
            data["energy"] = float(line.split()[4])
        if "ISIF" in line:
            has_virial = int(line.split()[2]) != 0
        if "ions per type" in line:
            ion_numbers = [int(j) for j in line.split("=")[1].split()]
        if "POTCAR:" in line:
            symbol = line.split()[2].split("_")[0]
            if symbol not in ion_symbols:
                ion_symbols.append(symbol)
        if "TOTAL-FORCE (eV/Angst)" in line:
            start = i + 2
            data["pos_force"] = [
                " ".join(lines_content[j].split())
                for j in range(start, start + data["Natom"])
            ]
    symbols: List[str] = []
    for s, n in zip(ion_symbols, ion_numbers):
        symbols.extend([s] * n)
    data["symbols"] = symbols
    if has_virial:
        pattern = r"FORCE on cell =-STRESS.*?Total\s+([\d\.\-\s]+)"
        values = list(re.finditer(pattern, content, re.DOTALL))[-1]
        xx, yy, zz, xy, yz, zx = values.group(1).split()
        data["virial"] = f"{xx} {xy} {zx} {xy} {yy} {yz} {zx} {yz} {zz}"
    return data


def outcar2xyz(outcar_list: Union[List[str], str],
               output_path: str = "train.xyz", mode: str = "w",
               print_no_converge: bool = True) -> None:
    """Single-point VASP OUTCARs -> extended XYZ training frames."""
    if isinstance(outcar_list, str):
        outcar_list = [outcar_list]
    assert mode in ("w", "a"), "Only support w or a mode."
    not_converged = []
    with open(output_path, mode) as out_f:
        for outcar in outcar_list:
            data = read_OUTCAR(outcar)
            if not data:
                not_converged.append(outcar)
                continue
            out_f.write(f"{data['Natom']}\n")
            props = "Properties=species:S:1:pos:R:3:forces:R:3"
            if data["virial"] is not None:
                out_f.write(
                    f'energy={data["energy"]:.6f} Lattice="{data["lattice"]}" '
                    f'virial="{data["virial"]}" {props} pbc="T T T"\n'
                )
            else:
                out_f.write(
                    f'energy={data["energy"]:.6f} Lattice="{data["lattice"]}" '
                    f'{props} pbc="T T T"\n'
                )
            for symbol, pf in zip(data["symbols"], data["pos_force"]):
                out_f.write(f"{symbol} {pf}\n")
    if not_converged and print_no_converge:
        for f in not_converged:
            print(f"{f} is not converged!")


def outcars2xyz(outcar_list: Union[List[str], str],
                output_path: str = "train.xyz", mode: str = "w",
                print_no_converge: bool = True) -> None:
    """Alias of :func:`outcar2xyz` (multi-file input)."""
    outcar2xyz(outcar_list, output_path, mode, print_no_converge)
