"""Dev-time generator for mdapy_tpu/core/_element_tables.py.

Extracts the *numeric fact tables* (chemical symbols, IUPAC atomic masses,
Bondi/Alvarez van-der-Waals radii, Jmol CPK colors, OVITO display radii,
OVITO type palette) from the reference library's data module
(reference: src/mdapy/data.py — itself mechanically derived from ASE tables
and an OVITO settings dump per its own docstrings) and re-emits them as
flat numpy arrays indexed by atomic number, which is the layout the TPU
framework consumes (device-side gather by type/atomic-number).

This extracts data, not code.  Run:  python tools/gen_element_tables.py
"""

import importlib.util
import sys

import numpy as np

REF = "/root/reference/src/mdapy/data.py"
OUT = "mdapy_tpu/core/_element_tables.py"


def main() -> None:
    spec = importlib.util.spec_from_file_location("_ref_data", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    symbols = list(mod.chemical_symbols)  # index 0 = 'X' dummy
    n = len(symbols)
    masses = np.asarray(mod.atomic_masses, dtype=np.float64)
    vdw = np.asarray(mod.vdw_radii, dtype=np.float64)

    rgb = np.zeros((n, 3), dtype=np.float64)
    disp = np.full(n, 2.0, dtype=np.float64)
    for i, s in enumerate(symbols):
        if s in mod.ele_rgb:
            rgb[i] = np.array(mod.ele_rgb[s], dtype=np.float64) / 255.0
        else:
            rgb[i] = np.array(mod.ele_rgb["X"], dtype=np.float64) / 255.0
        disp[i] = mod.ele_radius.get(s, mod.ele_radius["X"])

    # Named special color entries that are not elements (e.g. hydrate labels).
    special_rgb = {
        k: (np.array(v, dtype=np.float64) / 255.0).tolist()
        for k, v in mod.ele_rgb.items()
        if k not in symbols
    }

    tmax = max(mod.type_rgb)
    type_rgb = np.zeros((tmax + 1, 3), dtype=np.float64)
    for t, v in mod.type_rgb.items():
        type_rgb[t] = np.array(v, dtype=np.float64) / 255.0

    def fmt(a, per_line=6):
        flat = np.asarray(a).ravel()
        body = ",".join(repr(float(x)) for x in flat)
        return f"np.array([{body}], dtype=np.float64).reshape{tuple(np.asarray(a).shape)}"

    with open(OUT, "w") as f:
        f.write(
            '"""Auto-generated element fact tables (see tools/gen_element_tables.py).\n\n'
            "Numeric facts only: IUPAC masses, vdW radii, Jmol CPK colors (0-1 floats),\n"
            "OVITO display *diameters* (render radius = value/2), OVITO type palette.\n"
            'Indexed by atomic number; index 0 is the dummy element "X".\n"""\n\n'
            "import numpy as np\nfrom numpy import nan\n\n"
        )
        f.write(f"SYMBOLS = {symbols!r}\n\n")
        f.write(f"ATOMIC_MASSES = {fmt(masses)}\n\n")
        f.write(f"VDW_RADII = {fmt(vdw)}\n\n")
        f.write(f"JMOL_RGB = {fmt(rgb)}\n\n")
        f.write(f"DISPLAY_DIAMETER = {fmt(disp)}\n\n")
        f.write(f"TYPE_RGB = {fmt(type_rgb)}\n\n")
        f.write(f"SPECIAL_RGB = {special_rgb!r}\n")
    print(f"wrote {OUT}: {n} elements, {tmax} type colors")


if __name__ == "__main__":
    sys.exit(main())
