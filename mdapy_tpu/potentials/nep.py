"""NEP (neuroevolution potential, GPUMD) — JAX forward + autodiff forces.

Parity: reference src/neppy.cpp + extern/NEPCPU (nep.cpp/nep_utilities.h),
supporting NEP3/NEP4/NEP5 (+ universal ZBL): Chebyshev radial basis with
cosine cutoff, angular descriptor via the real solid-harmonic accumulators
(Z_COEFFICIENT tables / C3B-C4B-C5B contractions), per-type single-hidden-
layer tanh ANN, q_scaler normalization, and the ZBL screened-Coulomb channel.

qNEP (nep4_charge1/2/3, reference nep.py:163-226 "calculate_charge" path,
NEPCPU nep.cpp:2434-2604 + ewald_nep.cpp): the ANN grows a second output
head predicting per-atom charges (apply_ann_one_layer_charge,
nep_utilities.h:174-203); charges are zero-meaned (zero_total_charge,
nep.cpp:654), fed into an Ewald electrostatic energy (mode 1: reciprocal +
real-space erfc + self-energy; mode 2: reciprocal only; mode 3: shifted
real-space only), and Born effective charges come out as the charge-jacobian
pair sum (find_bec_* nep.cpp:832-1026) scaled by sqrt(eps_inf).

TPU-first: the whole descriptor-to-energy pipeline is one jitted function of
positions; forces and the virial come from jax.grad (wrt positions and a
virtual strain) — replacing NEPCPU's ~3k lines of hand-written gradient
kernels with autodiff.  The reference's D_real chain rule (dE_elec/dq_i *
dq_i/dr, nep.cpp:708) falls out of autodiff by marking the charge mean with
stop_gradient (the reference differentiates the raw, un-zeroed charges).
The BEC pair convention (0.5 * r12 (x) dq_i/dr12, +at i / -at j) uses one
backward pass: since q_i depends only on atom i's displacement rows,
grad(sum(q_raw)) wrt the (N, M, 3) displacement tensor yields every per-atom
charge jacobian at once.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..neighbor.neighbor import neighbor_search, replicate_for_small_box
from .calculator import CalculatorMP

__all__ = ["NEP"]

# ---------------------------------------------------------------------------
# constants from the NEP descriptor definition (GPUMD)
# ---------------------------------------------------------------------------

C3B = np.array([
    0.238732414637843, 0.119366207318922, 0.119366207318922, 0.099471839432435, 0.596831036594608,
    0.596831036594608, 0.149207759148652, 0.149207759148652, 0.139260575205408, 0.104445431404056,
    0.104445431404056, 1.044454314040563, 1.044454314040563, 0.174075719006761, 0.174075719006761,
    0.011190581936149, 0.223811638722978, 0.223811638722978, 0.111905819361489, 0.111905819361489,
    1.566681471060845, 1.566681471060845, 0.195835183882606, 0.195835183882606,
])
C4B = np.array([-0.007499480826664, -0.134990654879954, 0.067495327439977,
                0.404971964639861, -0.809943929279723])
C5B = np.array([0.026596810706114, 0.053193621412227, 0.026596810706114])

Z_COEFF = {
    1: np.array([[0.0, 1.0], [1.0, 0.0]]),
    2: np.array([[-1.0, 0.0, 3.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]),
    3: np.array([[0.0, -3.0, 0.0, 5.0], [-1.0, 0.0, 5.0, 0.0],
                 [0.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]]),
    4: np.array([
        [3.0, 0.0, -30.0, 0.0, 35.0], [0.0, -3.0, 0.0, 7.0, 0.0],
        [-1.0, 0.0, 7.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0, 0.0]]),
}
K_C_SP = 14.399645
NEP_ELEMENTS = [
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne", "Na", "Mg", "Al", "Si", "P", "S",
    "Cl", "Ar", "K", "Ca", "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge",
    "As", "Se", "Br", "Kr", "Rb", "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd",
    "In", "Sn", "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd", "Pm", "Sm", "Eu", "Gd",
    "Tb", "Dy", "Ho", "Er", "Tm", "Yb", "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
    "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th", "Pa", "U", "Np", "Pu",
]


class NEP(CalculatorMP):
    def __init__(self, filename: str):
        super().__init__()
        self.filename = filename
        self._parse(filename)

    # ------------------------------------------------------------------
    def _parse(self, filename: str) -> None:
        with open(filename) as f:
            tokens_iter = iter([ln.split() for ln in f if ln.split()])

        head = next(tokens_iter)
        self.model_name = head[0]
        base = head[0]
        self.charge_mode = 0
        if "_charge" in base:
            base, _, cm = base.rpartition("_charge")
            self.charge_mode = int(cm)
        if base in ("nep3", "nep", "nep3_zbl", "nep_zbl"):
            self.version = 3
        elif base in ("nep4", "nep4_zbl"):
            self.version = 4
        elif base in ("nep5", "nep5_zbl"):
            self.version = 5
        else:
            raise ValueError(f"Unsupported NEP model {head[0]!r}")
        self.zbl_enabled = base.endswith("_zbl")
        self.num_types = int(head[1])
        self.elements_list = head[2 : 2 + self.num_types]
        self.atomic_numbers = np.array(
            [NEP_ELEMENTS.index(e) for e in self.elements_list], dtype=np.int32
        )
        self.zbl_flexibled = False
        self.zbl_rc_inner = self.zbl_rc_outer = 0.0
        if self.zbl_enabled:
            t = next(tokens_iter)
            self.zbl_rc_inner = float(t[1])
            self.zbl_rc_outer = float(t[2])
            if self.zbl_rc_inner == 0 and self.zbl_rc_outer == 0:
                self.zbl_flexibled = True
        t = next(tokens_iter)  # cutoff
        if len(t) == 5:
            self.rc_radial = float(t[1])
            self.rc_angular = float(t[2])
        else:
            self.rc_radial = max(float(v) for v in t[1:-2:2])
            self.rc_angular = max(float(v) for v in t[2:-2:2])
        t = next(tokens_iter)  # n_max
        self.n_max_radial = int(t[1])
        self.n_max_angular = int(t[2])
        t = next(tokens_iter)  # basis_size
        self.basis_size_radial = int(t[1])
        self.basis_size_angular = int(t[2])
        t = next(tokens_iter)  # l_max
        self.L_max = int(t[1])
        self.L4 = int(t[2]) == 2
        self.L5 = int(t[3]) == 1
        self.num_L = self.L_max + int(self.L4) + int(self.L5)
        t = next(tokens_iter)  # ANN
        self.num_neurons = int(t[1])
        self.dim_radial = self.n_max_radial + 1
        self.dim_angular = (self.n_max_angular + 1) * self.num_L
        self.dim = self.dim_radial + self.dim_angular

        nt = self.num_types
        if self.version == 3:
            num_ann = (self.dim + 2) * self.num_neurons + 1
        elif self.version == 4:
            num_ann = (self.dim + 2) * self.num_neurons * nt + 1
        else:
            num_ann = ((self.dim + 2) * self.num_neurons + 1) * nt + 1
        if self.charge_mode > 0:
            # charge head (w1 doubles) + sqrt(eps_inf)  (nep.cpp:2121-2123)
            num_ann += self.num_neurons * nt + 1
        num_c = nt * nt * (
            (self.n_max_radial + 1) * (self.basis_size_radial + 1)
            + (self.n_max_angular + 1) * (self.basis_size_angular + 1)
        )
        params = np.array(
            [float(next(tokens_iter)[0]) for _ in range(num_ann + num_c)]
        )
        self.q_scaler = np.array(
            [float(next(tokens_iter)[0]) for _ in range(self.dim)]
        )
        if self.zbl_flexibled:
            nzbl = 10 * (nt * (nt + 1) // 2)
            self.zbl_para = np.array(
                [float(next(tokens_iter)[0]) for _ in range(nzbl)]
            )

        # ANN parameter layout (nep.cpp update_potential :2255-2303)
        w0 = np.zeros((nt, self.num_neurons, self.dim))
        b0 = np.zeros((nt, self.num_neurons))
        w1 = np.zeros((nt, self.num_neurons))
        w1c = np.zeros((nt, self.num_neurons))
        p = 0
        for tt in range(nt):
            if tt > 0 and self.version == 3:
                p -= (self.dim + 2) * self.num_neurons
            w0[tt] = params[p : p + self.num_neurons * self.dim].reshape(
                self.num_neurons, self.dim
            )
            p += self.num_neurons * self.dim
            b0[tt] = params[p : p + self.num_neurons]
            p += self.num_neurons
            w1[tt] = params[p : p + self.num_neurons]
            p += self.num_neurons
            if self.charge_mode > 0:
                w1c[tt] = params[p : p + self.num_neurons]
                p += self.num_neurons
            if self.version == 5:
                p += 1
        self.sqrt_epsilon_inf = 1.0
        if self.charge_mode > 0:
            self.sqrt_epsilon_inf = float(params[p])
            p += 1
        self.b1 = float(params[p])
        p += 1
        cparams = params[num_ann:]
        nr = (self.n_max_radial + 1) * (self.basis_size_radial + 1)
        self.c_radial = cparams[: nr * nt * nt].reshape(
            self.n_max_radial + 1, self.basis_size_radial + 1, nt, nt
        )
        self.c_angular = cparams[nr * nt * nt :].reshape(
            self.n_max_angular + 1, self.basis_size_angular + 1, nt, nt
        )
        self.w0, self.b0, self.w1, self.w1c = w0, b0, w1, w1c

        # electrostatic constants for the charge models (nep.cpp:2156-2166)
        if self.charge_mode > 0:
            import math

            rc = self.rc_radial
            self.alpha_q = math.pi / rc  # "a good value"
            self.two_alpha_over_sqrt_pi = 2.0 * self.alpha_q / math.sqrt(math.pi)
            A = math.erfc(math.pi) / (rc * rc)
            A += self.two_alpha_over_sqrt_pi * math.exp(-math.pi * math.pi) / rc
            self.charge_A = A
            self.charge_B = -math.erfc(math.pi) / rc - A * rc

    # ------------------------------------------------------------------
    def _types(self, system) -> np.ndarray:
        elems = np.asarray(system.data["element"]).astype(str)
        lut = {e: i for i, e in enumerate(self.elements_list)}
        for e in set(elems.tolist()):
            if e not in lut:
                raise ValueError(f"{e} not in NEP elements {self.elements_list}")
        return np.array([lut[e] for e in elems], dtype=np.int32)

    def _compact_tables(self, types: np.ndarray):
        """Slice model tables down to the element types actually present.

        A universal NEP (e.g. UNEP-v1, 16 types) evaluated on a 1-5 element
        system wastes a factor of (nt/nt_eff)^2 in every per-pair type-mixing
        contraction on TPU; the descriptor value is unchanged because c/w0
        tables are purely per-type lookups.  Returns (types_compact, consts)
        where consts mirrors self._consts() on the reduced type set.
        """
        present = np.unique(types)
        remap = np.full(self.num_types, -1, np.int32)
        remap[present] = np.arange(len(present), dtype=np.int32)
        key = tuple(present.tolist())
        cache = getattr(self, "_compact_cache", None)
        if cache is None or cache[0] != key:
            sl = present
            consts = (
                jnp.asarray(self.c_radial[:, :, sl][:, :, :, sl]),
                jnp.asarray(self.c_angular[:, :, sl][:, :, :, sl]),
                jnp.asarray(self.w0[sl]), jnp.asarray(self.b0[sl]),
                jnp.asarray(self.w1[sl]), jnp.asarray(self.b1),
                jnp.asarray(self.q_scaler),
                jnp.asarray(self.atomic_numbers[sl]),
            )
            self._compact_cache = (key, consts)
        return remap[types], self._compact_cache[1]

    def _prepare(self, system):
        types = self._types(system)
        old_n = system.N
        rc = max(self.rc_radial, self.rc_angular)
        pos, box, n_images = replicate_for_small_box(system.pos, system.box, rc)
        if n_images > 1:
            types = np.tile(types, n_images)
        verlet, dist, nn = neighbor_search(pos, box, rc)
        return pos, box, types, verlet, old_n

    def _prepare_device(self, system):
        """Device-resident prep: positions + Verlet list never leave the
        accelerator (neighbor_search_device), so force calls avoid the
        dominant d2h/h2d cost of the (N, M) arrays."""
        from ..neighbor.neighbor import neighbor_search_device

        types = self._types(system)
        old_n = system.N
        rc = max(self.rc_radial, self.rc_angular)
        pos, box, n_images = replicate_for_small_box(system.pos, system.box, rc)
        if n_images > 1:
            types = np.tile(types, n_images)
        pos_d, verlet_d, cnt_d, _ = neighbor_search_device(pos, box, rc)
        return pos_d, box, types, verlet_d, old_n

    def calculate(self, system, box=None) -> None:
        if box is not None:  # reference-style calculate(data, box) (nep.py:163)
            from .calculator import _FrameView

            system = _FrameView(system, box)
        if self.charge_mode > 0:
            self._calculate_qnep(system)
            return
        pos_d, box, types, verlet_d, old_n = self._prepare_device(system)
        from .pairops import reverse_permutation_device

        types_c, consts = self._compact_tables(types)
        rev_d, bad = reverse_permutation_device(verlet_d)
        e, F, V, dEdeps = _nep_force_fast(
            pos_d, jnp.asarray(types_c), verlet_d,
            rev_d, jnp.asarray(box.matrix, pos_d.dtype),
            jnp.asarray(box.inverse_box, pos_d.dtype),
            jnp.asarray(box.boundary.astype(np.float64), pos_d.dtype),
            *consts, self._static(),
            _pick_block(pos_d.shape[0], verlet_d.shape[1]),
        )
        # The asymmetry check is opt-in: our cell-list builder is symmetric
        # by construction (min-image pair tests are reciprocal) and the
        # contract is covered by tests, while a per-call `bad` fetch lands
        # BEHIND the force kernel in the device's in-order queue — it would
        # serialize every force call on its own kernel (~40% of the call).
        if os.environ.get("MDAPY_TPU_NEP_VALIDATE", "0") == "1":
            if int(bad):  # pragma: no cover - guarded by the build contract
                raise RuntimeError(
                    "asymmetric neighbor list in NEP force evaluation"
                )
        vol = abs(box.volume)
        # stress = (dE/deps)/V symmetrized, Voigt [xx,yy,zz,yz,xz,xy];
        # results stay device-resident (CalculatorMP._fetch materializes)
        sig = 0.5 * (dEdeps + dEdeps.T) / vol
        stress = sig.ravel()[jnp.array([0, 4, 8, 5, 2, 1])]
        self.results["energies"] = e[:old_n]
        self.results["forces"] = F[:old_n]
        self.results["stress"] = stress
        # exact per-atom virials (half-pair convention, sums to -dE/deps)
        self.results["virials"] = V[:old_n]

    def _calculate_qnep(self, system) -> None:
        """Energies/forces/virials + charges/BEC for nep4_charge* models
        (reference nep.py:163-226, NEPCPU nep.cpp:2434-2604)."""
        pos, box, types, verlet, old_n = self._prepare(system)
        nvec = _ewald_nvecs(np.asarray(box.matrix, np.float64), self.alpha_q)
        n_total = len(pos)
        out = _qnep_compute(
            jnp.asarray(pos), jnp.asarray(types), jnp.asarray(verlet),
            jnp.asarray(box.matrix), jnp.asarray(box.inverse_box),
            jnp.asarray(box.boundary.astype(np.float64)),
            jnp.asarray(nvec),
            *self._consts(), jnp.asarray(self.w1c),
            jnp.asarray(self.sqrt_epsilon_inf),
            self._static(),
        )
        energies, forces, dEdeps, charges, bec = (np.asarray(v) for v in out)
        vol = abs(box.volume)
        sig = 0.5 * (dEdeps + dEdeps.T) / vol
        self.results["energies"] = energies[:old_n]
        self.results["forces"] = forces[:old_n]
        self.results["stress"] = sig.ravel()[[0, 4, 8, 5, 2, 1]]
        v = -dEdeps
        self.results["virials"] = np.tile(v.ravel() / n_total, (old_n, 1))
        self.results["charges"] = charges[:old_n]
        self.results["bec"] = bec[:old_n]

    def get_charges(self, system, box=None) -> np.ndarray:
        """Per-atom (zero-mean) charges; qNEP only (reference nep.py:327)."""
        if box is not None:
            from .calculator import _FrameView

            system = _FrameView(system, box)
        assert self.charge_mode > 0, "charges require a qNEP (nep4_charge*) model."
        self._ensure(system)
        return self.results["charges"]

    def get_bec(self, system, box=None) -> np.ndarray:
        """Per-atom Born effective charges (N, 9); qNEP only
        (reference nep.py:350)."""
        if box is not None:
            from .calculator import _FrameView

            system = _FrameView(system, box)
        assert self.charge_mode > 0, "BEC requires a qNEP (nep4_charge*) model."
        self._ensure(system)
        return self.results["bec"]

    def _descriptor_like(self, system, latent: bool) -> np.ndarray:
        pos_d, box, types, verlet_d, old_n = self._prepare_device(system)
        types_c, consts = self._compact_tables(types)
        q = _nep_descriptor_fast(
            pos_d, jnp.asarray(types_c), verlet_d,
            jnp.asarray(box.matrix, pos_d.dtype),
            jnp.asarray(box.inverse_box, pos_d.dtype),
            jnp.asarray(box.boundary.astype(np.float64), pos_d.dtype),
            *consts, self._static(),
            _pick_block(pos_d.shape[0], verlet_d.shape[1]), latent,
        )
        return np.asarray(q)[:old_n]

    def get_descriptors(self, system) -> np.ndarray:
        return self._descriptor_like(system, latent=False)

    def get_latent_space(self, system) -> np.ndarray:
        return self._descriptor_like(system, latent=True)

    def _consts(self):
        return (
            jnp.asarray(self.c_radial), jnp.asarray(self.c_angular),
            jnp.asarray(self.w0), jnp.asarray(self.b0), jnp.asarray(self.w1),
            jnp.asarray(self.b1), jnp.asarray(self.q_scaler),
            jnp.asarray(self.atomic_numbers),
        )

    def _static(self):
        return _NEPStatic(
            rc_radial=self.rc_radial,
            rc_angular=self.rc_angular,
            basis_r=self.basis_size_radial,
            basis_a=self.basis_size_angular,
            nmax_r=self.n_max_radial,
            nmax_a=self.n_max_angular,
            L_max=self.L_max,
            L4=self.L4,
            L5=self.L5,
            zbl=self.zbl_enabled and not self.zbl_flexibled,
            zbl_inner=self.zbl_rc_inner,
            zbl_outer=self.zbl_rc_outer,
            charge_mode=self.charge_mode,
            alpha_q=getattr(self, "alpha_q", 0.0),
            charge_A=getattr(self, "charge_A", 0.0),
            charge_B=getattr(self, "charge_B", 0.0),
        )


from typing import NamedTuple


class _NEPStatic(NamedTuple):
    rc_radial: float
    rc_angular: float
    basis_r: int
    basis_a: int
    nmax_r: int
    nmax_a: int
    L_max: int
    L4: bool
    L5: bool
    zbl: bool
    zbl_inner: float
    zbl_outer: float
    charge_mode: int = 0
    alpha_q: float = 0.0
    charge_A: float = 0.0
    charge_B: float = 0.0


def _chebyshev_basis(d, rc, kmax: int):
    """fn_k(d) for k=0..kmax with the NEP cosine cutoff (find_fn)."""
    fc = jnp.where(d < rc, 0.5 * jnp.cos(jnp.pi * d / rc) + 0.5, 0.0)
    x = 2.0 * (d / rc - 1.0) ** 2 - 1.0
    fns = [jnp.ones_like(x), x]
    for _ in range(2, kmax + 1):
        fns.append(2.0 * x * fns[-1] - fns[-2])
    fn = jnp.stack(fns[: kmax + 1], axis=-1)
    return (fn + 1.0) * 0.5 * fc[..., None]


def _angular_s(dispc, d, gn, L_max: int):
    """Accumulated s components per atom: list over L of (n, 2L+1) blocks.

    dispc: 3-tuple of (n, M) displacement components (kept unstacked — a
    stacked (n, M, 3) tensor pads its minor dim to 128 lanes on TPU);
    d: (n, M); gn: (n, M) radial factor for this n-channel."""
    dsafe = jnp.maximum(d, 1e-30)
    x, y, z = (c / dsafe for c in dispc)
    out = []
    for L in range(1, L_max + 1):
        zc = Z_COEFF[L]
        zpow = [jnp.ones_like(z)]
        for _ in range(L):
            zpow.append(zpow[-1] * z)
        # complex (x+iy)^m parts
        re, im = x, y
        comps = []
        for m in range(0, L + 1):
            zf = sum(zc[m][n2] * zpow[n2] for n2 in range(L - m + 1) if zc[m][n2] != 0.0)
            zf = zf * gn
            if m == 0:
                comps.append(jnp.sum(zf, axis=1))
            else:
                comps.append(jnp.sum(zf * re, axis=1))
                comps.append(jnp.sum(zf * im, axis=1))
                re, im = re * x - im * y, re * y + im * x
        out.append(jnp.stack(comps, axis=-1))  # (n, 2L+1)... packed m-order
    return out


def _q_from_s(s_blocks, L_max: int, L4: bool, L5: bool):
    """q values per atom for one n-channel: (n, num_L)."""
    qs = []
    for L in range(1, L_max + 1):
        s = s_blocks[L - 1]
        start = L * L - 1
        c = jnp.asarray(C3B[start : start + 2 * L + 1])
        q = c[0] * s[:, 0] ** 2 + 2.0 * jnp.sum(
            c[1:] * s[:, 1:] ** 2, axis=1
        )
        qs.append(q)
    if L4:
        s = s_blocks[1]  # L = 2 block: s[3..7] -> local indices 0..4
        q = (
            C4B[0] * s[:, 0] ** 3
            + C4B[1] * s[:, 0] * (s[:, 1] ** 2 + s[:, 2] ** 2)
            + C4B[2] * s[:, 0] * (s[:, 3] ** 2 + s[:, 4] ** 2)
            + C4B[3] * s[:, 3] * (s[:, 2] ** 2 - s[:, 1] ** 2)
            + C4B[4] * s[:, 1] * s[:, 2] * s[:, 4]
        )
        qs.append(q)
    if L5:
        s = s_blocks[0]  # L = 1 block
        s0sq = s[:, 0] ** 2
        s12 = s[:, 1] ** 2 + s[:, 2] ** 2
        qs.append(C5B[0] * s0sq**2 + C5B[1] * s0sq * s12 + C5B[2] * s12**2)
    return jnp.stack(qs, axis=-1)


def _pick_block(n: int, M: int) -> int:
    """Row-block size for the chunked evaluation: bound the largest per-block
    temporary (B * M * ~50 floats fwd+bwd) to ~100 MB.
    MDAPY_TPU_NEP_BLOCK overrides for tuning sweeps."""
    env = os.environ.get("MDAPY_TPU_NEP_BLOCK", "")
    if env:
        return int(env)
    target = max(1, (1 << 21) // max(M, 1))  # ~2M pair rows per block
    b = 1 << max(0, (min(n, target) - 1)).bit_length()
    return max(128, min(b, 8192))


def _block_q(dispc, ti, tj, ok, c_radial, c_angular, st: _NEPStatic):
    """NEP descriptor q for one row block — dense, gather-free type mixing.

    dispc: 3-tuple of (B,M) min-imaged displacement components with
    safe-padded slots; ti (B,) int; tj (B,M) int; ok (B,M) valid mask.
    The per-pair c[., ., ti, tj] table gather of the naive formulation
    (a (nmax+1, k, B, M) strided gather — the round-1 TPU bottleneck) is
    replaced by per-type partial sums (radial) and a one-hot contraction
    over the compacted type set (angular).
    Returns (q (B, dim), d (B, M)).
    """
    dx, dy, dz = dispc
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    nt = c_radial.shape[-1]
    ohj = jax.nn.one_hot(tj, nt, dtype=d.dtype)               # (B,M,t)

    okr = ok & (d < st.rc_radial)
    # keep the pair axis M minor everywhere: a trailing (nmax+1, ka+1) pair
    # of small dims forces (8,128) tile padding (3.7x HBM expansion seen in
    # the round-2 OOM dump); with M minor the tiles stay dense
    fn_r = _chebyshev_basis(d, st.rc_radial, st.basis_r)      # (B,M,k+1)
    # per-type radial sums: S[b,t,k] = sum_m [tj=t] fn_k(r_bm)
    S = jnp.einsum("bmt,bmk->btk", jnp.where(okr[..., None], ohj, 0.0), fn_r)
    cR_i = c_radial[:, :, ti, :]                              # (nmax+1,k+1,B,t)
    q_radial = jnp.einsum("nkbt,btk->bn", cR_i, S)

    oka = ok & (d < st.rc_angular)
    fn_a = _chebyshev_basis(d, st.rc_angular, st.basis_a)     # (B,M,ka+1)
    fn_aT = jnp.swapaxes(fn_a, 1, 2)                          # (B,ka+1,M)
    na1, ka1 = st.nmax_a + 1, st.basis_a + 1
    cA_i = jnp.moveaxis(c_angular[:, :, ti, :], 2, 0)         # (B,na+1,ka+1,t)
    ohjT = jnp.swapaxes(ohj, 1, 2)                            # (B,t,M)
    # batched (n*k, t) @ (t, M) per atom -> per-pair mixed coefficients
    v = jnp.matmul(cA_i.reshape(-1, na1 * ka1, ohjT.shape[1]), ohjT)
    v = v.reshape(-1, na1, ka1, ohjT.shape[-1])               # (B,na+1,ka+1,M)
    gn_a = jnp.sum(v * fn_aT[:, None], axis=2)                # (B,na+1,M)
    q_ang = []
    for na in range(st.nmax_a + 1):
        gna = jnp.where(oka, gn_a[:, na, :], 0.0)
        s_blocks = _angular_s(dispc, d, gna, st.L_max)
        q_ang.append(_q_from_s(s_blocks, st.L_max, st.L4, st.L5))
    # layout: q[dim_radial + l * (nmax_a+1) + n] (find_q indexing)
    q_ang = jnp.stack(q_ang, axis=1)                          # (B, na+1, num_L)
    q_ang = jnp.swapaxes(q_ang, 1, 2).reshape(d.shape[0], -1)
    return jnp.concatenate([q_radial, q_ang], axis=1), d


def _zbl_energy_oh(d, ok, ti, ohj, atomic_numbers, st: _NEPStatic):
    """ZBL channel with the neighbor atomic number taken through the one-hot
    (identical values to _zbl_energy, no per-pair int gather)."""
    zi = atomic_numbers[ti] + 1                               # (B,)
    zj = ohj @ (atomic_numbers + 1).astype(d.dtype)           # (B,M)
    okz = ok & (d < st.zbl_outer) & (d > 1e-6)
    a_inv = (zi[:, None] ** 0.23 + zj**0.23) * 2.134563
    zizj = K_C_SP * zi[:, None] * zj
    x = d * a_inv
    para = [0.18175, 3.1998, 0.50986, 0.94229, 0.28022, 0.4029, 0.02817, 0.20162]
    phi = (
        para[0] * jnp.exp(-para[1] * x) + para[2] * jnp.exp(-para[3] * x)
        + para[4] * jnp.exp(-para[5] * x) + para[6] * jnp.exp(-para[7] * x)
    )
    dsafe = jnp.maximum(d, 1e-30)
    f = zizj * phi / dsafe
    r1, r2 = st.zbl_inner, st.zbl_outer
    pi_factor = jnp.pi / (r2 - r1)
    fc = jnp.where(
        d < r1, 1.0,
        jnp.where(d < r2, jnp.cos(pi_factor * (d - r1)) * 0.5 + 0.5, 0.0),
    )
    return jnp.sum(jnp.where(okz, 0.5 * f * fc, 0.0), axis=1)


def _block_e(dispc, ti, tj, ok, c_radial, c_angular, w0, b0, w1, b1,
             q_scaler, atomic_numbers, st: _NEPStatic):
    q, d = _block_q(dispc, ti, tj, ok, c_radial, c_angular, st)
    e, _ = _ann_energy(q * q_scaler[None], ti, w0, b0, w1, b1)
    if st.zbl:
        nt = c_radial.shape[-1]
        ohj = jax.nn.one_hot(tj, nt, dtype=d.dtype)
        e = e + _zbl_energy_oh(d, ok, ti, ohj, atomic_numbers, st)
    return e


def _gather_disp(pos, types, verlet, matrix, inv, boundary):
    """Neighbor displacements via per-component gathers.

    Gather outputs keep the (N, M) pair axis minor — a packed (N*M, 4) row
    gather picks a T(8,128) layout that pads the 4-wide minor dim to 128
    (32x HBM expansion, the round-2 256k OOM).  Four (N, M) scalar gathers
    tile cleanly.  Returns ((dx, dy, dz) component tuple of (N,M) min-imaged
    safe-padded arrays, tj (N,M) int32, ok (N,M))."""
    ok = verlet >= 0
    j = jnp.maximum(verlet, 0)
    cx = pos[:, 0][j] - pos[:, 0, None]                        # (N,M)
    cy = pos[:, 1][j] - pos[:, 1, None]
    cz = pos[:, 2][j] - pos[:, 2, None]
    tj = types[j]
    fa = cx * inv[0, 0] + cy * inv[1, 0] + cz * inv[2, 0]
    fb = cx * inv[0, 1] + cy * inv[1, 1] + cz * inv[2, 1]
    fc = cx * inv[0, 2] + cy * inv[1, 2] + cz * inv[2, 2]
    fa = fa - jnp.round(fa) * boundary[0]
    fb = fb - jnp.round(fb) * boundary[1]
    fc = fc - jnp.round(fc) * boundary[2]
    dx = fa * matrix[0, 0] + fb * matrix[1, 0] + fc * matrix[2, 0]
    dy = fa * matrix[0, 1] + fb * matrix[1, 1] + fc * matrix[2, 1]
    dz = fa * matrix[0, 2] + fb * matrix[1, 2] + fc * matrix[2, 2]
    dx = jnp.where(ok, dx, 1.0)
    dy = jnp.where(ok, dy, 0.0)
    dz = jnp.where(ok, dz, 0.0)
    return (dx, dy, dz), tj, ok


def _map_blocks(fn, arrays, n: int, block: int, pad_values):
    """lax.map `fn` over row blocks of each array in `arrays`."""
    npad = -(-n // block) * block
    padded = []
    for a, pv in zip(arrays, pad_values):
        cfg = [(0, npad - n)] + [(0, 0)] * (a.ndim - 1)
        padded.append(
            jnp.pad(a, cfg, constant_values=pv).reshape(
                (npad // block, block) + a.shape[1:]
            )
        )
    out = jax.lax.map(fn, tuple(padded))
    return jax.tree_util.tree_map(
        lambda o: o.reshape((npad,) + o.shape[2:])[:n], out
    )


@functools.partial(jax.jit, static_argnames=("st", "block"))
def _nep_force_fast(pos, types, verlet, rev, matrix, inv, boundary,
                    c_radial, c_angular, w0, b0, w1, b1, q_scaler,
                    atomic_numbers, st: _NEPStatic, block: int):
    """Energies, forces, per-atom virials and dE/deps in one pass.

    TPU-fast restructuring of the round-1 path (which strain-probed a second
    full evaluation and let the backward pass scatter-add over pairs):
      * one packed row gather for neighbor positions+types;
      * per-atom energies as a function of the displacement tensor only;
      * one value_and_grad w.r.t. disp (dense backward, no scatters);
      * forces/virials assembled with the reverse-pair permutation
        (potentials/pairops.py) — gathers, never scatter-adds.
    """
    n = pos.shape[0]
    disp0, tj, ok = _gather_disp(pos, types, verlet, matrix, inv, boundary)

    def eb(args):
        """Per-block (energies, pair gradient) — the energy of a row block
        depends only on that block's displacement rows, so value_and_grad
        stays block-local and lax.map never stacks cross-block residuals."""
        ddx, ddy, ddz, t_b, tj_b, ok_b = args

        def f(dc):
            e = _block_e(dc, t_b, tj_b, ok_b, c_radial, c_angular,
                         w0, b0, w1, b1, q_scaler, atomic_numbers, st)
            return jnp.sum(e), e

        (_, e), Jc = jax.value_and_grad(f, has_aux=True)((ddx, ddy, ddz))
        return e, Jc

    e_atoms, J = _map_blocks(
        eb, disp0 + (types, tj, ok), n, block,
        (1.0, 0.0, 0.0, 0, 0, False),
    )
    from .pairops import pair_forces_virials

    F, V, dEdeps = pair_forces_virials(disp0, J, verlet, rev, ok)
    return e_atoms, F, V, dEdeps


@functools.partial(jax.jit, static_argnames=("st", "block", "latent"))
def _nep_descriptor_fast(pos, types, verlet, matrix, inv, boundary,
                         c_radial, c_angular, w0, b0, w1, b1, q_scaler,
                         atomic_numbers, st: _NEPStatic, block: int,
                         latent: bool = False):
    n = pos.shape[0]
    disp0, tj, ok = _gather_disp(pos, types, verlet, matrix, inv, boundary)

    def qb(args):
        ddx, ddy, ddz, t_b, tj_b, ok_b = args
        q, _ = _block_q((ddx, ddy, ddz), t_b, tj_b, ok_b,
                        c_radial, c_angular, st)
        qs = q * q_scaler[None]
        if not latent:
            return qs
        _, h = _ann_energy(qs, t_b, w0, b0, w1, b1)
        return w1[t_b] * h

    return _map_blocks(qb, disp0 + (types, tj, ok), n, block,
                       (1.0, 0.0, 0.0, 0, 0, False))


def _zbl_energy(disp, d, ok, ti, tj, atomic_numbers, st: _NEPStatic):
    zi = atomic_numbers[ti[:, 0]] + 1
    zj = atomic_numbers[tj] + 1
    okz = ok & (d < st.zbl_outer) & (d > 1e-6)
    a_inv = (zi[:, None] ** 0.23 + zj**0.23) * 2.134563
    zizj = K_C_SP * zi[:, None] * zj
    x = d * a_inv
    para = [0.18175, 3.1998, 0.50986, 0.94229, 0.28022, 0.4029, 0.02817, 0.20162]
    phi = (
        para[0] * jnp.exp(-para[1] * x) + para[2] * jnp.exp(-para[3] * x)
        + para[4] * jnp.exp(-para[5] * x) + para[6] * jnp.exp(-para[7] * x)
    )
    dsafe = jnp.maximum(d, 1e-30)
    f = zizj * phi / dsafe
    r1, r2 = st.zbl_inner, st.zbl_outer
    pi_factor = jnp.pi / (r2 - r1)
    fc = jnp.where(
        d < r1, 1.0,
        jnp.where(d < r2, jnp.cos(pi_factor * (d - r1)) * 0.5 + 0.5, 0.0),
    )
    e = jnp.where(okz, 0.5 * f * fc, 0.0)
    return jnp.sum(e, axis=1)


def _ann_energy(q_scaled, types, w0, b0, w1, b1):
    w0t = w0[types]                        # (n, neurons, dim)
    b0t = b0[types]
    w1t = w1[types]
    h = jnp.tanh(jnp.einsum("ind,id->in", w0t, q_scaled) - b0t)
    return jnp.sum(w1t * h, axis=1) - b1, h


# ---------------------------------------------------------------------------
# qNEP (charge model) machinery
# ---------------------------------------------------------------------------


def _descriptor_from_disp(disp, ok, ti, tj, c_radial, c_angular, st: _NEPStatic):
    """NEP descriptor per atom from pre-computed displacement rows.

    Separated from the pos->disp mapping so the charge jacobian
    d(sum q_raw)/d(disp) can be taken wrt the displacement tensor directly
    (the BEC pair convention of NEPCPU find_bec_* nep.cpp:832-1026)."""
    n = disp.shape[0]
    d = jnp.linalg.norm(disp, axis=-1)
    okr = ok & (d < st.rc_radial)
    fn_r = _chebyshev_basis(d, st.rc_radial, st.basis_r)
    cr = c_radial[:, :, ti, tj]
    gn_r = jnp.einsum("nkim,imk->nim", cr, fn_r)
    q_radial = jnp.sum(jnp.where(okr[None], gn_r, 0.0), axis=2).T
    oka = ok & (d < st.rc_angular)
    fn_a = _chebyshev_basis(d, st.rc_angular, st.basis_a)
    ca = c_angular[:, :, ti, tj]
    gn_a = jnp.einsum("nkim,imk->nim", ca, fn_a)
    dispc = tuple(disp[..., c] for c in range(3))
    q_ang = []
    for na in range(st.nmax_a + 1):
        gna = jnp.where(oka, gn_a[na], 0.0)
        s_blocks = _angular_s(dispc, d, gna, st.L_max)
        q_ang.append(_q_from_s(s_blocks, st.L_max, st.L4, st.L5))
    q_ang = jnp.stack(q_ang, axis=1)
    q_ang = jnp.swapaxes(q_ang, 1, 2).reshape(n, -1)
    return jnp.concatenate([q_radial, q_ang], axis=1), d


def _ewald_nvecs(matrix: np.ndarray, alpha: float) -> np.ndarray:
    """Integer reciprocal-lattice triples of the Ewald half-space sphere.

    Host-side (numpy) mirror of EwaldNep::find_k_and_G
    (ewald_nep.cpp:167-237): half-space n1 >= 0 with the
    (n1==0, n2<0) / (n1==n2==0, n3<=0) rows dropped, |k|^2 < (2*pi*alpha)^2.
    The G weights themselves are recomputed inside the traced energy so the
    strain probe differentiates through them."""
    two_pi = 6.2831853  # NEPCPU's truncated constant, kept for parity
    a1, a2, a3 = matrix[0], matrix[1], matrix[2]
    det = float(np.linalg.det(matrix))
    b1 = np.cross(a2, a3) * (two_pi / det)
    b2 = np.cross(a3, a1) * (two_pi / det)
    b3 = np.cross(a1, a2) * (two_pi / det)
    volume_k = two_pi**3 / abs(det)
    n1_max = int(alpha * two_pi * np.linalg.norm(np.cross(b2, b3)) / volume_k)
    n2_max = int(alpha * two_pi * np.linalg.norm(np.cross(b3, b1)) / volume_k)
    n3_max = int(alpha * two_pi * np.linalg.norm(np.cross(b1, b2)) / volume_k)
    ksq_max = two_pi * two_pi * alpha * alpha
    g1, g2, g3 = np.meshgrid(
        np.arange(0, n1_max + 1),
        np.arange(-n2_max, n2_max + 1),
        np.arange(-n3_max, n3_max + 1),
        indexing="ij",
    )
    nvec = np.stack([g1.ravel(), g2.ravel(), g3.ravel()], axis=1)
    n1, n2, n3 = nvec[:, 0], nvec[:, 1], nvec[:, 2]
    keep = ~(
        ((n1 == 0) & (n2 == 0) & (n3 == 0))
        | ((n1 == 0) & (n2 < 0))
        | ((n1 == 0) & (n2 == 0) & (n3 < 0))
    )
    nvec = nvec[keep]
    k = nvec @ np.stack([b1, b2, b3])
    nvec = nvec[np.sum(k * k, axis=1) < ksq_max]
    return np.ascontiguousarray(nvec, dtype=np.int32)


def _recip_pe(rpos, matrix, qbar, nvec, st: _NEPStatic):
    """Per-atom reciprocal-space Ewald energy (ewald_nep.cpp:73-141).

    pe_n = K_C * q_n * sum_k G_k Re[S(k) e^{ik.r_n}] with G_k carrying the
    factor 2 for the suppressed -k half-space; sums to K_C sum_k G_k |S_k|^2."""
    two_pi = 6.2831853
    a1, a2, a3 = matrix[0], matrix[1], matrix[2]
    det = jnp.linalg.det(matrix)
    f = two_pi / det
    b = jnp.stack([jnp.cross(a2, a3), jnp.cross(a3, a1), jnp.cross(a1, a2)]) * f
    k = nvec.astype(rpos.dtype) @ b
    ksq = jnp.sum(k * k, axis=1)
    alpha_factor = 0.25 / (st.alpha_q * st.alpha_q)
    G = 2.0 * jnp.abs(f) / ksq * jnp.exp(-ksq * alpha_factor)
    kr = rpos @ k.T  # (n, K)
    c = jnp.cos(kr)
    s = jnp.sin(kr)
    S_re = qbar @ c
    S_im = -(qbar @ s)
    pe = qbar * (c @ (G * S_re) - s @ (G * S_im))
    return K_C_SP * pe


def _real_pe(qbar, d, ok, jidx, st: _NEPStatic):
    """Per-atom real-space electrostatics.

    charge_mode 1: 0.5 q_i q_j erfc(alpha r)/r pairs + Gaussian self-energy
    (find_force_charge_real_space_small_box, nep.cpp:1108-1193);
    charge_mode 3: shifted erfc/r + A r + B, no self term
    (find_force_charge_real_space_only_small_box, nep.cpp:1028-1108)."""
    from jax.scipy.special import erfc as _jerfc

    okq = ok & (d < st.rc_radial)
    dsafe = jnp.maximum(d, 1e-30)
    erfc_r = _jerfc(st.alpha_q * d) / dsafe
    if st.charge_mode == 3:
        phi = erfc_r + st.charge_A * d + st.charge_B
    else:
        phi = erfc_r
    qq = qbar[:, None] * qbar[jidx]
    pe = jnp.sum(jnp.where(okq, 0.5 * qq * phi, 0.0), axis=1)
    if st.charge_mode == 1:
        two_alpha_over_sqrt_pi = 2.0 * st.alpha_q / np.sqrt(np.pi)
        pe = pe - 0.5 * two_alpha_over_sqrt_pi * qbar * qbar
    return K_C_SP * pe


def _qnep_energy_atoms(pos, eps, types, verlet, matrix, inv, boundary, nvec,
                       c_radial, c_angular, w0, b0, w1, b1, q_scaler,
                       atomic_numbers, w1c, st: _NEPStatic):
    """Per-atom qNEP energies under a virtual strain eps.

    The charge mean is stop_gradient-ed: the reference differentiates the
    raw (un-zeroed) ANN charges when chaining dE_elec/dq into the forces
    (find_force_radial_small_box nep.cpp:708 uses charge_derivative of the
    raw head times D_real at the zeroed charges)."""
    ok = verlet >= 0
    j = jnp.maximum(verlet, 0)
    strain = jnp.eye(3, dtype=pos.dtype) + eps
    disp = pos[j] - pos[:, None, :]
    frac = disp @ inv
    frac = frac - jnp.round(frac) * boundary
    disp = (frac @ matrix) @ strain
    safe = jnp.array([1.0, 0.0, 0.0], disp.dtype)
    disp = jnp.where(ok[..., None], disp, safe)
    ti = types[:, None]
    tj = types[j]
    q, d = _descriptor_from_disp(disp, ok, ti, tj, c_radial, c_angular, st)
    qs = q * q_scaler[None]
    h = jnp.tanh(jnp.einsum("ind,id->in", w0[types], qs) - b0[types])
    e_atom = jnp.sum(w1[types] * h, axis=1) - b1
    charge_raw = jnp.sum(w1c[types] * h, axis=1)
    qbar = charge_raw - jax.lax.stop_gradient(jnp.mean(charge_raw))
    if st.zbl:
        e_atom = e_atom + _zbl_energy(disp, d, ok, ti, tj, atomic_numbers, st)
    if st.charge_mode in (1, 2):
        e_atom = e_atom + _recip_pe(pos @ strain, matrix @ strain, qbar, nvec, st)
    if st.charge_mode in (1, 3):
        e_atom = e_atom + _real_pe(qbar, d, ok, j, st)
    return e_atom, qbar


def _qnep_bec(pos, types, verlet, matrix, inv, boundary,
              c_radial, c_angular, w0, b0, w1c, q_scaler, sqrt_eps,
              st: _NEPStatic):
    """Zero-mean charges + Born effective charges (N, 9).

    BEC_i = sqrt(eps_inf) * [ qbar_i I + sum_pairs +/- 0.5 r12 (x) dq_i/dr12 ]
    matching NEPCPU find_bec_diagonal/radial/angular + scale_bec
    (nep.cpp:832-1026).  One backward pass gives every per-atom charge
    jacobian: q_i depends only on row block disp[i], so
    grad(sum_i q_raw_i) wrt disp == stacked per-atom jacobians."""
    n = pos.shape[0]
    ok = verlet >= 0
    j = jnp.maximum(verlet, 0)
    disp = pos[j] - pos[:, None, :]
    frac = disp @ inv
    frac = frac - jnp.round(frac) * boundary
    disp = frac @ matrix
    safe = jnp.array([1.0, 0.0, 0.0], disp.dtype)
    disp = jnp.where(ok[..., None], disp, safe)
    ti = types[:, None]
    tj = types[j]

    def qsum(disp_):
        q, _ = _descriptor_from_disp(disp_, ok, ti, tj, c_radial, c_angular, st)
        h = jnp.tanh(
            jnp.einsum("ind,id->in", w0[types], q * q_scaler[None]) - b0[types]
        )
        c = jnp.sum(w1c[types] * h, axis=1)
        return jnp.sum(c), c

    (_, charge_raw), J = jax.value_and_grad(qsum, has_aux=True)(disp)
    qbar = charge_raw - jnp.mean(charge_raw)
    pair = 0.5 * disp[:, :, :, None] * J[:, :, None, :]  # (n, M, 3, 3)
    pair = jnp.where(ok[:, :, None, None], pair, 0.0)
    bec = qbar[:, None, None] * jnp.eye(3, dtype=pos.dtype) + jnp.sum(pair, axis=1)
    seg = jnp.where(ok, j, n).reshape(-1)
    sub = jax.ops.segment_sum(pair.reshape(-1, 3, 3), seg, num_segments=n + 1)[:n]
    bec = (bec - sub) * sqrt_eps
    return qbar, bec.reshape(n, 9)


@functools.partial(jax.jit, static_argnames=("st",))
def _qnep_compute(pos, types, verlet, matrix, inv, boundary, nvec,
                  c_radial, c_angular, w0, b0, w1, b1, q_scaler, atomic_numbers,
                  w1c, sqrt_eps, st: _NEPStatic):
    eps0 = jnp.zeros((3, 3), dtype=pos.dtype)

    def total(p, e):
        e_atom, _ = _qnep_energy_atoms(
            p, e, types, verlet, matrix, inv, boundary, nvec,
            c_radial, c_angular, w0, b0, w1, b1, q_scaler,
            atomic_numbers, w1c, st,
        )
        return jnp.sum(e_atom), e_atom

    (_, e_atom), grads = jax.value_and_grad(total, argnums=(0, 1), has_aux=True)(
        pos, eps0
    )
    forces = -grads[0]
    dEdeps = grads[1]
    charges, bec = _qnep_bec(
        pos, types, verlet, matrix, inv, boundary,
        c_radial, c_angular, w0, b0, w1c, q_scaler, sqrt_eps, st,
    )
    return e_atom, forces, dEdeps, charges, bec


