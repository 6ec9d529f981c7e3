"""EAM (eam.alloy / setfl) potential — JAX evaluation, LAMMPS-spline parity.

Parity: reference eam.py:141-523 + src/eam.cpp + src/spline.h — the uniform
cubic-Hermite spline with LAMMPS/GPUMD finite-difference node derivatives,
r*phi (z2r) pair channel, two-pass density/embedding + pair force evaluation,
per-atom virials with the 0.5 pair factor, Voigt stress.

The whole evaluation is one jitted function over (N, M) neighbor tensors —
batched table lookups + VPU arithmetic, autodiff-compatible end to end (the
analytic derivative path mirrors the kernel exactly for LAMMPS parity).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.neighbor import neighbor_search, replicate_for_small_box
from .calculator import CalculatorMP

__all__ = ["EAM", "EAMAverage", "lammps_spline_coeffs", "spline_eval"]

# lo-width of the two-level spline-table lookup (idx = hi*_LANE + lo)
_LANE = 16


def lammps_spline_coeffs(y: np.ndarray) -> np.ndarray:
    """Node derivatives (in normalized coordinate) of the LAMMPS spline.

    fp[0] = y1-y0; fp[1] = (y2-y0)/2;
    fp[m] = ((y[m-2]-y[m+2]) + 8(y[m+1]-y[m-1]))/12;
    fp[n-2] = (y[n-1]-y[n-3])/2; fp[n-1] = y[n-1]-y[n-2].
    (spline.h LAMMPS convention block.)"""
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[-1]
    fp = np.empty_like(y)
    fp[..., 0] = y[..., 1] - y[..., 0]
    fp[..., 1] = 0.5 * (y[..., 2] - y[..., 0])
    fp[..., 2 : n - 2] = (
        (y[..., 0 : n - 4] - y[..., 4:n]) + 8.0 * (y[..., 3 : n - 1] - y[..., 1 : n - 3])
    ) / 12.0
    fp[..., n - 2] = 0.5 * (y[..., n - 1] - y[..., n - 3])
    fp[..., n - 1] = y[..., n - 1] - y[..., n - 2]
    return fp


def spline_eval(y, fp, h, x, idx=()):
    """Evaluate (f, df/dx) of the LAMMPS spline; x clamped to the table.

    y/fp are tables of shape ``idx_dims + (ntab,)``; ``idx`` is a tuple of
    integer arrays (broadcast-compatible with x) selecting the leading table
    dims per evaluation point. Only the two bracketing nodes are gathered
    per point — never the whole table — so memory stays O(x.size)."""
    n = y.shape[-1]
    m = jnp.clip(jnp.floor(x / h).astype(jnp.int32), 0, n - 2)
    dx = jnp.clip(x - m * h, 0.0, h)
    idx = tuple(idx)
    ym = y[idx + (m,)]
    yp = y[idx + (m + 1,)]
    fm = fp[idx + (m,)]
    fpp = fp[idx + (m + 1,)]
    a = ym
    b = fm / h
    c = (3.0 * (yp - ym) - 2.0 * fm - fpp) / (h * h)
    d = (fm + fpp - 2.0 * (yp - ym)) / (h * h * h)
    f = a + dx * (b + dx * (c + dx * d))
    df = b + dx * (2.0 * c + 3.0 * dx * d)
    return f, df


class EAM(CalculatorMP):
    """eam.alloy (setfl) potential (reference eam.py:141-523)."""

    def __init__(self, filename: str):
        super().__init__()
        self.filename = filename
        self._read_eam_alloy()
        # precompute spline node derivatives
        self._F_fp = lammps_spline_coeffs(self.F_rho)
        self._rho_fp = lammps_spline_coeffs(self.rho_r)
        self._z2r_fp = lammps_spline_coeffs(self._rphi_r)

    # -- parsing -----------------------------------------------------------
    def _read_eam_alloy(self) -> None:
        with open(self.filename) as f:
            lines = f.readlines()
        self.header = lines[:3]
        line4 = lines[3].split()
        self.Nelements = int(line4[0])
        self.elements_list = line4[1 : 1 + self.Nelements]
        line5 = lines[4].split()
        self.nrho = int(line5[0])
        self.drho = float(line5[1])
        self.nr = int(line5[2])
        self.dr = float(line5[3])
        self.rc = float(line5[4])
        self.r = np.arange(self.nr) * self.dr
        self.rho = np.arange(self.nrho) * self.drho

        idx = [5]

        def read_section(count: int) -> np.ndarray:
            out = np.empty(count)
            got = 0
            while got < count and idx[0] < len(lines):
                toks = lines[idx[0]].split("#")[0].split()
                for t in toks:
                    if got >= count:
                        break
                    out[got] = float(t)
                    got += 1
                idx[0] += 1
            if got < count:
                raise ValueError(f"EAM file truncated: wanted {count}, got {got}")
            return out

        self.F_rho = np.zeros((self.Nelements, self.nrho))
        self.rho_r = np.zeros((self.Nelements, self.nr))
        for e in range(self.Nelements):
            idx[0] += 1  # per-element info line
            self.F_rho[e] = read_section(self.nrho)
            self.rho_r[e] = read_section(self.nr)
        self._rphi_r = np.zeros((self.Nelements, self.Nelements, self.nr))
        for i in range(self.Nelements):
            for j in range(i + 1):
                self._rphi_r[i, j] = read_section(self.nr)
                if i != j:
                    self._rphi_r[j, i] = self._rphi_r[i, j]
        self.phi_r = np.zeros_like(self._rphi_r)
        self.phi_r[:, :, 1:] = self._rphi_r[:, :, 1:] / self.r[1:]
        self.phi_r[:, :, 0] = self.phi_r[:, :, 1]

    def write_eam_alloy(self, output_name: Optional[str] = None) -> str:
        """Write the tables back in setfl format (eam.py:221)."""
        if output_name is None:
            output_name = "".join(self.elements_list) + ".eam.alloy"
        with open(output_name, "w") as f:
            for ln in self.header:
                f.write(ln if ln.endswith("\n") else ln + "\n")
            f.write(f"    {self.Nelements} " + " ".join(self.elements_list) + "\n")
            f.write(
                f"{self.nrho} {self.drho:.16E} {self.nr} {self.dr:.16E} {self.rc:.10f}\n"
            )
            from ..core.elements import atomic_masses, atomic_numbers

            def dump(arr):
                for k in range(0, len(arr), 5):
                    f.write(" ".join(f"{v: .16E}" for v in arr[k : k + 5]) + "\n")

            for e, name in enumerate(self.elements_list):
                z = atomic_numbers.get(name, 0)
                f.write(f"{z} {atomic_masses[z]:.6f} 0.0 none\n")
                dump(self.F_rho[e])
                dump(self.rho_r[e])
            for i in range(self.Nelements):
                for j in range(i + 1):
                    dump(self._rphi_r[i, j])
        return output_name

    # -- evaluation --------------------------------------------------------
    def _eval_tables(self):
        """Spline node tables in the two forms the kernel uses.

        ``*_flat``: packed rows [y_m, y_{m+1}, fp_m, fp_{m+1}] per (group,
        node) for the row-gather path — one 4-wide row gather fetches the
        whole local cubic.  ``*_W``: the same data as an MXU weight matrix
        (H, groups*LANE*4) for the two-level one-hot lookup (see
        _node_lookup), which replaces the scalar-gather unit with matmuls."""
        cached = getattr(self, "_tab_cache", None)
        if cached is not None:
            return cached

        def pack(y, fp):
            # (..., ntab) -> (..., ntab-1, 4) rows [y_m, y_{m+1}-y_m, fp_m,
            # fp_{m+1}].  The interval DIFFERENCE is stored (computed here
            # in f64) rather than the right node: the Hermite coefficients
            # divide (y1 - y0) by h^2, so storing the endpoints would
            # amplify per-node representation error by ~1/h under
            # cancellation — storing dy keeps every consumed quantity's
            # error relative to its own magnitude.
            return np.stack(
                [y[..., :-1], np.diff(y, axis=-1), fp[..., :-1], fp[..., 1:]],
                axis=-1,
            )

        def weights(packed):
            """(G, rows, 4) -> (3, H, G*LANE*4) bf16 weight pieces.

            Same hi-bucket-major layout as before (the one-hot matmul runs
            over the H=ceil(rows/16) hi axis; the remaining per-pair
            selections are tiny: G groups then the 16-wide lo residue), but
            the f32 node values are split into three bf16 pieces (hi + mid
            + lo residuals, exact f64 residual arithmetic).  Three bf16
            one-hot matmuls with f32 accumulation reconstruct each value to
            ~2^-27 relative (≈ f32 roundoff) at ~2x the speed of the one
            f32-HIGHEST matmul this replaces (XLA lowers HIGHEST f32 dots
            to 6 bf16 passes)."""
            import ml_dtypes

            G, rows, _ = packed.shape
            H = -(-rows // _LANE)
            pad = np.zeros((G, H * _LANE - rows, 4), packed.dtype)
            seg = np.concatenate([packed, pad], axis=1).reshape(
                G, H, _LANE * 4
            )
            w = np.ascontiguousarray(
                np.transpose(seg, (1, 0, 2))
            ).reshape(H, G * _LANE * 4)
            pieces = []
            rem = w.astype(np.float64)
            for _ in range(3):
                p = rem.astype(np.float32).astype(ml_dtypes.bfloat16)
                pieces.append(p)
                rem = rem - p.astype(np.float64)
            return jnp.asarray(np.stack(pieces))

        nt = self.Nelements
        rho_p = pack(self.rho_r, self._rho_fp)
        z2r_p = pack(self._rphi_r, self._z2r_fp).reshape(
            nt * nt, self.nr - 1, 4
        )
        F_p = pack(self.F_rho, self._F_fp)
        self._tab_cache = dict(
            rho_flat=jnp.asarray(rho_p.reshape(-1, 4)),
            z2r_flat=jnp.asarray(z2r_p.reshape(-1, 4)),
            F_flat=jnp.asarray(F_p.reshape(-1, 4)),
            rho_W=jnp.asarray(weights(rho_p)),
            z2r_W=jnp.asarray(weights(z2r_p)),
            F_W=jnp.asarray(weights(F_p)),
        )
        return self._tab_cache

    def calculate(self, system) -> None:
        # element->type mapping is invariant across force calls on the same
        # frame (a minimizer/MD loop moves atoms, not species) — cache it on
        # the system, keyed on the element COLUMN OBJECT plus a cheap content
        # fingerprint: id(system.data) alone misses in-place species edits
        # (MC swaps replace column values on the same frame object) and ids
        # can be recycled after GC.  The fingerprint samples head/tail/stride
        # of the raw element codes, so any realistic species change (swap,
        # relabel, column replacement) invalidates the cache.
        elems = np.asarray(system.data["element"])
        stride = max(1, elems.size // 8192)
        fp = hash((tuple(elems[:64]), tuple(elems[-64:]),
                   tuple(elems[::stride])))
        ckey = (system.N, tuple(self.elements_list), fp)
        cached = getattr(system, "_eam_type_cache", None)
        if cached is not None and cached[0] == ckey:
            types = cached[1]
        else:
            elems = elems.astype(str)
            uniq, inv = np.unique(elems, return_inverse=True)
            for e in uniq.tolist():
                if e not in self.elements_list:
                    raise ValueError(
                        f"{e} not supported by this EAM potential "
                        f"({self.elements_list})"
                    )
            lutv = np.array(
                [self.elements_list.index(e) for e in uniq.tolist()], np.int32
            )
            types = lutv[inv]
            try:
                system._eam_type_cache = (ckey, types)
            except AttributeError:
                pass
        old_n = system.N
        pos, box, n_images = replicate_for_small_box(system.pos, system.box, self.rc)
        if n_images > 1:
            types = np.tile(types, n_images)
        from ..neighbor.neighbor import neighbor_search_device

        # box already enlarged, so indices refer to the replicated atom set.
        # defer_check overlaps the capacity-validation fetch (~30 ms tunnel
        # roundtrip) with the force kernel's device execution below
        pos_d, verlet_d, cnt_d, _, _nbr_check = neighbor_search_device(
            pos, box, self.rc, defer_check=True
        )
        tab = self._eval_tables()
        nt = self.Nelements
        # one-hot MXU lookups when the matmul stays small (H*groups bounds
        # the per-pair FLOPs); the row-gather path covers big multi-element
        # tables and the CPU backend (whose native gathers are fast)
        H = -(-(self.nr - 1) // _LANE)
        _mxu_env = os.environ.get("MDAPY_TPU_EAM_MXU", "")
        use_mxu = (
            jax.default_backend() != "cpu" and H * nt * nt <= 2048
            if _mxu_env == "" else _mxu_env != "0"
        )
        pack8 = jnp.concatenate(
            [
                pos_d,
                jnp.asarray(types, pos_d.dtype)[:, None],
                jnp.zeros((pos_d.shape[0], 4), pos_d.dtype),
            ],
            axis=1,
        )
        energy, force, virial = _eam_force_fast(
            pack8, verlet_d,
            jnp.asarray(box.matrix, pos_d.dtype),
            jnp.asarray(box.inverse_box, pos_d.dtype),
            jnp.asarray(box.boundary.astype(np.float64), pos_d.dtype),
            tab["rho_flat"], tab["z2r_flat"], tab["F_flat"],
            tab["rho_W"], tab["z2r_W"], tab["F_W"],
            self.drho, self.dr, self.rc,
            self.nr, self.nrho, nt,
            _eam_block(pos_d.shape[0], verlet_d.shape[1]),
            use_mxu,
        )
        # the force dispatch above is async; the deferred neighbor-capacity
        # validation fetch has been riding the wire meanwhile.  On the rare
        # violation (grown occupancy/neighbor count vs the caches), redo
        # the force call with the corrected Verlet list.
        fixed = _nbr_check()
        if fixed is not None:
            verlet_d, cnt_d = fixed
            energy, force, virial = _eam_force_fast(
                pack8, verlet_d,
                jnp.asarray(box.matrix, pos_d.dtype),
                jnp.asarray(box.inverse_box, pos_d.dtype),
                jnp.asarray(box.boundary.astype(np.float64), pos_d.dtype),
                tab["rho_flat"], tab["z2r_flat"], tab["F_flat"],
                tab["rho_W"], tab["z2r_W"], tab["F_W"],
                self.drho, self.dr, self.rc,
                self.nr, self.nrho, nt,
                _eam_block(pos_d.shape[0], verlet_d.shape[1]),
                use_mxu,
            )
        # results stay device-resident; CalculatorMP._fetch materializes on
        # first host access.  Stress is assembled on device (Voigt, same
        # convention as stress_from_virials).
        vsum = jnp.sum(virial, axis=0).reshape(3, 3)
        stress = (-0.5 * (vsum + vsum.T) / abs(box.volume)).ravel()[
            jnp.array([0, 4, 8, 5, 2, 1])
        ]
        self.results["energies"] = energy[:old_n]
        self.results["forces"] = force[:old_n]
        self.results["virials"] = virial[:old_n]
        self.results["stress"] = stress

    def plot(self, fig=None, ax=None):
        import matplotlib.pyplot as plt

        if fig is None:
            fig, ax = plt.subplots(1, 3, figsize=(12, 3.2))
        for e, name in enumerate(self.elements_list):
            ax[0].plot(self.rho, self.F_rho[e], label=name)
            ax[1].plot(self.r, self.rho_r[e], label=name)
            ax[2].plot(self.r[1:], self.phi_r[e, e, 1:], label=name)
        ax[0].set_xlabel(r"$\rho$"); ax[0].set_ylabel(r"F($\rho$) (eV)")
        ax[1].set_xlabel(r"r ($\AA$)"); ax[1].set_ylabel(r"$\rho$(r)")
        ax[2].set_xlabel(r"r ($\AA$)"); ax[2].set_ylabel(r"$\phi$(r) (eV)")
        ax[2].set_ylim(-1, 5)
        for a in ax:
            a.legend(fontsize=7)
        return fig, ax


def _eam_block(n: int, M: int) -> int:
    target = max(1, (1 << 23) // max(M, 1))
    b = 1 << max(0, (min(n, target) - 1)).bit_length()
    return max(128, min(b, 16384))


def _node_lookup(m, groups, W, flat, n_rows: int, use_mxu: bool):
    """Bracketing spline-node data per evaluation point, per group table.

    m: (..., ) int32 node index within a table of `n_rows` packed rows;
    `groups`: tuple of same-shaped int32 group ids (element / element-pair);
    returns one (y0, y1, fp0, fp1) tuple per entry in `groups`.

    MXU path: the lookup index factorizes as m = hi*LANE + lo, so one
    one-hot(hi) bf16 matmul per table piece (three pieces: the f32 node
    values split into bf16 hi/mid/lo residuals, see ``weights``) against
    (H, G*LANE*4) weights pulls every group's 4-node row for all LANE
    residues at once with f32 accumulation — the one-hot makes every output
    the sum of the three pieces of a single table value, reconstructing it
    to ~2^-27 relative (≈ f32 roundoff) at ~2x the speed of the
    f32-HIGHEST dot it replaces.  Group and residue are then selected with
    tiny masked VPU sums.  This sidesteps the TPU scalar-gather unit
    (~7 ns/element — a 1.4M-element gather costs ~10 ms).

    Gather path (CPU, or large multi-element tables): one 4-wide row gather
    per group from the flat packed table.
    """
    if use_mxu:
        shp = m.shape
        flatm = m.reshape(-1)
        H = W.shape[1]
        G = W.shape[2] // (_LANE * 4)
        hi = flatm // _LANE
        lo = flatm % _LANE
        oh_hi = (
            hi[:, None] == jnp.arange(H, dtype=hi.dtype)[None]
        ).astype(jnp.bfloat16)
        R = None
        for piece in range(W.shape[0]):
            part = jax.lax.dot_general(
                oh_hi, W[piece], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            R = part if R is None else R + part
        R = R.reshape(-1, G, _LANE, 4)
        sel_lo = (
            lo[:, None] == jnp.arange(_LANE, dtype=lo.dtype)[None]
        ).astype(R.dtype)
        out = []
        for g in groups:
            if G == 1:
                Rg = R[:, 0]
            else:
                sel_g = (
                    g.reshape(-1)[:, None]
                    == jnp.arange(G, dtype=jnp.int32)[None]
                ).astype(R.dtype)
                Rg = jnp.sum(R * sel_g[:, :, None, None], axis=1)
            v = jnp.sum(Rg * sel_lo[:, :, None], axis=1)
            out.append(tuple(v[:, c].reshape(shp) for c in range(4)))
        return out
    out = []
    for g in groups:
        rows = flat[g * n_rows + m]
        out.append(tuple(rows[..., c] for c in range(4)))
    return out


def _hermite(nodes, dx, h):
    """(f, df) of the LAMMPS cubic from node data (y_m, y_{m+1}-y_m, fp_m,
    fp_{m+1}); dx in [0, h] is the offset inside the interval."""
    y0, dy, f0, f1 = nodes
    b = f0 / h
    c = (3.0 * dy - 2.0 * f0 - f1) / (h * h)
    d = (f0 + f1 - 2.0 * dy) / (h * h * h)
    f = y0 + dx * (b + dx * (c + dx * d))
    df = b + dx * (2.0 * c + 3.0 * dx * d)
    return f, df


@functools.partial(
    jax.jit, static_argnames=("nr", "nrho", "nt", "block", "use_mxu")
)
def _eam_force_fast(
    pack8, verlet, matrix, inv, boundary,
    rho_flat, z2r_flat, F_flat, rho_W, z2r_W, F_W,
    drho, dr, rc, nr: int, nrho: int, nt: int, block: int, use_mxu: bool,
):
    """TPU-fast EAM: gather-minimal two-pass evaluation.

    Parity: reference src/eam.cpp:40 (density pass -> embedding -> pair
    force pass) with the full symmetric chain phi' + dF_i*rho_j' +
    dF_j*rho_i' applied per pair, so no reverse-pair permutation is needed
    and every output is a block-local reduction.

    The TPU scalar-gather unit is the bottleneck (~14 ns per gathered row),
    so the kernel touches it as little as possible:
      * pass 1 issues ONE (B, M, 8) neighbor row gather (position + type in
        one fetch) and evaluates EVERY pair channel — pair density, z2r and
        both rho' derivatives are functions of geometry alone, not of the
        embedding — staging the per-pair force factors (w0, wj, wi) and
        displacement components in HBM;
      * pass 2 re-reads those staged arrays densely and issues only the one
        unavoidable gather, dF[j], closing the dF_i/dF_j chain.
    Spline-node data comes from the MXU one-hot lookup (_node_lookup), not
    gathers, whenever the tables are small enough.
    """
    n, M = verlet.shape
    dtype = pack8.dtype
    npad = -(-n // block) * block
    nblk = npad // block

    def pad_rows(a, pv):
        cfg = [(0, npad - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=pv).reshape(
            (nblk, block) + a.shape[1:]
        )

    verlet_b = pad_rows(verlet, -1)
    pack_b = pad_rows(pack8, 0.0)

    # ---- pass 1: geometry + every geometry-only pair channel ------------
    def pair_blk(args):
        rows_i, vb = args
        okb = vb >= 0
        nbr = pack8[jnp.maximum(vb, 0)]          # ONE (B, M, 8) row gather
        cx = nbr[..., 0] - rows_i[:, 0, None]
        cy = nbr[..., 1] - rows_i[:, 1, None]
        cz = nbr[..., 2] - rows_i[:, 2, None]
        fa = cx * inv[0, 0] + cy * inv[1, 0] + cz * inv[2, 0]
        fb = cx * inv[0, 1] + cy * inv[1, 1] + cz * inv[2, 1]
        fc = cx * inv[0, 2] + cy * inv[1, 2] + cz * inv[2, 2]
        fa = fa - jnp.round(fa) * boundary[0]
        fb = fb - jnp.round(fb) * boundary[1]
        fc = fc - jnp.round(fc) * boundary[2]
        ddx = fa * matrix[0, 0] + fb * matrix[1, 0] + fc * matrix[2, 0]
        ddy = fa * matrix[0, 1] + fb * matrix[1, 1] + fc * matrix[2, 1]
        ddz = fa * matrix[0, 2] + fb * matrix[1, 2] + fc * matrix[2, 2]
        d = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        okb = okb & (d <= rc)
        d0 = jnp.where(okb, d, 0.0)
        m = jnp.clip(jnp.floor(d0 / dr).astype(jnp.int32), 0, nr - 2)
        dx = jnp.clip(d0 - m.astype(dtype) * dr, 0.0, dr)
        tj = nbr[..., 3].astype(jnp.int32)
        ti = rows_i[:, 3].astype(jnp.int32)
        tib = jnp.broadcast_to(ti[:, None], tj.shape)

        nodes_j, nodes_i = _node_lookup(
            m, (tj, tib), rho_W, rho_flat, nr - 1, use_mxu
        )
        rho_ij, drho_j = _hermite(nodes_j, dx, dr)
        _, drho_i = _hermite(nodes_i, dx, dr)
        (z_nodes,) = _node_lookup(
            m, (tib * nt + tj,), z2r_W, z2r_flat, nr - 1, use_mxu
        )
        z2, dz2 = _hermite(z_nodes, dx, dr)

        rinv = 1.0 / jnp.where(okb, d0, 1.0)
        phi = z2 * rinv
        dphi = (dz2 - phi) * rinv
        rho_i = jnp.sum(jnp.where(okb, rho_ij, 0.0), axis=1)
        e_pair = jnp.sum(jnp.where(okb, 0.5 * phi, 0.0), axis=1)
        # staged force factors: w = w0 + dF_i*wj + dF_j*wi  (pass 2)
        w0 = jnp.where(okb, dphi * rinv, 0.0)
        wj = jnp.where(okb, drho_j * rinv, 0.0)
        wi = jnp.where(okb, drho_i * rinv, 0.0)
        return (rho_i, e_pair), (ddx, ddy, ddz, w0, wj, wi)

    (rho_i, e_pair), staged = jax.lax.map(pair_blk, (pack_b, verlet_b))
    rho_i = rho_i.reshape(npad)[:n]
    e_pair = e_pair.reshape(npad)[:n]

    # ---- embedding (per atom) ------------------------------------------
    ti_all = pack8[:, 3].astype(jnp.int32)
    mrho = jnp.clip(jnp.floor(rho_i / drho).astype(jnp.int32), 0, nrho - 2)
    dxr = jnp.clip(rho_i - mrho.astype(dtype) * drho, 0.0, drho)
    (F_nodes,) = _node_lookup(mrho, (ti_all,), F_W, F_flat, nrho - 1, use_mxu)
    F_i, dF_i = _hermite(F_nodes, dxr, drho)
    # LAMMPS linearly extrapolates F beyond the table (pair_eam.cpp:
    # "if (rho > rhomax) phi += fp * (rho - rhomax)")
    rho_max = (nrho - 1) * drho
    F_i = jnp.where(rho_i > rho_max, F_i + dF_i * (rho_i - rho_max), F_i)
    dF_pad = jnp.pad(dF_i, (0, npad - n)).reshape(nblk, block)

    # ---- pass 2: close the dF chain; forces + virials -------------------
    def force_blk(args):
        vb, dFb, ddx, ddy, ddz, w0, wj, wi = args
        dFj = dF_i[jnp.maximum(vb, 0)]           # the one scalar gather
        w = w0 + dFb[:, None] * wj + dFj * wi
        wx, wy, wz = w * ddx, w * ddy, w * ddz
        force = (wx.sum(1), wy.sum(1), wz.sum(1))
        comps = ((ddx, wx), (ddx, wy), (ddx, wz),
                 (ddy, wx), (ddy, wy), (ddy, wz),
                 (ddz, wx), (ddz, wy), (ddz, wz))
        virial = tuple(-0.5 * (a * b).sum(1) for a, b in comps)
        return force, virial

    force_c, virial_c = jax.lax.map(
        force_blk, (verlet_b, dF_pad) + staged
    )
    force = jnp.stack([c.reshape(npad)[:n] for c in force_c], axis=-1)
    virial = jnp.stack([c.reshape(npad)[:n] for c in virial_c], axis=-1)
    return F_i + e_pair, force, virial


class EAMAverage(EAM):
    """A-atom average potential for HEAs (reference eam.py:558)."""

    def __init__(self, filename: str, concentration):
        super().__init__(filename)
        conc = np.asarray(concentration, dtype=np.float64)
        assert len(conc) == self.Nelements and abs(conc.sum() - 1.0) < 1e-6
        self.concentration = conc
        # averaged single-element tables appended as element "A"
        F_avg = np.sum(conc[:, None] * self.F_rho, axis=0, keepdims=True)
        rho_avg = np.sum(conc[:, None] * self.rho_r, axis=0, keepdims=True)
        z2_avg = np.einsum("i,j,ijr->r", conc, conc, self._rphi_r)[None, None]
        ne = self.Nelements + 1
        newF = np.concatenate([self.F_rho, F_avg], axis=0)
        newrho = np.concatenate([self.rho_r, rho_avg], axis=0)
        newz2 = np.zeros((ne, ne, self.nr))
        newz2[: ne - 1, : ne - 1] = self._rphi_r
        newz2[ne - 1, ne - 1] = z2_avg[0, 0]
        for i in range(ne - 1):
            cross = np.sum(conc[:, None] * self._rphi_r[i], axis=0)
            newz2[i, ne - 1] = newz2[ne - 1, i] = cross
        self.F_rho, self.rho_r, self._rphi_r = newF, newrho, newz2
        self.Nelements = ne
        self.elements_list = self.elements_list + ["A"]
        self.phi_r = np.zeros_like(self._rphi_r)
        self.phi_r[:, :, 1:] = self._rphi_r[:, :, 1:] / self.r[1:]
        self.phi_r[:, :, 0] = self.phi_r[:, :, 1]
        self._F_fp = lammps_spline_coeffs(self.F_rho)
        self._rho_fp = lammps_spline_coeffs(self.rho_r)
        self._z2r_fp = lammps_spline_coeffs(self._rphi_r)


class EAMGenerator:
    """Generate eam.alloy files with the Zhou-Johnson-Wadley parameterisation.

    Parity: reference eam.py:697-1475 (EAMGenerator; functional forms of
    Zhou, Johnson & Wadley, PRB 69, 144113 (2004)). Profiles are evaluated
    on vectorised r/rho grids.
    """

    DEFAULT_NR = 2000
    DEFAULT_NRHO = 2000
    DEFAULT_RST = 0.5

    def __init__(self, elements_list, output_filename=None,
                 nr=DEFAULT_NR, nrho=DEFAULT_NRHO, rst=DEFAULT_RST):
        from ._zjw04_params import ZJW04_PARAMS

        for e in elements_list:
            if e not in ZJW04_PARAMS:
                raise ValueError(
                    f"Element '{e}' is not supported. Supported elements: "
                    f"{', '.join(ZJW04_PARAMS)}"
                )
        self.elements_list = list(elements_list)
        self.n_elements = len(elements_list)
        self.nr, self.nrho, self.rst = int(nr), int(nrho), float(rst)
        self.output_filename = output_filename or (
            "".join(elements_list) + ".eam.alloy"
        )
        p = np.array([ZJW04_PARAMS[e] for e in elements_list], dtype=np.float64)
        (self.re, self.fe, self.rhoe, self.rhos, self.alpha, self.beta,
         self.A, self.B, self.kappa, self.lam, self.Fi0, self.Fi1, self.Fi2,
         self.Fi3, self.Fm0, self.Fm1, self.Fm2, self.Fm3, self.eta, self.Fn,
         zahl, self.atomic_mass, self.Fm4, self.beta1, self.lam1,
         rhol, rhoh) = p.T
        self.atomic_number = zahl.astype(np.int32)
        self.lattice_constant = np.sqrt(2.0) * self.re
        self.rhoin = rhol * self.rhoe
        self.rhoout = rhoh * self.rhoe
        self.rc = np.sqrt(10.0) / 2.0 * self.lattice_constant.max()
        self.dr = self.rc / (self.nr - 1.0)
        self._tabulate()
        self._write()

    # ----- ZJW functional forms (vectorised over the r grid) -------------
    def _f_density(self, it, r):
        return (self.fe[it] * np.exp(-self.beta1[it] * (r / self.re[it] - 1.0))
                / (1.0 + (r / self.re[it] - self.lam1[it]) ** 20))

    def _phi_same(self, it, r):
        x = r / self.re[it]
        psi1 = self.A[it] * np.exp(-self.alpha[it] * (x - 1.0)) / (
            1.0 + (x - self.kappa[it]) ** 20)
        psi2 = self.B[it] * np.exp(-self.beta[it] * (x - 1.0)) / (
            1.0 + (x - self.lam[it]) ** 20)
        return psi1 - psi2

    def _phi(self, it1, it2, r):
        if it1 == it2:
            return self._phi_same(it1, r)
        fa, fb = self._f_density(it1, r), self._f_density(it2, r)
        pa, pb = self._phi_same(it1, r), self._phi_same(it2, r)
        return 0.5 * (fb / fa * pa + fa / fb * pb)

    def _embed(self, it, rho):
        Fm3 = np.where(rho < self.rhoe[it], self.Fm3[it], self.Fm4[it])
        xin = rho / self.rhoin[it] - 1.0
        xe = rho / self.rhoe[it] - 1.0
        xs = rho / np.maximum(self.rhos[it], 1e-300)
        inner = (self.Fi0[it] + self.Fi1[it] * xin + self.Fi2[it] * xin ** 2
                 + self.Fi3[it] * xin ** 3)
        mid = (self.Fm0[it] + self.Fm1[it] * xe + self.Fm2[it] * xe ** 2
               + Fm3 * xe ** 3)
        with np.errstate(divide="ignore", invalid="ignore"):
            outer = (self.Fn[it] * (1.0 - self.eta[it] * np.log(xs))
                     * xs ** self.eta[it])
        outer = np.where(np.isfinite(outer), outer, inner)
        return np.where(rho < self.rhoin[it], inner,
                        np.where(rho < self.rhoout[it], mid, outer))

    def _tabulate(self):
        nt = self.n_elements
        r = np.maximum(np.arange(self.nr) * self.dr, self.rst)
        self.rho_table = np.zeros((self.nr, nt))
        self.rphi_table = np.zeros((self.nr, nt, nt))
        for i1 in range(nt):
            self.rho_table[:, i1] = self._f_density(i1, r)
            for i2 in range(i1 + 1):
                rphi = r * self._phi(i1, i2, r)
                self.rphi_table[:, i1, i2] = rphi
                self.rphi_table[:, i2, i1] = rphi
        rhom = max(float(self.rho_table.max()), 2.0 * float(self.rhoe.max()),
                   100.0)
        self.drho = rhom / (self.nrho - 1.0)
        rho_grid = np.arange(self.nrho) * self.drho
        self.embedding = np.column_stack(
            [self._embed(it, rho_grid) for it in range(nt)]
        )

    def _write(self):
        import datetime

        def dump(f, arr):
            for idx, v in enumerate(arr):
                if idx % 5 == 0:
                    if idx > 0:
                        f.write("\n")
                    f.write(" ")
                f.write(f"{v:.16E} ")
            f.write("\n")

        with open(self.output_filename, "w") as f:
            f.write(f" eam/alloy {self.n_elements}")
            for e in self.elements_list:
                f.write(f" {e}")
            f.write("\n Generated by mdapy_tpu EAMGenerator "
                    f"({datetime.datetime.now():%Y-%m-%d %H:%M:%S})\n")
            f.write(" CITATION: X. W. Zhou, R. A. Johnson, H. N. G. Wadley, "
                    "Phys. Rev. B, 69, 144113 (2004)\n")
            f.write(f"    {self.n_elements} ")
            for e in self.elements_list:
                f.write(f"{e} ")
            f.write("\n")
            f.write(f" {self.nrho} {self.drho:.16E} {self.nr} "
                    f"{self.dr:.16E} {self.rc:.16E}\n")
            for i in range(self.n_elements):
                f.write(f" {self.atomic_number[i]} {self.atomic_mass[i]:.10f} "
                        f"{self.lattice_constant[i]:.6f} fcc\n")
                dump(f, self.embedding[:, i])
                dump(f, self.rho_table[:, i])
            for i in range(self.n_elements):
                for j in range(i + 1):
                    dump(f, self.rphi_table[:, i, j])
