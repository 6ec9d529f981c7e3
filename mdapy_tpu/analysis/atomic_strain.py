"""Per-atom Green-Lagrange strain from two configurations (Shimizu/Ogata/Li).

Parity: reference atomic_strain.py:14-246 + src/atomic_strain.cpp:220 —
V = sum dref dref^T, W = sum dref dcur^T (with the reference's index
convention V[m,n] += ref[n]*ref[m]), F = (W V^-1)^T, eps = (F^T F - I)/2,
von-Mises shear + hydrostatic volumetric outputs, optional affine box remap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box
from .common import min_image_jnp

__all__ = ["AtomicStrain"]


class AtomicStrain:
    def __init__(self, rc: float, ref, affine: bool = False, max_neigh=None):
        self.ref = ref
        self.rc = float(rc)
        self.affine = bool(affine)
        self.ref.build_neighbor(self.rc, max_neigh)

    def compute(self, current):
        assert current.N == self.ref.N
        cur_pos = current.pos
        cur_box = current.box
        if self.affine:
            map_matrix = np.linalg.solve(cur_box.matrix, self.ref.box.matrix)
            cur_pos = cur_pos @ map_matrix
            cur_box = Box(self.ref.box)
        shear, vol = _strain(
            jnp.asarray(self.ref.verlet_list),
            jnp.asarray(self.ref.pos),
            jnp.asarray(cur_pos),
            jnp.asarray(self.ref.box.matrix), jnp.asarray(self.ref.box.inverse_box),
            jnp.asarray(cur_box.matrix), jnp.asarray(np.linalg.inv(cur_box.matrix)),
            jnp.asarray(self.ref.box.boundary.astype(np.float64)),
        )
        current.data["shear_strain"] = np.asarray(shear)
        current.data["volumetric_strain"] = np.asarray(vol)
        self.shear_strain = np.asarray(shear)
        self.volumetric_strain = np.asarray(vol)
        return self


@jax.jit
def _strain(verlet, ref_pos, cur_pos, ref_m, ref_inv, cur_m, cur_inv, bnd):
    ok = verlet >= 0
    j = jnp.maximum(verlet, 0)
    dref = ref_pos[j] - ref_pos[:, None, :]
    dref = min_image_jnp(dref, ref_m, ref_inv, bnd)
    dcur = cur_pos[j] - cur_pos[:, None, :]
    dcur = min_image_jnp(dcur, cur_m, cur_inv, bnd)
    dref = jnp.where(ok[..., None], dref, 0.0)
    dcur = jnp.where(ok[..., None], dcur, 0.0)
    # V[m,n] = sum ref[n]*ref[m]; W[m,n] = sum ref[n]*cur[m]
    V = jnp.einsum("ijn,ijm->imn", dref, dref)
    W = jnp.einsum("ijn,ijm->imn", dref, dcur)
    F = jnp.swapaxes(W @ jnp.linalg.inv(V), 1, 2)
    eps = 0.5 * (jnp.swapaxes(F, 1, 2) @ F - jnp.eye(3, dtype=F.dtype)[None])
    exx, eyy, ezz = eps[:, 0, 0], eps[:, 1, 1], eps[:, 2, 2]
    exy, exz, eyz = eps[:, 0, 1], eps[:, 0, 2], eps[:, 1, 2]
    shear = jnp.sqrt(
        exy**2 + exz**2 + eyz**2
        + ((exx - eyy) ** 2 + (exx - ezz) ** 2 + (eyy - ezz) ** 2) / 6.0
    )
    volumetric = (exx + eyy + ezz) / 3.0
    return shear, volumetric
