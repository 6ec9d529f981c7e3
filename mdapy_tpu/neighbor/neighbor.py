"""Fixed-radius neighbor search front-end.

Parity with the reference's Neighbor (reference: neighbor.py:94-142 +
src/neighbor.cpp:102-187): fixed-capacity Verlet lists with a hard overflow
ValueError when the user passes ``max_neigh`` too small, an auto-sizing path
(count pass -> exact capacity), and small-box auto-replication so the
minimum-image convention holds (box.check_small_box).

The verlet list rows are sorted by distance (ascending); -1 pads empty slots.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..core.box import Box, init_box
from ..core.frame import AtomFrame
from . import cell_list as cl

__all__ = ["Neighbor", "neighbor_search", "replicate_for_small_box"]


def replicate_for_small_box(
    pos: np.ndarray, box: Box, rc: float
) -> Tuple[np.ndarray, Box, int]:
    """Tile the system so every periodic thickness >= 2*rc.

    Image 0 is the original atom set, so replica atom ``j`` maps to original
    atom ``j % N``.  Returns (pos_rep, box_rep, n_images).
    """
    repeat = box.check_small_box(rc)
    n_images = int(np.prod(repeat))
    if n_images == 1:
        return pos, box, 1
    shifts = []
    for ix in range(repeat[0]):
        for iy in range(repeat[1]):
            for iz in range(repeat[2]):
                shifts.append(
                    ix * box.matrix[0] + iy * box.matrix[1] + iz * box.matrix[2]
                )
    order = np.argsort([np.linalg.norm(s) for s in shifts], kind="stable")
    shifts = np.array(shifts)[order]
    assert np.allclose(shifts[0], 0.0)
    pos_rep = (pos[None, :, :] + shifts[:, None, :]).reshape(-1, 3)
    box_rep = Box(box.matrix * repeat[:, None].astype(np.float64), box.boundary, box.origin)
    return pos_rep, box_rep, n_images


def neighbor_search(
    pos: np.ndarray,
    box: Box,
    rc: float,
    max_neigh: Optional[int] = None,
    exclude_self: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compute (verlet_list, distance_list, neighbor_number) for one frame.

    Handles small-box replication transparently: returned indices are taken
    modulo N so they always refer to original atoms.  Raises ValueError on
    user-capacity overflow (contract of reference neighbor.py:135-142).
    """
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    n = pos.shape[0]
    if n == 0:
        raise ValueError("Empty position array")
    pos_c, box_c, n_images = replicate_for_small_box(pos, box, rc)
    user_capped = max_neigh is not None

    ncells = cl.cell_grid_shape(box_c.matrix, rc)
    posj = jnp.asarray(pos_c)
    mj = jnp.asarray(box_c.matrix)
    oj = jnp.asarray(box_c.origin)
    bj = jnp.asarray(box_c.boundary)
    order, _sorted_cid, cell_start, cell_count, max_occ = cl.cell_occupancy(
        posj, mj, oj, bj, ncells
    )
    # bucket data-dependent sizes (max cell occupancy, neighbor capacity) up
    # to multiples of 4/8 so repeated calls with slightly-moved atoms (e.g.
    # every FIRE step) hit the jit cache instead of recompiling
    M = -4 * (-int(max_occ) // 4)
    ntotal = pos_c.shape[0]
    m_key = ("M", ntotal, float(rc))
    M = max(M, _CAP_HIGH_WATER.get(m_key, 0))
    _CAP_HIGH_WATER[m_key] = M
    chunk = min(65536, _next_pow2(ntotal))

    if max_neigh is None:
        density = ntotal / abs(box_c.volume)
        est = int(np.ceil(density * 4.0 / 3.0 * np.pi * rc**3 * 1.2)) + 8
        cap = min(est, 27 * M)
    else:
        cap = min(max_neigh, 27 * M)
    cap = max(cap, 1)
    cap = -8 * (-cap // 8)
    # sticky high-water mark: once a (ntotal, rc) combination has needed a
    # larger capacity, keep using it so repeated calls (minimization steps)
    # stay on one compiled shape instead of flip-flopping across the
    # estimate/overflow boundary
    hw_key = (ntotal, n, float(rc), exclude_self)
    cap = max(cap, _CAP_HIGH_WATER.get(hw_key, 0))
    if not user_capped:
        _CAP_HIGH_WATER[hw_key] = cap

    # queries: only original atoms (first n rows of pos_c by construction)
    def run(capacity):
        verlet, dist, cnt, max_cnt = cl.neighbor_list_auto(
            posj, mj, oj, bj, float(rc), ncells,
            order, _sorted_cid, cell_start, cell_count, M,
            max_neigh=capacity, chunk=min(chunk, _next_pow2(n)),
            exclude_self=exclude_self, n_query=n, n_images=n_images,
            diagonal=not box_c.triclinic,
        )
        return verlet, dist, cnt, int(max_cnt)

    verlet, dist, cnt, max_cnt = run(cap)
    if user_capped and max_cnt > max_neigh:
        raise ValueError(
            f"max_neigh={max_neigh} is too small: an atom has {max_cnt} "
            f"neighbors within rc={rc}. Increase max_neigh."
        )
    if max_cnt > cap:
        cap = -8 * (-(max_cnt + 4) // 8)
        if not user_capped:
            _CAP_HIGH_WATER[hw_key] = max(cap, _CAP_HIGH_WATER.get(hw_key, 0))
        verlet, dist, cnt, max_cnt = run(cap)

    verlet = np.asarray(verlet)
    dist = np.asarray(dist)
    cnt = np.asarray(cnt)
    if n_images > 1:
        verlet = np.where(verlet >= 0, verlet % n, -1).astype(np.int32)
    return verlet, dist, cnt


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def neighbor_search_device(
    pos: np.ndarray,
    box: Box,
    rc: float,
    dtype=None,
    defer_check: bool = False,
):
    """Device-resident neighbor build: no (N, M) host round-trips.

    The host↔device link can be orders of magnitude slower than the kernel
    itself (tunneled TPU: ~20 MB/s d2h vs a ~50 ms 32k-atom build), so the
    potential evaluators keep the Verlet list on device end-to-end.  Only
    scalar occupancy/overflow values sync to the host.

    Returns (pos_dev (ntotal,3), verlet_dev (ntotal,max_neigh) int32 row
    slot -1-padded in original atom order, cnt_dev (ntotal,), n_images).
    Indices refer to the (possibly replicated) atom set; image 0 first.

    .. warning:: ``defer_check=True`` adds a fifth return value ``check()``
       and makes it a HARD CONTRACT: the returned ``verlet``/``cnt`` were
       built with CACHED capacities that this configuration may have
       outgrown (a too-small cell capacity scatters atoms into neighboring
       cells' slots — silently corrupt lists, not just truncated ones).
       The caller MUST invoke ``check()`` before trusting the results and,
       when it returns a ``(verlet, cnt)`` pair, use that pair instead.
       The payoff: the ~30 ms tunneled capacity-validation fetch overlaps
       whatever device work the caller dispatches between the two calls
       (see EAM.calculate for the pattern).  Never hand the un-checked
       arrays to code that might not run ``check()``.
    """
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    pos_c, box_c, n_images = replicate_for_small_box(pos, box, rc)
    ntotal = pos_c.shape[0]
    posj = jnp.asarray(pos_c) if dtype is None else jnp.asarray(pos_c, dtype)
    mj = jnp.asarray(box_c.matrix, posj.dtype)
    oj = jnp.asarray(box_c.origin, posj.dtype)
    bj = jnp.asarray(box_c.boundary)
    ncells = cl.cell_grid_shape(box_c.matrix, rc)
    order, sorted_cid, cell_start, cell_count, max_occ = cl.cell_occupancy(
        posj, mj, oj, bj, ncells
    )
    # capacities: every host fetch of a device scalar costs ~40 ms on the
    # tunneled backend, so steady-state calls (an MD/minimizer loop re-runs
    # the same (ntotal, rc) every step) run with CACHED capacities and defer
    # validation to ONE combined scalar fetch at the end; a violation
    # (occupancy or neighbor count grew past the cache) re-runs with the
    # larger capacity and updates the cache.
    m_key = ("Mdev", ntotal, float(rc))
    M = _CAP_HIGH_WATER.get(m_key, 0)
    if not M:
        M = -4 * (-int(max_occ) // 4)
        _CAP_HIGH_WATER[m_key] = M
    meas_key = ("devmeas", ntotal, float(rc))
    cap = _CAP_HIGH_WATER.get(meas_key, 0)
    if not cap:
        density = ntotal / abs(box_c.volume)
        cap = min(int(np.ceil(density * 4.19 * rc**3 * 1.2)) + 8, 27 * M)
        cap = -8 * (-max(cap, 1) // 8)
    bnd_t = tuple(int(b) for b in box_c.boundary)

    def run(capacity, M):
        if cl.dense_eligible(ncells, bnd_t, M):
            # compact_only: the potential evaluators consume rows in any
            # order (pair sums are permutation-invariant), so the dense
            # build compacts with a cheap single-i32 sort instead of the
            # distance pair sort
            verlet, dist, cnt, max_cnt = cl.neighbor_list_dense(
                posj, mj, oj, float(rc), ncells, bnd_t,
                order, sorted_cid, cell_start, M,
                max_neigh=capacity, exclude_self=True,
                diagonal=not box_c.triclinic, reorder=True,
                need_dist=False, compact_only=True,
            )
        else:
            verlet, dist, cnt, max_cnt = cl.neighbor_list_fixed(
                posj, mj, oj, bj, float(rc), ncells,
                order, cell_start, cell_count, M,
                max_neigh=capacity,
                chunk=min(65536, _next_pow2(ntotal)),
                exclude_self=True,
            )
        return verlet, cnt, max_cnt

    verlet, cnt, max_cnt = run(cap, M)
    sync_dev = jnp.stack([
        jnp.asarray(max_occ, jnp.int32), jnp.asarray(max_cnt, jnp.int32)
    ])
    if defer_check:
        # start the validation transfer now; the caller dispatches its
        # (async) consumer kernels first and calls check() afterwards, so
        # the ~27-38 ms tunnel roundtrip overlaps device compute
        try:
            sync_dev.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass

    def check(verlet=verlet, cnt=cnt, cap=cap, M=M):
        """Validate the cached capacities; returns None when the results
        stand, else the corrected (verlet, cnt) from a re-run."""
        occ_i, cnt_i = (int(v) for v in np.asarray(sync_dev))
        redo = False
        if -4 * (-occ_i // 4) > M:
            # cached cell capacity was too small for this configuration:
            # the dense grid dropped atoms — rebuild with true occupancy
            M = -4 * (-occ_i // 4)
            _CAP_HIGH_WATER[m_key] = M
            verlet, cnt, max_cnt2 = run(cap, M)
            cnt_i = int(max_cnt2)
            redo = True
        if cnt_i > cap:
            cap = -8 * (-(cnt_i + 4) // 8)
            verlet, cnt, _mc = run(cap, M)
            redo = True
        # remember the measured requirement (small headroom) — the next
        # call allocates tight instead of the conservative density formula
        _CAP_HIGH_WATER[meas_key] = max(
            _CAP_HIGH_WATER.get(meas_key, 0), -8 * (-(cnt_i + 4) // 8)
        )
        return (verlet, cnt) if redo else None

    if defer_check:
        return posj, verlet, cnt, n_images, check
    fixed = check()
    if fixed is not None:
        verlet, cnt = fixed
    return posj, verlet, cnt, n_images


# (ntotal, n, rc, exclude_self) -> largest auto capacity used so far
_CAP_HIGH_WATER: dict = {}


class Neighbor:
    """Class front-end mirroring the reference API (reference: neighbor.py).

    Parameters
    ----------
    pos : (N,3) array or AtomFrame with x/y/z columns
    box : Box-like
    rc : cutoff radius
    max_neigh : optional fixed capacity (ValueError on overflow)
    """

    def __init__(
        self,
        pos: Union[np.ndarray, AtomFrame],
        box,
        rc: float,
        max_neigh: Optional[int] = None,
    ) -> None:
        if isinstance(pos, AtomFrame):
            pos = np.column_stack([pos["x"], pos["y"], pos["z"]])
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc = float(rc)
        self.max_neigh = max_neigh
        self.verlet_list: Optional[np.ndarray] = None
        self.distance_list: Optional[np.ndarray] = None
        self.neighbor_number: Optional[np.ndarray] = None

    def compute(self) -> "Neighbor":
        self.verlet_list, self.distance_list, self.neighbor_number = neighbor_search(
            self.pos, self.box, self.rc, self.max_neigh
        )
        return self
