"""Shared pair-field machinery for TPU-fast potential evaluation.

The reference evaluates EAM/NEP forces with hand-written per-pair gradient
kernels (reference: src/eam.cpp:40, extern/NEPCPU/nep.cpp).  The TPU-native
replacement keeps autodiff but restructures it around one idea:

    per-atom energies depend on positions ONLY through each atom's own
    displacement rows disp[i, m] = min_image(pos[j_im] - pos[i]).

So one backward pass of sum(E) w.r.t. the dense (N, M, 3) displacement
tensor yields every pair-gradient J = dE/d(disp) with purely dense compute —
no scatter-add into (N, 3) (XLA TPU serializes scatters with duplicate
indices, which is what made naive jax.grad(total_energy)(pos) slow).

Forces then assemble from J with a *gather* using the reverse-pair
permutation: for the full (symmetric) Verlet list, pair (i, m) with
j = verlet[i, m] appears exactly once in j's row as (j, rev[i, m]):

    F_i = sum_m J[i, m]  -  sum_m J[verlet[i,m], rev[i,m]]

(∂disp_im/∂pos_i = -I for the own rows; +I where i appears as the neighbor.)

Per-atom virials use the standard half-pair convention (matches the
reference's 0.5 factor, eam.cpp virial accumulation):

    v_i = -0.5 * sum_m [ disp_im ⊗ (J_im - Jrev_im) ]

which sums to the exact global virial -sum_pairs disp ⊗ J.

The reverse permutation only exists when each (i, j) pair is unique — true
whenever min-image holds without small-box replication.  Replicated systems
(a few thousand atoms at most) keep the plain autodiff path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["reverse_permutation", "pair_forces_virials"]


def reverse_permutation(verlet: np.ndarray) -> np.ndarray:
    """rev[i, m] = m' such that verlet[verlet[i, m], m'] == i.

    Host-side (numpy) sort/searchsorted matching — O(P log P) over
    P = N * M pairs.  Padded slots (verlet < 0) get rev = 0 (masked by the
    caller via verlet >= 0).  Raises if the list is not symmetric.
    """
    n, M = verlet.shape
    i = np.repeat(np.arange(n, dtype=np.int64), M)
    j = verlet.reshape(-1).astype(np.int64)
    valid = j >= 0
    code = np.where(valid, i * n + j, -1)
    target = np.where(valid, j * n + i, -1)
    order = np.argsort(code, kind="stable")
    sorted_code = code[order]
    pos = np.searchsorted(sorted_code, target)
    pos = np.clip(pos, 0, len(sorted_code) - 1)
    hit = sorted_code[pos] == target
    if not bool(np.all(hit | ~valid)):
        bad = int(np.sum(valid & ~hit))
        raise ValueError(
            f"neighbor list is not symmetric: {bad} pairs have no reverse "
            "entry (did capacity overflow truncate rows?)"
        )
    partner = order[pos]  # flat pair index i'*M + m' of the reverse pair
    rev = np.where(valid, partner % M, 0).astype(np.int32)
    return rev.reshape(n, M)


def reverse_permutation_device(verlet, block: int = 1024):
    """Device-resident rev[i, m] (see reverse_permutation) — sort-rank
    pairing, no row gathers, no host transfer of the (N, M) list.

    Sort every pair slot by its forward key (i*N + j) and, independently,
    by its reverse key (j*N + i).  A symmetric list makes the two key
    multisets identical, so equal sorted RANKS are exactly reverse-pair
    partners: the slot at rank r of the reverse-key order has its reverse
    pair at rank r of the forward-key order.  Two argsorts + one scatter
    replace the previous per-pair (M x M) row-gather/compare, which cost
    O(N*M^2) VPU work (~1.1 s of the NEP force call at 256k atoms — the
    r4 NEP regression's dominant term).

    Invalid (-1) slots get unique tail keys identical in both orders, so
    they pair with themselves harmlessly.

    Returns (rev (N, M) int32, bad scalar int32) — `bad` counts rank
    positions whose forward/reverse keys mismatch (0 for any symmetric
    list).
    """
    import jax
    import jax.numpy as jnp

    n, M = verlet.shape

    @jax.jit
    def _run(verlet):
        flat = verlet.reshape(-1)
        ok = flat >= 0
        p = jnp.arange(n * M, dtype=jnp.int32)
        i = p // jnp.int32(M)
        # two-component lexicographic keys (multi-key lax.sort — i*N+j
        # would need i64, which TPU x32 mode truncates).  Invalid slots get
        # identical unique tail keys in both orders: major n (past every
        # valid id), minor p.
        imaj = jnp.where(ok, i, jnp.int32(n))
        jmaj = jnp.where(ok, flat, jnp.int32(n))
        imin = jnp.where(ok, i, p)
        jmin = jnp.where(ok, flat, p)
        mf, nf, of = jax.lax.sort((imaj, jmin, p), num_keys=2)
        mr, nr, orr = jax.lax.sort((jmaj, imin, p), num_keys=2)
        bad = jnp.sum(((mf != mr) | (nf != nr)).astype(jnp.int32))
        # return rank-paired slots to original order with a third sort
        # (a 30M-element scatter/gather would cost ~8 ns/element on the
        # TPU scalar unit; sorts stay on the vector path)
        _, revflat = jax.lax.sort(
            (orr, of % jnp.int32(M)), num_keys=1
        )
        return jnp.where(ok, revflat, 0).reshape(n, M), bad

    return _run(verlet)


def pair_forces_virials(disp, J, verlet, rev, ok):
    """Assemble (forces (N,3), per-atom virials (N,9), dE/deps (3,3)).

    disp, J: 3-tuples of (N, M) component arrays — the whole pipeline keeps
    x/y/z separated because any (N, M, 3) tensor pads its 3-wide minor dim
    to 128 lanes on TPU (a ~42x HBM blowup that made this assembly — and
    every producer feeding it — run at seconds instead of milliseconds).
    Stacked (N, M, 3) inputs are accepted and unstacked for CPU callers.
    verlet, rev: (N, M) int32; ok: (N, M) bool.
    All ops are dense gathers/reductions (TPU-friendly).
    """
    import jax.numpy as jnp

    if not isinstance(disp, (tuple, list)):
        disp = tuple(disp[..., c] for c in range(3))
    if not isinstance(J, (tuple, list)):
        J = tuple(J[..., c] for c in range(3))
    M = verlet.shape[1]
    # reverse-pair gradient rows: Jrev[i, m] = J[j, rev[i, m]], as one flat
    # 1-D gather per component
    flat = jnp.maximum(verlet, 0) * M + rev
    Jm = tuple(jnp.where(ok, c, 0.0) for c in J)
    Jrev = tuple(jnp.where(ok, c.ravel()[flat], 0.0) for c in Jm)
    # force contribution to atom i from pair (i,m): f_im = J_im - Jrev_im
    pairf = tuple(a - b for a, b in zip(Jm, Jrev))
    force = jnp.stack([c.sum(axis=1) for c in pairf], axis=-1)
    dm = tuple(jnp.where(ok, c, 0.0) for c in disp)
    v = jnp.stack(
        [-0.5 * (dm[a] * pairf[b]).sum(axis=1)
         for a in range(3) for b in range(3)],
        axis=-1,
    )
    dEdeps = jnp.stack(
        [(dm[a] * Jm[b]).sum() for a in range(3) for b in range(3)]
    ).reshape(3, 3)
    return force, v, dEdeps
