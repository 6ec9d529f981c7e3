"""SQS generation parity vs ATAT mcsqs fixtures + convergence behaviors.

Mirrors reference tests/test_sqs.py.
"""

import os
from collections import Counter

import numpy as np
import pytest

import mdapy_tpu as mp
from mdapy_tpu.core.box import Box
from conftest import REF_INPUTS

ATAT_DIR = os.path.join(REF_INPUTS, "atat_sqs_n20")


def _atat_bestsqs_to_system():
    lines = open(os.path.join(ATAT_DIR, "bestsqs.out")).read().splitlines()
    coord = np.array([list(map(float, lines[i].split())) for i in range(3)])
    lat = np.array([list(map(float, lines[i].split())) for i in range(3, 6)])
    pos, sp = [], []
    for line in lines[6:]:
        toks = line.split()
        if len(toks) < 4:
            continue
        pos.append(list(map(float, toks[:3])))
        sp.append(toks[3])
    pos_cart = np.array(pos) @ coord.T
    lat_cart = coord @ lat
    frac = pos_cart @ np.linalg.inv(lat_cart)
    frac -= np.floor(frac)
    return mp.System(pos=frac @ lat_cart, box=Box(lat_cart),
                     element_list=np.array(sp, object))


def _atat_corr_summary(body):
    vals = []
    for line in open(os.path.join(ATAT_DIR, "bestcorr.out")):
        toks = line.split()
        if len(toks) >= 4 and toks[0] == str(body):
            vals.append(float(toks[2]))
    a = np.abs(np.array(vals))
    return float(a.mean()), float(a.max())


def test_pair_correlations_match_atat():
    sys_atat = _atat_bestsqs_to_system()
    sqs = mp.SQS(sys_atat, cutoffs={2: 1.05}, n_replicas=1, max_steps=0,
                 seed=0).compute()
    our_mean = float(np.abs(sqs.correlations).mean())
    our_max = float(np.abs(sqs.correlations).max())
    atat_mean, atat_max = _atat_corr_summary(body=2)
    assert abs(our_mean - atat_mean) < 0.005
    assert our_max < atat_max + 0.02


def test_triplet_correlations_match_atat():
    sys_atat = _atat_bestsqs_to_system()
    sqs = mp.SQS(sys_atat, cutoffs={2: 1.05, 3: 1.05}, n_replicas=1,
                 max_steps=0, seed=0).compute()
    body_count = Counter(ci["n_pts"] for ci in sqs.channel_info)
    assert 2 in body_count and 3 in body_count
    trip = np.array([ci["corr"] for ci in sqs.channel_info if ci["n_pts"] == 3])
    atat_mean, _ = _atat_corr_summary(body=3)
    assert abs(float(np.abs(trip).mean()) - atat_mean) < 0.005


def test_quad_clusters_enumerated():
    sys_init = mp.build_hea(("Fe", "Ni", "Co", "Mn", "Cr"), (0.2,) * 5,
                            "fcc", 3.55, nx=2, ny=2, nz=2, random_seed=0)
    sqs = mp.SQS(sys_init, cutoffs={2: 4.0, 3: 2.7, 4: 2.7},
                 n_replicas=2, max_steps=2000, T=0.05, seed=0).compute()
    body_count = Counter(ci["n_pts"] for ci in sqs.channel_info)
    assert body_count.get(4, 0) > 0


def test_small_box_triplet_enumeration():
    sys_init = mp.build_hea(("A", "B", "C"), (1 / 3,) * 3, "fcc", 1.0,
                            nx=1, ny=1, nz=5, random_seed=0)
    sqs = mp.SQS(sys_init, cutoffs={2: 1.05, 3: 1.05},
                 n_replicas=2, max_steps=5000, T=0.1, seed=0).compute()
    body_count = Counter(ci["n_pts"] for ci in sqs.channel_info)
    assert 2 in body_count and 3 in body_count


def test_triclinic_box_runs():
    L, n = 3.0, 6
    box = np.array([
        [L * n, 0, 0],
        [L * 0.3 * n, L * n, 0],
        [L * 0.2 * n, L * 0.1 * n, L * n],
    ])
    frac = np.array(
        [(i, j, k) for i in range(n) for j in range(n) for k in range(n)]
    ) / n
    rng = np.random.default_rng(0)
    elem = rng.choice(["A", "B", "C"], size=n ** 3)
    sys_tri = mp.System(pos=frac @ box, box=Box(box),
                        element_list=elem.astype(object))
    sqs = mp.SQS(sys_tri, cutoffs={2: 4.0}, n_replicas=4, max_steps=50000,
                 T=0.02, seed=1).compute()
    assert np.allclose(sqs.system.box.matrix, box)
    assert (Counter(np.asarray(sys_tri.data["element"]).astype(str).tolist())
            == Counter(np.asarray(sqs.system.data["element"]).astype(str).tolist()))
    sqs0 = mp.SQS(sys_tri, cutoffs={2: 4.0}, n_replicas=1, max_steps=0).compute()
    assert np.abs(sqs.correlations).mean() <= np.abs(sqs0.correlations).mean()


def test_sqs_drives_correlations_down():
    sys_init = mp.build_hea(("Fe", "Ni", "Co", "Mn", "Cr"), (0.2,) * 5,
                            "fcc", 3.55, nx=3, ny=3, nz=3, random_seed=1)
    ref = mp.SQS(sys_init, cutoffs={2: 2.7}, n_replicas=1, max_steps=0).compute()
    init_mean = float(np.abs(ref.correlations).mean())
    sqs = mp.SQS(sys_init, cutoffs={2: 2.7}, n_replicas=4, max_steps=100000,
                 T=0.02, seed=2).compute()
    after_mean = float(np.abs(sqs.correlations).mean())
    assert after_mean < 0.75 * init_mean
    assert (Counter(np.asarray(sys_init.data["element"]).astype(str).tolist())
            == Counter(np.asarray(sqs.system.data["element"]).astype(str).tolist()))


def test_sqs_preserves_cell_and_positions():
    sys_init = mp.build_hea(("A", "B", "C"), (1 / 3,) * 3, "bcc", 2.87,
                            nx=3, ny=3, nz=3, random_seed=42)
    sqs = mp.SQS(sys_init, cutoffs={2: 3.5}, n_replicas=2, max_steps=20000,
                 T=0.05, seed=0).compute()
    assert sqs.system.N == sys_init.N
    assert np.allclose(sqs.system.box.matrix, sys_init.box.matrix)
    for col in ("x", "y", "z"):
        np.testing.assert_array_equal(
            np.asarray(sqs.system.data[col]), np.asarray(sys_init.data[col])
        )


def test_atat_objective_negative_on_converged_sqs():
    sys_init = mp.build_hea(("Fe", "Ni", "Co", "Mn", "Cr"), (0.2,) * 5,
                            "fcc", 3.55, nx=2, ny=2, nz=2, random_seed=1)
    sqs = mp.SQS(sys_init, cutoffs={2: 4.0, 3: 3.0}, n_replicas=2,
                 max_steps=10000, T=0.02, seed=3).compute()
    assert sqs.objective < 0.0


def test_run_mc_is_monotonically_helpful():
    sys_init = mp.build_hea(("A", "B", "C"), (1 / 3,) * 3, "fcc", 3.6,
                            nx=3, ny=3, nz=3, random_seed=0)
    short = mp.SQS(sys_init, cutoffs={2: 4.0, 3: 3.0}, n_replicas=4,
                   max_steps=20000, T=0.05, seed=7).compute()
    long_ = mp.SQS(sys_init, cutoffs={2: 4.0, 3: 3.0}, n_replicas=4,
                   max_steps=200000, T=0.05, seed=7).compute()
    assert long_.objective <= short.objective + 1e-9


@pytest.mark.slow
def test_is_sqs_true_on_converged_cubic():
    sys_init = mp.build_hea(("A", "B", "C"), (1 / 3,) * 3, "fcc", 3.6,
                            nx=4, ny=4, nz=4, random_seed=0)
    sqs = mp.SQS(sys_init, cutoffs={2: 4.0, 3: 3.0, 4: 3.0}, n_replicas=8,
                 max_steps=200000, T=0.02, seed=1).compute()
    verdict, info = sqs.is_sqs(tol=0.05, verbose=False)
    assert verdict
    assert info["absolute"]["pass"]
    assert len(info["warren_cowley"]["per_shell"]) >= 1
    assert info["warren_cowley"]["per_shell"][0]["shell"] == "NN1"


def test_is_sqs_false_on_random_alloy():
    sys_init = mp.build_hea(("Fe", "Ni", "Co", "Mn", "Cr"), (0.2,) * 5,
                            "fcc", 3.55, nx=2, ny=2, nz=2, random_seed=1)
    sqs = mp.SQS(sys_init, cutoffs={2: 4.0}, max_steps=0, n_replicas=1).compute()
    verdict, _ = sqs.is_sqs(tol=0.02, verbose=False)
    assert not verdict


def test_sqs_requires_pair_cutoff():
    sys_init = mp.build_hea(("A", "B"), (0.5, 0.5), "fcc", 3.6,
                            nx=2, ny=2, nz=2, random_seed=0)
    with pytest.raises(ValueError, match="must include key 2"):
        mp.SQS(sys_init, cutoffs={3: 3.0})
    with pytest.raises(ValueError, match="2-, 3- and 4-body"):
        mp.SQS(sys_init, cutoffs={2: 3.0, 5: 3.0})
