"""Fast (megakernel multi-pass) ambient occlusion vs the exact jittered
estimator. The fast path replaces per-sample hemisphere jitter with K
antipodal stratified sky directions, each run as a directional-occlusion
pass through the megakernel — same integral, noise-free quadrature
(reference AO: shade.c:412-483; ao decomposition documented in
render.py)."""

import os

import numpy as np
import pytest

import mdapy_tpu as mp


def _scene(n=3):
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.mgrid[0:n, 0:n, 0:n].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    colors = np.tile(np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (len(pos), 1))
    radii = np.full(len(pos), 1.28, np.float32)
    return pos, colors, radii


@pytest.mark.slow
def test_fast_ao_matches_exact_estimator(monkeypatch):
    monkeypatch.setenv("MDAPY_TPU_AO_MODE", "fast")
    pos, colors, radii = _scene()
    cam = mp.preset_camera("perspective", pos, max_radius=1.28)
    W = H = 48
    ren_f = mp.TachyonRender(backend="cpu", ao=True, ao_samples=12,
                             aa_samples=2)
    ren_f.use_pallas = True  # interpret-mode megakernel on CPU
    img_fast = ren_f.render(pos, colors, radii, camera=cam, width=W, height=H)

    monkeypatch.setenv("MDAPY_TPU_AO_MODE", "exact")
    ren_e = mp.TachyonRender(backend="cpu", ao=True, ao_samples=48,
                             aa_samples=2, seed=5)
    img_ref = ren_e.render(pos, colors, radii, camera=cam, width=W, height=H)

    f = img_fast[..., :3].astype(np.float32) / 255
    r = img_ref[..., :3].astype(np.float32) / 255
    diff = np.abs(f - r)
    # same integral, different estimators: quadrature banding + MC noise
    assert diff.mean() < 0.03, f"mean |diff| {diff.mean():.4f}"
    assert abs(f.mean() - r.mean()) < 0.02, (f.mean(), r.mean())


def test_fast_ao_direct_light_rescale(monkeypatch):
    """With AO on, direct light is rescaled by 0.2 (rt_rescale_lights
    parity); the fast path's direct pass must apply it too."""
    from mdapy_tpu.render.megakernel import build_mega_params
    from mdapy_tpu.render.tracer import RenderConfig

    frame = {
        "origin": np.zeros(3), "lowleft": np.zeros(3),
        "iplaneright": np.array([1.0, 0, 0]), "iplaneup": np.array([0, 1.0, 0]),
        "view": np.array([0, 0, 1.0]), "light_dir": np.array([0, 0, 1.0]),
        "perspective": True,
    }
    cfg_ao = RenderConfig(ao_enabled=True, direct_light_intensity=0.9)
    cfg_no = RenderConfig(ao_enabled=False, direct_light_intensity=0.9)
    p_ao = build_mega_params(frame, None, np.zeros(3), np.ones(3), cfg_ao)
    p_no = build_mega_params(frame, None, np.zeros(3), np.ones(3), cfg_no)
    assert np.isclose(p_ao[27], 0.9 * 0.2)
    assert np.isclose(p_no[27], 0.9)
    assert np.isclose(p_no[38], 0.3)
