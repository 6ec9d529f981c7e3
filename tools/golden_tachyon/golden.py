"""Python harness for the golden Tachyon driver (dev/test-time parity oracle)."""

import os
import struct
import subprocess
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DRIVER = os.path.join(HERE, "build", "golden_driver")


def available() -> bool:
    return os.path.exists(DRIVER)


def render_golden(
    positions,
    colors,
    radii,
    camera,
    width=200,
    height=160,
    aa=False,
    aa_samples=12,
    ao=False,
    ao_samples=12,
    ao_brightness=0.8,
    ao_maxdist=3.402823e38,
    shadows=True,
    direct_light=True,
    light_intensity=0.9,
    background=(0, 0, 0, 1),
    bond_edges=None,
    bond_colors=None,
    bond_radius=0.1,
    box_edges=None,
    box_radius=0.05,
    box_color=(1, 1, 1, 1),
):
    """Run the reference CPU Tachyon on a scene; returns (H,W,4) uint8."""
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    colors = np.ascontiguousarray(colors, dtype=np.float32)
    radii = np.ascontiguousarray(radii, dtype=np.float32)
    n = len(positions)
    buf = bytearray()
    buf += struct.pack("<6i", width, height, int(aa), aa_samples, int(ao), ao_samples)
    buf += struct.pack("<2i", int(shadows), int(direct_light))
    buf += struct.pack("<3d", ao_brightness, ao_maxdist, light_intensity)
    bg = tuple(background) + (1.0,) * (4 - len(background))
    buf += struct.pack("<4f", *bg)
    buf += struct.pack("<i", int(camera.is_perspective))
    buf += struct.pack("<d", camera.field_of_view)
    buf += struct.pack("<3d", *camera.position)
    buf += struct.pack("<3d", *camera.direction)
    buf += struct.pack("<3d", *camera.up)
    buf += struct.pack("<d", camera.znear)
    buf += struct.pack("<q", n)
    for i in range(n):
        buf += struct.pack("<3d", *positions[i])
        buf += struct.pack("<4f", *colors[i])
        buf += struct.pack("<f", radii[i])
    nb = 0 if bond_edges is None else len(bond_edges)
    buf += struct.pack("<q", nb)
    buf += struct.pack("<f", bond_radius)
    for i in range(nb):
        buf += struct.pack("<6d", *np.asarray(bond_edges[i], dtype=np.float64).ravel())
        c = (
            bond_colors[i]
            if bond_colors is not None
            else np.array([0.8, 0.8, 0.8, 1.0])
        )
        buf += struct.pack("<4f", *np.asarray(c, dtype=np.float32))
    ne = 0 if box_edges is None else len(box_edges)
    buf += struct.pack("<q", ne)
    bc = tuple(box_color) + (1.0,) * (4 - len(box_color))
    buf += struct.pack("<f", box_radius)
    buf += struct.pack("<4f", *bc)
    for i in range(ne):
        buf += struct.pack("<6d", *np.asarray(box_edges[i], dtype=np.float64).ravel())

    with tempfile.TemporaryDirectory() as td:
        scene = os.path.join(td, "scene.bin")
        out = os.path.join(td, "out.rgba")
        with open(scene, "wb") as f:
            f.write(buf)
        subprocess.run([DRIVER, scene, out], check=True, timeout=600)
        raw = np.fromfile(out, dtype=np.uint8)
    return raw.reshape(height, width, 4)
