"""Benchmark: renderer ray throughput on a 1M-atom scene (north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scene: ~1M-atom FCC block (the polycrystal generator exists but a dense block
stresses the tracer identically), 1920x1080, 12 AA samples + shadows
(13 rays * 2 per pixel), no AO (AO acceleration pass is tracked separately).
vs_baseline = our rays/s divided by the reference CPU Tachyon engine's rays/s
measured on this machine with the same scene (golden driver, smaller raster —
CPU rays/s is resolution-independent to first order).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def dsync(x):
    """Real device sync. jax.block_until_ready is a NO-OP on the tunneled
    axon backend (verified: a 50s matmul chain 'completes' in 0.4ms), so the
    only honest fence is fetching a device scalar derived from the value.

    A single scalar fetch costs 27-38 ms of pure tunnel roundtrip and
    SERIALIZES with subsequent dispatch, so per-frame fetches would charge
    every frame the full latency (rounds 3-4 overstated frame times by
    ~30 ms this way).  Lists therefore reduce to ONE chained device scalar
    and pay the roundtrip once — production PCIe readback costs <1 ms."""
    import jax.numpy as jnp

    if isinstance(x, (list, tuple)):
        acc = None
        for v in x:
            m = jnp.max(v.astype(jnp.float32) if v.dtype != jnp.float32 else v)
            acc = m if acc is None else acc + m
        float(acc)
        return x
    float(jnp.max(x.astype(jnp.float32) if x.dtype != jnp.float32 else x))
    return x


def orbit_cameras(base, center, n=8, arc_deg=360.0):
    """n cameras orbiting `center` about the base camera's up axis.

    The camera-motion (cache-cold accel) benchmark: every frame pays the
    screen-bin/record rebuild that identical-frame caching hides (VERDICT
    r4 item 3; the reference Tachyon rebuilds its grid on every
    rt_renderscene, grid.c:224)."""
    import math

    from mdapy_tpu.render.camera import CameraParams

    center = np.asarray(center, np.float64)
    p0 = np.asarray(base.position) - center
    u = np.asarray(base.up, np.float64)
    u = u / np.linalg.norm(u)
    cams = []
    for k in range(n):
        th = math.radians(arc_deg) * k / n
        c, s = math.cos(th), math.sin(th)
        rot = c * p0 + s * np.cross(u, p0) + (1 - c) * u * (u @ p0)
        posn = center + rot
        d = center - posn
        d = d / np.linalg.norm(d)
        cams.append(CameraParams(
            base.is_perspective, base.field_of_view, tuple(posn), tuple(d),
            tuple(base.up),
        ))
    return cams


def build_scene(n_cells: int):
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.mgrid[0:n_cells, 0:n_cells, 0:n_cells].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    colors = np.tile(np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (len(pos), 1))
    radii = np.full(len(pos), 1.28, np.float32)
    return pos, colors, radii


def measure_reference(pos, colors, radii, cam, width=384, height=216, aa=2):
    """Reference CPU Tachyon rays/s via the golden driver (built from the
    read-only reference sources; run only, never copied)."""
    gdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "golden_tachyon")
    driver = os.path.join(gdir, "build", "golden_driver")
    if not os.path.exists(driver):
        try:
            subprocess.run(["bash", os.path.join(gdir, "build.sh")],
                           check=True, capture_output=True, timeout=600)
        except Exception:
            return None
    sys.path.insert(0, gdir)
    try:
        from golden import render_golden
    except Exception:
        return None
    t0 = time.time()
    render_golden(pos, colors, radii, cam, width=width, height=height,
                  aa=True, aa_samples=aa, ao=False, shadows=True)
    dt = time.time() - t0
    rays = width * height * (aa + 1) * 2
    return rays / dt


def bench_potentials():
    """NEP/EAM force-call wall-time at 256k atoms vs the reference NEPCPU
    engine compiled from the read-only reference sources (2 host threads —
    everything this host has). Returns a dict of extra metrics."""
    import time

    import mdapy_tpu as mp
    from mdapy_tpu.potentials.eam import EAM, EAMGenerator
    from mdapy_tpu.potentials.nep import NEP

    import jax
    import jax.numpy as jnp

    out = {}
    s = mp.build_crystal("Cu", "fcc", 3.615, nx=40, ny=40, nz=40)  # 256k

    def force_call_time(calc, reps=4):
        """Device-resident force call (neighbor build + kernel); results
        stay on device, as a minimizer/MD loop would consume them.
        block_until_ready is NOT trusted on the tunneled backend — the
        sync is ONE chained scalar fetch over all reps (the 27-38 ms
        tunnel roundtrip would otherwise dominate each call)."""
        calc.results = {}
        calc.calculate(s)
        float(jnp.sum(calc.results["forces"]))  # warm + settle caches
        t0 = time.time()
        acc = None
        for _ in range(reps):
            calc.results = {}
            calc.calculate(s)
            m = jnp.sum(calc.results["forces"])
            acc = m if acc is None else acc + m
        float(acc)
        # align the _ensure token with the direct calculate() calls above so
        # the host_extra metric below measures ONLY the d2h materialization,
        # not a hidden repeat force call
        calc._cache_token = hash(calc._token(s))
        return (time.time() - t0) / reps

    nep = NEP("/root/reference/tests/input_files/UNEP-v1.txt")
    nep.calculate(s)  # compile
    t_nep = force_call_time(nep)
    out["nep_force_256k_s"] = round(t_nep, 3)

    EAMGenerator(["Cu"], output_filename="/tmp/Cu.eam.alloy")
    eam = EAM("/tmp/Cu.eam.alloy")
    eam.calculate(s)
    t_eam = force_call_time(eam)
    out["eam_force_256k_s"] = round(t_eam, 3)
    # full host materialization of all per-atom results (13 MB over the
    # tunneled link; on a directly-attached TPU this is PCIe-speed)
    t0 = time.time()
    _ = eam.get_forces(s), eam.get_energies(s), eam.get_virials(s)
    out["eam_force_256k_host_extra_s"] = round(time.time() - t0, 3)

    # compiled reference _eam + _neighbor baselines (reference sources via
    # tools/ref_shim, 2 host threads = all this host has)
    try:
        import json as _json
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        ebin = "/tmp/eam_bench"
        if not os.path.exists(ebin):
            subprocess.run(
                ["sh", os.path.join(here, "tools", "eam_baseline", "build.sh"), ebin],
                check=True, capture_output=True, timeout=300,
            )
        r = subprocess.run(
            [ebin, "eam", "40", "/tmp/Cu.eam.alloy", "3", "2"],
            capture_output=True, text=True, timeout=900,
        )
        ref = _json.loads(r.stdout.strip().splitlines()[-1])
        out["eam_ref_256k_s"] = round(ref["seconds"], 3)
        out["eam_vs_ref_speedup"] = round(ref["seconds"] / t_eam, 2)
        r = subprocess.run(
            [ebin, "neighbor", "63", "5.0", "3", "2"],
            capture_output=True, text=True, timeout=900,
        )
        ref = _json.loads(r.stdout.strip().splitlines()[-1])
        out["neighbor_ref_1M_s"] = round(ref["seconds"], 3)
    except Exception:
        pass

    # reference NEPCPU wall-time (warm + 1 timed rep)
    try:
        import json as _json
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        binp = "/tmp/nepcpu_bench"
        if not os.path.exists(binp):
            subprocess.run(
                ["sh", os.path.join(here, "tools", "nepcpu_baseline", "build.sh"), binp],
                check=True, capture_output=True, timeout=300,
            )
        r = subprocess.run(
            [binp, "40", "/root/reference/tests/input_files/UNEP-v1.txt", "1"],
            capture_output=True, text=True, timeout=900,
        )
        ref = _json.loads(r.stdout.strip().splitlines()[-1])
        out["nepcpu_ref_256k_s"] = round(ref["seconds"], 3)
        out["nep_vs_nepcpu_speedup"] = round(ref["seconds"] / t_nep, 2)
    except Exception:
        pass

    # Voronoi tessellation, 1M atoms: our native grid-walk engine vs the
    # compiled reference voro++ kernel (2 threads each)
    try:
        import json as _json
        import subprocess

        from mdapy_tpu.analysis.voronoi import VoronoiAnalysis

        s1m = mp.build_crystal("Cu", "fcc", 3.615, nx=63, ny=63, nz=63)
        t0 = time.time()
        VoronoiAnalysis(s1m.pos, s1m.box).compute()
        out["voronoi_1M_s"] = round(time.time() - t0, 3)
        here = os.path.dirname(os.path.abspath(__file__))
        vbin = "/tmp/voro_bench"
        if not os.path.exists(vbin):
            subprocess.run(
                ["sh", os.path.join(here, "tools", "voro_baseline", "build.sh"), vbin],
                check=True, capture_output=True, timeout=600,
            )
        r = subprocess.run([vbin, "63", "2", "2"], capture_output=True,
                           text=True, timeout=900)
        ref = _json.loads(r.stdout.strip().splitlines()[-1])
        out["voronoi_ref_1M_s"] = round(ref["seconds"], 3)
    except Exception:
        pass

    # neighbor build, device-resident, 1M atoms (scalar-fetch synced)
    from mdapy_tpu.neighbor.neighbor import neighbor_search_device

    s1 = mp.build_crystal("Cu", "fcc", 3.615, nx=63, ny=63, nz=63)
    # warm TWICE: call 1 uses the conservative density-formula capacity and
    # records the measured requirement; call 2 compiles the tight-capacity
    # kernel the steady state runs with
    for _ in range(2):
        r1 = neighbor_search_device(s1.pos, s1.box, 5.0)
        float(jnp.sum(r1[2]))
    t0 = time.time()
    acc = None
    reps_n = 3
    for _ in range(reps_n):
        r1 = neighbor_search_device(s1.pos, s1.box, 5.0)
        m = jnp.sum(r1[2])
        acc = m if acc is None else acc + m
    float(acc)
    out["neighbor_1M_rc5_s"] = round((time.time() - t0) / reps_n, 3)
    if "neighbor_ref_1M_s" in out:
        out["neighbor_vs_ref_speedup"] = round(
            out["neighbor_ref_1M_s"] / out["neighbor_1M_rc5_s"], 2
        )
    return out


def bench_config3():
    """BASELINE config 3: 1M-atom Voronoi polycrystal, AO + transparent
    background, 1920x1080 — the north-star AO-heavy scene.  AO runs the
    folded megakernel (all sky directions share one closest-hit traversal).
    Rays counted: S primary + S direct-shadow + S*K AO-shadow per pixel."""
    import time

    import jax
    import mdapy_tpu as mp

    uc = mp.build_crystal("Cu", "fcc", 3.615)
    poly = mp.CreatePolycrystal(uc, 230.0, 15, randomseed=1)
    s = poly.compute()
    pos = np.ascontiguousarray(s.pos)
    n = len(pos)
    colors = np.tile(
        np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (n, 1)
    )
    radii = np.full(n, 1.28, np.float32)
    cam = mp.preset_camera("perspective", pos, max_radius=1.28)
    W, H = 1920, 1080
    AA, K = 2, 12
    ren = mp.TachyonRender(
        backend="tpu", ao=True, ao_samples=K, aa_samples=AA,
        background=(1.0, 1.0, 1.0),
    )
    img = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                     transparent=True)
    assert img.shape == (H, W, 4) and img[..., :3].std() > 1
    out = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                     device_output=True)
    dsync(out)
    nframes = 5
    t0 = time.time()
    outs = [
        ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                   device_output=True)
        for _ in range(nframes)
    ]
    dsync(outs)
    dt = (time.time() - t0) / nframes
    S = AA + 1
    rays = W * H * S * (2 + K)
    out = {
        "config3_polycrystal_ao_ms_per_frame": round(dt * 1e3, 1),
        "config3_grays_per_s": round(rays / dt / 1e9, 3),
        "config3_atoms": n,
    }
    # camera-motion path: 8 distinct cameras, every frame rebuilds the
    # camera-dependent accel (screen bins, records, primary-light CSR);
    # the world-space AO structures are scene-keyed and reused
    cams = orbit_cameras(cam, pos.mean(axis=0), 8)
    for c in cams:  # warm lap: compiles + capacity high-water
        o = ren.render(pos, colors, radii, camera=c, width=W, height=H,
                       device_output=True)
    dsync(o)
    t0 = time.time()
    outs = [
        ren.render(pos, colors, radii, camera=c, width=W, height=H,
                   device_output=True)
        for c in cams
    ]
    dsync(outs)
    out["config3_orbit_ms_per_frame"] = round(
        (time.time() - t0) / len(cams) * 1e3, 1
    )
    # reference rays/s on the same scene with AO through the compiled
    # Tachyon engine (small raster; CPU rays/s is resolution-independent)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        gdir = os.path.join(here, "tools", "golden_tachyon")
        sys.path.insert(0, gdir)
        from golden import render_golden

        w2, h2 = 256, 144
        t0 = time.time()
        render_golden(pos, colors, radii, cam, width=w2, height=h2,
                      aa=True, aa_samples=AA, ao=True, ao_samples=K,
                      shadows=True)
        dt_ref = time.time() - t0
        ref_rays = w2 * h2 * S * (2 + K)
        out["config3_vs_tachyon_cpu"] = round(
            (rays / dt) / (ref_rays / dt_ref), 1
        )
    except Exception:
        pass
    return out


def bench_config5():
    """BASELINE config 5 at single-chip scale: a 10M-atom HEA block rendered
    at 1080p with AA + shadows through the megakernel (the multi-host
    variant shards the same tile grid over a (hosts, cores) mesh — see
    render/multihost.py and the dryrun's (2,4) hierarchical pass)."""
    import time

    import jax.numpy as jnp
    import mdapy_tpu as mp

    s = mp.build_hea(
        ("Co", "Ni", "Cr", "Fe", "Mn"), (0.2, 0.2, 0.2, 0.2, 0.2),
        "fcc", 3.59, nx=136, ny=136, nz=136, random_seed=1,
    )  # 10,061,824 atoms
    pos = np.ascontiguousarray(s.pos)
    n = len(pos)
    from mdapy_tpu.core.elements import ele_rgb

    elems = np.asarray(s.data["element"]).astype(str)
    palette = {
        e: tuple(np.asarray(ele_rgb.get(e, (180, 128, 77)), float) / 255.0)
        for e in set(elems.tolist())
    }
    colors = np.array(
        [(*palette[e], 1.0) for e in elems], np.float32
    )
    radii = np.full(n, 1.25, np.float32)
    cam = mp.preset_camera("perspective", pos, max_radius=1.25)
    W, H, AA = 1920, 1080, 2
    ren = mp.TachyonRender(backend="tpu", ao=False, aa_samples=AA)
    out = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                     device_output=True)
    dsync(out)
    nframes = 3
    t0 = time.time()
    outs = [
        ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                   device_output=True)
        for _ in range(nframes)
    ]
    dsync(outs)
    dt = (time.time() - t0) / nframes
    rays = W * H * (AA + 1) * 2
    out = {
        "config5_atoms": n,
        "config5_ms_per_frame": round(dt * 1e3, 1),
        "config5_grays_per_s": round(rays / dt / 1e9, 3),
    }
    # camera-motion: every frame pays the banded record re-gather (~6.7 GB)
    # — the honest animation cost (BASELINE target: <= 3 s/frame).  Record
    # caching is pointless when every frame has a new camera, and two
    # cached 6.7 GB record sets would transiently exceed HBM — force the
    # bounded-peak banded path for the orbit.
    os.environ["MDAPY_TPU_RECORD_CACHE_GB"] = "0"
    cams = orbit_cameras(cam, pos.mean(axis=0), 4)
    # warm EVERY camera: the capacity high-water (and with it the kernel's
    # static chunk shapes) grows over the first lap — warming one camera
    # left the other three compiling inside the timed lap (242 s/frame)
    for c in cams:
        o = ren.render(pos, colors, radii, camera=c, width=W, height=H,
                       device_output=True)
    dsync(o)
    t0 = time.time()
    outs = [
        ren.render(pos, colors, radii, camera=c, width=W, height=H,
                   device_output=True)
        for c in cams
    ]
    dsync(outs)
    out["config5_orbit_s_per_frame"] = round(
        (time.time() - t0) / len(cams), 2
    )
    os.environ.pop("MDAPY_TPU_RECORD_CACHE_GB", None)
    return out


def bench_io():
    """VERDICT r3 item 8: 10M-atom dump load through the native columnar
    parser vs the general line parser (reference parses uniform bodies via
    Polars' Rust CSV reader, load_save.py:42-64)."""
    import time

    from mdapy_tpu.io import load_save

    path = "/tmp/bench_dump_10m.dump"
    n = 10_000_000
    if not os.path.exists(path) or os.path.getsize(path) < 100 * n // 3:
        rng = np.random.default_rng(0)
        with open(path, "w") as f:
            f.write(
                "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n%d\n"
                "ITEM: BOX BOUNDS pp pp pp\n0 400\n0 400\n0 400\n"
                "ITEM: ATOMS id type x y z\n" % n
            )
            ids = np.arange(1, n + 1)
            types = rng.integers(1, 6, n)
            pos = rng.random((n, 3)) * 400
            ch = 1_000_000
            for s in range(0, n, ch):
                e = min(s + ch, n)
                np.savetxt(
                    f,
                    np.column_stack([ids[s:e], types[s:e], pos[s:e]]),
                    fmt="%d %d %.6f %.6f %.6f",
                )
    raw = load_save._read_bytes(path)
    t0 = time.time()
    fast = load_save.parse_dump_bytes(raw)
    t_fast = time.time() - t0
    assert fast is not None and fast[0].nrows == n
    t0 = time.time()
    slow = load_save.parse_dump_frame(
        raw.decode("utf-8", "replace").splitlines()
    )
    t_slow = time.time() - t0
    assert np.array_equal(np.asarray(fast[0]["x"]), np.asarray(slow[0]["x"]))
    return {
        "dump_10M_load_s": round(t_fast, 3),
        "dump_10M_lineparser_s": round(t_slow, 3),
        "dump_load_speedup_vs_line_parser": round(t_slow / t_fast, 2),
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import mdapy_tpu as mp

    n_cells = int(os.environ.get("BENCH_CELLS", "63"))  # 63^3*4 = 1,000,188
    width, height = 1920, 1080
    pos, colors, radii = build_scene(n_cells)
    cam = mp.preset_camera("perspective", pos, max_radius=float(radii.max()))

    ren = mp.TachyonRender(backend="tpu", ao=False)
    # warmup (compiles + accel build); also sanity-check the host image once
    img0 = ren.render(pos, colors, radii, camera=cam, width=width, height=height)
    assert img0.shape == (height, width, 4) and img0[..., :3].std() > 1
    # timed frames: quantized uint8 image produced and synced ON DEVICE.
    # (This harness reaches the chip through a ~38 MB/s tunnel, so a host
    # readback would measure the tunnel, not the renderer; production PCIe
    # readback of the 6 MB frame costs <1 ms.)
    import jax as _jax

    # sustained throughput: frames issued back-to-back (device queue keeps
    # the chip busy), one sync at the end — the serving-pipeline shape
    outs = [
        ren.render(pos, colors, radii, camera=cam, width=width,
                   height=height, device_output=True)
        for _ in range(2)
    ]
    dsync(outs)
    nframes = 16
    t0 = time.time()
    outs = [
        ren.render(pos, colors, radii, camera=cam, width=width,
                   height=height, device_output=True)
        for _ in range(nframes)
    ]
    dsync(outs)
    dt = (time.time() - t0) / nframes
    samples = 13  # 12 AA + 1
    rays = width * height * samples * 2  # primary + shadow per sample
    ours = rays / dt

    ref = None
    try:
        ref = measure_reference(pos, colors, radii, cam)
    except Exception:
        ref = None
    vs = (ours / ref) if ref else 0.0

    extra = {}
    if os.environ.get("BENCH_SKIP_CONFIG3", "0") != "1":
        try:
            extra.update(bench_config3())
        except Exception as exc:
            extra["config3_error"] = repr(exc)[:200]
    if os.environ.get("BENCH_SKIP_CONFIG5", "0") != "1":
        try:
            extra.update(bench_config5())
        except Exception as exc:
            extra["config5_error"] = repr(exc)[:200]
    if os.environ.get("BENCH_SKIP_POTENTIALS", "0") != "1":
        try:
            extra.update(bench_potentials())
        except Exception as exc:  # keep the primary metric robust
            extra["potentials_error"] = repr(exc)[:200]
    if os.environ.get("BENCH_SKIP_IO", "0") != "1":
        try:
            extra.update(bench_io())
        except Exception as exc:
            extra["io_error"] = repr(exc)[:200]

    extra["hardware_note"] = (
        "ours: one TPU v5e via tunnel; reference baselines: this host's 2 "
        "hardware threads (all it has) — vs_* ratios are same-machine, not "
        "vs the authors' workstations"
    )
    print(json.dumps({
        "metric": "render_rays_per_s_1M_atoms_1080p",
        "value": round(ours / 1e9, 4),
        "unit": "Grays/s",
        "vs_baseline": round(vs, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
