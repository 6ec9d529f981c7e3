"""TachyonRender — user-facing renderer front-end (API parity: render.py:140-532).

backend="tpu" runs the XLA/Pallas tracer on the default JAX device (TPU when
present, CPU otherwise); "cpu" forces the CPU JAX backend in float64 for
golden-parity work.  The reference's "cpu"/"gpu"/"auto" names are accepted and
map onto the tracer device.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.elements import ele_radius, ele_rgb, type_rgb
from .camera import CameraParams, auto_camera, camera_frame, preset_camera
from .geometry import bond_edges as _bond_edges
from .geometry import box_edges as _box_edges
from .scene import build_scene
from .tracer import RenderConfig, quantize, render_image

__all__ = ["TachyonRender", "CameraParams", "preset_camera", "save_image", "load_image"]


def _fib_hemisphere(k: int) -> np.ndarray:
    """k stratified unit directions on the upper hemisphere (Fibonacci)."""
    i = np.arange(k, dtype=np.float64) + 0.5
    phi = i * (np.pi * (3.0 - np.sqrt(5.0)))
    z = i / k
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)


def _quantize_device(img_f):
    """Truncating *255 clamp on-device (imageio.c:174-186 parity)."""
    import jax.numpy as jnp

    return jnp.clip(img_f * 255.0, 0.0, 255.0).astype(jnp.uint8)


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA"))


def _default_colors(system) -> np.ndarray:
    """Jmol palette by element, type palette fallback (render.py:763-797)."""
    n = system.N
    if "element" in system.data.columns:
        elems = np.asarray(system.data["element"]).astype(str)
        rgb = np.array(
            [ele_rgb.get(e, [int(255 * 0.7)] * 3) for e in elems], dtype=np.float32
        ) / 255.0
    elif "type" in system.data.columns:
        t = np.asarray(system.data["type"]) % 9
        rgb = np.array(
            [type_rgb.get(int(v), [int(255 * 0.7)] * 3) for v in t], dtype=np.float32
        ) / 255.0
    else:
        rgb = np.full((n, 3), 0.7, dtype=np.float32)
    return np.c_[rgb, np.ones(n)].astype(np.float32)


_WARNED_CPU_FALLBACK = False


class TachyonRender:
    """Differentiable TPU ray tracer with the reference renderer's look.

    Parameters mirror reference render.py:203-254 exactly; ``backend`` accepts
    "tpu" (default device), "cpu" (float64 CPU jax, parity mode), plus the
    reference's "gpu"/"auto" (mapped to the default device).
    """

    def __init__(
        self,
        backend: str = "tpu",
        antialiasing: bool = True,
        aa_samples: int = 12,
        ao: bool = True,
        ao_samples: int = 12,
        ao_brightness: float = 0.8,
        ao_max_dist: float = 3.402823e38,
        shadows: bool = True,
        direct_light_intensity: float = 0.9,
        background: tuple = (0.0, 0.0, 0.0),
        seed: int = 0,
        verbosity: str = "min",
    ):
        backend = backend.lower().strip()
        if backend not in ("tpu", "cpu", "gpu", "auto"):
            raise ValueError(
                f"backend must be 'tpu', 'cpu', 'gpu' or 'auto', got {backend!r}"
            )
        self._backend = "cpu" if backend == "cpu" else "tpu"
        # pre-flight diagnostics (parity with the reference's GPU pre-flight
        # checks, tachyon_optix_impl.cu:232-296): an explicit backend="tpu"
        # request that silently lands on the CPU interpreter path should warn
        if backend == "tpu":
            import jax as _jax

            try:
                platform = _jax.devices()[0].platform
            except Exception:  # pragma: no cover - no devices at all
                platform = "cpu"
            global _WARNED_CPU_FALLBACK
            if platform == "cpu" and not _WARNED_CPU_FALLBACK:
                _WARNED_CPU_FALLBACK = True
                import warnings

                warnings.warn(
                    "TachyonRender(backend='tpu') requested but the default "
                    "JAX device is CPU — rendering will run on the host. "
                    "Use backend='auto' to silence this, or install/enable a "
                    "TPU runtime.",
                    RuntimeWarning,
                    stacklevel=2,
                )
        bg = tuple(float(v) for v in background)
        self._bg_a = bg[3] if len(bg) > 3 else 1.0
        self._cfg = RenderConfig(
            aa_samples=int(aa_samples),
            aa_enabled=bool(antialiasing),
            ao_samples=int(ao_samples),
            ao_enabled=bool(ao),
            shadows_enabled=bool(shadows),
            direct_light_enabled=True,
            ao_brightness=float(ao_brightness),
            ao_max_dist=float(ao_max_dist),
            direct_light_intensity=float(direct_light_intensity),
            background=bg[:3],
        )
        self._seed = int(seed)
        # tile-binned fast path (exact) — disable to force the brute tracer
        self.use_tiling = True
        # Pallas VMEM closest-hit kernel on the tiled path (opaque, no AO)
        self.use_pallas = backend != "cpu"
        # per-phase timers (parity with Tachyon's wkf timers / RT_VERB_TIMING,
        # TachyonOptiX.h:651-679): populated on every render() call
        if verbosity not in ("min", "timing", "debug"):
            raise ValueError("verbosity must be 'min', 'timing' or 'debug'")
        self.verbosity = verbosity
        self.last_timings: dict = {}

    @property
    def backend(self) -> str:
        return self._backend

    def __repr__(self) -> str:
        return (
            f"TachyonRender(backend={self._backend!r}, "
            f"ao={self._cfg.ao_enabled}, aa={self._cfg.aa_enabled})"
        )

    # ------------------------------------------------------------------
    def render(
        self,
        positions: np.ndarray,
        colors: np.ndarray,
        radii: np.ndarray,
        camera: Optional[CameraParams] = None,
        bond_edges: Optional[np.ndarray] = None,
        bond_colors: Optional[np.ndarray] = None,
        bond_radius: float = 0.1,
        bond_color: tuple = (0.8, 0.8, 0.8, 1.0),
        box_edges: Optional[np.ndarray] = None,
        box_edge_radius: float = 0.05,
        box_color: tuple = (1.0, 1.0, 1.0, 1.0),
        width: int = 800,
        height: int = 600,
        output_figure: Optional[str] = None,
        transparent: bool = False,
        device_output: bool = False,
    ) -> Optional[np.ndarray]:
        """Render spheres + optional bond/box cylinders -> (H,W,4) uint8 RGBA.

        ``device_output=True`` (megakernel-eligible scenes only) returns the
        quantized (H,W,3) uint8 frame as a device array without the
        host round-trip — the serving path when the consumer (video encoder,
        metric, training loss) lives on-device."""
        import time as _time

        import jax

        timings: dict = {}
        self.last_timings = timings
        _t0 = _time.perf_counter()

        def _mark(phase, start):
            now = _time.perf_counter()
            timings[phase] = timings.get(phase, 0.0) + (now - start)
            return now

        positions = np.ascontiguousarray(positions, dtype=np.float64)
        colors = np.ascontiguousarray(colors, dtype=np.float32)
        radii = np.ascontiguousarray(radii, dtype=np.float32)
        if positions.ndim != 2 or positions.shape[1] != 3:
            raise ValueError(f"positions must be (N,3), got {positions.shape}")
        if colors.ndim != 2 or colors.shape[1] != 4:
            raise ValueError(f"colors must be (N,4), got {colors.shape}")
        if radii.ndim != 1:
            raise ValueError(f"radii must be (N,), got {radii.shape}")

        if camera is None:
            max_r = float(radii.max()) if len(radii) else 0.0
            camera = auto_camera(positions, max_radius=max_r)

        if bond_edges is not None:
            bond_edges = np.ascontiguousarray(bond_edges, dtype=np.float64)
            if bond_edges.ndim != 3 or bond_edges.shape[1:] != (2, 3):
                raise ValueError(f"bond_edges must be (K,2,3), got {bond_edges.shape}")
            if bond_edges.shape[0] == 0:
                bond_edges = None
            elif bond_colors is None:
                bc = tuple(float(v) for v in bond_color)
                bond_colors = np.tile(
                    np.array(
                        [bc[0], bc[1], bc[2], bc[3] if len(bc) > 3 else 1.0],
                        dtype=np.float32,
                    ),
                    (bond_edges.shape[0], 1),
                )
        if box_edges is not None:
            box_edges = np.ascontiguousarray(box_edges, dtype=np.float64)
            if box_edges.shape[0] == 0:
                box_edges = None

        dtype = np.float64 if self._backend == "cpu" else np.float32
        any_alpha = bool(np.any(colors[:, 3] < 1.0)) or (
            bond_colors is not None and bool(np.any(np.asarray(bond_colors)[:, 3] < 1.0))
        ) or (len(box_color) > 3 and box_color[3] < 1.0)
        cfg = self._cfg._replace(transparency=any_alpha)

        # steady-state frames skip scene+accel rebuilds entirely.  Hashing
        # 40+ MB of positions per frame would cost more than the trace, so the
        # fingerprint samples each buffer: full head/tail plus a ~256 KB
        # stride sample.  Any physical update (atoms move every frame in MD)
        # perturbs the sample; a partial in-place edit that misses every
        # sampled element is the (accepted, documented) cache hazard.
        # identity fast path: same array objects + same geometry params ->
        # same scene key with zero hashing (the cache holds references, so
        # ids stay valid; in-place mutation of a cached buffer is the same
        # documented hazard as the sampled hash below).
        # KEY SPLIT (orbit/animation workloads): scene_key covers geometry
        # only; view_key covers camera + raster size.  Camera motion then
        # reuses everything scene-keyed — the device scene buffers and the
        # (world-space) AO light structures — and rebuilds only the
        # camera-dependent screen bins / primary-light bins / records.
        view_key = repr((camera.__dict__, width, height))
        geom_key = repr((bond_radius, box_edge_radius, box_color, dtype))
        id_key = (
            tuple(id(a) for a in (positions, colors, radii,
                                  bond_edges, bond_colors, box_edges)),
            geom_key,
        )
        if getattr(self, "_id_key", None) == id_key:
            scene_key = self._scene_hash
            self._id_refs = (positions, colors, radii,
                             bond_edges, bond_colors, box_edges)
        else:
            scene_key = None

        import hashlib

        def _update(h, a):
            b = a.reshape(-1).view(np.uint8)
            h.update(b[:4096])
            h.update(b[-4096:])
            stride = max(1, b.size // 262144)
            h.update(np.ascontiguousarray(b[::stride]))
            h.update(str(a.shape).encode())

        if scene_key is None:
            h = hashlib.sha1()
            for a in (positions, colors, radii):
                _update(h, a)
            for a in (bond_edges, bond_colors, box_edges):
                if a is not None:
                    _update(h, np.ascontiguousarray(a))
            h.update(geom_key.encode())
            scene_key = h.hexdigest()
            self._id_key = id_key
            self._id_refs = (positions, colors, radii,
                             bond_edges, bond_colors, box_edges)
        self._scene_hash = scene_key
        cache_key = (scene_key, view_key)

        _t0 = _mark("prepare", _t0)
        if getattr(self, "_scene_key", None) == scene_key:
            scene = self._scene_cache
        else:
            scene = build_scene(
                positions, colors, radii,
                bond_edges=bond_edges, bond_colors=bond_colors,
                bond_radius=bond_radius,
                box_edges=box_edges, box_edge_radius=box_edge_radius,
                box_color=box_color, dtype=dtype,
            )
            self._scene_cache = None
            self._scene_key = None

        frame = camera_frame(camera, width, height)
        devices = jax.devices("cpu") if self._backend == "cpu" else jax.devices()
        with jax.default_device(devices[0]):
            if self._scene_key != scene_key:
                scene = jax.tree.map(
                    lambda a: jax.device_put(np.asarray(a, dtype)), scene
                )
                self._scene_cache = scene
                self._scene_key = scene_key
                # live-primitive counts force a host sync of device radii —
                # compute once per scene (static control flow needs them)
                self._scene_nlive = None
            _t0 = _mark("scene_build", _t0)
            # AO mode: "exact" = brute per-sample jittered hemisphere (the
            # reference's estimator; O(rays x primitives), small scenes);
            # "fast" = K antipodal stratified sky directions through the
            # megakernel's shadow machinery (noise-free quadrature of the
            # same integral; scales to millions of atoms); "auto" picks by
            # scene size.
            ao_mode = os.environ.get("MDAPY_TPU_AO_MODE", "auto")
            ao_fast = cfg.ao_enabled and self.use_tiling and (
                ao_mode == "fast"
                or (ao_mode == "auto" and scene.sph_center.shape[0] > 20000)
            )
            if (cfg.ao_enabled and not ao_fast) or not self.use_tiling:
                img_f = render_image(
                    scene,
                    frame["origin"], frame["lowleft"], frame["iplaneright"],
                    frame["iplaneup"], frame["view"], frame["light_dir"],
                    cfg, int(width), int(height), bool(frame["perspective"]),
                    self._seed,
                )
            else:
                from .accel import build_light_bins, build_screen_bins
                from .tracer_tiled import render_image_pallas, render_image_tiled

                # cache acceleration structures across renders of the same
                # scene/camera/size (steady-state frames rebuild nothing)
                if getattr(self, "_accel_key", None) == cache_key:
                    bins, lb, self._chunk_data_cached = self._accel_cache
                else:
                    if getattr(self, "_scene_nlive", None) is None:
                        from .accel import scene_live_counts

                        self._scene_nlive = scene_live_counts(scene)
                    nlive = self._scene_nlive
                    if not hasattr(self, "_cap_cache"):
                        self._cap_cache = {}
                    # measured: 32px tiles do NOT beat 16px (the trace is
                    # bound by per-chunk costs, which track total candidate
                    # volume, not tile count) — 16 stays the default; the
                    # knob remains for tuning sweeps
                    _tpx = int(os.environ.get("MDAPY_TPU_TILE_PX", "16"))
                    if _tpx not in (8, 16, 32):
                        import warnings

                        warnings.warn(
                            f"MDAPY_TPU_TILE_PX={_tpx} is unsupported "
                            "(must be 8, 16 or 32); falling back to 16",
                            RuntimeWarning,
                        )
                        _tpx = 16
                    bins = build_screen_bins(
                        scene, frame, int(width), int(height), tile_px=_tpx,
                        nlive=nlive, cap_cache=self._cap_cache)
                    # grid=32: measured sweet spot for the megakernel's
                    # cell-rect iteration on the 1M-atom 1080p bench
                    # (sweep: 16->76.7ms, 24->54.0, 32->54.4, 48->58.9,
                    # 64->63.7, 96->78.5 ms/frame).  MDAPY_TPU_LIGHT_GRID
                    # overrides for tuning sweeps.
                    import os as _os

                    _lg = int(_os.environ.get("MDAPY_TPU_LIGHT_GRID", "32"))
                    lb = build_light_bins(
                        scene, frame["light_dir"].astype(dtype), grid=_lg,
                        nlive=nlive, cap_cache=self._cap_cache,
                    )
                    self._chunk_data_cached = None
                    self._accel_cache = (bins, lb, None)
                    self._accel_key = cache_key
                    _t0 = _mark("accel_build", _t0)
                use_pallas = (
                    self.use_pallas
                    and bins.sph_chunks is not None
                )
                sphere_only = bins.cyl is None and bins.ring is None
                # cyl/ring scenes run in the megakernel too while the dense
                # per-tile lists stay small (box edges, sparse bonds); heavy
                # bond scenes keep the chunked banded path
                k_other = (
                    (0 if bins.cyl is None else bins.cyl.cand.shape[1])
                    + (0 if bins.ring is None else bins.ring.cand.shape[1])
                )
                # global cyl/ring occluder list is whole-array VMEM in the
                # megakernel and scanned per tile — bound it (heavy bond
                # scenes keep the banded path)
                n_cylring = 0
                if not sphere_only:
                    nl = getattr(self, "_scene_nlive", None)
                    if nl is None:
                        from .accel import scene_live_counts

                        nl = self._scene_nlive = scene_live_counts(scene)
                    n_cylring = nl["cyl"] + nl["ring"]
                # fast-AO passes run the megakernel with shadow rays on
                # regardless of cfg.shadows_enabled, so the occluder bound
                # must cover the AO case too.
                # KNOWN CLIFF (open): very heavy bond scenes — >512 per-tile
                # cyl/ring candidates, or >8192 global occluders with
                # shadows/AO — drop to the exact tracer.  The bound is not
                # VMEM (the lists could stream) but the per-tile DENSE
                # candidate intersection, which scales with the full list;
                # removing it needs depth-sorted cyl/ring chunks with zmin
                # early-exit like the sphere path.
                use_mega = (
                    use_pallas and bins.sph_chunks is not None
                    and bins.tile_px in (8, 16, 32) and cfg.direct_light_enabled
                    and (sphere_only or k_other <= 512)
                    and (sphere_only
                         or not (cfg.shadows_enabled or cfg.ao_enabled)
                         or n_cylring <= 8192)
                )
                # transparency peeling runs in the megakernel (spheres AND
                # cyl/ring bond scenes); budget-1 configs run the same
                # kernel in peel1 mode (one alpha-composited peel)
                if (cfg.ao_enabled or cfg.transparency) and not use_mega:
                    # fast AO needs the megakernel; other tiled paths don't
                    # do AO — brute exact path
                    img_f = render_image(
                        scene,
                        frame["origin"], frame["lowleft"],
                        frame["iplaneright"], frame["iplaneup"],
                        frame["view"], frame["light_dir"],
                        cfg, int(width), int(height),
                        bool(frame["perspective"]), self._seed,
                    )
                elif use_mega:
                    from .accel import build_light_records, gather_other_records
                    from .megakernel import (
                        build_mega_params, render_image_mega,
                        render_image_mega_banded,
                    )
                    from .pallas_kernels import gather_chunk_data

                    # scenes whose materialized per-tile records exceed the
                    # HBM budget render in sequential tile-row bands with
                    # per-band gathers (10M-atom scale on one chip)
                    _nbq, _nchq, _chq = bins.sph_chunks.shape
                    _budget = int(float(os.environ.get(
                        "MDAPY_TPU_CHUNK_BUDGET_GB", "2")) * (1 << 30))
                    _rec_bytes = _nbq * _nchq * _chq * 32
                    big_scene = (
                        self._backend != "cpu"
                        and sphere_only
                        and _rec_bytes > _budget
                    )
                    # records past the working budget but within HBM are
                    # assembled once band-by-band (bounded peak) and cached
                    # across frames — steady-state 10M-atom frames then run
                    # the one-shot kernel with zero per-frame gathers
                    _cache_budget = int(float(os.environ.get(
                        "MDAPY_TPU_RECORD_CACHE_GB", "9")) * (1 << 30))
                    _banded_gather = big_scene and _rec_bytes <= _cache_budget
                    if _banded_gather:
                        big_scene = False
                    cached = self._chunk_data_cached
                    if cached is not None and cached[0] == "mega":
                        (_, chunk_data, light_records, params,
                         other_rec) = cached
                    else:
                        from .pallas_kernels import gather_chunk_data_banded

                        if big_scene:
                            chunk_data = None
                        elif _banded_gather:
                            chunk_data = gather_chunk_data_banded(
                                bins.sph_chunks, scene.sph_center,
                                scene.sph_radius, scene.sph_color,
                                band_bytes=_budget // 2,
                            )
                        else:
                            chunk_data = gather_chunk_data(
                                bins.sph_chunks, scene.sph_center,
                                scene.sph_radius, scene.sph_color,
                            )
                        light_records = (
                            build_light_records(
                                lb, scene,
                                cap_cache=getattr(self, "_cap_cache", None))
                            if cfg.shadows_enabled
                            else (None, None, None, None)
                        )
                        other_rec = gather_other_records(bins, scene, lb)
                        jnp = jax.numpy
                        lo1 = jnp.min(
                            scene.sph_center - scene.sph_radius[:, None], axis=0
                        )
                        hi1 = jnp.max(
                            scene.sph_center + scene.sph_radius[:, None], axis=0
                        )
                        if not sphere_only:
                            cmid = scene.cyl_base + 0.5 * scene.cyl_axis
                            cext = (
                                0.5 * jnp.linalg.norm(scene.cyl_axis, axis=-1)
                                + jnp.maximum(scene.cyl_radius, 0)
                            )
                            lv = (scene.cyl_radius > 0)[:, None]
                            lo1 = jnp.minimum(lo1, jnp.min(
                                jnp.where(lv, cmid - cext[:, None], 1e30), axis=0))
                            hi1 = jnp.maximum(hi1, jnp.max(
                                jnp.where(lv, cmid + cext[:, None], -1e30), axis=0))
                            rv = (scene.ring_rout > 0)[:, None]
                            lo1 = jnp.minimum(lo1, jnp.min(jnp.where(
                                rv, scene.ring_center - scene.ring_rout[:, None],
                                1e30), axis=0))
                            hi1 = jnp.maximum(hi1, jnp.max(jnp.where(
                                rv, scene.ring_center + scene.ring_rout[:, None],
                                -1e30), axis=0))
                        params = build_mega_params(
                            frame, lb, np.asarray(lo1), np.asarray(hi1), cfg
                        )
                        self._chunk_data_cached = (
                            "mega", chunk_data, light_records, params,
                            other_rec,
                        )
                        self._accel_cache = (bins, lb, self._chunk_data_cached)
                    S = (cfg.aa_samples if cfg.aa_enabled else 0) + 1
                    other_kw = {}
                    if other_rec is not None:
                        other_kw = dict(
                            other_data=other_rec[0], other_count=other_rec[1],
                            occ_recs=other_rec[2], n_occ=other_rec[3],
                        )

                    ao_passes = None
                    # merged-sweep experiments exclude the antipodal path
                    ao_antipodal = (
                        os.environ.get("MDAPY_TPU_AO_ANTIPODAL", "0") == "1"
                        and os.environ.get(
                            "MDAPY_TPU_MERGED_SWEEP", "0") != "1"
                    )
                    if ao_fast:
                        # K antipodal stratified sky directions; each is one
                        # directional-occlusion pass through the megakernel
                        # (AO term = (2/S) sum vis*|N.d|*skycol decomposes
                        # into per-direction light passes with ambient=0).
                        # In antipodal mode each +d entry also carries its -d
                        # twin through the SAME sweep (per-ray sign select in
                        # the kernel): K/2 accel builds, K/2 sweeps, same
                        # quadrature bit-for-bit.
                        # Scene-keyed: sky directions and their light-space
                        # CSR structures are world-space — camera orbits
                        # reuse them wholesale.
                        ao_ckey = (scene_key, ao_antipodal)
                        if getattr(self, "_ao_cache_key", None) == ao_ckey:
                            ao_passes = self._ao_cache
                        else:
                            import jax.numpy as jnp

                            K2 = max(1, int(cfg.ao_samples) // 2)
                            hemi = _fib_hemisphere(K2)
                            dirs = (
                                hemi if ao_antipodal
                                else np.concatenate([hemi, -hemi], axis=0)
                            )
                            lightcol_k = (4.0 / (2 * K2)) * float(
                                cfg.ao_brightness
                            )
                            lo1 = params[31:34]
                            hi1 = params[34:37]
                            ao_passes = []
                            for dk in dirs:
                                lb_k = build_light_bins(
                                    scene, np.asarray(dk, dtype),
                                    grid=lb.grid,
                                    nlive=self._scene_nlive,
                                    cap_cache=getattr(self, "_cap_cache",
                                                      None),
                                )
                                lr_k = build_light_records(
                                    lb_k, scene,
                                    cap_cache=getattr(self, "_cap_cache",
                                                      None))
                                or_k = gather_other_records(bins, scene, lb_k)
                                frame_k = dict(frame)
                                frame_k["light_dir"] = np.asarray(dk, np.float32)
                                p_k = build_mega_params(frame_k, lb_k, lo1, hi1, cfg)
                                p_k[27] = lightcol_k
                                p_k[28:31] = 0.0   # sky passes add no background
                                p_k[38] = 0.0      # ambient counted once (direct)
                                ao_passes.append((lr_k, or_k, p_k))
                            self._ao_cache = ao_passes
                            self._ao_cache_key = ao_ckey
                            _t0 = _mark("ao_accel_build", _t0)

                    # fast-AO sky directions fold into the SAME launch as
                    # extra lights: one closest-hit traversal serves the
                    # primary light and every AO pass (K+1 shadow sweeps)
                    extra_lights = None
                    shadows_flag = bool(cfg.shadows_enabled)
                    lr0 = light_records
                    if ao_passes is not None:
                        extra_lights = []
                        rmax_s = float(radii.max()) if len(radii) else 0.0
                        for lr_k, or_k, p_k in ao_passes:
                            lrow = np.concatenate([
                                p_k[15:18], p_k[18:24], p_k[24:27],
                                p_k[27:28], np.zeros(3, np.float32),
                            ]).astype(np.float32)
                            # slot 13: max sphere radius — the antipodal
                            # backward scan's early-exit bound
                            lrow[13] = rmax_s
                            occ_k = or_k[2] if or_k is not None else None
                            extra_lights.append(
                                (lrow, lr_k[0], lr_k[1], lr_k[2], occ_k,
                                 lr_k[3] if len(lr_k) > 3 else None)
                            )
                        if not shadows_flag:
                            # AO needs the shadow machinery on; give the
                            # (unshadowed) primary light an empty CSR
                            ncl = lb.grid * lb.grid
                            lr0 = (
                                np.zeros((8, 128), np.float32),
                                np.zeros(ncl, np.int32),
                                np.zeros(ncl, np.int32),
                                np.full(ncl, -1e18, np.float32),
                            )
                        shadows_flag = True
                    _ao_shared = (
                        extra_lights is not None
                        and os.environ.get("MDAPY_TPU_AO_SHARED", "1") != "0"
                    )
                    _peel = cfg.max_trans if cfg.transparency else 1
                    _peel1 = bool(cfg.transparency and cfg.max_trans == 1)
                    if _peel1:
                        _peel = 1
                    _msw_env = os.environ.get(
                        "MDAPY_TPU_MERGED_SWEEP", "0") == "1"
                    _anti = ao_antipodal and extra_lights is not None
                    if chunk_data is None:
                        img_f = render_image_mega_banded(
                            scene, bins,
                            lr0[0], lr0[1], lr0[2],
                            params, self._seed,
                            lkmax=(lr0[3] if len(lr0) > 3 else None),
                            S=S, width=int(width), height=int(height),
                            grid_n=lb.grid, eps=cfg.eps,
                            perspective=bool(frame["perspective"]),
                            shadows=shadows_flag,
                            interpret=(self._backend == "cpu"),
                            quantized=device_output,
                            extra_lights=extra_lights,
                            ao_shared=_ao_shared, n_peel=_peel,
                            max_band_bytes=_budget,
                            ao_antipodal=_anti, peel1=_peel1,
                        )
                    else:
                        img_f = render_image_mega(
                            chunk_data, bins.sph_zmin,
                            lr0[0], lr0[1], lr0[2],
                            params, self._seed,
                            lkmax=(lr0[3] if len(lr0) > 3 else None),
                            S=S, width=int(width), height=int(height),
                            tiles_x=bins.tiles_x, tiles_y=bins.tiles_y,
                            grid_n=lb.grid, eps=cfg.eps,
                            perspective=bool(frame["perspective"]),
                            shadows=shadows_flag,
                            interpret=(self._backend == "cpu"),
                            quantized=device_output,
                            extra_lights=extra_lights,
                            ao_shared=_ao_shared,
                            n_peel=_peel,
                            tile_px=bins.tile_px,
                            merged_sweep=_msw_env,
                            ao_antipodal=_anti, peel1=_peel1,
                            **other_kw,
                        )
                    if device_output:
                        _t0 = _mark("trace", _t0)
                        return img_f
                elif use_pallas:
                    from .accel import build_light_records
                    from .pallas_kernels import gather_chunk_data

                    cached = self._chunk_data_cached
                    if cached is not None and cached[0] == "pallas":
                        _, chunk_data, light_records = cached
                    else:
                        chunk_data = gather_chunk_data(
                            bins.sph_chunks, scene.sph_center,
                            scene.sph_radius, scene.sph_color,
                        )
                        # Pallas shadow kernel only covers spheres; scenes
                        # with cylinders/rings keep the XLA light-grid pass
                        sphere_only = bins.cyl is None and bins.ring is None
                        light_records = (
                            build_light_records(lb, scene) if sphere_only else None
                        )
                        self._chunk_data_cached = (
                            "pallas", chunk_data, light_records,
                        )
                        self._accel_cache = (bins, lb, self._chunk_data_cached)
                    # render in horizontal tile bands to bound HBM usage
                    band_rows = max(1, 2048 // bins.tiles_x)
                    bands = []
                    for ty0 in range(0, bins.tiles_y, band_rows):
                        ty1 = min(bins.tiles_y, ty0 + band_rows)
                        b0, b1 = ty0 * bins.tiles_x, ty1 * bins.tiles_x
                        from .accel import KindBins, ScreenBins as SB

                        sub = SB(
                            bins.sph_chunks[b0:b1], bins.sph_zmin[b0:b1],
                            None if bins.cyl is None else KindBins(
                                bins.cyl.cand[b0:b1], bins.cyl.count[b0:b1]),
                            None if bins.ring is None else KindBins(
                                bins.ring.cand[b0:b1], bins.ring.count[b0:b1]),
                            bins.tiles_x, ty1 - ty0, bins.tile_px,
                        )
                        band_img = render_image_pallas(
                            scene, sub, chunk_data[b0:b1], lb,
                            frame["origin"], frame["lowleft"], frame["iplaneright"],
                            frame["iplaneup"], frame["view"], frame["light_dir"],
                            cfg, int(width),
                            (ty1 - ty0) * bins.tile_px,
                            bool(frame["perspective"]), self._seed,
                            bins.tile_px, bins.tiles_x, ty1 - ty0,
                            interpret=(self._backend == "cpu"),
                            ty_offset=ty0, do_flip=False,
                            light_records=light_records,
                            light_grid_n=lb.grid,
                        )
                        bands.append(np.asarray(band_img))
                    img_f = np.concatenate(bands, axis=0)[:height][::-1]
                else:
                    img_f = render_image_tiled(
                        scene, bins, lb,
                        frame["origin"], frame["lowleft"], frame["iplaneright"],
                        frame["iplaneup"], frame["view"], frame["light_dir"],
                        cfg, int(width), int(height), bool(frame["perspective"]),
                        self._seed, bins.tile_px, bins.tiles_x, bins.tiles_y,
                    )
            img_f = np.asarray(img_f)
        _t0 = _mark("trace", _t0)

        img = np.empty((height, width, 4), dtype=np.uint8)
        img[:, :, :3] = quantize(img_f)
        img[:, :, 3] = np.uint8(
            max(0.0, min(1.0, self._bg_a)) * 255.0 + 0.5
        )
        if transparent:
            bg = np.array(cfg.background, dtype=np.float32) * 255.0
            diff = np.abs(img[:, :, :3].astype(np.float32) - bg).max(axis=2)
            img[:, :, 3] = np.where(diff < 1.5, 0, 255).astype(np.uint8)
        _t0 = _mark("image_out", _t0)
        if self.verbosity in ("timing", "debug"):
            total = sum(timings.values())
            phases = "  ".join(f"{k}={v:.3f}s" for k, v in timings.items())
            print(f"[TachyonRender] {phases}  total={total:.3f}s")
        if output_figure is not None:
            save_image(output_figure, img)
            return None
        return img

    # ------------------------------------------------------------------
    def render_system(
        self,
        system,
        colors: Optional[np.ndarray] = None,
        radii: Optional[np.ndarray] = None,
        camera: Optional[CameraParams] = None,
        draw_bond: bool = False,
        bond: Optional[np.ndarray] = None,
        bond_radius: float = 0.1,
        bond_color: tuple = (0.8, 0.8, 0.8, 1.0),
        bond_color_mode: str = "uniform",
        draw_box: bool = True,
        box_edge_radius: float = 0.05,
        box_color: tuple = (1.0, 1.0, 1.0, 1.0),
        default_radius: float = 1.0,
        width: int = 800,
        height: int = 600,
        output_figure: Optional[str] = None,
        transparent: bool = False,
    ) -> Optional[np.ndarray]:
        """Render a System in one call (parity: render.py:422-532)."""
        pos = system.get_positions()
        if colors is None:
            colors = _default_colors(system)
        colors = np.ascontiguousarray(colors, dtype=np.float32)
        if radii is not None:
            radii = np.ascontiguousarray(radii, dtype=np.float32)
        elif "element" in system.data.columns:
            radii = np.array(
                [
                    ele_radius.get(e, default_radius * 2) / 2
                    for e in np.asarray(system.data["element"]).astype(str)
                ],
                dtype=np.float32,
            )
        else:
            radii = np.full(system.N, default_radius, dtype=np.float32)

        box_e = _box_edges(system.box) if draw_box else None
        bond_e = None
        bond_c = None
        if draw_bond:
            if bond is None:
                if getattr(system, "bond", None) is None:
                    raise ValueError(
                        "draw_bond=True requires a bond array or system.create_bonds() first."
                    )
                bond = system.bond
            bond_e, bond_c = _bond_edges(
                pos, system.box, bond, colors, radii, bond_radius, bond_color_mode
            )
        return self.render(
            pos, colors, radii,
            camera=camera,
            bond_edges=bond_e,
            bond_colors=bond_c if bond_color_mode == "atom" else None,
            bond_radius=bond_radius,
            bond_color=bond_color,
            box_edges=box_e,
            box_edge_radius=box_edge_radius,
            box_color=box_color,
            width=width,
            height=height,
            output_figure=output_figure,
            transparent=transparent,
        )
