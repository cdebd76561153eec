"""Stateful headless viewer.

Replaces the reference's interactive loop (``main.cpp:603-616`` +
``VolumeRenderer::Impl::render``, ``src/renderer/cuda_renderer.cpp:68-163``)
with a headless frame-step driver that reproduces:

  * per-frame camera change detection and visit-tracking gating
    (``cuda_renderer.cpp:99-105``),
  * dynamic splitting / resampling cadence with drag suppression
    (``cuda_renderer.cpp:145-147``),
  * capacity-pressure pruning (``cuda_renderer.cpp:149-154``),
  * guided-sampling result caching keyed on camera state
    (``can_reuse_results``, ``cuda_renderer.cpp:103-139``),
  * M/R-toggle equivalents via ``RenderOptions`` mutation.

The GL framebuffer is replaced by returned arrays; screenshots via
``utils.write_png``.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .camera import Camera
from .n3tree import N3Tree
from .options import RenderOptions
from .ops.render import render_frame, to_rgba8
from .utils.metrics import FpsCounter, FrameTimer
from .utils.png import write_png

_log = logging.getLogger(__name__)


def _fov_compose_impl(p, c, f, y0, x0, h, w):
    """Nearest-upscale the periphery frame and paste the exact center
    window (device-side; see Viewer._render_foveated)."""
    import jax
    up = jnp.repeat(jnp.repeat(p, f, axis=0), f, axis=1)
    ph, pw = h - up.shape[0], w - up.shape[1]
    if ph or pw:                         # W/H not divisible by f
        up = jnp.pad(up, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return jax.lax.dynamic_update_slice(up, c, (y0, x0, 0))


def _fov_compose(imgp, imgc, *, f: int, y0: int, x0: int,
                 height: int, width: int):
    # module-level jit: a per-call wrapper would recompile every frame
    # (measured 623 ms/frame before this was hoisted)
    global _fov_compose_jit
    if _fov_compose_jit is None:
        import functools
        import jax
        _fov_compose_jit = jax.jit(
            _fov_compose_impl,
            static_argnames=("f", "y0", "x0", "h", "w"))
    return _fov_compose_jit(imgp, imgc, f, y0, x0, height, width)


_fov_compose_jit = None


class Viewer:
    def __init__(self,
                 tree: Optional[N3Tree] = None,
                 camera: Optional[Camera] = None,
                 options: Optional[RenderOptions] = None,
                 max_tree_capacity: Optional[int] = None,
                 model=None):
        self.camera = camera or Camera()
        self.options = options or RenderOptions()
        self.model = model            # models.MegaNeRFModel or None
        self.tree = None
        # honored by set()/load_state even when no tree is given yet, so
        # Viewer(max_tree_capacity=N) + load_state resumes a refinement
        # session with growth headroom instead of tree.max_capacity
        self.max_tree_capacity = max_tree_capacity
        self.fps = FpsCounter()
        self.timer = FrameTimer()
        self._visit_tracker = None
        # True once at least one visit-tracked frame has fed the tracker
        # since its last reset — pruning on an unfed tracker would
        # delete every unvisited chunk (see the prune gate in render())
        self._visits_valid = False
        self._prune_happened = False
        self._can_reuse_results = False
        self._guided_cache = None
        # monotone TREE generation: bumped by set()/expand/prune so
        # tree-derived caches (grid overlay) can key on it instead of
        # id(self.tree) (ids can be reused after the old tree is
        # collected, serving stale frames)
        self._tree_gen = 0
        # monotone generation stamp for _guided_cache: the composited-
        # image cache keys on this (NOT id(cache) — ids can be reused
        # after the old dict is collected, serving a stale frame)
        self._guided_gen = 0
        # leaf-map accelerated static-view path (ops/accel.py)
        self.use_fast_path = True
        # traced continuous knobs: slider-style changes to step_size /
        # thresholds / bbox / background reuse one compiled executable
        self.use_dynamic_knobs = True
        # guided compositor routing (guided.composite_frame): None =
        # auto (compact SH caches take the single-pass Pallas
        # segmented-scan kernel; padded/depth/no-viewdir take XLA);
        # False forces XLA everywhere (the padded-layout Pallas kernel
        # is reference-only and never routed)
        self.use_pallas_composite = None
        # turbo: max-empty-cube leaf map (sub-1e-3 drift; see accel.py)
        self.use_turbo_map = False
        # Pallas entry-skip prepass (bit-identical pixels; pallas_march)
        self.use_prepass = True
        self._skip_table = None
        self._skip_thresh = None
        # How the segmented fast path handles stale budget overflow:
        #  - "sync": check the flags before returning each frame and
        #    redo if stale — every returned frame is exact.  The check
        #    is a host round trip per frame: ~1 ms on a production
        #    link, ~27 ms of device-idle bubble through the axon dev
        #    tunnel.  Default: correctness first.
        #  - "async": return the segmented frame without checking;
        #    flags are read one frame later (zero pipeline stall) and
        #    retune budgets/hints for FUTURE frames.  A staleness
        #    event shows ONE transient budget-truncated frame — the
        #    interactive-motion mode (artifact frames are rare and
        #    replaced on the next render).
        #  - "device": escalation folded into the compiled frame as an
        #    XLA conditional (accel._frame_core device_fallback):
        #    always exact AND no host sync, but the conditional costs
        #    a measured ~24 ms/frame at 1080p steady state on v5e
        #    (fusion barrier), so use it only where both correctness
        #    and sync-freedom matter more than throughput.
        self.overflow_policy = "sync"
        self._pending_ov = None
        # Device-resident order refresh under camera motion: segmented
        # frames return their (steps, nrec, skips) hints as device
        # arrays, and a camera move triggers a fully on-device rebuild
        # of the ray order (argsort + scatter-inverse, ~75 ms at 1080p
        # on v5e) instead of the host path's fetch+argsort+upload
        # (~3 ms production, 0.6-1.3 s through the dev tunnel).  Fresh
        # order every moved frame keeps the budget classes valid, so
        # escalation (and its recompiles) stays rare under motion.
        self.use_device_order = True
        self._hints_packed = None
        self._order_stale = False
        self._clean_streak = 0
        # How moved frames regain a valid order + budgets:
        #  - "rehint": two-pass measured motion frame (accel.
        #    _motion_core): a quarter-resolution budget-0 count march
        #    MEASURES this pose's true record needs, the full order is
        #    rebuilt from the upsampled keys, and the frame marches at
        #    steady (margin=1) budgets — one fused dispatch per pose.
        #    Measured 204 vs 320 ms/pose on the 1080p shell orbit: the
        #    dilation path's real cost is stale-order chunk-max march
        #    waste (169 vs 63 ms for the identical budget-0 march,
        #    fresh vs one-pose-stale order), which measuring first
        #    avoids paying at full resolution.
        #  - "dilate": predict classes by max-dilating the previous
        #    pose's hints over the estimated sweep window (legacy;
        #    keeps every frame's order derivation measurement-free).
        self.motion_mode = "rehint"
        self._qperm = None
        self._motion_cdf_dev = None
        self._last_cdf = None
        self._segments_motion = None
        self._segments_motion_src = None
        # async-policy escalation tolerance: fraction of frame rays
        # allowed to exceed their class budget without escalating (the
        # moving-silhouette band; see _check_pending_overflow)
        self.motion_overflow_tolerance = 1.0 / 512.0
        # async-policy flag-fetch cadence (1 = every frame; raise to
        # amortize the per-fetch host round trip on slow links)
        self.overflow_check_interval = 1
        # flag-fetch cadence for RE-HINT motion poses specifically:
        # their budgets derive from measured CDFs and drift only with
        # the global class histogram, so a <=K-pose detection lag is
        # well inside the async tolerance contract — while the fetch
        # itself costs a host round trip per pose (~27 ms through the
        # dev tunnel; measured 3.96 -> 4.55 fps at 1080p with K=4)
        self.motion_flag_interval = 4
        # margin for mid-episode SETTLED re-hint budgets (derived from
        # measured in-pass CDFs at clean flag checks; the episode-start
        # tuple always uses margin=1 — see _check_pending_overflow)
        self.motion_settled_margin = 0
        # CDF-budget segmented guided collect (guided.py collect_t_fast
        # segments): once hints exist, hint-cheap ray classes march
        # with reduced record buffers (the ~half that record nothing
        # march with none).  Records stay exactly the reference's
        # silent-cap semantics via per-segment overflow escalation, and
        # the stale-hint flags ride the SAME device fetch as the
        # compact-budget sample count, so — unlike the retired
        # zero_frac prototype — this costs no extra host sync and is
        # on by default.  Segmentation is derived once per
        # order-lifetime (fractions are static jit keys).
        self.use_guided_segments = True
        self._guided_segments = None
        self._guided_seg_src = None
        # initial dense-record budget for hint-gathering frames; steady
        # frames use per-segment budgets (ops/accel.DEFAULT_SEGMENTS)
        # and both escalate on overflow
        self.fast_max_dense = 8
        # ~2k chunks: the march's while loop runs to each chunk's
        # max-step count, so small chunks waste far fewer lane-steps
        # (measured chunk-max/true-step waste 1.86x at 16k vs ~1.2x
        # here).  2176 (17 sublane tiles) measured fastest with the
        # level-6 prepass + 3-key sort; exactly 2048 hits a
        # pathological XLA layout (~+30%% on v5e).  Derived from the
        # attached device (utils.tuning, the auto_cuda_threads
        # analogue) — resolves to 2176 on v5e/CPU.
        from .utils.tuning import device_tuning
        self.fast_chunk_size = device_tuning().chunk_size
        # Sorted-frame display delivery (off by default): the compiled
        # frame skips its final [R, 4] unpermute — a per-row gather at
        # its measured device floor (~10.8 ms at 1080p, PERFORMANCE.md
        # roadmap #2) — and the DISPLAY CONSUMER applies the inverse
        # ray order as an index map instead: a u32 numpy gather on the
        # 4x-smaller rgba8 in render_rgba8()/screenshot()/web, or an
        # f32 numpy gather in render(fetch=True).  Pixels are
        # bit-identical (the background composite is elementwise, so
        # compositing in sorted space changes nothing); only WHERE the
        # remap runs changes — off the device critical path, onto host
        # time that overlaps the next frame's compute.  Covers the
        # segmented fast path without votes on PARKED frames (moving
        # frames keep the device unpermute: their per-frame order
        # rebuild would force a blocking [R] i32 map fetch — the very
        # motion-path host traffic the device-order design removes);
        # every other path keeps returning pixel order.  The map is
        # fetched once per parked episode.
        self.host_unpermute = False
        self._inv_host = None    # host copy of inv for the current order
        self._inv_src = None     # strong ref to the inv it was read from
        #                          (identity-keyed; the ref prevents id
        #                          reuse serving a stale map)
        self._frame_sorted = False   # did the LAST frame return sorted?
        # foveated APPROXIMATE mode (off by default, like turbo —
        # never silently on): periphery rendered at 1/foveation
        # resolution through the same fast path (a scaled camera) and
        # nearest-upscaled; a center window stays full resolution (a
        # pinhole crop is just an intrinsics shift, so its pixels run
        # the exact ray math).  The algorithmic march-reduction lever
        # PERFORMANCE.md's roadmap names: ray count drops to
        # center_frac^2 + (1 - center_frac^2)/foveation^2 of the frame.
        self.foveation = 1
        self.foveation_center = 0.5       # center-window axis fraction
        self._fov_sub = None              # (periphery, center) viewers
        self._fov_key = None
        self._fov_motion_gated = False    # logged-once guard, see render()
        self._fov_subs_stale = False      # subs missed >=1 pose (gate)
        self._leaf_map = None
        # extra overlay meshes (triangles/lines/points, utils.mesh.Mesh)
        # composited like the reference GL mesh layer (mesh.cpp:135-166)
        self.meshes = []
        # torch::manual_seed(42) analogue (main.cpp:522)
        import jax
        self._rng_key = jax.random.PRNGKey(42)
        if tree is not None:
            self.set(tree, max_tree_capacity)

    # ------------------------------------------------------------------
    @staticmethod
    def get_backend() -> str:
        import jax
        return jax.devices()[0].platform.upper()

    def set(self, tree: N3Tree, max_tree_capacity: Optional[int] = None):
        """Install a tree (reference ``Impl::set``, cuda_renderer.cpp:498-516)."""
        self.max_tree_capacity = (max_tree_capacity
                                  or self.max_tree_capacity
                                  or tree.max_capacity)
        if tree.max_capacity < self.max_tree_capacity:
            # re-pad to the requested growth capacity (move_to_device analogue)
            cap = int(tree.capacity)
            tree = N3Tree.from_arrays(
                np.asarray(tree.data)[:cap], np.asarray(tree.child)[:cap],
                np.asarray(tree.parent)[:cap], np.asarray(tree.scale),
                np.asarray(tree.offset), tree.data_format,
                sample_counts=np.asarray(tree.sample_counts)[:cap],
                max_capacity=self.max_tree_capacity)
        self.tree = tree
        self._tree_gen = getattr(self, "_tree_gen", 0) + 1
        self._leaf_map = None
        self._skip_table = None
        self._visit_tracker = jnp.zeros(
            (tree.max_capacity,), jnp.int32).at[0].set(1)
        self._visits_valid = False
        basis_dim = tree.data_format.basis_dim
        self.options = self.options.replace(
            basis_minmax=(0, max(basis_dim - 1, 0)))
        self._can_reuse_results = False
        self._guided_cache = None
        # a new tree shifts the sample-count distribution wholesale;
        # re-derive budget classes (stale ones stay correct via
        # escalation, but would thrash it)
        self._guided_segments = None
        self._guided_seg_src = None
        # foveated sub-viewers carry their own frame/guided caches and
        # hint state for the OLD tree: a tree swap with a parked camera
        # would otherwise serve stale sub-frames
        self._fov_sub = None
        self._fov_key = None

    def clear(self):
        self.tree = None

    def load_model(self, model_path: str):
        """Load a Mega-NeRF TorchScript container (reference
        ``Impl::load_model``, cuda_renderer.cpp:518-543)."""
        from .models import MegaNeRFModel
        self.model = MegaNeRFModel.from_torchscript(model_path)
        self.options = self.options.replace(
            need_viewdir=self.model.need_viewdir)
        if (self.options.appearance_embedding == -1
                and self.model.need_appearance_embedding):
            self.options = self.options.replace(appearance_embedding=0)
        self._can_reuse_results = False
        self._guided_cache = None
        self._fov_sub = None              # subs cache per-model results
        self._fov_key = None

    def resize(self, width: int, height: int):
        """Resize the virtual framebuffer (reference ``Impl::resize``,
        cuda_renderer.cpp:383-458 — intrinsics rescale with the window)."""
        cam = self.camera
        if cam.width == width and cam.height == height:
            return
        wr = width / cam.width
        hr = height / cam.height
        cam.fx *= wr
        cam.default_fx *= wr
        cam.fy *= hr
        cam.default_fy *= hr
        if cam.default_cx != -1:
            cam.cx *= wr
        else:
            cam.cx = width / 2
        if cam.default_cy != -1:
            cam.cy *= hr
        else:
            cam.cy = height / 2
        cam.width, cam.height = width, height
        self._can_reuse_results = False
        self._guided_cache = None

    # ------------------------------------------------------------------
    def render(self, fetch: bool = True):
        """Render one frame, running refinement/prune per the reference's
        frame orchestration (cuda_renderer.cpp:68-163).  Returns [H, W, 4]
        f32 RGBA.

        ``fetch=False`` returns the device array without the
        device->host copy — for TPU-resident consumers (encoders,
        downstream jitted stages, benchmark checksum chains) the ~33 MB
        1080p readback is pure waste; the array is fetchable later with
        ``np.asarray`` and the render dispatch stays asynchronous."""
        cam = self.camera
        opt = self.options
        cam._update()
        self._frame_sorted = False
        if self.tree is None:
            bg = opt.background_brightness
            img = np.full((cam.height, cam.width, 4), bg, np.float32)
            img[..., 3] = 1.0
            self.fps.tick()
            return img

        camera_changed = cam.has_changed()
        if camera_changed:
            self._order_stale = True
        # visit marks exist ONLY to feed capacity-pressure pruning,
        # which is gated on a refinable session (model present) below —
        # so a model-less viewer must never pay the visit-tracked exact
        # march for them (regression: a full-capacity static tree
        # orbited at 71 s/frame because every camera move re-tracked)
        # capacity pressure: the prune trigger zone (reference checks
        # capacity + split_batch > max unconditionally,
        # cuda_renderer.cpp:149-154)
        pressure = (self.max_tree_capacity - int(self.tree.capacity)
                    < opt.split_batch_size)
        track_visit = (self.model is not None
                       and (((camera_changed or not self._visits_valid)
                             and (pressure
                                  or int(self.tree.capacity)
                                  > self.max_tree_capacity * 3 // 4))
                            or self._prune_happened))
        if camera_changed:
            self._can_reuse_results = False

        needs_votes = (opt.use_splitting and not cam.is_dragging()
                       and self.model is not None)
        res = None
        fov_ok = (self.use_fast_path and self.tree.N == 2
                  and not track_visit and not needs_votes
                  and int(self.foveation) > 1
                  and not opt.render_depth
                  and not opt.show_grid and not self.meshes)
        # Auto-gate foveation off for guided frames while the camera is
        # MOVING: measured as a net cost (f=4 guided motion is 1.48x
        # the cost of f=1 — per-sub fixed costs [order rebuild, budget
        # episodes, collect/MLP dispatch] are paid twice per pose and
        # dominate; PERFORMANCE.md round-4 guided-motion row).  Steady-
        # camera guided foveation stays on: the sub-viewers' frame
        # caches make it free.  The reference has no analogue (it drops
        # to plain voxels during drag, cuda_renderer.cpp:107-139).
        if (fov_ok and opt.use_guided_sampling and self.model is not None
                and camera_changed and not cam.is_dragging()):
            fov_ok = False
            # the sub-viewers miss this pose change entirely; the next
            # foveated frame must not serve their pre-motion caches
            self._fov_subs_stale = True
            if not self._fov_motion_gated:
                self._fov_motion_gated = True
                _log.info(
                    "foveation auto-gated off under guided-sampling "
                    "camera motion (measured net cost: per-sub fixed "
                    "costs dominate moving guided poses — see "
                    "PERFORMANCE.md); steady-camera guided foveation "
                    "resumes when the camera settles")
        elif not camera_changed:
            self._fov_motion_gated = False
        if fov_ok:
            # approximate foveated frame (explicit opt-in); covers the
            # plain fast path AND guided sampling (each sub-viewer runs
            # its own guided pipeline at its resolution)
            with self.timer.time("render"):
                img = self._render_foveated(camera_changed)
        elif opt.use_guided_sampling and not cam.is_dragging() \
                and self.model is not None:
            img, res = self._render_guided(track_visit)
        elif opt.show_grid or self.meshes:
            with self.timer.time("render"):
                img, res = self._render_with_grid(track_visit)
        elif self.use_fast_path and self.tree.N == 2 \
                and not track_visit:
            # leaf-map accelerated path (votes included when refining;
            # only visit-tracking frames need the exact march).  During
            # continuous splitting each expand invalidates the map and
            # the next frame rebuilds it inside _render_fast — the
            # level-wise build (~0.3 s at level 8 on v5e) is ~50x
            # cheaper than the exact 1080p fallback frame (~19 s), so
            # refinement sessions never leave the fast march.
            with self.timer.time("render"):
                img, res = self._render_fast(need_votes=needs_votes)
        else:
            with self.timer.time("render"):
                img, res = render_frame(
                    self.tree, cam.width, cam.height,
                    cam.fx, cam.fy, cam.cx, cam.cy,
                    jnp.asarray(cam.transform), opt,
                    track_visit=track_visit)
        if track_visit and res is not None:
            self._visit_tracker = jnp.maximum(self._visit_tracker,
                                              res.visited)
            self._visits_valid = True

        if opt.use_splitting and not cam.is_dragging() \
                and self.model is not None and res is not None:
            self._expand_voxels(res)

        # Capacity-pressure prune (cuda_renderer.cpp:149-154).  The
        # reference checks this unconditionally but over-allocates to 20M
        # chunks by default so it only ever fires in refinement sessions;
        # we gate on a refinable session (model present) so statically
        # viewed trees whose arrays are sized to fit are never pruned.
        # _visits_valid gate: the reference marks visits on EVERY traced
        # frame (atomicCAS, rt_core.cuh:133) so its tracker is always
        # populated when prune fires; ours tracks only under capacity
        # pressure, and pruning before any tracked frame has fed the
        # tracker would delete everything but the root chunk (found as
        # exactly that failure: a 41-chunk tree pruned to capacity 1 on
        # the first camera move of a small-max session).
        if (self.model is not None and self._visits_valid
                and self.max_tree_capacity - int(self.tree.capacity)
                < opt.split_batch_size):
            self._prune()
            self._prune_happened = True
        else:
            self._prune_happened = False

        self.fps.tick()
        if self._frame_sorted:
            if fetch:
                # display-consumer remap: the host applies the index
                # map the device skipped (bit-identical pixels)
                return np.asarray(img)[self._inv_host].reshape(
                    cam.height, cam.width, 4)
            # flat [R, 4] rows in perm order; pair with
            # frame_index_map() (prefer render_rgba8() for display)
            return jnp.asarray(img)
        return np.asarray(img) if fetch else jnp.asarray(img)

    def frame_index_map(self):
        """Host inverse ray order (index map) for the last frame when
        it was delivered sorted (``host_unpermute``), else None —
        ``flat_frame[frame_index_map()].reshape(h, w, 4)`` recovers
        pixel order bit-exactly."""
        return self._inv_host if self._frame_sorted else None

    def render_rgba8(self) -> np.ndarray:
        """Render one frame delivered as host rgba8 [H, W, 4] — the
        PNG/web display path.  The frame stays on device through the
        uint8 quantization so only the 4x-smaller rgba8 crosses to the
        host (a fetched-f32 + re-upload round trip tripled transfers
        at 1080p).  Under ``host_unpermute`` quantization runs in
        sorted space (elementwise) and the index map is applied here
        as one u32 numpy gather — the display-consumer contract that
        removes the frame's device-side unpermute."""
        img = self.render(fetch=False)
        rgba = np.asarray(to_rgba8(jnp.asarray(img)))
        if self._frame_sorted:
            cam = self.camera
            flat = np.ascontiguousarray(rgba.reshape(-1, 4))
            rgba = flat.view(np.uint32)[:, 0][self._inv_host] \
                .view(np.uint8).reshape(cam.height, cam.width, 4)
        return rgba

    # ------------------------------------------------------------------
    def _ensure_maps(self, need_votes: bool = False):
        """Ensure a valid leaf map + entry-skip prepass table for the
        current options; returns the skip table (or None).  ONE home
        for the validity envelope, shared by the fast, foveated, and
        guided render paths (hand-copied variants drifted: the guided
        copy skipped the turbo check and marched a stale approximate
        map after the threshold dropped).

        A turbo map is only valid for sigma_thresh >= its build
        threshold (empty-cube safety is monotone upward, not downward)
        and carries no per-leaf identity for votes.  The skip table is
        valid for exactly its build sigma_thresh; not for vote frames
        (the reference's fallback vote inspects empty leaves)."""
        from .ops import accel
        opt = self.options
        turbo_thresh = getattr(self, "_leaf_map_turbo_thresh", None)
        if self._leaf_map is not None and turbo_thresh is not None and (
                opt.sigma_thresh < turbo_thresh or need_votes
                or not self.use_turbo_map):
            self._leaf_map = None
        if self._leaf_map is None:
            with self.timer.time("leaf_map_build"):
                if self.use_turbo_map and not need_votes:
                    self._leaf_map = accel.build_turbo_leaf_map(
                        self.tree, sigma_thresh=opt.sigma_thresh)
                    self._leaf_map_turbo_thresh = opt.sigma_thresh
                else:
                    self._leaf_map = accel.build_leaf_map(self.tree)
                    self._leaf_map_turbo_thresh = None
                self._skip_table = None
        if self.use_prepass and not need_votes:
            thresh = opt.sigma_thresh
            if (getattr(self, "_skip_table", None) is None
                    or getattr(self, "_skip_thresh", None) != thresh):
                from .ops.pallas_march import build_skip_table
                self._skip_table = build_skip_table(self.tree, thresh)
                self._skip_thresh = thresh
            return self._skip_table
        return None

    # ------------------------------------------------------------------
    def _render_fast(self, need_votes: bool = False):
        """Leaf-map accelerated frame; falls back to the exact renderer
        when the dense-sample cap overflows.  Returns (img, res) where
        res carries split/sample votes when requested (else None)."""
        from .ops import accel
        from .ops.render import RenderResult
        # whether THIS frame renders under a camera move (render() set
        # _order_stale on change): the async truncation tolerance only
        # applies to moving frames — a parked frame must be exact
        frame_moved = bool(self._order_stale)
        # retune budgets/hints from the PREVIOUS frame's device-computed
        # overflow flags before reading this frame's order/segments
        if self.overflow_policy in ("async", "device"):
            self._check_pending_overflow()
        skip_table = self._ensure_maps(need_votes)
        # frame-to-frame coherence: rays sorted by (dense records, march
        # steps) from a previous frame; steady-state frames then render
        # in segments whose deferred-shading budget matches each ray
        # class (bit-identical pixels, ~4x fewer coefficient-gather rows
        # on 1080p).  Order rebuilt only when stale — argsort + index
        # upload isn't free.
        order = getattr(self, "_ray_order", None)
        R = self.camera.width * self.camera.height
        if order is not None and order[0].shape[0] != R:
            order = None
        hints = getattr(self, "_hints_packed", None)
        if hints is not None and hints.shape[0] != R:
            hints = self._hints_packed = None
        if (self.use_device_order and self._order_stale
                and order is not None and hints is not None
                and self.motion_mode == "rehint" and not need_votes
                and self.overflow_policy == "async"
                and self.camera.width % 2 == 0
                and self.camera.height % 2 == 0):
            # camera moved, re-hint mode: MEASURE this pose's record
            # needs with a quarter-resolution count pass and render at
            # steady budgets — one fused dispatch (see Viewer.
            # motion_mode and accel._motion_core).  Async-policy only:
            # sub-sample features can truncate within the tolerance
            # band; sync/device policies keep the predictive dilate
            # path whose dilated keys upper-bound true records.
            return self._render_motion_rehint(hints, skip_table)
        if (self.use_device_order and self._order_stale
                and order is not None and hints is not None):
            # camera moved: rebuild the order from the LAST frame's
            # hints entirely on device (no host traffic for the sort).
            # Hints are max-DILATED by the estimated silhouette sweep
            # so band rays class by their neighborhood's worst case,
            # and segment fractions follow the dilated CDF (derived
            # once per motion episode from a [5]-scalar fetch) — the
            # dilated key upper-bounds true records within the window,
            # so the classes provably fit and budgets never walk up
            # under steady motion.
            w = self.camera.width
            h = self.camera.height
            window = self._estimate_dilation()
            if window:
                dh = accel.dilate_packed(hints, width=w, height=h,
                                         window=window)
                order = self._ray_order = \
                    accel.order_from_packed_device(dh)
                # Headroom (one ladder step above the dilated CDF) only
                # protects rays whose true sweep EXCEEDS the estimated
                # window — under the async policy that residual is
                # exactly what the tolerance-gated escalation absorbs
                # as a transient band, and dropping it is a measured
                # 320 -> 290 ms/frame (zero overflows on the orbit
                # sweep; PERFORMANCE.md round-4 fact 6).  sync/device
                # keep it: their overflow cost is a redo / in-frame
                # fallback, not a tolerated band.
                hroom = self.overflow_policy != "async"
                src = ("dil", window, hroom)
                if getattr(self, "_segments_src", None) != src:
                    cdf = accel.hint_class_cdf_packed(dh)
                    self._segments = list(accel.segments_from_hint_cdf(
                        np.asarray(cdf), R, headroom=hroom))
                    self._segments_src = src
            else:
                order = self._ray_order = accel.order_from_packed_device(
                    hints)
            self._order_stale = False
        # "packed" hints: ONE [R] i32 output (and one unpermute gather)
        # per frame instead of three — see accel.pack_hints
        want_hints = "packed" if self.use_device_order else False
        if order is not None:
            segments = getattr(self, "_segments", None) \
                or list(accel.DEFAULT_SEGMENTS)
            # Sorted delivery only on PARKED frames: under motion the
            # device-order rebuild makes a fresh inv every frame, and
            # fetching it host-side would block the frame on an [R] i32
            # readback — exactly the motion-path host traffic the
            # device-order design eliminates (CLAUDE.md invariant).  A
            # parked camera reuses one order, so the map is fetched
            # once per episode and every subsequent steady frame skips
            # the device unpermute for free.
            use_sorted = (self.host_unpermute and not need_votes
                          and not frame_moved)
            if use_sorted and self._inv_src is not order[1]:
                self._inv_host = np.asarray(order[1])
                self._inv_src = order[1]

            def run_segmented(device_fallback):
                # a returned segmented frame is in perm order when
                # sorted delivery is on (fallback paths below reset it)
                self._frame_sorted = use_sorted
                return accel.render_frame_fast_segmented(
                    self.tree, self._leaf_map, self.camera, self.options,
                    order=order, segments=tuple(segments),
                    chunk_size=self.fast_chunk_size,
                    need_votes=need_votes,
                    dynamic_knobs=self.use_dynamic_knobs,
                    skip_table=skip_table,
                    device_fallback=device_fallback,
                    return_hints=want_hints,
                    sorted_output=use_sorted)

            def unpack(out, has_fb):
                # (img, seg_ov, [sv, pv], [fb], [steps, nrec, skips])
                i = 2
                votes = None
                if need_votes:
                    votes = (out[2], out[3])
                    i = 4
                fb = None
                if has_fb:
                    fb = out[i]
                    i += 1
                if want_hints:
                    self._hints_packed = out[i]
                return votes, fb

            if self.overflow_policy == "device":
                # escalation folded into the compiled frame (see
                # _frame_core device_fallback): the frame is correct
                # even under stale budgets; flags are checked one
                # frame later at the top of this method purely to
                # retune budgets/hints
                out = run_segmented(True)
                votes, fb = unpack(out, True)
                self._pending_ov = (list(segments), out[1], fb, R,
                                    frame_moved)
                overflow = False
                img = out[0]
                if need_votes:
                    split_vote, sample_vote = votes
            elif self.overflow_policy == "async":
                # optimistic: return without checking; a staleness
                # event shows one transient truncated frame while the
                # deferred check (top of this method, next frame)
                # escalates budgets and refreshes hints
                out = run_segmented(False)
                votes, _ = unpack(out, False)
                self._pending_ov = (list(segments), out[1],
                                    jnp.asarray(False), R, frame_moved)
                overflow = False
                img = out[0]
                if need_votes:
                    split_vote, sample_vote = votes
            else:
                out = run_segmented(False)
                ov = np.asarray(out[1])
                if ov.any():
                    # segment budgets went stale (camera/tree moved the
                    # record distribution): escalate the overflowed
                    # budgets for future frames and redo THIS frame
                    # unsegmented with fresh ordering hints — a
                    # fast-path frame, never the exact full-frame cliff
                    self._segments = [
                        (f, min(max(1, md * 2), 128)
                         if ov[min(i, len(ov) - 1)] else md)
                        for i, (f, md) in enumerate(segments)]
                    order = None
                else:
                    votes, _ = unpack(out, False)
                    self._segments = segments
                    overflow = False
                    img = out[0]
                    if need_votes:
                        split_vote, sample_vote = votes
        if order is None:
            # no ordering hints yet (first frame at this resolution):
            # single-segment frame that also returns the hints
            self._frame_sorted = False       # pixel-order fallback
            md = self.fast_max_dense
            while True:
                out = accel.render_frame_fast(
                    self.tree, self._leaf_map, self.camera, self.options,
                    max_dense=md,
                    chunk_size=self.fast_chunk_size,
                    need_votes=need_votes,
                    dynamic_knobs=self.use_dynamic_knobs,
                    return_nrec=True, skip_table=skip_table,
                    return_skips=True)
                overflow = bool(out[1])
                if not overflow or md >= 128:
                    break
                md *= 2
                self.fast_max_dense = md
            if need_votes:
                img, _, steps, split_vote, sample_vote, nrec, skips = out
            else:
                img, _, steps, nrec, skips = out
            if self.use_device_order:
                ph = accel.pack_hints(steps, nrec, skips)
                self._ray_order = accel.order_from_packed_device(ph)
                self._hints_packed = ph
                # fresh exact hints: derive CDF-matched budgets for
                # this scene/pose (floor-quantized; exact keys on a
                # parked camera make the classes provably sufficient)
                cdf = accel.hint_class_cdf(jnp.asarray(nrec))
                self._last_cdf = np.asarray(cdf)
                self._segments = list(accel.segments_from_hint_cdf(
                    self._last_cdf, self.camera.width
                    * self.camera.height))
                self._segments_src = ("steady",)
                self._segments_motion = None    # re-derive per episode
                self._order_back = np.asarray(
                    self.camera.transform, np.float32)[:3, :].copy()
            else:
                self._ray_order = accel.order_from_hints(
                    steps, nrec, skips)
            self._order_stale = False
        if overflow:
            self._frame_sorted = False       # exact-path fallback
            img, res = render_frame(
                self.tree, self.camera.width, self.camera.height,
                self.camera.fx, self.camera.fy, self.camera.cx,
                self.camera.cy, jnp.asarray(self.camera.transform),
                self.options)
            return jnp.asarray(img), res
        if need_votes:
            res = RenderResult(
                out=None, split_vote=split_vote, sample_vote=sample_vote,
                visited=None)
            return img, res
        return img, None

    def _render_foveated(self, camera_changed: bool):
        """Foveated APPROXIMATE frame: periphery at 1/``foveation``
        resolution + a full-resolution center window, both through the
        segmented fast path, composed on device.

        No reference counterpart (the CUDA viewer renders every pixel,
        main.cpp:603-616) — this is a TPU-native interactive mode: the
        march is gather-bound per RAY (PERFORMANCE.md), so cutting
        peripheral rays 1/f^2 is the one lever the measured kernel
        floors leave open on one chip.  The center window stays EXACT:
        a pinhole crop only shifts cx/cy, so its rays run the same
        math as the full frame (same 1e-5-class fusion-order drift as
        any batch-shape change, PARITY.md).  Each sub-frame is its own
        Viewer sharing tree/leaf-map/skip-table by reference, so
        orders, hints, budget classes and overflow state settle
        independently at each resolution."""
        from .ops import accel
        cam = self.camera
        opt = self.options
        f = int(self.foveation)
        W, H = cam.width, cam.height
        q = 2 * f
        w1 = max(q, int(W * self.foveation_center) // q * q)
        h1 = max(q, int(H * self.foveation_center) // q * q)
        x0, y0 = (W - w1) // 2, (H - h1) // 2
        key = (W, H, f, w1, h1)
        if self._fov_key != key or self._fov_sub is None:
            subs = []
            for (w, h) in ((W // f, H // f), (w1, h1)):
                subs.append(Viewer(camera=Camera(w, h, 1.0),
                                   options=opt))
            self._fov_sub = tuple(subs)
            self._fov_key = key
        # propagate the parent's tunables EVERY frame (not just at sub
        # creation): a user flipping overflow_policy/use_prepass/... on
        # the parent must govern the sub-frames too
        for v, (w, h) in zip(self._fov_sub,
                             ((W // f, H // f), (w1, h1))):
            v.use_prepass = self.use_prepass
            v.use_dynamic_knobs = self.use_dynamic_knobs
            v.overflow_policy = self.overflow_policy
            v.overflow_check_interval = self.overflow_check_interval
            v.fast_chunk_size = min(self.fast_chunk_size,
                                    max(256, (w * h) // 16))
        self._ensure_maps(False)
        intr = ((cam.fx / f, cam.fy / f, cam.cx / f, cam.cy / f),
                (cam.fx, cam.fy, cam.cx - x0, cam.cy - y0))
        # guided sampling runs per sub-viewer at its own resolution
        # (collect march, MLP query, budget classes, result cache all
        # scale with the sub-frame's ray count); while dragging the
        # reference renders voxels instead (cuda_renderer.cpp:107) and
        # the subs do the same via their fast path
        guided_ok = (opt.use_guided_sampling and self.model is not None
                     and not cam.is_dragging())
        # propagate the parent's cache-invalidation events (camera
        # change, tree refinement via _expand_voxels, resize — whatever
        # cleared _can_reuse_results) to the sub-viewers, which hold
        # their own guided caches; consume the flag so steady foveated
        # frames keep reusing sub caches, and drop the parent's own
        # guided cache so a later non-foveated frame can't serve it
        # _fov_subs_stale: frames rendered through a NON-foveated path
        # (the guided-motion gate) advanced the camera without the subs
        # seeing it — their caches/orders describe the pre-motion pose
        # even though the parent's _can_reuse_results is True again
        subs_stale = self._fov_subs_stale
        if not self._can_reuse_results or subs_stale:
            self._guided_cache = None
            for v in self._fov_sub:
                v._can_reuse_results = False
                v._guided_cache = None
            self._can_reuse_results = True
            self._fov_subs_stale = False
        imgs = []
        for v, (fx, fy, cx, cy) in zip(self._fov_sub, intr):
            v.tree = self.tree
            v._leaf_map = self._leaf_map
            v._leaf_map_turbo_thresh = getattr(
                self, "_leaf_map_turbo_thresh", None)
            v.use_turbo_map = self.use_turbo_map
            v._skip_table = self._skip_table
            v._skip_thresh = getattr(self, "_skip_thresh", None)
            v.options = opt
            v.model = self.model if guided_ok else None
            v.use_pallas_composite = self.use_pallas_composite
            sc = v.camera
            sc.fx, sc.fy, sc.cx, sc.cy = fx, fy, cx, cy
            sc.center = cam.center.copy()
            sc.v_back = cam.v_back.copy()
            sc.v_world_up = cam.v_world_up.copy()
            sc._update()
            if camera_changed or subs_stale:
                v._order_stale = True
                v._can_reuse_results = False
            if guided_ok:
                img, _ = v._render_guided(False)
            else:
                img, _ = v._render_fast(need_votes=False)
            imgs.append(jnp.asarray(img))
        return _fov_compose(imgs[0], imgs[1], f=f, y0=y0, x0=x0,
                            height=H, width=W)

    def _estimate_dilation(self, attr: str = "_order_back"):
        """Quantized PER-AXIS hint-dilation windows (wy, wx) from the
        camera delta since the hints' pose.  Returns 0 (no dilation)
        only when no previous pose is known; tiny moves use the
        cheapest windows.  ``attr`` names the last-pose attribute so
        the fast path and the guided path track their episodes
        independently (their hints refresh at different times).

        Directional: the view-direction sweep is decomposed onto the
        previous pose's right/up axes — a yaw orbit sweeps ~58 px
        horizontally but only ~17 px vertically at 1080p (measured),
        and the POOLED AREA is what fattens budget classes (isotropic
        128 put ~50% of rays in the top record class vs 6% steady,
        ~4.4x the record-gather rows per motion frame), so per-axis
        windows buy the same protection at a fraction of the class
        inflation.  Each axis keeps a 0.3x margin of the other's sweep
        (perspective spreads a pan perpendicular too — 17/63 px on the
        measured yaw orbit).  The ladder compares against the pool's
        TRUE reach (window-1, doubling roll-max), not 0.9*window: the
        58-px orbit pose previously just missed 64*0.9 and over-dilated
        at 128."""
        cam = self.camera
        # transform is ROW-stacked [right, up, back, center]
        # (camera.cpp:54-82): the view direction is row 2.  (The
        # column [:, 2] read here previously mixed z-components — it
        # is INVARIANT under rotation about world-z, the default orbit
        # axis, so the primary interactive motion was never dilated
        # beyond the minimum window.)
        rot = np.asarray(cam.transform, np.float32)[:3, :]
        prev = getattr(self, attr, None)
        setattr(self, attr, rot.copy())
        if prev is None:
            return 0
        prev = np.asarray(prev, np.float32)
        if prev.ndim == 1:                 # legacy back-row anchor
            prev = np.stack([rot[0], rot[1], prev])
        back = rot[2]
        denom = max(abs(float(np.dot(prev[2], back))), 1e-3)
        sx = cam.fx * abs(float(np.dot(prev[0], back))) / denom
        sy = cam.fy * abs(float(np.dot(prev[1], back))) / denom
        # roll (in-plane rotation — induced by yaw on a tilted camera)
        # never moves `back`: its tangential sweep at radius r is
        # r*sin(roll).  Budget for the MEAN pixel (tangential split
        # between axes x mean radius ~ 0.25 of the corner-worst
        # half-diagonal bound): the corner band's residual is exactly
        # what the async policy's overflow tolerance exists to absorb
        # transiently, while a corner-worst bound would double BOTH
        # windows on every orbit pose (the over-classing this function
        # is tuned to avoid).
        roll = abs(float(np.dot(prev[0], rot[1])))
        s_roll = 0.125 * float(np.hypot(cam.width, cam.height)) * roll
        sx, sy = max(sx, 0.3 * sy) + s_roll, max(sy, 0.3 * sx) + s_roll

        def win(shift):
            for wdw in (8, 16, 32, 64, 128):
                if shift <= wdw - 1:
                    return wdw
            return 128
        return (win(sy), win(sx))

    def _render_motion_rehint(self, hints, skip_table):
        """One re-hint motion pose (Viewer.motion_mode == "rehint").

        Drives accel.render_frame_motion (quarter-res measured hint
        pass + fused segmented march) and maintains the episode state:
        ``_qperm`` (quarter hint order, carried pose to pose),
        ``_segments_motion`` (margin-1 steady-budget family derived
        once per episode from the last known CDF), and the async
        overflow protocol (flags checked one frame late; past the
        tolerance the budgets re-derive from the LAST POSE's measured
        CDF — the order is re-measured every pose, so unlike the
        dilate path escalation never drops it)."""
        from .ops import accel
        w, h = self.camera.width, self.camera.height
        R = w * h
        if self._qperm is None or int(self._qperm.shape[0]) * 4 != R:
            # episode start at this resolution: quarter order from the
            # steady frame's pixel-order packed hints (one [R/4] sort;
            # later episodes reuse the carried order — staleness only
            # costs chunk coherence)
            self._qperm = accel.quarter_order_from_packed(hints, width=w)
        segments = getattr(self, "_segments_motion", None)
        if segments is None or \
                getattr(self, "_segments_motion_src", None) != ("rehint", R):
            cdf = self._last_cdf
            if cdf is None:
                cdf = np.asarray(accel.hint_class_cdf_packed(hints))
            segments = list(accel.segments_from_hint_cdf(
                np.asarray(cdf), R, margin=1))
            self._segments_motion = segments
            self._segments_motion_src = ("rehint", R)
        self._frame_sorted = False
        img, seg_ov, order2, cdf_dev, qperm = accel.render_frame_motion(
            self.tree, self._leaf_map, self.camera, self.options,
            self._qperm, segments=tuple(segments),
            chunk_size=self.fast_chunk_size,
            dynamic_knobs=self.use_dynamic_knobs,
            skip_table=skip_table, hint_stride=2)
        self._qperm = qperm
        self._ray_order = order2
        self._motion_cdf_dev = cdf_dev
        self._pending_ov = (list(segments), seg_ov, None, R, True,
                            "rehint")
        self._order_stale = False
        return img, None

    def _check_pending_overflow(self):
        """Asynchronous escalation: inspect the PREVIOUS segmented
        frame's overflow flags (device-computed long ago — this fetch
        does not stall the pipeline) and retune budgets/hints for
        future frames.  The frame they belong to was already corrected
        on device by the fallback branch."""
        pending = self._pending_ov
        if pending is None:
            return
        if self.overflow_policy == "async":
            # amortize the flag fetch: each fetch is a host round trip
            # (~1 ms production, ~27 ms through the dev tunnel).  With
            # interval K the newest frame's flags are inspected every
            # Kth frame — staleness escalation is delayed <= K frames,
            # inside the async policy's transient-truncation contract.
            # Re-hint motion poses use their own (longer) cadence: see
            # Viewer.motion_flag_interval.
            interval = int(self.overflow_check_interval)
            if len(pending) > 5 and pending[5] == "rehint":
                interval = max(interval, int(self.motion_flag_interval))
            self._ov_frame = getattr(self, "_ov_frame", 0) + 1
            if self._ov_frame % max(1, interval):
                return                    # keep the newest pending flags
        self._pending_ov = None
        segments, seg_ov, fb_ov, R, moved = pending[:5]
        kind = pending[5] if len(pending) > 5 else "std"
        counts = np.asarray(seg_ov)
        # In "async" mode a bounded truncation band is the contract
        # UNDER MOTION (silhouette-sweep rays change record class every
        # moved frame; the next frame's fresh order re-classes them),
        # so escalating budgets — 102 -> 264 ms/frame measured once
        # walked up, plus a recompile per new ladder tuple — for a
        # handful of band rays is a net loss.  Escalate only past the
        # tolerance — and only for frames that rendered under a camera
        # move: a PARKED frame's truncation would persist identically
        # every subsequent frame, so it gets tol 0 and escalates
        # immediately (transient by protocol, never steady-state).
        # "device"/"sync" stay strict (exactness is their point).
        tol = 0
        if self.overflow_policy == "async" and moved:
            tol = int(R * self.motion_overflow_tolerance)
        ov = counts > tol
        if kind == "rehint" and ov.any():
            # re-hint motion: the order re-measures every pose, so
            # escalation is purely a BUDGET re-derivation from the
            # last pose's measured CDF (device array computed in-pass;
            # this fetch is [6] scalars off the critical path) — never
            # an order drop or a ladder walk
            from .ops import accel
            if self._motion_cdf_dev is not None:
                cdf = np.asarray(self._motion_cdf_dev)
                self._last_cdf = cdf
                self._segments_motion = list(accel.segments_from_hint_cdf(
                    cdf, R, margin=1))
                self._segments_motion_src = ("rehint", R)
            return
        if kind == "rehint":
            # Clean check mid-episode: SETTLE the budgets from the
            # newest measured CDF at motion_settled_margin (default 0
            # — the episode-start tuple carries margin=1 to bridge the
            # steady->measured CDF gap, but once in-pass CDFs arrive,
            # the only overflow exposure left is per-POSE histogram
            # drift, which this same flag check detects and escalates;
            # measured ~15-20 ms/pose cheaper at 1080p).  Adopted only
            # when CHEAPER than the running tuple so trailing-max
            # jitter (one heavy ray doubling the top class) never
            # compiles a richer variant outside the escalation path.
            if (self._motion_cdf_dev is not None
                    and self._segments_motion is not None):
                from .ops import accel
                cdf = np.asarray(self._motion_cdf_dev)
                self._last_cdf = cdf
                cand = list(accel.segments_from_hint_cdf(
                    cdf, R, margin=int(self.motion_settled_margin)))

                def mass(segs):
                    return sum(f * md for f, md in segs)
                if mass(cand) < mass(self._segments_motion):
                    self._segments_motion = cand
                    self._segments_motion_src = ("rehint", R)
            return
        if not ov.any():
            # After a clean streak on a PARKED camera, re-derive the
            # budgets from the latest exact hints: motion episodes run
            # on dilated (conservative) classes, and escalations can
            # leave budgets above the steady need — both come back
            # down in one derivation instead of oscillating through a
            # halving ladder (which compiled novel tuples and
            # re-overflowed; measured).  Only TRULY clean frames count:
            # a tolerated truncation band caps its rays' nrec hints at
            # the starved class budget, and a derivation from capped
            # hints would freeze heavy rays in too-small classes.
            if counts.sum() == 0:
                self._clean_streak += 1
            else:
                self._clean_streak = 0
            if (self._clean_streak >= 8 and self.use_device_order
                    and not self._order_stale
                    and self._hints_packed is not None
                    and getattr(self, "_segments_src", None)
                    != ("steady",)):
                self._clean_streak = 0
                from .ops import accel
                cdf = accel.hint_class_cdf_packed(self._hints_packed)
                self._last_cdf = np.asarray(cdf)
                self._segments = list(accel.segments_from_hint_cdf(
                    self._last_cdf, R))
                self._segments_src = ("steady",)
                self._segments_motion = None    # re-derive per episode
            return
        self._clean_streak = 0
        self._segments = [
            (f, min(max(1, md * 2), 128) if ov[min(i, len(ov) - 1)]
             else md) for i, (f, md) in enumerate(segments)]
        self._segments_src = ("esc",)
        # drop the order: the overflowed frame's hints are CAPPED at
        # the starved budgets (a heavy ray in the zero class reports
        # nrec 0), so a device rebuild from them would re-class wrongly
        # and converge over multiple frames — the full re-hint frame
        # (md-escalating, uncapped) restores exactness next frame.  If
        # even the 128 cap overflowed (fb_ov), that ladder walks to the
        # exact renderer.
        self._ray_order = None
        self._hints_packed = None

    def _render_with_grid(self, track_visit: bool):
        """Frame with the octree wireframe overlay: the rasterized line
        depth bounds each ray's march (tmax_bg, renderer_kernel.cu:277-280)
        and the line color is composited behind the volume exactly like
        the onscreen path (composite_and_write, renderer_kernel.cu:215-241).
        """
        from .utils.wireframe import grid_overlay
        from .ops.render import render_rays, composite_background
        from .ops.rays import screen2worlddir, rodrigues
        cam = self.camera
        opt = self.options
        if opt.show_grid:
            key = (opt.grid_max_depth, self._tree_gen,
                   cam.transform.tobytes(), cam.fx, cam.fy,
                   cam.cx, cam.cy, cam.width, cam.height)
            cache = getattr(self, "_grid_cache", None)
            if cache is None or cache[0] != key:
                with self.timer.time("gen_wire"):
                    overlay_rgb, overlay_depth = grid_overlay(
                        self.tree, cam, opt.grid_max_depth)
                self._grid_cache = (key, overlay_rgb, overlay_depth)
            _, overlay_rgb, overlay_depth = self._grid_cache
        else:
            overlay_rgb = np.zeros((cam.height, cam.width, 3), np.float32)
            overlay_depth = np.full((cam.height, cam.width), 1e9,
                                    np.float32)
        if self.meshes:
            # mesh layer drawn over/under the grid by depth, exactly like
            # the reference's shared MRT framebuffer (mesh.cpp:135-166)
            overlay_rgb = overlay_rgb.copy()
            overlay_depth = overlay_depth.copy()
            for m in self.meshes:
                m.draw(cam, overlay_rgb, overlay_depth)
        dirs, cen = screen2worlddir(
            cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy,
            jnp.asarray(cam.transform))
        vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
        res = render_rays(self.tree, dirs, vdirs, cen, opt,
                          tmax_bg=jnp.asarray(overlay_depth.reshape(-1)),
                          track_visit=track_visit)
        has_line = overlay_depth.reshape(-1, 1) < 1e9
        bg_rgb = jnp.where(jnp.asarray(has_line),
                           jnp.asarray(overlay_rgb.reshape(-1, 3)),
                           opt.background_brightness)
        img = composite_background(res.out, opt, bg_rgb=bg_rgb)
        return img.reshape(cam.height, cam.width, 4), res

    def _render_guided(self, track_visit: bool):
        """Guided-sampling frame (cuda_renderer.cpp:107-139)."""
        from .ops import guided
        cam = self.camera
        opt = self.options
        needs_votes = opt.use_splitting
        # a cache built by the vote-free fast collector (res=None) cannot
        # serve a splitting frame: rebuild with votes when use_splitting
        # was toggled on between frames (reference reuse frames always
        # have the -1-filled trackers available, cuda_renderer.cpp:96-105)
        if (needs_votes and self._guided_cache is not None
                and self._guided_cache[1] is None):
            self._can_reuse_results = False
        if not self._can_reuse_results or self._guided_cache is None:
            with self.timer.time("guided_sampling"):
                if (self.use_fast_path and self.tree.N == 2
                        and not needs_votes and not track_visit):
                    from .ops import accel
                    skip_table = self._ensure_maps(False)
                    # cost-sort the collect march with the PREVIOUS
                    # invalidation's per-ray sample counts (temporal
                    # coherence across camera moves; outputs identical)
                    g_order = getattr(self, "_guided_order", None)
                    if g_order is not None and g_order[0].shape[0] != \
                            cam.width * cam.height:
                        g_order = None
                    if g_order is None:
                        self._guided_segments = None
                        self._guided_seg_src = None
                    segs = (self._guided_segments
                            if self.use_guided_segments else None)
                    cache = guided.collect_and_query_fast(
                        self.tree, self._leaf_map, self.model, cam, opt,
                        chunk_size=self.fast_chunk_size,
                        skip_table=skip_table, order=g_order,
                        segments=segs,
                        budget_hint=(getattr(self, "_guided_budget_hint",
                                             None)
                                     if segs is not None else None))
                    if "budget_hint_next" in cache:
                        self._guided_budget_hint = \
                            cache["budget_hint_next"]
                    if segs is not None and "segments" in cache:
                        # escalations settle HERE: the next invalidation
                        # starts at the settled ladder instead of
                        # re-walking it (each walk step is a full
                        # re-collect, and novel tuples are remote
                        # recompiles — measured 4 walks + 5-6 s compile
                        # stalls per pose before persistence)
                        self._guided_segments = cache["segments"]
                    from .ops.accel import order_from_ns_steps_device
                    # device-resident order rebuild with the (ns,
                    # steps) key pair: ns alone mixes short surface
                    # hits with long grazing marches in one class —
                    # march chunks then run at the class max (collect
                    # 195 vs 77 ms at 1080p, measured); building on
                    # device skips two [R] hint fetches + host argsort
                    # per invalidation.  Under camera motion these
                    # hints are one pose stale: max-DILATE them by the
                    # estimated silhouette sweep (the fast path's
                    # treatment, accel.dilate_hints) so band rays
                    # class by their neighborhood's worst case and the
                    # budget ladder doesn't re-walk every pose.
                    ns_h = cache["num_samples"]
                    st_h = cache["collect_steps"]
                    window = self._estimate_dilation(
                        attr="_guided_back")
                    if window:
                        st_h, ns_h, _ = accel.dilate_hints(
                            st_h, ns_h, width=cam.width,
                            height=cam.height, window=window)
                    self._guided_order = order_from_ns_steps_device(
                        ns_h, st_h)
                    if self.use_guided_segments:
                        # budget classes from the (dilated) ns CDF — a
                        # [K]-scalar fetch, re-derived once per motion
                        # episode; moving episodes add one ladder step
                        # of headroom for coherent value transitions
                        # (accel.segments_from_hint_cdf)
                        src = ("dil", window) if window else ("steady",)
                        if (self._guided_segments is None
                                or getattr(self, "_guided_seg_src",
                                           None) != src):
                            classes = accel.class_ladder(
                                int(opt.max_guided_samples))
                            cdf = accel.hint_class_cdf(
                                ns_h, classes=classes)
                            self._guided_segments = \
                                accel.segments_from_hint_cdf(
                                    np.asarray(cdf),
                                    cam.width * cam.height,
                                    classes=classes,
                                    headroom=bool(window))
                            self._guided_seg_src = src
                    res = None
                else:
                    cache, res = guided.collect_and_query(
                        self.tree, self.model, cam, opt,
                        track_visit=track_visit)
            self._guided_cache = (cache, res)
            self._guided_gen += 1
            self._can_reuse_results = True
        cache, res = self._guided_cache
        # The composite depends only on (cache, camera, options); on
        # reuse frames (camera static, else the cache was invalidated)
        # it is identical frame to frame, so cache the composited image
        # too.  The reference recomputes it every frame only because its
        # GL loop must redraw (render_nerf_results each frame,
        # cuda_renderer.cpp:138).
        key = (self._guided_gen, cam.transform.tobytes(), cam.fx, cam.fy,
               cam.cx, cam.cy, cam.width, cam.height, opt,
               self.use_pallas_composite)
        img_cache = getattr(self, "_guided_img_cache", None)
        if img_cache is not None and img_cache[0] == key:
            return img_cache[1], res
        with self.timer.time("nerf_composite"):
            img = guided.composite_frame(
                self.tree, cam, opt, cache,
                use_pallas=self.use_pallas_composite)
        self._guided_img_cache = (key, img)
        return img, res

    def _next_key(self):
        import jax
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub

    def _expand_voxels(self, res):
        """Dynamic refinement step (cuda_renderer.cpp:205-341)."""
        from .ops import refine
        new_tree, tracker, added = refine.expand_voxels(
            self.tree, self.model, self.options, res.split_vote,
            self._visit_tracker, key=self._next_key())
        self._visit_tracker = tracker
        # every branch edits the tree -> the leaf map is stale
        self._leaf_map = None
        self._skip_table = None
        if added == 0:
            new_tree = refine.get_more_samples(
                self.tree, self.model, self.options, res.sample_vote,
                key=self._next_key())
        else:
            self._can_reuse_results = False
            self._guided_cache = None
        self.tree = new_tree
        self._tree_gen += 1

    def _prune(self):
        """Capacity-pressure prune (cuda_renderer.cpp:343-381)."""
        from .ops import refine
        self.tree, self._visit_tracker = refine.prune_tree(
            self.tree, self._visit_tracker)
        # the tracker was reset: require a fresh tracked frame before
        # the next prune (the post-prune frame tracks, _prune_happened)
        self._visits_valid = False
        self._leaf_map = None
        self._skip_table = None
        self._tree_gen += 1
        # pruning COMPACTS chunk indices (cumsum shift): any cached
        # guided results/votes carry pre-prune chunk ids — a cache hit
        # would split/visit-mark the wrong chunks next frame
        self._can_reuse_results = False
        self._guided_cache = None

    # ------------------------------------------------------------------
    # Interactive-equivalent input handling (reference main.cpp:268-420)
    # ------------------------------------------------------------------
    def key_event(self, key: str, shift: bool = False) -> None:
        """Headless keymap matching the reference GLFW handler
        (main.cpp:273-383): WASDQE movement, M/R toggles, G/F grid
        depth, -/=/0 focal, 1-6 world up, C prints C2W."""
        cam = self.camera
        key = key.upper() if len(key) == 1 else key
        if key in "WSADEQ":
            speed = 0.002 * (5.0 if shift else 1.0)
            if key in "SAE":
                speed = -speed
            vec = (cam.v_right if key in "AD"
                   else -cam.v_back if key in "WS"
                   else -cam.v_up)
            cam.move(vec * speed)
        elif key == "C":
            print("C2W:\n")
            for i in range(3):
                print(" ".join(f"{cam.transform[j][i]:.10f}"
                               for j in range(4)))
        elif key == "M":
            self.options = self.options.replace(
                use_splitting=not self.options.use_splitting)
        elif key == "R":
            self.options = self.options.replace(
                use_guided_sampling=not self.options.use_guided_sampling)
        elif key == "G":
            self.options = self.options.replace(
                grid_max_depth=self.options.grid_max_depth + 1)
        elif key == "F":
            self.options = self.options.replace(
                grid_max_depth=self.options.grid_max_depth - 1)
        elif key == "-":
            cam.fx *= 0.99
            cam.fy *= 0.99
        elif key == "=":
            cam.fx *= 1.01
            cam.fy *= 1.01
        elif key == "0":
            cam.fx = cam.default_fx
            cam.fy = cam.default_fy
        elif key in "123456":
            ups = {"1": (0, 0, 1), "2": (0, 0, -1), "3": (0, 1, 0),
                   "4": (0, -1, 0), "5": (1, 0, 0), "6": (-1, 0, 0)}
            cam.v_world_up = np.asarray(ups[key], np.float32)

    def mouse_button(self, button: str, pressed: bool, x: float,
                     y: float, shift: bool = False) -> None:
        """left = orbit about camera, right = orbit about origin,
        middle/shift = pan (main.cpp:387-406)."""
        if pressed:
            is_pan = shift or button == "middle"
            about_origin = (button == "right"
                            or (button == "middle" and shift))
            self.camera.begin_drag(x, y, is_pan, about_origin)
        else:
            self.camera.end_drag()

    def cursor(self, x: float, y: float) -> None:
        self.camera.drag_update(x, y)

    def scroll(self, yoffset: float) -> None:
        """Scroll moves along the view axis (main.cpp:412-420)."""
        speed_fact = 1e-1
        self.camera.move(self.camera.v_back
                         * (speed_fact if yoffset < 0 else -speed_fact))

    # ------------------------------------------------------------------
    # Session checkpoint/resume (new capability: the reference keeps all
    # viewer state in-memory only and never persists it — SURVEY §5)
    # ------------------------------------------------------------------
    def save_state(self, path: str, tree_path: Optional[str] = None):
        """Persist camera pose/intrinsics + render options (JSON), and
        optionally the refined tree (svox npz via N3Tree.save_npz)."""
        import json
        import dataclasses
        cam = self.camera
        state = dict(
            camera=dict(
                width=cam.width, height=cam.height, fx=cam.fx,
                fy=cam.fy, cx=cam.cx, cy=cam.cy,
                center=cam.center.tolist(),
                v_back=cam.v_back.tolist(),
                v_world_up=cam.v_world_up.tolist(),
                origin=cam.origin.tolist(),
                movement_speed=cam.movement_speed),
            options=dataclasses.asdict(self.options),
            tree_path=tree_path,
        )
        with open(path, "w") as f:
            json.dump(state, f, indent=2)
        if tree_path and self.tree is not None:
            self.tree.save_npz(tree_path)

    def load_state(self, path: str, load_tree: bool = True):
        """Restore a saved session; reloads the tree if recorded."""
        import json
        with open(path) as f:
            state = json.load(f)
        c = state["camera"]
        cam = Camera(c["width"], c["height"], c["fx"], c["fy"],
                     c["cx"], c["cy"])
        cam.center = np.asarray(c["center"], np.float32)
        cam.v_back = np.asarray(c["v_back"], np.float32)
        cam.v_world_up = np.asarray(c["v_world_up"], np.float32)
        cam.origin = np.asarray(c["origin"], np.float32)
        cam.movement_speed = c["movement_speed"]
        cam._update()
        self.camera = cam
        o = state["options"]
        for k in ("render_bbox", "basis_minmax", "rot_dirs"):
            o[k] = tuple(o[k])
        if load_tree and state.get("tree_path"):
            self.set(N3Tree.open(state["tree_path"]),
                     self.max_tree_capacity)
        # restore options AFTER set(): set() resets basis_minmax to the
        # tree's full band, which would clobber a saved custom range
        self.options = RenderOptions(**o)
        self._can_reuse_results = False
        self._guided_cache = None

    # ------------------------------------------------------------------
    def screenshot(self, path: str) -> bool:
        """Render + save a PNG (reference save-screenshot dialog,
        main.cpp:138-162).  Delivered through :meth:`render_rgba8`:
        device-side uint8 quantization (only the 4x-smaller rgba8
        crosses to the host) and, under ``host_unpermute``, the
        sorted-frame index-map remap."""
        return write_png(path, self.render_rgba8())
