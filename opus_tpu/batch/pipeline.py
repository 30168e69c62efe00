"""Batch-of-streams CELT decode: the serving-scale TPU pipeline.

Architecture (SURVEY.md §7 / BASELINE.json north star):

* Plane A (host, sequential): one bitstream front end per stream
  (opus_tpu.celt.decoder with synthesize_host=False) walks the range-coded
  symbols and emits dense per-frame symbol planes.
* Plane B (device, batched): one jitted synthesis step per (frame size,
  transient) variant processes every stream in the batch at once
  (opus_tpu.dsp.synthesis); decode state lives on device.

Streams whose frames disagree on (lm, transient) in a given step are
grouped and dispatched per variant with gather/scatter on the state.
"""

from __future__ import annotations

import queue
import threading


def get_slot(free: queue.Queue, err: list):
    """free.get() that fails fast if the uploader thread died.

    A dead uploader stops recycling slots; once the pool drains, a plain
    free.get() would block the producer forever instead of surfacing the
    uploader's exception."""
    while True:
        if err:
            raise err[0]
        try:
            return free.get(timeout=0.25)
        except queue.Empty:
            continue

import numpy as np
import jax.numpy as jnp

from ..celt import modes
from ..celt.decoder import CeltDecoder
from ..dsp.synthesis import (
    SynthState,
    init_state,
    make_pipeline_step,
    make_serving_step,
    make_synthesis_step,
    pf_chunk_for,
)


class BatchedCeltDecoder:
    """Decode a fixed batch of CELT streams, one frame per stream per step.

    Plane A runs on the native engine (opus_tpu/native, C++) when built;
    `use_native=False` forces the pure-Python front end (same planes,
    ~200x slower — kept as the executable reference).
    """

    def __init__(self, batch: int, channels: int = 2, downsample: int = 1, use_native: bool | None = None,
                 transfer: str = "f32"):
        #: "f32" = exact float band shapes; "q14" = int16 Q14 shapes (half
        #: the host->device bytes, libopus-fixed precision class); "p12" =
        #: bit-packed 12-bit mantissas with per-band exponents folded into
        #: the energy plane (25% fewer bytes again, serve() path only —
        #: the per-array paths use q14 precision); "plan" = the plan
        #: executor (pulse vectors + band plan, spectra rebuilt on device
        #: — ~1.9x fewer bytes than p10, serve() only).  Quantised modes
        #: are gated by the RFC 8251 conformance metric (tests/test_native.py).
        assert transfer in ("f32", "q14", "p12", "p10", "p8", "plan")
        self.transfer = transfer
        self.batch = batch
        self.channels = channels
        self.downsample = downsample
        if use_native is None:
            try:
                from ..native.frontend import available

                use_native = available()
            except Exception:
                use_native = False
        self.use_native = use_native
        if use_native:
            from ..native.frontend import NativeBatchFrontEnd

            self.native = NativeBatchFrontEnd(batch, channels, downsample)
            self.fronts = None
        else:
            self.native = None
            self.fronts = []
            for _ in range(batch):
                d = CeltDecoder(channels, downsample)
                d.synthesize_host = False
                self.fronts.append(d)
        self.state = init_state(batch, channels)
        self._steps: dict = {}

    def _step_fn(self, lm: int, short_blocks: bool):
        key = (lm, short_blocks)
        if key not in self._steps:
            self._steps[key] = make_synthesis_step(
                lm, short_blocks, self.channels, self.downsample
            )
        return self._steps[key]

    def _pipe_step_fn(self, lm: int, short_blocks: bool):
        key = ("raw", lm, short_blocks, self.transfer)
        if key not in self._steps:
            self._steps[key] = make_pipeline_step(
                lm, short_blocks, self.channels, self.downsample,
                quantized=self.transfer != "f32",
            )
        return self._steps[key]

    def _raw_args(self, frame_size: int, packets: list[bytes], stream_channels=None):
        """Plane A -> raw jit-ready args; all heavy prep happens on device.

        Returns (lm, short_mask, args) with args = (xraw, mono, ble, bound,
        periods, gains, tapsets); only [B]-sized numpy work on the host.
        """
        if self.transfer != "f32":
            x, ble, meta, gains = self.native.decode_batch_q15(
                packets, frame_size, stream_channels
            )
        else:
            x, ble, meta, gains = self.native.decode_batch_f32(
                packets, frame_size, stream_channels
            )
        lm = int(meta[0, 2])
        if not (meta[:, 2] == lm).all():
            raise ValueError("mixed frame sizes in one step not supported")
        n = (1 << lm) * modes.SHORT_MDCT_SIZE
        m = 1 << lm
        bound = m * modes.E_BANDS[meta[:, 5]]
        if self.downsample != 1:
            bound = np.minimum(bound, n // self.downsample)
        bound = np.where(meta[:, 0] != 0, 0, bound).astype(np.int32)
        periods = np.maximum(meta[:, 6:9], 15)  # comb_filter MINPERIOD clamp
        tapsets = np.ascontiguousarray(meta[:, 9:12])
        mono = meta[:, 3] == 1
        short_mask = meta[:, 1] != 0
        args = (x, mono, ble, bound, periods.astype(np.int32), gains, tapsets)
        return lm, short_mask, args

    def _dispatch(self, lm: int, short_mask: np.ndarray, args):
        """Run the right synthesis variant(s); async — no host sync."""
        jargs = [jnp.asarray(a) for a in args]
        if not short_mask.any() or short_mask.all():
            step = self._pipe_step_fn(lm, bool(short_mask[0]))
            self.state, pcm = step(self.state, *jargs)
            return pcm
        state_long, pcm_long = self._pipe_step_fn(lm, False)(self.state, *jargs)
        state_short, pcm_short = self._pipe_step_fn(lm, True)(self.state, *jargs)
        msk = jnp.asarray(short_mask)
        self.state = SynthState(
            jnp.where(msk[:, None, None], state_short.mem, state_long.mem),
            jnp.where(msk[:, None], state_short.preemph, state_long.preemph),
        )
        return jnp.where(msk[:, None, None], pcm_short, pcm_long)

    def run_pipelined(self, batches: list[list[bytes]], frame_size: int):
        """Decode a sequence of per-step packet batches; decode state
        persists across steps and the last step's PCM is returned.

        Each step syncs on the previous step's device result (one step in
        flight): with the device step at ~0.1 ms there is nothing to
        overlap, and letting JAX queue many async steps measurably STALLS
        the next host->device transfer behind the queued RPCs on this
        transport (~+20 ms/step at B=1024).
        """
        pcm = None
        for packets in batches:
            lm, short_mask, args = self._raw_args(frame_size, packets)
            if pcm is not None:
                pcm.block_until_ready()
            pcm = self._dispatch(lm, short_mask, args)
        if pcm is not None:
            pcm.block_until_ready()
        return pcm

    def _serving_step(self, lm: int, pf_chunk: int = 12, pf_active: bool = True):
        mode = self.transfer if self.transfer in ("p12", "p10", "p8") else "q14"
        key = ("serve", lm, pf_chunk, pf_active, mode)
        if key not in self._steps:
            self._steps[key] = make_serving_step(
                lm, self.batch, self.channels, self.downsample,
                pf_chunk=pf_chunk, pf_active=pf_active, transfer=mode,
            )
        return self._steps[key]

    #: Plan-mode arena upload buckets (int32 words per stream): the used
    #: arena prefix rounds up to one of these so a handful of compiled
    #: programs covers every content size.  Finer granularity in the
    #: common 96-256 range — on the byte-bound transport each 32-word
    #: bucket step is 128 B/stream of upload.
    PLAN_BUCKETS = (64, 96, 128, 160, 192, 224, 256, 320, 384, 512)

    #: Executor size classes (p_max, f_max, iyw): every leaf gather,
    #: interval-mask build, and field einsum in the plan executor scales
    #: linearly with these, and worst-case capacity (192/64/192) is ~2x
    #: what typical content needs (96 kbps stereo music measures
    #: pvq<=105, fill<=3, iyw<=114).  The serve loop picks the smallest
    #: class the step's actual maxima fit; anything larger runs the full
    #: capacity class.  iyw must stay a multiple of 16.
    PLAN_CLASSES = ((112, 8, 128), (160, 16, 160), (224, 64, 192))
    #: Compact-PLC capacity: lossy steps whose pitch-regime loss count is
    #: <= this run the conceal on a compacted sub-batch (plc_exec
    #: make_plc_conceal_compact).  At 5% loss and B=1024 the count is
    #: ~51 +- 7, so 128 covers ~11 sigma; overflow falls back to the
    #: full-batch variant.
    PLC_COMPACT_K = 128

    def _plan_size_class(self, slot) -> tuple:
        c = slot["header"][:, 1]
        pvq_mx = int((c & 0x1FF).max(initial=0))
        fill_mx = int(((c >> 9) & 0x1FF).max(initial=0))
        # the fetch window may touch one word past the last started one
        iyw_mx = int(slot["iy_spans"].max(initial=0)) + 1
        for cls in self.PLAN_CLASSES:
            if pvq_mx <= cls[0] and fill_mx <= cls[1] and iyw_mx <= cls[2]:
                return cls
        return self.PLAN_CLASSES[-1]

    def _plan_serving_step(self, lm: int, pf_chunk: int, pf_active: bool,
                           bucket_words: int, with_plc: bool | int = False,
                           size_class: tuple | None = None):
        from ..dsp.synthesis import make_plan_serving_step

        cls = size_class or self.PLAN_CLASSES[-1]
        key = ("plan", lm, pf_chunk, pf_active, bucket_words, with_plc, cls)
        if key not in self._steps:
            self._steps[key] = make_plan_serving_step(
                lm, self.batch, self.channels, self.downsample,
                pf_chunk=pf_chunk, pf_active=pf_active,
                arena_words=bucket_words, with_plc=with_plc,
                size_class=cls,
            )
        return self._steps[key]

    def _serve_plan(self, batches: list[list[bytes]], frame_size: int,
                    n_slots: int = 4, stream_channels=None):
        """Plan-executor serving loop: same single-upload/single-execute
        shape as serve(), but the upload is the plan slot's used prefix
        (bucketed) and the device rebuilds spectra before synthesis."""
        if frame_size * self.downsample < 480:
            # 2.5/5 ms frames have n<=2 bands, which plan mode rejects
            # (every step would overflow-fall-back anyway): serve the
            # packed spectral path directly.
            prev, self.transfer = self.transfer, "p10"
            try:
                return self.serve(batches, frame_size, n_slots, stream_channels)
            finally:
                self.transfer = prev
        if not hasattr(self, "_plan_slots") or len(self._plan_slots) != n_slots:
            self._plan_slots = self.native.alloc_plan_slots(
                n_slots, self.PLAN_BUCKETS[-1]
            )
        if not hasattr(self, "_plan_p10_slots"):
            # Per-step spectral fallback pool: a frame whose plan overflows
            # the arena (pathological content) ships as a packed q14
            # spectrum (the layout _serving_step compiles for non-p-mode
            # transfers) instead of killing the serving session.
            self._plan_p10_slots = self.native.alloc_packed_slots(2, "q14")
        free: queue.Queue = queue.Queue()
        for s in self._plan_slots:
            free.put(s)
        free_p10: queue.Queue = queue.Queue()
        for s in self._plan_p10_slots:
            free_p10.put(s)
        work: queue.Queue = queue.Queue()
        err: list = []
        done: dict = {}
        B = self.batch

        def release(slot):
            (free if slot.get("mode") == "plan" else free_p10).put(slot)

        def uploader():
            try:
                from ..dsp.plc_exec import LPC_ORDER

                state = getattr(self, "_serve_state", None)
                if state is None:
                    state = init_state(self.batch, self.channels)
                plc_lpc = getattr(self, "_serve_plc_lpc", None)
                if plc_lpc is None:
                    plc_lpc = jnp.zeros((B, self.channels, LPC_ORDER), jnp.float32)
                    plc_pitch = jnp.full((B,), 15, jnp.int32)
                else:
                    plc_pitch = self._serve_plc_pitch
                ring = None
                ring_lm = None
                digest = None
                held = None
                while True:
                    item = work.get()
                    if item is None:
                        if held is not None:
                            release(held)
                        break
                    slot, lm, pf_chunk, pf_active, bucket, has_plc, cls = item
                    if bucket < 0:
                        # p10 fallback step (arena overflow on this frame):
                        # SynthState is shared between the two step kinds,
                        # so a spectral step mid-stream keeps continuity.
                        buf = jnp.array(slot["buf"], copy=True)
                    else:
                        buf = jnp.array(slot["buf"][: slot["fixed_words"] + B * bucket], copy=True)
                    if held is not None:
                        release(held)
                    held = slot
                    if ring is None or ring_lm != lm:
                        n = ((1 << lm) * modes.SHORT_MDCT_SIZE) // self.downsample
                        ring = jnp.zeros((self.batch, n, self.channels), jnp.float32)
                        ring_lm = lm
                    if bucket < 0:
                        step = self._serving_step(lm, pf_chunk, pf_active)
                        state, ring, digest = step(state, ring, buf)
                    elif has_plc:
                        step = self._plan_serving_step(lm, pf_chunk, pf_active, bucket,
                                                       with_plc=has_plc,
                                                       size_class=cls)
                        state, ring, digest, plc_lpc, plc_pitch = step(
                            state, ring, buf, plc_lpc, plc_pitch
                        )
                    else:
                        step = self._plan_serving_step(lm, pf_chunk, pf_active, bucket,
                                                       with_plc=False,
                                                       size_class=cls)
                        state, ring, digest = step(state, ring, buf)
                self._serve_state = state
                self._serve_ring = ring
                self._serve_plc_lpc = plc_lpc
                self._serve_plc_pitch = plc_pitch
                done["digest"] = digest
            except Exception as e:  # pragma: no cover - propagated below
                err.append(e)

        th = threading.Thread(target=uploader, daemon=True)
        th.start()
        try:
            for packets in batches:
                slot = get_slot(free, err)
                try:
                    self.native.decode_batch_plan_into(packets, frame_size, slot,
                                                       stream_channels)
                except OverflowError:
                    # Plan capacity exceeded by this step's content: ship a
                    # packed p10 spectrum for just this step (never
                    # uploaded, so the plan slot is safe to reuse now).
                    free.put(slot)
                    slot = get_slot(free_p10, err)
                    self.native.decode_batch_q15_into(packets, frame_size, slot,
                                                      stream_channels)
                    meta = slot["meta"]
                    lm = int(meta[0, 2])
                    if not (meta[:, 2] == lm).all():
                        raise ValueError("mixed frame sizes in one step not supported")
                    pf_chunk, pf_active = pf_chunk_for(meta[:, 6:9], slot["gains"])
                    work.put((slot, lm, pf_chunk, pf_active, -1, False, None))
                    continue
                meta = slot["meta"]
                lm = int(meta[0, 2])
                if not (meta[:, 2] == lm).all():
                    raise ValueError("mixed frame sizes in one step not supported")
                pf_chunk, pf_active = pf_chunk_for(meta[:, 6:9], slot["gains"])
                arena_used = slot["used_words"] - slot["fixed_words"]
                per_stream = -(-arena_used // B)
                bucket = next(
                    (bw for bw in self.PLAN_BUCKETS if bw >= per_stream),
                    self.PLAN_BUCKETS[-1],
                )
                # Steps with pitch-regime losses run a PLC step variant:
                # the COMPACT one (conceal only a fixed-capacity sub-batch
                # of the flagged streams; full-batch conceal measured
                # ~120 ms at B=1024 on TPU vs ~23 ms clean) whenever the
                # loss count fits, the full-batch one otherwise.
                n_lost = int((meta[:, 14] & 1).sum())
                has_plc: bool | int = n_lost > 0
                if 0 < n_lost <= self.PLC_COMPACT_K < self.batch:
                    has_plc = self.PLC_COMPACT_K
                work.put((slot, lm, pf_chunk, pf_active, bucket, has_plc,
                          self._plan_size_class(slot)))
        finally:
            work.put(None)
            th.join()
        if err:
            raise err[0]
        return np.asarray(done["digest"])

    def serve(self, batches: list[list[bytes]], frame_size: int, n_slots: int = 4,
              stream_channels=None):
        """Serving loop tuned for a high-latency host<->device link.

        Per step: ONE host->device upload (a packed plane-A slot the native
        decode wrote into directly) and ONE execute (both transient
        variants inside, state + PCM ring donated).  Plane A for step t+1
        runs on the host (GIL released inside the C call) while the
        uploader thread ships step t, so the two overlap even on one core.

        Returns the final step's digest (np[2]) — fetching it is the true
        completion barrier; `block_until_ready` on this transport returns
        before the device work is actually done.  The last frame's PCM
        stays on device in `self._serve_ring` (fetch with np.asarray).
        """
        assert self.use_native, "serving path requires the native plane A"
        if self.transfer == "plan":
            return self._serve_plan(batches, frame_size, n_slots, stream_channels)
        mode = self.transfer if self.transfer in ("p12", "p10", "p8") else "q14"
        if (not hasattr(self, "_slots") or len(self._slots) != n_slots
                or self._slots[0].get("mode", "q14") != mode):
            self._slots = self.native.alloc_packed_slots(n_slots, mode)
        free: queue.Queue = queue.Queue()
        for s in self._slots:
            free.put(s)
        work: queue.Queue = queue.Queue()
        err: list = []
        done: dict = {}

        def uploader():
            try:
                state = getattr(self, "_serve_state", None)
                if state is None:
                    state = init_state(self.batch, self.channels)
                ring = None
                ring_lm = None
                digest = None
                held = None  # recycle slots one step late: if the transport
                # serializes uploads lazily, the buffer must stay untouched
                # until the NEXT dispatch has queued behind it.
                while True:
                    item = work.get()
                    if item is None:
                        if held is not None:
                            free.put(held)
                        break
                    slot, lm, pf_chunk, pf_active = item
                    buf = jnp.array(slot["buf"], copy=True)
                    if held is not None:
                        free.put(held)
                    held = slot
                    if ring is None or ring_lm != lm:
                        n = ((1 << lm) * modes.SHORT_MDCT_SIZE) // self.downsample
                        ring = jnp.zeros((self.batch, n, self.channels), jnp.float32)
                        ring_lm = lm
                    step = self._serving_step(lm, pf_chunk, pf_active)
                    state, ring, digest = step(state, ring, buf)
                self._serve_state = state
                self._serve_ring = ring
                done["digest"] = digest
            except Exception as e:  # pragma: no cover - propagated below
                err.append(e)

        th = threading.Thread(target=uploader, daemon=True)
        th.start()
        try:
            for packets in batches:
                slot = get_slot(free, err)
                self.native.decode_batch_q15_into(packets, frame_size, slot,
                                                  stream_channels)
                meta = slot["meta"]
                lm = int(meta[0, 2])
                if not (meta[:, 2] == lm).all():
                    raise ValueError("mixed frame sizes in one step not supported")
                # Specialise the postfilter to this step's actual lags:
                # zero-gain streams never constrain the chunk (silent ones
                # do — they carry prior frames' gains, see pf_chunk_for).
                pf_chunk, pf_active = pf_chunk_for(meta[:, 6:9], slot["gains"])
                work.put((slot, lm, pf_chunk, pf_active))
        finally:
            work.put(None)
            th.join()
        if err:
            raise err[0]
        # True sync: fetch the tiny digest (device round-trip).
        return np.asarray(done["digest"])

    def extract(self, packets: list[bytes], frame_size: int) -> list[dict]:
        """Plane A: run the entropy front end for every stream."""
        if self.use_native:
            x, ble, meta, gains = self.native.decode_batch(packets, frame_size)
            planes = []
            for i in range(self.batch):
                m = meta[i]
                lm = int(m[2])
                c_ = int(m[3])
                n = 120 << lm
                planes.append({
                    "x": x[i, : c_ * n],
                    "band_log_e": ble[i, : self.channels],
                    "silence": bool(m[0]),
                    "short_blocks": bool(m[1]),
                    "lm": lm,
                    "stream_channels": c_,
                    "start": int(m[4]),
                    "eff_end": int(m[5]),
                    "pf_period0": int(m[6]),
                    "pf_period1": int(m[7]),
                    "pf_period2": int(m[8]),
                    "pf_tapset0": int(m[9]),
                    "pf_tapset1": int(m[10]),
                    "pf_tapset2": int(m[11]),
                    "pf_gain0": float(gains[i][0]),
                    "pf_gain1": float(gains[i][1]),
                    "pf_gain2": float(gains[i][2]),
                })
            return planes
        planes = []
        for front, data in zip(self.fronts, packets):
            front.decode(data, frame_size)
            planes.append(front.last_planes)
        return planes

    def final_ranges(self) -> list[int]:
        if self.use_native:
            return self.native.final_ranges()
        return [f.rng for f in self.fronts]

    def _stack(self, planes: list[dict], idx: list[int], lm: int):
        n = (1 << lm) * modes.SHORT_MDCT_SIZE
        cc = self.channels
        B = len(idx)
        x = np.zeros((B, cc, n), np.float32)
        loge = np.zeros((B, cc, modes.NB_E_BANDS), np.float32)
        bound = np.zeros(B, np.int32)
        periods = np.zeros((B, 3), np.int32)
        gains = np.zeros((B, 3), np.float32)
        tapsets = np.zeros((B, 3), np.int32)
        m = 1 << lm
        for row, i in enumerate(idx):
            p = planes[i]
            c_ = p["stream_channels"]
            xs = p["x"].reshape(c_, n)
            x[row] = xs if c_ == cc else np.broadcast_to(xs[0], (cc, n))
            le = p["band_log_e"]
            loge[row] = le if le.shape[0] == cc else np.broadcast_to(le[0], (cc, modes.NB_E_BANDS))
            b = m * int(modes.E_BANDS[p["eff_end"]])
            if self.downsample != 1:
                b = min(b, n // self.downsample)
            bound[row] = 0 if p["silence"] else b
            periods[row] = (p["pf_period0"], p["pf_period1"], max(p["pf_period2"], 15))
            gains[row] = (p["pf_gain0"], p["pf_gain1"], p["pf_gain2"])
            tapsets[row] = (p["pf_tapset0"], p["pf_tapset1"], p["pf_tapset2"])
        return x, loge, bound, periods, gains, tapsets

    def synthesize(self, planes: list[dict], frame_size: int) -> np.ndarray:
        """Plane B: batched device synthesis; returns pcm [B, frame, C].

        Shapes stay static for the jit cache: when a batch mixes transient
        and long frames, both kernel variants run over the full batch and a
        per-stream mask selects the results (the short variant costs ~1/8th
        of the long one, so the overhead is small and there are never more
        than two compiled programs per frame size).
        """
        lm = planes[0]["lm"]
        for p in planes:
            assert p["lm"] == lm, "mixed frame sizes in one step not supported"
            assert p["start"] == 0, "hybrid start bands use the scalar path"
        short_mask = np.array([p["short_blocks"] for p in planes], bool)
        arrays = [jnp.asarray(a) for a in self._stack(planes, list(range(self.batch)), lm)]

        if not short_mask.any() or short_mask.all():
            step = self._step_fn(lm, bool(short_mask[0]))
            self.state, pcm = step(self.state, *arrays)
            return np.asarray(pcm)

        state_long, pcm_long = self._step_fn(lm, False)(self.state, *arrays)
        state_short, pcm_short = self._step_fn(lm, True)(self.state, *arrays)
        m = jnp.asarray(short_mask)
        self.state = SynthState(
            jnp.where(m[:, None, None], state_short.mem, state_long.mem),
            jnp.where(m[:, None], state_short.preemph, state_long.preemph),
        )
        return np.asarray(jnp.where(m[:, None, None], pcm_short, pcm_long))

    def extract_stacked(self, packets: list[bytes], frame_size: int):
        """Native plane A straight to stacked arrays (no per-stream dicts).

        Returns (arrays, lm, short_mask) where arrays matches _stack()'s
        output layout.  Vectorised numpy on the batch axis.
        """
        assert self.use_native
        x, ble, meta, gains = self.native.decode_batch_f32(packets, frame_size)
        lm = int(meta[0, 2])
        if not (meta[:, 2] == lm).all():
            raise ValueError("mixed frame sizes in one step not supported")
        n = (1 << lm) * modes.SHORT_MDCT_SIZE
        cc = self.channels
        B = self.batch
        xs = x[:, : 2 * n].reshape(B, 2, n)
        if cc == 2:
            mono = (meta[:, 3] == 1)[:, None, None]
            xq = np.where(mono, np.broadcast_to(xs[:, :1, :], (B, 2, n)), xs)
        else:
            xq = xs[:, :1, :]
        loge = ble[:, :cc, :]
        m = 1 << lm
        bound = m * modes.E_BANDS[meta[:, 5]]
        if self.downsample != 1:
            bound = np.minimum(bound, n // self.downsample)
        bound = np.where(meta[:, 0] != 0, 0, bound).astype(np.int32)
        periods = meta[:, 6:9].copy()
        periods[:, 2] = np.maximum(periods[:, 2], 0)
        tapsets = meta[:, 9:12].astype(np.int32)
        arrays = (
            np.ascontiguousarray(xq),
            np.ascontiguousarray(loge),
            bound,
            periods.astype(np.int32),
            gains,
            tapsets,
        )
        short_mask = meta[:, 1] != 0
        return arrays, lm, short_mask

    def decode_frames(self, packets: list[bytes], frame_size: int,
                      stream_channels=None) -> np.ndarray:
        """Full pipeline step: entropy plane then device synthesis."""
        if self.use_native:
            lm, short_mask, args = self._raw_args(frame_size, packets, stream_channels)
            return np.asarray(self._dispatch(lm, short_mask, args))
        return self.synthesize(self.extract(packets, frame_size), frame_size)
