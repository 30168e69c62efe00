"""Batched mixed-mode Opus decode: the full-codec serving pipeline.

BASELINE.json configs[1]/[2]: SILK-only voice and hybrid traffic batched
next to CELT music streams.  One native C call per step runs every
stream's plane A — the SILK fixed-point synthesis (bit-exact, incl. the
normative resampler to the API rate) and the CELT symbol decode behind
the shared range coder for hybrid — and one jitted device step per
(frame size, transient) variant synthesises the CELT plane for the whole
batch and mixes the SILK PCM in (decoder.rs:722-729 semantics).

Fast-path contract (steady-state serving): one Opus frame per packet
(code 0/1 single-frame) and uniform frame duration per step; violations
raise with the stream index so the caller can route that stream to the
scalar opus_tpu.Decoder.  Loss handling is plane-A native: pass None
for a lost packet (PLC: exact silk/PLC.c + CNG.c port for SILK/hybrid,
noise-regime CELT concealment) or ("fec", next_packet) to recover the
lost frame from the next packet's SILK LBRR.  Mode switches and
redundancy frames apply the scalar decoder's EXACT transition PCM:
plane A reports a per-stream transition descriptor, redundant 5 ms CELT
blocks are shadow-decoded on host (_collect_corrections) and the
windowed crossfades land on the device ring (dsp/transitions.py) — the
only remaining approximation is the first <=5 ms of a CELT-entering
switch, whose transition PLC depends on device-resident CELT decode
memory (docs/KNOWN_GAPS.md).
"""

from __future__ import annotations

import ctypes
import queue
import threading

import numpy as np
import jax.numpy as jnp

from .. import packet as pkt_mod
from ..celt import modes
from .pipeline import get_slot
from ..dsp.synthesis import (
    SynthState,
    init_state,
    make_opus_step,
    make_serving_step,
    packed_offsets,
    pf_chunk_for,
)
from ..native.frontend import _load
from ..types import Bandwidth, CodecMode

_MODE_CODE = {CodecMode.SILK_ONLY: 0, CodecMode.HYBRID: 1, CodecMode.CELT_ONLY: 2}

_FALLBACK_REASON = {
    -10: "mode switch mid-stream",
    -11: "hybrid redundancy frame",
    -12: "silk-only trailing redundancy",
}


class BatchedOpusDecoder:
    """Decode a fixed batch of Opus streams (any mode), one frame/step."""

    NB = 21

    def __init__(self, batch: int, channels: int = 2, transfer: str = "p10",
                 silk_transfer: str = "pcm48"):
        lib = _load()
        lib.opus_fe_create.restype = ctypes.c_void_p
        lib.opus_fe_create.argtypes = [ctypes.c_int]
        lib.opus_fe_destroy.argtypes = [ctypes.c_void_p]
        lib.opus_fe_decode_batch.restype = ctypes.c_int
        lib.opus_fe_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.opus_fe_decode_batch_packed.restype = ctypes.c_int
        lib.opus_fe_decode_batch_packed.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_int,  # device_plc: pitch losses -> device conceal
            ctypes.POINTER(ctypes.c_int16),  # trans_out [B, 480*ch]
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.opus_fe_decode_batch_plan.restype = ctypes.c_int
        lib.opus_fe_decode_batch_plan.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),  # header [B,4]
            ctypes.POINTER(ctypes.c_float),  # ble [B,2,21]
            ctypes.POINTER(ctypes.c_int32),  # meta [B,16]
            ctypes.POINTER(ctypes.c_float),  # gains [B,3]
            ctypes.POINTER(ctypes.c_int32),  # bands [B,21,2]
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,  # arena, capacity
            ctypes.POINTER(ctypes.c_int64),  # used_words out
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,  # silk48, stride
            ctypes.POINTER(ctypes.c_int16),  # trans_out [B, 480*ch]
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ]
        self.lib = lib
        self.batch = batch
        self.channels = channels
        #: serving transfer mode for the serve() loop: "plan" (pulse
        #: vectors + band plan, spectra rebuilt on device) with per-step
        #: packed fallback, or a packed spectral mode ("p12"/"p10"/"p8").
        self.transfer = transfer
        #: SILK transfer form for the serve() loop: "internal" ships
        #: internal-rate planar PCM (3-6x fewer bytes) and resamples on
        #: device (dsp/resample.py); "pcm48" ships the normative 48 kHz
        #: resampled PCM.  decode_frames() requires "pcm48" (it returns
        #: the bit-exact host path directly).
        if silk_transfer not in ("pcm48", "internal"):
            raise ValueError(f"unknown silk_transfer {silk_transfer!r}")
        self.silk_internal = silk_transfer == "internal"
        self.handles = (ctypes.c_void_p * batch)(
            *[lib.opus_fe_create(channels) for _ in range(batch)]
        )
        if self.silk_internal:
            lib.opus_fe_set_silk_internal.argtypes = [ctypes.c_void_p, ctypes.c_int]
            for h in self.handles:
                lib.opus_fe_set_silk_internal(h, 1)
        self.state = init_state(batch, channels)
        self._steps: dict = {}
        # Double-buffered output slots (see NativeBatchFrontEnd).
        self._slots = [
            dict(
                x=np.zeros((batch, 2 * 960), np.float32),
                ble=np.zeros((batch, 2, self.NB), np.float32),
                meta=np.zeros((batch, 16), np.int32),
                gains=np.zeros((batch, 3), np.float32),
                silk=np.zeros((batch, 2880 * channels), np.int16),
                ranges=np.zeros(batch, np.uint32),
                rcs=np.zeros(batch, np.int32),
            )
            for _ in range(2)
        ]
        self._slot = 0
        self._ranges = np.zeros(batch, np.uint32)
        # Exact batched transition/redundancy crossfades (decoder.py
        # _smooth_fade semantics): plane A emits a transition descriptor
        # per stream (rcs > 0) + a SILK-PLC row for to-CELT switches;
        # redundant 5 ms CELT blocks are re-decoded by a host SHADOW
        # CeltDecoder per affected stream and the window fades apply to
        # the device ring after the step (dsp/transitions.py).
        self._trans = np.zeros((batch, 480 * channels), np.int16)
        self._shadow: dict = {}
        self._shadow_warm = np.zeros(batch, bool)

    def __del__(self):
        try:
            for h in self.handles:
                self.lib.opus_fe_destroy(h)
        except Exception:
            pass

    def _step_fn(self, lm: int, short_blocks: bool):
        key = (lm, short_blocks)
        if key not in self._steps:
            self._steps[key] = make_opus_step(lm, short_blocks, self.channels, 1)
        return self._steps[key]

    def _silk_samps(self, frame48: int) -> int:
        """int16 samples in one stream's SILK slot region per frame."""
        return ((frame48 // 3) if self.silk_internal else frame48) * self.channels

    def _plane_a(self, packets: list):
        """ToC parse + one native batch call. Returns (frame48, slot)."""
        B = self.batch
        assert len(packets) == B
        if self.silk_internal:
            raise ValueError(
                "decode_frames/run_pipelined need silk_transfer='pcm48' "
                "(internal-rate SILK is a serve()-only transfer)"
            )
        frame48, modes_np, bws, schs, payloads, lens = self._toc_arrays(packets)

        slot = self._slots[self._slot]
        self._slot = 1 - self._slot
        blob = b"".join(payloads)
        i32p = ctypes.POINTER(ctypes.c_int32)
        rc = self.lib.opus_fe_decode_batch(
            self.handles, blob, lens.ctypes.data_as(i32p), B,
            modes_np.ctypes.data_as(i32p), bws.ctypes.data_as(i32p),
            frame48, schs.ctypes.data_as(i32p),
            slot["x"].ctypes.data_as(ctypes.POINTER(ctypes.c_float)), slot["x"].shape[1],
            slot["ble"].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            slot["meta"].ctypes.data_as(i32p),
            slot["gains"].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            slot["silk"].ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), slot["silk"].shape[1],
            slot["ranges"].ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            slot["rcs"].ctypes.data_as(i32p),
        )
        if rc != B:
            i = -rc - 1
            code = int(slot["rcs"][i])
            reason = _FALLBACK_REASON.get(code, f"codec error {code}")
            raise ValueError(f"stream {i}: {reason}")
        self._ranges[:] = slot["ranges"]
        return frame48, slot

    def decode_frames(self, packets: list[bytes]) -> np.ndarray:
        """One step: decode one frame per stream -> pcm [B, frame48, C]."""
        frame48, slot = self._plane_a(packets)
        meta = slot["meta"]
        if frame48 > 960:
            # 40/60 ms packets are SILK-only; no CELT device step needed.
            silk = slot["silk"][:, : frame48 * self.channels]
            return silk.reshape(self.batch, frame48, self.channels).astype(np.float32) / 32768.0
        return np.asarray(self._dispatch(frame48, slot))

    def _dispatch(self, frame48: int, slot: dict):
        meta = slot["meta"]
        lm = int(np.log2(frame48 // 120))
        n = frame48
        m = 1 << lm
        bound = m * modes.E_BANDS[meta[:, 5]]
        bound = np.where(meta[:, 0] != 0, 0, bound).astype(np.int32)
        periods = np.maximum(meta[:, 6:9], 15)  # comb_filter MINPERIOD clamp
        mono = meta[:, 3] == 1
        short_mask = meta[:, 1] != 0
        silk = slot["silk"][:, : n * self.channels]
        args = [
            slot["x"], mono, slot["ble"], bound, periods.astype(np.int32),
            slot["gains"], np.ascontiguousarray(meta[:, 9:12]), silk,
        ]
        jargs = [jnp.asarray(a) for a in args]
        if not short_mask.any() or short_mask.all():
            step = self._step_fn(lm, bool(short_mask[0]))
            self.state, pcm = step(self.state, *jargs)
            return pcm
        state_long, pcm_long = self._step_fn(lm, False)(self.state, *jargs)
        state_short, pcm_short = self._step_fn(lm, True)(self.state, *jargs)
        msk = jnp.asarray(short_mask)
        self.state = SynthState(
            jnp.where(msk[:, None, None], state_short.mem, state_long.mem),
            jnp.where(msk[:, None], state_short.preemph, state_long.preemph),
        )
        return jnp.where(msk[:, None, None], pcm_short, pcm_long)

    # --- packed single-upload serving loop --------------------------------

    def _toc_arrays(self, packets: list):
        """Per-stream ToC arrays for one step.  A packet entry may be
        bytes (normal), None (loss -> PLC), or ("fec", bytes) — recover
        the lost frame from that NEXT packet's SILK LBRR (lens goes
        negative on the wire; opus_frontend.cpp convention)."""
        B = self.batch
        modes_np = np.zeros(B, np.int32)
        bws = np.zeros(B, np.int32)
        schs = np.zeros(B, np.int32)
        lens = np.zeros(B, np.int32)
        payloads = []
        frame48 = None
        for i, pkt in enumerate(packets):
            if pkt is None:  # lost: plane A conceals from the stream's state
                payloads.append(b"")
                continue
            fec = isinstance(pkt, tuple)
            if fec:
                kind, pkt = pkt
                assert kind == "fec", kind
            parsed = pkt_mod.parse_packet(pkt)
            if parsed.frame_count != 1:
                raise ValueError(f"stream {i}: multi-frame packets use the scalar path")
            f48 = pkt_mod.query_packet_samples_per_frame(pkt, 48000)
            if frame48 is None:
                frame48 = f48
            elif frame48 != f48:
                raise ValueError("mixed frame durations in one step not supported")
            modes_np[i] = _MODE_CODE[pkt_mod.query_packet_codec_mode(pkt)]
            bws[i] = int(pkt_mod.query_packet_bandwidth(pkt)) - int(Bandwidth.NARROWBAND)
            schs[i] = 2 if (pkt[0] & 0x4) else 1
            pay = pkt[parsed.payload_offset :]
            payloads.append(pay)
            lens[i] = -len(pay) if fec else len(pay)
        if frame48 is None:  # every stream lost this step
            frame48 = getattr(self, "_last_frame48", None)
            if frame48 is None:
                raise ValueError("a first step with every packet lost has no frame size")
        self._last_frame48 = frame48
        return frame48, modes_np, bws, schs, payloads, lens

    def _alloc_mixed_slots(self, frame48: int, n_slots: int = 4) -> list:
        B = self.batch
        w = int(self._packed_mode()[1:])
        xq_words = 2 * 30 * w  # two channels
        silk_words = (self._silk_samps(frame48) + 1) // 2
        off = packed_offsets(B, self._packed_mode(), silk_words)
        slots = []
        for _ in range(n_slots):
            buf = np.zeros(off["end"], np.int32)
            slots.append(
                dict(
                    buf=buf,
                    frame48=frame48,
                    xq=buf[off["xq"] : off["silk"]].reshape(B, xq_words),
                    silk=buf[off["silk"] : off["ble"]].view(np.int16).reshape(
                        B, 2 * silk_words
                    ),
                    ble=buf[off["ble"] : off["meta"]].view(np.float32).reshape(B, 2, self.NB),
                    meta=buf[off["meta"] : off["gains"]].reshape(B, 16),
                    gains=buf[off["gains"] : off["end"]].view(np.float32).reshape(B, 3),
                )
            )
        return slots

    def _plane_a_packed(self, packets: list[bytes], slot: dict):
        B = self.batch
        frame48, modes_np, bws, schs, payloads, lens = self._toc_arrays(packets)
        if frame48 != slot["frame48"]:
            raise ValueError("frame duration changed mid-serve")
        blob = b"".join(payloads)
        i32p = ctypes.POINTER(ctypes.c_int32)
        rcs = np.zeros(B, np.int32)
        rc = self.lib.opus_fe_decode_batch_packed(
            self.handles, blob, lens.ctypes.data_as(i32p), B,
            modes_np.ctypes.data_as(i32p), bws.ctypes.data_as(i32p),
            frame48, schs.ctypes.data_as(i32p), int(self._packed_mode()[1:]),
            1,  # device_plc: the serving steps carry the conceal variant
            self._trans.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            slot["xq"].ctypes.data_as(i32p), slot["xq"].shape[1],
            slot["silk"].ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            slot["silk"].shape[1],
            slot["ble"].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            slot["meta"].ctypes.data_as(i32p),
            slot["gains"].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rcs.ctypes.data_as(i32p),
        )
        if rc != B:
            i = -rc - 1
            code = int(rcs[i])
            reason = _FALLBACK_REASON.get(code, f"codec error {code}")
            raise ValueError(f"stream {i}: {reason}")
        return self._collect_corrections(packets, rcs, modes_np, bws, schs)

    def _collect_corrections(self, packets, rcs, modes_np, bws, schs):
        '''Turn plane A transition descriptors into crossfade correction
        rows for the device ring (dsp/transitions.py).  Returns
        [(stream, kind, pcm240 f32)] - empty on ordinary steps.
        kind 0 = head replace+fade (to-CELT transition / celt_to_silk
        redundancy); kind 1 = tail fade (silk_to_celt redundancy).'''
        from ..celt.decoder import CeltDecoder

        CELT_END_BAND = [13, 17, 17, 19, 21]
        corrs = []
        for ii in np.flatnonzero(rcs > 0):
            i = int(ii)
            desc = int(rcs[i])
            pkt = packets[i]
            if isinstance(pkt, tuple):
                pkt = pkt[1]
            red_present = desc & 1
            celt_to_silk = (desc >> 1) & 1
            red_bytes = (desc >> 2) & 0x7FF
            red_off = (desc >> 13) & 0x7FF
            if desc & (1 << 24) and not red_present:
                # SILK/hybrid -> CELT transition: plane A 10 ms SILK PLC
                # row, first 5 ms crossfades the frame head
                trans = (self._trans[i, : 240 * self.channels]
                         .reshape(240, self.channels).astype(np.float32)
                         / 32768.0)
                corrs.append((i, 0, trans))
            if red_present:
                sh = self._shadow.get(i)
                if sh is None:
                    sh = self._shadow[i] = CeltDecoder(self.channels, 1)
                pay = pkt[pkt_mod.parse_packet(pkt).payload_offset :]
                red = pay[red_off : red_off + red_bytes]
                if not celt_to_silk:
                    sh.reset()
                # celt_to_silk decodes from the WARM celt state; the
                # shadow only tracks redundant blocks, so a stream whose
                # last celt activity was a real (device-side) frame
                # cannot be corrected exactly - skip, stay approximate.
                do = (not celt_to_silk) or bool(self._shadow_warm[i])
                if do and len(red) == red_bytes and red_bytes > 0:
                    sh.start_band = 0
                    sh.end_band = CELT_END_BAND[int(bws[i])]
                    sh.stream_channels = int(schs[i])
                    try:
                        pcm = np.asarray(sh.decode(red, 240), np.float32)
                        corrs.append((i, 0 if celt_to_silk else 1, pcm))
                        self._shadow_warm[i] = True
                    except Exception:
                        self._shadow_warm[i] = False
                else:
                    self._shadow_warm[i] = False
        # any real CELT/hybrid frame invalidates the shadow state
        if self._shadow:
            for ii in np.flatnonzero(modes_np != 0):
                self._shadow_warm[int(ii)] = False
        return corrs

    def _packed_mode(self) -> str:
        """Spectral transfer mode for the packed path (also the plan
        loop's per-step fallback)."""
        return self.transfer if self.transfer in ("p12", "p10", "p8") else "p10"

    def _mixed_serving_step(self, lm: int, pf_chunk: int, pf_active: bool,
                            with_plc: bool = False):
        key = ("serve", lm, pf_chunk, pf_active, with_plc)
        if key not in self._steps:
            self._steps[key] = make_serving_step(
                lm, self.batch, self.channels, 1,
                pf_chunk=pf_chunk, pf_active=pf_active,
                transfer=self._packed_mode(), silk_mix=True,
                silk_internal=self.silk_internal, with_plc=with_plc,
            )
        return self._steps[key]

    # --- plan-mode serving (transfer="plan") ------------------------------

    #: Plan-mode arena upload buckets, as BatchedCeltDecoder.PLAN_BUCKETS.
    PLAN_BUCKETS = (64, 96, 128, 160, 192, 224, 256, 320, 384, 512)

    def _silk_row_buckets(self):
        #: Compacted-silk row-count buckets (fractions of the batch; 0 =
        #: a pure-CELT step ships no PCM at all).
        B = self.batch
        return (0, B // 8, B // 4, B // 2, (3 * B) // 4, B)

    #: Executor size classes — see BatchedCeltDecoder.PLAN_CLASSES.
    PLAN_CLASSES = ((112, 8, 128), (160, 16, 160), (224, 64, 192))
    #: Compact-PLC capacity — see BatchedCeltDecoder.PLC_COMPACT_K.
    PLC_COMPACT_K = 128

    def _plan_size_class(self, slot) -> tuple:
        c = slot["header"][:, 1]
        pvq_mx = int((c & 0x1FF).max(initial=0))
        fill_mx = int(((c >> 9) & 0x1FF).max(initial=0))
        iyw_mx = int(slot["iy_spans"].max(initial=0)) + 1
        for cls in self.PLAN_CLASSES:
            if pvq_mx <= cls[0] and fill_mx <= cls[1] and iyw_mx <= cls[2]:
                return cls
        return self.PLAN_CLASSES[-1]

    def _mixed_plan_serving_step(self, lm: int, pf_chunk: int, pf_active: bool,
                                 bucket_words: int, silk_rows: int,
                                 with_plc: bool = False,
                                 size_class: tuple | None = None):
        from ..dsp.synthesis import make_plan_serving_step

        cls = size_class or self.PLAN_CLASSES[-1]
        key = ("plan", lm, pf_chunk, pf_active, bucket_words, silk_rows,
               with_plc, cls)
        if key not in self._steps:
            self._steps[key] = make_plan_serving_step(
                lm, self.batch, self.channels, 1,
                pf_chunk=pf_chunk, pf_active=pf_active,
                arena_words=bucket_words, silk_mix=True,
                silk_rows=silk_rows, with_plc=with_plc,
                silk_internal=self.silk_internal,
                size_class=cls,
            )
        return self._steps[key]

    def _plane_a_plan(self, packets: list, slot: dict):
        """Plan-mode mixed decode into a plan slot (opus_fe_decode_batch_plan):
        SILK PCM + the CELT contribution as a plan; raises OverflowError
        when the arena or executor capacities are exceeded (the serve loop
        falls back to the packed path for that step)."""
        B = self.batch
        frame48, modes_np, bws, schs, payloads, lens = self._toc_arrays(packets)
        if frame48 != slot["frame48"]:
            raise ValueError("frame duration changed mid-serve")
        blob = b"".join(payloads)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        rcs = np.zeros(B, np.int32)
        used = ctypes.c_int64(0)
        rc = self.lib.opus_fe_decode_batch_plan(
            self.handles, blob, lens.ctypes.data_as(i32p), B,
            modes_np.ctypes.data_as(i32p), bws.ctypes.data_as(i32p),
            frame48, schs.ctypes.data_as(i32p),
            slot["header"].ctypes.data_as(i32p),
            slot["ble"].ctypes.data_as(f32p),
            slot["meta"].ctypes.data_as(i32p),
            slot["gains"].ctypes.data_as(f32p),
            slot["bands"].ctypes.data_as(i32p),
            slot["arena"].ctypes.data_as(i32p), slot["arena"].shape[0],
            ctypes.byref(used),
            slot["silk"].ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            slot["silk"].shape[1],
            self._trans.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            self._ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rcs.ctypes.data_as(i32p),
        )
        if rc == -(B + 1):
            raise OverflowError("plan arena capacity exceeded")
        if rc != B:
            i = -rc - 1
            code = int(rcs[i])
            if code == -30:
                raise OverflowError(f"stream {i}: plan sink overflow")
            reason = _FALLBACK_REASON.get(code, f"codec error {code}")
            raise ValueError(f"stream {i}: {reason}")
        counts = slot["header"][:, 1]
        if (int((counts & 0x1FF).max(initial=0)) > 224
                or int(((counts >> 9) & 0x1FF).max(initial=0)) > 64
                or int((counts >> 18).max(initial=0)) > 42):
            # celt_fe_plan_headers enforces these transactionally; see
            # frontend.decode_batch_plan_into on why this must be loud.
            raise RuntimeError(
                "native plan guard missed a capacity the executor needs"
            )
        from ..native.frontend import (
            check_plan_iy_span, compact_plan_silk, pack_plan_fixed,
        )

        try:
            # Stashed for the uploader's executor size-class pick.
            slot["iy_spans"] = check_plan_iy_span(slot)
        except OverflowError as e:
            raise RuntimeError(f"native plan guard missed: {e}") from None
        pack_plan_fixed(slot)
        compact_plan_silk(slot, self._silk_samps(frame48))
        slot["used_words"] = slot["fixed_words"] + int(used.value)
        slot["corrs"] = self._collect_corrections(packets, rcs, modes_np, bws, schs)
        return slot

    def serve(self, batches: list[list[bytes]], n_slots: int = 4):
        """Packed single-upload mixed-mode serving loop (CELT+SILK+hybrid
        in one batch): one host->device transfer and one execute per
        step, plane A for step t+1 overlapping the upload of step t.
        Same contract as decode_frames; 20 ms frames or shorter (longer
        SILK-only frames never touch the device — use decode_frames).
        Returns the final step's digest; the last PCM stays on device in
        self._serve_ring."""
        first = next((p for row in batches for p in row if p is not None), None)
        if first is None:
            # an all-lost serve call (per-step serving under a burst):
            # keep concealing at the session's frame duration
            frame48 = getattr(self, "_last_frame48", None)
            if frame48 is None:
                raise ValueError("serve(): every packet in every step is lost")
        else:
            if isinstance(first, tuple):  # ("fec", packet)
                first = first[1]
            frame48 = pkt_mod.query_packet_samples_per_frame(first, 48000)
        if frame48 > 960:
            raise ValueError("serve() handles <=20 ms frames; use decode_frames")
        if self.transfer == "plan":
            return self._serve_plan(batches, frame48, n_slots)
        if (not hasattr(self, "_mixed_slots")
                or self._mixed_slots[0]["frame48"] != frame48
                or len(self._mixed_slots) != n_slots):
            self._mixed_slots = self._alloc_mixed_slots(frame48, n_slots)
        lm = int(np.log2(frame48 // 120))
        free: queue.Queue = queue.Queue()
        for s in self._mixed_slots:
            free.put(s)
        work: queue.Queue = queue.Queue()
        err: list = []
        done: dict = {}

        def uploader():
            try:
                from ..dsp.plc_exec import LPC_ORDER

                state = getattr(self, "_serve_state", None)
                if state is None:
                    state = init_state(self.batch, self.channels,
                                       silk_hist=self.silk_internal)
                plc_lpc = getattr(self, "_serve_plc_lpc", None)
                if plc_lpc is None:
                    plc_lpc = jnp.zeros((self.batch, self.channels, LPC_ORDER),
                                        jnp.float32)
                    plc_pitch = jnp.full((self.batch,), 15, jnp.int32)
                else:
                    plc_pitch = self._serve_plc_pitch
                ring = getattr(self, "_serve_ring", None)
                if ring is None or ring.shape[1] != frame48:
                    ring = jnp.zeros((self.batch, frame48, self.channels), jnp.float32)
                digest = None
                held = None
                while True:
                    item = work.get()
                    if item is None:
                        if held is not None:
                            free.put(held)
                        break
                    slot, pf_chunk, pf_active, has_plc, corrs = item
                    buf = jnp.array(slot["buf"], copy=True)
                    if held is not None:
                        free.put(held)
                    held = slot
                    step = self._mixed_serving_step(lm, pf_chunk, pf_active,
                                                    with_plc=has_plc)
                    if has_plc:
                        state, ring, digest, plc_lpc, plc_pitch = step(
                            state, ring, buf, plc_lpc, plc_pitch
                        )
                    else:
                        state, ring, digest = step(state, ring, buf)
                    if corrs:
                        from ..dsp.transitions import apply_corrections

                        ring = apply_corrections(ring, corrs, frame48,
                                                 self.batch, self.channels)
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
                corrs = self._plane_a_packed(packets, slot)
                meta = slot["meta"]
                pf_chunk, pf_active = pf_chunk_for(meta[:, 6:9], slot["gains"])
                n_lost = int((meta[:, 14] & 1).sum())
                has_plc: bool | int = n_lost > 0
                if 0 < n_lost <= self.PLC_COMPACT_K < self.batch:
                    has_plc = self.PLC_COMPACT_K
                work.put((slot, pf_chunk, pf_active, has_plc, corrs))
        finally:
            work.put(None)
            th.join()
        if err:
            raise err[0]
        return np.asarray(done["digest"])

    def _serve_plan(self, batches: list, frame48: int, n_slots: int = 4):
        """Plan-mode mixed serving loop: same single-upload/single-execute
        shape as serve(), but the upload is the plan slot's used prefix
        (bucketed) + the SILK PCM region, and the device rebuilds the
        CELT spectra with the plan executor.  A step whose plan overflows
        a capacity falls back to the packed spectral path for just that
        step (SynthState is shared between step kinds)."""
        from ..native.frontend import alloc_plan_slots, pack_plan_silk

        B = self.batch
        silk_words = (self._silk_samps(frame48) + 1) // 2
        if (not hasattr(self, "_plan_slots")
                or self._plan_slots[0]["frame48"] != frame48
                or len(self._plan_slots) != n_slots):
            self._plan_slots = alloc_plan_slots(
                B, n_slots, self.PLAN_BUCKETS[-1], silk_words=silk_words
            )
            for s in self._plan_slots:
                s["frame48"] = frame48
        if (not hasattr(self, "_plan_pk_slots")
                or self._plan_pk_slots[0]["frame48"] != frame48):
            self._plan_pk_slots = self._alloc_mixed_slots(frame48, 2)
            for s in self._plan_pk_slots:
                s["mode"] = "packed"
        lm = int(np.log2(frame48 // 120))
        free: queue.Queue = queue.Queue()
        for s in self._plan_slots:
            free.put(s)
        free_pk: queue.Queue = queue.Queue()
        for s in self._plan_pk_slots:
            free_pk.put(s)
        work: queue.Queue = queue.Queue()
        err: list = []
        done: dict = {}

        def release(slot):
            (free if slot.get("mode") == "plan" else free_pk).put(slot)

        def uploader():
            try:
                from ..dsp.plc_exec import LPC_ORDER

                state = getattr(self, "_serve_state", None)
                if state is None:
                    state = init_state(self.batch, self.channels,
                                       silk_hist=self.silk_internal)
                plc_lpc = getattr(self, "_serve_plc_lpc", None)
                if plc_lpc is None:
                    plc_lpc = jnp.zeros((B, self.channels, LPC_ORDER), jnp.float32)
                    plc_pitch = jnp.full((B,), 15, jnp.int32)
                else:
                    plc_pitch = self._serve_plc_pitch
                ring = getattr(self, "_serve_ring", None)
                if ring is None or ring.shape[1] != frame48:
                    ring = jnp.zeros((self.batch, frame48, self.channels), jnp.float32)
                digest = None
                held = None
                while True:
                    item = work.get()
                    if item is None:
                        if held is not None:
                            release(held)
                        break
                    slot, pf_chunk, pf_active, has_plc, corrs = item
                    if slot.get("mode") == "plan":
                        used = slot["used_words"] - slot["fixed_words"]
                        per = -(-used // B) if used > 0 else 1
                        bucket = next(
                            (bw for bw in self.PLAN_BUCKETS if bw >= per),
                            self.PLAN_BUCKETS[-1],
                        )
                        nrows = len(slot["silk_rows"])
                        rbucket = next(
                            rb for rb in self._silk_row_buckets() if rb >= nrows
                        )
                        step = self._mixed_plan_serving_step(
                            lm, pf_chunk, pf_active, bucket, rbucket,
                            with_plc=has_plc,
                            size_class=self._plan_size_class(slot),
                        )
                        prefix = pack_plan_silk(slot, bucket, rbucket)
                        buf = jnp.array(slot["buf"][:prefix], copy=True)
                    else:
                        step = self._mixed_serving_step(lm, pf_chunk, pf_active,
                                                        with_plc=has_plc)
                        buf = jnp.array(slot["buf"], copy=True)
                    if held is not None:
                        release(held)
                    held = slot
                    if has_plc:
                        state, ring, digest, plc_lpc, plc_pitch = step(
                            state, ring, buf, plc_lpc, plc_pitch
                        )
                    else:
                        state, ring, digest = step(state, ring, buf)
                    if corrs:
                        from ..dsp.transitions import apply_corrections

                        ring = apply_corrections(ring, corrs, frame48,
                                                 self.batch, self.channels)
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
                    self._plane_a_plan(packets, slot)
                    corrs = slot.pop("corrs", [])
                except OverflowError:
                    # Pathological content: ship this step as a packed
                    # spectrum instead of killing the serving session.
                    free.put(slot)
                    slot = get_slot(free_pk, err)
                    corrs = self._plane_a_packed(packets, slot)
                meta = slot["meta"]
                pf_chunk, pf_active = pf_chunk_for(meta[:, 6:9], slot["gains"])
                # The host only picks the step VARIANT; the regime per
                # stream rides meta[14] (pitch-LPC = empty plan/spectra +
                # flags; the packed fallback conceals on device too).
                # Compact capacity mirrors BatchedCeltDecoder.PLC_COMPACT_K:
                # conceal a fixed-size sub-batch when the loss count fits.
                n_lost = int((meta[:, 14] & 1).sum())
                has_plc: bool | int = n_lost > 0
                kcap = self.PLC_COMPACT_K
                if 0 < n_lost <= kcap < self.batch:
                    has_plc = kcap
                work.put((slot, pf_chunk, pf_active, has_plc, corrs))
        finally:
            work.put(None)
            th.join()
        if err:
            raise err[0]
        return np.asarray(done["digest"])

    def run_pipelined(self, batches: list[list[bytes]]):
        """Decode a sequence of steps (one device step in flight — see
        BatchedCeltDecoder.run_pipelined on why deeper queues stall)."""
        pcm = None
        for packets in batches:
            frame48, slot = self._plane_a(packets)
            if pcm is not None:
                pcm.block_until_ready()
            if frame48 > 960:
                silk = slot["silk"][:, : frame48 * self.channels]
                pcm = jnp.asarray(silk)
                continue
            pcm = self._dispatch(frame48, slot)
        if pcm is not None:
            pcm.block_until_ready()
        return pcm

    def final_ranges(self) -> list[int]:
        return [int(r) for r in self._ranges]
