"""ctypes wrapper over the native CELT plane-A engine (libceltfe.so).

Drop-in replacement for the Python front end's plane extraction: decodes
the symbol stream of one CELT frame and returns the same `planes` dict
that CeltDecoder(synthesize_host=False) produces, at native speed.
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

_HERE = pathlib.Path(__file__).parent
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    import os

    # OMP workers must sleep between batch calls: active spin-waiting
    # starves the JAX dispatch/transfer threads that share host cores
    # with plane A (measured 2x step-time regression on a 1-core host).
    os.environ.setdefault("OMP_WAIT_POLICY", "passive")
    # OPUS_TPU_NATIVE_LIB: absolute path override, used by the CI
    # sanitizer job to load the ASAN/UBSAN-instrumented build
    # (libceltfe_san.so) under LD_PRELOAD=libasan.
    override = os.environ.get("OPUS_TPU_NATIVE_LIB")
    so = pathlib.Path(override) if override else _HERE / "libceltfe.so"
    if not so.exists():
        if override:
            raise FileNotFoundError(f"OPUS_TPU_NATIVE_LIB={override} not found")
        from .build import build

        build(verbose=False)
    lib = ctypes.CDLL(str(so))
    lib.celt_fe_create.restype = ctypes.c_void_p
    lib.celt_fe_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.celt_fe_destroy.argtypes = [ctypes.c_void_p]
    lib.celt_fe_reset.argtypes = [ctypes.c_void_p]
    lib.celt_fe_config.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.celt_fe_rng.restype = ctypes.c_uint32
    lib.celt_fe_rng.argtypes = [ctypes.c_void_p]
    lib.celt_fe_decode.restype = ctypes.c_int
    lib.celt_fe_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeCeltFrontEnd:
    """Native plane-A front end for one CELT stream."""

    NB_E_BANDS = 21

    def __init__(self, channels: int, downsample: int = 1):
        self.lib = _load()
        self.channels = channels
        self.downsample = downsample
        self.h = self.lib.celt_fe_create(channels, downsample)
        self.stream_channels = channels
        self.start_band = 0
        self.end_band = self.NB_E_BANDS
        self._x = np.zeros(2 * 960, dtype=np.float64)
        self._ble = np.zeros(2 * self.NB_E_BANDS, dtype=np.float32)
        self._meta = np.zeros(16, dtype=np.int32)
        self._gains = np.zeros(3, dtype=np.float64)

    def __del__(self):
        try:
            self.lib.celt_fe_destroy(self.h)
        except Exception:
            pass

    def reset(self):
        self.lib.celt_fe_reset(self.h)

    @property
    def final_range(self) -> int:
        return int(self.lib.celt_fe_rng(self.h))

    def decode_planes(self, data: bytes, frame_size: int) -> dict:
        """frame_size in samples at the decoder rate (48000/downsample)."""
        self.lib.celt_fe_config(self.h, self.start_band, self.end_band, -1)
        n48 = frame_size * self.downsample
        rc = self.lib.celt_fe_decode(
            self.h, data, len(data), n48, self.stream_channels,
            self._x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._ble.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._gains.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            raise ValueError(f"native celt frontend failed: {rc}")
        m = self._meta
        c_ = int(m[3])
        n = (120 << int(m[2]))
        return {
            "x": self._x[: c_ * n].copy(),
            "band_log_e": self._ble.reshape(2, self.NB_E_BANDS)[: self.channels].copy(),
            "silence": bool(m[0]),
            "short_blocks": bool(m[1]),
            "lm": int(m[2]),
            "stream_channels": c_,
            "start": int(m[4]),
            "eff_end": int(m[5]),
            "pf_period0": int(m[6]),
            "pf_period1": int(m[7]),
            "pf_period2": int(m[8]),
            "pf_tapset0": int(m[9]),
            "pf_tapset1": int(m[10]),
            "pf_tapset2": int(m[11]),
            "pf_gain0": float(self._gains[0]),
            "pf_gain1": float(self._gains[1]),
            "pf_gain2": float(self._gains[2]),
        }


class NativeBatchFrontEnd:
    """Plane A for a fixed batch of streams, one native handle per stream.

    decode_batch() runs every stream's symbol decode in one C call and
    returns stacked plane arrays ready for the device synthesis step.
    """

    NB = 21

    def __init__(self, batch: int, channels: int, downsample: int = 1):
        self.lib = _load()
        self.lib.celt_fe_decode_batch.restype = ctypes.c_int
        self.lib.celt_fe_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
        ]
        self.lib.celt_fe_decode_batch_f32.restype = ctypes.c_int
        self.lib.celt_fe_decode_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.celt_fe_decode_batch_q15.restype = ctypes.c_int
        self.lib.celt_fe_decode_batch_q15.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.celt_fe_decode_batch_packed.restype = ctypes.c_int
        self.lib.celt_fe_decode_batch_packed.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.celt_fe_decode_batch_plan.restype = ctypes.c_int
        self.lib.celt_fe_decode_batch_plan.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),  # header [B,4]
            ctypes.POINTER(ctypes.c_float),  # ble [B,2,21]
            ctypes.POINTER(ctypes.c_int32),  # meta [B,16]
            ctypes.POINTER(ctypes.c_float),  # gains [B,3]
            ctypes.POINTER(ctypes.c_int32),  # bands [B,21,2]
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,  # arena, capacity
            ctypes.POINTER(ctypes.c_int64),  # used_words out
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,  # xdbg, stride
        ]
        self.batch = batch
        self.channels = channels
        self.downsample = downsample
        self.handles = (ctypes.c_void_p * batch)(
            *[self.lib.celt_fe_create(channels, downsample) for _ in range(batch)]
        )
        # Preallocated, double-buffered output planes: allocating ~8 MB of
        # numpy zeros per step costs more than the symbol decode itself;
        # two slots so an in-flight async device transfer of slot k is
        # never clobbered by the next decode into slot 1-k.
        self._slots = [
            dict(
                x=np.zeros((batch, 2 * 960), np.float32),
                xq=np.zeros((batch, 2 * 960), np.int16),
                ble=np.zeros((batch, 2, self.NB), np.float32),
                meta=np.zeros((batch, 16), np.int32),
                gains=np.zeros((batch, 3), np.float32),
            )
            for _ in range(2)
        ]
        self._slot = 0

    def __del__(self):
        try:
            for h in self.handles:
                self.lib.celt_fe_destroy(h)
        except Exception:
            pass

    def reset(self):
        for h in self.handles:
            self.lib.celt_fe_reset(h)

    def final_ranges(self) -> list:
        return [int(self.lib.celt_fe_rng(h)) for h in self.handles]

    def decode_batch(self, packets: list, frame_size: int):
        """Returns (x[B, 2*960] f64 view sized per lm, ble[B,2,21] f32,
        meta[B,16] i32, gains[B,3] f64)."""
        B = self.batch
        # None entries are lost packets: the native engine conceals them
        # with the noise-regime CELT PLC (see celt_frontend.cpp
        # decode_lost_noise).
        blob = b"".join(p or b"" for p in packets)
        lens = np.array([0 if p is None else len(p) for p in packets], dtype=np.int32)
        sch = np.array([self.channels] * B, dtype=np.int32)
        n48 = frame_size * self.downsample
        x = np.zeros((B, 2 * 960), dtype=np.float64)
        ble = np.zeros((B, 2, self.NB), dtype=np.float32)
        meta = np.zeros((B, 16), dtype=np.int32)
        gains = np.zeros((B, 3), dtype=np.float64)
        rc = self.lib.celt_fe_decode_batch(
            self.handles, blob,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, n48,
            sch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), x.shape[1],
            ble.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            gains.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != B:
            raise ValueError(f"native batch decode failed at stream {-rc - 1}")
        return x, ble, meta, gains

    def decode_batch_f32(self, packets: list, frame_size: int, stream_channels=None):
        """Like decode_batch but the band-shape and gain planes come back
        float32 directly (device-plane feed; half the memory traffic).

        Returns VIEWS of a preallocated double-buffered slot: valid until
        the call after next.  stream_channels: optional [B] int array of
        per-stream coded channel counts (multistream: coupled=2, mono=1).
        """
        B = self.batch
        # None entries are lost packets: the native engine conceals them
        # with the noise-regime CELT PLC (see celt_frontend.cpp
        # decode_lost_noise).
        blob = b"".join(p or b"" for p in packets)
        lens = np.array([0 if p is None else len(p) for p in packets], dtype=np.int32)
        if stream_channels is None:
            sch = np.array([self.channels] * B, dtype=np.int32)
        else:
            sch = np.ascontiguousarray(stream_channels, dtype=np.int32)
        n48 = frame_size * self.downsample
        slot = self._slots[self._slot]
        self._slot = 1 - self._slot
        x, ble, meta, gains = slot["x"], slot["ble"], slot["meta"], slot["gains"]
        rc = self.lib.celt_fe_decode_batch_f32(
            self.handles, blob,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, n48,
            sch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[1],
            ble.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            gains.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != B:
            raise ValueError(f"native batch decode failed at stream {-rc - 1}")
        return x, ble, meta, gains

    def alloc_packed_slots(self, n_slots: int = 4, mode: str = "q14") -> list:
        """Packed serving slots: one contiguous int32 buffer per slot whose
        regions (xq Q14 int16 / ble f32 / meta i32 / gains f32) are numpy
        VIEWS the decode writes into directly — the whole slot is uploaded
        to the device as a single transfer with zero host-side packing.
        Layout must match opus_tpu.dsp.synthesis.packed_offsets."""
        B = self.batch
        slots = []
        xq_words = {"q14": 960, "p12": 720, "p10": 600, "p8": 480}[mode]
        for _ in range(n_slots):
            buf = np.zeros(B * (xq_words + 42 + 16 + 3), np.int32)
            o1 = B * xq_words
            o2 = o1 + B * 42
            o3 = o2 + B * 16
            xq = (
                buf[:o1].view(np.int16).reshape(B, 1920)
                if mode == "q14"
                else buf[:o1].reshape(B, xq_words)
            )
            slots.append(
                dict(
                    buf=buf,
                    mode=mode,
                    xq=xq,
                    ble=buf[o1:o2].view(np.float32).reshape(B, 2, self.NB),
                    meta=buf[o2:o3].reshape(B, 16),
                    gains=buf[o3:].view(np.float32).reshape(B, 3),
                )
            )
        return slots

    #: Plan-v2 uploaded fixed-region words per stream: header 3 (off,
    #: packed counts, iy_rel) + ble 21 (Q9 log-energy pairs) + dmeta 5
    #: (packed flags/periods/gains/plc) + bands 29 (21 w0 words + 8 words
    #: of 21x11-bit eff fields).
    PLAN_FIXED_WORDS = 2 + 21 + 5 + 24  # v4.1 packed fixed regions

    def alloc_plan_slots(self, n_slots: int = 4, arena_words_per_stream: int = 512) -> list:
        return alloc_plan_slots(self.batch, n_slots, arena_words_per_stream)

    def _pack_plan_fixed(self, slot: dict) -> None:
        pack_plan_fixed(slot)

    def decode_batch_plan_into(self, packets: list, frame_size: int, slot: dict,
                               stream_channels=None, want_xdbg: bool = False):
        """Plan-mode decode into a plan slot; None packets are concealed
        (noise-regime PLC emitted as plan noise leaves).  Returns the slot
        with slot["used_words"] = fixed words + used arena prefix; raises
        OverflowError on arena exhaustion (caller falls back to p10)."""
        B = self.batch
        blob = b"".join(p or b"" for p in packets)
        lens = np.array([0 if p is None else len(p) for p in packets], dtype=np.int32)
        if stream_channels is None:
            sch = np.array([self.channels] * B, dtype=np.int32)
        else:
            sch = np.ascontiguousarray(stream_channels, dtype=np.int32)
        n48 = frame_size * self.downsample
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        used = ctypes.c_int64(0)
        xdbg = None
        if want_xdbg:
            xdbg = np.zeros((B, 2 * 960), np.float32)
        rc = self.lib.celt_fe_decode_batch_plan(
            self.handles, blob, lens.ctypes.data_as(i32p), B, n48,
            sch.ctypes.data_as(i32p),
            slot["header"].ctypes.data_as(i32p),
            slot["ble"].ctypes.data_as(f32p),
            slot["meta"].ctypes.data_as(i32p),
            slot["gains"].ctypes.data_as(f32p),
            slot["bands"].ctypes.data_as(i32p),
            slot["arena"].ctypes.data_as(i32p), slot["arena"].shape[0],
            ctypes.byref(used),
            xdbg.ctypes.data_as(f32p) if want_xdbg else None,
            xdbg.shape[1] if want_xdbg else 0,
        )
        if rc == -(B + 1):
            raise OverflowError("plan arena capacity exceeded")
        if rc != B:
            raise ValueError(f"native plan decode failed at stream {-rc - 1}")
        counts = slot["header"][:, 1]
        if (int((counts & 0x1FF).max(initial=0)) > 224
                or int(((counts >> 9) & 0x1FF).max(initial=0)) > 64
                or int((counts >> 18).max(initial=0)) > 42):
            # The native header pass enforces these SAME capacities
            # transactionally (state restored before the OverflowError
            # surfaces).  Reaching here means the two sides disagree —
            # decoder state is already advanced, so a fallback re-decode
            # would corrupt it: fail loudly instead.
            raise RuntimeError(
                "native plan guard missed a capacity the executor needs"
            )
        try:
            # Stash the spans: the serve loop picks the executor size
            # class (batch/pipeline.py PLAN_CLASSES) from their maximum.
            slot["iy_spans"] = check_plan_iy_span(slot)
        except OverflowError as e:
            raise RuntimeError(f"native plan guard missed: {e}") from None
        self._pack_plan_fixed(slot)
        slot["used_words"] = slot["fixed_words"] + int(used.value)
        slot["xdbg"] = xdbg
        return slot

    def decode_batch_q15_into(self, packets: list, frame_size: int, slot: dict,
                              stream_channels=None):
        """Packed-slot decode (alloc_packed_slots); dispatches on the
        slot's transfer mode (q14 int16 / p12 bit-packed)."""
        B = self.batch
        # None entries are lost packets: the native engine conceals them
        # with the noise-regime CELT PLC (see celt_frontend.cpp
        # decode_lost_noise).
        blob = b"".join(p or b"" for p in packets)
        lens = np.array([0 if p is None else len(p) for p in packets], dtype=np.int32)
        if stream_channels is None:
            sch = np.array([self.channels] * B, dtype=np.int32)
        else:
            sch = np.ascontiguousarray(stream_channels, dtype=np.int32)
        n48 = frame_size * self.downsample
        xq, ble, meta, gains = slot["xq"], slot["ble"], slot["meta"], slot["gains"]
        mode = slot.get("mode", "q14")
        if mode in ("p12", "p10", "p8"):
            rc = self.lib.celt_fe_decode_batch_packed(
                self.handles, blob,
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, n48,
                sch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                int(mode[1:]),
                xq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), xq.shape[1],
                ble.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                gains.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        else:
            rc = self.lib.celt_fe_decode_batch_q15(
                self.handles, blob,
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, n48,
                sch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                xq.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), xq.shape[1],
                ble.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                gains.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        if rc != B:
            raise ValueError(f"native batch decode failed at stream {-rc - 1}")
        return slot

    def decode_batch_q15(self, packets: list, frame_size: int, stream_channels=None):
        """Serving-mode plane A: band shapes come back as Q14 int16
        (half the host->device bytes; libopus-fixed precision class,
        RFC 8251-conformant — see celt_fe_decode_batch_q15)."""
        B = self.batch
        # None entries are lost packets: the native engine conceals them
        # with the noise-regime CELT PLC (see celt_frontend.cpp
        # decode_lost_noise).
        blob = b"".join(p or b"" for p in packets)
        lens = np.array([0 if p is None else len(p) for p in packets], dtype=np.int32)
        if stream_channels is None:
            sch = np.array([self.channels] * B, dtype=np.int32)
        else:
            sch = np.ascontiguousarray(stream_channels, dtype=np.int32)
        n48 = frame_size * self.downsample
        slot = self._slots[self._slot]
        self._slot = 1 - self._slot
        xq, ble, meta, gains = slot["xq"], slot["ble"], slot["meta"], slot["gains"]
        rc = self.lib.celt_fe_decode_batch_q15(
            self.handles, blob,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, n48,
            sch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            xq.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), xq.shape[1],
            ble.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            gains.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != B:
            raise ValueError(f"native batch decode failed at stream {-rc - 1}")
        return xq, ble, meta, gains


class NativeCeltEncoder:
    """Native CELT encoder (celt_encoder.inc): one stream, CBR payloads.

    Bitstreams are conformant but not byte-identical to the Python
    CeltEncoder (the analysis floats differ in rounding); libopus decodes
    them with final_range equality against our decoder
    (tests/test_native_encoder.py)."""

    def __init__(self, channels: int):
        self.lib = _load()
        self.lib.celt_enc_create.restype = ctypes.c_void_p
        self.lib.celt_enc_create.argtypes = [ctypes.c_int]
        self.lib.celt_enc_destroy.argtypes = [ctypes.c_void_p]
        self.lib.celt_enc_reset.argtypes = [ctypes.c_void_p]
        self.lib.celt_enc_rng.restype = ctypes.c_uint32
        self.lib.celt_enc_rng.argtypes = [ctypes.c_void_p]
        self.lib.celt_enc_encode.restype = ctypes.c_int
        self.lib.celt_enc_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        self.lib.celt_enc_encode2.restype = ctypes.c_int
        self.lib.celt_enc_encode2.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int,
        ]
        self.channels = channels
        self.end_band = 21
        self.complexity = 10
        self.h = self.lib.celt_enc_create(channels)

    def __del__(self):
        try:
            self.lib.celt_enc_destroy(self.h)
        except Exception:
            pass

    def reset(self):
        self.lib.celt_enc_reset(self.h)

    @property
    def final_range(self) -> int:
        return int(self.lib.celt_enc_rng(self.h))

    def encode(self, pcm: np.ndarray, nb_bytes: int) -> bytes:
        """pcm [N, channels] float32 in ±1 -> nb_bytes of CELT payload."""
        fr = np.ascontiguousarray(pcm, dtype=np.float32)
        out = np.zeros(nb_bytes, np.uint8)
        rc = self.lib.celt_enc_encode2(
            self.h, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            fr.shape[0], nb_bytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.end_band, self.complexity,
        )
        if rc != 0:
            raise ValueError(f"native celt encode failed: {rc}")
        return bytes(out)


class NativeCeltEncoderBatch:
    """Batch of native CELT encoders; one C call encodes every stream
    (OpenMP across streams) — the serving-scale encode plane
    (BASELINE configs[3])."""

    def __init__(self, batch: int, channels: int):
        self.proto = NativeCeltEncoder(channels)  # loads signatures
        self.lib = self.proto.lib
        self.lib.celt_enc_encode_batch.restype = ctypes.c_int
        self.lib.celt_enc_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        self.batch = batch
        self.channels = channels
        self.handles = (ctypes.c_void_p * batch)(
            *[self.lib.celt_enc_create(channels) for _ in range(batch)]
        )

    def __del__(self):
        try:
            for h in self.handles:
                self.lib.celt_enc_destroy(h)
        except Exception:
            pass

    def encode_batch(self, pcm: np.ndarray, nb_bytes: int) -> np.ndarray:
        """pcm [B, N, channels] f32 -> payloads [B, nb_bytes] uint8."""
        B = self.batch
        fr = np.ascontiguousarray(pcm, dtype=np.float32).reshape(B, -1)
        out = np.zeros((B, nb_bytes), np.uint8)
        rc = self.lib.celt_enc_encode_batch(
            self.handles, fr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            fr.shape[1], B, pcm.shape[1], nb_bytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != B:
            raise ValueError(f"native celt batch encode failed at {-rc - 1}")
        return out


class NativeSilkEncoder:
    """Native SILK encoder (silk_encoder.inc): one mono stream at a fixed
    internal rate, CBR payloads (no ToC byte — the Opus layer adds it).
    Streams are conformant: libopus decodes them with final_range
    equality against our decoders (tests/test_native_silk_encoder.py).
    Port of opus_tpu/silk/encoder.py; ref surface encoder.rs:1-10."""

    def __init__(self, fs_khz: int):
        self.lib = _load()
        self.lib.silk_enc_create.restype = ctypes.c_void_p
        self.lib.silk_enc_create.argtypes = [ctypes.c_int]
        self.lib.silk_enc_destroy.argtypes = [ctypes.c_void_p]
        self.lib.silk_enc_reset.argtypes = [ctypes.c_void_p]
        self.lib.silk_enc_rng.restype = ctypes.c_uint32
        self.lib.silk_enc_rng.argtypes = [ctypes.c_void_p]
        self.lib.silk_enc_encode.restype = ctypes.c_int
        self.lib.silk_enc_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        self.fs_khz = fs_khz
        self.h = self.lib.silk_enc_create(fs_khz)
        if not self.h:
            raise ValueError(f"bad internal rate {fs_khz}")
        self._out = np.zeros(1400, np.uint8)

    def __del__(self):
        try:
            self.lib.silk_enc_destroy(self.h)
        except Exception:
            pass

    def reset(self):
        self.lib.silk_enc_reset(self.h)

    @property
    def final_range(self) -> int:
        return int(self.lib.silk_enc_rng(self.h))

    def encode(self, x: np.ndarray, budget_bytes: int) -> bytes:
        """x: int16 at the internal rate (10/20/40/60 ms) -> payload."""
        xi = np.ascontiguousarray(x, dtype=np.int16)
        rc = self.lib.silk_enc_encode(
            self.h, xi.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            xi.shape[0], budget_bytes,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc < 0:
            raise ValueError(f"native silk encode failed: {rc}")
        return bytes(self._out[:rc])


class NativeSilkEncoderBatch:
    """Batch of native SILK encoders; one C call encodes every stream
    (OpenMP across streams) — the voice half of BASELINE configs[3]'s
    serving-scale encode plane."""

    def __init__(self, batch: int, fs_khz: int):
        self.proto = NativeSilkEncoder(fs_khz)  # loads signatures
        self.lib = self.proto.lib
        self.lib.silk_enc_encode_batch.restype = ctypes.c_int
        self.lib.silk_enc_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        self.batch = batch
        self.fs_khz = fs_khz
        self.handles = (ctypes.c_void_p * batch)(
            *[self.lib.silk_enc_create(fs_khz) for _ in range(batch)]
        )

    def __del__(self):
        try:
            for h in self.handles:
                self.lib.silk_enc_destroy(h)
        except Exception:
            pass

    def encode_batch(self, x: np.ndarray, budget_bytes: int):
        """x [B, n] int16 internal-rate -> (payloads [B, 1275] u8, sizes)."""
        B = self.batch
        xi = np.ascontiguousarray(x, dtype=np.int16)
        out = np.zeros((B, 1275), np.uint8)
        sizes = np.zeros(B, np.int32)
        rc = self.lib.silk_enc_encode_batch(
            self.handles, xi.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            xi.shape[1], B, xi.shape[1], budget_bytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.shape[1],
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != B:
            raise ValueError(f"native silk batch encode failed at {-rc - 1}")
        return out, sizes


class NativeVoiceEncoder:
    """Native mono voice (SILK-only) encoder with the input-rate
    conversion inside (silk_encoder.inc VoiceEnc): the public Encoder's
    voice path was bottlenecked on the pure-Python normative resampler,
    not the coding."""

    def __init__(self, fs_khz: int, in_rate_hz: int, fec: bool = False):
        self.lib = _load()
        self.lib.voice_enc_create.restype = ctypes.c_void_p
        self.lib.voice_enc_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        self.lib.voice_enc_destroy.argtypes = [ctypes.c_void_p]
        self.lib.voice_enc_rng.restype = ctypes.c_uint32
        self.lib.voice_enc_rng.argtypes = [ctypes.c_void_p]
        self.lib.voice_enc_encode.restype = ctypes.c_int
        self.lib.voice_enc_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        self.h = self.lib.voice_enc_create(fs_khz, in_rate_hz, int(fec))
        if not self.h:
            raise ValueError(f"bad internal rate {fs_khz}")
        self._out = np.zeros(1400, np.uint8)

    def __del__(self):
        try:
            self.lib.voice_enc_destroy(self.h)
        except Exception:
            pass

    @property
    def final_range(self) -> int:
        return int(self.lib.voice_enc_rng(self.h))

    def encode(self, x: np.ndarray, budget_bytes: int) -> bytes:
        """x: int16 at the INPUT rate (10/20/40/60 ms) -> SILK payload."""
        xi = np.ascontiguousarray(x, dtype=np.int16)
        rc = self.lib.voice_enc_encode(
            self.h, xi.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            xi.shape[0], budget_bytes,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc < 0:
            raise ValueError(f"native voice encode failed: {rc}")
        return bytes(self._out[:rc])


class NativeStereoVoiceEncoder:
    """Native stereo voice (SILK mid/side) encoder with per-channel
    input-rate conversion inside (silk_encoder.inc StereoVoiceEnc).
    Mirrors opus_tpu/silk/stereo_encoder.py's closed-loop design."""

    def __init__(self, fs_khz: int, in_rate_hz: int, fec: bool = False):
        self.lib = _load()
        self.lib.stereo_voice_enc_create.restype = ctypes.c_void_p
        self.lib.stereo_voice_enc_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        self.lib.stereo_voice_enc_destroy.argtypes = [ctypes.c_void_p]
        self.lib.stereo_voice_enc_rng.restype = ctypes.c_uint32
        self.lib.stereo_voice_enc_rng.argtypes = [ctypes.c_void_p]
        self.lib.stereo_voice_enc_encode.restype = ctypes.c_int
        self.lib.stereo_voice_enc_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        self.h = self.lib.stereo_voice_enc_create(fs_khz, in_rate_hz, int(fec))
        if not self.h:
            raise ValueError(f"bad internal rate {fs_khz}")
        self._out = np.zeros(1400, np.uint8)

    def __del__(self):
        try:
            self.lib.stereo_voice_enc_destroy(self.h)
        except Exception:
            pass

    @property
    def final_range(self) -> int:
        return int(self.lib.stereo_voice_enc_rng(self.h))

    def encode(self, left: np.ndarray, right: np.ndarray,
               budget_bytes: int) -> bytes:
        """left/right: int16 at the INPUT rate (10-60 ms) -> SILK payload."""
        li = np.ascontiguousarray(left, dtype=np.int16)
        ri = np.ascontiguousarray(right, dtype=np.int16)
        rc = self.lib.stereo_voice_enc_encode(
            self.h, li.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ri.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            li.shape[0], budget_bytes,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc < 0:
            raise ValueError(f"native stereo voice encode failed: {rc}")
        return bytes(self._out[:rc])


class NativeHybridEncoder:
    """Native hybrid encoder (silk_encoder.inc hybrid driver): SILK WB low
    band + CELT bands 17..19 behind one shared range coder (SWB 20/10 ms
    mono, CBR).  Payloads carry no ToC (the Opus layer adds config 13).
    Port of opus_tpu/encoder.py _encode_hybrid."""

    def __init__(self, channels: int = 1, fec: bool = False):
        self.lib = _load()
        self.lib.hybrid_enc_create.restype = ctypes.c_void_p
        self.lib.hybrid_enc_create.argtypes = [ctypes.c_int, ctypes.c_int]
        self.lib.hybrid_enc_destroy.argtypes = [ctypes.c_void_p]
        self.lib.hybrid_enc_rng.restype = ctypes.c_uint32
        self.lib.hybrid_enc_rng.argtypes = [ctypes.c_void_p]
        self.lib.hybrid_enc_encode.restype = ctypes.c_int
        self.lib.hybrid_enc_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        self.channels = channels
        self.h = self.lib.hybrid_enc_create(channels, int(fec))
        self._out = np.zeros(1400, np.uint8)

    def __del__(self):
        try:
            self.lib.hybrid_enc_destroy(self.h)
        except Exception:
            pass

    @property
    def final_range(self) -> int:
        return int(self.lib.hybrid_enc_rng(self.h))

    def encode(self, pcm: np.ndarray, nb_bytes: int) -> bytes:
        """pcm: [480|960] (mono) or [n, 2]/interleaved (stereo) float32 in
        ±1 at 48 kHz -> CBR payload."""
        x = np.ascontiguousarray(pcm, dtype=np.float32).reshape(-1)
        rc = self.lib.hybrid_enc_encode(
            self.h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[0] // self.channels, nb_bytes,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc < 0:
            raise ValueError(f"native hybrid encode failed: {rc}")
        return bytes(self._out[:rc])


class NativeHybridEncoderBatch:
    """Batch of native hybrid encoders; one C call per step (OpenMP)."""

    def __init__(self, batch: int):
        self.proto = NativeHybridEncoder()  # loads signatures
        self.lib = self.proto.lib
        self.lib.hybrid_enc_encode_batch.restype = ctypes.c_int
        self.lib.hybrid_enc_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        self.batch = batch
        self.handles = (ctypes.c_void_p * batch)(
            *[self.lib.hybrid_enc_create(1, 0) for _ in range(batch)]
        )

    def __del__(self):
        try:
            for h in self.handles:
                self.lib.hybrid_enc_destroy(h)
        except Exception:
            pass

    def encode_batch(self, pcm: np.ndarray, nb_bytes: int):
        """pcm [B, n] f32 mono -> (payloads [B, nb_bytes] u8, sizes)."""
        B = self.batch
        x = np.ascontiguousarray(pcm, dtype=np.float32)
        out = np.zeros((B, max(nb_bytes, 1)), np.uint8)
        sizes = np.zeros(B, np.int32)
        rc = self.lib.hybrid_enc_encode_batch(
            self.handles, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[1], B, x.shape[1], nb_bytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.shape[1],
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != B:
            raise ValueError(f"native hybrid batch encode failed at {-rc - 1}")
        return out, sizes


class NativeSilkFrontEnd:
    """Native SILK plane A: bit-exact frame decode + device-plane params."""

    def __init__(self, fs_khz: int):
        self.lib = _load()
        self.lib.silk_fe_create.restype = ctypes.c_void_p
        self.lib.silk_fe_create.argtypes = [ctypes.c_int]
        self.lib.silk_fe_destroy.argtypes = [ctypes.c_void_p]
        self.lib.silk_fe_decode.restype = ctypes.c_int
        self.lib.silk_fe_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint32),
        ]
        self.lib.silk_fe_decode_batch.restype = ctypes.c_int
        self.lib.silk_fe_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        self.fs_khz = fs_khz
        self.h = self.lib.silk_fe_create(fs_khz)
        L = 20 * fs_khz
        self._xq = np.zeros(L, np.int16)
        self._gexc = np.zeros(L, np.float32)
        self._a1 = np.zeros(16, np.float32)
        self._a2 = np.zeros(16, np.float32)
        self._bt = np.zeros(20, np.float32)
        self._head = np.zeros(18 * fs_khz + 2, np.float32)
        self._meta = np.zeros(8, np.int32)
        self._rng = ctypes.c_uint32()

    def __del__(self):
        try:
            self.lib.silk_fe_destroy(self.h)
        except Exception:
            pass

    def decode(self, payload: bytes, want_planes: bool = False):
        """Decode one 20 ms mono SILK frame -> (xq int16, planes|None)."""
        f32p = ctypes.POINTER(ctypes.c_float)
        args = (
            (self._gexc.ctypes.data_as(f32p), self._a1.ctypes.data_as(f32p),
             self._a2.ctypes.data_as(f32p), self._bt.ctypes.data_as(f32p),
             self._head.ctypes.data_as(f32p),
             self._meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if want_planes else (None, None, None, None, None, None)
        )
        rc = self.lib.silk_fe_decode(
            self.h, payload, len(payload),
            self._xq.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            *args, ctypes.byref(self._rng),
        )
        if rc != 0:
            raise ValueError(f"native silk decode failed: {rc}")
        planes = None
        if want_planes:
            planes = {
                "gexc": self._gexc.copy(), "a1": self._a1.copy(), "a2": self._a2.copy(),
                "b": self._bt.reshape(4, 5).copy(), "head": self._head.copy(),
                "voiced": bool(self._meta[0]), "lags": self._meta[2:6].copy(),
            }
        return self._xq.copy(), planes

    @property
    def final_range(self) -> int:
        return int(self._rng.value)


class NativeSilkBatch:
    """Batch of native SILK decoders; one C call decodes every stream."""

    def __init__(self, batch: int, fs_khz: int):
        self.proto = NativeSilkFrontEnd(fs_khz)  # loads lib + signatures
        self.lib = self.proto.lib
        self.batch = batch
        self.fs_khz = fs_khz
        self.handles = (ctypes.c_void_p * batch)(
            *[self.lib.silk_fe_create(fs_khz) for _ in range(batch)]
        )
        self.L = 20 * fs_khz

    def __del__(self):
        try:
            for h in self.handles:
                self.lib.silk_fe_destroy(h)
        except Exception:
            pass

    def decode_batch(self, payloads: list):
        blob = b"".join(payloads)
        lens = np.array([len(p) for p in payloads], dtype=np.int32)
        xq = np.zeros((self.batch, self.L), np.int16)
        rngs = np.zeros(self.batch, np.uint32)
        rc = self.lib.silk_fe_decode_batch(
            self.handles, blob, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.batch, xq.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), self.L,
            rngs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        if rc != self.batch:
            raise ValueError(f"native silk batch failed at {-rc - 1}")
        return xq, rngs


# ---------------------------------------------------------------------------
# Plan-slot buffers (shared by the CELT-only and mixed-mode pipelines).
# ---------------------------------------------------------------------------

#: Plan-v2 uploaded fixed-region words per stream (see
#: NativeBatchFrontEnd.PLAN_FIXED_WORDS).
PLAN_FIXED_WORDS = 2 + 21 + 5 + 24  # hdr 2w + ble 21 + dmeta 5 + bands 16+8
_NB = 21


def alloc_plan_slots(batch: int, n_slots: int = 4,
                     arena_words_per_stream: int = 512,
                     silk_words: int = 0) -> list:
    """Plan-executor serving slots (opus_tpu/dsp/plan_exec.py contract).

    One contiguous int32 buffer per slot holds the UPLOADED form: packed
    fixed regions (header [B,2] — iy_rel is DERIVED from the counts word
    on device (v4.1) —, ble Q9 [B,21], dmeta [B,5], bands 24-bit-packed
    w0 [B,16] + eff [B,8]), then a shared variable-fill arena so only the used
    prefix ships (`used_words` after each decode).  Full-precision
    staging arrays (header4/ble/meta/gains/bands) stay host-side for
    pf_chunk_for() and the numpy oracle — they are NOT uploaded.

    silk_words > 0 (the mixed pipeline's device-side mix input): the
    fixed regions gain an smap [B] row-map word, slot["silk"] becomes a
    HOST STAGING array the native decode writes into, and the uploader
    compacts only the SILK-bearing rows into the buffer right after the
    step's arena bucket (the trailing capacity doubles as that landing
    zone) — CELT-only streams in a mixed batch then cost zero silk
    bytes on the wire (compact_plan_silk)."""
    B = batch
    fixed = B * (PLAN_FIXED_WORDS + (1 if silk_words else 0))
    aw = B * arena_words_per_stream
    slots = []
    for _ in range(n_slots):
        buf = np.zeros(fixed + aw + B * silk_words, np.int32)
        o = 0
        hdr_p = buf[o : o + B * 2].reshape(B, 2); o += B * 2
        ble_p = buf[o : o + B * 21].reshape(B, _NB); o += B * 21
        dmeta = buf[o : o + B * 5].reshape(B, 5); o += B * 5
        bw0_p = buf[o : o + B * 16].reshape(B, 16); o += B * 16
        beff_p = buf[o : o + B * 8].reshape(B, 8); o += B * 8
        silk = smap = None
        if silk_words:
            smap = buf[o : o + B]; o += B
            silk = np.zeros((B, 2 * silk_words), np.int16)
        slots.append(dict(
            buf=buf, mode="plan", fixed_words=fixed, silk_words=silk_words,
            hdr_p=hdr_p, ble_p=ble_p, dmeta=dmeta, bw0_p=bw0_p,
            beff_p=beff_p, silk=silk, smap=smap, arena=buf[o : o + aw],
            # host staging (not uploaded)
            header=np.zeros((B, 4), np.int32),
            ble=np.zeros((B, 2, _NB), np.float32),
            meta=np.zeros((B, 16), np.int32),
            gains=np.zeros((B, 3), np.float32),
            bands=np.zeros((B, _NB, 2), np.int32),
            used_words=0,
        ))
    return slots


def compact_plan_silk(slot: dict, n_pcm: int) -> int:
    """Build the silk row map after a mixed plan decode: smap[b] = row of
    stream b's PCM in the compacted upload region (an out-of-range
    sentinel selects the zero row on device).  All-zero rows — every
    CELT-only stream, plus genuinely silent SILK frames (for which zero
    expansion is exact) — ship no bytes.  Returns the row count."""
    nz = slot["silk"][:, :n_pcm].any(axis=1)
    rows = np.flatnonzero(nz)
    slot["smap"][:] = 0x7FFFFF
    slot["smap"][rows] = np.arange(len(rows), dtype=np.int32)
    slot["silk_rows"] = rows
    return len(rows)


def pack_plan_silk(slot: dict, arena_bucket_words: int, row_bucket: int) -> int:
    """Copy the compacted silk rows into the upload buffer right after
    this step's arena bucket (the slot tail is sized for the worst
    case); returns the upload prefix length in words."""
    B = slot["hdr_p"].shape[0]
    sw = slot["silk_words"]
    o = slot["fixed_words"] + B * arena_bucket_words
    rows = slot["silk_rows"]
    dst = slot["buf"][o : o + row_bucket * sw].view(np.int16)
    dst = dst.reshape(row_bucket, 2 * sw)
    dst[: len(rows)] = slot["silk"][rows]
    if len(rows) < row_bucket:
        dst[len(rows) :] = 0
    return o + row_bucket * sw


def check_plan_iy_span(slot: dict) -> np.ndarray:
    """Reject plans whose pulse bit-stream spans past the executor's
    PLAN_IYW-word fetch window (it may touch one word beyond the last
    started one); callers fall back to a spectral step for that frame.
    Returns the per-stream iy word spans."""
    from ..dsp.plan_exec import PLAN_IYW

    hdr = slot["header"]
    n_pvq = hdr[:, 1] & 0x1FF
    # v4: one u32 word per pvq record; ln at [0:8], w at [8:12].
    p = np.arange(224, dtype=np.int64)
    ridx = hdr[:, 0:1].astype(np.int64) + p[None, :]
    au32 = slot["arena"].view(np.uint32)  # >> on i32 would sign-extend
    w0 = au32[np.clip(ridx, 0, au32.shape[0] - 1)]
    rln = (w0 & 0xFF).astype(np.int64) + 1
    rwid = ((w0 >> 8) & 0xF).astype(np.int64)
    bits = np.where(p[None, :] < n_pvq[:, None], rln * rwid, 0)
    iy_words = -(-bits.sum(axis=1) // 32)
    if int(iy_words.max(initial=0)) > PLAN_IYW - 1:
        raise OverflowError("plan iy span exceeds executor fetch window")
    return iy_words


def pack_plan_fixed(slot: dict) -> None:
    """Assemble the uploaded fixed regions from the staging arrays
    (vectorised numpy; [B]-sized work only)."""
    hdr4 = slot["header"]
    B = hdr4.shape[0]
    # v4.1: iy_rel (staging hdr4[:, 3]) is NOT uploaded — the device
    # derives it from the counts word (n_pvq + 3 n_fill + 2 n_ac).
    slot["hdr_p"][:, 0] = hdr4[:, 0]
    slot["hdr_p"][:, 1] = hdr4[:, 1]
    # ble: Q9 int16 pairs (step 1/512 in log2 — -63 dB energy class).
    q = np.clip(np.rint(slot["ble"] * 512.0), -32768, 32767).astype(np.int32)
    slot["ble_p"][:] = (q[:, 0] & 0xFFFF) | (q[:, 1] << 16)
    # dmeta (contract mirrored in dsp/synthesis.py plan unpack):
    # d0: sil|short<<1|mono<<2|hybrid<<3|plc<<4|plc1<<5|spread[6:8]
    #     |eff_end[8:13]|ts0[13:15]|ts1[15:17]|ts2[17:19]|period2[19:30]
    # d1: period0[0:11] | period1[11:22]
    # d2: gain0_f16 | gain1_f16<<16;  d3: gain2_f16;  d4: plc params
    meta = slot["meta"]
    g16 = slot["gains"].astype(np.float16).view(np.uint16).astype(np.int64)
    d = slot["dmeta"]
    d[:, 0] = (
        (meta[:, 0] & 1) | ((meta[:, 1] & 1) << 1)
        | ((meta[:, 3] == 1).astype(np.int32) << 2)
        | ((meta[:, 4] == 17).astype(np.int32) << 3)
        | ((meta[:, 14] & 1) << 4) | (((meta[:, 14] >> 1) & 1) << 5)
        | ((meta[:, 13] & 3) << 6) | ((meta[:, 5] & 0x1F) << 8)
        | ((meta[:, 9] & 3) << 13) | ((meta[:, 10] & 3) << 15)
        | ((meta[:, 11] & 3) << 17)
        | (np.clip(meta[:, 8], 0, 0x7FF) << 19)
    )
    d[:, 1] = np.clip(meta[:, 6], 0, 0x7FF) | (np.clip(meta[:, 7], 0, 0x7FF) << 11)
    d[:, 2] = (g16[:, 0] | (g16[:, 1] << 16)).astype(np.int64).astype(np.uint32).view(np.int32)
    # d3 low half: pf gain2 (f16); high byte 16..23: the SILK internal-
    # rate descriptor (meta[12] = khz | rows<<5 | reset<<6; 0 when the
    # pipeline ships 48 kHz PCM or the stream has no SILK).
    d[:, 3] = g16[:, 2].astype(np.int32) | ((meta[:, 12] & 0xFF) << 16)
    d[:, 4] = meta[:, 15]
    # bands: w0 as a 21x24-bit little-endian stream in 16 words (the
    # fields occupy bits [0:24] — v4.1); eff fields as a 21x11-bit
    # stream in 8 words.
    braw = slot["bands"]
    w0u = braw[:, :, 0].astype(np.uint64) & 0xFFFFFF
    outw = np.zeros((B, 16), np.uint64)
    for j in range(_NB):
        bitpos = 24 * j
        w, sft = bitpos >> 5, bitpos & 31
        outw[:, w] |= (w0u[:, j] << sft) & 0xFFFFFFFF
        if sft + 24 > 32:
            outw[:, w + 1] |= w0u[:, j] >> (32 - sft)
    slot["bw0_p"][:] = outw.astype(np.uint32).view(np.int32)
    eff = ((braw[:, :, 1] >> 16) & 0x7FF).astype(np.uint64)
    out = np.zeros((B, 8), np.uint64)
    for j in range(_NB):
        bitpos = 11 * j
        w, s = bitpos >> 5, bitpos & 31
        out[:, w] |= (eff[:, j] << s) & 0xFFFFFFFF
        if s + 11 > 32:
            out[:, w + 1] |= eff[:, j] >> (32 - s)
    slot["beff_p"][:] = out.astype(np.uint32).view(np.int32)
