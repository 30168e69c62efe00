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

import numpy as np
import jax
import jax.numpy as jnp

from ..celt import modes
from ..celt.decoder import CeltDecoder
from ..dsp.synthesis import SynthState, init_state, make_synthesis_step


class BatchedCeltDecoder:
    """Decode a fixed batch of CELT streams, one frame per stream per step."""

    def __init__(self, batch: int, channels: int = 2, downsample: int = 1):
        self.batch = batch
        self.channels = channels
        self.downsample = downsample
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

    def extract(self, packets: list[bytes], frame_size: int) -> list[dict]:
        """Plane A: run the entropy front end for every stream."""
        planes = []
        for front, data in zip(self.fronts, packets):
            front.decode(data, frame_size)
            planes.append(front.last_planes)
        return planes

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
            periods[row] = (p["pf_period0"], p["pf_period1"], max(p["pf_period2"], 0))
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

    def decode_frames(self, packets: list[bytes], frame_size: int) -> np.ndarray:
        """Full pipeline step: entropy plane then device synthesis."""
        return self.synthesize(self.extract(packets, frame_size), frame_size)
