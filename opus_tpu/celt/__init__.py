"""CELT layer (RFC 6716 sec. 4.3): the MDCT transform codec.

Parity scope: /root/reference/src/celt/ — mode tables, KISS-FFT/MDCT
transforms, PVQ (CWRS) codec, comb filter, and the full band decoder the
reference stubs out (celt/decoder.rs).  Architecture differs by design:
integer/entropy logic stays host-side; all dense synthesis runs as batched
JAX/Pallas kernels in opus_tpu.dsp.
"""
