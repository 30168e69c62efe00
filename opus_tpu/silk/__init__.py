"""SILK layer (RFC 6716 sec. 4.2): the LPC speech codec.

Fills the reference's stub (/root/reference/src/silk/decoder.rs).  The
SILK decoder is fixed-point by specification — all synthesis arithmetic
here reproduces the normative integer operations exactly; the batched
TPU formulation maps the LPC/LTP recurrences onto scans.
"""
