"""Error types for the TPU-native Opus framework.

Mirrors the error surface of the reference implementation
(/root/reference/src/error.rs:5-44) with idiomatic Python exceptions
instead of a result enum.
"""

from __future__ import annotations


class OpusError(Exception):
    """Base class for all Opus codec errors."""


class BadArguments(OpusError):
    """One or more invalid/out of range arguments."""


class InvalidPacket(OpusError):
    """The compressed data passed is corrupted or of an unsupported type."""


class FrameSizeTooSmall(OpusError):
    """The frame size is too small to hold the decoded data."""


class BufferTooSmall(OpusError):
    """The given buffer is too small."""


class InternalError(OpusError):
    """An internal error was detected."""


class UnsupportedMode(OpusError):
    """The packet requires a codec layer not yet built in this framework."""
