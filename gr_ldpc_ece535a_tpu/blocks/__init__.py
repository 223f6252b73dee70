"""Streaming block layer: flowgraph runtime + LDPC blocks + IO blocks."""

from .base import Block, FlowGraph
from .channel import AwgnBlock, ChannelModelBlock
from .io import (
    DumpSink,
    FileSource,
    Head,
    ImageSink,
    NullSink,
    RandomSource,
    Throttle,
    VectorSink,
    VectorSource,
)
from .ldpc import LdpcDecoderBlock, LdpcEncoderBlock

__all__ = [
    "AwgnBlock",
    "Block",
    "ChannelModelBlock",
    "DumpSink",
    "FileSource",
    "FlowGraph",
    "Head",
    "ImageSink",
    "LdpcDecoderBlock",
    "LdpcEncoderBlock",
    "NullSink",
    "RandomSource",
    "Throttle",
    "VectorSink",
    "VectorSource",
]
