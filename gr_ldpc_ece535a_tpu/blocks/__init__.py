"""Streaming block layer: flowgraph runtime + LDPC blocks + IO blocks."""

from .base import Block, FlowGraph
from .channel import AwgnBlock, ChannelModelBlock
from .graphcfg import BLOCK_REGISTRY, load_flowgraph, run_flowgraph
from .io import (
    DumpSink,
    FileSink,
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
    "BLOCK_REGISTRY",
    "Block",
    "ChannelModelBlock",
    "DumpSink",
    "FileSink",
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
    "load_flowgraph",
    "run_flowgraph",
]
