"""Streaming block layer: flowgraph runtime + LDPC blocks + IO blocks."""

from .base import Block, FlowGraph
from .channel import AwgnBlock, ChannelModelBlock
from .dsp import (AgcBlock2, CostasLoopBlock, FreqRecoveryBlock,
                  PfbClockSyncBlock, PulseShapeBlock, SymbolSyncBlock)
from .graphcfg import BLOCK_REGISTRY, load_flowgraph, run_flowgraph
from .io import (
    DumpSink,
    FileSink,
    FileSource,
    Head,
    ImageSink,
    NullSink,
    RandomSource,
    TcpBroadcastSink,
    TcpSource,
    Throttle,
    VectorSink,
    VectorSource,
)
from .ldpc import LdpcDecoderBlock, LdpcEncoderBlock
from .viz import PlotSink

__all__ = [
    "AgcBlock2",
    "AwgnBlock",
    "BLOCK_REGISTRY",
    "Block",
    "ChannelModelBlock",
    "CostasLoopBlock",
    "FreqRecoveryBlock",
    "PfbClockSyncBlock",
    "PulseShapeBlock",
    "SymbolSyncBlock",
    "DumpSink",
    "FileSink",
    "FileSource",
    "FlowGraph",
    "Head",
    "ImageSink",
    "LdpcDecoderBlock",
    "LdpcEncoderBlock",
    "NullSink",
    "PlotSink",
    "RandomSource",
    "TcpBroadcastSink",
    "TcpSource",
    "Throttle",
    "VectorSink",
    "VectorSource",
    "load_flowgraph",
    "run_flowgraph",
]
