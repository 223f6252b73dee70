#!/usr/bin/env python3
"""Image loopback app (example6.grc equivalent).

BMP file -> LDPC encode -> channel -> decode (sync state machine) ->
image_sink reassembling and writing the BMP — the chain that produced the
reference's result_sumproduct*.bmp artifacts
(/root/reference/examples/example6.grc + lib/image_sink_impl.cc).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", required=True, help="input BMP path")
    ap.add_argument("--out", default="result.bmp", help="output BMP path")
    ap.add_argument("--method", type=int, default=1,
                    help="decoder: 0=LogDomain 1=SumProduct 2=BitFlip 3=Hard")
    ap.add_argument("--ebn0-db", type=float, default=6.0,
                    help="AWGN level (use a large value for near-clean)")
    ap.add_argument("--repeats", type=int, default=2,
                    help="times to stream the file (the sink needs the next "
                         "header or stream end to flush, like the reference)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gr_ldpc_ece535a_tpu.blocks import (
        AwgnBlock, FileSource, FlowGraph, ImageSink, LdpcDecoderBlock,
        LdpcEncoderBlock)

    raw = Path(args.image).read_bytes()
    pad = (-len(raw)) % 4  # frame-align the byte stream (4 bytes/frame)
    if pad and not args.quiet:
        print(f"padding stream by {pad} bytes to frame-align")

    class PaddedFileSource(FileSource):
        def __init__(self) -> None:
            super().__init__(args.image, repeats=args.repeats)
            self._data = np.frombuffer(raw + b"\x00" * pad, np.uint8)

    fg = FlowGraph()
    src = PaddedFileSource()
    enc = LdpcEncoderBlock()
    chan = AwgnBlock(args.ebn0_db, seed=args.seed)
    dec = LdpcDecoderBlock(method=args.method, verbose=not args.quiet)
    sink = ImageSink(out_path=args.out, verbose=not args.quiet)
    fg.connect(src, enc, chan, dec, sink)
    fg.run()

    ok = Path(args.out).exists() and Path(args.out).read_bytes() == raw
    print(f"images written: {sink.images_written}; "
          f"exact reconstruction: {ok}")
    if not sink.images_written:
        sys.exit(1)


if __name__ == "__main__":
    main()
