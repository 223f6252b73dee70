#!/usr/bin/env python3
"""One-time extraction of the LDPC parity-check matrices (and Monte-Carlo data
fixtures) from the reference tree into compact packed hex form.

The H matrices are *data*, not algorithms (they were generated offline by
MATLAB ``makeLdpc(M, N, 1, 1, 3)``; see /root/reference/lib/ldpc_encoder_bc_impl.cc:59
and /root/reference/apps/test_data.h). This script parses the integer literals
out of the reference sources and re-emits them as hex-packed row strings for
gr_ldpc_ece535a_tpu/codes/_h_data.py. Run once; the output file is committed.
"""

import re
from pathlib import Path

REF = Path("/root/reference")
OUT = Path("/root/repo/gr_ldpc_ece535a_tpu/codes/_h_data.py")


def parse_array(text: str, name: str) -> list[int]:
    """Parse `const int <name>[] = { ... };` from C++ source text."""
    m = re.search(rf"const int {name}\[\]\s*=\s*\{{(.*?)\}};", text, re.S)
    if not m:
        raise ValueError(f"array {name} not found")
    return [int(tok) for tok in re.findall(r"[01]", m.group(1))]


def pack_rows(flat: list[int], rows: int, cols: int) -> list[str]:
    """Pack each row of a 0/1 matrix into a hex string, MSB = column 0."""
    assert len(flat) == rows * cols, (len(flat), rows, cols)
    out = []
    width = (cols + 3) // 4
    for r in range(rows):
        bits = flat[r * cols : (r + 1) * cols]
        val = 0
        for b in bits:
            val = (val << 1) | b
        # left-align so MSB-first nibble packing is stable for any col count
        val <<= (width * 4 - cols)
        out.append(f"{val:0{width}x}")
    return out


def main() -> None:
    enc = (REF / "lib/ldpc_encoder_bc_impl.cc").read_text()
    td = (REF / "apps/test_data.h").read_text()

    entries = {}

    # The active 32x64 H used by both encoder and decoder blocks
    # (identical literals in both files; parse from the encoder).
    m = re.search(r"// M = 32\s*// N = 64\s*// makeLdpc.*?const int h_data\[\] = \{(.*?)\};", enc, re.S)
    flat = [int(tok) for tok in re.findall(r"[01]", m.group(1))]
    entries["block_32_64"] = (32, 64, pack_rows(flat, 32, 64), None)

    # test_data.h suite: (M, N, h name, dSource name or None)
    suite = [
        (5, 10, "hData1", None),
        (50, 100, "hData2", "dSourceData2"),
        (8, 16, "hData3", "dSourceData3"),
        (32, 64, "hData4", "dSourceData4"),
        (24, 48, "hData5", "dSourceData5"),
    ]
    for M, N, hname, dname in suite:
        flat = parse_array(td, hname)
        dsrc = None
        if dname is not None:
            draw = parse_array(td, dname)
            # dSource is an (M, frames) matrix stored row-major; frames=30
            frames = len(draw) // M
            dsrc = pack_rows(draw, M, frames)
        entries[f"sim_{M}_{N}"] = (M, N, pack_rows(flat, M, N), dsrc)

    lines = [
        '"""Packed LDPC code data extracted from the reference project.',
        "",
        "Each H matrix row is a hex string, MSB-first over columns (column 0 is",
        "the most-significant bit of the left-aligned value). These matrices were",
        "generated offline by MATLAB makeLdpc(M, N, 1, 1, 3) in the reference",
        "(see /root/reference/lib/ldpc_encoder_bc_impl.cc:57-93 and",
        "/root/reference/apps/test_data.h); they are code *data*, regenerated",
        "here by tools/extract_code_data.py.",
        '"""',
        "",
        "H_DATA = {",
    ]
    for key, (M, N, rows, dsrc) in entries.items():
        lines.append(f"    {key!r}: (")
        lines.append(f"        {M}, {N},")
        lines.append("        [")
        for r in rows:
            lines.append(f"            {r!r},")
        lines.append("        ],")
        lines.append("    ),")
    lines.append("}")
    lines.append("")
    lines.append("# Monte-Carlo data fixtures (dSource matrices, M x frames, packed per row)")
    lines.append("DSOURCE_DATA = {")
    for key, (M, N, rows, dsrc) in entries.items():
        if dsrc is not None:
            frames = None
            lines.append(f"    {key!r}: (")
            lines.append("        [")
            for r in dsrc:
                lines.append(f"            {r!r},")
            lines.append("        ],")
            lines.append("    ),")
    lines.append("}")
    lines.append("")

    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT}")
    # quick sanity: row/col weights of the active code
    import numpy as np
    M, N, rows, _ = entries["block_32_64"]
    Hm = np.zeros((M, N), dtype=int)
    for i, r in enumerate(rows):
        v = int(r, 16) >> (len(r) * 4 - N)
        for j in range(N):
            Hm[i, N - 1 - j] = (v >> j) & 1
    print("row weight min/max:", Hm.sum(1).min(), Hm.sum(1).max())
    print("col weight min/max:", Hm.sum(0).min(), Hm.sum(0).max())
    print("total edges:", Hm.sum())


if __name__ == "__main__":
    main()
