"""Round-5 large-code kernel retune (VERDICT r4 item 7).

Round 4 recorded the generated 128x256 code (E = 768 w-major slots) at
0.95e9 fast / 0.42e9 precise through the split kernels — under the 1e9 bar
every reference-code path clears. E = 768 sits exactly AT the Gram
envelope (MAX_EDGE_SLOTS): the (E, E) Gram fits VMEM at small batch tiles,
so this sweep races the Gram form (one E-contraction matmul/iter) against
the split form (two chained N-contraction matmuls/iter) across tile sizes
for both modes, with the same chained-slope timing as bench.py.

Writes results/large_sweep_r5.json (the full Gram-vs-split sweep); the
headline numbers in results/extra_r5.json were recorded from the best
configurations found here.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from bench import time_decode  # noqa: E402
from gr_ldpc_ece535a_tpu.codes import LdpcCode, make_ldpc  # noqa: E402
from gr_ldpc_ece535a_tpu.ops import awgn, bpsk_map, encode_bits  # noqa: E402
from gr_ldpc_ece535a_tpu.ops.pallas_bp import (  # noqa: E402
    pallas_decode_minsum, pallas_decode_sumproduct)

ITERS = 20
BATCH = 1 << 15


def main() -> None:
    code = LdpcCode.from_h(make_ldpc(128, 256, col_weight=3, seed=1),
                           name="gen_128_256")
    K = code.K
    kd, kn = jax.random.split(jax.random.PRNGKey(0))
    d = jax.random.bernoulli(kd, 0.5, (BATCH, K)).astype(jnp.int8)
    rx = awgn(kn, bpsk_map(encode_bits(d, code)), ebn0_db=4.0)
    jax.block_until_ready(rx)

    results: dict = {}
    sweep = []
    for method, fn in (("minsum", pallas_decode_minsum),
                       ("sumproduct", pallas_decode_sumproduct)):
        for mode in ("fast", "precise"):
            for impl, blocks in (("split", (512, 1024, 1536)),
                                 ("gram", (256, 512))):
                for bb in blocks:
                    tag = f"{method}_{mode}_{impl}_b{bb}"
                    try:
                        f = lambda r, m=mode, i=impl, b=bb, g=fn: g(
                            r, code, iterations=ITERS, mode=m, impl=i,
                            block_b=b)
                        t = time_decode(f, rx)
                        bps = BATCH * K / t
                    except Exception as e:  # noqa: BLE001
                        sweep.append({"cfg": tag,
                                      "error": f"{type(e).__name__}: {e}"[:160]})
                        continue
                    sweep.append({"cfg": tag, "bits_per_s": bps})
                    print(f"{tag}: {bps/1e9:.3f} Gbit/s", flush=True)
    results["sweep"] = sweep
    for method in ("minsum", "sumproduct"):
        for mode in ("fast", "precise"):
            best = max((s for s in sweep
                        if s["cfg"].startswith(f"{method}_{mode}_")
                        and "bits_per_s" in s),
                       key=lambda s: s["bits_per_s"], default=None)
            if best:
                results[f"best_{method}_{mode}"] = best
    out = REPO / "results" / "large_sweep_r5.json"
    out.write_text(json.dumps({
        "code": "gen_128_256 (make_ldpc seed=1, col_weight=3), E=768",
        "batch": BATCH, "iterations": ITERS,
        **results,
    }, indent=1) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
