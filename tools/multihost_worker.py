#!/usr/bin/env python3
"""Multi-process ("multi-host") sweep worker: one JAX process of N.

Stands in for one host of a TPU pod: ``jax.distributed.initialize`` +
CPU-gloo collectives give a real cross-process device mesh, the same
execution model as multi-host TPU (each process sees all GLOBAL devices,
addresses only its local ones, and the psum in parallel/sweep.py rides the
collective fabric). Launched by tests/test_multihost.py and usable
standalone:

    python tools/multihost_worker.py <process_id> <num_processes> <port> \
        [devices_per_process] [frames_per_device] [mode]

mode "sweep" (default): process 0 prints one JSON line with the globally
aggregated SweepStats — which must be bit-identical to a single-process run
over the same number of devices (the sweep folds the PRNG key by GLOBAL
axis index, so the sharding topology is invisible to the statistics).

mode "stream": runs ``shard_stream_decode`` — the ppermute N-1-symbol halo
exchange — over the cross-process mesh on a deterministic noisy stream with
a 17-symbol frame offset, and prints integer digests of the decoded frames
and syndrome weights. The halo of the process-boundary shard crosses a REAL
process boundary here (the round-2 VERDICT's untested collective); digests
must be bit-identical to the single-process run, and the 1-process worker
additionally asserts its sharded result equals the unsharded oracle.
"""

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(sys.argv[4]) if len(sys.argv) > 4 else 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _run_sweep(frames: int) -> dict:
    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.parallel.mesh import make_mesh
    from gr_ldpc_ece535a_tpu.parallel.sweep import make_sweep_step

    code = get_code("block_32_64")
    mesh = make_mesh(("batch",))  # over all GLOBAL devices
    step = make_sweep_step(code, mesh, method=0, iterations=5,
                           frames_per_device=frames)
    stats = step(jax.random.PRNGKey(0), 4.0)
    return {k: float(v) for k, v in stats._asdict().items()}


def _run_stream(frames_per_device: int) -> dict:
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.ops import bpsk_map, encode_bits
    from gr_ldpc_ece535a_tpu.parallel.mesh import make_mesh
    from gr_ldpc_ece535a_tpu.parallel.stream import (
        shard_stream_decode, stream_decode_reference)

    code = get_code("block_32_64")
    N = code.N
    S = jax.device_count()
    offset = 17
    nfr = frames_per_device * S
    T = nfr * N
    # deterministic stream, constructed identically on every process
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2, (nfr, code.K)).astype(np.int8)
    tx = np.asarray(bpsk_map(encode_bits(jnp.asarray(data), code))
                    ).reshape(-1)
    stream = np.zeros(T, np.float32)
    avail = T - offset
    stream[offset:] = tx[:avail] + rng.normal(0.0, 0.4, avail)
    mesh = make_mesh(("stream",))
    sh = NamedSharding(mesh, P("stream"))
    garr = jax.make_array_from_callback((T,), sh,
                                        lambda idx: stream[idx])
    vhat, w = shard_stream_decode(garr, code, mesh, method=0, iterations=5,
                                  offset=offset)
    # integer digests (replicated scalars every process can read). The last
    # frame's tail wraps the ring halo into the stream head (offset > 0), so
    # digests cover the nfr-1 fully-contained frames only — the same set the
    # unsharded oracle decodes.
    F = nfr - 1
    cv = np.random.default_rng(11).integers(1, 1 << 16, (F, N)
                                            ).astype(np.int64)
    cw = np.random.default_rng(12).integers(1, 1 << 16, F).astype(np.int64)

    @jax.jit
    def digest(v, wt):
        return (jnp.sum(v[:F].astype(jnp.int64) * jnp.asarray(cv)),
                jnp.sum(wt[:F].astype(jnp.int64) * jnp.asarray(cw)))

    dv, dw = digest(vhat, w)
    out = {"digest_vhat": int(dv), "digest_w": int(dw), "n_frames": F}
    if jax.process_count() == 1:
        ref_v, ref_w = stream_decode_reference(stream, code, method=0,
                                               iterations=5, offset=offset)
        assert int((ref_v[:F].astype(np.int64) * cv).sum()) == int(dv), \
            "sharded decode != unsharded oracle (vhat digest)"
        assert int((ref_w[:F].astype(np.int64) * cw).sum()) == int(dw), \
            "sharded decode != unsharded oracle (weight digest)"
        out["oracle_checked"] = True
    return out


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    frames = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    mode = sys.argv[6] if len(sys.argv) > 6 else "sweep"
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    out = _run_sweep(frames) if mode == "sweep" else _run_stream(frames)
    out["n_global_devices"] = jax.device_count()
    out["n_local_devices"] = jax.local_device_count()
    out["process_id"] = pid
    if pid == 0:
        print(json.dumps(out))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
