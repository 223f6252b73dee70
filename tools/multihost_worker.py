#!/usr/bin/env python3
"""Multi-process ("multi-host") sweep worker: one JAX process of N.

Stands in for one host of a TPU pod: ``jax.distributed.initialize`` +
CPU-gloo collectives give a real cross-process device mesh, the same
execution model as multi-host TPU (each process sees all GLOBAL devices,
addresses only its local ones, and the psum in parallel/sweep.py rides the
collective fabric). Launched by tests/test_multihost.py and usable
standalone:

    python tools/multihost_worker.py <process_id> <num_processes> <port> \
        [devices_per_process] [frames_per_device]

Process 0 prints one JSON line with the globally aggregated SweepStats —
which must be bit-identical to a single-process run over the same number of
devices (the sweep folds the PRNG key by GLOBAL axis index, so the sharding
topology is invisible to the statistics).
"""

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(sys.argv[4]) if len(sys.argv) > 4 else 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    frames = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.parallel.mesh import make_mesh
    from gr_ldpc_ece535a_tpu.parallel.sweep import make_sweep_step

    code = get_code("block_32_64")
    mesh = make_mesh(("batch",))  # over all GLOBAL devices
    step = make_sweep_step(code, mesh, method=0, iterations=5,
                           frames_per_device=frames)
    stats = step(jax.random.PRNGKey(0), 4.0)
    out = {k: float(v) for k, v in stats._asdict().items()}
    out["n_global_devices"] = jax.device_count()
    out["n_local_devices"] = jax.local_device_count()
    out["process_id"] = pid
    if pid == 0:
        print(json.dumps(out))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
