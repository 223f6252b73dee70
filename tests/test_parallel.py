"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest).

These stand in for real pod runs, per SURVEY.md §4's test plan: the sharded
sweep must reproduce the single-device computation exactly (same fold_in key
derivation), and the halo-exchange stream decode must agree frame-for-frame
with the unsharded oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gr_ldpc_ece535a_tpu.codes import get_code
from gr_ldpc_ece535a_tpu.ops import (
    awgn,
    bpsk_map,
    encode_bits,
    encode_to_symbols,
    make_decoder,
    syndrome_weight,
)
from gr_ldpc_ece535a_tpu.parallel import (
    make_mesh,
    make_sweep_step,
    mesh_axis_sizes,
    shard_stream_decode,
    stream_decode_reference,
)


@pytest.fixture(scope="module")
def code():
    return get_code("block_32_64")


def test_mesh_shapes():
    mesh = make_mesh(("batch",))
    assert mesh_axis_sizes(mesh) == {"batch": 8}
    mesh2 = make_mesh(("stream", "batch"), shape=(2, 4))
    assert mesh_axis_sizes(mesh2) == {"stream": 2, "batch": 4}
    with pytest.raises(ValueError):
        make_mesh(("batch",), shape=(3,))


def _manual_sweep(code, key, ebn0_db, n_shards, frames_per_device, method, iterations):
    """Replicate the sharded computation serially (same key derivation)."""
    dec = make_decoder(code, method=method, iterations=iterations)
    totals = np.zeros(4)
    for idx in range(n_shards):
        kd, kn = jax.random.split(jax.random.fold_in(key, idx))
        d = jax.random.bernoulli(kd, 0.5, (frames_per_device, code.K)).astype(jnp.int8)
        u = encode_bits(d, code)
        rx = awgn(kn, bpsk_map(u), jnp.float32(ebn0_db))
        vhat = dec(rx)
        wrong = np.asarray(vhat != u)
        totals[0] += wrong.sum()
        totals[1] += wrong[:, code.M:].sum()
        totals[2] += (wrong.any(axis=-1)).sum()
        totals[3] += (np.asarray(syndrome_weight(vhat, code.H)) > 0).sum()
    return totals


def test_sweep_step_matches_serial(code):
    mesh = make_mesh(("batch",))
    step = make_sweep_step(code, mesh, method=1, iterations=5, frames_per_device=64)
    key = jax.random.PRNGKey(42)
    stats = step(key, 3.0)
    assert float(stats.n_frames) == 8 * 64
    assert float(stats.n_bits) == 8 * 64 * code.N
    manual = _manual_sweep(code, key, 3.0, 8, 64, method=1, iterations=5)
    got = np.array([
        float(stats.bit_errors), float(stats.info_bit_errors),
        float(stats.frame_errors), float(stats.detected_errors)])
    np.testing.assert_array_equal(got, manual)


def test_sweep_ber_improves_with_snr(code):
    mesh = make_mesh(("batch",))
    step = make_sweep_step(code, mesh, method=0, iterations=5, frames_per_device=256)
    key = jax.random.PRNGKey(0)
    lo = step(key, 0.0)
    hi = step(key, 7.0)
    assert float(hi.bit_errors) < float(lo.bit_errors)
    assert float(hi.frame_errors) <= float(lo.frame_errors)


def test_sweep_step_on_2d_mesh(code):
    """Sweep shards over "batch" while "stream" axis exists but is idle."""
    mesh2 = make_mesh(("stream", "batch"), shape=(2, 4))
    step = make_sweep_step(code, mesh2, method=0, iterations=5, frames_per_device=32)
    stats = step(jax.random.PRNGKey(1), 5.0)
    assert float(stats.n_frames) == 4 * 32


@pytest.mark.parametrize("offset", [0, 17])
def test_shard_stream_decode_matches_oracle(code, offset):
    N = code.N
    S = 8
    n_frames = 32  # -> T = 2048 = 8 blocks of 4 frames
    rng = np.random.default_rng(5)
    data = rng.integers(0, 2, (n_frames, code.K)).astype(np.int8)
    tx = np.asarray(encode_to_symbols(
        jnp.asarray(np.packbits(data, axis=-1)), code))
    stream = tx.reshape(-1).astype(np.float32)
    stream = stream + rng.normal(0, 0.4, stream.shape).astype(np.float32)
    # place the frame grid at `offset` within a same-length stream
    full = np.concatenate([rng.normal(0, 0.1, offset).astype(np.float32),
                           stream])[: len(stream)]

    mesh = make_mesh(("stream",))
    vhat_s, w_s = shard_stream_decode(
        jnp.asarray(full), code, mesh, method=0, iterations=5, offset=offset)
    vhat_r, w_r = stream_decode_reference(full, code, method=0, iterations=5,
                                          offset=offset)
    F_valid = vhat_r.shape[0]  # frames fully inside the stream
    assert vhat_s.shape == (len(full) // N, N)
    np.testing.assert_array_equal(np.asarray(vhat_s)[:F_valid], vhat_r)
    np.testing.assert_array_equal(np.asarray(w_s)[:F_valid], w_r)
    # decoded frames must recover the transmitted data where aligned
    if offset == 0:
        rec = np.asarray(vhat_s)[:, code.M:]
        np.testing.assert_array_equal(rec, data)


def test_shard_stream_decode_validates_args(code):
    mesh = make_mesh(("stream",))
    with pytest.raises(ValueError):
        shard_stream_decode(jnp.zeros(100), code, mesh)  # not divisible
    with pytest.raises(ValueError):
        shard_stream_decode(jnp.zeros(8 * 64), code, mesh, offset=64)


class TestStreamReceiver:
    """Full acquisition + sharded decode (BASELINE config 5 regime)."""

    def _make_stream(self, code, msg, offset, invert, noise, seed=9):
        rng = np.random.default_rng(seed)
        data = np.frombuffer(msg, np.uint8).reshape(-1, code.K // 8)
        tx = np.asarray(encode_to_symbols(jnp.asarray(data), code)).reshape(-1)
        stream = np.concatenate(
            [rng.normal(0, 0.1, offset).astype(np.float32), tx])
        stream = stream + rng.normal(0, noise, stream.shape).astype(np.float32)
        return (-stream if invert else stream).astype(np.float32)

    @pytest.mark.parametrize("offset,invert", [(0, False), (23, True)])
    def test_receive_recovers_message(self, code, offset, invert):
        from gr_ldpc_ece535a_tpu.parallel import StreamReceiver
        msg = b"stream-parallel receive!" * 32  # 768 bytes = 192 frames
        stream = self._make_stream(code, msg, offset, invert, noise=0.3)
        rx = StreamReceiver(code=code, method=0, iterations=5,
                            threshold=0, mesh=make_mesh(("stream",)))
        res = rx.receive(stream)
        assert res.acquisition is not None
        assert res.acquisition.offset == offset
        assert res.acquisition.inverted == invert
        assert res.data.startswith(msg)  # trailing pad frames may append
        assert res.n_frames >= len(msg) // 4

    def test_receive_no_lock_on_noise(self, code):
        from gr_ldpc_ece535a_tpu.parallel import StreamReceiver
        rng = np.random.default_rng(0)
        garbage = (np.sign(rng.standard_normal(4096)) * 10).astype(np.float32)
        rx = StreamReceiver(code=code, threshold=0,
                            mesh=make_mesh(("stream",)))
        res = rx.receive(garbage)
        assert res.acquisition is None
        assert res.data == b""

    def test_acquire_trial_order_prefers_normal(self, code):
        """At the true offset, normal polarity must win over inverted."""
        from gr_ldpc_ece535a_tpu.parallel import acquire
        msg = b"\x12\x34\x56\x78" * 16
        stream = self._make_stream(code, msg, 0, False, noise=0.0)
        acq = acquire(stream, code, threshold=0)
        assert acq is not None and acq.offset == 0 and not acq.inverted

    def test_receive_device_resident_matches_host(self, code):
        """A device-resident jax.Array input must produce the identical
        result to the host-array path (on-device negate/pad/pack)."""
        from gr_ldpc_ece535a_tpu.parallel import StreamReceiver
        msg = b"device-resident stream path!" * 16  # 448 bytes = 112 frames
        stream = self._make_stream(code, msg, 23, True, noise=0.3)
        rx = StreamReceiver(code=code, method=0, iterations=5,
                            threshold=0, mesh=make_mesh(("stream",)))
        res_h = rx.receive(stream)
        res_d = rx.receive(jnp.asarray(stream))
        assert res_d.acquisition == res_h.acquisition
        assert res_d.data == res_h.data
        assert res_d.n_frames == res_h.n_frames
        np.testing.assert_array_equal(res_d.accepted, res_h.accepted)
        np.testing.assert_array_equal(res_d.weights, res_h.weights)

    def test_receive_bitmask_and_profile_match_default(self, code):
        """fetch_weights=False (on-device accept bitmask, 1 bit/frame over
        the wire) and profile=True (scalar-sync decode/fetch split) must
        reproduce the default path's payload and accept decisions; profile
        timings must carry the fetch split."""
        from gr_ldpc_ece535a_tpu.parallel import StreamReceiver
        msg = b"bitmask fetch path *" * 20  # 400 bytes = 100 frames
        stream = self._make_stream(code, msg, 11, False, noise=0.3)
        rx = StreamReceiver(code=code, method=0, iterations=5,
                            threshold=0, mesh=make_mesh(("stream",)))
        ref = rx.receive(stream)
        bm = rx.receive(stream, fetch_weights=False, profile=True)
        assert bm.acquisition == ref.acquisition
        assert bm.data == ref.data
        np.testing.assert_array_equal(bm.accepted, ref.accepted)
        assert bm.weights.size == 0  # not fetched in bitmask mode
        for k in ("acquire_s", "decode_s", "fetch_s", "fetch_bytes",
                  "wire_mb_s", "host_s"):
            assert k in bm.timings, k
        # 1 bit/frame + payload: strictly fewer wire bytes than the
        # default's byte-per-frame weights would need
        assert bm.timings["fetch_bytes"] < ref.n_frames * (code.K // 8 + 1) + 16

    # offset 130 > N=64 exercises the dynamic-slice tail padding: with
    # only N pad zeros the slice start clamps and the whole body decodes
    # from the wrong position (round-3 advisor high finding)
    @pytest.mark.parametrize("offset,invert",
                             [(0, False), (19, True), (130, True)])
    def test_receive_fused_single_shard_matches_two_phase(self, code, offset,
                                                          invert):
        """The single-dispatch fused receiver (1-shard mesh, device-resident
        stream, bitmask fetch) must lock at the same (offset, polarity) and
        produce the same payload as the two-phase acquire-then-decode path."""
        import jax
        from jax.sharding import Mesh
        from gr_ldpc_ece535a_tpu.parallel import StreamReceiver
        msg = b"fused single-dispatch rx" * 24  # 576 bytes = 144 frames
        stream = self._make_stream(code, msg, offset, invert, noise=0.3)
        mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("stream",))
        rx = StreamReceiver(code=code, method=0, iterations=5,
                            threshold=0, mesh=mesh1)
        ref = rx.receive(stream)                          # two-phase (host)
        fu = rx.receive(jnp.asarray(stream), fetch_weights=False,
                        profile=True)
        assert fu.timings.get("fused") is True
        assert fu.acquisition == ref.acquisition
        assert fu.data == ref.data
        assert fu.n_frames == ref.n_frames
        np.testing.assert_array_equal(fu.accepted, ref.accepted)
        # no-lock on garbage through the fused path too
        rng = np.random.default_rng(0)
        garbage = jnp.asarray(
            (np.sign(rng.standard_normal(len(stream))) * 10)
            .astype(np.float32))
        res = rx.receive(garbage, fetch_weights=False)
        assert res.acquisition is None and res.data == b""


def test_shard_stream_decode_packed_matches_unpacked(code):
    """return_packed must fuse the MSB-first byte repack on device: packed
    bytes == np.packbits of the data half of vhat, weights equal as uint8."""
    from gr_ldpc_ece535a_tpu.parallel.stream import shard_stream_decode
    N = code.N
    rng = np.random.default_rng(7)
    n_frames = 32
    data = rng.integers(0, 2, (n_frames, code.K)).astype(np.int8)
    tx = np.asarray(encode_to_symbols(
        jnp.asarray(np.packbits(data, axis=-1)), code)).reshape(-1)
    stream = (tx + rng.normal(0, 0.3, tx.shape)).astype(np.float32)
    mesh = make_mesh(("stream",))
    vhat, w = shard_stream_decode(
        jnp.asarray(stream), code, mesh, method=0, iterations=5, offset=0)
    packed, w8 = shard_stream_decode(
        jnp.asarray(stream), code, mesh, method=0, iterations=5, offset=0,
        return_packed=True)
    assert np.asarray(packed).dtype == np.uint8
    assert np.asarray(w8).dtype == np.uint8
    np.testing.assert_array_equal(
        np.asarray(packed),
        np.packbits(np.asarray(vhat)[:, code.M:].astype(np.uint8), axis=-1))
    np.testing.assert_array_equal(np.asarray(w8), np.asarray(w).astype(np.uint8))


def test_shard_stream_decode_packed_rejects_fractional_bytes():
    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.parallel.stream import shard_stream_decode
    c = get_code("sim_5_10")  # K=5: not a whole number of bytes
    mesh = make_mesh(("stream",))
    with pytest.raises(ValueError):
        shard_stream_decode(jnp.zeros(8 * c.N * 8), c, mesh,
                            return_packed=True)


def test_receive_chunked_pipeline_matches_two_phase(code):
    """Streams >= 4096 padded frames take the chunked fused pipeline
    (acquisition feeding C chunk programs device-side, async host
    copies); it must produce the identical lock, payload, and accept
    decisions as the host two-phase path."""
    import jax
    from jax.sharding import Mesh
    from gr_ldpc_ece535a_tpu.parallel import StreamReceiver

    rng = np.random.default_rng(5)
    msg = bytes(rng.integers(32, 127, 4096 * 4, dtype=np.uint8))
    data = np.frombuffer(msg, np.uint8).reshape(-1, code.K // 8)
    tx = np.asarray(encode_to_symbols(jnp.asarray(data), code)).reshape(-1)
    stream = np.concatenate(
        [rng.normal(0, 0.1, 70).astype(np.float32), -tx])
    stream = (stream + rng.normal(0, 0.3, stream.shape)).astype(np.float32)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("stream",))
    rx = StreamReceiver(code=code, method=0, iterations=5,
                        threshold=0, mesh=mesh1)
    ref = rx.receive(stream)                          # two-phase (host)
    ch = rx.receive(jnp.asarray(stream), fetch_weights=False, profile=True)
    assert ch.timings.get("pipeline_chunks") == 8
    assert ch.acquisition == ref.acquisition
    assert ch.n_frames == ref.n_frames
    np.testing.assert_array_equal(ch.accepted, ref.accepted)
    assert ch.data == ref.data
    for k in ("dispatch_s", "decode_s", "fetch_s", "host_s",
              "wire_mb_s"):
        assert k in ch.timings, k  # honest serialized profile split


def test_receive_chunked_no_lock_on_garbage(code):
    """A long garbage stream through the chunked pipeline must return
    no-lock (empty payload) — the zero tail added by frame bucketing must
    not be reachable by the offset search (all-zero false locks)."""
    import jax
    from jax.sharding import Mesh
    from gr_ldpc_ece535a_tpu.parallel import StreamReceiver

    rng = np.random.default_rng(2)
    garbage = jnp.asarray(
        (np.sign(rng.standard_normal(4500 * 64)) * 10).astype(np.float32))
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("stream",))
    rx = StreamReceiver(code=code, method=0, iterations=5,
                        threshold=0, mesh=mesh1)
    res = rx.receive(garbage, fetch_weights=False)
    assert res.acquisition is None and res.data == b""


def test_receive_dispatch_collect_segments_match_plain_receive():
    """The segmented dispatch/collect API must produce byte-identical
    payloads to per-segment blocking receive() calls (it IS the same
    device program set — only the host sync moves), and pipelining two
    segments' dispatches before any collect must not corrupt either."""
    import jax.numpy as jnp

    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.ops import awgn, encode_to_symbols
    from gr_ldpc_ece535a_tpu.parallel import StreamReceiver
    from gr_ldpc_ece535a_tpu.parallel.mesh import make_mesh

    code = get_code("block_32_64")
    n_frames = 4608                       # >= 4096 frame periods per segment
    key = jax.random.PRNGKey(4)
    kd, k1, k2 = jax.random.split(key, 3)
    data = jax.random.randint(kd, (2 * n_frames, code.K // 8), 0, 256,
                              jnp.int32).astype(jnp.uint8)
    tx = encode_to_symbols(data, code).reshape(2, -1)
    segs = [jnp.concatenate([jnp.zeros(9, jnp.float32),
                             -awgn(k, t, ebn0_db=7.0)])
            for k, t in ((k1, tx[0]), (k2, tx[1]))]
    mesh1 = make_mesh(("stream",), devices=jax.devices()[:1])
    recv = StreamReceiver(code=code, mesh=mesh1, iterations=5)
    plain = [recv.receive(s, fetch_weights=False) for s in segs]
    states = [recv.receive_dispatch(s) for s in segs]   # both before any
    seg_out = recv.receive_collect_many(states)         # one batched get
    # the single-segment collect path must agree too
    st2 = recv.receive_dispatch(segs[0])
    assert recv.receive_collect(st2).data == seg_out[0].data
    for p, s in zip(plain, seg_out):
        assert s.acquisition is not None
        assert s.acquisition.offset == p.acquisition.offset == 9
        assert s.acquisition.inverted == p.acquisition.inverted is True
        assert s.data == p.data
        assert s.n_frames == p.n_frames


def test_receive_dispatch_mixed_sizes_and_short_segment_error():
    """Segments of different lengths may be interleaved in one
    dispatch/collect_many round (each gets its own cached program
    geometry), and a segment below the chunked pipeline's floor raises
    the documented ValueError instead of mis-decoding."""
    import jax.numpy as jnp
    import pytest as _pytest

    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.ops import awgn, encode_to_symbols
    from gr_ldpc_ece535a_tpu.parallel import StreamReceiver
    from gr_ldpc_ece535a_tpu.parallel.mesh import make_mesh

    code = get_code("block_32_64")
    key = jax.random.PRNGKey(6)
    kd, k1, k2 = jax.random.split(key, 3)
    sizes = (4608, 6144)
    data = jax.random.randint(kd, (sum(sizes), code.K // 8), 0, 256,
                              jnp.int32).astype(jnp.uint8)
    tx = encode_to_symbols(data, code).reshape(-1)
    cut = sizes[0] * code.N
    segs = [jnp.concatenate([jnp.zeros(5, jnp.float32),
                             awgn(k1, tx[:cut], ebn0_db=7.0)]),
            jnp.concatenate([jnp.zeros(11, jnp.float32),
                             awgn(k2, tx[cut:], ebn0_db=7.0)])]
    mesh1 = make_mesh(("stream",), devices=jax.devices()[:1])
    recv = StreamReceiver(code=code, mesh=mesh1, iterations=5)
    outs = recv.receive_collect_many(
        [recv.receive_dispatch(s) for s in segs])
    raw = np.asarray(data).tobytes()
    assert outs[0].acquisition.offset == 5
    assert outs[1].acquisition.offset == 11
    got = outs[0].data + outs[1].data
    # each segment's final frame loses tail symbols to its zero offset
    # prefix; everything else must reassemble to the transmitted bytes
    assert raw[: len(outs[0].data) - 8] in got
    with _pytest.raises(ValueError, match="segment too short"):
        recv.receive_dispatch(jnp.zeros(100 * code.N, jnp.float32))
