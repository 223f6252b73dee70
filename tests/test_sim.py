"""Waterfall harness tests (ldpc_lapack-equivalent experiment loop)."""

import json

import numpy as np

from gr_ldpc_ece535a_tpu.sim import run_waterfall


def test_waterfall_small():
    res = run_waterfall(
        code="sim_8_16", ebn0_db=[-2.0, 4.0, 10.0],
        frames_per_point=800, iterations=5,
        methods=("hard", "minsum"), seed=1)
    # shapes and bookkeeping
    assert res.frames_per_point >= 800
    for m in ("hard", "minsum"):
        assert res.ber[m].shape == (3,)
        # waterfalls must be non-increasing in SNR (statistically safe at
        # these sample sizes and spacings)
        assert res.ber[m][0] > res.ber[m][2]
    # BP must beat the slicer at high SNR on a real code
    assert res.ber["minsum"][2] <= res.ber["hard"][2]
    # all decoders saw the same frames: hard BER equals slicer BER of the
    # identical noisy batch, so detected FER for hard >= true FER mismatch
    # bookkeeping stays consistent
    for m in ("hard", "minsum"):
        assert np.all(res.fer[m] <= 1.0) and np.all(res.fer[m] >= 0.0)

    # serialization surfaces
    doc = json.loads(res.to_json())
    assert doc["code"] == "sim_8_16"
    oct_script = res.to_octave()
    assert "semilogy" in oct_script and "ber_minsum" in oct_script
    table = res.to_table()
    assert "BER(minsum)" in table


def test_waterfall_plot(tmp_path):
    res = run_waterfall(
        code="sim_8_16", ebn0_db=[0.0, 6.0], frames_per_point=160,
        iterations=3, methods=("hard",), seed=0)
    out = tmp_path / "w.png"
    res.plot(str(out))
    assert out.stat().st_size > 1000


def test_waterfall_checkpoint_resume(tmp_path):
    """A rerun with the same config must skip completed points (identical
    results, no extra compute) and a different config must not reuse them."""
    import json

    from gr_ldpc_ece535a_tpu.sim import run_waterfall

    ck = tmp_path / "sweep.ckpt"
    kw = dict(code="block_32_64", ebn0_db=[2.0, 4.0], frames_per_point=256,
              iterations=3, methods=("minsum",), checkpoint=str(ck))
    r1 = run_waterfall(**kw)
    lines1 = ck.read_text().splitlines()
    assert len(lines1) == 2
    r2 = run_waterfall(**kw)  # resumes: nothing appended, same numbers
    assert ck.read_text().splitlines() == lines1
    assert np.allclose(r1.ber["minsum"], r2.ber["minsum"])
    # a different seed invalidates the signature -> points recomputed
    r3 = run_waterfall(**{**kw, "seed": 7})
    assert len(ck.read_text().splitlines()) == 4
    # corrupt lines are ignored, valid ones still resume
    ck.write_text("not json\n" + "\n".join(lines1) + "\n")
    r4 = run_waterfall(**kw)
    assert np.allclose(r4.ber["minsum"], r1.ber["minsum"])
