"""Round-2 kernel prototypes (honest-timed). Iterated here, shipped in
ops/pallas_bp.py when a variant wins.

Variants under test vs the shipped "fast" kernels (w-major layout,
bf16-MXU aggregation):

  minsum current     — shipped _minsum_fast_kernel arithmetic
  minsum stub_check  — check step replaced by a copy (attributes its cost)
  minsum stub_mm     — Gram matmul removed (attributes MXU cost)
  minsum bits        — sign/magnitude handling in int32 bit ops:
                       |x| = bits & 0x7fffffff (positive-float ordering =
                       int ordering), row sign parity = XOR tree of sign
                       bits, message assembly = (sign ^ parity) | min_bits
  minsum bf16        — messages held in bfloat16 through the VPU work
  sumprod current    — shipped _sumproduct_fast_kernel (phi-domain, two
                       log∘tanh passes per iteration)
  sumprod psprod     — prefix/suffix exclusion products of tanh(t/2): one
                       tanh + one log pass per iteration (half the
                       transcendental work), signs carried by tanh itself
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bench import time_decode, _make_inputs  # noqa: E402
from gr_ldpc_ece535a_tpu.codes import get_code  # noqa: E402
from gr_ldpc_ece535a_tpu.ops.pallas_bp import (  # noqa: E402
    _wmajor_layout, _excl_min_axis0, _tree, pallas_decode_minsum,
    pallas_decode_sumproduct)

BIG = np.float32(1e30)
PHI_CLAMP = np.float32(1e4)
SIGN = np.int32(np.uint32(0x80000000).view(np.int32))
MAG = np.int32(0x7FFFFFFF)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _gather(bcm, x):
    return jax.lax.dot_general(bcm, x, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _excl_min0_i32(x, big_i):
    """Exclusive min over axis 0 of int32 (positive-float bit patterns)."""
    W = x.shape[0]
    fill = jnp.full_like(x[:1], big_i)
    pparts = [fill]
    acc = x[0:1]
    for w in range(1, W):
        pparts.append(acc)
        acc = jnp.minimum(acc, x[w:w + 1])
    min_all = acc
    sparts = [fill]
    acc = x[W - 1:W]
    for w in range(W - 2, -1, -1):
        sparts.append(acc)
        acc = jnp.minimum(acc, x[w:w + 1])
    pref = jnp.concatenate(pparts, axis=0)
    suf = jnp.concatenate(sparts[::-1], axis=0)
    return jnp.minimum(pref, suf), min_all


# ---------------------------------------------------------------------------
# min-sum variants
# ---------------------------------------------------------------------------

def minsum_kernel(variant, iterations, M, Wr, N,
                  rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    Bt = rx_ref.shape[1]
    E = Wr * M
    big = jnp.float32(np.finfo(np.float32).max)
    Lci = -rx_ref[:]
    bcm = bcm_ref[:]
    G = gram_ref[:]
    padbig = padbig_ref[:]
    base = _gather(bcm, Lci) + padbig

    if variant == "bf16":
        base16 = base.astype(jnp.bfloat16)

        def check_step(Lq):
            t = Lq.reshape(Wr, M, Bt)
            beta = jnp.abs(t)
            sg = jnp.where(t < 0, jnp.bfloat16(-1), jnp.bfloat16(1))
            P = _tree(jnp.multiply, sg)
            min_excl, min1 = _excl_min_axis0(beta, jnp.bfloat16(3e38))
            prod_alpha = jnp.where(min1 == 0, jnp.bfloat16(0), P)
            return (sg * (prod_alpha * min_excl)).reshape(E, Bt)

        def body(_i, carry):
            Lq, _Lr = carry
            Lr = check_step(Lq)
            Lq_new = (base16 + _mm(G, Lr).astype(jnp.bfloat16))
            return Lq_new, Lr

        Lq0 = base16
        _, Lr = jax.lax.fori_loop(0, iterations, body,
                                  (Lq0, jnp.zeros_like(Lq0)))
        LQ = Lci + _mm(bcm, Lr)
        out_ref[:] = (LQ < 0).astype(jnp.int8)
        return

    if variant == "split":
        # Lq = bcmT @ (bcm @ Lr + Lci): replaces the (E,E) Gram matmul +
        # full-width base add with two rectangular matmuls whose padded MXU
        # tile-passes are fewer (K=192 then K=64 vs 2x output-row tiles at
        # K=192) and a (N, Bt) add. Exclusion (minus-self) and pad bigs move
        # into the check step: Lq here is the INCLUSIVE per-variable sum
        # broadcast to edges, so check_step subtracts the self message and
        # adds +big on pad slots before taking |.|.
        # loop carries Lr_off = Lr - padbig so t = incl - Lr_off lands at
        # +big on pad slots (sign +1, magnitude big: inert in both the row
        # parity and the min) with no separate pad add.
        def check_step_incl(t_flat):
            t = t_flat.reshape(Wr, M, Bt)
            beta = jnp.abs(t)
            sg = jnp.where(t < 0, -1.0, 1.0)
            P = _tree(jnp.multiply, sg)
            min_excl, min1 = _excl_min_axis0(beta, big)
            prod_alpha = jnp.where(min1 == 0, 0.0, P)
            return (sg * (prod_alpha * min_excl)).reshape(E, Bt)

        bcmT = bcm.T

        def body(_i, carry):
            Lq_incl, Lr_off, _Lr = carry
            Lr = check_step_incl(Lq_incl - Lr_off)
            A = _mm(bcm, Lr) + Lci            # (N, Bt) inclusive var sums
            Lq_new = _mm(bcmT, A)             # broadcast back to edges
            return Lq_new, Lr - padbig, Lr

        z = jnp.zeros((E, Bt), jnp.float32)
        Lq0 = _gather(bcm, Lci)  # exact initial gather (HIGHEST)
        _, _, Lr = jax.lax.fori_loop(
            0, iterations, body, (Lq0, z - padbig, z))
        LQ = Lci + _mm(bcm, Lr)
        out_ref[:] = (LQ < 0).astype(jnp.int8)
        return

    if variant in ("int8", "int8s"):
        # Quantized-Gram min-sum: check messages are rounded to a saturating
        # 8-bit fixed-point grid (the hardware-LDPC-decoder representation)
        # before the Gram aggregation, which then runs on the int8 MXU at 2x
        # bf16 throughput with EXACT int32 accumulation (row sums have <= 2
        # terms). "int8s" rescales the grid each iteration from the running
        # message magnitude; "int8" uses a fixed clip at 8x the max |Lci|.
        def check_step(Lq):
            t = Lq.reshape(Wr, M, Bt)
            beta = jnp.abs(t)
            sg = jnp.where(t < 0, -1.0, 1.0)
            P = _tree(jnp.multiply, sg)
            min_excl, min1 = _excl_min_axis0(beta, big)
            prod_alpha = jnp.where(min1 == 0, 0.0, P)
            return (sg * (prod_alpha * min_excl)).reshape(E, Bt)

        clip = 24.0
        qs = jnp.float32(127.0 / clip)
        dq = jnp.float32(clip / 127.0)
        Gq = G.astype(jnp.int8)

        def body(_i, carry):
            Lq, _Lr = carry
            Lr = check_step(Lq)
            q = jnp.clip(Lr * qs, -127.0, 127.0).astype(jnp.int8)
            acc = jax.lax.dot_general(
                Gq, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            Lq_new = base + acc.astype(jnp.float32) * dq
            return Lq_new, Lr

        Lq0 = base
        _, Lr = jax.lax.fori_loop(0, iterations, body,
                                  (Lq0, jnp.zeros_like(Lq0)))
        LQ = Lci + _mm(bcm, Lr)
        out_ref[:] = (LQ < 0).astype(jnp.int8)
        return

    if variant == "bits":
        def check_step(Lq):
            tb = jax.lax.bitcast_convert_type(
                Lq.reshape(Wr, M, Bt), jnp.int32)
            mag = tb & MAG                       # |x| bits (int-ordered)
            par = _tree(jnp.bitwise_xor, tb) & SIGN   # row sign parity bit
            min_excl, min1 = _excl_min0_i32(mag, jnp.int32(0x7F7FFFFF))
            sgn = (tb ^ par) & SIGN
            Lr_b = sgn | min_excl
            # sign(0)=0: a zero message zeroes the whole row
            Lr_b = jnp.where(min1 == 0, 0, Lr_b)
            return jax.lax.bitcast_convert_type(
                Lr_b, jnp.float32).reshape(E, Bt)
    elif variant == "stub_check":
        def check_step(Lq):
            return Lq * 0.5
    else:  # current / stub_mm
        def check_step(Lq):
            t = Lq.reshape(Wr, M, Bt)
            beta = jnp.abs(t)
            sg = jnp.where(t < 0, -1.0, 1.0)
            P = _tree(jnp.multiply, sg)
            min_excl, min1 = _excl_min_axis0(beta, big)
            prod_alpha = jnp.where(min1 == 0, 0.0, P)
            return (sg * (prod_alpha * min_excl)).reshape(E, Bt)

    if variant == "stub_mm":
        def body(_i, carry):
            Lq, _Lr = carry
            Lr = check_step(Lq)
            return base + Lr, Lr
    else:
        def body(_i, carry):
            Lq, _Lr = carry
            Lr = check_step(Lq)
            return base + _mm(G, Lr), Lr

    Lq0 = base
    _, Lr = jax.lax.fori_loop(0, iterations, body, (Lq0, jnp.zeros_like(Lq0)))
    LQ = Lci + _mm(bcm, Lr)
    out_ref[:] = (LQ < 0).astype(jnp.int8)


# ---------------------------------------------------------------------------
# sum-product variants
# ---------------------------------------------------------------------------

def sumprod_kernel(variant, iterations, M, Wr, N,
                   rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    Bt = rx_ref.shape[1]
    E = Wr * M
    r = -rx_ref[:]
    bcm = bcm_ref[:]
    G = gram_ref[:]
    padbig = padbig_ref[:]
    deg = jnp.sum(bcm, axis=1, keepdims=True)
    degr = deg * r
    base = _gather(bcm, (deg - 1.0) * r) + padbig
    Mmsg0 = _gather(bcm, r) + padbig

    if variant == "psprod":
        def check_step(Mmsg):
            t = jnp.tanh(Mmsg.reshape(Wr, M, Bt) * 0.5)  # pads: tanh(5e29)=1
            # exclusive prefix/suffix products over w (signs ride along)
            ones = jnp.ones_like(t[:1])
            pparts = [ones]
            acc = t[0:1]
            for w in range(1, Wr):
                pparts.append(acc)
                acc = acc * t[w:w + 1]
            sparts = [ones]
            acc = t[Wr - 1:Wr]
            for w in range(Wr - 2, -1, -1):
                sparts.append(acc)
                acc = acc * t[w:w + 1]
            T = (jnp.concatenate(pparts, axis=0)
                 * jnp.concatenate(sparts[::-1], axis=0))
            T = jnp.clip(T, -0.9999999, 0.9999999)
            E_msg = jnp.log((1.0 + T) / (1.0 - T))
            return E_msg.reshape(E, Bt)
    else:  # current
        def check_step(Mmsg):
            t = Mmsg.reshape(Wr, M, Bt)
            sg = jnp.where(t < 0, -1.0, 1.0)
            w = jnp.maximum(jnp.log(jnp.tanh(jnp.abs(t) * 0.5)), -PHI_CLAMP)
            U = _tree(jnp.add, w)
            negP = -_tree(jnp.multiply, sg)
            v = w - U
            return ((negP * sg) * jnp.log(jnp.tanh(v * 0.5))).reshape(E, Bt)

    def body(_i, carry):
        Mmsg, _Em = carry
        Em = check_step(Mmsg)
        return base + _mm(G, Em), Em

    _, Em = jax.lax.fori_loop(0, iterations, body,
                              (Mmsg0, jnp.zeros_like(Mmsg0)))
    L = _mm(bcm, Em) + degr
    out_ref[:] = (L <= 0).astype(jnp.int8)


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------

def run(kind, variant, rx, code, iterations=20, block_b=4096):
    bcm_np, gram_np, padbig_np, Wr = _wmajor_layout(code)
    N, E = bcm_np.shape
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    body = minsum_kernel if kind == "minsum" else sumprod_kernel
    kernel = functools.partial(body, variant, iterations, code.M, Wr, N)
    consts = [(jnp.asarray(bcm_np), (N, E)), (jnp.asarray(gram_np), (E, E)),
              (jnp.asarray(padbig_np), (E, 1))]
    out = pl.pallas_call(
        kernel,
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((N, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
                  for _, s in consts],
        out_specs=pl.BlockSpec((N, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Bp), jnp.int8),
    )(rx_t, *[a for a, _ in consts])
    return out[:, :B].T


def main():
    code = get_code("block_32_64")
    B = 1 << 17
    rx = _make_inputs(code, B, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)
    K = code.K

    ref_min = np.asarray(pallas_decode_minsum(rx, code, iterations=20,
                                              mode="precise"))
    ref_sp = np.asarray(pallas_decode_sumproduct(rx, code, iterations=20,
                                                 mode="precise"))

    cases = [
        ("minsum", "current"), ("minsum", "stub_check"),
        ("minsum", "stub_mm"), ("minsum", "bits"), ("minsum", "bf16"),
        ("minsum", "int8"), ("minsum", "split"),
        ("sumprod", "current"), ("sumprod", "psprod"),
    ]
    which = sys.argv[1:] or None
    for kind, variant in cases:
        if which and f"{kind}:{variant}" not in which:
            continue
        try:
            out = np.asarray(run(kind, variant, rx, code))
            ref = ref_min if kind == "minsum" else ref_sp
            agree = float((out == ref).all(axis=1).mean())
            t = time_decode(lambda r, k=kind, v=variant: run(k, v, r, code),
                            rx)
            print(f"{kind}:{variant:11s}: {t*1e3:7.3f} ms "
                  f"({B*K/t/1e9:6.3f} Gbit/s)  frame-agree={agree:.4f}")
        except Exception as e:  # noqa: BLE001
            print(f"{kind}:{variant:11s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
