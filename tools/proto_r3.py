"""Round-3 kernel prototypes (honest-timed). Target: a parity-grade
("precise") sum-product path over 1e9 info bits/s (VERDICT.md round-2
item 1). Iterated here, shipped in ops/pallas_bp.py when a variant wins.

The shipped "precise" kernels split every Gram operand x == hi + lo
(hi = bf16(x)) and run TWO bf16 MXU passes, each with contraction dim
E=192 padded to 2x128 — 2 passes x (2 out-row chunks x 2 contraction
chunks) = 8 MXU tile passes per iteration. The "stacked" variant runs ONE
matmul against G2 = [G | G] (E, 2E) with the operand stacked
S = [hi; lo] (2E, Bt): contraction 2E = 384 = 3x128 exactly, so
2 x 3 = 6 tile passes — identical arithmetic (both halves accumulate in
f32 on the MXU; only the accumulation order across the hi/lo boundary can
differ by 1 ulp), 25% less padded MXU work.

Variants:
  {minsum,sumprod}:precise2   — shipped two-pass hi/lo (baseline)
  {minsum,sumprod}:stacked    — [G|G] @ [hi;lo], one matmul
  {minsum,sumprod}:stacked16  — same, operand concat done in bfloat16
                                (halves the concat VPU bytes; the lo half
                                is bf16-rounded exactly as the shipped
                                2-pass DEFAULT-precision lo pass rounds it)
Each runs at block_b in {2048, 4096}; frame agreement is checked against
the shipped precise output.
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


def _gather(bcm, x):
    return jax.lax.dot_general(bcm, x, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _make_mm(variant):
    """variant -> per-iteration Gram multiply fn(G_or_G2, x) -> (E, Bt)."""
    if variant == "precise2":
        def mm(G, x):
            hi = x.astype(jnp.bfloat16).astype(jnp.float32)
            lo = x - hi
            return (jnp.dot(G, hi, preferred_element_type=jnp.float32)
                    + jnp.dot(G, lo, preferred_element_type=jnp.float32))
    elif variant == "stacked":
        def mm(G2, x):
            hi = x.astype(jnp.bfloat16).astype(jnp.float32)
            s = jnp.concatenate([hi, x - hi], axis=0)   # (2E, Bt) f32
            return jnp.dot(G2, s, preferred_element_type=jnp.float32)
    elif variant == "stacked16":
        def mm(G2, x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            s = jnp.concatenate([hi, lo], axis=0)       # (2E, Bt) bf16
            return jnp.dot(G2, s, preferred_element_type=jnp.float32)
    else:
        raise ValueError(variant)
    return mm


def minsum_kernel(variant, iterations, M, Wr, N,
                  rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    Bt = rx_ref.shape[1]
    E = Wr * M
    big = jnp.float32(np.finfo(np.float32).max)
    mm = _make_mm(variant)
    Lci = -rx_ref[:]
    bcm = bcm_ref[:]
    G = gram_ref[:]
    padbig = padbig_ref[:]
    base = _gather(bcm, Lci) + padbig

    def check_step(Lq):
        t = Lq.reshape(Wr, M, Bt)
        beta = jnp.abs(t)
        sg = jnp.where(t < 0, -1.0, 1.0)
        P = _tree(jnp.multiply, sg)
        min_excl, min1 = _excl_min_axis0(beta, big)
        prod_alpha = jnp.where(min1 == 0, 0.0, P)
        return (sg * (prod_alpha * min_excl)).reshape(E, Bt)

    def body(_i, carry):
        Lq, _Lr = carry
        Lr = check_step(Lq)
        return base + mm(G, Lr), Lr

    _, Lr = jax.lax.fori_loop(0, iterations, body, (base, jnp.zeros((E, Bt),
                                                                    jnp.float32)))
    LQ = Lci + jnp.dot(bcm, Lr, preferred_element_type=jnp.float32)
    out_ref[:] = (LQ < 0).astype(jnp.int8)


def sumprod_kernel(variant, iterations, M, Wr, N,
                   rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    Bt = rx_ref.shape[1]
    E = Wr * M
    mm = _make_mm(variant)
    r = -rx_ref[:]
    bcm = bcm_ref[:]
    G = gram_ref[:]
    padbig = padbig_ref[:]
    deg = jnp.sum(bcm, axis=1, keepdims=True)
    degr = deg * r
    base = _gather(bcm, (deg - 1.0) * r) + padbig
    Mmsg0 = _gather(bcm, r) + padbig

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
        return base + mm(G, Em), Em

    _, Em = jax.lax.fori_loop(0, iterations, body,
                              (Mmsg0, jnp.zeros_like(Mmsg0)))
    L = jnp.dot(bcm, Em, preferred_element_type=jnp.float32) + degr
    # final aggregation kept single-pass here: decision-margin-level only
    out_ref[:] = (L <= 0).astype(jnp.int8)


def run(kind, variant, rx, code, iterations=20, block_b=2048):
    bcm_np, gram_np, padbig_np, Wr = _wmajor_layout(code)
    N, E = bcm_np.shape
    gram = gram_np
    if variant in ("stacked", "stacked16"):
        gram = np.concatenate([gram_np, gram_np], axis=1)  # (E, 2E)
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    body = minsum_kernel if kind == "minsum" else sumprod_kernel
    kernel = functools.partial(body, variant, iterations, code.M, Wr, N)
    consts = [(jnp.asarray(bcm_np), (N, E)),
              (jnp.asarray(gram), gram.shape),
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

    cases = []
    for kind in ("sumprod", "minsum"):
        for variant in ("precise2", "stacked", "stacked16"):
            for bb in (2048, 4096):
                cases.append((kind, variant, bb))
    which = set(sys.argv[1:]) or None
    # interleave: 2 rounds over all cases so per-process drift averages out
    results = {}
    for rnd in range(2):
        for kind, variant, bb in cases:
            tag = f"{kind}:{variant}:b{bb}"
            if which and tag not in which:
                continue
            try:
                out = np.asarray(run(kind, variant, rx, code, block_b=bb))
                ref = ref_min if kind == "minsum" else ref_sp
                agree = float((out == ref).all(axis=1).mean())
                t = time_decode(
                    lambda r, k=kind, v=variant, b=bb: run(k, v, r, code,
                                                           block_b=b), rx)
                results.setdefault(tag, []).append((t, agree))
                print(f"[round {rnd}] {tag:28s}: {t*1e3:7.3f} ms "
                      f"({B*K/t/1e9:6.3f} Gbit/s)  frame-agree={agree:.5f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[round {rnd}] {tag:28s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
    print("\nbest-of-rounds:")
    for tag, rs in results.items():
        t = min(r[0] for r in rs)
        agree = min(r[1] for r in rs)
        print(f"  {tag:28s}: {t*1e3:7.3f} ms ({B*K/t/1e9:6.3f} Gbit/s) "
              f"agree={agree:.5f}")





# -- round-3b: SPA check-step variants under the stacked precise Gram ------
def sumprod_kernel_v2(variant, iterations, M, Wr, N,
                      rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    """variant "phi" = shipped phi-domain; "psprod1p" = prefix/suffix tanh
    products with log1p(T) - log1p(-T) (division-free; the closest
    formulation to the XLA path's check step)."""
    import jax
    import jax.numpy as jnp
    Bt = rx_ref.shape[1]
    E = Wr * M
    r = -rx_ref[:]
    bcm2 = bcm_ref[:]
    bcm = bcm2[:, :E]
    G2 = gram_ref[:]
    padbig = padbig_ref[:]
    deg = jnp.sum(bcm, axis=1, keepdims=True)
    degr = deg * r
    base = _gather(bcm, (deg - 1.0) * r) + padbig
    Mmsg0 = _gather(bcm, r) + padbig

    def split(x):
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.concatenate([hi, x - hi], axis=0)

    if variant == "psprod1p":
        def check_step(Mmsg):
            t = jnp.tanh(Mmsg.reshape(Wr, M, Bt) * 0.5)  # pads -> 1.0
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
            T = jnp.clip(T, -0.999999881, 0.999999881)  # |E| <= ~16.6
            return (jnp.log1p(T) - jnp.log1p(-T)).reshape(E, Bt)
    else:
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
        return base + jnp.dot(G2, split(Em),
                              preferred_element_type=jnp.float32), Em

    _, Em = jax.lax.fori_loop(0, iterations, body,
                              (Mmsg0, jnp.zeros_like(Mmsg0)))
    L = jnp.dot(bcm2, split(Em), preferred_element_type=jnp.float32) + degr
    out_ref[:] = (L <= 0).astype(jnp.int8)


def run_v2(variant, rx, code, iterations=20, block_b=2048):
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bcm_np, gram_np, padbig_np, Wr = _wmajor_layout(code)
    N, E = bcm_np.shape
    bcm2 = np.concatenate([bcm_np, bcm_np], axis=1)
    gram2 = np.concatenate([gram_np, gram_np], axis=1)
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    kernel = functools.partial(sumprod_kernel_v2, variant, iterations,
                               code.M, Wr, N)
    consts = [(jnp.asarray(bcm2), bcm2.shape),
              (jnp.asarray(gram2), gram2.shape),
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


def main_v2():
    import jax
    code = get_code("block_32_64")
    B = 1 << 17
    rx = _make_inputs(code, B, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)
    K = code.K
    ref = np.asarray(pallas_decode_sumproduct(rx, code, iterations=20,
                                              mode="precise"))
    for rnd in range(2):
        for variant in ("phi", "psprod1p"):
            out = np.asarray(run_v2(variant, rx, code))
            agree = float((out == ref).all(axis=1).mean())
            t = time_decode(lambda r, v=variant: run_v2(v, r, code), rx)
            print(f"[{rnd}] spa-precise {variant:9s}: {t*1e3:.3f} ms "
                  f"({B*K/t/1e9:.3f} Gbit/s) agree={agree:.5f}", flush=True)


if __name__ == "__main__":
    main_v2() if "v2" in sys.argv[1:] else main()
