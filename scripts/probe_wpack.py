"""Probe: lane-packed [q|rel]·[k|selT] K=112 score dots in the windowed
s-major kernel.

PERF.md's end-of-round-3 analysis: the windowed kernel is stall-bound at
(196, 80) dot granularity — the K=80 head-dim contraction caps the score
dots at ~62% MXU depth utilisation, and every *schedule* restructure probed
is a loss. The remaining lever is operand shape: packing q with its 32-lane
rel block and k with sel^T turns the two score dots (K=80 + K=32) plus an
f32 (196, 196) add into ONE K=112 dot at 87% depth utilisation.

RESULT (real chip, 2026-08-18): **loss, -6.8%** (2.259 -> 2.414 ms/call,
err 3.5e-3 ~ bf16). Mosaic cannot `tpu.concatenate` vregs at mismatched
lane offsets, so the pack goes through VMEM scratch stores — and the
196x224 bf16 scratch roundtrip per (window, head) costs more than the K=32
dot + f32 (196,196) add it removes. The only remaining form is
producer-side interleaving (the rel einsum and qkv Dense emitting a shared
112-lane-per-head layout), which would recover at most the gross ~13% of
this kernel ≈ ~1% e2e — not worth the cross-kernel surgery. This closes
the operand-shape question from PERF.md "Remaining headroom".

Methodology follows probe_wsoft.py: REPS chained kernel calls in one
program (scalar dependency) to bury the ~2-4 ms tunnel dispatch inflation.

Run on the real chip: python scripts/probe_wpack.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from camouflaged_vlm_tpu.ops import flash_attention as fa

B, HEADS, D = 8, 16, 80
DIM = HEADS * D
NWIN, NW = 16, 196
HG = 8
SCALE = D ** -0.5
SHIFT = fa._SOFTMAX_SHIFT
REPS = 8


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3 / REPS


def err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def _ws_pack_kernel(scale, head_group, d, wb,
                    q_ref, k_ref, v_ref, rel_ref, selT_ref, o_ref,
                    a_scr, b_scr):
    # Mosaic cannot `tpu.concatenate` vregs whose lane offsets differ
    # (result/input offset mismatch), so the packed operands are built by
    # lane-slice STORES into VMEM scratch — the same masked-store machinery
    # the kernel already uses for its d-major output.
    selT = selT_ref[:]  # (Nw, 32) — sel transposed at the caller
    for h in range(head_group):
        b_scr[h, :, d : d + 32] = selT  # window-invariant lanes, once
    for wi in range(wb):
        for h in range(head_group):
            a_scr[h, :, 0:d] = (
                q_ref[0, wi][:, h * d : (h + 1) * d]
                * jnp.asarray(scale, q_ref.dtype)
            )
            a_scr[h, :, d : d + 32] = rel_ref[:, wi, h * 32 : (h + 1) * 32]
            b_scr[h, :, 0:d] = k_ref[0, wi][:, h * d : (h + 1) * d]
        scores = []
        for h in range(head_group):
            s = jax.lax.dot_general(
                a_scr[h], b_scr[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Nw, Nw) = q k^T + rel sel
            scores.append(s)
        for h in range(head_group):
            v = v_ref[0, wi][:, h * d : (h + 1) * d]
            p = jnp.exp(scores[h] - SHIFT)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(v.dtype)
            ot = jax.lax.dot_general(
                v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            o_ref[0, wi, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def ws_pack_call(qkv, rel_s, selT, win_block=8):
    BW, Nw, _ = qkv.shape
    n_hg = HEADS // HG
    gd = HG * D
    nb = BW // win_block
    kernel = functools.partial(_ws_pack_kernel, SCALE, HG, D, win_block)
    blk = lambda role: (lambda b, g: (b, 0, 0, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, win_block, HEADS * D, Nw), qkv.dtype),
        grid=(nb, n_hg),
        in_specs=[
            pl.BlockSpec((1, win_block, Nw, gd), blk(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_block, Nw, gd), blk(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_block, Nw, gd), blk(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((Nw, win_block, HG * 32),
                         lambda b, g: (0, b, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((Nw, 32), lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, win_block, gd, Nw), lambda b, g: (b, 0, g, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((HG, Nw, D + 32), qkv.dtype),
            pltpu.VMEM((HG, Nw, D + 32), qkv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BW * HEADS * Nw * Nw * (D + 32),
            bytes_accessed=qkv.size * 2 + rel_s.size * 2,
            transcendentals=BW * HEADS * Nw * Nw,
        ),
    )(
        qkv.reshape(nb, win_block, Nw, 3 * HEADS * D),
        qkv.reshape(nb, win_block, Nw, 3 * HEADS * D),
        qkv.reshape(nb, win_block, Nw, 3 * HEADS * D),
        rel_s,
        selT,
    ).reshape(BW, HEADS * D, Nw)


def chained(call_fn, qkv, *rest):
    y = qkv
    out = None
    for _ in range(REPS):
        out = call_fn(y, *rest)
        y = qkv * (1.0 + 0.0 * jnp.sum(out).astype(qkv.dtype))
    return out


def main():
    rng = np.random.default_rng(0)
    BW = B * NWIN
    qkv_w = jnp.asarray(rng.standard_normal((BW, NW, 3 * DIM)) * 0.05, jnp.bfloat16)
    rel_w = jnp.asarray(rng.standard_normal((NW, BW, HEADS * 32)) * 0.05, jnp.bfloat16)
    sel32 = jnp.asarray((rng.random((32, NW)) > 0.5), jnp.bfloat16)
    selT = jnp.asarray(np.asarray(sel32).T)  # (NW, 32)

    f_cur = jax.jit(functools.partial(
        chained, functools.partial(
            fa.flash_qkv_packed_windows_s, scale=SCALE, heads=HEADS, d=D,
            head_group=HG)))
    f_pack = jax.jit(functools.partial(chained, ws_pack_call))

    ref = f_cur(qkv_w, rel_w, sel32)
    got = f_pack(qkv_w, rel_w, selT)
    print(f"pack err vs current: {err(got, ref):.2e}")

    t_cur = timeit(f_cur, qkv_w, rel_w, sel32)
    t_pack = timeit(f_pack, qkv_w, rel_w, selT)
    print(f"windows_s current        : {t_cur:7.3f} ms/call")
    print(f"windows_s packed K=112   : {t_pack:7.3f} ms/call "
          f"({(t_cur - t_pack) / t_cur * 100:+.1f}%)")


if __name__ == "__main__":
    main()
