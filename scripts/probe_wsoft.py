"""Probe: constant-shift softmax + divfold in the windowed/edge kernels.

probe_gbias2 found the global kernel's per-column max reduce+subtract costs
~2.3 ms/block — softmax is shift-invariant, so a compile-time constant shift
replaces it exactly. The windowed kernels have the same max+sub on (Nw, Nw)
tiles and normalise the full probability matrix (divfold moves the 1/l to
the (d, Nw) output — 2.4x fewer divides).

Methodology fix over probe_attn_v3: each timed function CHAINS `reps`
kernel calls in ONE program (scalar dependency between iterations), because
a single call on this tunnel carries ~2-4 ms of dispatch inflation that
drowned sub-ms deltas in earlier probes (trace says a full-window block is
~0.6 ms; probe_attn_v3 measured 3.1).

Run on the real chip: python scripts/probe_wsoft.py
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
from camouflaged_vlm_tpu.ops.compact_window import LPAD_LANE, REL_LANES

B, HEADS, D = 8, 16, 80
DIM = HEADS * D
NWIN, NW = 16, 196
NE, RE = 9, 112
HG = 8
SCALE = D ** -0.5
SHIFT = 20.0
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


# ------------------------- windows_s variants -------------------------
def _ws_kernel(scale, head_group, d, wb, const_shift, divfold,
               q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    sel = sel_ref[:]
    for wi in range(wb):
        scores = []
        for h in range(head_group):
            q = q_ref[0, wi][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
            k = k_ref[0, wi][:, h * d : (h + 1) * d]
            rel = rel_ref[:, wi, h * 32 : (h + 1) * 32]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s += jax.lax.dot(
                rel.astype(q.dtype), sel, preferred_element_type=jnp.float32
            )
            scores.append(s)
        for h in range(head_group):
            v = v_ref[0, wi][:, h * d : (h + 1) * d]
            s = scores[h]
            if const_shift:
                p = jnp.exp(s - SHIFT)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if divfold:
                ot = jax.lax.dot_general(
                    v, p.astype(v.dtype), (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                inv_row = jax.lax.dot_general(
                    jnp.ones((1, 1), jnp.float32), 1.0 / l,
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                )
                ot = ot * inv_row
            else:
                p = (p / l).astype(v.dtype)
                ot = jax.lax.dot_general(
                    v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
            o_ref[0, wi, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def ws_call(qkv, rel_s, sel32, const_shift=False, divfold=False, win_block=8):
    BW, Nw, _ = qkv.shape
    n_hg = HEADS // HG
    gd = HG * D
    nb = BW // win_block
    kernel = functools.partial(_ws_kernel, SCALE, HG, D, win_block,
                               const_shift, divfold)
    blk = lambda role: (lambda b, g: (b, 0, 0, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, win_block, HEADS * D, Nw), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(nb, n_hg),
            in_specs=[
                pl.BlockSpec((1, win_block, Nw, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_block, Nw, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_block, Nw, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((Nw, win_block, HG * 32),
                             lambda b, g: (0, b, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, Nw), lambda b, g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, win_block, gd, Nw), lambda b, g: (b, 0, g, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BW * HEADS * Nw * Nw * (2 * D + 32),
            bytes_accessed=qkv.size * 2 + rel_s.size * 2,
            transcendentals=BW * HEADS * Nw * Nw,
        ),
    )(
        qkv.reshape(nb, win_block, Nw, 3 * HEADS * D),
        qkv.reshape(nb, win_block, Nw, 3 * HEADS * D),
        qkv.reshape(nb, win_block, Nw, 3 * HEADS * D),
        rel_s,
        sel32,
    ).reshape(BW, HEADS * D, Nw)


# --------------------------- edge variants ---------------------------
def _edge_kernel(scale, head_group, d, n, const_shift,
                 q_ref, k_ref, v_ref, rel_ref, sel_ref, vb_ref, km_ref, o_ref):
    sel = sel_ref[:]
    km = km_ref[:]
    staged = []
    for h in range(head_group):
        q = q_ref[0][:, :, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, :, h * d : (h + 1) * d]
        rel = rel_ref[0][:, :, h * REL_LANES : (h + 1) * REL_LANES]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s += jax.lax.dot_general(
            rel, sel.astype(rel.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s += km
        lp = rel[:, :, LPAD_LANE : LPAD_LANE + 1].astype(jnp.float32)
        staged.append((s, lp))
    for h in range(head_group):
        v = v_ref[0][:, :, h * d : (h + 1) * d]
        vb = vb_ref[h]
        s, lp = staged[h]
        if const_shift:
            p = jnp.exp(s - SHIFT)
            pp = jnp.exp(lp - SHIFT)
        else:
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), lp)
            p = jnp.exp(s - m)
            pp = jnp.exp(lp - m)
        l = jnp.sum(p, axis=-1, keepdims=True) + pp
        ot = jax.lax.dot_general(
            v, p.astype(v.dtype), (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        vbn = jnp.broadcast_to(
            vb.astype(jnp.float32)[None, :, None], ot.shape[:2] + (1,)
        )
        ot += jax.lax.dot_general(
            vbn, pp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        inv = 1.0 / l
        inv_row = jax.lax.dot_general(
            jnp.ones((inv.shape[0], 1, 1), jnp.float32), inv,
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d : (h + 1) * d, :] = (ot * inv_row).astype(o_ref.dtype)


def edge_call(qkv, rel, sel, vb, kmask, const_shift=False):
    B_, n, R, _ = qkv.shape
    n_hg = HEADS // HG
    gd = HG * D
    kernel = functools.partial(_edge_kernel, SCALE, HG, D, n, const_shift)
    blk = lambda role: (lambda b, g: (b, 0, 0, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B_, n, HEADS * D, R), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B_, n_hg),
            in_specs=[
                pl.BlockSpec((1, n, R, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, HG * REL_LANES),
                             lambda b, g: (b, 0, 0, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, REL_LANES, R), lambda b, g: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HG, D), lambda b, g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 1, R), lambda b, g: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, n, gd, R), lambda b, g: (b, 0, g, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * HEADS * n * R * R * (2 * D + REL_LANES),
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=B_ * HEADS * n * R * R,
        ),
    )(qkv, qkv, qkv, rel, sel, vb, kmask)


def chained(call_fn, qkv, *rest):
    # Scalar dependency between reps serialises the calls without layout
    # work; the sum itself is ~40 us of HBM traffic, identical per variant.
    y = qkv
    out = None
    for _ in range(REPS):
        out = call_fn(y, *rest)
        y = qkv * (1.0 + 0.0 * jnp.sum(out).astype(qkv.dtype))
    return out


def main():
    rng = np.random.default_rng(0)

    # windows_s production shapes: BW = B*16 full windows, s-major rel
    BW = B * NWIN
    qkv_w = jnp.asarray(rng.standard_normal((BW, NW, 3 * DIM)) * 0.05, jnp.bfloat16)
    rel_w = jnp.asarray(rng.standard_normal((NW, BW, HEADS * 32)) * 0.05, jnp.bfloat16)
    sel32 = jnp.asarray((rng.random((32, NW)) > 0.5), jnp.bfloat16)

    f_cur = jax.jit(functools.partial(
        chained, functools.partial(
            fa.flash_qkv_packed_windows_s, scale=SCALE, heads=HEADS, d=D,
            head_group=HG)))
    o_cur = f_cur(qkv_w, rel_w, sel32)
    t = timeit(f_cur, qkv_w, rel_w, sel32)
    print(f"win cur (chained)        : {t:7.3f} ms/call", flush=True)

    for name, kw in [
        ("w1 const-shift      ", dict(const_shift=True)),
        ("w2 divfold           ", dict(divfold=True)),
        ("w3 shift+divfold     ", dict(const_shift=True, divfold=True)),
    ]:
        try:
            f = jax.jit(functools.partial(
                chained, functools.partial(ws_call, **kw)))
            o = f(qkv_w, rel_w, sel32)
            t = timeit(f, qkv_w, rel_w, sel32)
            print(f"win {name}: {t:7.3f} ms/call  err={err(o, o_cur):.2e}",
                  flush=True)
        except Exception as ex:
            print(f"win {name}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)

    # edge production shapes
    qkv_e = jnp.asarray(rng.standard_normal((B, NE, RE, 3 * DIM)) * 0.05,
                        jnp.bfloat16)
    rel_e = jnp.asarray(rng.standard_normal((B, NE, RE, HEADS * REL_LANES)) * 0.05,
                        jnp.bfloat16)
    sel_e = jnp.asarray((rng.random((NE, REL_LANES, RE)) > 0.7), jnp.float32)
    sel_e = sel_e.at[:, LPAD_LANE, :].set(0.0)
    vb = jnp.asarray(rng.standard_normal((HEADS, D)) * 0.05, jnp.float32)
    km = jnp.zeros((NE, 1, RE), jnp.float32).at[:, :, RE - 16 :].set(-1e30)

    f_ecur = jax.jit(functools.partial(
        chained, functools.partial(
            fa.flash_qkv_packed_edge, scale=SCALE, heads=HEADS, d=D,
            head_group=HG)))
    o_ecur = f_ecur(qkv_e, rel_e, sel_e, vb, km)
    t = timeit(f_ecur, qkv_e, rel_e, sel_e, vb, km)
    print(f"edge cur (chained)       : {t:7.3f} ms/call", flush=True)

    f_e1 = jax.jit(functools.partial(
        chained, functools.partial(edge_call, const_shift=True)))
    try:
        o = f_e1(qkv_e, rel_e, sel_e, vb, km)
        t = timeit(f_e1, qkv_e, rel_e, sel_e, vb, km)
        print(f"edge e1 const-shift      : {t:7.3f} ms/call  "
              f"err={err(o, o_ecur):.2e}", flush=True)
    except Exception as ex:
        print(f"edge e1 const-shift      : FAIL {type(ex).__name__}: {str(ex)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
