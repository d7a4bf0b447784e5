"""Probe round-3 attention-kernel restructures at production ViT-H shapes.

Trace arithmetic (BENCH_r03 trace, batch 8) shows the windowed kernels spend
~4 us/program regardless of program size (full 196-row and edge 112-row
programs cost the same) -> per-program stalls, not FLOPs, dominate. Probes:

  A. full windows: win_group sweep {1,2,4,8,16} on flash_qkv_packed_windows
     (wg windows ride the dot batch dim -> 16x fewer programs at wg=16)
  B. edge windows: batch all 9 windows into one program (grid (B, n_hg)),
     with staged scores like the full kernel
  C. global: staggered head pipeline (score dot of head h+1 issues before
     softmax+pv of head h -> MXU/VPU overlap) + 1/l folded into the (d, bq)
     d-major output instead of dividing the (bq, N) probability matrix
     (50x fewer divides), block_q sweep {512, 1024}

Run on the real chip: python scripts/probe_attn_v3.py
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
DIM = HEADS * D  # 1280
NWIN, NW = 16, 196           # full 14x14 windows
NE, RE = 9, 112              # edge windows (compact layout)
NG, HW = 4096, 128           # global
HG = 8


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


# ---------------------------------------------------------------- B: edge
def _edge_batched_kernel(scale, head_group, d, n,
                         q_ref, k_ref, v_ref, rel_ref, sel_ref, vb_ref, km_ref, o_ref):
    # All n edge windows ride the dot batch dim; staged scores; 1/l folded
    # into the (n, d, R) output columns.
    sel = sel_ref[:]   # (n, REL_LANES, R)
    km = km_ref[:]     # (n, 1, R)
    staged = []
    for h in range(head_group):
        q = q_ref[0][:, :, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, :, h * d : (h + 1) * d]       # (n, R, d)
        rel = rel_ref[0][:, :, h * REL_LANES : (h + 1) * REL_LANES]  # (n, R, 32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (n, R, R)
        s += jax.lax.dot_general(
            rel, sel.astype(rel.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s += km
        lp = rel[:, :, LPAD_LANE : LPAD_LANE + 1].astype(jnp.float32)  # (n, R, 1)
        staged.append((s, lp))
    for h in range(head_group):
        v = v_ref[0][:, :, h * d : (h + 1) * d]  # (n, R, d)
        vb = vb_ref[h]  # (d,)
        s, lp = staged[h]
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), lp)
        p = jnp.exp(s - m)
        pp = jnp.exp(lp - m)                      # (n, R, 1)
        l = jnp.sum(p, axis=-1, keepdims=True) + pp
        ot = jax.lax.dot_general(
            v, p.astype(v.dtype), (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (n, d, R)
        vbn = jnp.broadcast_to(vb.astype(jnp.float32)[None, :, None], ot.shape[:2] + (1,))
        ot += jax.lax.dot_general(
            vbn, pp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # fold 1/l into the d-major output: (n, d, R) * (n, 1, R); the
        # (n,R,1)->(n,1,R) move rides a batched K=1 dot (a transpose would be
        # a Mosaic relayout)
        inv = 1.0 / l  # (n, R, 1)
        inv_row = jax.lax.dot_general(
            jnp.ones((inv.shape[0], 1, 1), jnp.float32), inv,
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )  # (n, 1, R)
        ot = ot * inv_row
        o_ref[0, :, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def edge_batched(qkv, rel, sel, vb, kmask, scale, heads, d, head_group=HG):
    Bq, n, R, _ = qkv.shape
    n_hg = heads // head_group
    gd = head_group * d
    kernel = functools.partial(_edge_batched_kernel, scale, head_group, d, n)
    blk = lambda role: (lambda b, g: (b, 0, 0, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bq, n, heads * d, R), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(Bq, n_hg),
            in_specs=[
                pl.BlockSpec((1, n, R, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, head_group * REL_LANES),
                             lambda b, g: (b, 0, 0, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, REL_LANES, R), lambda b, g: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((head_group, d), lambda b, g: (g, 0),
                             memory_space=pltpu.VMEM),
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
            flops=2 * Bq * heads * n * R * R * (2 * d + REL_LANES),
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=Bq * heads * n * R * R,
        ),
    )(qkv, qkv, qkv, rel, sel, vb, kmask)


# -------------------------------------------------------------- C: global
def _global_stagger_kernel(scale, head_group, d, hw, divfold,
                           q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    sel = sel_ref[:]  # (hw, N)

    def score(h):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[0][:, h * hw : (h + 1) * hw]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s += jax.lax.dot(rel, sel, preferred_element_type=jnp.float32)
        return s

    def emit(h, s):
        v = v_ref[0][:, h * d : (h + 1) * d]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        if divfold:
            ot = jax.lax.dot_general(
                v, p.astype(v.dtype), (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, block_q)
            inv_row = jax.lax.dot_general(
                jnp.ones((1, 1), jnp.float32), 1.0 / l,
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # (1, block_q) via K=1 dot (no (bq,1)->(1,bq) relayout)
            ot = ot * inv_row
        else:
            p = (p / l).astype(v.dtype)
            ot = jax.lax.dot_general(
                v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)

    prev = None
    for h in range(head_group):
        s = score(h)
        if prev is not None:
            emit(prev[0], prev[1])
        prev = (h, s)
    emit(prev[0], prev[1])


def global_stagger(qkv, rel, sel, scale, heads, d, block_q=1024, head_group=HG,
                   divfold=True):
    Bq, N, _ = qkv.shape
    hw = sel.shape[0]
    n_hg = heads // head_group
    gd = head_group * d
    kernel = functools.partial(_global_stagger_kernel, scale, head_group, d, hw, divfold)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bq, heads * d, N), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(Bq, n_hg, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, gd), lambda b, g, i: (b, i, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, 2 * n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, head_group * hw),
                             lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((hw, N), lambda b, g, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, gd, block_q), lambda b, g, i: (b, g, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bq * heads * N * N * (2 * d + hw),
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=Bq * heads * N * N,
        ),
    )(qkv, qkv, qkv, rel, sel)


def main():
    rng = np.random.default_rng(0)
    results = {}

    # ---------------- A. full windows: win_group sweep ----------------
    qkv_w = jnp.asarray(rng.standard_normal((B, NWIN, NW, 3 * DIM)) * 0.05, jnp.bfloat16)
    rel_w = jnp.asarray(rng.standard_normal((B, NWIN, NW, HEADS * 32)) * 0.05, jnp.bfloat16)
    sel32 = jnp.asarray((rng.random((32, NW)) > 0.5), jnp.bfloat16)
    scale = D ** -0.5

    base = None
    for wg in (1, 2, 4, 8, 16):
        f = jax.jit(functools.partial(
            fa.flash_qkv_packed_windows, scale=scale, heads=HEADS, d=D,
            head_group=HG, win_group=wg))
        try:
            t = timeit(f, qkv_w, rel_w, sel32)
            o = f(qkv_w, rel_w, sel32)
            if base is None:
                base = o
            e = err(o, base)
            print(f"win full wg={wg:2d}: {t:7.3f} ms  err={e:.2e}", flush=True)
            results[f"win_wg{wg}"] = t
        except Exception as ex:
            print(f"win full wg={wg:2d}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)

    # ---------------- B. edge windows: batched ----------------
    qkv_e = jnp.asarray(rng.standard_normal((B, NE, RE, 3 * DIM)) * 0.05, jnp.bfloat16)
    rel_e = jnp.asarray(rng.standard_normal((B, NE, RE, HEADS * REL_LANES)) * 0.05,
                        jnp.bfloat16)
    sel_e = jnp.asarray((rng.random((NE, REL_LANES, RE)) > 0.7), jnp.float32)
    # zero the LPAD row of sel like edge_consts does
    sel_e = sel_e.at[:, LPAD_LANE, :].set(0.0)
    vb = jnp.asarray(rng.standard_normal((HEADS, D)) * 0.05, jnp.float32)
    km = jnp.zeros((NE, 1, RE), jnp.float32)
    km = km.at[:, :, RE - 16 :].set(-1e30)  # pretend last 16 cols are dummies

    f_cur = jax.jit(functools.partial(
        fa.flash_qkv_packed_edge, scale=scale, heads=HEADS, d=D, head_group=HG))
    t = timeit(f_cur, qkv_e, rel_e, sel_e, vb, km)
    o_cur = f_cur(qkv_e, rel_e, sel_e, vb, km)
    print(f"edge current  : {t:7.3f} ms", flush=True)
    results["edge_cur"] = t

    f_b = jax.jit(functools.partial(
        edge_batched, scale=scale, heads=HEADS, d=D, head_group=HG))
    try:
        t = timeit(f_b, qkv_e, rel_e, sel_e, vb, km)
        o_b = f_b(qkv_e, rel_e, sel_e, vb, km)
        print(f"edge batched  : {t:7.3f} ms  err={err(o_b, o_cur):.2e}", flush=True)
        results["edge_batched"] = t
    except Exception as ex:
        print(f"edge batched  : FAIL {type(ex).__name__}: {str(ex)[:300]}", flush=True)

    # ---------------- C. global: stagger + divfold ----------------
    qkv_g = jnp.asarray(rng.standard_normal((B, NG, 3 * DIM)) * 0.05, jnp.bfloat16)
    rel_g = jnp.asarray(rng.standard_normal((NG, B, HEADS, HW)) * 0.05, jnp.bfloat16)  # s-major (rel-v2)
    sel_g = jnp.asarray((rng.random((HW, NG)) > 0.5), jnp.bfloat16)

    f_cur = jax.jit(functools.partial(
        fa.flash_qkv_packed_global, scale=scale, heads=HEADS, d=D,
        block_q=1024, head_group=HG))
    t = timeit(f_cur, qkv_g, rel_g, sel_g)
    o_curg = f_cur(qkv_g, rel_g, sel_g)
    print(f"glob current bq1024     : {t:7.3f} ms", flush=True)
    results["glob_cur"] = t

    for bq in (512, 1024):
        for dfold in (True, False):
            f_s = jax.jit(functools.partial(
                global_stagger, scale=scale, heads=HEADS, d=D, block_q=bq,
                head_group=HG, divfold=dfold))
            try:
                t = timeit(f_s, qkv_g, rel_g, sel_g)
                o_s = f_s(qkv_g, rel_g, sel_g)
                print(f"glob stagger bq{bq} divfold={int(dfold)}: {t:7.3f} ms  "
                      f"err={err(o_s, o_curg):.2e}", flush=True)
                results[f"glob_st_bq{bq}_df{int(dfold)}"] = t
            except Exception as ex:
                print(f"glob stagger bq{bq} divfold={int(dfold)}: FAIL "
                      f"{type(ex).__name__}: {str(ex)[:300]}", flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
