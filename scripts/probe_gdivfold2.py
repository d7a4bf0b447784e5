"""Bisect the divfold accuracy regression in the global kernel (on-chip).

verify_kernels_tpu.py: flash_qkv_packed_global err vs XLA ref went
<1e-4 (p/l normalisation) -> 6.55e-4 (1/l folded into the d-major output).
Variants, all compared against the same f32-softmax XLA reference:

  v0  p/l normalisation of the probability matrix (the old formulation)
  v1  ot * (1.0/l)                 (landed fold)
  v2  ot / l                       (explicit divide on the output)
  v3  ot * refined reciprocal      (one Newton step on 1/l)
  v4  fold but p cast to f32 dot   (isolate bf16-p rounding from the fold)

Run on the real chip: python scripts/probe_gdivfold2.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from camouflaged_vlm_tpu.ops import flash_attention as fa

HEADS, D = 16, 80
DIM = HEADS * D
NG, H, W = 4096, 64, 64
HW = 128
HG = 8
SCALE = D ** -0.5


def err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def _g_kernel(scale, head_group, d, H_, W_, mode,
              q_ref, k_ref, v_ref, rel_ref, o_ref):
    N = k_ref.shape[1]
    block_q = q_ref.shape[1]
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]
        v = v_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[:, 0, h, :]
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        relT = jnp.transpose(rel).astype(o_ref.dtype)
        bh = relT[0:H_]
        bw = relT[H_ : H_ + W_]
        BhT = jnp.broadcast_to(bh[:, None, :], (H_, W_, block_q)).reshape(N, block_q)
        BwT = jnp.broadcast_to(bw[None, :, :], (H_, W_, block_q)).reshape(N, block_q)
        sT = sT + BhT.astype(jnp.float32) + BwT.astype(jnp.float32)
        p = fa._shift_exp(sT)
        l = jnp.sum(p, axis=0, keepdims=True)
        if mode == "v0":
            pn = (p / l).astype(v.dtype)
            ot = jax.lax.dot_general(
                v, pn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        elif mode in ("v1", "v2", "v3"):
            ot = jax.lax.dot_general(
                v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode == "v1":
                ot = ot * (1.0 / l)
            elif mode == "v2":
                ot = ot / l
            else:
                r = 1.0 / l
                r = r * (2.0 - l * r)
                ot = ot * r
        elif mode == "v4":
            ot = jax.lax.dot_general(
                v.astype(jnp.float32), p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ot = ot * (1.0 / l)
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def g_call(qkv, rel, mode, block_q=512):
    Bq, N, _ = qkv.shape
    n_hg = HEADS // HG
    gd = HG * D
    kernel = functools.partial(_g_kernel, SCALE, HG, D, H, W, mode)
    blk = lambda role: (lambda b, g, i: (b, i, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bq, HEADS * D, N), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(Bq, n_hg, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, 2 * n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, 1, HG, HW),
                             lambda b, g, i: (i, b, g, 0),
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
    )(qkv, qkv, qkv, rel)


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    qkv = jnp.asarray(rng.standard_normal((2, NG, 3 * DIM)) * 0.2, dt)
    rel = jnp.asarray(rng.standard_normal((NG, 2, HEADS, HW)) * 0.05, dt)
    sel = fa.make_rel_scatter(64, 64)

    def glob_ref(qkv, rel):
        r = qkv.reshape(2, NG, 3, HEADS, D)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * SCALE
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)
        relh = rel.transpose(1, 2, 0, 3)
        o = fa.xla_attention_relpos(q, k, v, relh, sel)
        return o.transpose(0, 1, 3, 2).reshape(2, HEADS * D, NG)

    ref = jax.jit(glob_ref)(qkv, rel)

    for mode in ["v0", "v1", "v2", "v3", "v4"]:
        o = jax.jit(functools.partial(g_call, mode=mode))(qkv, rel)
        print(f"{mode}: err vs ref = {err(o, ref):.2e}", flush=True)


if __name__ == "__main__":
    main()
