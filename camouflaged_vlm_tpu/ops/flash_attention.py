"""Pallas flash attention for the SAM ViT blocks (windowed AND global).

All rel-pos kernels share one formulation: the ViTDet decomposed bias is
regenerated INSIDE the kernel from its rank structure
(`bias[q,k] = rel_h[q, k//W] + rel_w[q, k%W]`,
`/root/reference/models/mmseg/models/sam/image_encoder.py:589-625`): the
caller passes `rel = [rel_h | rel_w]` (seq x (H+W)) and the kernel adds the
bias to the q@k^T scores — the windowed kernels via one extra MXU matmul
against a constant 0/1 scatter `sel` ((H+W) x seq), the global kernel via
two VPU sublane broadcasts of the transposed rel tile over TRANSPOSED
score tiles (`_qkv_packed_global_kernel`; at hw == 128 the scatter dot was
more MXU work than q@k itself). Either way no seq x seq bias ever
materialises in HBM.

Production kernels (read q/k/v as static lane slices of the RAW packed qkv
projection — no head transpose/pad ever materialises):

  * `flash_qkv_packed_windows` — 14x14 windowed blocks, `win_group` windows
    per program riding the matmul batch dim;
  * `flash_qkv_packed_global`  — 4096-token global blocks, q tiled;
  * `flash_qkv_packed_plain`   — no-bias sibling for the CLIP towers.

Fallback/ablation kernels: `flash_qkv_relpos_windows` (5D head view, for
windows whose H+W exceeds the 32-lane packing), `flash_attention_relpos`
(q/k/v split + padded, used by the non-fused 'flash' CPU/odd-head path),
`flash_qkv_relpos_global`, and `flash_attention_fullk` over pre-augmented
features (ops/aug_attention.py).

At <=4096 tokens the whole K/V fit comfortably in VMEM (K 4096x128 bf16 =
1 MB), so instead of online softmax over KV tiles we tile ONLY the query
dimension and compute each row's softmax exactly in one shot — simpler,
exact, and the (block_q x seq) score tile (128x4096 fp32 = 2 MB) never
touches HBM. The XLA path materialises (B, heads, seq, seq) logits+probs in
HBM (4.3 GB at batch 4 global; ~1 GB per windowed block at batch 8).

Grid: (B*heads[*windows], seq/block_q) — both parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vjp import on_cpu as _on_cpu, pallas_with_xla_vjp

# Packed-lane kernels slice head groups out of the raw qkv projection; the
# slices must land on hardware lane-tile boundaries. Module-level so tests
# can shrink it to exercise the kernels in interpret mode on tiny shapes.
_LANE_ALIGN = 128

# Constant softmax shift for the global kernel (see _qkv_packed_global_kernel):
# exact as long as each score column's max stays within (SHIFT - 87, SHIFT + 88)
# — f32 exp over/underflow bounds. LN'd ViT logits measure |s| < 30.
_SOFTMAX_SHIFT = 20.0

# NaN guard for the const-shift kernels: clamp exp's argument to ±_EXP_CLAMP.
# Inside (SHIFT-80, SHIFT+80) — which contains the measured |s| < 30 band
# with huge margin — clip is the IDENTITY, so production numerics are
# bit-unchanged (scripts/probe_softclamp.py: perf-neutral, err 0.0e+0).
# Outside it (a diverging run, an LR spike) the unguarded exp overflows to
# inf and p/l = inf/inf = NaN — silently, and only on the TPU kernel path,
# since the XLA ref/VJP keeps max-subtract; with the clamp the probabilities
# saturate but stay FINITE, so divergence surfaces in the loss instead of as
# a kernel-path-only NaN that CPU repros can't reproduce.
_EXP_CLAMP = 80.0


def _shift_exp(s):
    """exp(s - _SOFTMAX_SHIFT) with the argument clamped to f32's finite
    band. Used identically by every const-shift forward AND backward kernel
    so recomputed probabilities match the forward bit-for-bit."""
    return jnp.exp(jnp.clip(s - _SOFTMAX_SHIFT, -_EXP_CLAMP, _EXP_CLAMP))



def _relpos_kernel(q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    q = q_ref[0]      # (block_q, d) — pre-scaled
    k = k_ref[0]      # (seq, d)
    v = v_ref[0]      # (seq, d_v)
    rel = rel_ref[0]  # (block_q, H+W) — [rel_h | rel_w] for these q rows
    sel = sel_ref[:]  # (H+W, seq) 0/1: scatter rel columns onto key positions
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, seq)
    s += jax.lax.dot(rel, sel, preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o_ref[0] = jax.lax.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def make_rel_scatter(H: int, W: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """((H+W), H*W) 0/1 matrix: row a scatters rel_h[:, a] to keys with
    k//W == a (first H rows) / rel_w[:, b] to keys with k%W == b (last W).
    Built in numpy so it embeds as a literal constant in the program."""
    import numpy as np

    n = H * W
    kh = np.arange(n) // W
    kw = np.arange(n) % W
    sel_h = kh[None, :] == np.arange(H)[:, None]
    sel_w = kw[None, :] == np.arange(W)[:, None]
    return jnp.asarray(np.concatenate([sel_h, sel_w], axis=0), dtype)


def xla_attention_relpos(
    q: jnp.ndarray,    # (..., N, d) — pre-scaled
    k: jnp.ndarray,    # (..., N, d)
    v: jnp.ndarray,    # (..., N, d_v)
    rel: jnp.ndarray,  # (..., N, H+W)
    sel: jnp.ndarray,  # (H+W, N)
) -> jnp.ndarray:
    """XLA equivalent of `flash_attention_relpos` (CPU/tests fallback)."""
    s = jnp.einsum("...qc,...kc->...qk", q, k, preferred_element_type=jnp.float32)
    s = s + jnp.einsum(
        "...qr,rk->...qk", rel, sel.astype(rel.dtype),
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "...qk,...kc->...qc", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_attention_relpos(
    q: jnp.ndarray,    # (B, N, d) — pre-scaled by sm_scale
    k: jnp.ndarray,    # (B, N, d)
    v: jnp.ndarray,    # (B, N, d_v)
    rel: jnp.ndarray,  # (B, N, H+W) — [rel_h | rel_w] per query
    sel: jnp.ndarray,  # (H+W, N) from make_rel_scatter
    block_q: int = 512,
) -> jnp.ndarray:
    B, N, d = q.shape
    d_v = v.shape[-1]
    hw = rel.shape[-1]
    if N % block_q != 0:
        block_q = N  # small (windowed) sequences: one q tile
    grid = (B, N // block_q)
    run = lambda q, k, v, rel, sel: pl.pallas_call(
        _relpos_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, d_v), v.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, d_v), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, hw), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hw, N), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d_v), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * (d + d_v + hw),
            bytes_accessed=(q.size + k.size + v.size + rel.size) * 2 + sel.size * 2,
            transcendentals=B * N * N,
        ),
    )(q, k, v, rel, sel)
    return pallas_with_xla_vjp(run, xla_attention_relpos)(q, k, v, rel, sel)


def _qkv_relpos_windows_kernel(scale, head_group, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    # Per-head loop with the WINDOW axis as the (single, leading) matmul
    # batch dim — Mosaic's tpu.matmul supports exactly one batch dim and it
    # must lead; batching several windows per dot keeps the MXU fed (a bare
    # (196, 80) matmul measured 13 TFLOP/s). The bias term contracts rel
    # against the constant scatter with NO batch dims (free dims compose),
    # so it lowers as one (wg*Nw, hw) x (hw, Nw) matmul.
    sel = sel_ref[:]  # (hw, Nw)
    for h in range(head_group):
        q = q_ref[0, :, :, h, :] * jnp.asarray(scale, q_ref.dtype)  # (wg, Nw, d)
        k = k_ref[0, :, :, h, :]
        v = v_ref[0, :, :, h, :]
        rel = rel_ref[0, :, :, h, :]  # (wg, Nw, hw)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (wg, Nw, Nw)
        s += jax.lax.dot_general(
            rel, sel, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (wg, Nw, Nw)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (wg, Nw, d)
        # store indexes LEADING axes only (mid-axis unit-dim stores hit an
        # unsupported Mosaic vector reshape)
        o_ref[0, h] = o.astype(o_ref.dtype)


def flash_qkv_relpos_windows(
    qkv: jnp.ndarray,  # (B, nwin, Nw, 3*heads, d) — 5D view of the packed Dense
    rel: jnp.ndarray,  # (B, nwin, Nw, heads, H+W) — [rel_h | rel_w] per query
    sel: jnp.ndarray,  # (H+W, Nw) from make_rel_scatter
    scale: float,
    win_group: int = 5,
    head_group: int = 8,
) -> jnp.ndarray:
    """Windowed rel-pos attention straight off the packed qkv projection.

    The qkv Dense output is passed as a free 5D reshape (trailing-dim split);
    head/role selection happens via BlockSpec index maps on the head axis
    (blocks of `head_group`, Mosaic-tileable since 8 | head_group), so NO
    transpose/pad/copy of the ~300 MB qkv tensor ever materialises (the XLA
    formulation spent ~4 ms/block on those). One program covers `win_group`
    windows x `head_group` heads. Output lands head-leading as
    (B, heads, nwin, Nw, d) — exactly what `proj_from_heads` consumes.
    """
    B, nwin, Nw, three_heads, d = qkv.shape
    heads = three_heads // 3
    hw = sel.shape[0]
    if nwin % win_group != 0:
        win_group = nwin
    if heads % head_group != 0:
        head_group = heads  # tests/tiny shapes (TPU callers gate on 8 | heads)
    n_hg = heads // head_group
    kernel = functools.partial(_qkv_relpos_windows_kernel, scale, head_group)
    blk = lambda role: (
        lambda b, w, g: (b, w, 0, role * n_hg + g, 0)
    )

    def ref(qkv, rel, sel):
        # (B, nwin, Nw, 3*heads, d) -> head-leading attention via XLA
        q = jnp.moveaxis(qkv[:, :, :, :heads], 3, 1) * jnp.asarray(scale, qkv.dtype)
        k = jnp.moveaxis(qkv[:, :, :, heads : 2 * heads], 3, 1)
        v = jnp.moveaxis(qkv[:, :, :, 2 * heads :], 3, 1)
        relh = jnp.moveaxis(rel, 3, 1)  # (B, heads, nwin, Nw, hw)
        return xla_attention_relpos(q, k, v, relh, sel)

    if _on_cpu():
        # like every other kernel wrapper: degrade to the XLA reference on
        # CPU (fused_attention_enabled no longer excludes the CPU backend)
        return ref(qkv, rel, sel)

    run = lambda qkv, rel, sel: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, heads, nwin, Nw, d), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nwin // win_group, n_hg),
            in_specs=[
                pl.BlockSpec((1, win_group, Nw, head_group, d), blk(0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, head_group, d), blk(1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, head_group, d), blk(2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, head_group, hw),
                             lambda b, w, g: (b, w, 0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hw, Nw), lambda b, w, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, head_group, win_group, Nw, d),
                lambda b, w, g: (b, g, w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * nwin * Nw * Nw * (2 * d + hw),
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=B * heads * nwin * Nw * Nw,
        ),
    )(qkv, qkv, qkv, rel, sel)
    return pallas_with_xla_vjp(run, ref)(qkv, rel, sel)


def _qkv_packed_windows_kernel(scale, head_group, d, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    # Packed-lane variant: q/k/v arrive as (wg, Nw, head_group*d) straight off
    # the qkv projection (no 5D lane-padded view -> no 60%-inflated HBM
    # reshape); heads are peeled with static lane slices in VMEM; `wg` windows
    # ride the dot's (single, leading) batch dim so the MXU pipelines several
    # small (Nw, d) matmuls per issue. rel arrives padded to 32 lanes/head so
    # its slices stay tile-aligned; sel has 32 rows (4 zero).
    #
    # All heads' score dots are STAGED before any softmax+pv: issuing the
    # MXU dots back-to-back lets the scheduler overlap them with the VPU
    # softmaxes of other heads (measured ~9% kernel win; the per-head
    # interleaved order serialised MXU<->VPU).
    sel = sel_ref[:]  # (32, Nw)
    scores = []
    for h in range(head_group):
        q = q_ref[0][:, :, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, :, h * d : (h + 1) * d]   # (wg, Nw, d)
        rel = rel_ref[0][:, :, h * 32 : (h + 1) * 32]  # (wg, Nw, 32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (wg, Nw, Nw)
        s += jax.lax.dot_general(
            rel, sel, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores.append(s)
    for h in range(head_group):
        v = v_ref[0][:, :, h * d : (h + 1) * d]
        s = scores[h]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        # d-major output: o^T = v^T p^T issued directly as one dot (contract
        # the key axis of both operands) and stored at sublane offset h*d —
        # the head-leading layout's 80-lane minor padded to 128 in HBM
        # (+60% bytes) and capped the consuming projection at ~114 TF/s
        # (scripts/probe_dmajor.py)
        ot = jax.lax.dot_general(
            v, p, (((1,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (wg, d, Nw)
        o_ref[0, :, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def flash_qkv_packed_windows(
    qkv: jnp.ndarray,  # (B, nwin, Nw, 3*heads*d) — bitcast view of the Dense out
    rel: jnp.ndarray,  # (B, nwin, Nw, heads*32) — [rel_h | rel_w | 0-pad] per head
    sel32: jnp.ndarray,  # (32, Nw): make_rel_scatter padded with zero rows
    scale: float,
    heads: int,
    d: int,
    head_group: int = 8,
    win_group: int = 1,
) -> jnp.ndarray:
    """Windowed rel-pos attention on the UNPADDED packed qkv layout.

    The (…, 3*heads, d) 5D view used by `flash_qkv_relpos_windows` lane-pads
    d=80 -> 128 in HBM, which XLA materialises as a 40+28 ms reshape pair per
    batch-8 encoder pass. Here blocks slice 640-lane (= head_group*d) chunks
    of the raw 3840-lane tensor (640 % 128 == 0, so Mosaic-tileable with no
    physical padding), heads are peeled with static lane slices in VMEM, and
    `win_group` windows ride the matmul batch dim. Output is d-major
    (B, nwin, heads*d, Nw) for `proj_rows` (no 80->128 lane pad in HBM).
    """
    B, nwin, Nw, _ = qkv.shape
    if heads % head_group != 0:
        head_group = heads  # tests/tiny shapes (TPU callers gate on 8 | heads)
    if nwin % win_group != 0:
        win_group = 1
    n_hg = heads // head_group
    gd = head_group * d
    kernel = functools.partial(_qkv_packed_windows_kernel, scale, head_group, d)
    blk = lambda role: (lambda b, w, g: (b, w, 0, role * n_hg + g))

    def ref(qkv, rel, sel32):
        r = qkv.reshape(B, nwin, Nw, 3, heads, d)
        q = jnp.moveaxis(r[:, :, :, 0], 3, 1) * jnp.asarray(scale, qkv.dtype)
        k = jnp.moveaxis(r[:, :, :, 1], 3, 1)
        v = jnp.moveaxis(r[:, :, :, 2], 3, 1)
        relh = jnp.moveaxis(rel.reshape(B, nwin, Nw, heads, 32), 3, 1)
        o = xla_attention_relpos(q, k, v, relh, sel32)  # (B, heads, nwin, Nw, d)
        return jnp.moveaxis(o, 1, 2).transpose(0, 1, 2, 4, 3).reshape(
            B, nwin, heads * d, Nw
        )

    if gd % _LANE_ALIGN != 0 or _on_cpu():
        # The packed layout needs lane-aligned head-group slices; rather than
        # silently widening head_group past the alignment contract, use the
        # XLA formulation (only tiny/test shapes and CPU land here).
        return ref(qkv, rel, sel32)

    run = lambda qkv, rel, sel32: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nwin, heads * d, Nw), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nwin // win_group, n_hg),
            in_specs=[
                pl.BlockSpec((1, win_group, Nw, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, head_group * 32),
                             lambda b, w, g: (b, w, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((32, Nw), lambda b, w, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, win_group, gd, Nw),
                lambda b, w, g: (b, w, g, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * nwin * Nw * Nw * (2 * d + 32),
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=B * heads * nwin * Nw * Nw,
        ),
    )(qkv, qkv, qkv, rel, sel32)
    return pallas_with_xla_vjp(run, ref)(qkv, rel, sel32)


def _qkv_packed_windows_s_kernel(
    scale, head_group, d, wb, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref
):
    # s-major sibling of `_qkv_packed_windows_kernel`: rel arrives
    # POSITION-major (Nw, wb, head_group*32) — the layout the kron-table rel
    # einsum emits natively (see `rel_smajor_windows`), so the pathological
    # 32-lane transposing copy + merge reshape the window-major layout cost
    # (~13 ms/iter at batch 8) never materialises. `wb` windows per program
    # amortise the per-program grid stalls; within each window all head score
    # dots are staged before any softmax+pv (MXU/VPU overlap, see the
    # window-major kernel).
    sel = sel_ref[:]  # (32, Nw)
    for wi in range(wb):
        scores = []
        for h in range(head_group):
            q = q_ref[0, wi][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
            k = k_ref[0, wi][:, h * d : (h + 1) * d]   # (Nw, d)
            rel = rel_ref[:, wi, h * 32 : (h + 1) * 32]  # (Nw, 32) sublane select
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (Nw, Nw)
            s += jax.lax.dot(
                rel.astype(q.dtype), sel, preferred_element_type=jnp.float32
            )
            scores.append(s)
        for h in range(head_group):
            v = v_ref[0, wi][:, h * d : (h + 1) * d]
            s = scores[h]
            # constant-shift softmax (see _SOFTMAX_SHIFT / the global kernel):
            # drops the (Nw, Nw) max reduce+subtract on the MXU->VPU critical
            # path — scripts/probe_wsoft.py: 2.546 -> 2.243 ms per windowed
            # block at batch 8 (-12%)
            p = _shift_exp(s)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(v.dtype)
            # d-major output (see _qkv_packed_windows_kernel)
            ot = jax.lax.dot_general(
                v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (d, Nw)
            o_ref[0, wi, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def _qkv_packed_windows_s_bwd_kernel(
    scale, head_group, d, wb,
    q_ref, k_ref, v_ref, rel_ref, sel_ref, g_ref,
    dq_ref, dk_ref, dv_ref, drel_ref,
):
    # Flash-style attention BACKWARD for the windowed s-major kernel: scores
    # and probabilities are recomputed per window in VMEM (never hitting
    # HBM), and every gradient dot is oriented so its natural output is
    # d-major / transposed — no in-kernel transposes, all stores at aligned
    # sublane offsets. The XLA-autodiff backward this replaces materialised
    # every window's probability matrix in HBM and ran at ~20 TF/s
    # (scripts/trace_train.py: windowed-attn backward was 163 ms of the
    # 531 ms batch-2 train step).
    #
    #   dV^T = g^T P           dP = g^T·v      t = Σ_k dP∘P
    #   dS = P∘(dP − t)        dq^T = k^T dS^T·scale   dk^T = q^T dS·scale
    #   drel^T = sel·dS^T
    sel = sel_ref[:]  # (32, Nw)
    for wi in range(wb):
        for h in range(head_group):
            q = q_ref[0, wi][:, h * d : (h + 1) * d]   # (Nw, d)
            k = k_ref[0, wi][:, h * d : (h + 1) * d]
            v = v_ref[0, wi][:, h * d : (h + 1) * d]
            rel = rel_ref[:, wi, h * 32 : (h + 1) * 32]  # (Nw, 32)
            gT = g_ref[0, wi][h * d : (h + 1) * d, :]    # (d, Nw) d-major grad
            qs = q * jnp.asarray(scale, q.dtype)
            s = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s += jax.lax.dot(
                rel.astype(q.dtype), sel, preferred_element_type=jnp.float32
            )
            p = _shift_exp(s)
            l = jnp.sum(p, axis=-1, keepdims=True)
            P = p / l                      # (Nw_q, Nw_k) f32
            Pb = P.astype(q.dtype)
            dvT = jax.lax.dot_general(    # (d, Nw_k)
                gT, Pb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dP = jax.lax.dot_general(     # (Nw_q, Nw_k)
                gT, v, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            t = jnp.sum(dP * P, axis=-1, keepdims=True)
            dSb = (P * (dP - t)).astype(q.dtype)
            dqT = jax.lax.dot_general(    # (d, Nw_q)
                k, dSb, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            dkT = jax.lax.dot_general(    # (d, Nw_k)
                q, dSb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            drelT = jax.lax.dot_general(  # (32, Nw_q)
                sel, dSb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            dq_ref[0, wi, h * d : (h + 1) * d, :] = dqT.astype(dq_ref.dtype)
            dk_ref[0, wi, h * d : (h + 1) * d, :] = dkT.astype(dk_ref.dtype)
            dv_ref[0, wi, h * d : (h + 1) * d, :] = dvT.astype(dv_ref.dtype)
            drel_ref[0, wi, h * 32 : (h + 1) * 32, :] = drelT.astype(drel_ref.dtype)


def flash_qkv_packed_windows_s(
    qkv: jnp.ndarray,    # (BW, Nw, 3*heads*d) — flat windows, raw Dense out
    rel_s: jnp.ndarray,  # (Nw, BW, heads*32) — POSITION-major packed rel
    sel32: jnp.ndarray,  # (32, Nw): make_rel_scatter padded with zero rows
    scale: float,
    heads: int,
    d: int,
    head_group: int = 8,
    win_block: int = 8,
) -> jnp.ndarray:
    """`flash_qkv_packed_windows` with position-major rel (scripts/
    probe_relv2.py: 4.30 -> 3.88 ms per ViT-H windowed block at batch 8,
    err 1e-3 ~ bf16 rounding).

    The window-major rel layout forced XLA to transpose the rel einsum's
    natural (S, BW, lanes) output into (BW, S, lanes) — an 8.5 ms
    pathological 32-lane-minor copy plus a 4.7 ms merge reshape per encoder
    pass. Here the kernel consumes the einsum's native layout: rel blocks
    are (Nw, win_block, head_group*32) sublane-selected per window. The
    sublane dim (win_block) must be a multiple of 8 for tiling — callers
    gate on BW % win_block == 0. Output is d-major (BW, heads*d, Nw)."""
    BW, Nw, _ = qkv.shape
    if heads % head_group != 0:
        head_group = heads
    n_hg = heads // head_group
    gd = head_group * d

    def ref(qkv, rel_s, sel32):
        r = qkv.reshape(BW, Nw, 3, heads, d)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * jnp.asarray(scale, qkv.dtype)
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)  # (BW, heads, Nw, d)
        relh = rel_s.reshape(Nw, BW, heads, 32).transpose(1, 2, 0, 3)
        o = xla_attention_relpos(q, k, v, relh, sel32)  # (BW, heads, Nw, d)
        return o.transpose(0, 1, 3, 2).reshape(BW, heads * d, Nw)

    if gd % _LANE_ALIGN != 0 or BW % win_block != 0 or _on_cpu():
        return ref(qkv, rel_s, sel32)

    nb = BW // win_block
    kernel = functools.partial(
        _qkv_packed_windows_s_kernel, scale, head_group, d, win_block
    )
    blk = lambda role: (lambda b, g: (b, 0, 0, role * n_hg + g))

    run = lambda qkv, rel_s, sel32: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, win_block, heads * d, Nw), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(nb, n_hg),
            in_specs=[
                pl.BlockSpec((1, win_block, Nw, gd), blk(0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_block, Nw, gd), blk(1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_block, Nw, gd), blk(2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Nw, win_block, head_group * 32),
                             lambda b, g: (0, b, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, Nw), lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
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
            flops=2 * BW * heads * Nw * Nw * (2 * d + 32),
            bytes_accessed=qkv.size * 2 + rel_s.size * 2,
            transcendentals=BW * heads * Nw * Nw,
        ),
    )(
        qkv.reshape(nb, win_block, Nw, 3 * heads * d),
        qkv.reshape(nb, win_block, Nw, 3 * heads * d),
        qkv.reshape(nb, win_block, Nw, 3 * heads * d),
        rel_s,
        sel32,
    ).reshape(BW, heads * d, Nw)

    bwd_kernel = functools.partial(
        _qkv_packed_windows_s_bwd_kernel, scale, head_group, d, win_block
    )

    def run_bwd(qkv, rel_s, sel32, g):
        qkv4 = qkv.reshape(nb, win_block, Nw, 3 * heads * d)
        g4 = g.reshape(nb, win_block, heads * d, Nw)
        out_sd = lambda lanes, dt: jax.ShapeDtypeStruct(
            (nb, win_block, lanes, Nw), dt
        )
        ospec = lambda lanes: pl.BlockSpec(
            (1, win_block, lanes, Nw), lambda b, g_: (b, 0, g_, 0),
            memory_space=pltpu.VMEM,
        )
        dqT, dkT, dvT, drelT = pl.pallas_call(
            bwd_kernel,
            out_shape=[
                out_sd(heads * d, qkv.dtype),
                out_sd(heads * d, qkv.dtype),
                out_sd(heads * d, qkv.dtype),
                out_sd(heads * 32, rel_s.dtype),
            ],
            grid_spec=pl.GridSpec(
                grid=(nb, n_hg),
                in_specs=[
                    pl.BlockSpec((1, win_block, Nw, gd), blk(0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, win_block, Nw, gd), blk(1),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, win_block, Nw, gd), blk(2),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Nw, win_block, head_group * 32),
                                 lambda b, g_: (0, b, g_),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((32, Nw), lambda b, g_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, win_block, gd, Nw),
                                 lambda b, g_: (b, 0, g_, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    ospec(gd), ospec(gd), ospec(gd), ospec(head_group * 32),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=5 * BW * heads * Nw * Nw * (2 * d + 32),
                bytes_accessed=qkv.size * 4 + rel_s.size * 4,
                transcendentals=BW * heads * Nw * Nw,
            ),
        )(qkv4, qkv4, qkv4, rel_s, sel32, g4)
        # assemble logical cotangents; XLA folds the transposes into the
        # consuming dgemms (qkv-projection / rel-einsum VJPs)
        to_rows = lambda a: jnp.swapaxes(a, 2, 3).reshape(BW, Nw, -1)
        dqkv = jnp.concatenate(
            [to_rows(dqT), to_rows(dkT), to_rows(dvT)], axis=-1
        )
        drel = drelT.transpose(3, 0, 1, 2).reshape(Nw, BW, heads * 32)
        return dqkv, drel, jnp.zeros_like(sel32)

    @jax.custom_vjp
    def f(qkv, rel_s, sel32):
        return run(qkv, rel_s, sel32)

    def f_fwd(qkv, rel_s, sel32):
        return run(qkv, rel_s, sel32), (qkv, rel_s, sel32)

    def f_bwd(res, g):
        return run_bwd(*res, g)

    f.defvjp(f_fwd, f_bwd)
    return f(qkv, rel_s, sel32)


def _qkv_packed_edge_kernel(
    scale, head_group, d, n,
    q_ref, k_ref, v_ref, rel_ref, sel_ref, vb_ref, km_ref, o_ref,
):
    # Edge-window sibling of `_qkv_packed_windows_kernel` for the compact
    # pad-free layout (ops/compact_window.py): the window's pad tokens are
    # ONE virtual key per query whose logit arrives in rel lane LPAD_LANE
    # (computed in XLA at rel construction; computing it in-kernel cost
    # 28 ms/pass of poorly-vectorised per-head masked reductions) and whose
    # value is the v slice of the qkv bias. `km` masks the zero-filled dummy
    # key columns of windows narrower than the uniform R. Softmax over
    # [real keys | virtual pad key] == the reference's softmax over the
    # padded win^2 window. All n edge windows ride the dot batch dim in ONE
    # program per (batch, head group) — measured 7% faster than one program
    # per window (scripts/probe_attn_v3.py: per-program stalls dominate at
    # R=112).
    from .compact_window import LPAD_LANE, REL_LANES

    sel = sel_ref[:]   # (n, REL_LANES, R) — per-window scatter, Lpad row zero
    km = km_ref[:]     # (n, 1, R): 0 real / -1e30 dummy
    staged = []
    for h in range(head_group):
        q = q_ref[0][:, :, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, :, h * d : (h + 1) * d]  # (n, R, d)
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
        vb = vb_ref[h]  # (d,) pad-token value (sublane-indexed: lane-offset
        #                  slices of a packed bias fail Mosaic's broadcast
        #                  relayout at fp32)
        s, lp = staged[h]
        # constant-shift softmax (see _SOFTMAX_SHIFT): replaces the
        # max+maximum(lp) stabilisation — probe_wsoft.py: 0.829 -> 0.728 ms
        # per edge block at batch 8 (-12%). _shift_exp clamps its argument
        # to -80, so each -1e30 dummy column contributes exp(-80) ~ 1.8e-35
        # (not exactly 0) to the denominator — ~1e-33 absolute vs real
        # per-row mass >= exp(-SHIFT-|s|max) ~ 1e-22, i.e. <=1e-11 relative
        # even in the 48-dummy-column corner windows. Keep that margin in
        # mind if _EXP_CLAMP is ever widened.
        p = _shift_exp(s)
        pp = _shift_exp(lp)  # virtual pad key's mass (n, R, 1)
        l = jnp.sum(p, axis=-1, keepdims=True) + pp
        # d-major output (see _qkv_packed_windows_kernel): o^T = v^T p^T
        ot = jax.lax.dot_general(
            v, p.astype(v.dtype), (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (n, d, R)
        # pad-value outer product as a batched K=1 dot (a (n,R,1)->(n,1,R)
        # transpose would be a Mosaic relayout)
        vbn = jnp.broadcast_to(
            vb.astype(jnp.float32)[None, :, None], ot.shape[:2] + (1,)
        )
        ot += jax.lax.dot_general(
            vbn, pp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # fold 1/l into the (n, d, R) output columns: 1/d as many divides as
        # normalising the (n, R, R) probability matrix
        inv = 1.0 / l  # (n, R, 1)
        inv_row = jax.lax.dot_general(
            jnp.ones((inv.shape[0], 1, 1), jnp.float32), inv,
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )  # (n, 1, R)
        o_ref[0, :, h * d : (h + 1) * d, :] = (ot * inv_row).astype(o_ref.dtype)


def flash_qkv_packed_edge(
    qkv: jnp.ndarray,   # (B, n, R, 3*heads*d) — packed qkv, uniform edge rows
    rel: jnp.ndarray,   # (B, n, R, heads*32) — rel factors + Lpad in lane 28
    sel: jnp.ndarray,   # (n, 32, R) per-window scatter (compact_window.edge_consts)
    vb: jnp.ndarray,    # (heads, d) — v slice of the qkv bias (pad value)
    kmask: jnp.ndarray, # (n, 1, R) fp32: 0 real keys / -1e30 dummy columns
    scale: float,
    heads: int,
    d: int,
    head_group: int = 8,
) -> jnp.ndarray:
    """Partially-padded-window attention on the compact (pad-free) layout.

    Each window has R uniform rows (real tokens + zero dummies for narrower
    windows); pad keys are folded into one virtual key per query whose logit
    rides rel lane LPAD_LANE (see ops/compact_window.py). Output is d-major
    (B, n, heads*d, R) for `proj_rows`. Falls back to the XLA formulation on
    CPU or Mosaic-unfriendly shapes."""
    from .compact_window import LPAD_LANE, REL_LANES

    B, n, R, _ = qkv.shape
    if heads % head_group != 0:
        head_group = heads
    n_hg = heads // head_group
    gd = head_group * d

    def ref(qkv, rel, sel, vb, kmask):
        r = qkv.reshape(B, n, R, 3, heads, d)
        q = jnp.moveaxis(r[..., 0, :, :], 3, 1) * jnp.asarray(scale, qkv.dtype)
        k = jnp.moveaxis(r[..., 1, :, :], 3, 1)  # (B, heads, n, R, d)
        v = jnp.moveaxis(r[..., 2, :, :], 3, 1)
        relh = jnp.moveaxis(rel.reshape(B, n, R, heads, REL_LANES), 3, 1)
        s = jnp.einsum("bhnqc,bhnkc->bhnqk", q, k, preferred_element_type=jnp.float32)
        s = s + jnp.einsum(
            "bhnqr,nrk->bhnqk", relh, sel.astype(relh.dtype),
            preferred_element_type=jnp.float32,
        )
        s = s + kmask[None, None, :, 0][:, :, :, None, :]
        lp = relh[..., LPAD_LANE].astype(jnp.float32)[..., None]  # (B,h,n,R,1)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), lp)
        p = jnp.exp(s - m)
        pp = jnp.exp(lp - m)
        l = jnp.sum(p, axis=-1, keepdims=True) + pp
        o = jnp.einsum(
            "bhnqk,bhnkc->bhnqc", (p / l).astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        vbh = vb.astype(jnp.float32)
        o = o + (pp / l) * vbh[None, :, None, None, :]
        o = o.astype(qkv.dtype)  # (B, heads, n, R, d) -> d-major
        return jnp.moveaxis(o, 1, 2).transpose(0, 1, 2, 4, 3).reshape(
            B, n, heads * d, R
        )

    if gd % _LANE_ALIGN != 0 or R % 8 != 0 or _on_cpu():
        return ref(qkv, rel, sel, vb, kmask)

    kernel = functools.partial(_qkv_packed_edge_kernel, scale, head_group, d, n)
    blk = lambda role: (lambda b, g: (b, 0, 0, role * n_hg + g))

    run = lambda qkv, rel, sel, vb, kmask: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n, heads * d, R), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, n_hg),
            in_specs=[
                pl.BlockSpec((1, n, R, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, R, head_group * REL_LANES),
                             lambda b, g: (b, 0, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, REL_LANES, R), lambda b, g: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((head_group, d), lambda b, g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 1, R), lambda b, g: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, n, gd, R),
                lambda b, g: (b, 0, g, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * n * R * R * (2 * d + REL_LANES),
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=B * heads * n * R * R,
        ),
    )(qkv, qkv, qkv, rel, sel, vb, kmask)
    return pallas_with_xla_vjp(run, ref)(qkv, rel, sel, vb, kmask)


def _qkv_packed_plain_kernel(scale, head_group, d, q_ref, k_ref, v_ref, o_ref):
    # Plain softmax attention (no bias) on the packed qkv layout — heads
    # peeled with static lane slices; whole sequence per block (odd lengths
    # like CLIP's 581 tokens are fine since S == the full array dim).
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]   # (S, d)
        v = v_ref[0][:, h * d : (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (S, S)
        # constant-shift softmax (see _SOFTMAX_SHIFT / probe_wsoft.py)
        p = _shift_exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        # d-major output (see _qkv_packed_windows_kernel): o^T = v^T p^T
        ot = jax.lax.dot_general(
            v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (d, S)
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def flash_qkv_packed_plain(
    qkv: jnp.ndarray,  # (B, S, 3*heads*d) — bitcast view of the qkv projection
    scale: float,
    heads: int,
    d: int,
    head_group: int = 8,
) -> jnp.ndarray:
    """No-bias sibling of `flash_qkv_packed_windows` for the CLIP towers.

    Requires (head_group * d) % 128 == 0 (CLIP ViT-L: 8 heads x 64 = 512).
    Output is d-major (B, heads*d, S) for `proj_rows`.
    """
    B, S, _ = qkv.shape
    if heads % head_group != 0:
        head_group = heads  # tests/tiny shapes (TPU callers gate on 8 | heads)
    n_hg = heads // head_group
    gd = head_group * d
    kernel = functools.partial(_qkv_packed_plain_kernel, scale, head_group, d)
    blk = lambda role: (lambda b, g: (b, 0, role * n_hg + g))

    def ref(qkv):  # noqa: ANN001 — XLA fallback + VJP reference
        r = qkv.reshape(B, S, 3, heads, d)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * jnp.asarray(scale, qkv.dtype)
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)
        s = jnp.einsum("bhqc,bhkc->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum(
            "bhqk,bhkc->bhqc", p, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)  # (B, heads, S, d) -> d-major
        return o.transpose(0, 1, 3, 2).reshape(B, heads * d, S)

    if gd % _LANE_ALIGN != 0 or _on_cpu():
        return ref(qkv)  # lane alignment contract (see flash_qkv_packed_windows)

    run = lambda qkv: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, heads * d, S), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, n_hg),
            in_specs=[
                pl.BlockSpec((1, S, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, gd), blk(2), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, gd, S), lambda b, g: (b, g, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * S * S * 2 * d,
            bytes_accessed=qkv.size * 2,
            transcendentals=B * heads * S * S,
        ),
    )(qkv, qkv, qkv)
    return pallas_with_xla_vjp(run, ref)(qkv)


def _qkv_packed_global_kernel(scale, head_group, d, H, W, q_ref, k_ref, v_ref, rel_ref, o_ref):
    # Packed-lane global attention: q/k/v arrive as raw lane slices of the
    # qkv projection (no 5D head view -> no 80->128 lane-pad copy in HBM);
    # rel arrives position-major (block_q, 1, head_group, hw) — the rel
    # einsum's natural layout — and heads are sublane-selected.
    #
    # The separable rel bias (bias[q, k] = Bh[q, kh] + Bw[q, kw], k = kh*W+kw)
    # is built on the VPU instead of the old rel(bq,hw) @ sel(hw,N) MXU dot —
    # which was MORE MXU work than the q@k score dot itself (K=128 vs K=80,
    # ~44% of the block's FLOPs at ViT-H shapes). Scores are computed
    # TRANSPOSED, sT (N, block_q) = k q^T: in that orientation the bias is
    # sublane-structured, so two broadcasts of the transposed rel tile build
    # it without any MXU pass (scripts/probe_gbias.py: 15.8 -> 13.5 ms per
    # ViT-H global block at batch 8; err 1.2e-3 ~ MXU accumulation order of
    # the transposed dots).
    N = k_ref.shape[1]
    block_q = q_ref.shape[1]
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]   # (N, d)
        v = v_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[:, 0, h, :]  # (block_q, hw) — sublane select
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, block_q) — transposed scores
        # Compute-dtype bias temps: the two (N, block_q) broadcast temporaries
        # are the kernel's biggest VPU/VMEM traffic; building them in the
        # kernel's compute dtype (bf16 in production) halves the bytes and
        # the upcast rides the adds (probe_gbias2 v4a). fp32 parity runs keep
        # fp32 temps — no precision change there.
        relT = jnp.transpose(rel).astype(o_ref.dtype)  # (hw, block_q)
        bh = relT[0:H]       # (H, block_q) — sublane slices
        bw = relT[H : H + W]
        # bias^T[k] rows: Bh repeats each h-row W times consecutively, Bw
        # tiles its W rows H times — pure-VPU broadcast+collapse, no MXU.
        BhT = jnp.broadcast_to(bh[:, None, :], (H, W, block_q)).reshape(N, block_q)
        BwT = jnp.broadcast_to(bw[None, :, :], (H, W, block_q)).reshape(N, block_q)
        sT = sT + BhT.astype(jnp.float32) + BwT.astype(jnp.float32)
        # Constant-shift softmax: softmax is shift-invariant, so the per-
        # column max reduce+subtract (a full (N, block_q) VPU pass on the
        # critical path between the two MXU dots) is replaced by a fixed
        # shift (probe_gbias2 v4b: -2.3 ms/block). f32 exp overflows only at
        # s > 88 + SHIFT and the result is exact (not approximate) whenever
        # every column has some score above SHIFT - 87; LN'd ViT-H logits
        # measure |s| < 30. The XLA ref/VJP below keeps the max-subtract —
        # mathematically identical, so parity tests still anchor this path.
        p = _shift_exp(sT)
        l = jnp.sum(p, axis=0, keepdims=True)  # (1, block_q)
        # d-major output (see _qkv_packed_windows_kernel): o^T = v^T p^T,
        # with the probabilities NORMALISED IN F32 before the bf16 pv dot.
        # Folding 1/l into the (d, block_q) output instead was probed
        # (scripts/probe_gdivfold.py: 7.058 -> 6.951 ms/block, ~1.5% of this
        # kernel) and REVERTED: it regresses on-chip parity vs the XLA ref
        # from 2.0e-5 to 6.55e-4 mean-relative — past the 1e-4 gate in
        # scripts/verify_kernels_tpu.py — and the regression is NOT the
        # numerator/denominator inconsistency (computing l from the
        # bf16-rounded p measures identically, scripts/probe_gdivfold3.py):
        # bf16-rounding the raw exp(s - SHIFT) values loses more than
        # rounding the normalised p/l distribution. Accuracy gate wins over
        # a ~0.1% e2e perf delta.
        pn = (p / l).astype(v.dtype)
        ot = jax.lax.dot_general(
            v, pn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, block_q)
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def _qkv_packed_global_bwd_kernel(
    scale, head_group, d, H, W, n_i,
    q_ref, k_ref, v_ref, rel_ref, sel_ref, g_ref,
    dq_ref, dk_ref, dv_ref, drel_ref,
    dk_acc, dv_acc,
):
    # Flash-style backward for the global kernel: full k/v per head group
    # live in VMEM (like the forward), the (N, block_q) probability tile is
    # recomputed per q-block, and dk/dv accumulate across q-blocks in f32
    # scratch (the grid's q axis is "arbitrary" = sequential per (b, g)).
    # Replaces XLA autodiff's materialised f32 (B, heads, N, N) probability
    # matrices (2.1 GB each at batch 2, ~20 TF/s, 134 ms of the train step).
    i = pl.program_id(2)
    N = k_ref.shape[1]
    block_q = q_ref.shape[1]
    sel = sel_ref[:]  # (hw, N)
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d]
        k = k_ref[0][:, h * d : (h + 1) * d]   # (N, d)
        v = v_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[:, 0, h, :]              # (block_q, hw)
        gT = g_ref[0][h * d : (h + 1) * d, :]  # (d, block_q)
        qs = q * jnp.asarray(scale, q.dtype)
        sT = jax.lax.dot_general(
            k, qs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, block_q)
        relT = jnp.transpose(rel).astype(gT.dtype)  # (hw, block_q)
        bh = relT[0:H]
        bw = relT[H : H + W]
        BhT = jnp.broadcast_to(bh[:, None, :], (H, W, block_q)).reshape(N, block_q)
        BwT = jnp.broadcast_to(bw[None, :, :], (H, W, block_q)).reshape(N, block_q)
        sT = sT + BhT.astype(jnp.float32) + BwT.astype(jnp.float32)
        pT = _shift_exp(sT)
        l = jnp.sum(pT, axis=0, keepdims=True)
        PT = pT / l                           # (N, block_q) f32
        PTb = PT.astype(q.dtype)
        dPT = jax.lax.dot_general(            # (N, block_q)
            v, gT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        t = jnp.sum(dPT * PT, axis=0, keepdims=True)
        dSTb = (PT * (dPT - t)).astype(q.dtype)
        dqT = jax.lax.dot_general(            # (d, block_q)
            k, dSTb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dkT = jax.lax.dot_general(            # (d, N)
            q, dSTb, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dvT = jax.lax.dot_general(            # (d, N)
            gT, PTb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        drelT = jax.lax.dot_general(          # (hw, block_q)
            sel.astype(q.dtype), dSTb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, h * d : (h + 1) * d, :] = dqT.astype(dq_ref.dtype)
        drel_ref[0, h] = drelT.astype(drel_ref.dtype)

        @pl.when(i == 0)
        def _():
            dk_acc[h * d : (h + 1) * d, :] = dkT
            dv_acc[h * d : (h + 1) * d, :] = dvT

        @pl.when(i != 0)
        def _():
            dk_acc[h * d : (h + 1) * d, :] += dkT
            dv_acc[h * d : (h + 1) * d, :] += dvT

        @pl.when(i == n_i - 1)
        def _():
            dk_ref[0, h * d : (h + 1) * d, :] = (
                dk_acc[h * d : (h + 1) * d, :].astype(dk_ref.dtype)
            )
            dv_ref[0, h * d : (h + 1) * d, :] = (
                dv_acc[h * d : (h + 1) * d, :].astype(dv_ref.dtype)
            )


def flash_qkv_packed_global(
    qkv: jnp.ndarray,   # (B, N, 3*heads*d) — bitcast view of the qkv projection
    rel: jnp.ndarray,   # (N, B, heads, hw) — position-major [rel_h | rel_w]
    sel: jnp.ndarray,   # (hw, N) from make_rel_scatter (XLA ref/VJP path only)
    scale: float,
    heads: int,
    d: int,
    H: int = 0,
    W: int = 0,
    block_q: int = 512,
    head_group: int = 8,
) -> jnp.ndarray:
    """Global-attention sibling of `flash_qkv_packed_windows` (q tiled).

    Replaces the `flash_attention_relpos` production path, which needed an
    XLA-side (B,N,3,heads,d) transpose + 80->128 pad of q/k/v (measured
    ~15 ms/pass at batch 8 for the 4 global blocks). `rel` arrives
    POSITION-major — `rel_smajor_global`'s einsum emits that layout
    natively, so no transposing copy ever materialises (the old
    (B, N, heads*hw) layout cost ~12 ms/iter of XLA relayout chain;
    scripts/probe_relv2.py). Requires (head_group * d) % 128 == 0,
    hw % 128 == 0, and the grid dims H, W (H*W == N, both % 8 == 0) for the
    in-kernel VPU bias build (ViT-H global: d=80, head_group=8, H=W=64).
    Output is d-major (B, heads*d, N) for `proj_rows`.
    """
    B, N, _ = qkv.shape
    hw = sel.shape[0]
    if N % block_q != 0:
        block_q = N
    if heads % head_group != 0:
        head_group = heads
    n_hg = heads // head_group
    gd = head_group * d

    def ref(qkv, rel, sel):
        r = qkv.reshape(B, N, 3, heads, d)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * jnp.asarray(scale, qkv.dtype)
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)
        relh = rel.transpose(1, 2, 0, 3)  # (B, heads, N, hw)
        o = xla_attention_relpos(q, k, v, relh, sel)  # (B, heads, N, d)
        return o.transpose(0, 1, 3, 2).reshape(B, heads * d, N)

    if (
        gd % _LANE_ALIGN != 0 or hw % _LANE_ALIGN != 0 or _on_cpu()
        or H * W != N or H % 8 != 0 or W % 8 != 0
    ):
        return ref(qkv, rel, sel)

    kernel = functools.partial(_qkv_packed_global_kernel, scale, head_group, d, H, W)
    blk = lambda role: (lambda b, g, i: (b, i, role * n_hg + g))

    run = lambda qkv, rel, sel: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, heads * d, N), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, n_hg, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, 2 * n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, 1, head_group, hw),
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
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * N * N * 2 * d,
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=B * heads * N * N,
        ),
    )(qkv, qkv, qkv, rel)

    n_i = N // block_q
    hw_ = hw
    bwd_kernel = functools.partial(
        _qkv_packed_global_bwd_kernel, scale, head_group, d, H, W, n_i
    )

    def run_bwd(qkv, rel, sel, g):
        dqT, dkT, dvT, drelT = pl.pallas_call(
            bwd_kernel,
            out_shape=[
                jax.ShapeDtypeStruct((B, heads * d, N), qkv.dtype),
                jax.ShapeDtypeStruct((B, heads * d, N), qkv.dtype),
                jax.ShapeDtypeStruct((B, heads * d, N), qkv.dtype),
                jax.ShapeDtypeStruct((B, heads, hw_, N), rel.dtype),
            ],
            grid=(B, n_hg, n_i),
            in_specs=[
                pl.BlockSpec((1, block_q, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g_, i: (b, 0, n_hg + g_),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g_, i: (b, 0, 2 * n_hg + g_),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, 1, head_group, hw_),
                             lambda b, g_, i: (i, b, g_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hw_, N), lambda b, g_, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gd, block_q), lambda b, g_, i: (b, g_, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, gd, block_q), lambda b, g_, i: (b, g_, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gd, N), lambda b, g_, i: (b, g_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gd, N), lambda b, g_, i: (b, g_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, head_group, hw_, block_q),
                             lambda b, g_, i: (b, g_, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((gd, N), jnp.float32),
                pltpu.VMEM((gd, N), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=5 * B * heads * N * N * 2 * d,
                bytes_accessed=qkv.size * 4 + rel.size * 4,
                transcendentals=B * heads * N * N,
            ),
        )(qkv, qkv, qkv, rel, sel, g)
        to_rows = lambda a: jnp.swapaxes(a, 1, 2)
        dqkv = jnp.concatenate(
            [to_rows(dqT), to_rows(dkT), to_rows(dvT)], axis=-1
        )
        drel = drelT.transpose(3, 0, 1, 2)  # (N, B, heads, hw)
        return dqkv, drel, jnp.zeros_like(sel)

    @jax.custom_vjp
    def f(qkv, rel, sel):
        return run(qkv, rel, sel)

    def f_fwd(qkv, rel, sel):
        return run(qkv, rel, sel), (qkv, rel, sel)

    def f_bwd(res, g):
        return run_bwd(*res, g)

    f.defvjp(f_fwd, f_bwd)
    return f(qkv, rel, sel)


def _qkv_relpos_global_kernel(scale, head_group, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    sel = sel_ref[:]  # (hw, N)
    for h in range(head_group):
        q = q_ref[0, :, h, :] * jnp.asarray(scale, q_ref.dtype)  # (block_q, d)
        k = k_ref[0, :, h, :]      # (N, d)
        v = v_ref[0, :, h, :]
        rel = rel_ref[0, :, h, :]  # (block_q, hw)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s += jax.lax.dot(rel, sel, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o_ref[0, h] = jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def flash_qkv_relpos_global(
    qkv: jnp.ndarray,  # (B, N, 3*heads, d) — 4D view of the packed Dense
    rel: jnp.ndarray,  # (B, N, heads, H+W)
    sel: jnp.ndarray,  # (H+W, N)
    scale: float,
    block_q: int = 256,
    head_group: int = 8,
) -> jnp.ndarray:
    """Global-attention sibling of `flash_qkv_relpos_windows` (q tiled).

    ABLATION-ONLY (like `flash_attention_fullk`): the production global path
    in sam_encoder.py uses `flash_attention_relpos` because full-N K/V per
    head-group exceed VMEM in the packed layout at batch 8.

    Requires heads % head_group == 0 (head_group % 8 == 0 for Mosaic block
    tiling); ViT-H has 16 heads. Callers fall back to the XLA path otherwise.
    """
    B, N, three_heads, d = qkv.shape
    heads = three_heads // 3
    hw = sel.shape[0]
    if N % block_q != 0:
        block_q = N
    if heads % head_group != 0:
        head_group = heads  # tests/tiny shapes (TPU callers gate on 8 | heads)
    n_hg = heads // head_group
    kernel = functools.partial(_qkv_relpos_global_kernel, scale, head_group)

    def ref(qkv, rel, sel):
        q = jnp.moveaxis(qkv[:, :, :heads], 2, 1) * jnp.asarray(scale, qkv.dtype)
        k = jnp.moveaxis(qkv[:, :, heads : 2 * heads], 2, 1)
        v = jnp.moveaxis(qkv[:, :, 2 * heads :], 2, 1)
        relh = jnp.moveaxis(rel, 2, 1)  # (B, heads, N, hw)
        return xla_attention_relpos(q, k, v, relh, sel)

    run = lambda qkv, rel, sel: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, heads, N, d), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, n_hg, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, head_group, d),
                             lambda b, g, i: (b, i, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, head_group, d),
                             lambda b, g, i: (b, 0, n_hg + g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, head_group, d),
                             lambda b, g, i: (b, 0, 2 * n_hg + g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, head_group, hw),
                             lambda b, g, i: (b, i, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hw, N), lambda b, g, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, head_group, block_q, d), lambda b, g, i: (b, g, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * N * N * (2 * d + hw),
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=B * heads * N * N,
        ),
    )(qkv, qkv, qkv, rel, sel)
    return pallas_with_xla_vjp(run, ref)(qkv, rel, sel)


def _kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (block_q, d_qk)
    k = k_ref[0]  # (seq, d_qk)
    v = v_ref[0]  # (seq, d_v)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, seq)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o_ref[0] = jax.lax.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_attention_fullk(
    q_aug: jnp.ndarray,  # (B, N, d_qk) — pre-scaled, bias-augmented
    k_aug: jnp.ndarray,  # (B, N, d_qk)
    v: jnp.ndarray,      # (B, N, d_v)
    block_q: int = 128,
) -> jnp.ndarray:
    B, N, d_qk = q_aug.shape
    d_v = v.shape[-1]
    assert N % block_q == 0, (N, block_q)
    grid = (B, N // block_q)

    def ref(q_aug, k_aug, v):
        s = jnp.einsum(
            "bqc,bkc->bqk", q_aug, k_aug, preferred_element_type=jnp.float32
        )
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum(
            "bqk,bkc->bqc", p, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)

    run = lambda q_aug, k_aug, v: pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, d_v), v.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_qk), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, d_qk), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, d_v), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d_v), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * (d_qk + d_v),
            bytes_accessed=(q_aug.size + k_aug.size * (N // block_q) + v.size) * 2,
            transcendentals=B * N * N,
        ),
    )(q_aug, k_aug, v)
    return pallas_with_xla_vjp(run, ref)(q_aug, k_aug, v)
