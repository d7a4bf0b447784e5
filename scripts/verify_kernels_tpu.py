"""On-TPU kernel-vs-reference equivalence (VERDICT round-1 item #3).

Two layers of evidence, both on the real chip:

1. PER-KERNEL checks at production shapes (the rigorous layer): every Pallas
   kernel vs its XLA reference formulation on identical inputs — compiled
   Mosaic semantics (grids/BlockSpecs/lane slices), not interpret mode.
   Bound: mean relative error < 1e-4.

2. SHALLOW-TOWER checks (the wiring layer): a depth-2 windowed+global
   encoder and a 2-layer CLIP vision tower, flash vs pure-XLA reference,
   fp32. Bound: mean |diff| / output scale < 1.5e-2.

Why no full-depth tight check: the TPU MXU computes fp32 matmuls via bf16
passes, so two mathematically equivalent formulations (dense-bias attention
vs rel@sel kernels; split vs fused LN/MLP) round differently at ~1e-3
relative per block; through 24-32 RANDOM-INIT blocks those differences
amplify chaotically to percent level regardless of correctness (measured:
depth-1 mean 0.3%, depth-32 mean ~5% — while per-kernel agreement stays at
~1e-6). Semantic correctness at full depth is anchored by the CPU
golden-parity tests against the reference's own torch modules
(tests/test_golden_parity.py).

Usage:  python scripts/verify_kernels_tpu.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from camouflaged_vlm_tpu.ops import flash_attention as fa
from camouflaged_vlm_tpu.ops import linear as lin

RESULTS = []


def record(name, got, want, bound, scale_rel=False):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    if scale_rel:
        err = float(np.abs(got - want).mean() / max(np.abs(want).mean(), 1e-6))
    else:
        err = float((np.abs(got - want) / np.maximum(np.abs(want), 1e-2)).mean())
    ok = err < bound
    RESULTS.append(ok)
    print(f"{name:32s} err={err:.2e} bound={bound:.0e} {'PASS' if ok else 'FAIL'}")


def kernel_checks():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    scale = 80 ** -0.5

    Bp, S, K, N = 200, 196, 1280, 3840
    x = jnp.asarray(rng.standard_normal((Bp, S, K)) * 0.5, dt)
    g = jnp.asarray(rng.standard_normal((1, K)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.float32)
    mask = jnp.asarray((rng.random((25, S, 1)) > 0.2).astype(np.float32), dt)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, dt)
    b = jnp.asarray(rng.standard_normal((1, N)) * 0.1, dt)

    def ln(x, eps=1e-6):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        return (x32 - mu) * jax.lax.rsqrt(var + eps)

    def ln_mask_ref(x, g, be, mask, w, b):
        xn = ln(x) * g + be
        m = jnp.tile(mask.astype(jnp.float32), (x.shape[0] // mask.shape[0], 1, 1))
        xn = (xn * m).astype(x.dtype)
        return (jnp.einsum("bsk,kn->bsn", xn, w, preferred_element_type=jnp.float32)
                + b.astype(jnp.float32)).astype(x.dtype)

    got = jax.jit(lambda *a: lin.ln_mask_linear_bt(*a))(x, g, be, mask, w, b)
    want = jax.jit(ln_mask_ref)(x, g, be, mask, w, b)
    record("ln_mask_linear_bt", got, want, 1e-4)

    H = 5120
    w1 = jnp.asarray(rng.standard_normal((K, H)) * 0.02, dt)
    b1 = jnp.asarray(rng.standard_normal((1, H)) * 0.1, dt)
    w2 = jnp.asarray(rng.standard_normal((H, K)) * 0.02, dt)
    b2 = jnp.asarray(rng.standard_normal((1, K)) * 0.1, dt)

    def mlp_ref(x, g, be, w1, b1, w2, b2):
        xn = (ln(x) * g + be).astype(x.dtype)
        h = jax.nn.gelu(
            jnp.einsum("bsk,kh->bsh", xn, w1, preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32), approximate=True)
        acc = jnp.einsum("bsh,hk->bsk", h.astype(x.dtype), w2,
                         preferred_element_type=jnp.float32)
        return (acc + b2.astype(jnp.float32) + x.astype(jnp.float32)).astype(x.dtype)

    got = jax.jit(lambda *a: lin.ln_mlp_residual_bt(*a))(x, g, be, w1, b1, w2, b2)
    want = jax.jit(mlp_ref)(x, g, be, w1, b1, w2, b2)
    record("ln_mlp_residual_bt", got, want, 1e-4)

    B0, heads, T, Sq, d, out = 8, 16, 25, 196, 80, 1280
    x5 = jnp.asarray(rng.standard_normal((B0, heads, T, Sq, d)) * 0.3, dt)
    wp = jnp.asarray(rng.standard_normal((heads, d, out)) * 0.05, dt)
    bp = jnp.asarray(rng.standard_normal((1, out)) * 0.1, dt)
    res = jnp.asarray(rng.standard_normal((B0, T, Sq, out)), dt)
    got = jax.jit(lambda *a: lin.proj_from_heads_res(*a))(x5, wp, bp, res)
    want = jax.jit(
        lambda x5, wp, bp, res: (
            jnp.einsum("bhtsd,hdo->btso", x5, wp, preferred_element_type=jnp.float32)
            + bp.astype(jnp.float32) + res.astype(jnp.float32)
        ).astype(x5.dtype)
    )(x5, wp, bp, res)
    record("proj_from_heads_res", got, want, 1e-4)

    nwin, Nw = 25, 196
    qkv = jnp.asarray(rng.standard_normal((8, nwin, Nw, 3 * 16 * 80)) * 0.2, dt)
    rel = jnp.asarray(rng.standard_normal((8, nwin, Nw, 16 * 32)) * 0.1, dt)
    sel32 = jnp.pad(fa.make_rel_scatter(14, 14), ((0, 4), (0, 0)))
    got = jax.jit(
        lambda q, r: fa.flash_qkv_packed_windows(q, r, sel32, scale, 16, 80)
    )(qkv, rel)

    def win_ref(qkv, rel):
        r = qkv.reshape(8, nwin, Nw, 3, 16, 80)
        q = jnp.moveaxis(r[:, :, :, 0], 3, 1) * scale
        k = jnp.moveaxis(r[:, :, :, 1], 3, 1)
        v = jnp.moveaxis(r[:, :, :, 2], 3, 1)
        relh = jnp.moveaxis(rel.reshape(8, nwin, Nw, 16, 32), 3, 1)
        o = fa.xla_attention_relpos(q, k, v, relh, sel32)
        return jnp.moveaxis(o, 1, 2).transpose(0, 1, 2, 4, 3).reshape(
            8, nwin, 16 * 80, Nw
        )

    record("flash_qkv_packed_windows", got, jax.jit(win_ref)(qkv, rel), 1e-4)

    BW = 128
    qkv_s = jnp.asarray(rng.standard_normal((BW, Nw, 3 * 16 * 80)) * 0.2, dt)
    rel_sm = jnp.asarray(rng.standard_normal((Nw, BW, 16 * 32)) * 0.1, dt)
    got = jax.jit(
        lambda q, r: fa.flash_qkv_packed_windows_s(q, r, sel32, scale, 16, 80)
    )(qkv_s, rel_sm)

    def win_s_ref(qkv, rel_s):
        r = qkv.reshape(BW, Nw, 3, 16, 80)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * scale
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)
        relh = rel_s.reshape(Nw, BW, 16, 32).transpose(1, 2, 0, 3)
        o = fa.xla_attention_relpos(q, k, v, relh, sel32)
        return o.transpose(0, 1, 3, 2).reshape(BW, 16 * 80, Nw)

    record(
        "flash_qkv_packed_windows_s", got, jax.jit(win_s_ref)(qkv_s, rel_sm), 1e-4
    )

    Ng = 4096
    qkv_g = jnp.asarray(rng.standard_normal((2, Ng, 3 * 16 * 80)) * 0.2, dt)
    rel_g = jnp.asarray(rng.standard_normal((Ng, 2, 16, 128)) * 0.05, dt)
    sel_g = fa.make_rel_scatter(64, 64)
    got = jax.jit(
        lambda q, r: fa.flash_qkv_packed_global(q, r, sel_g, scale, 16, 80, H=64, W=64)
    )(qkv_g, rel_g)

    def glob_ref(qkv, rel):
        r = qkv.reshape(2, Ng, 3, 16, 80)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * scale
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)
        relh = rel.transpose(1, 2, 0, 3)  # (B, heads, N, hw)
        o = fa.xla_attention_relpos(q, k, v, relh, sel_g)
        return o.transpose(0, 1, 3, 2).reshape(2, 16 * 80, Ng)

    record("flash_qkv_packed_global", got, jax.jit(glob_ref)(qkv_g, rel_g), 1e-4)

    # --- edge-window kernel (compact pad-free layout, round 3) ---
    from camouflaged_vlm_tpu.ops import compact_window as cw
    from camouflaged_vlm_tpu.models.sam_encoder import make_rcomb

    geom = cw.CompactGeometry(64, 64, 14)
    heads, d = 16, 80
    dim = heads * d
    qkv_e = jnp.asarray(rng.standard_normal((8, geom.E, 3 * dim)) * 0.2, dt)
    bias_e = jnp.asarray(rng.standard_normal(3 * dim) * 0.1, jnp.float32)
    relh_t = jnp.asarray(rng.standard_normal((27, d)) * 0.05, jnp.float32)
    relw_t = jnp.asarray(rng.standard_normal((27, d)) * 0.05, jnp.float32)

    def edge_run(qkv_e):
        q_e = qkv_e[:, :, :dim].reshape(8, geom.E, heads, d)
        rcomb = make_rcomb(14, 14, relh_t, relw_t, qkv_e.dtype)
        rel_e = cw.edge_rel_lpad(
            q_e, rcomb, bias_e[dim : 2 * dim].reshape(heads, d), scale, geom
        )
        sel, kmask = cw.edge_consts(geom, qkv_e.dtype)
        o = fa.flash_qkv_packed_edge(
            qkv_e.reshape(8, geom.n_edge, geom.R_u, 3 * dim),
            rel_e.reshape(8, geom.n_edge, geom.R_u, heads * cw.REL_LANES),
            sel,
            bias_e[2 * dim :].astype(dt).reshape(heads, d),
            kmask, scale, heads, d,
        )  # (B, n, heads*d, R) d-major
        return (
            o.reshape(8, geom.n_edge, heads, d, geom.R_u)
            .transpose(0, 2, 1, 4, 3)
            .reshape(8, heads, geom.E, d)
        )

    import numpy as _np

    realrows = _np.zeros((geom.n_edge, geom.R_u), bool)
    _off = 0
    for _g in geom.edge_groups:
        realrows[_off : _off + _g.n, : _g.rows] = True
        _off += _g.n
    realrows = realrows.reshape(-1)
    got = jax.jit(edge_run)(qkv_e)[:, :, realrows]  # head-leading rows
    want = jax.jit(
        lambda q: cw.edge_attention_literal(
            q, bias_e, relh_t, relw_t, scale, heads, geom
        )
    )(qkv_e)[:, :, realrows]
    # literal padded-window oracle = different formulation -> bf16/MXU
    # rounding dominates; semantic bound only
    record("flash_qkv_packed_edge (semantic)", got, want, 1e-2)

    qkv_c = jnp.asarray(rng.standard_normal((8, 581, 3 * 16 * 64)) * 0.2, dt)
    got = jax.jit(lambda q: fa.flash_qkv_packed_plain(q, 64 ** -0.5, 16, 64))(qkv_c)

    def plain_ref(qkv):
        r = qkv.reshape(8, 581, 3, 16, 64)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * (64 ** -0.5)
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)
        s = jnp.einsum("bhqc,bhkc->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkc->bhqc", p, v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        return o.transpose(0, 1, 3, 2).reshape(8, 16 * 64, 581)

    record("flash_qkv_packed_plain", got, jax.jit(plain_ref)(qkv_c), 1e-4)


def tower_checks():
    from camouflaged_vlm_tpu.models.sam_encoder import ImageEncoderViT, SamEncoderConfig
    from camouflaged_vlm_tpu.models.clip.model import AlphaClipConfig, AlphaClipVisionTower

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1024, 1024, 3)), jnp.float32)
    kw = dict(dtype=jnp.float32, depth=2, global_attn_indexes=(1,))
    enc_f = ImageEncoderViT(SamEncoderConfig.vit_h(attn_impl="flash", **kw))
    enc_r = ImageEncoderViT(SamEncoderConfig.vit_h(attn_impl="reference", **kw))
    params = jax.jit(enc_r.init)(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map_with_path(
        lambda p, l: (
            jnp.asarray(
                np.random.default_rng(
                    abs(hash(jax.tree_util.keystr(p))) % (2**31)
                ).standard_normal(l.shape).astype(np.float32) * 0.05
            )
            if "rel_pos" in jax.tree_util.keystr(p) else l
        ),
        params,
    )
    want = jax.jit(lambda p, x: enc_r.apply(p, x))(params, x)
    got = jax.jit(lambda p, x: enc_f.apply(p, x))(params, x)
    record("encoder depth-2 (win+glob)", got, want, 1.5e-2, scale_rel=True)

    cfg_f = AlphaClipConfig.vit_l_14_336(dtype=jnp.float32, vision_layers=2)
    cfg_r = AlphaClipConfig.vit_l_14_336(dtype=jnp.float32, vision_layers=2, fused=False)
    fast, ref = AlphaClipVisionTower(cfg_f), AlphaClipVisionTower(cfg_r)
    image = jnp.asarray(rng.standard_normal((2, 336, 336, 3)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal((2, 336, 336, 1)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((cfg_r.n_ctx, cfg_r.vision_width)) * 0.02, jnp.float32)
    deep = [
        jnp.asarray(rng.standard_normal((cfg_r.n_ctx, cfg_r.vision_width)) * 0.02, jnp.float32)
    ]
    params = jax.jit(ref.init)(jax.random.PRNGKey(1), image, alpha, sc, deep)
    want = jax.jit(lambda p, *a: ref.apply(p, *a))(params, image, alpha, sc, deep)
    got = jax.jit(lambda p, *a: fast.apply(p, *a))(params, image, alpha, sc, deep)
    record("clip-vis depth-2", got, want, 1.5e-2, scale_rel=True)


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    kernel_checks()
    tower_checks()
    ok = all(RESULTS)
    print("KERNEL EQUIVALENCE:", "PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
