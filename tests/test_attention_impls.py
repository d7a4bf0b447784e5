"""Equivalence of the attention implementations: reference dense bias vs
augmented-features XLA vs the Pallas flash kernel (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from camouflaged_vlm_tpu.ops.rel_pos import attention_with_decomposed_rel_pos
from camouflaged_vlm_tpu.ops.aug_attention import augment_qk, attention_xla
from camouflaged_vlm_tpu.ops import flash_attention as fa


@pytest.mark.parametrize("H,W", [(4, 4), (3, 5)])
def test_augmented_equals_reference(rng, H, W):
    B, d = 3, 16
    n = H * W
    q = rng.standard_normal((B, n, d)).astype(np.float32)
    k = rng.standard_normal((B, n, d)).astype(np.float32)
    v = rng.standard_normal((B, n, d)).astype(np.float32)
    rel_h = (rng.standard_normal((2 * H - 1, d)) * 0.1).astype(np.float32)
    rel_w = (rng.standard_normal((2 * W - 1, d)) * 0.1).astype(np.float32)
    scale = d ** -0.5

    want = attention_with_decomposed_rel_pos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rel_h), jnp.asarray(rel_w), (H, W), scale,
    )
    q_aug, k_aug = augment_qk(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(rel_h), jnp.asarray(rel_w),
        (H, W), scale,
    )
    assert q_aug.shape[-1] % 128 == 0
    got = attention_xla(q_aug, k_aug, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_augmented_no_rel_pos(rng):
    B, n, d = 2, 8, 4
    q = rng.standard_normal((B, n, d)).astype(np.float32)
    k = rng.standard_normal((B, n, d)).astype(np.float32)
    v = rng.standard_normal((B, n, d)).astype(np.float32)
    scale = d ** -0.5
    want = attention_with_decomposed_rel_pos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, None, (2, 4), scale
    )
    q_aug, k_aug = augment_qk(jnp.asarray(q), jnp.asarray(k), None, None, (2, 4), scale)
    got = attention_xla(q_aug, k_aug, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_flash_kernel_matches_xla(rng, monkeypatch):
    # run the Pallas kernel in interpreter mode on CPU
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)

    B, N, d_qk, d_v = 2, 256, 256, 128
    q = rng.standard_normal((B, N, d_qk)).astype(np.float32)
    k = rng.standard_normal((B, N, d_qk)).astype(np.float32) * 0.1
    v = rng.standard_normal((B, N, d_v)).astype(np.float32)
    got = fa.flash_attention_fullk(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), block_q=128
    )
    want = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("H,W", [(4, 4), (3, 5)])
def test_xla_relpos_equals_reference(rng, H, W):
    """rel@sel scatter formulation == dense decomposed-bias attention."""
    from camouflaged_vlm_tpu.ops.flash_attention import (
        make_rel_scatter,
        xla_attention_relpos,
    )
    from camouflaged_vlm_tpu.ops.rel_pos import get_rel_pos_table

    B, heads, d = 2, 2, 16
    n = H * W
    q = rng.standard_normal((B, heads, n, d)).astype(np.float32)
    k = rng.standard_normal((B, heads, n, d)).astype(np.float32)
    v = rng.standard_normal((B, heads, n, d)).astype(np.float32)
    rel_h = (rng.standard_normal((2 * H - 1, d)) * 0.1).astype(np.float32)
    rel_w = (rng.standard_normal((2 * W - 1, d)) * 0.1).astype(np.float32)
    scale = d ** -0.5

    want = attention_with_decomposed_rel_pos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rel_h), jnp.asarray(rel_w), (H, W), scale,
    )

    Rh = get_rel_pos_table(H, H, jnp.asarray(rel_h))
    Rw = get_rel_pos_table(W, W, jnp.asarray(rel_w))
    rq = jnp.asarray(q).reshape(B, heads, H, W, d)
    rh = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh).reshape(B, heads, n, H)
    rw = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw).reshape(B, heads, n, W)
    rel = jnp.concatenate([rh, rw], axis=-1)
    sel = make_rel_scatter(H, W, dtype=jnp.float32)
    got = xla_attention_relpos(jnp.asarray(q) * scale, jnp.asarray(k), jnp.asarray(v), rel, sel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_relpos_kernel_matches_xla(rng, monkeypatch):
    """Pallas in-kernel-bias attention (interpret mode) == XLA formulation."""
    from camouflaged_vlm_tpu.ops.flash_attention import (
        make_rel_scatter,
        xla_attention_relpos,
    )

    orig = fa.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)

    H = W = 16
    B, N, d = 2, H * W, 128
    q = rng.standard_normal((B, N, d)).astype(np.float32)
    k = (rng.standard_normal((B, N, d)) * 0.1).astype(np.float32)
    v = rng.standard_normal((B, N, d)).astype(np.float32)
    rel = (rng.standard_normal((B, N, H + W)) * 0.1).astype(np.float32)
    sel = make_rel_scatter(H, W, dtype=jnp.float32)
    got = fa.flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rel), sel,
        block_q=128,
    )
    want = xla_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rel), sel
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_relpos_single_tile_odd_seq(rng, monkeypatch):
    """Windowed shape: N=196 (not a multiple of block_q) runs as one q tile."""
    from camouflaged_vlm_tpu.ops.flash_attention import (
        make_rel_scatter,
        xla_attention_relpos,
    )

    orig = fa.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)

    H = W = 14
    B, N, d = 2, H * W, 128
    q = rng.standard_normal((B, N, d)).astype(np.float32)
    k = (rng.standard_normal((B, N, d)) * 0.1).astype(np.float32)
    v = rng.standard_normal((B, N, d)).astype(np.float32)
    rel = (rng.standard_normal((B, N, H + W)) * 0.1).astype(np.float32)
    sel = make_rel_scatter(H, W, dtype=jnp.float32)
    got = fa.flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rel), sel
    )
    want = xla_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rel), sel
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _interp(monkeypatch):
    orig = fa.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)
    # defeat the CPU->XLA-reference fallback so interpret mode exercises the
    # REAL kernel bodies on CPU
    monkeypatch.setattr(fa, "_on_cpu", lambda: False)


def _qkv_oracle(qkv, rel, sel, heads, d, scale):
    """Unpack the packed qkv and run the XLA rel@sel attention."""
    from camouflaged_vlm_tpu.ops.flash_attention import xla_attention_relpos

    *lead, N, _ = qkv.shape
    def split(i):
        t = qkv[..., i * heads * d : (i + 1) * heads * d]
        t = t.reshape(*lead, N, heads, d)
        return jnp.moveaxis(t, -2, -3)  # (..., heads, N, d)
    q, k, v = split(0), split(1), split(2)
    relh = jnp.moveaxis(rel.reshape(*lead, N, heads, -1), -2, -3)
    out = xla_attention_relpos(q * scale, k, v, relh, sel)
    return jnp.moveaxis(out, -3, -2).reshape(*lead, N, heads * d)


@pytest.mark.parametrize("heads,head_group", [(2, 2), (4, 2)])
def test_flash_qkv_windows_matches_oracle(rng, monkeypatch, heads, head_group):
    # (4, 2) exercises the multi-head-group BlockSpec indexing (n_hg == 2,
    # role * n_hg + g) that production ViT-H (16 heads / group 8) hits.
    _interp(monkeypatch)
    H = W = 4
    B, nwin, d = 2, 3, 32
    N = H * W
    qkv = rng.standard_normal((B, nwin, N, 3 * heads * d)).astype(np.float32) * 0.3
    rel = (rng.standard_normal((B, nwin, N, heads * (H + W))) * 0.1).astype(np.float32)
    sel = fa.make_rel_scatter(H, W, dtype=jnp.float32)
    scale = d ** -0.5
    got = fa.flash_qkv_relpos_windows(
        jnp.asarray(qkv).reshape(B, nwin, N, 3 * heads, d),
        jnp.asarray(rel).reshape(B, nwin, N, heads, H + W),
        sel, scale, head_group=head_group,
    )  # (B, heads, nwin, N, d)
    got = jnp.moveaxis(got, 1, 3).reshape(B, nwin, N, heads * d)
    want = _qkv_oracle(jnp.asarray(qkv), jnp.asarray(rel), sel, heads, d, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("heads,head_group", [(2, 2), (4, 2)])
def test_flash_qkv_global_matches_oracle(rng, monkeypatch, heads, head_group):
    _interp(monkeypatch)
    H = W = 16
    B, d = 2, 32
    N = H * W
    qkv = rng.standard_normal((B, N, 3 * heads * d)).astype(np.float32) * 0.3
    rel = (rng.standard_normal((B, N, heads * (H + W))) * 0.1).astype(np.float32)
    sel = fa.make_rel_scatter(H, W, dtype=jnp.float32)
    scale = d ** -0.5
    got = fa.flash_qkv_relpos_global(
        jnp.asarray(qkv).reshape(B, N, 3 * heads, d),
        jnp.asarray(rel).reshape(B, N, heads, H + W),
        sel, scale, block_q=128, head_group=head_group,
    )  # (B, heads, N, d)
    got = jnp.moveaxis(got, 1, 2).reshape(B, N, heads * d)
    want = _qkv_oracle(jnp.asarray(qkv), jnp.asarray(rel), sel, heads, d, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("heads,head_group", [(2, 2), (4, 2)])
def test_flash_qkv_packed_windows_matches_oracle(rng, monkeypatch, heads, head_group):
    """Packed-lane windows kernel (raw 3*heads*d layout, rel padded to 32
    lanes/head) == the unpacked oracle. d=64 keeps head_group*d lane-aligned
    (the kernel falls back to XLA otherwise); (4, 2) covers n_hg == 2."""
    _interp(monkeypatch)
    H = W = 4
    B, nwin, d = 2, 5, 64  # nwin=5 exercises the win_group=5 batched dots
    N = H * W
    hw = H + W
    qkv = rng.standard_normal((B, nwin, N, 3 * heads * d)).astype(np.float32) * 0.3
    rel = (rng.standard_normal((B, nwin, N, heads, hw)) * 0.1).astype(np.float32)
    sel = fa.make_rel_scatter(H, W, dtype=jnp.float32)
    scale = d ** -0.5
    rel_p = jnp.pad(jnp.asarray(rel), ((0, 0),) * 4 + ((0, 32 - hw),))
    sel32 = jnp.pad(sel, ((0, 32 - hw), (0, 0)))
    got = fa.flash_qkv_packed_windows(
        jnp.asarray(qkv), rel_p.reshape(B, nwin, N, heads * 32), sel32,
        scale, heads, d, head_group=head_group,
    )  # (B, nwin, heads*d, N) — d-major
    got = got.reshape(B, nwin, heads, d, N).transpose(0, 1, 4, 2, 3).reshape(
        B, nwin, N, heads * d
    )
    want = _qkv_oracle(
        jnp.asarray(qkv), jnp.asarray(rel).reshape(B, nwin, N, heads * hw),
        sel, heads, d, scale,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("heads,head_group", [(2, 2), (4, 2)])
def test_flash_qkv_packed_windows_s_matches_oracle(rng, monkeypatch, heads, head_group):
    """Position-major-rel windows kernel == the unpacked oracle. BW=16 with
    win_block=8 exercises the two-program grid; the rel arrives (N, BW,
    heads*32) as `rel_smajor_windows` emits it."""
    _interp(monkeypatch)
    H = W = 4
    BW, d = 16, 64
    N = H * W
    hw = H + W
    qkv = rng.standard_normal((BW, N, 3 * heads * d)).astype(np.float32) * 0.3
    rel = (rng.standard_normal((BW, N, heads, hw)) * 0.1).astype(np.float32)
    sel = fa.make_rel_scatter(H, W, dtype=jnp.float32)
    scale = d ** -0.5
    rel_p = jnp.pad(jnp.asarray(rel), ((0, 0),) * 3 + ((0, 32 - hw),))
    rel_s = rel_p.reshape(BW, N, heads * 32).transpose(1, 0, 2)
    sel32 = jnp.pad(sel, ((0, 32 - hw), (0, 0)))
    got = fa.flash_qkv_packed_windows_s(
        jnp.asarray(qkv), rel_s, sel32, scale, heads, d,
        head_group=head_group,
    )  # (BW, heads*d, N) — d-major
    got = got.reshape(BW, heads, d, N).transpose(0, 3, 1, 2).reshape(
        BW, N, heads * d
    )
    want = _qkv_oracle(
        jnp.asarray(qkv), jnp.asarray(rel).reshape(BW, N, heads * hw),
        sel, heads, d, scale,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_rel_smajor_windows_matches_rel_packed32(rng):
    """The kron-table s-major rel builder emits the SAME per-head packed
    factors as rel_packed32, transposed to position-major."""
    from camouflaged_vlm_tpu.models.sam_encoder import (
        rel_packed32, rel_smajor_windows,
    )

    win, heads, hd = 4, 4, 16
    BW, S = 6, win * win
    qkv = jnp.asarray(
        rng.standard_normal((BW, S, 3 * heads * hd)).astype(np.float32)
    )
    rph = jnp.asarray((rng.standard_normal((2 * win - 1, hd)) * 0.1).astype(np.float32))
    rpw = jnp.asarray((rng.standard_normal((2 * win - 1, hd)) * 0.1).astype(np.float32))
    qh = qkv[:, :, : heads * hd].reshape(BW, win, win, heads, hd)
    want, sel32_w = rel_packed32(qh, rph, rpw, win, win)
    want = want.reshape(BW, S, heads * 32).transpose(1, 0, 2)
    got, sel32 = rel_smajor_windows(qkv, rph, rpw, win, heads, hd, head_group=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sel32), np.asarray(sel32_w))


@pytest.mark.parametrize("heads,head_group", [(2, 2), (4, 2)])
def test_flash_qkv_packed_plain_matches_oracle(rng, monkeypatch, heads, head_group):
    """Plain packed-qkv attention kernel (CLIP path) == standard attention."""
    _interp(monkeypatch)
    B, L, d = 2, 37, 64  # odd L like CLIP's 581; d=64 keeps gd lane-aligned
    qkv = rng.standard_normal((B, L, 3 * heads * d)).astype(np.float32) * 0.3
    scale = d ** -0.5
    got = fa.flash_qkv_packed_plain(
        jnp.asarray(qkv), scale, heads, d, head_group=head_group
    )  # (B, heads*d, L) — d-major
    got = got.reshape(B, heads, d, L).transpose(0, 1, 3, 2)

    def split(i):
        t = qkv[..., i * heads * d : (i + 1) * heads * d].reshape(B, L, heads, d)
        return jnp.moveaxis(jnp.asarray(t), 1, 2)
    q, k, v = split(0), split(1), split(2)
    s = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k)
    p = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhqk,bhkc->bhqc", p, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("heads,head_group", [(2, 2), (4, 2)])
def test_flash_qkv_packed_global_matches_oracle(rng, monkeypatch, heads, head_group):
    """Packed-lane global kernel (raw 3*heads*d layout, q tiled) == oracle.

    The production shape needs (head_group*d) % 128 == 0 and (H+W) % 128 == 0;
    interpret mode can't afford 4096 tokens, so _LANE_ALIGN is shrunk to make
    the kernel path (not the XLA fallback) run on tiny shapes.
    """
    _interp(monkeypatch)
    monkeypatch.setattr(fa, "_LANE_ALIGN", 16)
    H = W = 8
    B, d = 2, 8
    N = H * W
    hw = H + W
    qkv = rng.standard_normal((B, N, 3 * heads * d)).astype(np.float32) * 0.3
    rel = (rng.standard_normal((B, N, heads * hw)) * 0.1).astype(np.float32)
    sel = fa.make_rel_scatter(H, W, dtype=jnp.float32)
    scale = d ** -0.5
    rel_s = jnp.asarray(rel).reshape(B, N, heads, hw).transpose(1, 0, 2, 3)
    got = fa.flash_qkv_packed_global(
        jnp.asarray(qkv), rel_s, sel, scale, heads, d, H=H, W=W,
        block_q=32, head_group=head_group,
    )  # (B, heads*d, N) — d-major
    got = got.reshape(B, heads, d, N).transpose(0, 3, 1, 2).reshape(B, N, heads * d)
    want = _qkv_oracle(jnp.asarray(qkv), jnp.asarray(rel), sel, heads, d, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ln_mask_linear_and_proj_res_kernels(rng, monkeypatch):
    """The block-fusion kernels: (LN(x)*mask)@w+b and head-proj+residual."""
    from camouflaged_vlm_tpu.ops import linear as lin

    orig = lin.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(lin.pl, "pallas_call", interp)

    # ln_mask_linear_bt: B'=B*nwin rows with per-window mask
    B0, nwin, S, K, N = 2, 3, 16, 32, 64
    x = jnp.asarray(rng.standard_normal((B0 * nwin, S, K)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, K)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.float32)
    mask = jnp.asarray((rng.random((nwin, S, 1)) > 0.3).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    got = lin.ln_mask_linear_bt(x, g, be, mask, w, b, eps=1e-6)

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
    m_full = jnp.tile(mask, (B0, 1, 1))
    want = (xn * m_full) @ w + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # ln_mlp_residual_bt: whole MLP in one kernel
    H = 4 * K
    w1 = jnp.asarray(rng.standard_normal((K, H)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((1, H)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, K)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)
    got = lin.ln_mlp_residual_bt(
        x, g, be, w1, b1, w2, b2, eps=1e-6, activation="gelu_tanh"
    )
    h = jax.nn.gelu(xn @ w1 + b1, approximate=True)
    want = h @ w2 + b2 + x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-4)

    # proj_from_heads_res
    B, heads, T, Sq, d, out = 2, 2, 3, 16, 8, 32
    x5 = jnp.asarray(rng.standard_normal((B, heads, T, Sq, d)), jnp.float32)
    wp = jnp.asarray(rng.standard_normal((heads, d, out)) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.standard_normal((1, out)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((B, T, Sq, out)), jnp.float32)
    got = lin.proj_from_heads_res(x5, wp, bp, res)
    want = jnp.einsum("bhtsd,hdo->btso", x5, wp) + bp + res
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ln_mlp_residual_hidden_grid_kernel(rng, monkeypatch):
    """hidden_grid > 1 (CLIP MLP: H walked as an 'arbitrary' grid axis with an
    f32 scratch accumulator) == the single-chunk kernel == the XLA math."""
    from camouflaged_vlm_tpu.ops import linear as lin

    orig = lin.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(lin.pl, "pallas_call", interp)
    monkeypatch.setattr(lin, "_on_cpu", lambda: False)
    monkeypatch.setattr(lin, "_HGRID_ALIGN", 16)

    B0, S, K = 2, 7, 16  # S prime like CLIP's 577 -> bs == S, grid (B, 1, n_h)
    H = 4 * K
    x = jnp.asarray(rng.standard_normal((B0, S, K)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, K)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, H)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((1, H)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, K)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)

    got = lin.ln_mlp_residual_bt(
        x, g, be, w1, b1, w2, b2, eps=1e-6, activation="quick_gelu",
        hidden_grid=4,
    )
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
    h = xn @ w1 + b1
    h = h * jax.nn.sigmoid(1.702 * h)
    want = h @ w2 + b2 + x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-4)

    # hidden_grid must not change the result vs the single-chunk kernel
    got1 = lin.ln_mlp_residual_bt(
        x, g, be, w1, b1, w2, b2, eps=1e-6, activation="quick_gelu",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(got1), rtol=2e-5,
                               atol=2e-4)


@pytest.mark.parametrize("act", ["gelu_tanh", "quick_gelu"])
def test_ln_mlp_residual_pallas_backward_matches_xla_grad(rng, monkeypatch, act):
    """ln_mlp_residual_bt's Pallas backward (dx/dh/hact/xn streamed, weight
    grads via XLA dgemms, LN-param grads via per-program partials) == XLA
    autodiff of the reference math, for EVERY input."""
    from camouflaged_vlm_tpu.ops import linear as lin

    orig = lin.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(lin.pl, "pallas_call", interp)
    monkeypatch.setattr(lin, "_on_cpu", lambda: False)

    B0, S, K = 2, 16, 24
    H = 4 * K
    x = jnp.asarray(rng.standard_normal((B0, S, K)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, K)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, H)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((1, H)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, K)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.float32)
    args = (x, g, be, w1, b1, w2, b2)

    def f(*a):
        return jnp.sum(
            lin.ln_mlp_residual_bt(*a, eps=1e-6, activation=act) ** 2
        )

    def ref(x, g, be, w1, b1, w2, b2):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        h = xn @ w1 + b1
        if act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=True)
        return jnp.sum((h @ w2 + b2 + x) ** 2)

    got = jax.grad(f, tuple(range(7)))(*args)
    want = jax.grad(ref, tuple(range(7)))(*args)
    for i, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"arg {i}",
        )


def test_global_pallas_backward_matches_xla_grad(rng, monkeypatch):
    """flash_qkv_packed_global's hand-written Pallas backward (flash-style,
    dk/dv accumulated across q-blocks in f32 scratch) == XLA autodiff of the
    reference formulation, for qkv AND the position-major rel."""
    _interp(monkeypatch)
    monkeypatch.setattr(fa, "_LANE_ALIGN", 16)

    H = W = 8
    B, heads, d = 2, 2, 8
    N = H * W
    hw = H + W
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * heads * d)) * 0.3, jnp.float32)
    rel_s = jnp.asarray(rng.standard_normal((N, B, heads, hw)) * 0.1, jnp.float32)
    sel = fa.make_rel_scatter(H, W, dtype=jnp.float32)
    scale = d ** -0.5

    def f(qkv, rel_s):
        out = fa.flash_qkv_packed_global(
            qkv, rel_s, sel, scale, heads, d, H=H, W=W,
            block_q=32, head_group=heads,  # 2 q-blocks exercise the scratch accumulation
        )
        return jnp.sum(out ** 2)

    def g(qkv, rel_s):
        r = qkv.reshape(B, N, 3, heads, d)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * scale
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)
        relh = rel_s.transpose(1, 2, 0, 3)
        o = fa.xla_attention_relpos(q, k, v, relh, sel)
        out = o.transpose(0, 1, 3, 2).reshape(B, heads * d, N)
        return jnp.sum(out ** 2)

    got = jax.grad(f, (0, 1))(qkv, rel_s)
    want = jax.grad(g, (0, 1))(qkv, rel_s)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=3e-4, atol=3e-4)


def test_rel_packed32_equals_rel_and_scatter(rng):
    """Combined-table single-einsum rel == two-einsum+concat+pad rel."""
    from camouflaged_vlm_tpu.models.sam_encoder import rel_and_scatter, rel_packed32

    H, W, heads, d = 14, 14, 3, 16
    q = jnp.asarray(rng.standard_normal((2, H, W, heads, d)), jnp.float32)
    rel_h = jnp.asarray(rng.standard_normal((2 * H - 1, d)) * 0.1, jnp.float32)
    rel_w = jnp.asarray(rng.standard_normal((2 * W - 1, d)) * 0.1, jnp.float32)

    rel, sel = rel_and_scatter(q, rel_h, rel_w, H, W)
    want_rel = jnp.pad(rel, ((0, 0),) * 4 + ((0, 32 - (H + W)),))
    want_sel = jnp.pad(sel, ((0, 32 - (H + W)), (0, 0)))
    got_rel, got_sel = rel_packed32(q, rel_h, rel_w, H, W)
    np.testing.assert_allclose(np.asarray(got_rel), np.asarray(want_rel), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got_sel), np.asarray(want_sel))


def test_kernels_differentiable_match_xla_grad(rng, monkeypatch):
    """Pallas kernels carry custom_vjp (backward = XLA formulation): training
    differentiates through every encoder block, so jax.grad must work and
    match the pure-XLA gradient."""
    _interp(monkeypatch)
    from camouflaged_vlm_tpu.ops import linear as lin

    orig = lin.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(lin.pl, "pallas_call", interp)

    # linear_pallas grad
    M, K, N = 128, 64, 128
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    f = lambda x, w, b: jnp.sum(lin.linear_pallas(x, w, b, block_m=64, block_n=128) ** 2)
    g = lambda x, w, b: jnp.sum((x @ w + b) ** 2)
    for got, want in zip(jax.grad(f, (0, 1, 2))(x, w, b), jax.grad(g, (0, 1, 2))(x, w, b)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # packed windows attention grad
    H = W = 4
    B, nwin, heads, d = 1, 2, 2, 32
    Nn = H * W
    hw = H + W
    qkv = jnp.asarray(rng.standard_normal((B, nwin, Nn, 3 * heads * d)) * 0.3, jnp.float32)
    rel = jnp.asarray(rng.standard_normal((B, nwin, Nn, heads, hw)) * 0.1, jnp.float32)
    sel = fa.make_rel_scatter(H, W, dtype=jnp.float32)
    rel_p = jnp.pad(rel, ((0, 0),) * 4 + ((0, 32 - hw),)).reshape(B, nwin, Nn, heads * 32)
    sel32 = jnp.pad(sel, ((0, 32 - hw), (0, 0)))
    scale = d ** -0.5

    def f2(qkv, rel_p):
        return jnp.sum(
            fa.flash_qkv_packed_windows(qkv, rel_p, sel32, scale, heads, d, head_group=heads) ** 2
        )

    def g2(qkv, rel_p):
        out = _qkv_oracle(qkv, rel.reshape(B, nwin, Nn, heads * hw), sel, heads, d, scale)
        return jnp.sum(out ** 2)

    got = jax.grad(f2, (0, 1))(qkv, rel_p)
    want_qkv = jax.grad(g2, (0, 1))(qkv, rel_p)[0]
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want_qkv), rtol=3e-4, atol=3e-4)


def test_windows_s_pallas_backward_matches_xla_grad(rng, monkeypatch):
    """flash_qkv_packed_windows_s carries a hand-written Pallas BACKWARD
    kernel (flash-style: probabilities recomputed in VMEM). Its gradients
    for qkv AND the position-major rel must match XLA autodiff of the
    reference formulation."""
    _interp(monkeypatch)
    monkeypatch.setattr(fa, "_LANE_ALIGN", 16)

    H = W = 4
    BW, heads, d = 8, 2, 8  # BW % win_block == 0 keeps the kernel path
    Nn = H * W
    hw = H + W
    qkv = jnp.asarray(rng.standard_normal((BW, Nn, 3 * heads * d)) * 0.3, jnp.float32)
    rel = jnp.asarray(rng.standard_normal((BW, Nn, heads, hw)) * 0.1, jnp.float32)
    sel = fa.make_rel_scatter(H, W, dtype=jnp.float32)
    sel32 = jnp.pad(sel, ((0, 32 - hw), (0, 0)))
    rel_s = jnp.pad(rel, ((0, 0), (0, 0), (0, 0), (0, 32 - hw))).reshape(
        BW, Nn, heads * 32
    ).transpose(1, 0, 2)  # (Nw, BW, heads*32) position-major
    scale = d ** -0.5

    def f(qkv, rel_s):
        out = fa.flash_qkv_packed_windows_s(
            qkv, rel_s, sel32, scale, heads, d, head_group=heads, win_block=8
        )
        return jnp.sum(out ** 2)

    def g(qkv, rel_s):
        relh = rel_s.reshape(Nn, BW, heads, 32).transpose(1, 2, 0, 3)
        r = qkv.reshape(BW, Nn, 3, heads, d)
        q = jnp.moveaxis(r[:, :, 0], 2, 1) * scale
        k = jnp.moveaxis(r[:, :, 1], 2, 1)
        v = jnp.moveaxis(r[:, :, 2], 2, 1)
        o = fa.xla_attention_relpos(q, k, v, relh, sel32)
        out = o.transpose(0, 1, 3, 2).reshape(BW, heads * d, Nn)
        return jnp.sum(out ** 2)

    got = jax.grad(f, (0, 1))(qkv, rel_s)
    want = jax.grad(g, (0, 1))(qkv, rel_s)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=3e-4, atol=3e-4)


def test_const_shift_softmax_out_of_band_scores_stay_finite(monkeypatch):
    """The const-shift kernels clamp exp's argument (`_shift_exp`): scores
    far outside the (SHIFT-87, SHIFT+88) exactness band — a diverging run,
    an LR spike — must saturate to finite probabilities instead of the
    unguarded inf/inf = NaN (which only reproduced on the TPU kernel path;
    the XLA ref keeps max-subtract)."""
    _interp(monkeypatch)
    heads, head_group = 2, 2
    H = W = 4
    BW, d = 8, 64
    N = H * W
    hw = H + W
    scale = d ** -0.5
    sel32 = jnp.pad(fa.make_rel_scatter(H, W, dtype=jnp.float32),
                    ((0, 32 - hw), (0, 0)))
    rel_s = jnp.zeros((N, BW, heads * 32), jnp.float32)

    for ksign, regime in [(+1.0, "overflow"), (-1.0, "underflow")]:
        # constant q/k blocks -> every score is ±c^2*d*scale ~ ±200,
        # far outside the band in both directions
        qkv = np.zeros((BW, N, 3 * heads * d), np.float32)
        qkv[:, :, : heads * d] = 5.0
        qkv[:, :, heads * d : 2 * heads * d] = 5.0 * ksign
        qkv[:, :, 2 * heads * d :] = 1.0  # v
        got = fa.flash_qkv_packed_windows_s(
            jnp.asarray(qkv), rel_s, sel32, scale, heads, d,
            head_group=head_group,
        )
        assert np.isfinite(np.asarray(got)).all(), regime
        # probabilities saturate uniform here (all scores equal), so the
        # output is exactly v's value
        np.testing.assert_allclose(np.asarray(got), 1.0, atol=1e-4)
