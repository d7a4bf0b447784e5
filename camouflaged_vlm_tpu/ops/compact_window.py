"""Compact (pad-free) window layout for windowed ViT attention.

The reference pads the token grid up to a multiple of the window size before
every windowed attention and crops afterwards
(`/root/reference/models/mmseg/models/sam/image_encoder.py:507-553`): SAM
ViT-H runs 64x64 tokens as 70x70 = 25 windows of 196 tokens, so every
row-wise op (qkv, MLP, proj) processes 4900 rows where only 4096 are real —
a ~20% FLOP/bandwidth tax (~47 ms/pass at batch 8, measured round 2).

This module removes the pad rows entirely. Key observation: the reference
applies LN1 on the UNPADDED grid and pads with zeros afterwards
(`image_encoder.py:433-439`), so a pad token enters the qkv projection as an
exact zero row — its k and v equal the qkv BIAS, a per-head constant, and
its attention-score contribution to a real query q at window position
(qh, qw) is

    s_pad(kh, kw) = (q . k_bias) * scale + rel_h[qh, kh] + rel_w[qw, kw].

Within each partially-padded window the pad positions form a union of at
most two PRODUCT sets (rows x cols), so the total pad probability mass per
query collapses to a closed form:

    sum_pad exp(s_pad) = exp(q.k_bias*scale) * (sum_kh e^rel_h)(sum_kw e^rel_w)

summed over the product terms — i.e. ONE virtual key per query whose logit
`Lpad = log sum_pad exp(s_pad)` is computed from the (already materialised)
rel-pos factors, and whose value is the constant v_bias. Softmax over
[real keys | virtual pad key] is algebraically identical to the reference's
softmax over the padded window.

Layout: a windowed run carries two tensors instead of one padded one —

    x_full: (B * n_full, win*win, C)   interior windows (all tokens real)
    x_edge: (B, E, C)                  right-edge | bottom-edge | corner
                                       windows' real tokens, window-major,
                                       row-major within each window

ViT-H: n_full = 16 (3136 rows), E = 960 -> 4096 rows/image vs 4900 padded.
Row-wise kernels run on both tensors with no validity mask (there is nothing
to mask); only the edge-window attention kernel knows pads ever existed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Lane layout of the packed rel factors (see sam_encoder.rel_packed32): per
# head, lanes [0, win) hold rel_h over kh, [win, 2*win) hold rel_w over kw.
# Lane LPAD_LANE carries the precomputed virtual-pad-key logit; the scatter
# matrices keep that row zero so it never pollutes real-key scores.
REL_LANES = 32
LPAD_LANE = 28


@dataclasses.dataclass(frozen=True)
class EdgeGroup:
    """One attention-kernel call: `n` windows of `nr` x `nc` real tokens.

    `terms` lists the pad-position product sets of each window as
    (kh_lo, kh_hi, kw_lo, kw_hi) ranges in window coordinates; a window's
    terms tuple may be shorter than another's (corner has two)."""

    n: int
    nr: int
    nc: int
    terms: Tuple[Tuple[int, int, int, int], ...]

    @property
    def rows(self) -> int:
        return self.n * self.nr * self.nc


@dataclasses.dataclass(frozen=True)
class CompactGeometry:
    """Static description of the compact window layout for an (H, W) grid."""

    H: int
    W: int
    win: int

    @property
    def nh(self) -> int:  # full-window grid height
        return self.H // self.win

    @property
    def nw(self) -> int:
        return self.W // self.win

    @property
    def rb(self) -> int:  # bottom-edge real rows
        return self.H % self.win

    @property
    def rw(self) -> int:  # right-edge real cols
        return self.W % self.win

    @property
    def n_full(self) -> int:
        return self.nh * self.nw

    @property
    def has_edge(self) -> bool:
        return self.rb > 0 or self.rw > 0

    @property
    def edge_groups(self) -> Tuple[EdgeGroup, ...]:
        """Right-edge, bottom-edge, corner window groups (row order of
        x_edge). Adjacent groups with equal per-window row counts are safe to
        merge at the kernel-call level; see `call_groups`."""
        k, nh, nw, rb, rw = self.win, self.nh, self.nw, self.rb, self.rw
        groups = []
        if rw:
            groups.append(EdgeGroup(nh, k, rw, ((0, k, rw, k),)))
        if rb:
            groups.append(EdgeGroup(nw, rb, k, ((rb, k, 0, k),)))
        if rb and rw:
            groups.append(EdgeGroup(1, rb, rw, ((rb, k, 0, k), (0, rb, rw, k))))
        return tuple(groups)

    @property
    def call_groups(self) -> Tuple[Tuple[EdgeGroup, ...], ...]:
        """edge_groups partitioned into kernel calls: adjacent groups whose
        windows have equal row counts share one call (ViT-H: the 4 right +
        4 bottom windows are all 112 rows -> one call + the 64-row corner)."""
        calls = []
        for g in self.edge_groups:
            if calls and calls[-1][0].nr * calls[-1][0].nc == g.nr * g.nc:
                calls[-1].append(g)
            else:
                calls.append([g])
        return tuple(tuple(c) for c in calls)

    @property
    def E(self) -> int:
        return sum(g.rows for g in self.edge_groups)

    def supported(self) -> bool:
        """Packed rel layout must fit kh+kw lanes below LPAD_LANE."""
        return 2 * self.win <= LPAD_LANE


def compact_partition(
    x: jnp.ndarray, geom: CompactGeometry
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B, H, W, C) -> (x_full (B*n_full, win^2, C), x_edge (B, E, C)|None)."""
    B, H, W, C = x.shape
    k, nh, nw, rb, rw = geom.win, geom.nh, geom.nw, geom.rb, geom.rw
    fh, fw = nh * k, nw * k
    xf = (
        x[:, :fh, :fw]
        .reshape(B, nh, k, nw, k, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B * nh * nw, k * k, C)
    )
    parts = []
    if rw:
        # (B, nh, k, rw, C) is already window-major row-major -> pure reshape
        parts.append(x[:, :fh, fw:].reshape(B, nh * k * rw, C))
    if rb:
        parts.append(
            x[:, fh:, :fw]
            .reshape(B, rb, nw, k, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(B, nw * rb * k, C)
        )
    if rb and rw:
        parts.append(x[:, fh:, fw:].reshape(B, rb * rw, C))
    xe = jnp.concatenate(parts, axis=1) if parts else None
    return xf, xe


def compact_unpartition(
    xf: jnp.ndarray, xe: Optional[jnp.ndarray], geom: CompactGeometry
) -> jnp.ndarray:
    """Inverse of :func:`compact_partition` -> (B, H, W, C)."""
    k, nh, nw, rb, rw = geom.win, geom.nh, geom.nw, geom.rb, geom.rw
    C = xf.shape[-1]
    fh, fw = nh * k, nw * k
    B = xf.shape[0] // (nh * nw)
    full = (
        xf.reshape(B, nh, nw, k, k, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, fh, fw, C)
    )
    if xe is None:
        return full
    off = 0
    top, bot = full, None
    if rw:
        right = xe[:, : nh * k * rw].reshape(B, fh, rw, C)
        off += nh * k * rw
        top = jnp.concatenate([full, right], axis=2)
    if rb:
        bottom = (
            xe[:, off : off + nw * rb * k]
            .reshape(B, nw, rb, k, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(B, rb, fw, C)
        )
        off += nw * rb * k
        bot = bottom
        if rw:
            corner = xe[:, off:].reshape(B, rb, rw, C)
            bot = jnp.concatenate([bottom, corner], axis=2)
    return jnp.concatenate([top, bot], axis=1) if bot is not None else top


@functools.lru_cache(maxsize=None)
def _edge_sel_np(win: int, nr: int, nc: int) -> np.ndarray:
    """(REL_LANES, nr*nc) scatter: lane a < win -> keys with kh == a, lane
    win+b -> keys with kw == b (row/col-major key order). Rows >= 2*win stay
    zero, so the Lpad lane never reaches real-key scores."""
    n = nr * nc
    kh = np.arange(n) // nc
    kw = np.arange(n) % nc
    sel = np.zeros((REL_LANES, n), np.float32)
    for a in range(nr):
        sel[a, kh == a] = 1.0
    for b in range(nc):
        sel[win + b, kw == b] = 1.0
    return sel


def edge_call_sel(geom: CompactGeometry, call: Tuple[EdgeGroup, ...], dtype):
    """Per-window scatter constants for one kernel call: (n, REL_LANES, R)."""
    mats = []
    for g in call:
        mats += [_edge_sel_np(geom.win, g.nr, g.nc)] * g.n
    return jnp.asarray(np.stack(mats), dtype)


def _lse(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """logsumexp over lane slice [lo, hi) of the trailing axis."""
    return jax.nn.logsumexp(x[..., lo:hi], axis=-1)


def edge_rel_lpad(
    q_edge: jnp.ndarray,     # (B, E, heads, hd) — UNSCALED queries
    rcomb: jnp.ndarray,      # (win, win, hd, REL_LANES) combined rel table
    k_bias: jnp.ndarray,     # (heads, hd) — k slice of the qkv bias
    scale: float,
    geom: CompactGeometry,
) -> jnp.ndarray:
    """Packed rel factors for the edge windows with the virtual-pad-key logit
    written into lane LPAD_LANE. Returns (B, E, heads, REL_LANES) in q.dtype.

    Per edge window type the pad positions are a union of <=2 product sets
    (kh range x kw range); `Lpad = logsumexp_t [ q.k_bias*scale
    + LSE(rel_h over kh_t) + LSE(rel_w over kw_t) ]` — exactly
    `log sum_pad exp(s_pad)` of the reference's padded-window scores."""
    B, E, heads, hd = q_edge.shape
    win = geom.win
    kb = k_bias.astype(q_edge.dtype)
    out = []
    off = 0
    for g in geom.edge_groups:
        qp = q_edge[:, off : off + g.rows].reshape(B, g.n, g.nr, g.nc, heads, hd)
        off += g.rows
        rel = jnp.einsum("bnhwxc,hwcj->bnhwxj", qp, rcomb[: g.nr, : g.nc])
        qkb = jnp.einsum("bnhwxc,xc->bnhwx", qp, kb).astype(jnp.float32) * scale
        relf = rel.astype(jnp.float32)
        lp = None
        for (hlo, hhi, wlo, whi) in g.terms:
            t = qkb + _lse(relf, hlo, hhi) + _lse(relf, win + wlo, win + whi)
            lp = t if lp is None else jnp.logaddexp(lp, t)
        rel = rel.at[..., LPAD_LANE].set(lp.astype(rel.dtype))
        out.append(rel.reshape(B, g.rows, heads, REL_LANES))
    return jnp.concatenate(out, axis=1)


def edge_attention_literal(
    qkv_edge: jnp.ndarray,   # (B, E, 3*heads*hd) — packed qkv of real tokens
    qkv_bias: jnp.ndarray,   # (3*heads*hd,) — fp32 qkv projection bias
    rel_pos_h: jnp.ndarray,  # (2*win-1, hd)
    rel_pos_w: jnp.ndarray,
    scale: float,
    heads: int,
    geom: CompactGeometry,
) -> jnp.ndarray:
    """Test oracle: reconstruct each padded window LITERALLY (pad k/v rows =
    qkv bias, exactly what the reference's zero-pad + qkv produces), run
    dense rel-pos attention over all win^2 keys, return only real-query rows.
    Output (B, heads, E, hd). Mirrors the reference block semantics
    (`image_encoder.py:433-446`) without the compact factorisation — used to
    verify the analytic virtual-pad-key path."""
    from .rel_pos import attention_with_decomposed_rel_pos

    B, E, _ = qkv_edge.shape
    win = geom.win
    hd = qkv_edge.shape[-1] // (3 * heads)
    dt = qkv_edge.dtype
    bias_row = qkv_bias.astype(dt)  # (3*heads*hd,)
    outs = []
    off = 0
    for g in geom.edge_groups:
        rows = g.nr * g.nc
        qkv_w = qkv_edge[:, off : off + g.rows].reshape(B, g.n, g.nr, g.nc, -1)
        off += g.rows
        # scatter real rows into the win x win window; pads = the bias row
        pad = jnp.broadcast_to(bias_row, (B, g.n, win, win, bias_row.shape[0]))
        full = pad.at[:, :, : g.nr, : g.nc, :].set(qkv_w)
        full = full.reshape(B, g.n, win * win, 3, heads, hd)
        q = jnp.moveaxis(full[..., 0, :, :], 3, 2)  # (B, n, heads, win^2, hd)
        k = jnp.moveaxis(full[..., 1, :, :], 3, 2)
        v = jnp.moveaxis(full[..., 2, :, :], 3, 2)
        o = attention_with_decomposed_rel_pos(
            q, k, v, rel_pos_h, rel_pos_w, (win, win), scale
        )  # (B, n, heads, win^2, hd)
        o = o.reshape(B, g.n, heads, win, win, hd)[:, :, :, : g.nr, : g.nc]
        o = jnp.moveaxis(o, 2, 1).reshape(B, heads, g.n, g.nr * g.nc, hd)
        # heads-leading, window-major real rows
        outs.append(o.reshape(B, heads, g.rows, hd))
    return jnp.concatenate(outs, axis=2)
