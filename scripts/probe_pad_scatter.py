"""Feasibility probe for the pad-row-removal project (next round): cost of
rebuilding the padded window layout (B, 25, 196, 3840) from a compact
real-token tensor + bias fill, as XLA slice-concats of contiguous runs.

If this costs <~0.5 ms/block, running MLP/qkv on 4096 instead of 4900 rows
(~-50 ms/pass) nets a win."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    B, D = 8, 3840
    # run structure of the 64x64 grid under 14x14 windows (window-major,
    # valid tokens only): full windows 196, bottom-edge 112 contiguous,
    # right-edge 14 runs of 8, corner 8 runs of 8
    runs = []  # (window, dst_offset_in_window, length) in compact order
    for wh in range(5):
        for ww in range(5):
            win = wh * 5 + ww
            qh_max = 14 if wh < 4 else 8
            qw_max = 14 if ww < 4 else 8
            if qw_max == 14:
                runs.append((win, 0, qh_max * 14))
            else:
                for qh in range(qh_max):
                    runs.append((win, qh * 14, qw_max))
    n_real = sum(r[2] for r in runs)
    assert n_real == 4096, n_real

    rng = np.random.default_rng(0)
    compact = jnp.asarray(rng.standard_normal((B, n_real, D)) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((1, 1, D)) * 0.1, jnp.bfloat16)

    @jax.jit
    def scatter(compact, bias):
        pieces = []
        src = 0
        cur_win, cur_off = 0, 0
        for win, off, ln in runs:
            while cur_win < win:  # fill the rest of the previous window
                if cur_off < 196:
                    pieces.append(jnp.broadcast_to(bias, (B, 196 - cur_off, D)))
                cur_win += 1
                cur_off = 0
            if off > cur_off:
                pieces.append(jnp.broadcast_to(bias, (B, off - cur_off, D)))
            pieces.append(jax.lax.dynamic_slice_in_dim(compact, src, ln, axis=1))
            src += ln
            cur_off = off + ln
        if cur_off < 196:
            pieces.append(jnp.broadcast_to(bias, (B, 196 - cur_off, D)))
        padded = jnp.concatenate(pieces, axis=1)  # (B, 4900, D)
        return padded.reshape(B, 25, 196, D)

    out = scatter(compact, bias)
    float(jnp.sum(out[0, 0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [scatter(compact, bias) for _ in range(20)]
    float(jnp.sum(outs[-1][0, 0, 0].astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / 20 * 1e3
    gb = out.size * 2 * 2 / 1e9
    print(f"pad scatter: {ms:.3f} ms/block ({len(runs)} runs; {gb:.2f} GB r+w -> {gb/ms*1e3:.0f} GB/s)")

    # the inverse gather (attention output, head-leading d=80)
    heads, d = 16, 80
    padded_o = jnp.asarray(rng.standard_normal((B, heads, 25, 196, d)) * 0.1, jnp.bfloat16)

    @jax.jit
    def gather(padded_o):
        pieces = []
        for win, off, ln in runs:
            pieces.append(
                jax.lax.dynamic_slice(
                    padded_o, (0, 0, win, off, 0), (B, heads, 1, ln, d)
                )[:, :, 0]
            )
        return jnp.concatenate(pieces, axis=2)  # (B, heads, 4096, d)

    out2 = gather(padded_o)
    float(jnp.sum(out2[0, 0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [gather(padded_o) for _ in range(20)]
    float(jnp.sum(outs[-1][0, 0, 0].astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"out gather : {ms:.3f} ms/block ({out2.size*2*2/1e9:.2f} GB r+w)")


if __name__ == "__main__":
    main()
