"""Pallas linear layers for the ViT attention data path.

Why these exist: XLA's convolution fusions prefer batch-minor output layouts,
and `pallas_call` constrains its operands to the default (row-major) layout —
so feeding an XLA-produced qkv projection into the attention kernels makes
XLA insert a full layout copy + reshape of the ~300 MB qkv tensor per block
(measured ~2.9 ms/block at batch 8). Producing qkv with a Pallas matmul keeps
everything in the default layout: the 5D head-view reshape becomes a free
bitcast and the copies vanish. Symmetrically, `proj_from_heads` consumes the
attention kernels' head-leading (B, heads, M, d) output directly, folding the
moveaxis + proj-input relayout into the projection matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vjp import pallas_with_xla_vjp


def _apply_act(acc, activation):
    if activation == "gelu_tanh":
        return jax.nn.gelu(acc, approximate=True)
    if activation == "gelu":
        return jax.nn.gelu(acc, approximate=False)
    if activation == "quick_gelu":
        return acc * jax.nn.sigmoid(1.702 * acc)
    return acc


def _linear_kernel(activation, x_ref, w_ref, b_ref, o_ref):
    acc = jax.lax.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )  # (bm, bn)
    acc = _apply_act(acc + b_ref[:].astype(jnp.float32), activation)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pick_block(M: int, target: int) -> int:
    """Largest multiple-of-8 divisor of M that is <= target (Mosaic needs the
    second-to-last block dim divisible by 8 or equal to the array dim)."""
    if M % 8 != 0 or M <= target:
        return M
    best = 8
    for bm in range(8, target + 1, 8):
        if M % bm == 0:
            best = bm
    return best


def linear_pallas(
    x: jnp.ndarray,   # (M, K)
    w: jnp.ndarray,   # (K, N)
    b: jnp.ndarray,   # (1, N)
    block_m: int = 512,
    block_n: int = 1920,
    activation: str | None = None,
) -> jnp.ndarray:
    """out = activation(x @ w + b), tiled (block_m, K) x (K, block_n).

    Grid is (N-tiles, M-tiles) with M innermost so each weight column block
    stays VMEM-resident across the whole M sweep.
    """
    M, K = x.shape
    N = w.shape[1]
    orig_m = M
    block_m = max(8, (block_m // 8) * 8)
    bm = _pick_block(M, block_m) if M % 8 == 0 else M
    if bm % 8 != 0 or bm > 2 * block_m:
        # no multiple-of-8 tile divides M (e.g. M=4900 at batch 1) —
        # zero-pad rows to the next block boundary and slice after
        pad_to = -(-M // block_m) * block_m
        x = jnp.pad(x, ((0, pad_to - M), (0, 0)))
        M, bm = pad_to, block_m
    block_m = bm
    if N % block_n != 0:
        block_n = N
    kernel = functools.partial(_linear_kernel, activation)

    def ref(x, w, b):
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc = _apply_act(acc + b.astype(jnp.float32), activation)
        return acc.astype(x.dtype)

    run = lambda x, w, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(N // block_n, M // block_m),
            in_specs=[
                pl.BlockSpec((block_m, K), lambda n, m: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_n), lambda n, m: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda n, m: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_m, block_n), lambda n, m: (m, n), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=(x.size + M * N) * x.dtype.itemsize
            + w.size * w.dtype.itemsize * max(1, M // block_m // 8),
            transcendentals=M * N if activation else 0,
        ),
    )(x, w, b)
    out = pallas_with_xla_vjp(run, ref)(x, w, b)
    return out[:orig_m] if orig_m != M else out


def _ln_linear_gelu_kernel(eps, approximate, x_ref, g_ref, be_ref, w_ref, b_ref, o_ref):
    # LN(x) row-wise in fp32, then matmul + bias + GELU — one VMEM pass.
    x = x_ref[:].astype(jnp.float32)  # (bm, K)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[:].astype(jnp.float32) + be_ref[:].astype(jnp.float32)
    acc = jax.lax.dot(
        xn.astype(o_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
    )
    acc += b_ref[:].astype(jnp.float32)
    acc = jax.nn.gelu(acc, approximate=approximate)
    o_ref[:] = acc.astype(o_ref.dtype)


def ln_linear_gelu_pallas(
    x: jnp.ndarray,       # (M, K)
    gamma: jnp.ndarray,   # (1, K) LN scale
    beta: jnp.ndarray,    # (1, K) LN bias
    w: jnp.ndarray,       # (K, N)
    b: jnp.ndarray,       # (1, N)
    eps: float = 1e-6,
    approximate: bool = True,
    block_m: int = 512,
    block_n: int = 2560,
) -> jnp.ndarray:
    """gelu(LN(x) @ w + b) — the ViT MLP's first half with the layer norm
    folded in (the standalone LN fusion costs an extra HBM round trip and the
    erf/tanh GELU stalls XLA's matmul fusion epilogue)."""
    M, K = x.shape
    N = w.shape[1]
    block_m = _pick_block(M, block_m)
    if N % block_n != 0:
        block_n = N
    kernel = functools.partial(_ln_linear_gelu_kernel, eps, approximate)

    def ref(x, gamma, beta, w, b):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        acc = jnp.dot(xn.astype(x.dtype), w, preferred_element_type=jnp.float32)
        acc = jax.nn.gelu(acc + b.astype(jnp.float32), approximate=approximate)
        return acc.astype(x.dtype)

    run = lambda x, gamma, beta, w, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(N // block_n, M // block_m),
            in_specs=[
                pl.BlockSpec((block_m, K), lambda n, m: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda n, m: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda n, m: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_n), lambda n, m: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda n, m: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_m, block_n), lambda n, m: (m, n), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=(x.size * max(1, N // block_n) + M * N) * x.dtype.itemsize,
            transcendentals=M * N,
        ),
    )(x, gamma, beta, w, b)
    return pallas_with_xla_vjp(run, ref)(x, gamma, beta, w, b)


def _linear_residual_kernel(x_ref, w_ref, b_ref, r_ref, o_ref):
    acc = jax.lax.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )
    acc += b_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def linear_residual_pallas(
    x: jnp.ndarray,    # (M, K)
    w: jnp.ndarray,    # (K, N)
    b: jnp.ndarray,    # (1, N)
    res: jnp.ndarray,  # (M, N) — residual added to the output
    block_m: int = 256,
    block_n: int = 1280,
) -> jnp.ndarray:
    """x @ w + b + res — the ViT MLP's second half with the residual folded
    into the matmul epilogue (keeps K=4*dim rows VMEM-resident)."""
    M, K = x.shape
    N = w.shape[1]
    block_m = _pick_block(M, block_m)
    if N % block_n != 0:
        block_n = N

    def ref(x, w, b, res):
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc = acc + b.astype(jnp.float32) + res.astype(jnp.float32)
        return acc.astype(x.dtype)

    run = lambda x, w, b, res: pl.pallas_call(
        _linear_residual_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(N // block_n, M // block_m),
            in_specs=[
                pl.BlockSpec((block_m, K), lambda n, m: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_n), lambda n, m: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda n, m: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, block_n), lambda n, m: (m, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_m, block_n), lambda n, m: (m, n), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=(x.size + M * N * 2) * x.dtype.itemsize
            + w.size * w.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w, b, res)
    return pallas_with_xla_vjp(run, ref)(x, w, b, res)


def _linear_bt_kernel(activation, x_ref, w_ref, b_ref, o_ref):
    acc = jax.lax.dot(
        x_ref[0], w_ref[:], preferred_element_type=jnp.float32
    )  # (S, bn)
    acc = _apply_act(acc + b_ref[:].astype(jnp.float32), activation)
    o_ref[0] = acc.astype(o_ref.dtype)


def linear_pallas_bt(
    x: jnp.ndarray,   # (B, S, K) — S may be any length (== full block dim)
    w: jnp.ndarray,   # (K, N)
    b: jnp.ndarray,   # (1, N)
    block_n: int = 1536,
    activation: str | None = None,
) -> jnp.ndarray:
    """Batched-rows variant of linear_pallas for odd sequence lengths (e.g.
    CLIP's 581 tokens): the S axis is covered whole per block, so it needs no
    divisibility; the grid tiles (N, B)."""
    B, S, K = x.shape
    N = w.shape[1]
    if N % block_n != 0:
        block_n = N
    kernel = functools.partial(_linear_bt_kernel, activation)

    def ref(x, w, b):
        acc = jnp.einsum("bsk,kn->bsn", x, w, preferred_element_type=jnp.float32)
        acc = _apply_act(acc + b.astype(jnp.float32), activation)
        return acc.astype(x.dtype)

    run = lambda x, w, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(N // block_n, B),
            in_specs=[
                pl.BlockSpec((1, S, K), lambda n, b_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_n), lambda n, b_: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda n, b_: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, S, block_n), lambda n, b_: (b_, 0, n), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * K * N,
            bytes_accessed=(x.size + B * S * N) * x.dtype.itemsize,
            transcendentals=B * S * N if activation else 0,
        ),
    )(x, w, b)
    return pallas_with_xla_vjp(run, ref)(x, w, b)


def _ln_linear_act_bt_kernel(eps, activation, x_ref, g_ref, be_ref, w_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (S, K)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[:].astype(jnp.float32) + be_ref[:].astype(jnp.float32)
    acc = jax.lax.dot(
        xn.astype(o_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
    )
    acc = _apply_act(acc + b_ref[:].astype(jnp.float32), activation)
    o_ref[0] = acc.astype(o_ref.dtype)


def ln_linear_act_bt(
    x: jnp.ndarray,       # (B, S, K) — S may be any length
    gamma: jnp.ndarray,   # (1, K)
    beta: jnp.ndarray,    # (1, K)
    w: jnp.ndarray,       # (K, N)
    b: jnp.ndarray,       # (1, N)
    eps: float = 1e-5,
    activation: str | None = "quick_gelu",
    block_n: int = 2048,
) -> jnp.ndarray:
    """act(LN(x) @ w + b) for batched odd-length sequences (CLIP MLP half 1:
    LN folds into the matmul prologue, QuickGELU into the epilogue)."""
    B, S, K = x.shape
    N = w.shape[1]
    if N % block_n != 0:
        block_n = N
    kernel = functools.partial(_ln_linear_act_bt_kernel, eps, activation)

    def ref(x, gamma, beta, w, b):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        acc = jnp.einsum(
            "bsk,kn->bsn", xn.astype(x.dtype), w, preferred_element_type=jnp.float32
        )
        return _apply_act(acc + b.astype(jnp.float32), activation).astype(x.dtype)

    run = lambda x, gamma, beta, w, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(N // block_n, B),
            in_specs=[
                pl.BlockSpec((1, S, K), lambda n, b_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda n, b_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda n, b_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_n), lambda n, b_: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda n, b_: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, S, block_n), lambda n, b_: (b_, 0, n), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * K * N,
            bytes_accessed=(x.size * max(1, N // block_n) + B * S * N) * x.dtype.itemsize,
            transcendentals=B * S * N,
        ),
    )(x, gamma, beta, w, b)
    return pallas_with_xla_vjp(run, ref)(x, gamma, beta, w, b)


def _linear_residual_bt_kernel(x_ref, w_ref, b_ref, r_ref, o_ref):
    acc = jax.lax.dot(
        x_ref[0], w_ref[:], preferred_element_type=jnp.float32
    )
    acc += b_ref[:].astype(jnp.float32) + r_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def linear_residual_bt(
    x: jnp.ndarray,    # (B, S, K)
    w: jnp.ndarray,    # (K, N)
    b: jnp.ndarray,    # (1, N)
    res: jnp.ndarray,  # (B, S, N)
) -> jnp.ndarray:
    """x @ w + b + res for batched odd-length sequences (CLIP MLP half 2)."""
    B, S, K = x.shape
    N = w.shape[1]

    def ref(x, w, b, res):
        acc = jnp.einsum("bsk,kn->bsn", x, w, preferred_element_type=jnp.float32)
        return (acc + b.astype(jnp.float32) + res.astype(jnp.float32)).astype(x.dtype)

    run = lambda x, w, b, res: pl.pallas_call(
        _linear_residual_bt_kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, S, K), lambda b_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda b_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda b_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, N), lambda b_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, S, N), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * K * N,
            bytes_accessed=(x.size + 2 * B * S * N) * x.dtype.itemsize
            + w.size * w.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w, b, res)
    return pallas_with_xla_vjp(run, ref)(x, w, b, res)


def _proj_kernel(heads, x_ref, w_ref, b_ref, o_ref):
    # x: (1, heads, 1, S, d); w: (heads, d, out) — reads index LEADING axes
    acc = b_ref[:].astype(jnp.float32)  # (1, out) broadcasts over S
    for h in range(heads):
        acc = acc + jax.lax.dot(
            x_ref[0, h, 0], w_ref[h], preferred_element_type=jnp.float32
        )
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def proj_from_heads(
    x: jnp.ndarray,   # (B, heads, T, S, d) — attention kernel output layout,
                      # M tiled as T x S (S = window length or a 512-row tile)
    w: jnp.ndarray,   # (heads, d, out) — reshaped (heads*d, out) projection
    b: jnp.ndarray,   # (1, out)
) -> jnp.ndarray:
    """out[b, t, s, :] = sum_h x[b, h, t, s] @ w[h] + bias -> (B, T, S, out).

    Folds the head-leading -> feature-contiguous moveaxis into the projection
    matmul: the relayout never materialises in HBM. The (S, d) trailing block
    dims equal the array dims, so any S (e.g. 196) is Mosaic-tileable.
    """
    B, heads, T, S, d = x.shape
    out = w.shape[-1]
    kernel = functools.partial(_proj_kernel, heads)

    def ref(x, w, b):
        acc = jnp.einsum(
            "bhtsd,hdo->btso", x, w, preferred_element_type=jnp.float32
        )
        return (acc + b.astype(jnp.float32)).astype(x.dtype)

    run = lambda x, w, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, S, out), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, heads, 1, S, d), lambda b_, t: (b_, 0, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((heads, d, out), lambda b_, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, out), lambda b_, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, S, out), lambda b_, t: (b_, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * S * heads * d * out,
            bytes_accessed=(x.size + B * T * S * out) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w, b)
    return pallas_with_xla_vjp(run, ref)(x, w, b)
