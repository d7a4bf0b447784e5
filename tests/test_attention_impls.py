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
