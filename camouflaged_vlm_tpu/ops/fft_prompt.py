"""FFT high-pass filter for the EVP handcrafted prompt stream.

Behavioural equivalent of `PromptGenerator.fft`
(`/root/reference/models/mmseg/models/sam/image_encoder.py:332-353`):
zero out a centred square of the shifted spectrum whose area is
``rate`` of the image (side = 2 * int(sqrt(H*W*rate)/2)), inverse-transform,
and take |real part|.

XLA lowers jnp.fft to its native FFT; on TPU this runs on-device without a
Pallas kernel. fp32 throughout (FFT of a 1024x1024x3 image is cheap relative
to the ViT-H stack).
"""

from __future__ import annotations

import jax.numpy as jnp


def fft_highpass(x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """x: (B, H, W, C) fp32 -> same shape, |real(ifft(highpass(fft(x))))|."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    H, W = x.shape[1], x.shape[2]
    line = int((H * W * rate) ** 0.5 // 2)

    # Build the low-frequency mask once at trace time (static shapes).
    mask = jnp.zeros((H, W), dtype=jnp.float32)
    mask = mask.at[H // 2 - line : H // 2 + line, W // 2 - line : W // 2 + line].set(1.0)

    # fft over spatial axes (1, 2); norm="forward" divides by N on the forward
    # transform, matching torch.fft.fft2(..., norm="forward").
    f = jnp.fft.fft2(x32, axes=(1, 2), norm="forward")
    f = jnp.fft.fftshift(f, axes=(1, 2))
    f = f * (1.0 - mask)[None, :, :, None]
    f = jnp.fft.ifftshift(f, axes=(1, 2))
    inv = jnp.fft.ifft2(f, axes=(1, 2), norm="forward").real
    return jnp.abs(inv).astype(orig_dtype)
