"""Torch checkpoint readers -> numpy dicts.

The reference ships/loads four torch formats (SURVEY.md §5.4):
  1. `sam_vit_h_4b8939.pth`          — plain state_dict (SAM backbone)
  2. `model_epoch_best.pth`          — plain state_dict (trained cascade)
  3. OpenAI CLIP `ViT-L-14-336px.pt` — TorchScript jit archive
  4. `model-best.pth.tar`            — dassl dict {'state_dict', 'epoch', ...}

torch (CPU build, baked into this image) is used ONLY here in the io layer —
never on the compute path. Everything is returned as {key: np.ndarray}.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy_dict(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().float().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Plain torch.save'd state_dict (formats 1 and 2)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj and not hasattr(
        next(iter(obj.values()), None), "detach"
    ):
        obj = obj["state_dict"]
    return _to_numpy_dict(obj)


def load_openai_clip_state_dict(path: str) -> Dict[str, np.ndarray]:
    """OpenAI CLIP .pt: TorchScript archive, falling back to a state_dict
    (mirrors `/root/reference/cocotrainers/mapleAlphaCLIP.py:34-41`)."""
    import torch

    with open(path, "rb") as f:
        try:
            model = torch.jit.load(f, map_location="cpu").eval()
            state_dict = model.state_dict()
        except RuntimeError:
            f.seek(0)
            state_dict = torch.load(f, map_location="cpu", weights_only=False)
    sd = _to_numpy_dict(state_dict)
    for k in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(k, None)
    return sd


def load_dassl_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """dassl tarball checkpoint -> (state_dict, extras like epoch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = _to_numpy_dict(ckpt["state_dict"])
    extras = {k: v for k, v in ckpt.items() if k != "state_dict"}
    return sd, extras
