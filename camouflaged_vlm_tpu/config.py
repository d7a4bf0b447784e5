"""YAML -> config dataclass loading.

Capability equivalent of the reference's yaml config system
(`/root/reference/configs/*.yaml` + the DotDict plumbing in each entry
script), mapped onto the typed dataclass configs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import yaml

from .models import CascadeConfig, SamEncoderConfig, MaskDecoderConfig
from .models.two_way_transformer import TwoWayTransformerConfig
from .models.clip import AlphaClipConfig

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def _build(dc_cls, spec: Dict[str, Any], **extra):
    fields = {f.name for f in dataclasses.fields(dc_cls)}
    kwargs = {k: v for k, v in (spec or {}).items() if k in fields}
    unknown = set(spec or {}) - fields - set(extra)
    if unknown:
        raise KeyError(f"unknown {dc_cls.__name__} keys: {sorted(unknown)}")
    kwargs.update(extra)
    if "global_attn_indexes" in kwargs:
        kwargs["global_attn_indexes"] = tuple(kwargs["global_attn_indexes"])
    return dc_cls(**kwargs)


def cascade_config_from_yaml(path: str) -> Tuple[CascadeConfig, Dict[str, Any]]:
    """Returns (CascadeConfig, train-hyperparameter dict)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    m = raw["model"]
    dtype = _DTYPES[m.get("dtype", "bfloat16")]

    dec_spec = dict(m.get("decoder", {}))
    twt_spec = dec_spec.pop("transformer", {})
    twt = _build(
        TwoWayTransformerConfig, twt_spec,
        embedding_dim=dec_spec.get("transformer_dim", 256), dtype=dtype,
    )
    cfg = CascadeConfig(
        inp_size=m.get("inp_size", 1024),
        clip_size=m.get("clip_size", 336),
        prompt_embed_dim=dec_spec.get("transformer_dim", 256),
        encoder=_build(SamEncoderConfig, m.get("encoder", {}), dtype=dtype),
        decoder=_build(MaskDecoderConfig, dec_spec, transformer=twt, dtype=dtype),
        clip=_build(AlphaClipConfig, m.get("clip", {}), dtype=dtype),
    )
    return cfg, raw.get("train", {})
