"""YAML config loading tests."""

import jax.numpy as jnp

from camouflaged_vlm_tpu.config import cascade_config_from_yaml


def test_flagship_config_loads():
    cfg, train_hp = cascade_config_from_yaml(
        "configs/ovcos-sam-vit-h-maskdecoder-edge.yaml"
    )
    assert cfg.inp_size == 1024 and cfg.clip_size == 336
    assert cfg.encoder.depth == 32 and cfg.encoder.embed_dim == 1280
    assert cfg.encoder.global_attn_indexes == (7, 15, 23, 31)
    assert cfg.encoder.dtype == jnp.bfloat16
    assert cfg.decoder.transformer.depth == 2
    assert cfg.clip.vision_layers == 24 and cfg.clip.prompt_depth == 9
    assert train_hp["epochs"] == 20 and train_hp["loss"] == "iou"


def test_config_matches_full_preset():
    from camouflaged_vlm_tpu.models import CascadeConfig

    cfg, _ = cascade_config_from_yaml("configs/ovcos-sam-vit-h-maskdecoder-edge.yaml")
    preset = CascadeConfig.full(dtype=jnp.bfloat16)
    assert cfg == preset
