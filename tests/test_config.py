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


def test_reference_config_format_loads():
    """The reference's OWN shipped yaml loads through --config unchanged
    (auto-detected by the model.args nesting) and resolves to the same
    architecture as the native flagship config — a reference user's config
    file works as-is. Reference consumer:
    /root/reference/train_ovcos_maskdecoder_edge.py:380-400."""
    import os

    path = "/root/reference/configs/ovcos-sam-vit-h-maskdecoder-edge.yaml"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference tree not present")
    cfg, train_hp = cascade_config_from_yaml(path)
    native, native_hp = cascade_config_from_yaml(
        "configs/ovcos-sam-vit-h-maskdecoder-edge.yaml"
    )
    assert cfg == native
    assert train_hp["epochs"] == 20
    assert train_hp["lr"] == 2e-4
    assert train_hp["eta_min"] == 1e-7
    assert train_hp["epoch_val"] == 2
    assert train_hp["loss"] == "iou"
    assert train_hp["batch_size"] == 1  # the reference trains per-rank batch 1


def test_reference_config_rejects_unimplemented_variant(tmp_path):
    import pytest
    import yaml as _yaml

    raw = {
        "model": {"args": {"inp_size": 1024, "encoder_mode": {
            "name": "sam", "input_type": "all", "prompt_type": "highpass"}}},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(_yaml.safe_dump(raw))
    with pytest.raises(ValueError, match="input_type"):
        cascade_config_from_yaml(str(p))

    # EVERY variant selector is checked, incl. the ones the reference itself
    # hardcodes (image_encoder.py:116-123) and qkv_bias (the one it honors)
    for key, bad in (("tuning_stage", 12), ("handcrafted_tune", False),
                     ("embedding_tune", False), ("adaptor", "fully_shared"),
                     ("qkv_bias", False)):
        raw = {"model": {"args": {"inp_size": 1024, "encoder_mode": {key: bad}}}}
        p.write_text(_yaml.safe_dump(raw))
        with pytest.raises(ValueError, match=key):
            cascade_config_from_yaml(str(p))
