"""End-to-end smoke tests for the two CLIs no other test drives:

- `cli/demo.py` — the reference's `demo.py` equivalent (overlay +
  `[class]name` output files);
- `cli/train_maple.py` — the dassl `MaPLeAlphaCLIP(TrainerX)` equivalent
  (prompt-learner-only training, best/last checkpoints + npz export).

Both run the tiny config fully randomly-initialised (semantics are pinned
elsewhere by the golden-parity and train-step tests); this pins the CLI
wiring itself: arg parsing, file I/O, output naming.
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def demo_image(tmp_path_factory):
    root = tmp_path_factory.mktemp("demo_img")
    rng = np.random.default_rng(11)
    path = root / "scorpionfish.jpg"
    Image.fromarray(rng.integers(0, 255, (97, 131, 3), dtype=np.uint8)).save(path)
    return str(path)


@pytest.fixture(scope="module")
def maple_dataset(tmp_path_factory):
    import yaml

    root = tmp_path_factory.mktemp("ovcamo_maple")
    rng = np.random.default_rng(5)
    classes = [
        {"name": "cat", "split": "train"},
        {"name": "owl", "split": "train"},
        {"name": "bat", "split": "test"},
    ]
    samples = []
    for split in ("train", "test"):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
    for i, (name, split) in enumerate(
        [("cat", "train"), ("owl", "train")] * 3 + [("bat", "test")]
    ):
        uid = f"img{i}"
        h, w = 50 + 4 * i, 64 + 2 * i
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            root / split / "image" / f"{uid}.jpg"
        )
        Image.fromarray(((rng.random((h, w)) > 0.6) * 255).astype(np.uint8)).save(
            root / split / "mask" / f"{uid}.png"
        )
        samples.append({"unique_id": uid, "base_class": name,
                        "image": f"{uid}.jpg", "mask": f"{uid}.png"})
    os.makedirs(root / "jsonfile")
    json.dump(classes, open(root / "jsonfile" / "class_info.json", "w"))
    json.dump(samples, open(root / "jsonfile" / "sample_info.json", "w"))
    info = {
        "OVCamo_CLASS_JSON_PATH": str(root / "jsonfile" / "class_info.json"),
        "OVCamo_SAMPLE_JSON_PATH": str(root / "jsonfile" / "sample_info.json"),
        "OVCamo_TR_IMAGE_DIR": str(root / "train" / "image"),
        "OVCamo_TR_MASK_DIR": str(root / "train" / "mask"),
        "OVCamo_TE_IMAGE_DIR": str(root / "test" / "image"),
        "OVCamo_TE_MASK_DIR": str(root / "test" / "mask"),
    }
    info_path = root / "dataset_info.yaml"
    yaml.safe_dump(info, open(info_path, "w"))
    return str(info_path)


def test_demo_cli_smoke(monkeypatch, demo_image, tmp_path):
    from camouflaged_vlm_tpu.cli import demo as demo_cli

    out_dir = tmp_path / "out"
    classnames = "cat,owl,snow leopard"
    monkeypatch.setattr(sys, "argv", [
        "demo", "--image", demo_image, "--out-dir", str(out_dir),
        "--tiny", "--dtype", "float32", "--classnames", classnames,
    ])
    demo_cli.main()

    files = sorted(os.listdir(out_dir))
    overlays = [f for f in files if f.endswith("scorpionfish.jpg") and f.startswith("[")]
    assert len(overlays) == 1, files
    pred = overlays[0][1 : overlays[0].index("]")]
    assert pred in classnames.split(",")
    overlay = np.asarray(Image.open(out_dir / overlays[0]))
    assert overlay.shape == (97, 131, 3)  # original resolution, not model res
    mask = np.asarray(Image.open(out_dir / "mask_scorpionfish.png"))
    assert mask.shape == (97, 131)


@pytest.mark.slow  # ~1 min; the maple trainer math stays fast via test_train.py
def test_train_maple_cli_smoke(monkeypatch, maple_dataset, tmp_path):
    from camouflaged_vlm_tpu.cli import train_maple as maple_cli

    save_dir = tmp_path / "maple"
    monkeypatch.setattr(sys, "argv", [
        "train_maple", "--dataset-info", maple_dataset,
        "--save-dir", str(save_dir), "--epochs", "2", "--batch-size", "3",
        "--tiny", "--dtype", "float32", "--seed", "1",
    ])
    maple_cli.main()

    assert os.path.isdir(save_dir / "maple_last")
    assert os.path.isdir(save_dir / "maple_best")
    npz = np.load(save_dir / "prompt_learner_best.npz")
    # only prompt-learner tensors are trainable/exported
    assert len(npz.files) > 0
    assert all("prompt_learner" in k for k in npz.files), npz.files


@pytest.mark.slow  # ~80s; diagnostics CLI — demo/eval/train smokes stay fast
def test_profile_cli_smoke(monkeypatch, capsys):
    """cli/profile.py wiring: tiny config, stages + end-to-end timing on CPU
    (the only CLI no other test drives)."""
    from camouflaged_vlm_tpu.cli import profile as profile_cli

    monkeypatch.setattr(sys, "argv", [
        "profile", "--tiny", "--batch", "1", "--iters", "1", "--warmup", "0",
        "--dtype", "float32", "--stages",
    ])
    profile_cli.main()
    out = capsys.readouterr().out
    assert "sam encoder" in out and "clip classify" in out
