"""Model/pipeline factory helpers shared by the CLI, bench, and graft entry."""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .models import CascadeConfig, OVCOSCascade
from .models.clip import build_class_prompt_bank
from .utils.registry import MODELS


@MODELS.register("sam_maskdecoder_edge")
def build_full_cascade(dtype=jnp.bfloat16, **_ignored) -> Tuple[OVCOSCascade, CascadeConfig]:
    cfg = CascadeConfig.full(dtype=dtype)
    return OVCOSCascade(cfg), cfg


@MODELS.register("tiny_cascade")
def build_tiny_cascade(dtype=jnp.float32, **_ignored) -> Tuple[OVCOSCascade, CascadeConfig]:
    cfg = CascadeConfig.tiny(dtype=dtype)
    return OVCOSCascade(cfg), cfg


def make_bank_inputs(
    cfg: CascadeConfig,
    classnames: Sequence[str],
    token_embedding: Optional[np.ndarray] = None,
    bank_features: Optional[np.ndarray] = None,
    seed: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Class-split constants for the cascade (prompt bank + text-feature bank).

    Without a checkpoint, the token embedding table and frozen text-feature
    bank are seeded randomly (shape-faithful) — used by tests and synthetic
    benchmarks.
    """
    rng = np.random.default_rng(seed)
    width = cfg.clip.transformer_width
    if token_embedding is None:
        token_embedding = (
            rng.standard_normal((cfg.clip.vocab_size, width)).astype(np.float32) * 0.02
        )
    bank = build_class_prompt_bank(
        classnames, token_embedding, n_ctx=cfg.clip.n_ctx,
        context_length=cfg.clip.context_length,
    )
    if bank_features is None:
        bank_features = rng.standard_normal(
            (len(classnames), cfg.clip.embed_dim)
        ).astype(np.float32)
        bank_features /= np.linalg.norm(bank_features, axis=-1, keepdims=True)
    return {
        "prefix": jnp.asarray(bank.prefix),
        "suffix": jnp.asarray(bank.suffix),
        "eot_indices": jnp.asarray(bank.eot_indices),
        "bank_features": jnp.asarray(bank_features),
    }


def make_example_inputs(cfg: CascadeConfig, batch: int = 1, seed: int = 0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(
            rng.standard_normal((batch, cfg.inp_size, cfg.inp_size, 3)), jnp.float32
        ),
        jnp.asarray(
            rng.standard_normal((batch, cfg.clip_size, cfg.clip_size, 3)), jnp.float32
        ),
        jnp.full((batch, cfg.clip_size, cfg.clip_size, 1), (1.0 - 0.5) / 0.26, jnp.float32),
    )


def init_cascade_params(model: OVCOSCascade, cfg: CascadeConfig, bank, batch: int = 1, seed: int = 0):
    inp, cimg, cmask = make_example_inputs(cfg, batch, seed)

    # jit the init: un-jitted flax init dispatches thousands of tiny ops
    # (minutes over a tunneled TPU); jitted it compiles to one program.
    @jax.jit
    def _init(key, inp, cimg, cmask, prefix, suffix, eot, feats):
        return model.init(
            key, inp, cimg, cmask, prefix, suffix, eot, feats,
            method=model.infer_cascade,
        )

    return _init(
        jax.random.PRNGKey(seed), inp, cimg, cmask,
        bank["prefix"], bank["suffix"], bank["eot_indices"], bank["bank_features"],
    )


def fast_init_cascade_params(
    model: OVCOSCascade, cfg: CascadeConfig, bank, batch: int = 1,
    seed: int = 0, scale: float = 0.02,
):
    """Random cascade params WITHOUT compiling the model's init program.

    `init_cascade_params` jit-compiles flax's init — which traces the whole
    cascade forward — purely to produce parameter tensors; over the
    remote-compile tunnel that compile costs ~113 s per process (measured,
    bench.py phase breadcrumbs), charged to every bench subprocess. Here
    `jax.eval_shape` derives the exact param tree (shapes/dtypes/structure)
    with zero compilation, and ONE trivially-compiled elementwise program
    fills every float leaf on-device with a bounded deterministic hash
    (sin of a scaled iota, amplitude `scale`; zeros for non-floats). A
    per-leaf threefry fill was tried first and compiled SLOWER than the
    model init itself (235 s vs 113 — five hundred RNG subcomputations);
    iota+sin is plain elementwise HLO and compiles in seconds.

    Values differ from flax's per-module initializers, so use this only
    where param VALUES are irrelevant — throughput benchmarking on random
    weights (TPU dense compute is value-independent). Anything that checks
    numerics against initialization semantics keeps `init_cascade_params`;
    real deployments load checkpoints.
    """
    import math

    inp, cimg, cmask = make_example_inputs(cfg, batch, seed)
    shapes = jax.eval_shape(
        lambda key, *a: model.init(key, *a, method=model.infer_cascade),
        jax.random.PRNGKey(seed), inp, cimg, cmask,
        bank["prefix"], bank["suffix"], bank["eot_indices"],
        bank["bank_features"],
    )
    flat, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def _fill():
        leaves = []
        for i, sd in enumerate(flat):
            if jnp.issubdtype(sd.dtype, jnp.floating):
                n = math.prod(sd.shape) if sd.shape else 1
                x = jax.lax.iota(jnp.float32, n)
                x = jnp.sin(x * 12.9898 + (seed * 997 + i) * 78.233) * scale
                leaves.append(x.reshape(sd.shape).astype(sd.dtype))
            else:
                leaves.append(jnp.zeros(sd.shape, sd.dtype))
        return leaves

    return jax.tree.unflatten(treedef, _fill())


@functools.lru_cache(maxsize=8)
def _rel_table_builder(enc_cfg):
    """One jitted table builder per encoder config (frozen dataclass key).
    A fresh `jax.jit(lambda ...)` per call would retrace and recompile on
    every attach — e.g. at every in-training validation epoch."""
    from .models.sam_encoder import precompute_rel_tables

    return jax.jit(lambda p: precompute_rel_tables(enc_cfg, p))


def attach_rel_cache(params: dict, cfg: CascadeConfig) -> dict:
    """Add the precomputed 'relcache' collection (param-derived rel-pos
    tables) to a cascade variables dict for INFERENCE — building them inside
    the forward cost ~18 ms/iter at batch 8 (see
    `models.sam_encoder.precompute_rel_tables`). Training must NOT use this
    (the tables would go stale as rel_pos params update)."""
    enc = params["params"]["image_encoder"]
    cache = _rel_table_builder(cfg.encoder)(enc)
    return {**params, "relcache": {"image_encoder": cache}}
