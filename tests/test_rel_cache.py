"""The precomputed rel-table cache ('relcache' collection) must be a pure
hoist: cascade outputs with `attach_rel_cache` == outputs without, bitwise
(same einsums, same table values — only WHERE the tables are built moves).
See models/sam_encoder.py::precompute_rel_tables."""

import numpy as np
import jax
import jax.numpy as jnp

from camouflaged_vlm_tpu.factory import (
    attach_rel_cache,
    build_tiny_cascade,
    init_cascade_params,
    make_bank_inputs,
    make_example_inputs,
)

CLASSNAMES = ["cat", "owl", "snow leopard", "scorpionfish"]


def test_rel_cache_is_pure_hoist():
    model, cfg = build_tiny_cascade()
    bank = make_bank_inputs(cfg, CLASSNAMES)
    params = init_cascade_params(model, cfg, bank, batch=1)
    inp, cimg, cmask = make_example_inputs(cfg, batch=2, seed=3)

    args = (inp, cimg, cmask, bank["prefix"], bank["suffix"],
            bank["eot_indices"], bank["bank_features"])
    run = jax.jit(
        lambda p: model.apply(p, *args, method=model.infer_cascade)
    )
    probs0, pred0, score0 = run(params)

    cached = attach_rel_cache(params, cfg)
    assert "relcache" in cached and "image_encoder" in cached["relcache"]
    # every windowed block carries rblk+rcomb, global blocks rcg
    enc_cache = cached["relcache"]["image_encoder"]
    assert len(enc_cache) == cfg.encoder.depth
    probs1, pred1, score1 = jax.jit(
        lambda p: model.apply(p, *args, method=model.infer_cascade)
    )(cached)

    np.testing.assert_array_equal(np.asarray(pred0), np.asarray(pred1))
    np.testing.assert_allclose(
        np.asarray(probs0, np.float32), np.asarray(probs1, np.float32),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(score0, np.float32), np.asarray(score1, np.float32),
        atol=1e-6,
    )
