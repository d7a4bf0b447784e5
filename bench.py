"""End-to-end cascade throughput benchmark (real TPU).

Measures images/sec through the FULL fused OVCOS pipeline at 1024px —
SAM ViT-H encoder + CLIP pass 1 (all-ones alpha) + edge mask decoder +
mask upsample + alpha handoff + CLIP pass 2 (predicted alpha) — i.e. the
reference's per-image eval work (`/root/reference/test_ovcos_maskdecoder_edge.py:102-114`)
as one jitted program.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the driver-set target of 20 images/sec/chip (BASELINE.json).

With --batch 0 (default) each batch of the {32, 8, 64, 1} sweep runs in a
SUBPROCESS with a hard timeout: on this tunnel one pathological remote
compile can exceed 40 min (batch 16 did; 32/64 compile in ~15-20), and a
blocked in-C++ compile RPC can't be interrupted in-process — the kill has
to come from outside. Best-first order: after the round-3 const-shift
landings the batch slope is flat (b8 20.68 / b32 20.76 / b64 20.64), so 32
leads and the cheap-compile 8 comes second.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

SWEEP = [32, 8, 64, 1]
PER_BATCH_TIMEOUT_S = 35 * 60


def run_one(args) -> float:
    import jax
    import jax.numpy as jnp

    from camouflaged_vlm_tpu.factory import (
        attach_rel_cache,
        build_full_cascade,
        make_bank_inputs,
        make_example_inputs,
        init_cascade_params,
    )
    from camouflaged_vlm_tpu.data.ovcamo import TEST_CLASS_NAMES

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, cfg = build_full_cascade(dtype=dtype)
    bank = make_bank_inputs(cfg, TEST_CLASS_NAMES)
    params = init_cascade_params(model, cfg, bank, batch=1)
    # Keep big weights in compute dtype to halve HBM traffic.
    params = jax.tree.map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        params,
    )
    # Hoist the param-derived rel-pos tables out of the per-batch program.
    params = attach_rel_cache(params, cfg)

    # Class-split text features are image-independent: encode once, not per
    # batch (the reference reruns the text tower every image).
    text_features = jax.jit(
        lambda p, a, b, c, d: model.apply(
            p, a, b, c, d, method=model.encode_class_text_features
        )
    )(params, bank["prefix"], bank["suffix"], bank["eot_indices"], bank["bank_features"])

    from camouflaged_vlm_tpu.data.transforms import ONES_ALPHA_VALUE

    # NOTE: on the tunneled axon backend block_until_ready() returns before
    # execution finishes, so the timed program ends in a scalar checksum that
    # we fetch to host — the fetch is the only reliable completion barrier.
    # The pass-1 all-ones alpha is built IN-GRAPH (exactly like
    # cli/evaluate.run): it is a constant, so XLA folds conv1_alpha(pass 1)
    # at compile time.
    @jax.jit
    def forward(params, inp, cimg, text_features):
        cmask = jnp.full(
            (inp.shape[0], cfg.clip_size, cfg.clip_size, 1), ONES_ALPHA_VALUE
        )
        probs, pred, score = model.apply(
            params, inp, cimg, cmask, text_features,
            method=model.infer_cascade_with_text,
        )
        return jnp.sum(probs.astype(jnp.float32)) + jnp.sum(pred) + jnp.sum(score)

    B = args.batch
    inp, cimg, _cmask = make_example_inputs(cfg, batch=B)
    call = lambda: forward(params, inp, cimg, text_features)
    for _ in range(args.warmup):
        float(call())  # host fetch == completion barrier
    # Steady-state throughput: enqueue all iterations (async dispatch
    # pipelines them on-device), fetch ONE scalar at the end — the ~36 ms
    # tunnel round-trip is paid once, not per iter.
    t0 = time.perf_counter()
    outs = [call() for _ in range(args.iters)]
    float(outs[-1])
    sec = (time.perf_counter() - t0) / args.iters
    return B / sec


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=0, help="0 = sweep {32,8,64,1}")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    best_ips, best_b, per_batch = 0.0, 0, {}
    if args.batch:
        ips = run_one(args)
        per_batch[args.batch] = round(ips, 3)
        best_ips, best_b = ips, args.batch
    else:
        for B in SWEEP:
            cmd = [
                sys.executable, __file__, "--batch", str(B),
                "--iters", str(args.iters), "--warmup", str(args.warmup),
                "--dtype", args.dtype,
            ]
            try:
                r = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=PER_BATCH_TIMEOUT_S,
                )
                line = next(
                    (l for l in r.stdout.splitlines() if '"metric"' in l), None
                )
                if r.returncode != 0 or line is None:
                    tail = (r.stderr or r.stdout or "")[-200:].replace("\n", " ")
                    per_batch[B] = f"failed: rc={r.returncode}: {tail}"
                    continue
                ips = json.loads(line)["value"]
                per_batch[B] = ips
                if ips > best_ips:
                    best_ips, best_b = ips, B
            except subprocess.TimeoutExpired:
                per_batch[B] = f"failed: exceeded {PER_BATCH_TIMEOUT_S}s"

    result = {
        "metric": "cascade_images_per_sec_per_chip",
        "value": round(best_ips, 3),
        "unit": "img/s @1024px e2e (batch %d, %s)" % (best_b, args.dtype),
        "vs_baseline": round(best_ips / 20.0, 3),
    }
    if best_b == 0:
        # every sweep batch failed — don't let a success-shaped 0.0 be
        # recorded as a measurement
        result["error"] = "all sweep batches failed; see per_batch"
    print(json.dumps(result))
    print(json.dumps({"per_batch": per_batch}))
    if best_b == 0:
        sys.exit(1)


if __name__ == "__main__":
    main()
