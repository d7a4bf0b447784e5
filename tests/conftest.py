"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the real TPU is reserved for bench.py).

Note: this image boots an `axon` TPU plugin from sitecustomize which
overwrites JAX_PLATFORMS, so the env-var route is not enough — we must set
the config knob after importing jax but before any backend initialises.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_cascade_2class():
    """Shared tiny cascade (cfg, model, bank, params) for test_train and
    test_convert, which built IDENTICAL fixtures independently (~40 s of
    init each on this host). Session-scoped is safe: params are immutable
    jax arrays and no test donates them (cli/train's donation is on a
    TrainState built per test)."""
    from camouflaged_vlm_tpu.factory import init_cascade_params, make_bank_inputs
    from camouflaged_vlm_tpu.models import CascadeConfig, OVCOSCascade

    cfg = CascadeConfig.tiny()
    model = OVCOSCascade(cfg)
    bank = make_bank_inputs(cfg, ["cat", "owl"])
    params = init_cascade_params(model, cfg, bank)
    return cfg, model, bank, params
