"""Test harness: CPU backend with a virtual 8-device mesh + compile cache.

Must set env BEFORE jax is imported anywhere (SURVEY §4: the reference has
no tests; the fake-mesh harness is how we test sharding without TPUs)."""

import os

# hard override: the environment presets JAX_PLATFORMS=axon (the TPU);
# tests must be hermetic on CPU with a virtual 8-device mesh
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# belt-and-braces: a pytest plugin may have imported jax before this
# conftest ran, so also switch the platform through jax.config (effective
# as long as no backend is initialized yet)
jax.config.update("jax_platforms", "cpu")
sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys as _sys  # noqa: E402

_sys.path.insert(0, sys_path_root)
from representation_disentanglement_tpu.utils.profiling import (  # noqa: E402
    cache_dir_for_host)

jax.config.update("jax_compilation_cache_dir", cache_dir_for_host())
# parity tests compare against torch f32: force full-precision matmuls
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_SRC = "/root/reference/src"


def make_ref_model_module():
    """Import the torch reference model as a parity oracle, stubbing its
    unavailable deps (torchvision, util->nonechucks/nibabel/skimage).
    Returns the module or None if torch/reference are unavailable."""
    if not os.path.isdir(REF_SRC):
        return None
    try:
        import types

        import torch  # noqa: F401
    except ImportError:
        return None
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _no_vgg(*a, **k):
            raise RuntimeError("vgg16 unavailable in tests")

        tv_models.vgg16 = _no_vgg
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    if "util" not in sys.modules:
        sys.modules["util"] = types.ModuleType("util")
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import importlib
    import model as ref_model  # noqa: F401
    return importlib.reload(ref_model) if False else ref_model


@pytest.fixture(scope="session")
def ref_model_module():
    mod = make_ref_model_module()
    if mod is None:
        pytest.skip("reference/torch unavailable")
    return mod


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(10)
