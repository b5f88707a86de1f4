"""Test config: force the CPU backend with 8 virtual devices for mesh tests.

The container's sitecustomize registers the remote 'axon' TPU platform and
imports jax at interpreter startup, so JAX_PLATFORMS in os.environ is already
captured; `jax.config.update` is the reliable override. XLA_FLAGS is read
lazily at backend init, so setting it here still works.
(SURVEY.md §4: multi-device tests run on a virtual CPU mesh.)
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def test_image(rng):
    """Smooth random test image (128x160) — smooth so interpolation-based
    gradients are informative."""
    try:
        from scipy.ndimage import gaussian_filter
        img = gaussian_filter(rng.standard_normal((128, 160)), 3.0)
    except ImportError:  # pragma: no cover
        img = rng.standard_normal((128, 160))
        k = np.ones(9) / 9.0
        for ax in (0, 1):
            img = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), ax, img)
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255.0).astype(np.float32)
