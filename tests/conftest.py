"""Test env: force an 8-device CPU host platform BEFORE jax import so every
test can exercise the data-parallel mesh paths without TPU hardware
(SURVEY.md §4: the reference has no test suite; this one replaces its
__main__ smoke blocks with synthetic-data pytest)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the image's sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel); override
# programmatically before any backend initialization
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip recompiles of the
# heavy e2e graphs (SAM/SAM2/DETR overfit tests) — cuts full-suite wall
# time roughly in half after the first run
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


class SyntheticClassificationDataset:
    """Deterministic fake dataset: class-dependent mean images, so a model
    can actually overfit it (used for end-to-end learning tests)."""

    def __init__(self, n=256, image_size=32, num_classes=10, transform=None):
        self.n = n
        self.image_size = image_size
        self.num_classes = num_classes
        self.transform = transform
        rs = np.random.RandomState(0)
        self.noise = rs.randn(n, image_size, image_size, 3).astype(np.float32)
        self.labels = rs.randint(0, num_classes, n)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        label = int(self.labels[idx])
        image = self.noise[idx] * 0.1 + label / self.num_classes
        sample = {"image": image.astype(np.float32), "label": label}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


@pytest.fixture
def synth_dataset():
    return SyntheticClassificationDataset()
