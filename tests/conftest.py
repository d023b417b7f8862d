"""Test harness: force CPU with 8 virtual devices so sharding/collective
tests run without TPU hardware (SURVEY.md §4 implication)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon sitecustomize register() overwrites jax_platforms to "axon,cpu"
# at interpreter start; force pure-CPU so tests never touch (or block on)
# the single TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from simpleimagecaptionzoo_tpu.vocab import Vocabulary  # noqa: E402


@pytest.fixture(scope="session")
def tiny_vocab():
    """12-word vocabulary for decode/scorer tests."""
    v = Vocabulary()
    for w in ("<pad>", "<sta>", "<end>", "<unk>", "a", "man", "dog", "rides",
              "on", "the", "beach", "surfboard"):
        v.add_word(w)
    return v


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
