"""Shared example bootstrap: import this FIRST in every example.

Does two things every example needs:
  * puts the repo root on sys.path so ``python examples/foo.py`` works on
    a clean checkout without installing the package;
  * honors the JAX_PLATFORMS environment variable through the config API
    — the axon TPU plugin ignores the env var, so ``JAX_PLATFORMS=cpu``
    would otherwise still try (and, with the tunnel down, hang on) the
    TPU backend.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
