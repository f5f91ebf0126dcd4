"""Test configuration: force an 8-device virtual CPU mesh.

All kernels are written for TPU but must be testable without TPU hardware.
JAX's host-platform device-count flag gives us a faithful "fake cluster"
(see SURVEY.md §4: the JAX-native equivalent of the reference's offline
fixture pattern).

Note: this environment pre-registers a real-TPU PJRT plugin (platform
"axon") through sitecustomize *before* conftest runs, so setting
JAX_PLATFORMS via os.environ here is too late — jax has already read its
config env. Use jax.config.update instead, which works any time before
backend initialization.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache: this box has ONE CPU and the suite
# is compile-bound (~24 min cold), so cache every lowered program
# across runs — repeat runs skip most compilation. The cache key
# includes jaxlib version + flags, so stale entries are never reused.
_CACHE_DIR = os.environ.get(
    "ANR_JAX_TEST_CACHE",
    os.path.expanduser("~/.cache/anr_jax_test_cache"),
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
