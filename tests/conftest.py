"""Test harness: CPU backend with an 8-device virtual mesh + float64.

Tests validate numerics against float64 oracles on CPU; the TPU path
runs float32 (bench.py / __graft_entry__.py). The 8 virtual devices let
multi-chip sharding tests run without TPU hardware.
"""

import os
import sys

# The session presets JAX_PLATFORMS=axon (remote TPU); tests must run on
# the local CPU backend, so force-override rather than setdefault.
# SVSDF_TEST_TPU=1 opts out for the on-device slow-lane tests (e.g.
# the compiled Pallas parity check, which has no CPU lowering).
_ON_TPU = os.environ.get("SVSDF_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Clamp XLA:CPU codegen to AVX2: this round's host misdetects its ISA
# feature set (cpu_aot_loader logs feature-mismatch against its own
# compiles) and the CPU JIT segfaulted intermittently inside
# backend_compile_and_load / the cache-write path, killing two full
# suite runs. AVX2 codegen avoids the AVX512/AMX paths implicated.
if not _ON_TPU and "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" via
# jax.config at interpreter start, which overrides the env var; set the
# config value itself to pin the local CPU backend for tests.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Long compile-heavy JAX processes exhaust the default
# vm.max_map_count (65530): LLVM JIT mmaps code/data sections per
# executable, allocation starts failing with "LLVM compilation
# error: Cannot allocate memory", and the process segfaults in the
# compile or cache-write path (three full suite runs died mid-suite
# this round before the cause was found). Raise the limit when we
# can; harmless if already raised.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("262144")
except (OSError, PermissionError, ValueError):
    pass

# Persistent compilation cache: repeat test runs skip recompiles
# (the no-cache suite measured ~4x slower). The CPU lane gets its
# OWN directory — the axon TPU session's bundled CPU client bakes
# different target features into its CPU AOT entries, and loading a
# foreign client's entry is the documented SIGSEGV in utils/cache.py.
_CACHE = ("/root/.cache/jax_comp" if _ON_TPU
          else "/root/.cache/jax_comp_cpu")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
