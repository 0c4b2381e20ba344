"""Long-run host hygiene for the XLA CPU backend.

Every distinct XLA compilation keeps its LLVM JIT module mapped for the
whole process lifetime, and each module contributes a handful of small
code/rodata/data mappings.  A long SLAM session on the CPU backend
accumulates thousands of executables (shape-diverse host-side jnp ops +
kernel variants), and the process eventually exhausts the kernel's
default `vm.max_map_count` (65530) — LLVM then fails with
"Cannot allocate memory" mid-compile (observed deterministically at
~250 frames / ~11k live executables on the MH replay).  Real-TPU runs
are far less exposed (device executables don't live in host JIT pages),
but the CPU path is what tests and the accuracy replay use.

Two mitigations, both best-effort and safe to call repeatedly:

* `raise_map_count_limit()` — lift the sysctl when the process is
  privileged (container images often run as root).
* `maybe_clear_jit_caches()` — when the mapping count nears the limit,
  drop JAX's compiled-executable caches; steady-state shapes recompile
  once and the map count falls back to baseline.
"""
from __future__ import annotations


def map_count() -> int:
    """Number of memory mappings of this process (-1 if unreadable)."""
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return -1


def map_count_limit() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except (OSError, ValueError):
        return 65530


def raise_map_count_limit(target: int = 1_000_000) -> bool:
    """Best-effort lift of vm.max_map_count (needs privilege)."""
    try:
        if map_count_limit() >= target:
            return True
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write(str(target))
        return map_count_limit() >= target
    except OSError:
        return False


def maybe_clear_jit_caches(headroom: int = 12_000) -> bool:
    """Drop JAX's compiled caches when mappings near the kernel limit.

    Returns True if a clear happened.  Costly on CPU (the live working
    set recompiles once), so this only fires as a last resort when
    `raise_map_count_limit` was not possible."""
    n = map_count()
    if n < 0 or n < map_count_limit() - headroom:
        return False
    import jax

    jax.clear_caches()
    return True
