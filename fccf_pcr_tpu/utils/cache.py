"""Host-keyed persistent-compilation-cache paths.

XLA:CPU's persistent cache is keyed by program only, NOT by the host's
CPU feature set. An executable AOT-compiled in one container can load in
another with different vector features (logged as "Target machine
feature ... is not supported on the host machine"), where it both risks
SIGILL and — observed in practice — computes f32 reductions in a
different order than a fresh compile would, shifting scores by ~4e-3
relative and tripping golden regression bands. Keying the cache
directory by a host fingerprint makes stale cross-container entries
unreachable instead of subtly wrong.
"""

from __future__ import annotations

import hashlib
import os
import platform
import re


def host_keyed_cache_dir(tag: str) -> str:
    """A /tmp cache path namespaced by (machine, CPU identity, python,
    jax/jaxlib versions).

    The fingerprint includes the CPU *model/stepping/microcode*, not just
    the feature flags: LLVM derives tuning features (e.g.
    ``prefer-no-gather``, set for Downfall-mitigated Intel parts) from the
    model, so two hosts with identical cpuinfo ``flags`` can still compile
    incompatible AOT executables — observed as cross-host "machine type
    doesn't match" loads through a /tmp shared across container hosts."""
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(
                    ("flags", "model name", "model\t", "stepping", "microcode")
                ):
                    ident.append(line.strip())
                if line.startswith("power management"):  # end of first CPU
                    break
    except OSError:
        pass
    try:
        import jax
        import jaxlib

        versions = f"{jax.__version__}|{jaxlib.__version__}"
    except Exception:
        versions = "unknown"
    key = "|".join(
        [platform.machine(), platform.python_version(), versions, *ident]
    )
    h = hashlib.sha1(key.encode()).hexdigest()[:10]
    # user-scoped and pre-created 0700: /tmp is world-writable and the
    # hash is computable from public host facts, so an unscoped path
    # could be squatted (PermissionError) or pre-seeded with stale
    # entries — the exact subtle-wrong-scores failure this module
    # exists to prevent. The tag is sanitized against path separators.
    tag = re.sub(r"[^A-Za-z0-9_.-]", "_", tag)
    uid = os.getuid() if hasattr(os, "getuid") else 0
    path = f"/tmp/jaxcache-fccf-{uid}-{tag}-{h}"
    os.makedirs(path, mode=0o700, exist_ok=True)
    if hasattr(os, "getuid") and os.stat(path).st_uid != os.getuid():
        raise RuntimeError(f"compilation cache dir {path} owned by another user")
    return path
