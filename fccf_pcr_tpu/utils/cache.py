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
import platform


def host_keyed_cache_dir(tag: str) -> str:
    """A /tmp cache path namespaced by (machine, CPU flags, python)."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (line for line in f if line.startswith("flags")), ""
            )
    except OSError:
        flags = ""
    key = "|".join([platform.machine(), platform.python_version(), flags])
    h = hashlib.sha1(key.encode()).hexdigest()[:10]
    return f"/tmp/jaxcache-fccf-{tag}-{h}"
