"""Persistent XLA compilation cache, ON by default.

The flagship 5B serving programs cost ~17 minutes of cold compile on the
tunneled TPU backend (BENCH_r04: first_pass_with_compile_s 1051.78) and
every fresh process pays it again — the bench driver, every drift-sweep
mode, every operator deploy. jax's persistent compilation cache keys on
(program HLO, compile options, backend version), so a warm cache turns all
of those into disk reads.

Round-4 left the cache opt-in behind an UNMEASURED caveat ("remote-compile
TPU tunnels may bypass or slow down the disk cache"). Round 5 measured it
on this tunnel (docs/reports/ROUND5_VERDICT_RESPONSES.md §4): the cache is
populated and hit normally — compilation happens host-side in the plugin
before programs ship over the relay — so it is now DEFAULT-ON.

Contract:
  * default cache dir: $DOVE_JAX_CACHE if set to a path;
    else <repo>/.jax_cache (created on demand; .gitignored).
  * DOVE_JAX_CACHE=off|0|none disables it (the only reason to: a read-only
    checkout AND an unwritable home).
  * falls back to disabled (with a stderr note) if the dir is unwritable.

Call enable_persistent_cache() before the first compilation; entry points
(bench.py, scripts/*.py) call it at import time.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_DISABLE_VALUES = ("off", "0", "none", "false")


def default_cache_dir() -> Path:
    return Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_persistent_cache(path: str | os.PathLike | None = None) -> str | None:
    """Point jax's persistent compilation cache at a writable dir.

    Returns the directory used, or None if disabled/unwritable.
    """
    env = os.environ.get("DOVE_JAX_CACHE", "").strip()
    if env.lower() in _DISABLE_VALUES:
        return None
    cache_dir = Path(path) if path is not None else (
        Path(env) if env else default_cache_dir()
    )
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        probe = cache_dir / ".write_probe"
        probe.write_bytes(b"")
        probe.unlink()
    except OSError as e:  # pragma: no cover - unwritable-fs path
        print(f"dove_tpu: persistent compile cache disabled "
              f"({cache_dir}: {e})", file=sys.stderr)
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    # Anything under a second recompiles faster than it round-trips disk.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return str(cache_dir)
