"""Advisory chip lock: serialize TPU-attaching processes on a shared dev VM.

ONE process owns the TPU at a time; a second process's first dispatch can
either block indefinitely or poison the owner with spurious
RESOURCE_EXHAUSTED failures (both observed: a mis-launched "CPU" run that
silently attached the forced-axon backend, and a duplicated chip-queue
phase running its job list twice concurrently — see CLAUDE.md).  An
fcntl.flock on a well-known path makes the serialization explicit: the
second process *waits at the lock, before attaching*, instead of fighting
the owner inside the TPU runtime.

Design notes:

- fd-based flock releases automatically when the process exits (including
  SIGKILL), so there are no stale-lock hazards and no unlock path to get
  wrong.
- Only LEAF processes take the lock (the entry points / bench mains that
  actually dispatch).  Drivers like ``studies/run_plan.py`` must NOT —
  parent and child would deadlock.
- CPU-backend processes skip it: the platform is read from
  ``jax.config.jax_platforms`` / ``$JAX_PLATFORMS`` WITHOUT initializing
  the backend (initializing is exactly the contention this prevents).

No reference counterpart: the reference assumes exclusive GPUs per job
(config/hydra/launcher/ray_launcher.yaml); the shared single-chip dev
tunnel is a TPU-environment constraint.
"""

from __future__ import annotations

import fcntl
import os

from irw_tpu.utils.logger import LOGGER

_LOCK_PATH = "/tmp/irw_chip.lock"
_lock_file = None  # keeps the fd (and therefore the lock) alive


def _configured_platform() -> str:
    """The platform jax WILL use, read without initializing a backend."""
    try:
        import jax

        plat = getattr(jax.config, "jax_platforms", None)
    except Exception:  # pragma: no cover - jax always importable here
        plat = None
    plat = plat or os.environ.get("JAX_PLATFORMS", "")
    return (plat or "").split(",")[0].strip().lower()


def acquire_chip_lock(path: str = _LOCK_PATH, force: bool = False) -> bool:
    """Take the exclusive chip lock (blocking), unless targeting CPU.

    Returns True if the lock was taken.  Idempotent per process.  The lock
    is held until process exit; there is deliberately no release API.
    ``force=True`` takes it regardless of platform (tests).
    """
    global _lock_file
    if _lock_file is not None:
        return True
    if not force and _configured_platform() == "cpu":
        return False
    f = open(path, "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        LOGGER.info(
            f"chip lock {path} is held by another TPU process; waiting "
            "(one process owns the chip at a time)")
        fcntl.flock(f, fcntl.LOCK_EX)
    _lock_file = f
    return True
