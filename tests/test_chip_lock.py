"""Chip-lock semantics (irw_tpu/utils/chip_lock.py): CPU processes skip
it; a second TPU-bound process blocks at the flock instead of attaching
concurrently (the RESOURCE_EXHAUSTED poisoning mode in CLAUDE.md)."""

import fcntl
import os
import subprocess
import sys


def test_cpu_platform_skips_lock(tmp_path):
    from irw_tpu.utils import chip_lock

    # conftest pins jax_platforms=cpu for the whole suite
    assert chip_lock._configured_platform() == "cpu"
    assert chip_lock.acquire_chip_lock(str(tmp_path / "lock")) is False
    assert chip_lock._lock_file is None


def test_force_acquires_and_excludes(tmp_path):
    """force=True takes the flock; a second process sees it held, and the
    lock dies with its owner (fd-based, no stale-lock cleanup needed)."""
    path = str(tmp_path / "lock")
    probe = (
        "import fcntl, sys\n"
        "f = open(sys.argv[1], 'w')\n"
        "try:\n"
        "    fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)\n"
        "    print('FREE')\n"
        "except OSError:\n"
        "    print('HELD')\n"
    )
    holder = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, fcntl, time\n"
         "sys.path.insert(0, sys.argv[2])\n"
         "from irw_tpu.utils.chip_lock import acquire_chip_lock\n"
         "assert acquire_chip_lock(sys.argv[1], force=True)\n"
         "print('LOCKED', flush=True)\n"
         "time.sleep(30)\n",
         path, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))],
        stdout=subprocess.PIPE, text=True)
    try:
        assert holder.stdout.readline().strip() == "LOCKED"
        out = subprocess.run([sys.executable, "-c", probe, path],
                             capture_output=True, text=True, timeout=30)
        assert out.stdout.strip() == "HELD"
    finally:
        holder.kill()
        holder.wait()
    # owner death releases the lock
    out = subprocess.run([sys.executable, "-c", probe, path],
                         capture_output=True, text=True, timeout=30)
    assert out.stdout.strip() == "FREE"
