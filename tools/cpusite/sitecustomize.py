"""Force-CPU shim for entry-point / benchmark runs on this image.

The image's ``PYTHONPATH=/root/.axon_site`` sitecustomize registers the
axon TPU backend and the env forces ``JAX_PLATFORMS=axon`` — so a "CPU"
run launched with only ``JAX_PLATFORMS=cpu`` still attaches the (single-
owner) TPU and can RESOURCE_EXHAUST the job that owns it.  Python imports
only the FIRST ``sitecustomize`` on ``sys.path``: prepending this
directory shadows the axon one entirely.

Usage::

    PYTHONPATH=/root/repo/tools/cpusite python single_experiment_runner.py ...

Optional: ``IRW_CPU_DEVICES=8`` for a virtual multi-device CPU mesh.

HARD OVERRIDE, by design: this shim unconditionally sets
``JAX_PLATFORMS=cpu`` and fully shadows the axon sitecustomize (whatever
else that module configures is dropped).  Mixed-platform runs (e.g.
``JAX_PLATFORMS=cpu,axon``) are impossible through this path — that is
the point: the only job of this shim is to guarantee a run can NEVER
touch the single-owner TPU.  For anything that should see the chip, do
not use this shim.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

_flags = os.environ.get("XLA_FLAGS", "")
_extra = []
_n = os.environ.get("IRW_CPU_DEVICES")
if _n and "host_platform_device_count" not in _flags:
    _extra.append(f"--xla_force_host_platform_device_count={_n}")
# XLA:CPU collectives have 20s/40s rendezvous timeouts that ABORT the
# process when a 1-core host runs heavy per-device programs on a virtual
# mesh — raise them (correctness runs care about equivalence, not latency)
if "collective_call_warn_stuck" not in _flags:
    _extra.append("--xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
    _extra.append("--xla_cpu_collective_call_terminate_timeout_seconds=3600")
if _extra:
    os.environ["XLA_FLAGS"] = (_flags + " " + " ".join(_extra)).strip()

# never point the persistent compile cache at a shared dir from a CPU
# process: XLA:CPU AOT entries are keyed without host CPU features and a
# foreign-host entry aborts the process (utils/misc.enable_compile_cache)
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")
