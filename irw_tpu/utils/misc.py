"""Small helpers (reference: main/utils/{expand_path,format_time,
override_config,str_to_bool,count_parameters}.py)."""

import os


def expand_path(path: str) -> str:
    return os.path.abspath(os.path.expandvars(os.path.expanduser(str(path))))


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX at the repo-local persistent compilation cache.

    Study jobs otherwise pay the full multi-minute XLA compile on every
    launch — including exact relaunches of the same program (observed
    ~15 min per protocol job through the axon remote-compile service).
    Entry points call this before the first trace; repeat programs and
    the λ-independent eval/kNN executables then hit the on-disk cache.
    Idempotent and safe to call after jax is imported.

    TPU-only: XLA:CPU persists AOT executables keyed WITHOUT the host's
    CPU feature set, so a cache populated on one machine type aborts
    (SIGILL) when loaded on another — observed as ``Fatal Python error:
    Aborted`` inside jitted CPU ops after a host migration
    (cpu_aot_loader warns exactly this).  CPU runs recompile fresh.
    """
    import jax

    if jax.default_backend() == "cpu":
        return
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - older jax without the knob
        pass


def format_time(seconds: float) -> str:
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    if h:
        return f"{h}h{m:02d}m{s:02d}s"
    if m:
        return f"{m}m{s:02d}s"
    return f"{s}s"


def str_to_bool(value) -> bool:
    if isinstance(value, bool):
        return value
    value = str(value).lower()
    if value in ("yes", "true", "t", "1"):
        return True
    if value in ("no", "false", "f", "0"):
        return False
    raise ValueError(f"cannot interpret {value!r} as bool")


def override_config(overrides: dict, config):
    """Set dotted-path keys into a nested Config/dict (reference:
    main/utils/override_config.py:1-16)."""
    for dotted, value in overrides.items():
        node = config
        *parents, leaf = dotted.split(".")
        for part in parents:
            node = node[part]
        node[leaf] = value
    return config


def count_parameters(params) -> int:
    """Total number of scalars in a pytree of arrays."""
    import jax

    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
