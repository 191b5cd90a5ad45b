"""Small helpers (reference: main/utils/{expand_path,format_time,
override_config,str_to_bool,count_parameters}.py)."""

import os


def expand_path(path: str) -> str:
    return os.path.abspath(os.path.expandvars(os.path.expanduser(str(path))))


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
