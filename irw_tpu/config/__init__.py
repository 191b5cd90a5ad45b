"""Config subsystem (reference: Hydra tree under config/, SURVEY §2.2).

The reference composes ~170 YAML files with Hydra: a ``defaults`` list in
``config/default.yaml`` picks one option per group (experience, dataset, loss,
memory, model, optimizer, transform), groups interpolate into each other
(``${transform.train...}``), and the CLI applies dotted overrides /
group swaps / comma sweeps.  Hydra is not available in this image, so
``irw_tpu.config`` implements the same composition semantics natively:

- :func:`compose` — group composition from a config dir;
- :class:`Config` — attribute/item access, merge, interpolation;
- :func:`parse_overrides` / :func:`expand_sweeps` — CLI override grammar
  (``a.b=c``, ``group=option``, ``+new.key=v``, ``a=1,2,3`` multirun).
"""

from irw_tpu.config.compose import (
    Config,
    compose,
    expand_sweeps,
    load_yaml,
    parse_overrides,
)

__all__ = ["Config", "compose", "load_yaml", "parse_overrides", "expand_sweeps"]
