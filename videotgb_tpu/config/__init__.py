from videotgb_tpu.config.core import (
    Config,
    compose,
    instantiate,
    load_yaml,
    merge,
    parse_overrides,
    to_dict,
)

__all__ = [
    "Config",
    "compose",
    "instantiate",
    "load_yaml",
    "merge",
    "parse_overrides",
    "to_dict",
]
