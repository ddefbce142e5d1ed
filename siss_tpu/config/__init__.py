from siss_tpu.config.core import (
    Config,
    load_config,
    instantiate,
    get_object,
    to_dict,
)

__all__ = ["Config", "load_config", "instantiate", "get_object", "to_dict"]
