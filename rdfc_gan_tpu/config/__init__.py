from .config import Config, load_config, dump_config, default_config

__all__ = ["Config", "load_config", "dump_config", "default_config"]
