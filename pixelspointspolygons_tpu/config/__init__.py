from .engine import Config, compose, default_config_dir, load_yaml, to_yaml

__all__ = ["Config", "compose", "default_config_dir", "load_yaml", "to_yaml"]
