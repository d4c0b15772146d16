"""Cross-cutting utilities: options/config, checkpointing, logging."""

from .options import PIFuLevelConfig, Options, build_arg_parser, parse_options
