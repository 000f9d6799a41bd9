"""Command-line entry points (reference Train_Geo / Train_Agent /
Test_Agent / Test_Geo equivalents)."""

from .common import build_config, build_dataset, add_common_args  # noqa: F401
