"""Scene/model presets: named, reproducible simulation setups."""

from .presets import PRESETS, make_scene, list_presets

__all__ = ["PRESETS", "make_scene", "list_presets"]
