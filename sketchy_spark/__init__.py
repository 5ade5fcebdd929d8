"""sketchy_spark: PySpark-native near-duplicate detection & clustering engine."""

from sketchy_spark.config import DEFAULT_CONFIG, SketchConfig, check_compatibility

__all__ = ["SketchConfig", "DEFAULT_CONFIG", "check_compatibility"]
__version__ = "0.1.0"
