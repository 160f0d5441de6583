"""detectron2 stand-in — just the four surfaces the reference touches:
``config.configurable``, ``utils.registry.Registry``, ``utils.env``,
``layers.{NaiveSyncBatchNorm, FrozenBatchNorm2d}``."""
