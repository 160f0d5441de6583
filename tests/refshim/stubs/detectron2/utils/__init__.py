from . import env, registry  # noqa: F401
