"""``@configurable`` protocol: a decorated ``__init__`` accepts either
explicit kwargs or a single cfg positional, in which case the class's
``from_config(cfg)`` supplies the kwargs.  That is the whole contract the
reference relies on (e.g. aggregation/TemporalStereo/TemporalStereo.py:23-78,
backbone/TemporalStereo.py:47-99)."""
import functools


def _is_cfg(obj) -> bool:
    # fvcore/yacs CfgNode duck-typing: a mapping with attribute access.
    return isinstance(obj, dict) and type(obj).__name__ in (
        "CfgNode", "_CfgNode")


def _called_with_cfg(*args, **kwargs) -> bool:
    if args and _is_cfg(args[0]):
        return True
    return _is_cfg(kwargs.get("cfg"))


def configurable(init_func=None, *, from_config=None):
    if init_func is not None:
        assert init_func.__name__ == "__init__", (
            "configurable stub only supports decorating __init__")

        @functools.wraps(init_func)
        def wrapped(self, *args, **kwargs):
            if _called_with_cfg(*args, **kwargs):
                cfg = kwargs.pop("cfg") if "cfg" in kwargs else args[0]
                explicit = type(self).from_config(cfg)
                explicit.update(kwargs)
                init_func(self, **explicit)
            else:
                init_func(self, *args, **kwargs)

        return wrapped

    raise NotImplementedError(
        "configurable stub: function-style usage not needed by the reference")
