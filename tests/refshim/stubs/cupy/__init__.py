"""cupy stand-in: the reference only touches cupy at import time through the
``@cupy.memoize`` decorator on its kernel-launcher
(architecture/modeling/layers/softsplat.py:234-236); the decorated body is
GPU-only and never runs on CPU."""


def memoize(for_each_device=False):
    def decorator(fn):
        return fn

    return decorator


class _Cuda:
    def compile_with_cache(self, *a, **k):  # pragma: no cover
        raise RuntimeError("cupy stub: no CUDA available in this sandbox")


cuda = _Cuda()
