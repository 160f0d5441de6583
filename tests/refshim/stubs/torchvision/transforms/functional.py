def adjust_gamma(img, gamma, gain=1):  # pragma: no cover
    raise RuntimeError("torchvision stub: functional transforms unavailable")
