import torch


def normalize(tensor, mean, std, inplace=False):
    mean = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
    std = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
    return (tensor - mean) / std


def adjust_gamma(img, gamma, gain=1):  # pragma: no cover
    raise RuntimeError("torchvision stub: PIL gamma adjust unavailable")
