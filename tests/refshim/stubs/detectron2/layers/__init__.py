"""BN aliases used by architecture/modeling/layers/basic_layers.py:6-7.

On a single CPU process SyncBN is exactly BatchNorm, so NaiveSyncBatchNorm
degenerates to nn.BatchNorm2d.  FrozenBatchNorm2d applies fixed affine
statistics (detectron2 semantics: buffers only, no stat updates)."""
import torch
import torch.nn as nn


class NaiveSyncBatchNorm(nn.BatchNorm2d):
    pass


class FrozenBatchNorm2d(nn.Module):
    _version = 3

    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.register_buffer("weight", torch.ones(num_features))
        self.register_buffer("bias", torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features) - eps)

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        bias = self.bias - self.running_mean * scale
        scale = scale.reshape(1, -1, 1, 1)
        bias = bias.reshape(1, -1, 1, 1)
        return x * scale + bias
