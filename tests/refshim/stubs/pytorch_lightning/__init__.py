"""pytorch_lightning stand-in: just enough for
projects/TemporalStereo/TemporalStereo.py to construct and run its forward
paths (multi_frame_forward / update_map) on CPU.  No Trainer, no loops."""
import torch.nn as nn


class LightningModule(nn.Module):
    def __init__(self):
        super().__init__()
        self.global_step = 0
        self.current_epoch = 0
        self._hparams = {}
        self._logged = {}

    def save_hyperparameters(self, hparams=None, *a, **k):
        if hparams is not None:
            self._hparams = hparams

    @property
    def hparams(self):
        return self._hparams

    def log_dict(self, d, *a, **k):
        self._logged.update(d)

    def log(self, name, value, *a, **k):
        self._logged[name] = value
