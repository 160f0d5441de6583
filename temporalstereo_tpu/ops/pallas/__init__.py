from .shift import shift_1d_pallas

__all__ = ["shift_1d_pallas"]
