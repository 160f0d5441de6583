"""pypng stand-in: the reference imports ``png`` at module scope
(architecture/data/utils/load_flow.py:3) but only calls it inside KITTI flow
writers, which the parity tests never invoke."""


class Writer:  # pragma: no cover
    def __init__(self, *a, **k):
        raise RuntimeError("png stub: pypng not available in this sandbox")


class Reader:  # pragma: no cover
    def __init__(self, *a, **k):
        raise RuntimeError("png stub: pypng not available in this sandbox")
