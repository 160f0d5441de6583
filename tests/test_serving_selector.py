"""Serving operating-point selection (serving.py, VERDICT r4 #5).

The measured latency model (docs/PERF.md round-4 latency-mode table) is
encoded as LatencyModel; select_operating_point picks the dispatch chunk
for a (stream count, fps target) and warns when one chip cannot reach it.
These tests pin the model against the MEASURED curve and the selector
against the operating points the docs derived by hand.
"""
import numpy as np

from temporalstereo_tpu.serving import (LatencyModel, V5E_DIRECT,
                                        V5E_TUNNEL, select_operating_point)

# the round-4 measurements the model must reproduce:
# (streams, chunk, measured fps/stream) from docs/PERF.md
MEASURED = [
    (1, 1, 17.8),
    (1, 2, 30.9),
    (1, 8, 47.8),
    (2, 1, 15.7),
    (2, 2, 21.2),
    (2, 8, 27.8),
    (4, 8, 16.6),
]


def test_latency_model_matches_measured_curve():
    for streams, chunk, fps in MEASURED:
        pred = V5E_TUNNEL.fps_per_stream(streams, chunk)
        assert abs(pred - fps) / fps < 0.35, (streams, chunk, pred, fps)
    # the well-constrained b=1/b=2 fits are tight (<=12%)
    for streams, chunk, fps in MEASURED[:6]:
        pred = V5E_TUNNEL.fps_per_stream(streams, chunk)
        assert abs(pred - fps) / fps < 0.12, (streams, chunk, pred, fps)


def test_selector_reproduces_doc_operating_points():
    # 1 stream @ real-time 24 fps: chunk 2 (docs: chunk-2 = 30.9 fps, the
    # smallest chunk clearing the bar; chunk-1 = 17.8 is below)
    op = select_operating_point(1, 24.0)
    assert op["feasible"] and op["chunk"] == 2

    # 2 streams @ 24 fps: needs a bigger chunk (docs: chunk-8 = 27.8)
    op = select_operating_point(2, 24.0)
    assert op["feasible"] and op["chunk"] in (4, 8)
    assert op["fps_per_stream"] >= 24.0

    # 4 streams @ 24 fps/stream: beyond the DMA ceiling (docs: 16.6
    # fps/stream flat) -> infeasible, remedy = fewer streams/chip + DP
    op = select_operating_point(4, 24.0)
    assert not op["feasible"]
    assert "multi-chip" in op["note"]
    assert op["fps_per_stream"] < 24.0

    # latency ordering: the selector picks the SMALLEST feasible chunk, so
    # loosening the target can only lower latency
    op_easy = select_operating_point(1, 10.0)
    assert op_easy["chunk"] <= 2
    assert op_easy["latency_ms"] <= op["latency_ms"] * 10


def test_direct_attach_model_serves_chunk1_realtime():
    # docs: tunnel-corrected device latency ~16 ms/frame at b=1 -> a
    # directly-attached chip serves one stream chunk-1 in real time
    op = select_operating_point(1, 24.0, latency_model=V5E_DIRECT)
    assert op["feasible"] and op["chunk"] == 1


def test_latency_model_fit_roundtrip():
    true_d, true_t = 40.0, 16.0
    pts = [(1, c, true_d + c * true_t) for c in (1, 2, 4, 8)]
    lm = LatencyModel.fit(pts)
    d, t = lm.params(1)
    np.testing.assert_allclose([d, t], [true_d, true_t], rtol=1e-6)
    # interpolation between measured stream counts
    lm2 = LatencyModel({1: (40.0, 16.0), 4: (40.0, 55.0)})
    d, t = lm2.params(2)
    assert 16.0 < t < 55.0
    # extrapolation beyond the last point keeps growing (DMA-bound regime)
    assert lm2.params(8)[1] > 55.0
