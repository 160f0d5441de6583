"""AOT serving bundle for the flagship streaming mode.

The reference's serving UX is "load ckpt and go" (video_inference.py); on
TPU the equivalent cold start pays minutes of XLA compile for the streaming
graphs (the steady state plus one graph per local-map growth stage, CLAUDE
notes 5-15 min cold).  This module AOT-compiles those graphs ONCE and
serializes the compiled executables (jax.experimental.serialize_executable),
so a fresh host at the same platform/topology loads and runs with ZERO
compile — the TPU-native answer to the reference's UX.

Bundle = one pickle file:
  {"meta": {platform, device_kind, jax_version, h, w, b, stages,
            with_previous, local_map_size, fold_bn},
   "graphs": {stage_name: (payload, in_tree, out_tree)}}

Stage graphs (exact-growth schedule, models/temporal.py):
  g0          first frame, no warp, local_map 0 channels
  g{k}, k>=1  growth frame: warp grows the map k-1 -> k channels
  steady      full-width map, warp on

Each graph is a pure function
  (variables, left, right, prev, K, baseline, T) -> (disps0, new_prev)
with the weights passed at call time, so one bundle serves any checkpoint
of the same architecture.

Weights are NOT baked in; pair the bundle with a weights file
(training/checkpoint.save_weights) or any supported checkpoint.

TRUST MODEL: a bundle is a pickle file — unpickling executes arbitrary
code, so load ONLY bundles you created or obtained from a trusted source
(same stance as torch.load on the reference's .ckpt files).  Loading also
verifies a model-identity hash (architecture flags + param-tree structure,
``meta['model_hash']``) against the model/variables you pass, so a bundle
paired with a mismatched architecture fails fast with a clear error
instead of opaquely at executable call time.
"""
from __future__ import annotations

import gzip
import hashlib
import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

BUNDLE_VERSION = 1


# --------------------------------------------------------------------------
# Operating-point selection (VERDICT r4 #5): the measured latency model of
# temporal streaming on one v5e chip, encoded so serving picks chunk size
# for a (stream count, fps target) instead of the user re-deriving it from
# docs/PERF.md.  Model: one dispatch of `chunk` frames over `streams`
# concurrent streams costs  wall_ms = dispatch_ms + chunk * frame_ms(streams)
# — dispatch overhead amortizes over the chunk, per-frame device time grows
# super-linearly with streams past the DMA ceiling (docs/PERF.md, "the
# binding resource is DMA").  Per-frame latency IS the dispatch wall (a
# frame waits for its whole chunk), so bigger chunks trade latency for
# throughput.
# --------------------------------------------------------------------------

class LatencyModel:
    """Linear-per-chunk latency model fit from measured (streams, chunk,
    wall_ms) points; interpolates dispatch/frame costs between measured
    stream counts and extrapolates beyond the last one."""

    def __init__(self, points: "dict[int, tuple[float, float]]",
                 name: str = "custom"):
        # points: streams -> (dispatch_ms, frame_ms)
        self.points = dict(sorted(points.items()))
        self.name = name

    @classmethod
    def fit(cls, measurements, name: str = "fit") -> "LatencyModel":
        """measurements: iterable of (streams, chunk, wall_ms) — least-
        squares fit of wall = d + chunk * t per stream count (>= 2 chunk
        sizes per stream count required)."""
        by_s: Dict[int, list] = {}
        for s, c, w in measurements:
            by_s.setdefault(int(s), []).append((float(c), float(w)))
        pts = {}
        for s, cw in by_s.items():
            if len(cw) < 2:
                raise ValueError(f"streams={s}: need >=2 chunk sizes")
            n = len(cw)
            sx = sum(c for c, _ in cw)
            sy = sum(w for _, w in cw)
            sxx = sum(c * c for c, _ in cw)
            sxy = sum(c * w for c, w in cw)
            t = (n * sxy - sx * sy) / max(n * sxx - sx * sx, 1e-9)
            d = (sy - t * sx) / n
            pts[s] = (max(d, 0.0), max(t, 1e-6))
        return cls(pts, name)

    def params(self, streams: int) -> Tuple[float, float]:
        """(dispatch_ms, frame_ms) for a stream count, interpolated."""
        ks = list(self.points)
        if streams <= ks[0]:
            return self.points[ks[0]]
        if streams >= ks[-1]:
            # extrapolate frame time with the last measured slope (DMA-
            # bound regime: device time grows ~linearly with streams)
            if len(ks) >= 2:
                (d1, t1), (d0, t0) = self.points[ks[-1]], self.points[ks[-2]]
                slope = (t1 - t0) / max(ks[-1] - ks[-2], 1)
                return d1, t1 + slope * (streams - ks[-1])
            return self.points[ks[-1]]
        for lo, hi in zip(ks, ks[1:]):
            if lo <= streams <= hi:
                f = (streams - lo) / (hi - lo)
                d0, t0 = self.points[lo]
                d1, t1 = self.points[hi]
                return d0 + f * (d1 - d0), t0 + f * (t1 - t0)
        raise AssertionError

    def wall_ms(self, streams: int, chunk: int) -> float:
        d, t = self.params(streams)
        return d + chunk * t

    def fps_per_stream(self, streams: int, chunk: int) -> float:
        return 1000.0 * chunk / self.wall_ms(streams, chunk)


# Fit from the round-4 measured curve (docs/PERF.md latency-mode table +
# multi-stream bench, 384x1248 bf16 on one v5e THROUGH the sandbox tunnel:
# b=1 chunks 1/2/8 = 56.3/64.8/167.2 ms wall; b=2 = 63.9/94.4/288; b=4/8
# chunk-8 walls from the 66.4/62.3 aggregate-fps points).
V5E_TUNNEL = LatencyModel.fit(
    [(1, 1, 56.3), (1, 2, 64.8), (1, 8, 167.2),
     (2, 1, 63.9), (2, 2, 94.4), (2, 8, 288.0),
     (4, 2, 160.0), (4, 8, 482.0),
     (8, 2, 330.0), (8, 8, 1027.0)],
    name="v5e-tunnel")
# Directly-attached estimate: same device time, ~2 ms dispatch
# (docs/PERF.md "tunnel-corrected device latency ~8.5-16 ms/frame").
V5E_DIRECT = LatencyModel(
    {s: (2.0, V5E_TUNNEL.points[s][1]) for s in V5E_TUNNEL.points},
    name="v5e-direct")


def select_operating_point(streams: int, target_fps: float,
                           latency_model: Optional[LatencyModel] = None,
                           max_chunk: int = 32) -> Dict[str, Any]:
    """Pick the SMALLEST chunk size whose predicted fps/stream meets
    ``target_fps`` (smallest = lowest per-frame latency).  Returns
    {chunk, fps_per_stream, latency_ms, feasible, model, note}; when no
    chunk reaches the target (dispatch overhead or the DMA ceiling),
    ``feasible`` is False, ``chunk`` is the best-throughput choice and
    ``note`` says how to actually hit the target (fewer streams per chip /
    multi-chip DP — streams are independent, parallel/mesh.py)."""
    lm = latency_model or V5E_TUNNEL
    best_chunk, best_fps = 1, lm.fps_per_stream(streams, 1)
    chunk = 1
    while chunk <= max_chunk:
        fps = lm.fps_per_stream(streams, chunk)
        if fps > best_fps:
            best_chunk, best_fps = chunk, fps
        if fps >= target_fps:
            return {"chunk": chunk, "fps_per_stream": round(fps, 1),
                    "latency_ms": round(lm.wall_ms(streams, chunk), 1),
                    "feasible": True, "model": lm.name, "note": ""}
        chunk *= 2
    # infeasible at this stream count: report the ceiling + the remedy
    max_streams = streams
    while max_streams > 1 and lm.fps_per_stream(
            max_streams, max_chunk) < target_fps:
        max_streams -= 1
    note = (f"{streams} stream(s) cannot reach {target_fps:.0f} fps/stream "
            f"on one chip (best {best_fps:.1f} fps at chunk {best_chunk}); "
            f"serve <= {max_streams} stream(s)/chip and scale streams by "
            "multi-chip data parallelism (streams are independent)")
    return {"chunk": best_chunk, "fps_per_stream": round(best_fps, 1),
            "latency_ms": round(lm.wall_ms(streams, best_chunk), 1),
            "feasible": False, "model": lm.name, "note": note}


def cast_params_bf16(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Store PARAMS as bfloat16 for inference/serving (VERDICT r4 #3).

    Flax's mixed-precision policy stores params f32 and casts per use
    (models/builder.py sets only the activation dtype), so every step
    re-fetches f32 weight bytes from HBM; the r4 profile attributes 46% of
    summed device time to weight/layout DMA.  Casting the stored params to
    bf16 once at load halves those bytes.  Only floating-point leaves of
    the 'params' collection are cast — batch_stats (BN running stats) and
    any integer leaves stay f32/int, and geometry state (PrevInfo, K, T)
    is untouched.  Inference-only: optimizer state must stay f32.
    """
    out = dict(variables)
    out["params"] = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        variables["params"])
    return out


def model_identity_hash(model, variables) -> str:
    """Stable digest of the architecture: behavior flags + the full
    param/stat tree structure (paths, shapes, dtypes).  Two (model,
    variables) pairs that could diverge under a bundle's compiled graphs
    hash differently."""
    tree = {"params": variables.get("params", {}),
            "batch_stats": variables.get("batch_stats", {})}
    leaves = [(jax.tree_util.keystr(path), tuple(leaf.shape),
               str(jnp.asarray(leaf).dtype))
              for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]]
    ident = {
        "with_previous": model.with_previous,
        "local_map_size": model.local_map_size,
        "use_past_cost": model.use_past_cost,
        "dtype": str(model.dtype),
        "tree": leaves,
    }
    blob = json.dumps(ident, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()


def _register_pytree_serialization() -> None:
    """jax.export StableHLO artifacts embed the arg pytree structure; the
    carried-state dataclasses (PrevInfo, CostMemory) need named
    serializers.  Both have no static auxdata (register_dataclass with only
    data fields), so pickle of the (empty) auxdata suffices."""
    from jax import export as jexport

    from .models.aggregation import CostMemory
    from .models.stereo import PrevInfo

    for cls, name in ((PrevInfo, "temporalstereo_tpu.PrevInfo"),
                      (CostMemory, "temporalstereo_tpu.CostMemory")):
        try:
            jexport.register_pytree_node_serialization(
                cls, serialized_name=name,
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads)
        except ValueError:  # already registered (re-import, tests)
            pass


_register_pytree_serialization()


def _stage_list(model) -> "list[tuple[str, int, bool]]":
    """[(name, incoming local_map channels, warp)] for the exact-growth
    streaming schedule."""
    if not model.with_previous:
        return [("single", 0, False)]
    stages = [("g0", 0, False)]
    s = model.local_map_size
    for k in range(1, s + 1):
        stages.append((f"g{k}", k - 1, True))
    stages.append(("steady", s, True))
    return stages


def _stage_fn(model, warp: bool):
    from .models.temporal import streaming_step

    def fn(variables, l, r, prev, K, baseline, T):
        outputs, new_prev = streaming_step(
            model, variables, l, r, prev, K, baseline, T,
            warp=warp if prev is not None else False)
        return outputs["disps"][0], new_prev

    return fn


def _stage_args(model, variables, b: int, h: int, w: int, channels: int,
                steady: bool, input_dtype=jnp.float32):
    from .models import backbone_memory_shapes, init_prev_info

    # executables are dtype-locked: f32 matches the CLI's normalized frames
    # (pass bfloat16 for the bench-style bf16 feed)
    l = jnp.zeros((b, h, w, 3), input_dtype)
    K = jnp.eye(3, dtype=jnp.float32)[None].repeat(b, 0)
    baseline = jnp.full((b,), 0.54, jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)[None].repeat(b, 0)
    prev = None
    if model.with_previous:
        mem_shapes = backbone_memory_shapes(model.backbone_cfg, (h, w))
        topk = model.precise_cfg.get("topk", 2)
        prev = init_prev_info(
            model, b, (h, w), mem_shapes, topk, model.dtype,
            local_map_channels=None if steady else channels)
    return variables, l, l, prev, K, baseline, T


def export_streaming_bundle(model, variables, path: str, b: int, h: int,
                            w: int, fold_bn: bool = False,
                            input_dtype=jnp.float32,
                            operating_point: Optional[Dict[str, Any]] = None,
                            progress=print) -> Dict[str, Any]:
    """AOT-compile every streaming stage graph and write the bundle.

    Each stage is stored TWICE: the pickled native executable (zero compile
    when it loads cleanly on a matching platform) and the portable
    StableHLO export (always loadable; recompiles, but skips tracing and
    hits the persistent compile cache)."""
    from jax import export as jexport
    from jax.experimental import serialize_executable as se

    graphs = {}
    stages = _stage_list(model)
    for name, channels, warp in stages:
        args = _stage_args(model, variables, b, h, w, channels,
                           steady=(name in ("steady", "single")),
                           input_dtype=input_dtype)
        progress(f"bundle: compiling stage '{name}' "
                 f"(local_map={channels}ch, warp={warp})...")
        jitted = jax.jit(_stage_fn(model, warp))
        compiled = jitted.lower(*args).compile()
        hlo = jexport.export(jitted)(*args).serialize()
        graphs[name] = {"exe": se.serialize(compiled), "hlo": hlo}
    meta = {
        "version": BUNDLE_VERSION,
        "platform": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "jax_version": jax.__version__,
        "b": b, "h": h, "w": w,
        "num_devices": 1,
        "input_dtype": str(jnp.dtype(input_dtype)),
        "stages": [s[0] for s in stages],
        "with_previous": model.with_previous,
        "local_map_size": model.local_map_size,
        "fold_bn": fold_bn,
        "model_hash": model_identity_hash(model, variables),
        # chunk choice from select_operating_point (None = not requested):
        # deployments read the recommended dispatch chunk from the bundle
        # instead of re-deriving it from docs/PERF.md
        "operating_point": operating_point,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # level-1 gzip: ~4x smaller (the big one-hot interpolation constants
    # embedded in the graphs compress well) for ~15 s on a full-size bundle
    with gzip.open(path, "wb", compresslevel=1) as fp:
        pickle.dump({"meta": meta, "graphs": graphs}, fp)
    progress(f"bundle: wrote {len(graphs)} compiled graphs -> {path} "
             f"({os.path.getsize(path) / 1e6:.1f} MB)")
    return meta


class StreamingBundle:
    """Loaded AOT bundle: a stateful per-frame streaming session with zero
    compilation."""

    def __init__(self, meta: Dict[str, Any], fns: Dict[str, Any], model,
                 variables):
        self.meta = meta
        self._fns = fns
        self._model = model
        self._variables = variables
        self.reset()

    def reset(self) -> None:
        self._frame = 0
        self._prev = None
        if self.meta["with_previous"]:
            from .models import backbone_memory_shapes, init_prev_info

            m = self._model
            mem_shapes = backbone_memory_shapes(
                m.backbone_cfg, (self.meta["h"], self.meta["w"]))
            self._prev = init_prev_info(
                m, self.meta["b"], (self.meta["h"], self.meta["w"]),
                mem_shapes, m.precise_cfg.get("topk", 2), m.dtype,
                local_map_channels=0 if m.local_map_size > 0 else None)

    def _stage_name(self) -> str:
        if not self.meta["with_previous"]:
            return "single"
        s = self.meta["local_map_size"]
        if self._frame <= s:
            return f"g{self._frame}"
        return "steady"

    def step(self, left, right, K, baseline, T_past_to_now):
        """One streaming frame -> full-res disparity [B, H, W, 1]."""
        fn = self._fns[self._stage_name()]
        disp, new_prev = fn(self._variables, left, right, self._prev, K,
                            baseline, T_past_to_now)
        if self.meta["with_previous"]:
            self._prev = new_prev
        self._frame += 1
        return disp


def load_streaming_bundle(path: str, model, variables,
                          progress=print) -> StreamingBundle:
    """Load a bundle.  Per stage: try the zero-compile native executable
    first (probe-run on dummy inputs — AOT loads can fail across host
    revisions); fall back to the portable StableHLO export, which re-uses
    the persistent compile cache.

    TRUSTED INPUT ONLY: the bundle is a pickle (see module docstring).
    The stored ``model_hash`` is verified against (model, variables) —
    a mismatched architecture raises ValueError before any graph runs."""
    from jax import export as jexport
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as raw:
        magic = raw.read(2)
    opener = gzip.open if magic == b"\x1f\x8b" else open
    with opener(path, "rb") as fp:
        data = pickle.load(fp)
    meta = data["meta"]
    want = meta.get("model_hash")
    if want is not None:
        got = model_identity_hash(model, variables)
        if got != want:
            raise ValueError(
                f"bundle {path} was exported for a different model: "
                f"model_hash {want[:12]}... != {got[:12]}... — check "
                "architecture config (WITH_PREVIOUS / LOCAL_MAP_SIZE / "
                "backbone width) and the weights file")
    else:
        progress("bundle: no model_hash in meta (old bundle) — skipping "
                 "architecture verification")
    platform = jax.devices()[0].platform
    same_platform = meta["platform"] == platform
    if not same_platform:
        progress(f"bundle: compiled for '{meta['platform']}' "
                 f"({meta.get('device_kind')}), host is '{platform}' — "
                 "using the portable StableHLO path (will compile)")
    # pin execution to the device count the graphs were compiled for (the
    # serving graphs are single-device; without this, deserialization maps
    # the executable onto ALL local devices and the arg shardings mismatch)
    devices = jax.devices()[: meta.get("num_devices", 1)]
    input_dtype = jnp.dtype(meta.get("input_dtype", "float32"))
    stages = {s: (c, wp) for s, c, wp in _stage_list(model)}
    fns = {}
    for name, blob in data["graphs"].items():
        fn = None
        if same_platform and blob.get("exe") is not None:
            try:
                fn = se.deserialize_and_load(*blob["exe"],
                                             execution_devices=devices)
                # probe: a stale/mismatched AOT executable can load but die
                # at run time — validate before trusting it
                channels, _ = stages[name]
                args = _stage_args(model, variables, meta["b"], meta["h"],
                                   meta["w"], channels,
                                   steady=(name in ("steady", "single")),
                                   input_dtype=input_dtype)
                jax.block_until_ready(jax.tree.leaves(fn(*args))[0])
            except Exception as e:  # fall back to the portable path
                progress(f"bundle: native executable for '{name}' failed "
                         f"({type(e).__name__}); using StableHLO fallback")
                fn = None
        if fn is None:
            fn = jax.jit(jexport.deserialize(blob["hlo"]).call)
        fns[name] = fn
    return StreamingBundle(meta, fns, model, variables)
