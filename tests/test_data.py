"""Data-layer tests on a synthetic on-disk dataset (annfile format parity
with the reference splits)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from temporalstereo_tpu.config import get_default_config
from temporalstereo_tpu.data import build_dataloader, build_stereo_dataset
from temporalstereo_tpu.data.formats import (
    load_kitti_disp,
    load_pfm,
    load_pose_file,
    write_kitti_disp,
    write_pfm,
)


@pytest.fixture(scope="module")
def fake_sceneflow(tmp_path_factory):
    root = tmp_path_factory.mktemp("sceneflow")
    h, w = 64, 96
    rng = np.random.RandomState(0)
    items = []
    poses = []
    for t in range(3):
        T = np.eye(4)
        T[2, 3] = -0.1 * t
        poses.append(T[:3, :].reshape(-1))
    np.savetxt(root / "poses.txt", np.stack(poses))
    for idx in range(4):
        item = {"extrinsic_path": "poses.txt"}
        for t, fi in enumerate([-1, 0]):
            lp = f"img_L_{idx}_{t}.png"
            rp = f"img_R_{idx}_{t}.png"
            dp = f"disp_{idx}_{t}.pfm"
            Image.fromarray(
                (rng.rand(h, w, 3) * 255).astype(np.uint8)).save(root / lp)
            Image.fromarray(
                (rng.rand(h, w, 3) * 255).astype(np.uint8)).save(root / rp)
            write_pfm(str(root / dp),
                      rng.uniform(1, 30, (h, w)).astype(np.float32))
            item[str(fi)] = {
                "left_image_path": lp,
                "right_image_path": rp,
                "left_disp_path": dp,
            }
        items.append(item)
    annfile = root / "train.json"
    annfile.write_text(json.dumps(items))
    return str(root), str(annfile), (h, w)


def test_pfm_roundtrip(tmp_path, rng):
    arr = rng.rand(16, 24).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, arr)
    back, scale = load_pfm(p)
    np.testing.assert_allclose(back, arr, rtol=1e-6)


def test_kitti_disp_roundtrip(tmp_path, rng):
    disp = (rng.rand(16, 24) * 100).astype(np.float32)
    p = str(tmp_path / "d.png")
    write_kitti_disp(p, disp)
    back = load_kitti_disp(p)
    np.testing.assert_allclose(back, disp, atol=1 / 256)


def test_pose_file_roundtrip(tmp_path):
    T = np.eye(4)
    T[0, 3] = 1.5
    np.savetxt(tmp_path / "p.txt", [T[:3].reshape(-1)])
    poses = load_pose_file(str(tmp_path / "p.txt"), invert=True)
    np.testing.assert_allclose(poses[0], np.linalg.inv(T), atol=1e-6)


def _data_node(root, annfile, h, w, frame_idxs):
    cfg = get_default_config()
    node = cfg.DATA.TRAIN
    node.DATA_ROOT = root
    node.ANNFILE = annfile
    node.TYPE = "SceneFlow"
    node.HEIGHT = h
    node.WIDTH = w
    node.FRAME_IDXS = frame_idxs
    node.BATCH_SIZE = 2
    node.NUM_WORKERS = 2
    return node


def test_dataset_sample_shapes(fake_sceneflow):
    root, annfile, (h, w) = fake_sceneflow
    node = _data_node(root, annfile, 32, 64, [-1, 0])
    ds = build_stereo_dataset(node, "train")
    s = ds[0]
    assert s["left"].shape == (2, 32, 64, 3)
    assert s["disp_gt"].shape == (2, 32, 64, 1)
    assert s["T_cam"].shape == (2, 4, 4)
    assert s["K"].shape == (3, 3)
    assert np.isfinite(s["left"]).all()


def test_dataloader_batches_time_major(fake_sceneflow):
    root, annfile, (h, w) = fake_sceneflow
    node = _data_node(root, annfile, 32, 64, [-1, 0])
    loader = build_dataloader(node, "train")
    batch = next(iter(loader))
    assert batch["left"].shape == (2, 2, 32, 64, 3)      # [T, B, H, W, 3]
    assert batch["disp_gt"].shape == (2, 2, 32, 64, 1)
    assert batch["T_cam"].shape == (2, 2, 4, 4)
    assert batch["K"].shape == (2, 3, 3)                 # [B, 3, 3]
    assert batch["baseline"].shape == (2,)
    assert len(loader) == 2


def test_dataloader_sharding(fake_sceneflow):
    root, annfile, _ = fake_sceneflow
    node = _data_node(root, annfile, 32, 64, [0])
    node.BATCH_SIZE = 1
    seen = []
    for shard in range(2):
        loader = build_dataloader(node, "val", num_shards=2,
                                  shard_index=shard)
        for b in loader:
            seen.append(b["left"].sum())
    assert len(seen) == 4  # disjoint halves cover the dataset
    assert len(set(float(s) for s in seen)) == 4


def test_eval_resize_scales_K_and_disp(fake_sceneflow):
    root, annfile, (h, w) = fake_sceneflow
    node = _data_node(root, annfile, h // 2, w // 2, [0])
    ds = build_stereo_dataset(node, "val")
    s = ds[0]
    assert s["left"].shape == (1, h // 2, w // 2, 3)
    # fx scaled by 0.5
    full_fx = 1050.0 / 960 * w
    assert abs(s["K"][0, 0] - full_fx * 0.5) < 1e-3
    # gt stays at NATIVE resolution in eval mode — metrics are computed at
    # gt resolution with predictions resized back (reference base.py:177-185
    # resizes only color_aug; validation_step :174-183)
    assert s["disp_gt"].shape == (1, h, w, 1)


def test_eval_step_evaluates_at_native_gt_resolution(fake_sceneflow):
    """make_eval_step resizes predictions (width-ratio value scaling) to
    the gt grid before calc_error — reference validation_step :183."""
    import jax
    import jax.numpy as jnp

    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.data.evaluation import calc_error
    from temporalstereo_tpu.models import build_model
    from temporalstereo_tpu.ops.interpolate import resize_bilinear
    from temporalstereo_tpu.training.step import make_eval_step

    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
        "VAL.EVAL_DISPARITY_IDS", "[0]",
    ])
    model = build_model(cfg, dtype=None)
    th, tw, gh, gw = 32, 64, 64, 96  # model size < native gt size
    rng2 = np.random.RandomState(9)
    batch = {
        "left": jnp.asarray(rng2.rand(1, 1, th, tw, 3), jnp.float32),
        "right": jnp.asarray(rng2.rand(1, 1, th, tw, 3), jnp.float32),
        "disp_gt": jnp.asarray(rng2.rand(1, 1, gh, gw, 1) * 20.0,
                               jnp.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["left"][0], batch["right"][0], None, False)
    metrics = make_eval_step(model, cfg)(variables, batch)

    outputs, _ = model.apply(variables, batch["left"][0], batch["right"][0],
                             None, False)
    est = resize_bilinear(outputs["disps"][0] * (gw / tw), (gh, gw))
    expect = calc_error(est, batch["disp_gt"][-1], lb=0, ub=192)
    np.testing.assert_allclose(
        float(metrics["metric_disparity_0/all_epe"]), float(expect["epe"]),
        rtol=1e-5)


def test_color_jitter_torchvision_semantics():
    """ColorJitter parity properties (reference base.py:73-97 uses
    torchvision ColorJitter((0.4,2.0),(0.5,1.5),(0.5,1.5),(-0.1,0.1)) +
    gamma): identity factors are a no-op, hue is a true HSV rotation,
    outputs stay in [0, 1]."""
    from temporalstereo_tpu.data.transforms import (
        _hsv_to_rgb,
        _rgb_to_hsv,
        color_jitter,
    )

    rng = np.random.RandomState(0)
    img = rng.rand(16, 20, 3).astype(np.float32)

    out = color_jitter(img, np.random.RandomState(1), brightness=(1, 1),
                       contrast=(1, 1), saturation=(1, 1), hue=(0, 0),
                       gamma=(1, 1))
    np.testing.assert_allclose(out, img, atol=2e-6)

    h, s, v = _rgb_to_hsv(img)
    np.testing.assert_allclose(_hsv_to_rgb(h, s, v), img, atol=1e-5)

    red = np.zeros((1, 1, 3), np.float32)
    red[..., 0] = 1
    out = color_jitter(red, np.random.RandomState(2), brightness=(1, 1),
                       contrast=(1, 1), saturation=(1, 1), hue=(0.5, 0.5),
                       gamma=(1, 1))
    np.testing.assert_allclose(out[0, 0], [0, 1, 1], atol=1e-5)

    out = color_jitter(img, np.random.RandomState(3))
    assert out.min() >= 0 and out.max() <= 1 and out.dtype == np.float32


def test_aug_deterministic_across_hosts_batches_and_worker_models(
        fake_sceneflow):
    """Per-SAMPLE aug seeding (round 5): an epoch's augmented samples are a
    pure function of (loader seed, epoch, dataset index) — identical across
    host counts, batch sizes, and thread vs forkserver worker models.  This
    is the invariance the 2-process Trainer.fit equality test relies on."""
    root, annfile, _ = fake_sceneflow
    node = _data_node(root, annfile, 32, 64, [-1, 0])

    def epoch_samples(num_shards, shard_index, batch_size, use_processes):
        node2 = node.clone()
        node2.BATCH_SIZE = batch_size
        node2.PROCESS_WORKERS = use_processes
        node2.NUM_WORKERS = 2
        loader = build_dataloader(node2, "train", num_shards=num_shards,
                                  shard_index=shard_index)
        loader.shuffle = False          # fixed index->sample mapping
        loader.drop_last = False
        out = {}
        for b in loader:
            for j in range(b["left"].shape[1]):
                key = float(np.asarray(b["disp_gt"][0, j]).sum())
                out[key] = np.asarray(b["left"][:, j]).copy()
        loader.close()
        return out

    ref = epoch_samples(1, 0, 2, False)
    assert len(ref) == 4
    # different batch size
    for key, v in epoch_samples(1, 0, 3, False).items():
        np.testing.assert_array_equal(ref[key], v)
    # two "hosts", batch 1 each
    two = {}
    for shard in range(2):
        two.update(epoch_samples(2, shard, 1, False))
    assert len(two) == 4
    for key, v in two.items():
        np.testing.assert_array_equal(ref[key], v)
    # forkserver process pool
    for key, v in epoch_samples(1, 0, 2, True).items():
        np.testing.assert_array_equal(ref[key], v)
