"""Dataset, degradation staging, loader, and frame-rule tests (host-only)."""

import numpy as np
import pytest

from dove_tpu.data.datasets import (
    BucketSampler,
    RealSRDataset,
    RealSRImageVideoDataset,
    paired_random_crop,
    random_crop_clip,
)
from dove_tpu.data.loader import PrefetchLoader, collate
from dove_tpu.tiling import next_valid_frames


def test_next_valid_frames():
    # exact-roundtrip families: m % 8 in {0, 1}, or m == 1
    assert next_valid_frames(1) == 1
    assert next_valid_frames(8) == 8
    assert next_valid_frames(9) == 9
    assert next_valid_frames(17) == 17
    assert next_valid_frames(5) == 8
    assert next_valid_frames(12) == 16
    assert next_valid_frames(50) == 56
    for n in range(1, 60):
        m = next_valid_frames(n)
        assert m >= n and (m == 1 or m % 8 in (0, 1))


def test_paired_random_crop_alignment():
    rng = np.random.default_rng(0)
    hq = np.arange(2 * 32 * 64 * 3, dtype=np.float32).reshape(2, 32, 64, 3)
    lq = hq[:, ::4, ::4].copy()
    hq_c, lq_c = paired_random_crop(hq, lq, 2, 4, 8, 4, rng)
    assert hq_c.shape == (2, 16, 32, 3)
    assert lq_c.shape == (2, 4, 8, 3)
    # alignment: lq_c[0,0,0] must equal hq_c[0,0,0] (subsampled source)
    np.testing.assert_array_equal(lq_c[0, 0, 0], hq_c[0, 0, 0])

    with pytest.raises(ValueError):
        paired_random_crop(hq, lq[:, :4], 2, 4, 8, 4, rng)


def test_random_crop_clip_clamps():
    rng = np.random.default_rng(0)
    frames = np.zeros((3, 20, 20, 3), np.float32)
    out = random_crop_clip(frames, 10, 48, 48, rng)
    assert out.shape == (3, 20, 20, 3)


def test_collate_and_loader():
    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"x": np.full((2, 3), i, np.float32), "name": f"s{i}"}

    loader = PrefetchLoader(DS(), batch_size=2, num_workers=2, shuffle=False,
                            drop_last=True)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (2, 2, 3)
    assert batches[0]["name"] == ["s0", "s1"]
    # order preserved across prefetch threads
    assert float(batches[2]["x"][0, 0, 0]) == 4.0


def test_loader_propagates_worker_errors():
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise RuntimeError("boom")
            return {"x": np.zeros(1)}

    loader = PrefetchLoader(Bad(), batch_size=1, num_workers=2, shuffle=False,
                            drop_last=False)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_bucket_sampler_groups_geometry():
    shapes = [(2, 8, 8)] * 3 + [(4, 8, 8)] * 2
    sampler = BucketSampler(shapes, batch_size=2, shuffle=False)
    batches = list(sampler)
    for b in batches:
        geoms = {shapes[i] for i in b}
        assert len(geoms) == 1
    assert sum(len(b) for b in batches) == 5


def test_poisson_noise_reference_statistics():
    """Pin the reference Poisson formula (degradation.py:286-292): rate is
    computed at 0-255 scale with 2**ceil(log2(n_unique)) quantization, so a
    constant v-valued image gets noise of variance round(255*v) * (scale/255)^2
    per pixel (vals == 1 for a constant image)."""
    from dove_tpu.data.degradation import RandomNoise

    op = RandomNoise({
        "noise_type": ["poisson"],
        "noise_prob": [1.0],
        "poisson_scale": [1.0, 1.0],
        "poisson_gray_noise_prob": 0.0,
    })
    v = 128.0 / 255.0
    frames = np.full((4, 128, 128, 3), v, np.float32)
    out = op(frames, np.random.default_rng(0))
    noise = out - frames  # clipped at [0,1], negligible at v=0.5
    assert abs(float(noise.mean())) < 2e-3
    expected_std = np.sqrt(128.0) / 255.0  # ~0.04436
    assert abs(float(noise.std()) - expected_std) < 0.002
    # base-10 quantization or a [0,1]-scale rate would give ~0.7 or ~0.06+
    assert float(noise.std()) < 0.06


def test_real_sr_dataset_item(tmp_path):
    import cv2

    from tests.test_trainer import TINY_DEGRADATION, _write_clip

    (tmp_path / "videos").mkdir()
    _write_clip(tmp_path / "videos" / "c.mp4", frames=9, size=64)
    (tmp_path / "videos.txt").write_text("videos/c.mp4\n")
    (tmp_path / "deg.yaml").write_text(TINY_DEGRADATION)

    ds = RealSRDataset(
        tmp_path, tmp_path / "videos.txt", 5, 32, 32, tmp_path / "deg.yaml",
    )
    item = ds[0]
    assert item["hq_video"].shape == (5, 32, 32, 3)
    assert item["lq_video"].shape == (5, 32, 32, 3)
    assert item["hq_video"].min() >= -1.0 and item["hq_video"].max() <= 1.0
    assert item["prompt"] == ""
    # LQ must differ from HQ (degradation applied) but stay correlated
    diff = np.abs(item["hq_video"] - item["lq_video"]).mean()
    assert 0.001 < diff < 1.0


def test_image_video_dataset_item(tmp_path):
    import cv2

    from tests.test_trainer import TINY_DEGRADATION, _write_clip

    (tmp_path / "videos").mkdir()
    (tmp_path / "images").mkdir()
    _write_clip(tmp_path / "videos" / "c.mp4", frames=9, size=64)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "i.png"), img)
    cv2.imwrite(str(tmp_path / "images" / "j.png"), img[::-1])
    (tmp_path / "videos.txt").write_text("videos/c.mp4\n")
    (tmp_path / "images.txt").write_text("images/i.png\nimages/j.png\n")
    (tmp_path / "deg.yaml").write_text(TINY_DEGRADATION)

    ds = RealSRImageVideoDataset(
        tmp_path, tmp_path / "videos.txt", 5, 32, 32, tmp_path / "deg.yaml",
        image_manifest=tmp_path / "images.txt",
    )
    # video list repeated to match image count
    assert len(ds) == 2
    item = ds[1]
    assert item["hq_video"].shape == (5, 32, 32, 3)
    assert item["hq_image"].shape == (1, 32, 32, 3)
    assert item["lq_image"].shape == (1, 32, 32, 3)
