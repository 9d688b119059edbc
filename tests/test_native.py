"""Native C++ data plane vs the PIL reference path."""

import numpy as np
import pytest

from calm_vit_dte_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native data plane not built")


@pytest.fixture(scope="module")
def jpeg(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(img).resize((530, 370),
                                                 Image.BILINEAR))
    p = d / "a.jpg"
    Image.fromarray(img).save(p, quality=95)
    return str(p), img


def test_resize_matches_pil(jpeg):
    from PIL import Image

    _, img = jpeg
    ours = native.resize_rgb(img, 256)
    pil = np.asarray(Image.fromarray(img).resize((256, 256),
                                                 Image.BILINEAR))
    # identical filter; off-by-one from rounding mode only
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_decode_resize_batch(jpeg):
    from PIL import Image

    path, _ = jpeg
    imgs, ok = native.decode_resize_batch([path, path], 128)
    assert ok.all()
    assert imgs.shape == (2, 128, 128, 3)
    pil = np.asarray(Image.open(path).convert("RGB").resize(
        (128, 128), Image.BILINEAR))
    assert np.abs(imgs[0].astype(int) - pil.astype(int)).max() <= 2


def test_bad_file_reports_failure(tmp_path, jpeg):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    imgs, ok = native.decode_resize_batch([jpeg[0], str(bad)], 64)
    assert ok.tolist() == [True, False]


def test_loader_falls_back_for_bad_images(tmp_path):
    """ImageFolderDataset.load_batch PIL-fallback path for undecodable files."""
    import os

    from PIL import Image

    from calm_vit_dte_tpu.data.loader import ImageFolderDataset

    root = tmp_path / "train" / "class_a"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    Image.fromarray(img).save(root / "good.jpeg")
    Image.fromarray(img).save(root / "png_one.png")  # native can't; PIL can
    ds = ImageFolderDataset(str(tmp_path), split="train", size=32)
    os.environ["CALM_NATIVE_DECODE"] = "1"
    try:
        imgs, labels = ds.load_batch([0, 1])
    finally:
        os.environ.pop("CALM_NATIVE_DECODE", None)
    assert imgs.shape == (2, 32, 32, 3)
    assert (labels == 0).all()
    assert imgs[1].std() > 0  # the PNG actually got decoded via fallback
