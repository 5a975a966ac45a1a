import os

import numpy as np
import pytest

import synthdata


@pytest.fixture
def dataset_dir(tmp_path):
    from PIL import Image

    env = synthdata.texture(0, 420, 800)
    boxes = [(0, 0, 420, 380), (280, 20, 420, 380)]
    d = tmp_path / "setA"
    d.mkdir()
    for k, (x, y, w, h) in enumerate(boxes):
        crop = (env[y : y + h, x : x + w] * 255).astype(np.uint8)
        Image.fromarray(crop).save(d / f"img_{k}.png")
    return tmp_path


def test_cli_end_to_end(dataset_dir, tmp_path):
    from autopanostitch_tpu import cli

    out = tmp_path / "results"
    rc = cli.main(
        [
            str(dataset_dir),
            "--out",
            str(out),
            "--projections",
            "planar",
            "--blend",
            "linear",
            "--force-planar",
            "--size-limit",
            "512",
            "--log",
            str(tmp_path / "log.txt"),
        ]
    )
    assert rc == 0
    files = os.listdir(out)
    assert any(f.startswith("planar_setA") and f.endswith(".png") for f in files)
    # log captured stage timings (diary equivalent)
    log = (tmp_path / "log.txt").read_text()
    assert "execution time" in log

    from PIL import Image

    pano = np.asarray(Image.open(out / files[0]))
    assert pano.shape[1] > 600  # wider than a single 420px crop after resize


def test_find_datasets_direct_and_nested(dataset_dir):
    from autopanostitch_tpu import cli

    nested = cli.find_datasets(str(dataset_dir))
    assert list(nested) == ["setA"]
    direct = cli.find_datasets(str(dataset_dir / "setA"))
    assert len(next(iter(direct.values()))) == 2


def test_resize_modes(tmp_path):
    from PIL import Image as PILImage

    from autopanostitch_tpu.utils import image_io

    img = synthdata.texture(0, 300, 500)
    fit = image_io.resize_fit(img, 200, 200)
    assert max(fit.shape[:2]) <= 200 and abs(fit.shape[1] / fit.shape[0] - 500 / 300) < 0.05
    pad = image_io.resize_pad(img, 200, 200)
    assert pad.shape == (200, 200, 3)
    assert pad[-1, -1].sum() == 0  # padded region
    fc = image_io.resize_fillcrop(img, 200, 200)
    assert fc.shape == (200, 200, 3)
    assert fc.min() >= 0 and fc[-1, -1].sum() > 0  # fully covered


def test_cli_diagnostic_plots(tmp_path):
    import synthdata
    from PIL import Image
    from autopanostitch_tpu import cli

    env = synthdata.texture(9, 300, 600)
    d = tmp_path / "set"
    d.mkdir()
    for k, (x0, y0, w, h) in enumerate([(0, 0, 360, 280), (200, 10, 360, 280)]):
        Image.fromarray(
            (env[y0 : y0 + h, x0 : x0 + w] * 255).astype(np.uint8)
        ).save(d / f"im{k}.png")
    out = tmp_path / "out"
    rc = cli.main([str(d), "--out", str(out), "--force-planar",
                   "--size-limit", "400", "--show-keypoints",
                   "--show-adjacency"])
    assert rc == 0
    assert (out / "adjacency_set.png").exists()
    assert len(list(out.glob("keypoints_set_*.png"))) == 2
