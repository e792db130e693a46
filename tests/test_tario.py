"""Native indexed tar reader tests (build + correctness vs tarfile)."""

import os
import tarfile

import numpy as np
import pytest

from marigold_tpu.data.tario import TarIndex, _load_lib


@pytest.fixture
def sample_tar(tmp_path, rng):
    files = {
        "a.bin": rng.integers(0, 255, 1000, dtype=np.uint8).tobytes(),
        "dir/b.bin": rng.integers(0, 255, 513, dtype=np.uint8).tobytes(),  # pad
        "dir/sub/" + "x" * 120 + ".bin": b"longname-content",  # GNU longname
        "empty.bin": b"",
    }
    src = tmp_path / "src"
    src.mkdir()
    tar_path = str(tmp_path / "t.tar")
    with tarfile.open(tar_path, "w") as tar:
        for name, data in files.items():
            p = src / name
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(data)
            tar.add(str(p), arcname="./" + name)
    return tar_path, files


def test_native_library_builds():
    assert _load_lib() is not None, "g++ build of libtario.so failed"


def test_tario_reads_match_tarfile(sample_tar):
    tar_path, files = sample_tar
    idx = TarIndex(tar_path)
    assert idx.native
    assert len(idx) == len(files)
    for name, data in files.items():
        assert idx.read(name) == data
        assert idx.read("./" + name) == data  # both spellings
    idx.close()


def test_tario_missing_member(sample_tar):
    tar_path, _ = sample_tar
    idx = TarIndex(tar_path)
    with pytest.raises(KeyError):
        idx.read("nope.bin")
    idx.close()


def test_tario_thread_safety(sample_tar):
    import threading

    tar_path, files = sample_tar
    idx = TarIndex(tar_path)
    errors = []

    def worker():
        try:
            for _ in range(50):
                for name, data in files.items():
                    assert idx.read(name) == data
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    idx.close()


def test_dataset_uses_tario(tmp_path, rng):
    """The dataset tar path must go through the native reader."""
    from PIL import Image

    from marigold_tpu.config import Config
    from marigold_tpu.data import DatasetMode, get_dataset

    root = tmp_path / "nyu"
    root.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(root / f"rgb_{i:05d}.png")
        d = rng.integers(500, 9000, (32, 32)).astype(np.uint16)
        Image.fromarray(d).save(root / f"depth_{i:05d}.png")
        Image.fromarray(d).save(root / f"filled_{i:05d}.png")
    tar_path = tmp_path / "nyu.tar"
    with tarfile.open(tar_path, "w") as tar:
        for f in sorted(os.listdir(root)):
            tar.add(str(root / f), arcname="./" + f)
    (tmp_path / "split.txt").write_text(
        "rgb_00000.png depth_00000.png filled_00000.png\n"
        "rgb_00001.png depth_00001.png filled_00001.png"
    )
    ds = get_dataset(
        Config(name="nyu_depth", dir="nyu.tar", filenames=str(tmp_path / "split.txt"),
               disp_name="t", eigen_valid_mask=False),
        base_data_dir=str(tmp_path), mode=DatasetMode.EVAL,
    )
    s = ds[0]
    assert s["rgb_int"].shape == (32, 32, 3)
    assert isinstance(ds.tar_obj, TarIndex) and ds.tar_obj.native
