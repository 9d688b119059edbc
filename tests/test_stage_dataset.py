"""Dataset staging script (scripts/stage_dataset.py) — the resumable
replacement for the reference's dataset-downloader pod
(reference: Deployments/dataset_downloader.yaml:34-45)."""

import io
import json
import os
import sys
import tarfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import stage_dataset  # noqa: E402


def _write(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


class TestStageFile:
    def test_local_copy_and_skip(self, tmp_path):
        src = tmp_path / "src"
        dest = tmp_path / "dest"
        src.mkdir()
        dest.mkdir()
        _write(str(src / "a.tar"), b"x" * 1000)

        manifest = {}
        assert stage_dataset.stage_file(str(src / "a.tar"),
                                        str(dest / "a.tar"), manifest)
        assert (dest / "a.tar").read_bytes() == b"x" * 1000
        assert manifest["a.tar"]["size"] == 1000
        # Second run: skipped.
        assert not stage_dataset.stage_file(str(src / "a.tar"),
                                            str(dest / "a.tar"), manifest)

    def test_restages_on_size_mismatch(self, tmp_path):
        src = tmp_path / "s.bin"
        out = tmp_path / "o.bin"
        _write(str(src), b"y" * 64)
        manifest = {"o.bin": {"size": 999}}  # stale record
        _write(str(out), b"partial")
        assert stage_dataset.stage_file(str(src), str(out), manifest)
        assert out.read_bytes() == b"y" * 64
        assert manifest["o.bin"]["size"] == 64

    def test_manifest_roundtrip(self, tmp_path):
        m = {"f": {"size": 1, "src": "s", "staged": "t"}}
        stage_dataset._save_manifest(str(tmp_path), m)
        assert stage_dataset._load_manifest(str(tmp_path)) == m
        with open(tmp_path / stage_dataset._MANIFEST) as f:
            json.load(f)  # valid json on disk


class TestExtract:
    def test_extract_val(self, tmp_path):
        tar = tmp_path / "val.tar"
        with tarfile.open(tar, "w") as tf:
            for name in ("ILSVRC2012_val_1.JPEG", "ILSVRC2012_val_2.JPEG"):
                data = b"jpegbytes"
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        out = tmp_path / "val"
        stage_dataset.extract_val(str(tar), str(out))
        assert sorted(os.listdir(out)) == ["ILSVRC2012_val_1.JPEG",
                                           "ILSVRC2012_val_2.JPEG"]

    def test_extract_train_nested_tars(self, tmp_path):
        inner_buf = io.BytesIO()
        with tarfile.open(fileobj=inner_buf, mode="w") as tf:
            data = b"img"
            info = tarfile.TarInfo("n01440764_1.JPEG")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        outer = tmp_path / "train.tar"
        with tarfile.open(outer, "w") as tf:
            payload = inner_buf.getvalue()
            info = tarfile.TarInfo("n01440764.tar")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
        out = tmp_path / "train"
        stage_dataset.extract_train(str(outer), str(out))
        assert os.listdir(out / "n01440764") == ["n01440764_1.JPEG"]
        # Idempotent: re-run skips populated class dirs.
        stage_dataset.extract_train(str(outer), str(out))

    def test_extract_train_redoes_interrupted_class(self, tmp_path):
        """A class dir is populated ATOMICALLY (temp dir + os.replace):
        an interruption can only leave a .staging dir, which is redone —
        never a half-full class dir that would be skipped forever."""
        inner_buf = io.BytesIO()
        with tarfile.open(fileobj=inner_buf, mode="w") as tf:
            for name in ("a_1.JPEG", "a_2.JPEG"):
                data = b"img"
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        outer = tmp_path / "train.tar"
        with tarfile.open(outer, "w") as tf:
            payload = inner_buf.getvalue()
            info = tarfile.TarInfo("n02000001.tar")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
        out = tmp_path / "train"
        # Simulate an interrupted run: leftover staging junk + an empty
        # (created-but-never-populated) class dir.
        (out / "n02000001.staging").mkdir(parents=True)
        (out / "n02000001.staging" / "partial.JPEG").write_bytes(b"x")
        (out / "n02000001").mkdir()
        stage_dataset.extract_train(str(outer), str(out))
        assert sorted(os.listdir(out / "n02000001")) == ["a_1.JPEG",
                                                         "a_2.JPEG"]
        assert not (out / "n02000001.staging").exists()
