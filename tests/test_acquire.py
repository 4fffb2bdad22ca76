"""Dataset acquisition: cache short-circuit, file:// download, checksum,
extraction + atomic-file renaming — all offline (file:// URLs), mirroring
`third_party/recbole/data/dataset/dataset.py:214-254` + `utils/url.py`."""

import hashlib
import os
import zipfile

import numpy as np
import pytest

from recbox_tpu.data.acquire import (
    DATASET_URLS, acquire_dataset, download_url, extract_archive,
    register_dataset_url, rename_atomic_files,
)


def _make_zip(tmp_path, inner_dir, base, exts=(".inter",)):
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    archive = src / f"{base}.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        for ext in exts:
            content = f"user_id:token\titem_id:token\n1\t2\n"
            zf.writestr(f"{inner_dir}/{base}{ext}" if inner_dir
                        else f"{base}{ext}", content)
    return archive


def test_local_files_short_circuit(tmp_path):
    """Pre-staged atomic files are used without any URL (air-gapped path)."""
    d = tmp_path / "data" / "mydataset"
    d.mkdir(parents=True)
    (d / "mydataset.inter").write_text("user_id:token\n1\n")
    folder = acquire_dataset("mydataset", str(tmp_path / "data"))
    assert folder == str(d)


def test_missing_url_raises(tmp_path):
    with pytest.raises(KeyError, match="no download url"):
        acquire_dataset("never-registered-ds", str(tmp_path))


def test_file_url_download_extract_rename(tmp_path):
    """Full pipeline over file:// — download, extract a nested archive,
    rename Amazon_Beauty.inter -> amazon-beauty-test.inter."""
    archive = _make_zip(tmp_path, "Amazon_Beauty", "Amazon_Beauty",
                        (".inter", ".item"))
    register_dataset_url("amazon-beauty-test", f"file://{archive}")
    folder = acquire_dataset("amazon-beauty-test", str(tmp_path / "data"))
    assert os.path.exists(os.path.join(folder, "amazon-beauty-test.inter"))
    assert os.path.exists(os.path.join(folder, "amazon-beauty-test.item"))
    # second call is a pure cache hit (delete the archive to prove it)
    os.remove(archive)
    assert acquire_dataset("amazon-beauty-test",
                           str(tmp_path / "data")) == folder


def test_checksum_verification(tmp_path):
    archive = _make_zip(tmp_path, None, "ck")
    good = hashlib.sha256(archive.read_bytes()).hexdigest()
    out = download_url(f"file://{archive}", str(tmp_path / "dl"),
                       checksum=good)
    assert os.path.exists(out)
    os.remove(out)
    with pytest.raises(IOError, match="checksum mismatch"):
        download_url(f"file://{archive}", str(tmp_path / "dl"),
                     checksum="0" * 64)
    assert not os.path.exists(out)          # no torn file left
    assert not os.path.exists(out + ".part")


def test_registry_covers_baseline_rows():
    """BASELINE.md parity datasets must be downloadable by name."""
    for name in ("ml-1m", "amazon-beauty", "gowalla", "ml-100k"):
        assert name in DATASET_URLS


def test_rename_handles_flat_and_nested(tmp_path):
    d = tmp_path / "f"
    (d / "nested").mkdir(parents=True)
    (d / "nested" / "Old.inter").write_text("x")
    (d / "Old.item").write_text("y")
    rename_atomic_files(str(d), "Old", "new")
    assert (d / "new.inter").exists() and (d / "new.item").exists()
