"""Dataset acquisition: download-by-name with checksums, cache, extraction.

Functional mirror of the reference's dataset download path
(`third_party/recbole/data/dataset/dataset.py:214-254` `_get_download_url`/
`_download` + `utils/url.py` download_url/extract_zip/rename_atomic_files):
`acquire_dataset(name, data_dir)` makes `<data_dir>/<name>/<name>.inter`
(and friends) exist — returning immediately when the files are already on
disk (the cache/local-fallback path), otherwise downloading the archive
from the registry, verifying an optional sha256, extracting, and renaming
the atomic files to the canonical dataset name.

Improvements over the reference: atomic tmp+rename writes (a preempted
download never leaves a torn archive), sha256 verification, no interactive
"Will you proceed?" prompt (callers gate size themselves), and the
multi-process guard uses the JAX runtime (rank 0 downloads, everyone else
waits at a cross-process barrier — the `torch.distributed.barrier()`
analog of `dataset.py:252-254`).

The URL registry mirrors the reference's
`properties/dataset/url.yaml`/`kg_url.yaml` name->archive mapping for the
RecSysDatasets processed-atomic-file mirrors; entries are registered
lazily so custom mirrors drop in with `register_dataset_url`.
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
import tarfile
import urllib.request
import zipfile
from typing import Dict, Optional

logger = logging.getLogger("recbox_tpu")

__all__ = ["DATASET_URLS", "register_dataset_url", "download_url",
           "extract_archive", "rename_atomic_files", "acquire_dataset"]

_MIRROR = "https://recbole.s3-accelerate.amazonaws.com/ProcessedDatasets"

# name -> archive url; the subset covering BASELINE.md rows plus the
# common recbole benchmarks (same spellings as `url.yaml`); extend via
# register_dataset_url for the long tail.
DATASET_URLS: Dict[str, str] = {
    "ml-100k": f"{_MIRROR}/MovieLens/ml-100k.zip",
    "ml-1m": f"{_MIRROR}/MovieLens/ml-1m.zip",
    "ml-10m": f"{_MIRROR}/MovieLens/ml-10m.zip",
    "ml-20m": f"{_MIRROR}/MovieLens/ml-20m.zip",
    "gowalla": f"{_MIRROR}/Gowalla/gowalla.zip",
    "yelp": f"{_MIRROR}/Yelp/yelp.zip",
    "amazon-beauty": f"{_MIRROR}/Amazon_ratings/Amazon_Beauty.zip",
    "amazon-books": f"{_MIRROR}/Amazon_ratings/Amazon_Books.zip",
    "amazon-sports-outdoors":
        f"{_MIRROR}/Amazon_ratings/Amazon_Sports_and_Outdoors.zip",
    "lastfm": f"{_MIRROR}/LastFM/lastfm.zip",
    "pinterest": f"{_MIRROR}/Pinterest/pinterest.zip",
    "steam": f"{_MIRROR}/Steam/steam.zip",
    "diginetica": f"{_MIRROR}/Diginetica/diginetica.zip",
    "retailrocket": f"{_MIRROR}/Retailrocket/retailrocket.zip",
    "foursquare-nyc": f"{_MIRROR}/Foursquare/foursquare_NYC.zip",
    "tmall-buy": f"{_MIRROR}/Tmall/tmall-buy.zip",
}

# optional sha256 pins (filled in as archives are first fetched/verified)
DATASET_CHECKSUMS: Dict[str, str] = {}


def register_dataset_url(name: str, url: str,
                         sha256: Optional[str] = None) -> None:
    DATASET_URLS[name] = url
    if sha256:
        DATASET_CHECKSUMS[name] = sha256


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_url(url: str, folder: str,
                 checksum: Optional[str] = None) -> str:
    """Fetch ``url`` into ``folder`` (atomic tmp+rename, sha256-verified).

    Already-present files short-circuit (after checksum re-verification
    when one is pinned) — the cache behavior of `utils/url.py:53-58`.
    """
    os.makedirs(folder, exist_ok=True)
    filename = url.rpartition("/")[2].split("?")[0]
    path = os.path.join(folder, filename)
    if os.path.exists(path):
        if checksum and _sha256(path) != checksum:
            logger.warning("cached %s fails checksum; re-downloading", path)
            os.remove(path)
        else:
            logger.info("using cached %s", path)
            return path
    logger.info("downloading %s", url)
    tmp = path + ".part"
    # bounded: a stalled mirror must fail loudly, not wedge every rank at
    # the acquisition barrier (repo convention: run hangables bounded)
    with urllib.request.urlopen(url, timeout=60) as resp, \
            open(tmp, "wb") as out:
        shutil.copyfileobj(resp, out, length=1 << 20)
        out.flush()
        os.fsync(out.fileno())
    if checksum:
        got = _sha256(tmp)
        if got != checksum:
            os.remove(tmp)
            raise IOError(f"checksum mismatch for {url}: "
                          f"expected {checksum}, got {got}")
    os.replace(tmp, path)
    return path


def extract_archive(path: str, folder: str) -> None:
    """Unpack .zip / .tar.gz / .tgz into ``folder``."""
    logger.info("extracting %s", path)
    if path.endswith(".zip"):
        with zipfile.ZipFile(path, "r") as zf:
            zf.extractall(folder)
    elif path.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(path, "r:*") as tf:
            # filter='data' rejects ../ traversal, absolute paths, links
            # outside the tree (tarfile does NOT sanitize by default)
            tf.extractall(folder, filter="data")
    else:
        raise NotImplementedError(f"archive format of {path!r}")


def rename_atomic_files(folder: str, old_base: str, new_base: str) -> None:
    """Move every atomic file (possibly nested one archive directory deep,
    possibly under the archive's own basename) to
    `<folder>/<new_base>.<ext>` (`utils/url.py:100-120` analog)."""
    del old_base  # any basename is renamed; the archive name is irrelevant
    for root, _dirs, files in os.walk(folder):
        for f in files:
            ext = os.path.splitext(f)[1]
            if ext not in (".inter", ".user", ".item", ".kg", ".link"):
                continue
            src = os.path.join(root, f)
            dst = os.path.join(folder, new_base + ext)
            if os.path.abspath(src) != os.path.abspath(dst):
                os.replace(src, dst)


def _barrier(tag: str) -> None:
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def acquire_dataset(name: str, data_dir: str,
                    url: Optional[str] = None,
                    checksum: Optional[str] = None) -> str:
    """Ensure `<data_dir>/<name>/<name>.inter` exists; return that folder.

    Local-first: existing atomic files are used as-is (no network touch),
    so pre-staged snapshots work in air-gapped environments. Under
    multi-process runs only rank 0 downloads; everyone else waits at the
    barrier (`dataset.py:252-254`).
    """
    import jax
    folder = os.path.join(data_dir, name)
    inter = os.path.join(folder, f"{name}.inter")
    multi = jax.process_count() > 1
    if os.path.exists(inter) and not multi:
        return folder
    # multi-process: rank 0 decides/downloads, EVERYONE barriers — the
    # cached-on-some-hosts-only case must not deadlock the others at the
    # barrier (shared-FS assumption, same as the reference's
    # rank-0-download + torch.distributed.barrier, `dataset.py:244-254`)
    if not multi or jax.process_index() == 0:
        if not os.path.exists(inter):
            url = url or DATASET_URLS.get(name)
            if url is None:
                raise KeyError(
                    f"no download url registered for dataset {name!r} and "
                    f"{inter} does not exist; register one with "
                    "register_dataset_url(name, url) or stage the files "
                    "locally")
            checksum = checksum or DATASET_CHECKSUMS.get(name)
            archive = download_url(url, folder, checksum=checksum)
            extract_archive(archive, folder)
            old_base = os.path.splitext(os.path.basename(archive))[0]
            rename_atomic_files(folder, old_base, name)
            if not os.path.exists(inter):
                raise FileNotFoundError(
                    f"archive {archive} did not contain {name}.inter")
    if multi:
        _barrier(f"acquire_dataset:{name}")
        if not os.path.exists(inter):
            raise FileNotFoundError(
                f"{inter} missing after rank-0 download — multi-process "
                "acquisition assumes a shared filesystem (stage the files "
                "on every host otherwise)")
    return folder
