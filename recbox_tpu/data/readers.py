"""Raw public-dataset readers.

Re-design of daisyRec's RawDataReader (`third_party/daisy/utils/loader.py:
14-143`): one generic delimited-ratings reader plus per-dataset presets for
the classic benchmark formats. Outputs plain numpy columns (user token,
item token, rating, timestamp) ready for `remap_tokens` /
`InteractionDataset` — no pandas dependency in the hot path.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["read_ratings", "read_dataset", "DATASET_FORMATS"]

# preset: (filename, separator, has_header, columns in file order)
# columns use: u=user, i=item, r=rating, t=timestamp, -=skip
DATASET_FORMATS: Dict[str, Tuple[str, str, bool, str]] = {
    "ml-100k": ("u.data", "\t", False, "uirt"),
    "ml-1m": ("ratings.dat", "::", False, "uirt"),
    "ml-10m": ("ratings.dat", "::", False, "uirt"),
    "ml-20m": ("ratings.csv", ",", True, "uirt"),
    "lastfm": ("user_artists.dat", "\t", True, "uir"),
    "bx": ("BX-Book-Ratings.csv", ";", True, "uir"),
    "epinions": ("ratings_data.txt", " ", False, "uir"),
    "yelp": ("yelp_academic_dataset_review.json", "json", False, "uirt"),
    "netflix": ("ratings.csv", ",", False, "iurt"),
    "citeulike": ("users.dat", "bagofitems", False, "u*"),
}


def read_ratings(path: str, sep: str = "\t", has_header: bool = False,
                 columns: str = "uirt",
                 max_rows: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Generic delimited ratings file → {'user','item','rating','timestamp'}
    (whichever of r/t the format carries). Tokens stay strings — remap with
    `recbox_tpu.data.atomic.remap_tokens`."""
    users, items, ratings, times = [], [], [], []
    with open(path) as fh:
        if has_header:
            fh.readline()
        for n, line in enumerate(fh):
            if max_rows is not None and n >= max_rows:
                break
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split(sep)
            row = {}
            for col, val in zip(columns, parts):
                row[col] = val
            users.append(row.get("u", ""))
            items.append(row.get("i", ""))
            if "r" in columns:
                ratings.append(float(row.get("r", 0) or 0))
            if "t" in columns:
                times.append(float(row.get("t", 0) or 0))
    out = {"user": np.asarray(users, object),
           "item": np.asarray(items, object)}
    if ratings:
        out["rating"] = np.asarray(ratings, np.float32)
    if times:
        out["timestamp"] = np.asarray(times, np.float64)
    return out


def _read_json_reviews(path: str, max_rows=None) -> Dict[str, np.ndarray]:
    """Yelp/Amazon JSON-lines reviews (user_id/business_id|asin/stars)."""
    users, items, ratings = [], [], []
    with open(path) as fh:
        for n, line in enumerate(fh):
            if max_rows is not None and n >= max_rows:
                break
            d = json.loads(line)
            users.append(d.get("user_id") or d.get("reviewerID", ""))
            items.append(d.get("business_id") or d.get("asin", ""))
            ratings.append(float(d.get("stars") or d.get("overall", 0)))
    return {"user": np.asarray(users, object),
            "item": np.asarray(items, object),
            "rating": np.asarray(ratings, np.float32)}


def _read_bag_of_items(path: str, max_rows=None) -> Dict[str, np.ndarray]:
    """citeulike users.dat: each line = 'count item item …' for one user."""
    users, items = [], []
    with open(path) as fh:
        for u, line in enumerate(fh):
            if max_rows is not None and u >= max_rows:
                break
            toks = line.split()
            for it in toks[1:]:
                users.append(str(u))
                items.append(it)
    return {"user": np.asarray(users, object),
            "item": np.asarray(items, object)}


def read_dataset(data_dir: str, name: str,
                 max_rows: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Load one of the preset public datasets from `data_dir` (daisy
    RawDataReader dispatch). Amazon categories use 'amazon-<cat>' with a
    JSON-lines reviews file named 'reviews.json'."""
    if name.startswith("amazon"):
        return _read_json_reviews(os.path.join(data_dir, "reviews.json"),
                                  max_rows)
    if name not in DATASET_FORMATS:
        raise KeyError(f"unknown dataset {name!r}; known: "
                       f"{sorted(DATASET_FORMATS)} + amazon-*")
    fname, sep, header, cols = DATASET_FORMATS[name]
    path = os.path.join(data_dir, fname)
    if sep == "json":
        return _read_json_reviews(path, max_rows)
    if sep == "bagofitems":
        return _read_bag_of_items(path, max_rows)
    return read_ratings(path, sep, header, cols, max_rows)
