"""Raw dataset readers (daisy RawDataReader formats)."""

import numpy as np
import pytest

from recbox_tpu.data.readers import read_dataset, read_ratings


def test_ml100k_format(tmp_path):
    (tmp_path / "u.data").write_text("1\t10\t5\t100\n2\t20\t3\t200\n")
    out = read_dataset(str(tmp_path), "ml-100k")
    assert out["user"].tolist() == ["1", "2"]
    assert out["rating"].tolist() == [5.0, 3.0]
    assert out["timestamp"].tolist() == [100.0, 200.0]


def test_ml1m_double_colon(tmp_path):
    (tmp_path / "ratings.dat").write_text("1::10::4::99\n")
    out = read_dataset(str(tmp_path), "ml-1m")
    assert out["item"].tolist() == ["10"] and out["rating"][0] == 4.0


def test_header_skip_and_partial_columns(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("user,item,weight\nu1,i1,7\n")
    out = read_ratings(str(p), sep=",", has_header=True, columns="uir")
    assert out["user"][0] == "u1" and out["rating"][0] == 7.0
    assert "timestamp" not in out


def test_yelp_json(tmp_path):
    (tmp_path / "yelp_academic_dataset_review.json").write_text(
        '{"user_id": "ua", "business_id": "b1", "stars": 4.0}\n'
        '{"user_id": "ub", "business_id": "b2", "stars": 2.0}\n')
    out = read_dataset(str(tmp_path), "yelp")
    assert out["item"].tolist() == ["b1", "b2"]


def test_amazon_json(tmp_path):
    (tmp_path / "reviews.json").write_text(
        '{"reviewerID": "A1", "asin": "B001", "overall": 5.0}\n')
    out = read_dataset(str(tmp_path), "amazon-beauty")
    assert out["user"][0] == "A1" and out["rating"][0] == 5.0


def test_citeulike_bag(tmp_path):
    (tmp_path / "users.dat").write_text("2 5 9\n1 7\n")
    out = read_dataset(str(tmp_path), "citeulike")
    assert out["user"].tolist() == ["0", "0", "1"]
    assert out["item"].tolist() == ["5", "9", "7"]


def test_unknown_dataset():
    with pytest.raises(KeyError):
        read_dataset("/tmp", "nope")
