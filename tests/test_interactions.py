"""InteractionDataset: k-core, remap, binarize, RS/LS splits."""

import numpy as np
import pytest

from recbox_tpu.data.interactions import InteractionDataset


def test_kcore_iterative():
    # item 9 appears once; after dropping it, user 3 falls under min count
    u = np.array([1, 1, 2, 2, 3, 3])
    i = np.array([10, 11, 10, 11, 9, 10])
    ds = InteractionDataset(u, i).filter_by_count(min_user_inter=2,
                                                 min_item_inter=2)
    # item 9 dropped → user 3 falls under min_user_inter → pruned too
    assert set(ds.user_ids) == {1, 2}
    assert set(ds.item_ids) == {10, 11}
    assert len(ds) == 4


def test_kcore_converges_empty():
    ds = InteractionDataset([1, 2], [5, 6]).filter_by_count(3, 3)
    assert len(ds) == 0


def test_remap_contiguous():
    ds = InteractionDataset(["b", "a", "b"], [100, 50, 100]).remap_ids()
    assert ds.num_users == 2 and ds.num_items == 2
    assert set(ds.user_ids) == {0, 1}
    assert ds.user_map["b"] == ds.user_ids[0]


def test_binarize_and_filter():
    ds = InteractionDataset([1, 2, 3], [1, 2, 3], ratings=[5.0, 2.0, 4.0])
    b = ds.binarize(threshold=4.0)
    np.testing.assert_array_equal(b.ratings, [1.0, 0.0, 1.0])
    f = ds.filter_by_rating(4.0)
    assert len(f) == 2


def test_ratio_split_sizes():
    n = 1000
    ds = InteractionDataset(np.random.randint(0, 50, n),
                            np.random.randint(0, 100, n))
    tr, va, te = ds.split_ratio((0.8, 0.1, 0.1), order="RO", seed=0)
    assert len(tr) + len(va) + len(te) == n
    assert abs(len(tr) - 800) <= 1


def test_temporal_split_respects_time():
    ts = np.arange(100)[::-1].copy()  # reversed time
    ds = InteractionDataset(np.zeros(100, int), np.arange(100), timestamps=ts)
    tr, va, te = ds.split_ratio((0.8, 0.1, 0.1), order="TO")
    assert ds.timestamps[np.argsort(ds.timestamps)][:80].max() \
        == max(tr.timestamps)


def test_grouped_ratio_split_every_user_in_train():
    u = np.repeat(np.arange(10), 10)
    i = np.tile(np.arange(10), 10)
    ds = InteractionDataset(u, i)
    tr, va, te = ds.split_ratio((0.8, 0.1, 0.1), group_by_user=True, seed=1)
    assert set(tr.user_ids) == set(range(10))
    assert len(tr) + len(va) + len(te) == 100


def test_leave_one_out():
    u = np.array([1, 1, 1, 2, 2])
    i = np.array([10, 11, 12, 20, 21])
    ts = np.array([1, 2, 3, 1, 2])
    ds = InteractionDataset(u, i, timestamps=ts)
    tr, va, te = ds.split_leave_one_out(order="TO")
    # user 1: train [10], valid 11, test 12; user 2 (<3): all in train
    assert set(te.item_ids) == {12}
    assert set(va.item_ids) == {11}
    assert set(tr.item_ids) == {10, 20, 21}


def test_user2items_and_arrays():
    ds = InteractionDataset([1, 1, 2], [5, 6, 7], ratings=[1, 0, 1])
    u2i = ds.user2items()
    assert u2i == {1: [5, 6], 2: [7]}
    arrays = ds.arrays()
    assert arrays["user_id"].dtype == np.int32
    assert "label" in arrays


def test_split_remainder_goes_to_train():
    """recbole `_calcu_split_ids` semantics: per-user remainder → train."""
    import numpy as np
    from recbox_tpu.data.interactions import InteractionDataset
    # one user with 12 interactions: 0.8/0.1/0.1 → 10/1/1 (not 9/1/2)
    ds = InteractionDataset(np.zeros(12, np.int64), np.arange(12))
    tr, va, te = ds.split_ratio((0.8, 0.1, 0.1), order="RO",
                                group_by_user=True, seed=0)
    assert (len(tr), len(va), len(te)) == (10, 1, 1)


def test_exclude_seen_negative_sampling():
    import numpy as np
    from recbox_tpu.data.sampling import sample_negatives
    users = np.array([0, 0, 1])
    pos = np.array([1, 2, 3])
    seen = np.zeros((2, 6), bool)
    seen[0, [1, 2]] = True   # user 0 saw items 1, 2
    seen[1, [3]] = True
    rng = np.random.default_rng(0)
    negs = sample_negatives(pos, 6, 8, rng, seen_matrix=seen,
                            user_rows=users)
    assert not seen[users[:, None], negs].any()


def test_remap_start_one_for_sequential():
    ds = InteractionDataset(["b", "a"], [100, 50]).remap_ids(start=1)
    assert ds.user_ids.min() == 1 and ds.item_ids.min() == 1
    assert ds.user_map["a"] == 1


def test_loo_requires_timestamps_for_temporal_order():
    import pytest
    ds = InteractionDataset([1, 1, 2, 2], [1, 2, 3, 4])
    with pytest.raises(ValueError, match="timestamps"):
        ds.split_leave_one_out(order="TO")
    parts = ds.split_leave_one_out(order="RO")   # explicit opt-in works
    assert sum(len(p) for p in parts) == 4
