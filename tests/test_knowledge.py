"""Knowledge-aware recommenders: KG data structures, translation models
(CKE/CFKG/KTUP/MKR), GNN models (KGCN/KGNNLS/KGAT), and RippleNet.

Fixture: block world. Items belong to categories (KG: item --has_cat-->
category entity); users interact only within their block's category."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.data.knowledge import (
    KnowledgeGraph, build_neighbor_table, build_ripple_sets,
    collaborative_kg_edges,
)
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.knowledge import (
    CFKG, CKE, KGAT, KGCN, KGNNLS, KTUP, MKR, RippleNet, StaticArray,
)
from recbox_tpu.ops import pairwise_logistic_loss
from tests.test_general_recommenders import (
    N_BLOCKS, N_ITEMS, N_USERS, _block_auc, _block_data, _train_pairwise, _fm,
)

N_CATS = N_BLOCKS
N_ENTITIES = N_ITEMS + N_CATS   # items are entities [0, N_ITEMS)
HAS_CAT = 1                      # relation id (0 = interact, reserved)


@pytest.fixture(scope="module")
def kg_world():
    rng = np.random.default_rng(4)
    users, items, ub, ib = _block_data(rng)
    heads = np.arange(N_ITEMS)
    rels = np.full(N_ITEMS, HAS_CAT)
    tails = N_ITEMS + ib
    kg = KnowledgeGraph(heads=heads, relations=rels, tails=tails,
                        n_entities=N_ENTITIES, n_relations=2,
                        n_items=N_ITEMS)
    return kg, users, items, ub, ib


def _kg_batch(rng, kg, n=64):
    idx = rng.integers(0, kg.n_triples, size=n)
    return {"kg_head": jnp.asarray(kg.heads[idx]),
            "kg_relation": jnp.asarray(kg.relations[idx]),
            "kg_tail": jnp.asarray(kg.tails[idx]),
            "kg_neg_tail": jnp.asarray(
                rng.integers(0, kg.n_entities, size=n))}


class TestKGData:
    def test_neighbor_table(self, kg_world):
        kg, *_ = kg_world
        ents, rels = build_neighbor_table(kg, n_neighbors=4, seed=0)
        assert ents.shape == (N_ENTITIES, 4)
        # each item's only neighbor is its category
        for i in range(N_ITEMS):
            assert (ents[i] == N_ITEMS + i % N_BLOCKS).all()
            assert (rels[i] == HAS_CAT).all()
        # category entities have no out-triples → self loops
        assert (ents[N_ITEMS] == N_ITEMS).all()

    def test_ripple_sets(self, kg_world):
        kg, users, items, ub, ib = kg_world
        u2i = {}
        for u, i in zip(users, items):
            u2i.setdefault(int(u), []).append(int(i))
        rs = build_ripple_sets(kg, u2i, n_hops=2, n_memory=8, seed=0)
        assert rs["heads"].shape == (len(u2i), 2, 8)
        # hop-0 heads are the user's items; their tails are categories
        u0 = rs["users"][0]
        assert set(rs["heads"][0, 0]).issubset(set(u2i[int(u0)]))
        assert (rs["tails"][0, 0] >= N_ITEMS).all()

    def test_ckg_edges(self, kg_world):
        kg, users, items, *_ = kg_world
        h, r, t = collaborative_kg_edges(kg, users, items, N_USERS)
        assert len(h) == kg.n_triples + 2 * len(users)
        assert h.max() < kg.n_entities + N_USERS
        # interact edges use relation 0 both ways
        assert (r[kg.n_triples:] == 0).all()

    def test_inverse_triples(self, kg_world):
        kg, *_ = kg_world
        kg2 = kg.with_inverse()
        assert kg2.n_triples == 2 * kg.n_triples
        assert kg2.n_relations == 2 * kg.n_relations - 1

    def test_relation_zero_rejected(self):
        with pytest.raises(ValueError):
            KnowledgeGraph(heads=np.array([0]), relations=np.array([0]),
                           tails=np.array([1]), n_entities=2, n_relations=2,
                           n_items=1)


class TestTranslationModels:
    def test_cke_learns_blocks_and_kg_loss(self, kg_world):
        kg, users, items, ub, ib = kg_world
        model = CKE(feature_map=_fm(), embedding_dim=16, num_users=N_USERS,
                    num_items=N_ITEMS, n_entities=N_ENTITIES, n_relations=2,
                    kg_dim=8)
        params = _train_pairwise(model, users, items, None, steps=250)
        scores = model.apply(
            {"params": params},
            {"user_id": jnp.arange(N_USERS),
             "item_id": jnp.arange(N_ITEMS)}, method=model.full_scores) \
            if hasattr(model, "full_scores_matrix") else None
        # score via towers directly
        u = model.apply({"params": params}, {"user_id": jnp.arange(N_USERS)},
                        method=model.user_tower)
        it = model.apply({"params": params},
                         {"item_id": jnp.arange(N_ITEMS)},
                         method=model.item_tower)
        auc = _block_auc(np.asarray(u) @ np.asarray(it).T, ub, ib)
        assert auc > 0.8, auc
        rng = np.random.default_rng(0)
        kl = model.apply({"params": params}, _kg_batch(rng, kg),
                         method=model.kg_loss)
        assert np.isfinite(float(kl)) and float(kl) > 0

    def test_cfkg_learns_blocks(self, kg_world):
        kg, users, items, ub, ib = kg_world
        model = CFKG(feature_map=_fm(), embedding_dim=16, num_users=N_USERS,
                     n_entities=N_ENTITIES, n_relations=2)
        params = _train_pairwise(model, users, items, None, steps=250)
        u = model.apply({"params": params}, {"user_id": jnp.arange(N_USERS)},
                        method=model.user_tower)
        table = model.apply({"params": params},
                            method=model.full_scores_table)
        scores = np.asarray(u) @ np.asarray(table).T
        assert _block_auc(scores[:, :N_ITEMS], ub, ib) > 0.8
        rng = np.random.default_rng(0)
        kl = model.apply({"params": params}, _kg_batch(rng, kg),
                         method=model.kg_loss)
        assert np.isfinite(float(kl))

    @pytest.mark.parametrize("cls,kw", [
        (KTUP, {"n_preferences": 2}),
        (MKR, {"n_layers_cc": 1, "user_hidden": (32,)}),
    ], ids=["KTUP", "MKR"])
    def test_pairwise_kg_models_learn(self, kg_world, cls, kw):
        kg, users, items, ub, ib = kg_world
        model = cls(feature_map=_fm(), embedding_dim=16, num_users=N_USERS,
                    num_items=N_ITEMS, n_entities=N_ENTITIES, n_relations=2,
                    **kw)
        params = _train_pairwise(model, users, items, None, steps=250)
        if isinstance(model, MKR):
            u = model.apply({"params": params},
                            {"user_id": jnp.arange(N_USERS)},
                            method=model.user_tower)
            it = model.apply({"params": params},
                             {"item_id": jnp.arange(N_ITEMS)},
                             method=model.item_tower)
            scores = np.asarray(u) @ np.asarray(it).T
        else:
            scores = model.apply(
                {"params": params}, {"user_id": jnp.arange(N_USERS)},
                method=model.full_scores)
        assert _block_auc(np.asarray(scores), ub, ib) > 0.75
        rng = np.random.default_rng(0)
        kb = _kg_batch(rng, kg)
        # the KG head (MKR kg_mlp) only materializes under the kg_loss path;
        # init it separately and overlay the CF-trained params
        kg_vars = nn.meta.unbox(model.init(jax.random.PRNGKey(1), kb,
                                           method=model.kg_loss)["params"])
        merged = {**kg_vars, **params}
        kl = model.apply({"params": merged}, kb, method=model.kg_loss)
        assert np.isfinite(float(kl))


class TestGNNModels:
    def test_kgcn_learns_blocks(self, kg_world):
        kg, users, items, ub, ib = kg_world
        ents, rels = build_neighbor_table(kg, n_neighbors=4, seed=0)
        model = KGCN(feature_map=_fm(), embedding_dim=16, num_users=N_USERS,
                     num_items=N_ITEMS, n_entities=N_ENTITIES, n_relations=2,
                     n_hops=1, neighbor_entities=StaticArray(ents),
                     neighbor_relations=StaticArray(rels))
        params = _train_pairwise(model, users, items, None, steps=250)
        scores = model.apply({"params": params},
                             {"user_id": jnp.arange(N_USERS)},
                             method=model.full_scores)
        assert _block_auc(np.asarray(scores)[:, :N_ITEMS], ub, ib) > 0.8

    def test_kgnnls_label_propagation(self, kg_world):
        kg, users, items, ub, ib = kg_world
        ents, rels = build_neighbor_table(kg, n_neighbors=4, seed=0)
        model = KGNNLS(feature_map=_fm(), embedding_dim=16,
                       num_users=N_USERS, num_items=N_ITEMS,
                       n_entities=N_ENTITIES, n_relations=2, n_hops=1,
                       neighbor_entities=StaticArray(ents),
                       neighbor_relations=StaticArray(rels))
        B = 8
        batch = {"user_id": jnp.asarray(users[:B]),
                 "__item_ids__": jnp.asarray(items[:B])[:, None]}
        item_ids = jnp.asarray(items[:B])[:, None]
        labels = np.zeros((B, N_ENTITIES), np.float32)
        for row, u in enumerate(users[:B]):
            labels[row, items[users == u]] = 1.0
        variables = model.init(jax.random.PRNGKey(0), batch, item_ids,
                               jnp.asarray(labels),
                               method=model.label_propagate)
        params = nn.meta.unbox(variables["params"])
        pred = model.apply({"params": params}, batch, item_ids,
                           jnp.asarray(labels), method=model.label_propagate)
        assert pred.shape == (B, 1)
        assert np.isfinite(np.asarray(pred)).all()
        ls = model.apply({"params": params}, batch, item_ids,
                         jnp.asarray(labels), jnp.ones((B, 1)),
                         method=model.ls_loss)
        assert np.isfinite(float(ls))

    def test_kgat_learns_blocks(self, kg_world):
        kg, users, items, ub, ib = kg_world
        h, r, t = collaborative_kg_edges(kg, users, items, N_USERS)
        model = KGAT(feature_map=_fm(), embedding_dim=16, num_users=N_USERS,
                     n_entities=N_ENTITIES, n_relations=2, n_layers=1,
                     kg_dim=8, ckg_heads=StaticArray(h),
                     ckg_relations=StaticArray(r), ckg_tails=StaticArray(t))
        params = _train_pairwise(model, users, items, None, steps=200,
                                 lr=2e-2)
        u = model.apply({"params": params}, {"user_id": jnp.arange(N_USERS)},
                        method=model.user_tower)
        it = model.apply({"params": params},
                         {"item_id": jnp.arange(N_ITEMS)},
                         method=model.item_tower)
        auc = _block_auc(np.asarray(u) @ np.asarray(it).T, ub, ib)
        assert auc > 0.75, auc
        rng = np.random.default_rng(0)
        kb = _kg_batch(rng, kg)
        kl = model.apply({"params": params}, kb, method=model.kg_loss)
        assert np.isfinite(float(kl))

    def test_ripplenet_learns_blocks(self, kg_world):
        kg, users, items, ub, ib = kg_world
        u2i = {}
        for u, i in zip(users, items):
            u2i.setdefault(int(u), []).append(int(i))
        rs = build_ripple_sets(kg, u2i, n_hops=2, n_memory=8, seed=0)
        # per-interaction ripple rows aligned to training users
        uidx = {int(u): k for k, u in enumerate(rs["users"])}
        row = np.array([uidx[int(u)] for u in users])
        extra = {"ripple_heads": rs["heads"][row],
                 "ripple_relations": rs["relations"][row],
                 "ripple_tails": rs["tails"][row]}
        model = RippleNet(feature_map=_fm(), embedding_dim=16,
                          num_users=N_USERS, num_items=N_ITEMS,
                          n_entities=N_ENTITIES, n_relations=2, n_hops=2)
        params = _train_pairwise(model, users, items, None, steps=250,
                                 extra_batch=extra)
        all_rows = np.array([uidx[u] for u in range(N_USERS)])
        scores = model.apply(
            {"params": params},
            {"user_id": jnp.arange(N_USERS),
             "ripple_heads": jnp.asarray(rs["heads"][all_rows]),
             "ripple_relations": jnp.asarray(rs["relations"][all_rows]),
             "ripple_tails": jnp.asarray(rs["tails"][all_rows])},
            method=model.full_scores)
        assert _block_auc(np.asarray(scores)[:, :N_ITEMS], ub, ib) > 0.75


class TestAtomicEntityRemap:
    def test_unlinked_entities_never_alias_items(self, tmp_path):
        """Entity ids seeded from sparse linked-item ids must not collide
        with other entities nor land inside the unlinked-item id range."""
        from recbox_tpu.data.atomic import load_atomic_dataset
        (tmp_path / "t.inter").write_text(
            "user_id:token\titem_id:token\n" +
            "".join(f"u{k}\ti{k}\n" for k in range(4)))
        # only item i3 is linked; three more standalone entities
        (tmp_path / "t.link").write_text(
            "item_id:token\tentity_id:token\ni3\te_d\n")
        (tmp_path / "t.kg").write_text(
            "head_id:token\trelation_id:token\ttail_id:token\n"
            "e_d\tr\te_x\ne_x\tr\te_y\ne_y\tr\te_z\n")
        ds = load_atomic_dataset(str(tmp_path), "t")
        item_ids = set(ds.item_vocab.values())
        ent_items = {e: i for e, i in ds.entity_vocab.items()}
        # linked entity shares its item id
        assert ent_items["e_d"] == ds.item_vocab["i3"]
        # unlinked entities: distinct ids OUTSIDE the item range
        others = [ent_items[e] for e in ("e_x", "e_y", "e_z")]
        assert len(set(others)) == 3
        assert not (set(others) & item_ids)

    def test_filter_interactions_joint_item_entity_remap(self, tmp_path):
        """`AtomicDataset.filter_interactions` (round 5): after k-core /
        min_rating filtering, items and KG entities are remapped JOINTLY
        (recbole `dataset.py:868` + `:1165` + kg_dataset.py semantics) —
        surviving linked items keep item==entity id alignment, dropped
        items' entities become plain entities numbered after the new
        item id space, and inter ids are contiguous from 1."""
        from recbox_tpu.data.atomic import load_atomic_dataset
        # i0/i1/i2 popular (4 inters each); i3 appears once -> dropped by
        # min_item_inter=2; user u9 has one interaction -> dropped by
        # min_user_inter=2
        lines = ["user_id:token\titem_id:token\trating:float\n"]
        for u in range(4):
            for i in range(3):
                lines.append(f"u{u}\ti{i}\t5.0\n")
        lines.append("u0\ti3\t5.0\n")
        lines.append("u9\ti0\t5.0\n")
        (tmp_path / "t.inter").write_text("".join(lines))
        (tmp_path / "t.link").write_text(
            "item_id:token\tentity_id:token\n" +
            "".join(f"i{i}\te{i}\n" for i in range(4)))
        (tmp_path / "t.kg").write_text(
            "head_id:token\trelation_id:token\ttail_id:token\n" +
            "".join(f"e{i}\tr0\te{(i + 1) % 4}\n" for i in range(4)) +
            "e0\tr1\te_x\n")
        ds = load_atomic_dataset(str(tmp_path), "t")
        f = ds.filter_interactions(min_user_inter=2, min_item_inter=2)
        # u9 and i3 are gone; survivors contiguous from 1
        assert set(f.user_vocab) == {f"u{u}" for u in range(4)}
        assert set(f.item_vocab) == {"i0", "i1", "i2"}
        assert sorted(f.user_vocab.values()) == [1, 2, 3, 4]
        assert sorted(f.item_vocab.values()) == [1, 2, 3]
        assert set(np.unique(f.inter["item_id"])) == {1, 2, 3}
        # surviving linked entities keep item==entity alignment
        for i in range(3):
            assert f.entity_vocab[f"e{i}"] == f.item_vocab[f"i{i}"]
        # dropped item i3's entity and the pure entity e_x live AFTER the
        # new item space, distinct
        assert f.entity_vocab["e3"] > 3 and f.entity_vocab["e_x"] > 3
        assert f.entity_vocab["e3"] != f.entity_vocab["e_x"]
        # kg triples rewritten to the new ids; link keeps survivors only
        kg_ids = set(f.kg["head_id"]) | set(f.kg["tail_id"])
        assert kg_ids == set(f.entity_vocab.values())
        assert len(f.link["item_id_id"]) == 3
        # the derived KnowledgeGraph is consistent
        g = f.to_knowledge_graph()
        assert g.n_items == 4                    # 3 survivors + PAD
        assert g.n_entities >= max(kg_ids) + 1
        # original dataset untouched (pure function)
        assert set(ds.item_vocab) == {"i0", "i1", "i2", "i3"}
