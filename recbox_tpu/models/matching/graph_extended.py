"""Extended graph collaborative filtering: SGL, NCL, DGCF, SpectralCF, GCMC,
LINE.

TPU-native re-designs of recbole's remaining graph models
(`third_party/recbole/model/general_recommender/{sgl,ncl,dgcf,spectralcf,
gcmc,line}.py`), built on the static padded-edge-list machinery of
`graph.py` (`_GraphBase`): every propagation is gather → scale →
`segment_sum`, no scipy sparse, no dynamic shapes.

Self-supervised pieces are exposed as model methods returning loss terms
(`ssl_loss`, `structural_loss`, `prototype_loss`) so the training loop
composes them with the main BPR objective; edge dropout uses a bernoulli
mask over the static edge arrays (the graph never changes shape —
dropped edges contribute zero, matching the reference's resampled subgraph
in expectation).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.models.base import similarity_scores
from recbox_tpu.models.matching.graph import LightGCN, _GraphBase
from recbox_tpu.nn.embedding import emb_init

__all__ = ["SGL", "NCL", "DGCF", "SpectralCF", "GCMC", "LINE",
           "kmeans_prototypes", "infonce", "infonce_all"]


def infonce(a: jnp.ndarray, b: jnp.ndarray, tau: float = 0.2) -> jnp.ndarray:
    """InfoNCE with in-batch negatives: positives are matching rows."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    logits = jnp.dot(a, b.T) / tau
    labels = jnp.arange(a.shape[0])
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=-1)[labels, labels])


def infonce_all(a: jnp.ndarray, b: jnp.ndarray, b_all: jnp.ndarray,
                tau: float = 0.2) -> jnp.ndarray:
    """InfoNCE whose denominator runs over ALL nodes of the second view —
    the SGL/NCL reference semantics (`sgl.py` calc_ssl_loss, `ncl.py`
    ssl_layer_loss): an in-batch denominator would (a) make loss hardness
    depend on batch size and (b) turn duplicate in-batch ids into false
    negatives pushing a node's two views apart from themselves. Summed
    over the batch like the reference (its ssl_weight values are
    calibrated for the sum)."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    b_all = b_all / jnp.maximum(
        jnp.linalg.norm(b_all, axis=-1, keepdims=True), 1e-12)
    pos = jnp.sum(a * b, axis=1) / tau                       # (B,)
    ttl = jax.nn.logsumexp(jnp.dot(a, b_all.T) / tau, axis=1)
    return jnp.sum(ttl - pos)


def kmeans_prototypes(emb: np.ndarray, k: int, n_iters: int = 20,
                      seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side k-means (NCL's periodic E-step, `ncl.py` e_step): returns
    (centers (k, D), assignments (N,)).

    Seeding is k-means++ (next center drawn ∝ squared distance to the
    nearest chosen one) rather than the reference's uniform-random faiss
    init — uniform seeding can drop two centers into one true cluster and
    Lloyd never recovers (measured: 2/6 seeds mis-partition three planted
    well-separated clusters; ++ seeding recovers all 6 —
    tests/test_mechanisms_batch19.py)."""
    rng = np.random.default_rng(seed)
    e2 = (emb ** 2).sum(-1, keepdims=True)                  # (N, 1)
    centers = np.empty((k, emb.shape[1]), dtype=emb.dtype)
    centers[0] = emb[rng.integers(len(emb))]
    d2 = ((emb - centers[0]) ** 2).sum(-1)
    for j in range(1, k):
        s = float(d2.sum())
        # degenerate input (all remaining points coincide with chosen
        # centers, e.g. constant table or k > distinct rows): d2 is all
        # zeros and ∝-d² sampling is undefined — fall back to uniform
        p = d2 / s if s > 0 else np.full(len(emb), 1.0 / len(emb))
        centers[j] = emb[rng.choice(len(emb), p=p)]
        d2 = np.minimum(d2, ((emb - centers[j]) ** 2).sum(-1))
    for _ in range(n_iters):
        # ||e - c||² = ||e||² − 2e·c + ||c||² via one (N, k) matmul — the
        # broadcast form materializes an (N, k, D) tensor and OOMs at NCL
        # scale (100k users × 1000 clusters × 64 dims ≈ 51 GB)
        d = e2 - 2.0 * emb @ centers.T + (centers ** 2).sum(-1)[None, :]
        assign = d.argmin(1)
        for j in range(k):
            sel = emb[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)
    return centers, assign


class SGL(LightGCN):
    """Self-supervised graph learning (`sgl.py`): LightGCN + InfoNCE between
    two edge-dropout views of the propagated embeddings."""

    ssl_tau: float = 0.2
    drop_ratio: float = 0.1

    def _propagate_with_mask(self, edge_keep: Optional[jnp.ndarray]):
        # LightGCN propagation with dropout-rescaled edge coefficients —
        # routed through the shared hop so fixes there apply here
        coefs = None
        if edge_keep is not None:
            _, _, c = self._edges()
            coefs = c * edge_keep / (1.0 - self.drop_ratio)
        return self.propagated(coefs=coefs)

    def ssl_loss(self, batch) -> jnp.ndarray:
        """InfoNCE over two dropout views: anchors are the batch's users
        and positive items, the denominator runs over ALL nodes of view 2
        (`sgl.py` calc_ssl_loss); dropout masks come from the 'dropout'
        rng stream."""
        n_edges = len(self.edge_users)
        k1 = self.make_rng("dropout")
        k2 = self.make_rng("dropout")
        m1 = jax.random.bernoulli(k1, 1.0 - self.drop_ratio, (n_edges,))
        m2 = jax.random.bernoulli(k2, 1.0 - self.drop_ratio, (n_edges,))
        u1, i1 = self._propagate_with_mask(m1.astype(jnp.float32))
        u2, i2 = self._propagate_with_mask(m2.astype(jnp.float32))
        users = batch[self.feature_map.query_index]
        pos_items = batch["__item_ids__"][:, 0]
        return (infonce_all(u1[users], u2[users], u2, self.ssl_tau)
                + infonce_all(i1[pos_items], i2[pos_items], i2,
                              self.ssl_tau))


class NCL(LightGCN):
    """Neighborhood-enriched contrastive learning (`ncl.py`): LightGCN +
    structural contrast (hop-2h vs hop-0 of the same node) + prototype
    contrast against periodically refreshed k-means centers."""

    ssl_tau: float = 0.1
    hyper_layers: int = 1

    def layer_outputs(self):
        ue = jnp.asarray(self.user_table)
        ie = jnp.asarray(self.item_table)
        user_layers, item_layers = [ue], [ie]
        for _ in range(max(self.n_layers, 2 * self.hyper_layers)):
            ue, ie = self._propagate_hop(ue, ie)
            user_layers.append(ue)
            item_layers.append(ie)
        return user_layers, item_layers

    def structural_loss(self, batch) -> jnp.ndarray:
        ul, il = self.layer_outputs()
        users = batch[self.feature_map.query_index]
        pos_items = batch["__item_ids__"][:, 0]
        k = 2 * self.hyper_layers
        return (infonce_all(ul[k][users], ul[0][users], ul[0], self.ssl_tau)
                + infonce_all(il[k][pos_items], il[0][pos_items], il[0],
                              self.ssl_tau))

    def prototype_loss(self, batch, user_protos, item_protos,
                       user_assign, item_assign) -> jnp.ndarray:
        """Contrast nodes against their k-means prototype (`ncl.py`
        ProtoNCE); centers/assignments are host-refreshed via
        `kmeans_prototypes` between epochs."""
        users = batch[self.feature_map.query_index]
        pos_items = batch["__item_ids__"][:, 0]
        ue = jnp.asarray(self.user_table)[users]
        ie = jnp.asarray(self.item_table)[pos_items]

        def proto_nce(emb, protos, assign):
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            protos = protos / jnp.maximum(
                jnp.linalg.norm(protos, axis=-1, keepdims=True), 1e-12)
            logits = jnp.dot(emb, protos.T) / self.ssl_tau
            return jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[
                jnp.arange(emb.shape[0]), assign])

        return (proto_nce(ue, jnp.asarray(user_protos),
                          jnp.asarray(user_assign)[users])
                + proto_nce(ie, jnp.asarray(item_protos),
                            jnp.asarray(item_assign)[pos_items]))


class DGCF(_GraphBase):
    """Disentangled GCF (`dgcf.py`): the embedding is split into K intent
    chunks; per-intent edge weights are refined by routing iterations
    (neighbor-softmaxed affinities), each intent propagating independently."""

    n_intents: int = 4
    n_routing: int = 2

    def setup(self):
        init = self._table_init()
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.item_table = self.param("emb_item", init,
                                     (self.num_items, self.embedding_dim))

    def _segment_softmax(self, logits, segments, num_segments):
        m = jax.ops.segment_max(logits, segments, num_segments=num_segments)
        e = jnp.exp(logits - m[segments])
        z = jax.ops.segment_sum(e, segments, num_segments=num_segments)
        return e / jnp.maximum(z[segments], 1e-12)

    def propagated(self):
        K = self.n_intents
        D = self.embedding_dim
        dk = D // K
        u, i, _ = self._edges()
        E = u.shape[0]
        ue = jnp.asarray(self.user_table).reshape(self.num_users, K, dk)
        ie = jnp.asarray(self.item_table).reshape(self.num_items, K, dk)
        logits = jnp.zeros((E, K))
        out_u, out_i = ue, ie
        for _ in range(self.n_layers):
            hu, hi = out_u, out_i
            for _ in range(self.n_routing):
                # neighbor-normalized weights per intent, normalized over
                # the RECEIVING node's edges on each side (a user-side
                # softmax reused for item messages would leave item inboxes
                # unnormalized — popular items' mass grows with degree)
                w_u = jnp.stack([self._segment_softmax(logits[:, k], u,
                                                       self.num_users)
                                 for k in range(K)], axis=1)     # (E, K)
                w_i = jnp.stack([self._segment_softmax(logits[:, k], i,
                                                       self.num_items)
                                 for k in range(K)], axis=1)     # (E, K)
                msg_u = jax.ops.segment_sum(
                    hi[i] * w_u[..., None], u, num_segments=self.num_users)
                msg_i = jax.ops.segment_sum(
                    hu[u] * w_i[..., None], i, num_segments=self.num_items)
                # routing update: affinity of tanh'd messages along edges,
                # from BOTH directions — the reference's joint graph holds
                # each edge twice (u→i and i→u) and updates its value with
                # head·tanh(tail_msg) in each direction (`dgcf.py`
                # build_matrix/forward); a user-side-only update would
                # leave item-intent weights uninformed by item messages
                logits = logits \
                    + jnp.sum(jnp.tanh(msg_u[u]) * hi[i], axis=-1) \
                    + jnp.sum(jnp.tanh(msg_i[i]) * hu[u], axis=-1)
            out_u, out_i = out_u + msg_u, out_i + msg_i
        return (out_u.reshape(self.num_users, D),
                out_i.reshape(self.num_items, D))

    def user_tower(self, batch, train: bool = False):
        ue, _ = self.propagated()
        return ue[batch[self.feature_map.query_index]]

    def item_tower(self, batch, train: bool = False):
        _, ie = self.propagated()
        return ie[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        ue, ie = self.propagated()
        user_emb = ue[batch[self.feature_map.query_index]]
        item_ids = batch["__item_ids__"]
        item_emb = ie[item_ids.reshape(-1)]
        return similarity_scores(user_emb, item_emb, item_ids.shape[1],
                                 self.similarity, self.temperature)


class SpectralCF(_GraphBase):
    """Spectral CF (`spectralcf.py` shape): polynomial spectral filters —
    e_{l+1} = σ((e_l + Â e_l) W_l), concatenating layer outputs. The (I + Â)
    form is recbole's eigen-free implementation of the spectral convolution."""

    def setup(self):
        init = self._table_init()
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.item_table = self.param("emb_item", init,
                                     (self.num_items, self.embedding_dim))
        self.filters = [nn.Dense(self.embedding_dim, use_bias=False,
                                 kernel_init=nn.initializers.normal(0.01),
                                 name=f"filter{k}")
                        for k in range(self.n_layers)]

    def propagated(self):
        ue = jnp.asarray(self.user_table)
        ie = jnp.asarray(self.item_table)
        user_layers, item_layers = [ue], [ie]
        for f in self.filters:
            su, si = self._propagate_hop(ue, ie)
            ue = jax.nn.sigmoid(f(ue + su))
            ie = jax.nn.sigmoid(f(ie + si))
            user_layers.append(ue)
            item_layers.append(ie)
        return (jnp.concatenate(user_layers, axis=-1),
                jnp.concatenate(item_layers, axis=-1))

    def user_tower(self, batch, train: bool = False):
        ue, _ = self.propagated()
        return ue[batch[self.feature_map.query_index]]

    def item_tower(self, batch, train: bool = False):
        _, ie = self.propagated()
        return ie[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        ue, ie = self.propagated()
        user_emb = ue[batch[self.feature_map.query_index]]
        item_ids = batch["__item_ids__"]
        item_emb = ie[item_ids.reshape(-1)]
        return similarity_scores(user_emb, item_emb, item_ids.shape[1],
                                 self.similarity, self.temperature)


class GCMC(_GraphBase):
    """Graph convolutional matrix completion (`gcmc.py` shape, binary
    ratings): one message-passing layer → dense encoder; bilinear decoder
    score = h_uᵀ Q h_i, folded into the user tower so retrieval stays MIPS."""

    hidden_dim: int = 64

    def setup(self):
        # GCMC keeps its own wider init (0.01) — the degree-normalized
        # one-hot convolution needs it; emb_init_scheme does not apply here
        init = nn.with_partitioning(emb_init(0.01), (("data", "model"), None))
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.item_table = self.param("emb_item", init,
                                     (self.num_items, self.embedding_dim))
        self.enc_u = nn.Dense(self.hidden_dim, name="enc_u")
        self.enc_i = nn.Dense(self.hidden_dim, name="enc_i")
        self.decoder_q = self.param("decoder_q",
                                    nn.initializers.orthogonal(),
                                    (self.hidden_dim, self.hidden_dim))

    def encoded(self):
        ue = jnp.asarray(self.user_table)
        ie = jnp.asarray(self.item_table)
        su, si = self._propagate_hop(ue, ie)
        hu = self.enc_u(jax.nn.relu(su))
        hi = self.enc_i(jax.nn.relu(si))
        return hu @ jnp.asarray(self.decoder_q), hi

    def user_tower(self, batch, train: bool = False):
        hu, _ = self.encoded()
        return hu[batch[self.feature_map.query_index]]

    def item_tower(self, batch, train: bool = False):
        _, hi = self.encoded()
        return hi[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        hu, hi = self.encoded()
        user_emb = hu[batch[self.feature_map.query_index]]
        item_ids = batch["__item_ids__"]
        item_emb = hi[item_ids.reshape(-1)]
        return similarity_scores(user_emb, item_emb, item_ids.shape[1],
                                 self.similarity, self.temperature)


class LINE(_GraphBase):
    """Large-scale information network embedding (`line.py`): first-order
    proximity scores ⟨u, i⟩ on the VERTEX embeddings — serving/predict
    always uses them (`line.py:176-195` full_sort_predict) — while
    order=2 adds a second-order ⟨u, ctx_i⟩ term against context embeddings
    at TRAIN time only (the reference weighs it as a separate logistic
    loss, `line.py:156-174`; here the two logits sum into the one
    pairwise objective of the matching pipeline — both tables receive the
    same sign of gradient as the reference's two-term loss)."""

    order: int = 2

    def setup(self):
        init = self._table_init()
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.item_table = self.param("emb_item", init,
                                     (self.num_items, self.embedding_dim))
        if self.order == 2:
            self.item_ctx = self.param("emb_item_ctx", init,
                                       (self.num_items, self.embedding_dim))

    def user_tower(self, batch, train: bool = False):
        return jnp.asarray(self.user_table)[batch[self.feature_map.query_index]]

    def item_tower(self, batch, train: bool = False):
        # vertex embeddings — the reference's predict path
        return jnp.asarray(self.item_table)[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        user_emb = self.user_tower(batch, train)
        ids = batch["__item_ids__"]
        vertex = jnp.asarray(self.item_table)[ids.reshape(-1)]
        scores = similarity_scores(user_emb, vertex, ids.shape[1],
                                   self.similarity, self.temperature)
        if self.order == 2:
            ctx = jnp.asarray(self.item_ctx)[ids.reshape(-1)]
            scores = scores + similarity_scores(
                user_emb, ctx, ids.shape[1], self.similarity,
                self.temperature)
        return scores
