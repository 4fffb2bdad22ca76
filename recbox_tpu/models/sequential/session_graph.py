"""Session-graph recommenders: SRGNN and GCSAN.

TPU-native re-design of recbole's session-graph family
(`third_party/recbole/model/sequential_recommender/srgnn.py`, `gcsan.py`).
The reference builds a per-session *unique-node* graph in Python (dynamic
node counts, numpy loops at batch-collation time). That shape is hostile to
XLA, so the graph here is positional with duplicate-item tying computed
on-device at static shape:

    eq[p, q]      = [item_p == item_q]                        (B, L, L)
    C[p, q]       = #{t : item_t == item_p ∧ item_{t+1} == item_q}
                  = eq[:, :, :L−1] @ eq[:, 1:, :]             one batched matmul

Binarizing `C` and dividing each edge by the successor's positional
multiplicity recovers recbole's BINARY unique-node adjacency exactly
(see `session_adjacency`) — rows of duplicate items are identical, so the
GGNN propagation over positions computes the same messages as over unique
nodes (each duplicate position receives the full aggregated message, as
the reference's alias-gather does), and row-normalization equals the
reference's distinct-successor outdegree. Everything is batched matmuls on
the MXU instead of host-side graph construction.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.models.sequential.models import SequentialRecommender, _last_valid
from recbox_tpu.nn.attention import TransformerEncoder

__all__ = ["SRGNN", "GCSAN", "session_adjacency"]


def session_adjacency(item_seq: jnp.ndarray):
    """Per-session normalized in/out adjacency over positions (B, L, L).

    item_seq is right-padded (session first, PAD=0 at the tail).

    Matches recbole's unique-node graph (`srgnn.py` _get_slice) exactly on
    the positional layout: the reference's ``u_A`` is BINARY (a repeated
    transition still contributes 1) and each distinct successor is counted
    ONCE — so the positional form (a) binarizes the transition counts and
    (b) divides each edge by the successor item's positional multiplicity,
    making the per-position aggregate equal the unique-node aggregate
    (duplicate positions carry identical hidden states throughout the
    GGNN, so the division undoes the duplicate-position fan-out).
    """
    valid = (item_seq != 0)
    eq = (item_seq[:, :, None] == item_seq[:, None, :])
    eq = eq & valid[:, :, None] & valid[:, None, :]
    eqf = eq.astype(jnp.float32)
    # successor counts via one batched matmul (see module docstring)
    step = (valid[:, :-1] & valid[:, 1:]).astype(jnp.float32)
    c = jnp.einsum("bpt,bt,btq->bpq", eqf[:, :, :-1], step, eqf[:, 1:, :])
    b = (c > 0).astype(jnp.float32)                 # binary unique-node adj
    mult = jnp.maximum(jnp.sum(eqf, axis=2), 1.0)   # (B, L) item multiplicity
    w_out = b / mult[:, None, :]                    # /succ multiplicity
    out_deg = jnp.sum(w_out, axis=2, keepdims=True)  # = distinct successors
    a_out = w_out / jnp.maximum(out_deg, 1.0)
    w_in = b / mult[:, :, None]                     # /pred multiplicity
    in_deg = jnp.sum(w_in, axis=1, keepdims=True)    # = distinct predecessors
    a_in = jnp.swapaxes(w_in / jnp.maximum(in_deg, 1.0), 1, 2)
    return a_in, a_out


class _GGNN(nn.Module):
    """Gated graph NN over session positions (`srgnn.py` GNN module)."""

    embedding_dim: int
    steps: int = 1

    @nn.compact
    def __call__(self, h, a_in, a_out):
        D = self.embedding_dim
        cell = nn.GRUCell(D, name="gru")
        w_in = nn.Dense(D, name="w_in")
        w_out = nn.Dense(D, name="w_out")
        for _ in range(self.steps):
            m_in = jnp.einsum("bpq,bqd->bpd", a_in, w_in(h))
            m_out = jnp.einsum("bpq,bqd->bpd", a_out, w_out(h))
            a = jnp.concatenate([m_in, m_out], axis=-1)
            B, L, _ = h.shape
            new_h, _ = cell(h.reshape(B * L, D), a.reshape(B * L, 2 * D))
            h = new_h.reshape(B, L, D)
        return h


class _AttentionReadout(nn.Module):
    """s_h = W3·[s_global ; h_last] with additive attention (`srgnn.py`)."""

    embedding_dim: int

    @nn.compact
    def __call__(self, h, mask, seq_len):
        ht = _last_valid(h, seq_len)
        q1 = nn.Dense(self.embedding_dim, name="w1")(ht)
        q2 = nn.Dense(self.embedding_dim, use_bias=False, name="w2")(h)
        alpha = nn.Dense(1, use_bias=False, name="v")(
            jax.nn.sigmoid(q1[:, None] + q2))[..., 0]
        alpha = alpha * mask.astype(alpha.dtype)
        sg = jnp.einsum("bl,bld->bd", alpha, h)
        return nn.Dense(self.embedding_dim, use_bias=False, name="w3")(
            jnp.concatenate([sg, ht], axis=-1))


class SRGNN(SequentialRecommender):
    """Session-graph GNN (`srgnn.py` shape): GGNN over the session transition
    graph + attention readout mixing the global session vector with the last
    item's node state."""

    steps: int = 1
    right_align: bool = True

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        from recbox_tpu.nn.embedding import emb_init
        init = nn.with_partitioning(emb_init(), (("data", "model"), None))
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        self.gnn = _GGNN(self.embedding_dim, self.steps, name="gnn")
        self.readout = _AttentionReadout(self.embedding_dim, name="readout")
        self.encoder = None

    def _node_states(self, item_seq, seq_len):
        from recbox_tpu.models.sequential.models import right_align_to_left
        seq = right_align_to_left(item_seq, seq_len)
        mask = seq != 0
        emb = jnp.take(self._table(), seq, axis=0)
        emb = emb * mask[..., None].astype(emb.dtype)
        a_in, a_out = session_adjacency(seq)
        h = self.gnn(emb, a_in, a_out)
        return h, mask

    def user_tower(self, batch, train: bool = False):
        h, mask = self._node_states(batch["item_seq"], batch["seq_len"])
        return self.readout(h, mask, batch["seq_len"])


class GCSAN(SequentialRecommender):
    """Graph-contextualized self-attention (`gcsan.py` shape): GGNN node
    states → causal transformer; final = w·attention_last + (1−w)·h_last."""

    steps: int = 1
    n_layers: int = 1
    n_heads: int = 1
    weight: float = 0.6
    right_align: bool = True

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        from recbox_tpu.nn.embedding import emb_init
        init = nn.with_partitioning(emb_init(), (("data", "model"), None))
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        self.gnn = _GGNN(self.embedding_dim, self.steps, name="gnn")
        self.trm = TransformerEncoder(
            n_layers=self.n_layers, n_heads=self.n_heads,
            hidden_dropout=self.dropout, attn_dropout=self.dropout,
            causal=True, dtype=self._enc_dtype(), name="trm")
        self.encoder = None

    def user_tower(self, batch, train: bool = False):
        from recbox_tpu.models.sequential.models import right_align_to_left
        seq = right_align_to_left(batch["item_seq"], batch["seq_len"])
        mask = seq != 0
        emb = jnp.take(self._table(), seq, axis=0)
        emb = emb * mask[..., None].astype(emb.dtype)
        a_in, a_out = session_adjacency(seq)
        h = self.gnn(emb, a_in, a_out)
        ht = _last_valid(h, batch["seq_len"])
        at = _last_valid(self.trm(h, mask=mask, train=train), batch["seq_len"])
        return self.weight * at + (1.0 - self.weight) * ht
