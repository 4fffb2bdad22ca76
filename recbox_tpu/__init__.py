"""recbox_tpu — a TPU-native recommender-systems framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of reczoo/RecBox
(reference: /root/reference): the three-stage recommendation cascade of

* **matching** — two-tower / MF / GNN / sequential candidate retrieval trained
  with negative sampling and evaluated by full-corpus top-k retrieval
  (reference: recbox/matching/*, third_party/rechub/models/matching/*),
* **ranking** — feature-interaction CTR and multi-task scorers over tokenized
  categorical / numeric / sequence features
  (reference: recbox/ranking/*, third_party/deepctr/models/*),
* **reranking** — listwise refiners
  (reference: third_party/librerank/reranker.py),

plus the surrounding framework: feature schema + preprocessing, streaming
sharded data loading, a unified trainer (early stopping, checkpoint/resume,
reduce-lr-on-plateau), a single on-device metric engine, YAML configs with
grid-search autotuning, and observability.

Design stance (TPU-first, not a port):
  - one language (Python/JAX), one backend (XLA), functional models
    (flax.linen init/apply) over a FeatureMap-typed batch dict;
  - a single pjit/shard_map-compiled train step over a Mesh(('data','model'));
  - embedding tables row-shardable over the 'model' mesh axis;
  - retrieval = sharded on-device MIPS top-k (no faiss);
  - metrics computed on device with segment ops (no pandas groupby).
"""

__version__ = "0.1.0"

from recbox_tpu.features import FeatureMap, FeatureSpec, Tokenizer, Normalizer

__all__ = ["FeatureMap", "FeatureSpec", "Tokenizer", "Normalizer", "__version__"]
