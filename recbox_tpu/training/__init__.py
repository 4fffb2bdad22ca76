from recbox_tpu.training.trainer import Trainer, TrainerConfig
from recbox_tpu.training.monitor import Monitor
from recbox_tpu.training.checkpoint import save_checkpoint, load_checkpoint


def __getattr__(name):
    # lazy: sparse/packed import the schema + embedding modules
    if name == "SparseEmbeddingTrainer":
        from recbox_tpu.training.sparse import SparseEmbeddingTrainer
        return SparseEmbeddingTrainer
    if name == "PackedEmbeddingTrainer":
        from recbox_tpu.training.packed import PackedEmbeddingTrainer
        return PackedEmbeddingTrainer
    if name == "S3RecPretrainer":
        from recbox_tpu.training.pretrain import S3RecPretrainer
        return S3RecPretrainer
    raise AttributeError(name)


__all__ = ["Trainer", "TrainerConfig", "Monitor", "save_checkpoint",
           "load_checkpoint", "SparseEmbeddingTrainer",
           "PackedEmbeddingTrainer"]
