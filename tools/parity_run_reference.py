import sys, types
# stub optional deps the vendored recbole imports at module scope
import logging
import numpy as np
if not hasattr(np, "float_"):
    np.float_ = np.float64
    np.int_ = np.int64
    np.complex_ = np.complex128
    np.bool_ = np.bool_
    np.unicode_ = np.str_
class _ColoredFormatter(logging.Formatter):
    def __init__(self, fmt=None, datefmt=None, log_colors=None, **kw):
        super().__init__(fmt.replace("%(log_color)s", "") if fmt else fmt, datefmt)
colorlog = types.ModuleType("colorlog")
colorlog.ColoredFormatter = _ColoredFormatter
sys.modules["colorlog"] = colorlog
tb = types.ModuleType("torch.utils.tensorboard")
class _SW:
    def __init__(self, *a, **k): pass
    def add_scalar(self, *a, **k): pass
    def add_hparams(self, *a, **k): pass
    def close(self): pass
tb.SummaryWriter = _SW
sys.modules["torch.utils.tensorboard"] = tb
tt = types.ModuleType("texttable")
class Texttable:
    def __init__(self, *a, **k): self.rows = []
    def set_cols_align(self, *a): return self
    def set_cols_valign(self, *a): return self
    def add_rows(self, rows, *a, **k): self.rows += list(rows); return self
    def draw(self): return "\n".join(str(r) for r in self.rows)
tt.Texttable = Texttable
sys.modules["texttable"] = tt
thop = types.ModuleType("thop")
thop.__path__ = []  # mark as package
thop_profile = types.ModuleType("thop.profile")
thop_profile.register_hooks = {}
thop_vision = types.ModuleType("thop.vision")
thop_vision.__path__ = []
thop_hooks = types.ModuleType("thop.vision.basic_hooks")
thop_hooks.count_parameters = lambda m, x, y: None
sys.modules["thop"] = thop
sys.modules["thop.profile"] = thop_profile
sys.modules["thop.vision"] = thop_vision
sys.modules["thop.vision.basic_hooks"] = thop_hooks
for name in ("ray", "ray.tune", "hyperopt", "wandb"):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
sys.modules["ray"].tune = sys.modules["ray.tune"]
# hyperopt symbols referenced in trainer/hyper_tuning.py
hp = sys.modules["hyperopt"]
for sym in ("fmin", "tpe", "hp", "Trials", "early_stop"):
    setattr(hp, sym, None)
import scipy.sparse as _sp
if not hasattr(_sp.dok_matrix, "_update"):
    def _dok_update(self, data):
        for k, v in data.items():
            self[k] = v
    _sp.dok_matrix._update = _dok_update
import os
import torch
_orig_load = torch.load
torch.load = lambda *a, **k: _orig_load(*a, **{**k, "weights_only": False})
sys.path.insert(0, "/root/reference/recbox/third_party")
from recbole.quick_start.quick_start import run_recbole
config = {
    "data_path": "/tmp/parity",
    "USER_ID_FIELD": "user_id", "ITEM_ID_FIELD": "item_id",
    "RATING_FIELD": "rating", "TIME_FIELD": "timestamp",
    "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
    "epochs": int(os.environ.get("REF_EPOCHS", 30)),
    "train_batch_size": 512, "eval_batch_size": 2048,
    "learning_rate": float(os.environ.get("REF_LR", 1e-3)), "embedding_size": 32,
    "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "RO",
                  "group_by": "user", "mode": "full"},
    "metrics": ["Recall", "NDCG"], "topk": [20], "valid_metric": "Recall@20",
    "stopping_step": 10, "seed": 2024, "device": "cpu", "use_gpu": False,
}
import os
model_name = os.environ.get("REF_MODEL", "BPR")
if model_name == "LightGCN":
    config.update({"n_layers": 2, "reg_weight": 1e-5})
if model_name == "SASRec":
    config.update({
        "eval_args": {"split": {"LS": "valid_and_test"}, "order": "TO",
                      "group_by": "user", "mode": "full"},
        "metrics": ["Recall", "NDCG"], "topk": [10],
        "valid_metric": "NDCG@10",
        "train_neg_sample_args": None,
        "MAX_ITEM_LIST_LENGTH": 20,
        "n_layers": 1, "n_heads": 2, "hidden_size": 32,
        "inner_size": 128, "hidden_dropout_prob": 0.2,
        "attn_dropout_prob": 0.2, "hidden_act": "gelu",
        "layer_norm_eps": 1e-12, "initializer_range": 0.02,
        "loss_type": "CE",
    })
if model_name in ("FM", "DeepFM", "FiGNN", "EulerNet", "DCNV2", "xDeepFM"):
    extra = []
    if os.environ.get("REF_DATASET") == "ctr_scale":
        extra = [f"c{i}" for i in range(2, 8)]
    config.update({
        "LABEL_FIELD": "label",
        "load_col": {"inter": ["user_id", "item_id"] + extra + ["label"]},
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "RO",
                      "group_by": None, "mode": "labeled"},
        "metrics": ["AUC", "LogLoss"], "valid_metric": "AUC",
        "train_neg_sample_args": None, "embedding_size": 16,
        "mlp_hidden_size": [64, 32],
        "dropout_prob": float(os.environ.get("REF_DROPOUT", 0.1)),
    })
    config.pop("RATING_FIELD", None)
    config.pop("TIME_FIELD", None)
    config.pop("topk", None)
if model_name == "FiGNN":
    # recbole properties/model/FiGNN.yaml defaults at embedding_size 16
    config.update({"attention_size": 16, "n_layers": 2, "num_heads": 2,
                   "hidden_dropout_prob": 0.1, "attn_dropout_prob": 0.1})
if model_name == "EulerNet":
    config.update({"order_list": [16], "drop_ex": 0.1, "drop_im": 0.1,
                   "apply_norm": False, "reg_weight": 0.0})
if model_name == "GRU4Rec":
    # matched-knob head-to-head (tools/parity_run_ours_sasrec.py
    # OURS_MODEL=GRU4Rec): emb 32, one GRU layer hidden 64, dropout 0.2,
    # CE over the catalog, LOO split by time
    config.update({
        "eval_args": {"split": {"LS": "valid_and_test"}, "order": "TO",
                      "group_by": "user", "mode": "full"},
        "metrics": ["Recall", "NDCG"], "topk": [10],
        "valid_metric": "NDCG@10",
        "train_neg_sample_args": None,
        "MAX_ITEM_LIST_LENGTH": 20,
        "embedding_size": 32, "hidden_size": 64, "num_layers": 1,
        "dropout_prob": 0.2, "loss_type": "CE",
    })
if model_name == "DCNV2":
    # matched-knob head-to-head vs ours (tools/parity_run_ours_ctrx.py):
    # stacked, non-mixed, 2 cross layers, MLP [64,32] — structurally exact
    config.update({"mixed": False, "structure": "stacked",
                   "cross_layer_num": 2, "reg_weight": 0.0,
                   "expert_num": 4, "low_rank": 16})
if model_name == "xDeepFM":
    # direct=True matches our CIN topology (full map forwarded, all
    # layers pooled); recbole's per-layer CIN ReLU is the one documented
    # variant difference vs our identity CIN
    config.update({"direct": True, "cin_layer_size": [16, 16],
                   "reg_weight": 0.0})
dataset_name = os.environ.get("REF_DATASET", "synth")
result = run_recbole(model=model_name, dataset=dataset_name, config_dict=config)
print("REFERENCE RESULT:", result)
