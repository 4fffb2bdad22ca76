"""Stub machinery to import the vendored reference recbole in place.

Extracted from the proven preamble of `tools/parity_run_reference.py`
(rounds 2-4 head-to-head runs): recbole imports optional pip deps at
module scope (colorlog, tensorboard, texttable, thop, ray, hyperopt,
wandb) and pre-1.24 numpy aliases; this installs minimal fakes so the
REFERENCE code runs unmodified from /root/reference — zero reference
code is copied into this repo, we execute it where it lives as a
comparison baseline.

Usage:  from reference_stubs import install_reference; install_reference()
        from recbole.evaluator.collector import Collector
"""

import logging
import sys
import types

REFERENCE_THIRD_PARTY = "/root/reference/recbox/third_party"


def install_reference() -> None:
    import numpy as np

    # numpy<1.24 aliases the 2020-era recbole relies on. np.bool exists
    # again in numpy 2.0 but np.float/np.int do NOT — metrics.py's
    # MRR/MAP/NDCG metric_info use np.float directly
    # (`recbole/evaluator/metrics.py:91,131,193`).
    for name, target in (("float_", np.float64), ("int_", np.int64),
                         ("complex_", np.complex128), ("unicode_", np.str_),
                         ("float", np.float64), ("int", np.int64),
                         ("bool", np.bool_)):
        # getattr-probe via try (hasattr on removed aliases emits numpy's
        # FutureWarning)
        try:
            getattr(np, name)
        except AttributeError:
            setattr(np, name, target)

    class _ColoredFormatter(logging.Formatter):
        def __init__(self, fmt=None, datefmt=None, log_colors=None, **kw):
            super().__init__(
                fmt.replace("%(log_color)s", "") if fmt else fmt, datefmt)

    colorlog = types.ModuleType("colorlog")
    colorlog.ColoredFormatter = _ColoredFormatter
    sys.modules.setdefault("colorlog", colorlog)

    tb = types.ModuleType("torch.utils.tensorboard")

    class _SW:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

        def add_hparams(self, *a, **k):
            pass

        def close(self):
            pass

    tb.SummaryWriter = _SW
    sys.modules.setdefault("torch.utils.tensorboard", tb)

    tt = types.ModuleType("texttable")

    class Texttable:
        def __init__(self, *a, **k):
            self.rows = []

        def set_cols_align(self, *a):
            return self

        def set_cols_valign(self, *a):
            return self

        def add_rows(self, rows, *a, **k):
            self.rows += list(rows)
            return self

        def draw(self):
            return "\n".join(str(r) for r in self.rows)

    tt.Texttable = Texttable
    sys.modules.setdefault("texttable", tt)

    thop = types.ModuleType("thop")
    thop.__path__ = []
    thop_profile = types.ModuleType("thop.profile")
    thop_profile.register_hooks = {}
    thop_vision = types.ModuleType("thop.vision")
    thop_vision.__path__ = []
    thop_hooks = types.ModuleType("thop.vision.basic_hooks")
    thop_hooks.count_parameters = lambda m, x, y: None
    sys.modules.setdefault("thop", thop)
    sys.modules.setdefault("thop.profile", thop_profile)
    sys.modules.setdefault("thop.vision", thop_vision)
    sys.modules.setdefault("thop.vision.basic_hooks", thop_hooks)

    for name in ("ray", "ray.tune", "hyperopt", "wandb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["ray"].tune = sys.modules["ray.tune"]
    hp = sys.modules["hyperopt"]
    for sym in ("fmin", "tpe", "hp", "Trials", "early_stop"):
        if not hasattr(hp, sym):
            setattr(hp, sym, None)

    import scipy.sparse as _sp
    if not hasattr(_sp.dok_matrix, "_update"):
        def _dok_update(self, data):
            for k, v in data.items():
                self[k] = v
        _sp.dok_matrix._update = _dok_update

    import torch
    if not getattr(torch.load, "_parity_patched", False):
        _orig_load = torch.load
        def _load(*a, **k):
            return _orig_load(*a, **{**k, "weights_only": False})
        _load._parity_patched = True
        torch.load = _load

    if REFERENCE_THIRD_PARTY not in sys.path:
        sys.path.insert(0, REFERENCE_THIRD_PARTY)
