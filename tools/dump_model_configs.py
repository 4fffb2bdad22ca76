"""Generate per-model default config YAMLs — the analog of recbole's
`properties/model/<Model>.yaml` (87 files, `configurator.py` internal
defaults), derived from each registered model's dataclass fields instead of
hand-maintained files.

Usage: python tools/dump_model_configs.py [out_dir]   (default configs/models)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SKIP_FIELDS = {"parent", "name", "feature_map"}
# host-built structures that are not YAML-able defaults
SKIP_TYPES = ("StaticArray",)


def main(out_dir: str = "configs/models") -> int:
    import yaml

    from recbox_tpu.models.registry import MODEL_REGISTRY

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for name, (cls, stage) in sorted(MODEL_REGISTRY.items()):
        if not dataclasses.is_dataclass(cls):
            continue  # host-side models (traditional/exlib) configure via __init__
        out = {"model": name, "stage": stage}
        for f in dataclasses.fields(cls):
            if f.name in SKIP_FIELDS or f.name.startswith("_"):
                continue
            if f.default is dataclasses.MISSING:
                if f.default_factory is dataclasses.MISSING:  # type: ignore
                    continue
                v = f.default_factory()  # type: ignore
            else:
                v = f.default
            if v is None or type(v).__name__ in SKIP_TYPES:
                continue
            if isinstance(v, tuple):
                v = list(v)
            if not isinstance(v, (int, float, str, bool, list)):
                continue
            out[f.name] = v
        path = os.path.join(out_dir, f"{name}.yaml")
        with open(path, "w") as fh:
            yaml.safe_dump(out, fh, sort_keys=False)
        n += 1
    print(f"wrote {n} model config files to {out_dir}")
    return n


if __name__ == "__main__":
    main(*sys.argv[1:])
