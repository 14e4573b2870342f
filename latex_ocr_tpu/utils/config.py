"""Configuration system.

Keeps the reference's 4-JSON-file contract (data/vocab/training/model JSONs
merged into one attribute namespace, later files overriding earlier ones, and
snapshotted into the run output dir under each file's ``export_name``) so that
datasets, run dirs and eval flows interchange with the reference
(cf. reference model/utils/general.py:88-120, train.py:26-27).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Sequence, Union


Source = Union[str, dict, List[Union[str, dict]]]


class Config:
    """JSON-backed attribute bag.

    ``Config("a.json")``, ``Config({"k": v})`` and
    ``Config(["a.json", "b.json"])`` are all valid; for lists, later sources
    override earlier keys. ``save(dir)`` snapshots every file source into
    ``dir`` under its ``export_name`` (falling back to the original basename)
    so evaluation can later reload the exact run configuration.
    """

    def __init__(self, source: Source):
        self.source = source
        if isinstance(source, dict):
            self.__dict__.update(source)
        elif isinstance(source, list):
            for s in source:
                self._load_one(s)
        else:
            self._load_one(source)

    def _load_one(self, source: Union[str, dict]) -> None:
        if isinstance(source, dict):
            self.__dict__.update(source)
        else:
            with open(source) as f:
                self.__dict__.update(json.load(f))

    # -- attribute access helpers -------------------------------------------------
    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __repr__(self) -> str:  # pragma: no cover - debugging nicety
        keys = {k: v for k, v in self.__dict__.items() if k != "source"}
        return f"Config({keys})"

    def to_dict(self) -> Dict[str, Any]:
        return {k: v for k, v in self.__dict__.items() if k != "source"}

    # -- snapshotting ---------------------------------------------------------------
    @classmethod
    def from_run_dir(cls, results: str, parts: Sequence[str] = ("data.json", "vocab.json", "model.json")) -> "Config":
        """Load a trained run's snapshotted config.

        CLI-trained runs snapshot the 4-JSON composition under each file's
        ``export_name`` (``data.json``/``vocab.json``/``model.json``);
        script/API-trained runs snapshot their single dict source as
        ``config.json``. Accept either so every CLI (evaluate/predict/
        serve/visualize) restores both kinds of run.
        """
        single = os.path.join(results, "config.json")
        paths = [os.path.join(results, p) for p in parts]
        if not all(os.path.exists(p) for p in paths) and os.path.exists(single):
            return cls(single)
        return cls(paths)

    def save(self, dir_name: str) -> None:
        """Snapshot config sources into ``dir_name``.

        File sources are copied under their ``export_name`` (the key inside the
        JSON, e.g. ``data_small.json`` exports as ``data.json``); dict sources
        are written as ``config.json``.
        """
        os.makedirs(dir_name, exist_ok=True)
        sources = self.source if isinstance(self.source, list) else [self.source]
        for s in sources:
            if isinstance(s, dict):
                path = os.path.join(dir_name, "config.json")
                with open(path, "w") as f:
                    json.dump(s, f, indent=4)
            else:
                with open(s) as f:
                    data = json.load(f)
                export_name = data.get("export_name", os.path.basename(s))
                with open(os.path.join(dir_name, export_name), "w") as f:
                    json.dump(data, f, indent=4)
