"""String-keyed registries.

The reference resolves executors/models/datasets/tokenizers *by string name*
from config (`/root/reference/run.py:32`,
`/root/reference/core/executor/base_executor.py:271-275`). The idiomatic
equivalent here is an explicit dict-based registry with a decorator API, so
reference YAML config values (e.g. ``EXECUTOR: "LaTr_Executor"``,
``MODEL_CLASS: "LaTr"``) resolve unchanged.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, TypeVar

T = TypeVar("T")


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, type] = {}

    def register(self, name: str | None = None) -> Callable[[T], T]:
        def wrap(cls: T) -> T:
            key = name or cls.__name__
            if key in self._entries and self._entries[key] is not cls:
                raise KeyError(f"{self.kind} registry already has {key!r}")
            self._entries[key] = cls
            return cls

        return wrap

    def get(self, name: str) -> type:
        try:
            return self._entries[name]
        except KeyError:
            known = ", ".join(sorted(self._entries))
            raise KeyError(
                f"Unknown {self.kind} {name!r}. Registered: {known}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(self._entries)


EXECUTORS = Registry("executor")
MODELS = Registry("model")
MODEL_CONFIGS = Registry("model_config")
DATASETS = Registry("dataset")
TOKENIZERS = Registry("tokenizer")
